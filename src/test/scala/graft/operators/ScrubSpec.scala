package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(texts: (Long, String)*) =
    Scrub.redactPii(texts.toSeq.toDF("id", "text"))
      .select("id", "redacted", "n_email", "n_ip", "n_phone")
      .as[(Long, String, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("each category redacts and counts independently") {
    val out = scrub(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "host 10.0.0.1 and 999.1.1.1 up"),
      (3L, "call +1 555-014 2424 ok"),
      (4L, "clean text with no pii at all"))
    assert(out(1L) == (("mail <EMAIL> now", 1L, 0L, 0L)))
    // recall over precision: the out-of-range octet quad redacts too
    assert(out(2L) == (("host <IP> and <IP> up", 0L, 2L, 0L)))
    assert(out(3L) == (("call <PHONE> ok", 0L, 0L, 1L)))
    assert(out(4L) == (("clean text with no pii at all", 0L, 0L, 0L)))
  }

  test("sequential redaction: digits inside an email are never a phone") {
    // the local part contains a +digit run that WOULD match the phone
    // pattern on raw text; email redaction runs first, so it must not
    val out = scrub((1L, "write user+123456789x@mail.example.com today"))
    assert(out(1L) == (("write <EMAIL> today", 1L, 0L, 0L)))
  }

  test("all three categories in one document, in prose order") {
    val out = scrub(
      (1L, "user9@example.com at 192.168.0.1 call +44 20-7946-0958 end"))
    assert(out(1L) ==
      (("<EMAIL> at <IP> call <PHONE> end", 1L, 1L, 1L)))
  }

  test("null text propagates null, not a crash or a zero count") {
    val out = Scrub.redactPii(
        Seq((1L, null: String), (2L, "a@b.co")).toDF("id", "text"))
      .select("id", "redacted", "n_email")
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    assert(out(1L) == ((null, null)))
    assert(out(2L) == (("<EMAIL>", 1L)))
  }

  test("the scrub pass is a narrow map: no exchange in the plan") {
    val df = Scrub.redactPii(Seq((1L, "x")).toDF("id", "text"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"scrub must not shuffle:\n$p")
  }
}
