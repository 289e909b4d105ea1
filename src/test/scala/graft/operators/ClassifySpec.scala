package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.TextKernels

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** The kernel's feature map, re-derived independently for the expected
    * values (same portable hash, same signed bucketing).
    */
  private def feat(text: String): Array[Long] = {
    val v = new Array[Long](dim)
    text.trim.split("\\s+").filter(_.nonEmpty).foreach { t =>
      val h = TextKernels.portableHash(t.getBytes("UTF-8"))
      v((h % dim).toInt) += (if (((h >> 16) & 1L) == 1L) 1L else -1L)
    }
    v
  }

  private val seedRows = Seq(
    (1L, true, "alpha beta gamma alpha"),
    (2L, true, "alpha delta"),
    (3L, false, "omega psi chi omega omega"),
    (4L, false, "psi chi"))
  private val applyRows = Seq(
    (10L, "alpha beta"),
    (11L, "omega psi"),
    (12L, null: String))

  test("margins equal the hand-computed cross-multiplied formula") {
    val seed = seedRows.toDF("doc_id", "lab", "text")
    val model = Classify.centroidModel(seed, col("lab"), dim = dim)
    val got = Classify.scoreByModel(
        applyRows.toDF("doc_id", "text"), model, dim = dim)
      .select("doc_id", "margin", "quality_pred")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getDecimal(1)).map(_.longValueExact), Option(r.get(2)))))
      .toMap

    val sp = new Array[Long](dim); val sn = new Array[Long](dim)
    seedRows.foreach { case (_, lab, t) =>
      val f = feat(t)
      (0 until dim).foreach(i => if (lab) sp(i) += f(i) else sn(i) += f(i))
    }
    val (npos, nneg) = (2L, 2L)
    def margin(t: String): Long = {
      val f = feat(t)
      nneg * (0 until dim).map(i => f(i) * sp(i)).sum -
        npos * (0 until dim).map(i => f(i) * sn(i)).sum
    }
    assert(got(10L) == ((Some(margin("alpha beta")),
      Some(margin("alpha beta") > 0))))
    assert(got(11L) == ((Some(margin("omega psi")),
      Some(margin("omega psi") > 0))))
    // the seeds share no tokens, so the signs must actually separate
    assert(margin("alpha beta") > 0 && margin("omega psi") < 0)
    // null text: undefined features, null margin AND null verdict
    assert(got(12L) == ((None, None)))
  }

  test("a folded change feed equals a rebuild over the final seed") {
    val seed0 = seedRows.toDF("doc_id", "lab", "text")
    val model0 = Classify.centroidModel(seed0, col("lab"), dim = dim)
    // delete doc 2 (pos class), insert two new docs incl. a null-text one
    val feed = Seq(
      (2L, true, "alpha delta", -1L),
      (7L, false, "chi chi omega", 1L),
      (8L, true, null: String, 1L))
      .toDF("doc_id", "lab", "text", "__sign")
    val folded = Classify.applyFeedCentroidModel(model0, feed,
      col("lab"), dim = dim)
    val finalSeed = Seq(
      (1L, true, "alpha beta gamma alpha"),
      (3L, false, "omega psi chi omega omega"),
      (4L, false, "psi chi"),
      (7L, false, "chi chi omega"),
      (8L, true, null: String)).toDF("doc_id", "lab", "text")
    val rebuilt = Classify.centroidModel(finalSeed, col("lab"), dim = dim)
    def row(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      (r.getSeq[Long](r.fieldIndex("pos_sum")),
        r.getSeq[Long](r.fieldIndex("neg_sum")),
        r.getLong(r.fieldIndex("n_pos")), r.getLong(r.fieldIndex("n_neg")))
    }
    assert(row(folded) == row(rebuilt))
    // an empty feed is the identity
    val empty = Seq.empty[(Long, Boolean, String, Long)]
      .toDF("doc_id", "lab", "text", "__sign")
    assert(row(Classify.applyFeedCentroidModel(model0, empty,
      col("lab"), dim = dim)) == row(model0))
  }

  test("scoring broadcasts the 1-row model — no sort-merge join") {
    val seed = seedRows.toDF("doc_id", "lab", "text")
    val model = Classify.centroidModel(seed, col("lab"), dim = dim)
    val p = Classify.scoreByModel(
        applyRows.toDF("doc_id", "text"), model, dim = dim)
      .queryExecution.executedPlan.toString
    assert(p.contains("Broadcast"), s"model must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"model join must not shuffle:\n$p")
  }
}
