package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SizingSpec extends SparkSpec {
  import spark.implicits._

  test("fitsBroadcast enforces both the row cap and the byte cap") {
    val small = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    assert(Sizing.fitsBroadcast(small, rowLimit = 100, byteLimit = 1 << 20))
    assert(!Sizing.fitsBroadcast(small, rowLimit = 5, byteLimit = 1 << 20))
    val fat = (1 to 10).map(i => (i.toLong, "x" * 10000)).toDF("id", "v")
    assert(!Sizing.fitsBroadcast(fat, rowLimit = 100, byteLimit = 1000))
  }

  test("fitsBroadcast survives duplicate and dotted column names") {
    // by-name resolution would AnalysisException on either of these; the
    // positional probe must instead return a decision
    val dup = Seq((1, 2), (3, 4)).toDF("a", "a")
    assert(Sizing.fitsBroadcast(dup, rowLimit = 10, byteLimit = 1 << 20))
    val dotted = Seq((1L, "x"), (2L, "y")).toDF("k.ey", "v")
    assert(Sizing.fitsBroadcast(dotted, rowLimit = 10, byteLimit = 1 << 20))
    assert(!Sizing.fitsBroadcast(dotted, rowLimit = 1, byteLimit = 1 << 20))
  }

  test("fitsBroadcast measures variable-width and nested columns") {
    val nested = Seq(
      (1L, Seq("abc", "defg"), Map("k" -> 1)),
      (2L, Seq("h"), Map("k" -> 2))).toDF("id", "toks", "m")
    assert(Sizing.fitsBroadcast(nested, rowLimit = 10, byteLimit = 1 << 20))
    assert(!Sizing.fitsBroadcast(nested, rowLimit = 10, byteLimit = 10))
  }
}
