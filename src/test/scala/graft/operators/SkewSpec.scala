package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + tail keys
  private lazy val skewed = spark.range(1000)
    .select(
      when($"id" < 900, "HOT").otherwise(concat(lit("k"), $"id" % 37)).as("key"),
      $"id".as("v"))

  test("saltedAgg equals the plain groupBy aggregation") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    val salted = Skew.saltedAgg(skewed, Seq("key"), $"v", 16)(
        partials = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
        finals = Seq(sum($"n").as("n"), sum($"s").as("s")))
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin equals the plain equi-join") {
    val dim = Seq(("HOT", "hot-attr"), ("k1", "a1"), ("k2", "a2"))
      .toDF("key", "attr")
    val plain = skewed.join(dim, Seq("key"))
      .orderBy("key", "v").as[(String, Long, String)].collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("key"), $"v", 8)
      .select("key", "v", "attr")
      .orderBy("key", "v").as[(String, Long, String)].collect().toSeq
    assert(salted == plain)
  }

  test("salt is deterministic across evaluations") {
    val a = skewed.select(Skew.saltOf($"v", 16).as("s")).collect().map(_.getInt(0))
    val b = skewed.select(Skew.saltOf($"v", 16).as("s")).collect().map(_.getInt(0))
    assert(a.toSeq == b.toSeq)
    assert(a.toSet.subsetOf((0 until 16).toSet))
  }
}
