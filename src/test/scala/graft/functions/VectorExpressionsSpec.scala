package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("VecDot equals the zip_with/aggregate sequential-double form") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.4f)),
      (Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    val hof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)).collect().map(_.getDouble(0)).toSeq
    val fast = df.select(VectorExpressions.dot(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(fast == hof) // bit-exact, not approximate
  }

  test("cosine: orthogonal -> 0, parallel -> 1, zero vector -> null") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(2.0f, 0.0f), Array(5.0f, 0.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 0.0)
    assert(got(1).getDouble(0) == 1.0)
    assert(got(2).isNullAt(0))
  }

  test("cosineWithNorms is bit-identical to inline cosine") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 1.75f, -0.625f)),
      (Array(9.9f, 8.8f, 7.7f), Array(0.01f, 0.02f, 0.03f))).toDF("a", "b")
    val inline = df.select(VectorFunctions.cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    val pre = df
      .withColumn("na", VectorFunctions.norm(col("a")))
      .withColumn("nb", VectorFunctions.norm(col("b")))
      .select(VectorFunctions.cosineWithNorms(
        VectorFunctions.dot(col("a"), col("b")), col("na"), col("nb")))
      .collect().map(_.getDouble(0)).toSeq
    assert(pre == inline)
  }

  test("l2Distance computes sqrt of the squared-diff sum") {
    val df = Seq((Array(1.0f, 2.0f), Array(4.0f, 6.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.l2Distance(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(got == 5.0)
  }

  test("null vector propagates null") {
    val df = Seq((Array(1.0f), Option.empty[Array[Float]])).toDF("a", "b")
    val got = df.select(VectorExpressions.dot(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0))
  }
}
