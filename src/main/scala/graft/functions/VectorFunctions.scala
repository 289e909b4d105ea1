package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embedding columns
  * (driver-mandated extension; embeddings.parquet carries 64-d float
  * vectors).
  *
  * All functions are Spark built-in higher-order expressions
  * (`zip_with` / `aggregate`) — codegen'd, no UDF, no serialization of the
  * array off the Tungsten format. Elements are cast to double BEFORE any
  * arithmetic and accumulated left-to-right, which exactly matches the
  * DuckDB oracle's list arithmetic, keeping float results comparable.
  */
object VectorFunctions {

  /** Dot product, accumulated in double, sequential over indices. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0-vector guarded to null. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(null).cast("double")).otherwise(d / n)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v))
}
