package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (a handful of symbols/users
  * carrying a disproportionate share of rows).
  *
  * Spark's own defenses cover most cases — partial (map-side) aggregation
  * for groupBy, and AQE skew-join splitting for sort-merge joins. These
  * helpers cover the remainder:
  *
  *  - [[saltedAgg]]: two-phase aggregation when even the partial-aggregate
  *    hash map overflows for a hot key (e.g. high-cardinality distinct-ish
  *    payloads under one key): aggregate on (key, salt) first, then merge
  *    the `saltBuckets` partials per key. Works for any associative,
  *    re-aggregatable set of measures.
  *  - [[saltedJoin]]: equi-join of a skewed LEFT side against a right side
  *    too large to broadcast but small enough to replicate `factor`×:
  *    right rows are replicated once per salt value, left rows pick a
  *    DETERMINISTIC salt (hash of the whole row's key + a discriminator
  *    column), so each hot key's rows spread over `factor` partitions
  *    instead of one.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a discriminator column —
    * deterministic (re-runs and retries agree), unlike rand().
    */
  def saltOf(discriminator: Column, buckets: Int): Column =
    pmod(hash(discriminator), lit(buckets))

  /** Two-phase salted aggregation. `partials` aggregate within
    * (keys, salt); `finals` merge the partials per key. Example:
    * {{{
    * Skew.saltedAgg(df, Seq("symbol"), col("trade_id"), 16)(
    *   partials = Seq(count(lit(1)).as("n"), sum(col("qty")).as("q")),
    *   finals   = Seq(sum(col("n")).as("n"), sum(col("q")).as("q")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], discriminator: Column,
      saltBuckets: Int)(
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", saltOf(discriminator, saltBuckets))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join: `left` (skewed, large) ⋈ `right` (replicated).
    * Result equals `left.join(right, keys)` exactly; the shuffle key gains
    * a salt component so a hot key fans out over `factor` reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      discriminator: Column, factor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", saltOf(discriminator, factor))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }
}
