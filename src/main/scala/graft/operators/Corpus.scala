package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-construction operators for large-scale training-data pipelines
  * (driver-mandated extension — SURVEY.md §7.9): dataset mixing via
  * per-stratum deterministic sampling, int8 embedding quantization, and
  * token-budget sequence packing. All three are pure narrow/window
  * DataFrame ops — no driver state, no collect — and every arithmetic
  * step is either integer-exact or one IEEE op, so each has an exact
  * DuckDB oracle twin.
  */
object Corpus {

  /** Per-stratum deterministic sampling: keep a row when the portable hash
    * of its id, SALTED BY STRATUM, lands under the stratum's per-cent
    * rate. This is how training mixtures are built at corpus scale —
    * up/down-weighting sources or languages with a pure filter (no
    * shuffle, no RNG state, reproducible across runs and executors).
    *
    * `rates` maps stratum value → percentage in [0,100]; strata not listed
    * fall back to `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Int], defaultRate: Int = 0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val bucket = pmod(TextFunctions.portableHash(
      concat(col(stratumCol), lit("|"), col(idCol).cast("string"))), lit(100))
    df.where(bucket < rate)
  }

  /** Symmetric int8 quantization of an embedding column: per-vector scale
    * = max |x| (the standard absmax scheme), each component mapped to
    * round(x·127/scale) via floor(y + 0.5) — floor keeps the rounding
    * IEEE-identical across engines, where a half-even `round` would not
    * be. Returns the input plus `qvec array<int>` and `qscale double`;
    * dequantize is `qvec[i] · qscale / 127`.
    *
    * At 100 TB this is the storage/bandwidth lever: 4× smaller vectors,
    * narrow map, and the quantized ints are exact join/aggregate keys.
    */
  def quantizeInt8(embeddings: DataFrame, vecCol: String = "embedding")
      : DataFrame = {
    val x = col(vecCol)
    val scale = greatest(
      array_max(transform(x, v => abs(v.cast("double")))), lit(1e-12))
    embeddings
      .withColumn("qscale", scale)
      .withColumn("qvec", transform(x, v =>
        floor(v.cast("double") * 127.0 / col("qscale") + 0.5).cast("int")))
  }

  /** Token-budget sequence packing: within each shard (e.g. language),
    * docs are laid out in deterministic id order and cut into packs of at
    * most `tokenBudget` tokens by cumulative offset — pack_id =
    * (cumulative tokens BEFORE this doc) div budget. One shuffle by shard
    * + one per-shard sort, the same cost profile as any window; this is
    * the distributed shape of sequence packing for LLM pretraining
    * batches (a doc may straddle a boundary; the trainer's loader splits
    * it, which is not a relational concern).
    */
  def packSequences(docs: DataFrame, shardCol: String, idCol: String,
      nTokensCol: Column, tokenBudget: Long): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__n_tokens", nTokensCol.cast("long"))
      .withColumn("__cum", sum(col("__n_tokens")).over(w))
      // integer `div`, not `/`: a double-typed divide would lose exactness
      // on large cumulative offsets
      .withColumn("pack_id",
        expr(s"(__cum - __n_tokens) div ${tokenBudget}L"))
      .drop("__cum")
      .withColumnRenamed("__n_tokens", "n_tokens")
  }
}
