package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Nearest-class-centroid text classifier over feature-hashed token
  * counts — the in-pipeline stand-in for the fastText-style quality
  * filter the published pretraining pipelines train (CCNet's
  * wiki-vs-crawl model, the LLaMA quality filter): "training" is ONE
  * aggregate over a labeled seed (per-class feature sums + class
  * counts), "inference" is a linear margin per document. No external
  * model artifact, no float accumulation: the margin compares
  * dot(x, μ⁺) against dot(x, μ⁻) by cross-multiplying with the class
  * counts — the same integer-exact gate discipline as the DSIR
  * importance filter — so a SQL oracle reproduces every verdict
  * bit-for-bit.
  *
  * Scale shape: the model is a ONE-ROW frame (two dim-length long
  * arrays + two counts) that broadcasts to the scoring join; training
  * is a dim-bounded aggregate (the posexplode shuffles seed × dim rows,
  * grouped to exactly dim rows); scoring is a pure narrow map after the
  * 1-row broadcast. Nothing driver-side, nothing data-sized.
  */
object Classify {

  /** Train: per-class feature sums over the labeled seed. Returns ONE
    * row `(pos_sum array<long>, neg_sum array<long>, n_pos, n_neg)`.
    * Docs with null text contribute nothing to the sums but still count
    * as class members (they are real, just empty, seed rows — both
    * margin terms scale together so the verdicts are unaffected).
    */
  def centroidModel(seed: DataFrame, labelCol: Column,
      textCol: String = "text", dim: Int = 64): DataFrame = {
    val byDim = seed
      .select(labelCol.as("__lab"),
        posexplode(TextFunctions.hashEmbed(col(textCol), dim))
          .as(Seq("pos", "v")))
      .groupBy("pos").agg(
        sum(when(col("__lab"), col("v")).otherwise(0L)).as("sp"),
        sum(when(!col("__lab"), col("v")).otherwise(0L)).as("sn"))
    val sums = byDim.agg(
      transform(array_sort(collect_list(struct(col("pos"), col("sp")))),
        x => x.getField("sp")).as("pos_sum"),
      transform(array_sort(collect_list(struct(col("pos"), col("sn")))),
        x => x.getField("sn")).as("neg_sum"))
    val counts = seed.agg(
      sum(when(labelCol, 1L).otherwise(0L)).as("n_pos"),
      sum(when(!labelCol, 1L).otherwise(0L)).as("n_neg"))
    sums.crossJoin(counts) // 1 row × 1 row
  }

  /** Integer dot product of two long arrays, EXACT at every step: the
    * elementwise multiply widens one operand to decimal(38,0) first (a
    * document's per-bucket count × a 100 TB seed's per-bucket sum can
    * exceed 2⁶³, and a long multiply would wrap silently under non-ANSI
    * semantics where the DuckDB oracle errors), and the fold accumulates
    * in decimal(38,0).
    */
  private def dotDec(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("decimal(38,0)") * y),
      lit(0).cast("decimal(38,0)"),
      (acc, x) => acc + x)

  /** Fold a ±1-signed change feed (`__sign`, label, text) into a
    * [[centroidModel]] with delta-sized work — the same sign-fold
    * discipline as the n-gram model and the incremental indexes: sums
    * and counts are plain additive aggregates, so inserts add their
    * feature mass and deletes subtract it, and the folded model equals
    * a rebuild over the post-feed seed exactly (integer arithmetic, no
    * order sensitivity). Null-text feed rows fold their count but no
    * features, mirroring training.
    */
  def applyFeedCentroidModel(model: DataFrame, feed: DataFrame,
      labelCol: Column, textCol: String = "text", dim: Int = 64)
      : DataFrame = {
    val byDim = feed
      .select(col("__sign"), labelCol.as("__lab"),
        posexplode(TextFunctions.hashEmbed(col(textCol), dim))
          .as(Seq("pos", "v")))
      .groupBy("pos").agg(
        sum(when(col("__lab"), col("v") * col("__sign")).otherwise(0L))
          .as("dp"),
        sum(when(!col("__lab"), col("v") * col("__sign")).otherwise(0L))
          .as("dn"))
    val deltaSums = byDim.agg(
      transform(array_sort(collect_list(struct(col("pos"), col("dp")))),
        x => x.getField("dp")).as("dp_arr"),
      transform(array_sort(collect_list(struct(col("pos"), col("dn")))),
        x => x.getField("dn")).as("dn_arr"))
    val deltaCounts = feed.agg(
      coalesce(sum(when(labelCol, col("__sign")).otherwise(0L)), lit(0L))
        .as("dnp"),
      coalesce(sum(when(!labelCol, col("__sign")).otherwise(0L)), lit(0L))
        .as("dnn"))
    // an all-null-text (or empty) feed yields an EMPTY delta array —
    // normalize to dense zeros so the zip never pads with nulls
    def dense(c: Column): Column =
      when(size(c) === dim, c).otherwise(array_repeat(lit(0L), dim))
    model.crossJoin(deltaSums).crossJoin(deltaCounts)
      .select(
        zip_with(col("pos_sum"), dense(col("dp_arr")), _ + _).as("pos_sum"),
        zip_with(col("neg_sum"), dense(col("dn_arr")), _ + _).as("neg_sum"),
        (col("n_pos") + col("dnp")).as("n_pos"),
        (col("n_neg") + col("dnn")).as("n_neg"))
  }

  /** Score `docs` against a [[centroidModel]]: appends `margin`
    * (decimal(38,0); > 0 ⇔ the positive centroid is nearer in the
    * count geometry: n_neg·dot(x,S⁺) − n_pos·dot(x,S⁻)) and
    * `quality_pred` (boolean; null for null-text docs, whose features
    * are undefined).
    */
  def scoreByModel(docs: DataFrame, model: DataFrame,
      textCol: String = "text", dim: Int = 64): DataFrame = {
    val f = TextFunctions.hashEmbed(col(textCol), dim)
    docs.crossJoin(broadcast(model))
      .withColumn("margin",
        col("n_neg").cast("decimal(38,0)") * dotDec(f, col("pos_sum")) -
        col("n_pos").cast("decimal(38,0)") * dotDec(f, col("neg_sum")))
      .withColumn("quality_pred", col("margin") > 0)
      .drop("pos_sum", "neg_sum", "n_pos", "n_neg")
  }
}
