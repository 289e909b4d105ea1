package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dedup

/** Streaming frequent-line STRIP — [[Dedup.lineCountAddBatch]] per
  * micro-batch: the CCNet shared-chrome removal mode run continuously.
  * A persistent per-line distinct-doc count index absorbs each arriving
  * batch; a line whose cumulative count reaches `minDocs` strips from
  * the batch being processed and every later one (arrival-order
  * semantics — already-emitted copies stand; the batch operator over
  * the accumulated corpus is the retroactive form).
  *
  * Same marker-committed append-only state as [[StreamingLineDedup]]:
  * batch N writes `delta/d<N>/cleaned` (batch-stamped stripped docs)
  * and `delta/d<N>/counts` (the batch's per-line distinct-doc counts —
  * deltas SUM to the live index, since globally-unique doc ids make
  * per-batch distinct sets disjoint), then commits `_current` LAST
  * (atomic rename): orphans past the marker are invisible, and a
  * replayed batch anti-joins away on already-cleaned ids — without the
  * guard it would double-count its own lines into the index.
  */
object StreamingLineStrip {

  private def stateSchemas(idCol: String, textCol: String) = (
    StructType(Seq(StructField(idCol, LongType),
      StructField(textCol, StringType), StructField("batch", LongType))),
    StructType(Seq(StructField("line", StringType),
      StructField("n_docs", LongType))))

  /** Read the live cleaned/count state — the committed snapshot (if
    * one exists) plus deltas after it, counts summed per line (the
    * append-only log's fold; the count snapshot is ALREADY folded, and
    * summing is associative, so snapshot + deltas re-fold correctly).
    * Empty frames before the first commit.
    */
  def readState(spark: SparkSession, stateRoot: String,
      idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, DataFrame, Long) = {
    val (cleanSchema, countSchema) = stateSchemas(idCol, textCol)
    StreamingDedupIndex.marker(stateRoot, "_current") match {
      case Some(v) if v >= 1 =>
        (StateCompaction.readSub(spark, stateRoot, "cleaned", v, cleanSchema),
          StateCompaction.readSub(spark, stateRoot, "counts", v, countSchema)
            .groupBy("line").agg(sum(col("n_docs")).as("n_docs")), v)
      case _ => (
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], cleanSchema),
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], countSchema), 0L)
    }
  }

  /** Fold the committed log into one snapshot — the count sub-state
    * compacts to its SEMANTIC fold (per-line sums), so the snapshot is
    * index-sized rather than log-sized; [[vacuum]] deletes what the
    * snapshot covers. Run between batches, like any lakehouse OPTIMIZE.
    */
  def compact(spark: SparkSession, stateRoot: String): Unit =
    StateCompaction.compact(spark, stateRoot, Seq("cleaned", "counts"),
      fold = Map("counts" -> ((d: DataFrame) =>
        d.groupBy("line").agg(sum(col("n_docs")).as("n_docs")))))

  def vacuum(stateRoot: String): Unit = StateCompaction.vacuum(stateRoot)

  /** Replay a parquet backlog with AvailableNow, one file per
    * micro-batch by default. After the run, [[readState]] yields the
    * stripped corpus with each doc's processing batch.
    */
  def runAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      stateRoot: String,
      checkpointDir: String,
      minDocs: Long,
      maxFilesPerTrigger: Int = 1,
      idCol: String = "doc_id",
      textCol: String = "text",
      sep: String = "\n",
  ): Unit = {
    StreamingUpsert.runBatches(spark, sourceDir, schema, checkpointDir,
        maxFilesPerTrigger) { batch =>
      val s = batch.sparkSession
      val (cleanedAll, counts, v) = readState(s, stateRoot, idCol, textCol)
      val fresh = batch.select(col(idCol), col(textCol))
        .join(cleanedAll.select(col(idCol)), Seq(idCol), "left_anti")
      val (cleaned, delta) = Dedup.lineCountAddBatch(
        counts, fresh, minDocs, idCol, textCol, sep)
      val next = v + 1
      cleaned.withColumn("batch", lit(next))
        .write.mode("overwrite").parquet(s"$stateRoot/delta/d$next/cleaned")
      delta
        .write.mode("overwrite").parquet(s"$stateRoot/delta/d$next/counts")
      StreamingDedupIndex.commitMarker(stateRoot, "_current", next)
    }
  }
}
