package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.store.UpsertWriter

/** Structured-Streaming ingestion with exactly-once PK merge — the
  * idiomatic Spark upgrade of the reference's cron-batch incremental loads
  * (SURVEY.md §2.11): file-source stream → `Trigger.AvailableNow` →
  * `foreachBatch` running the same [[UpsertWriter]] merge the batch path
  * uses. PK dedup in the sink IS the late/duplicate-data strategy, exactly
  * like the reference's re-run-and-merge semantics (e2e_test.py:246-291) —
  * no watermark needed for correctness, only for state bounding in
  * aggregations.
  */
object StreamingUpsert {

  /** Stream every file under `sourceDir` into a PK-merged parquet table at
    * `targetPath`. AvailableNow processes the current backlog then stops —
    * the streaming equivalent of one scheduled incremental run; a live
    * deployment drops the trigger and gets continuous micro-batch merges
    * with checkpointed exactly-once progress.
    */
  def runAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      targetPath: String,
      checkpointDir: String,
      pk: Seq[String],
      maxFilesPerTrigger: Int = 1000,
  ): Unit = {
    // sourceDir may be a single parquet file. FileStreamSource force-sets
    // basePath to the raw path unless it is a glob — and a file basePath is
    // rejected. Turn the filename into an exact-match glob ([e]vents.parquet)
    // and anchor basePath at the parent directory.
    val (src, base) = {
      val p = new org.apache.hadoop.fs.Path(sourceDir)
      if (sourceDir.endsWith(".parquet")) {
        val n = p.getName
        (new org.apache.hadoop.fs.Path(
          p.getParent, s"[${n.head}]${n.tail}").toString, p.getParent.toString)
      } else (sourceDir, sourceDir)
    }
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("basePath", base)
      .parquet(src)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        UpsertWriter.upsert(batch.sparkSession, targetPath, batch, pk)
      }
      .start()
    query.awaitTermination()
  }

  /** Windowed streaming aggregation with a watermark — the standard
    * late-data-bounded shape (10-minute windows, `lateness` allowed).
    * Returns the streaming DataFrame for the caller to sink.
    */
  def windowedCounts(events: DataFrame, timeCol: String, keyCol: String,
      windowDuration: String, lateness: String): DataFrame =
    events
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), windowDuration), col(keyCol))
      .agg(count("*").as("n"), sum("value").as("sum_value"))
}
