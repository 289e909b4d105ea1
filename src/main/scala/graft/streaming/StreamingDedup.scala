package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming exact deduplication: `dropDuplicates(keys)` on an unbounded
  * stream keeps seen keys in the checkpointed state store, so duplicates
  * are dropped EXACTLY-ONCE across micro-batches and restarts — the
  * streaming analogue of `Dedup.exact` and the first stage of any
  * continuously-ingesting training-data pipeline.
  *
  * Without a watermark the key state grows unboundedly (correct for
  * bounded backlog replay, as here); a live deployment passes
  * `withWatermarkCol`/`delay` so state for old event-times is evicted —
  * Spark then guarantees dedup only within the watermark horizon.
  */
object StreamingDedup {

  def runAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      targetPath: String,
      checkpointDir: String,
      keys: Seq[String],
      maxFilesPerTrigger: Int = 1,
      withWatermarkCol: Option[String] = None,
      delay: String = "1 hour",
  ): Unit = {
    val (src, base) = StreamingUpsert.globAndBase(sourceDir)
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("basePath", base)
      .parquet(src)
    val withWm = withWatermarkCol.fold(raw)(c => raw.withWatermark(c, delay))
    val deduped = withWm.dropDuplicates(keys)
    val query = deduped.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(targetPath)
      }
      .start()
    query.awaitTermination()
  }
}
