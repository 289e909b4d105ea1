package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.operators.Dedup

/** Incremental NEAR-duplicate dedup of a document stream — the
  * daily-crawl-increment shape of a continuously-ingesting training-data
  * pipeline: each micro-batch's docs are MinHash-banded with the fused
  * codegen kernel (one narrow pass, no shuffle), rejected when any band
  * key collides with the accumulated band-key HISTORY of all previously
  * seen docs (or with a lower-id doc inside the same batch), and the
  * batch's keys join the history either way — a rejected doc still
  * "occupies" its keys, so the filter is "have I seen anything like this
  * before", not "is a surviving representative similar".
  *
  * Scale shape: history grows as bands×docs small fixed-width rows,
  * partitioned by (band, key) on disk at scale; the per-batch work is one
  * semi join against it — the same linear candidate profile as
  * [[Dedup.minhashLshPairs]]. The append sink shares
  * [[StreamingDedup]]'s replay caveat (retries may duplicate appends; a
  * PK-merge sink upgrades it to exactly-once).
  */
object StreamingNearDup {

  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("key", StringType, nullable = true),
  ))

  private[streaming] def bandKeys(docs: DataFrame, bands: Int,
      rowsPerBand: Int, shingleN: Int): DataFrame = {
    val sig = Dedup.minhashSignature(docs, bands * rowsPerBand, shingleN)
    sig.select(col("doc_id"), explode(array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rowsPerBand)
          .map(r => col(s"mh${b * rowsPerBand + r}")): _*).as("key"))
    }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
  }

  def runAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      targetPath: String,
      historyPath: String,
      checkpointDir: String,
      bands: Int = 4,
      rowsPerBand: Int = 2,
      shingleN: Int = 3,
      maxFilesPerTrigger: Int = 1,
  ): Unit = {
    val (src, base) = StreamingUpsert.globAndBase(sourceDir)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("basePath", base)
      .parquet(src)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val banded = bandKeys(batch, bands, rowsPerBand, shingleN)
        val hist =
          if (Files.exists(Paths.get(historyPath))) s.read.parquet(historyPath)
          else s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row], bandSchema)
        val rejectHist = banded
          .join(hist.select("band", "key"), Seq("band", "key"), "left_semi")
          .select("doc_id")
        val rejectLocal = banded
          .join(banded.toDF("other_id", "band", "key"), Seq("band", "key"))
          .where(col("other_id") < col("doc_id"))
          .select("doc_id")
        val rejected = rejectHist.union(rejectLocal).distinct()
        batch.join(rejected, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(targetPath)
        banded.write.mode("append").parquet(historyPath)
      }
      .start()
    query.awaitTermination()
  }
}
