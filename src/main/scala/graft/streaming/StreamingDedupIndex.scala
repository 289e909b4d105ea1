package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dedup

/** Streaming near-dup dedup — [[graft.operators.Dedup.dedupIndexAddBatch]]
  * applied per micro-batch, the streaming member of the dedup family
  * (exact streaming dedup has `StreamingDedup`; the ANN index has
  * `runVersionedWithAnnIndex`). Each batch dedups against everything
  * accepted so far WITHOUT rescanning it: the state holds the accepted
  * docs plus their LSH band keys.
  *
  * State layout under `stateRoot`: versioned snapshots `v<N>/accepted`
  * (doc_id, text, batch) and `v<N>/keys` (band keys), with a `_current`
  * marker file naming the live version, committed LAST by atomic rename.
  * Crash-exactness is the marker discipline the ANN index uses: a batch
  * that dies after writing `v<N+1>` but before the marker leaves
  * `_current` at `v<N>`, so the checkpoint replay recomputes from the
  * OLD state and overwrites the orphan — the state can never be half a
  * batch ahead of the marker.
  *
  * Replays are also SEMANTICALLY idempotent: a doc whose id is already
  * in the index shares all band keys with itself and verifies at
  * jaccard 1, so a replayed batch rejects wholesale against the state
  * its first run committed — nothing double-appends even if the marker
  * did advance before the crash.
  */
object StreamingDedupIndex {

  private def stateSchemas(idCol: String, textCol: String) = (
    StructType(Seq(StructField(idCol, LongType), StructField(textCol,
      StringType), StructField("batch", LongType))),
    StructType(Seq(StructField(idCol, LongType),
      StructField("band", org.apache.spark.sql.types.IntegerType),
      StructField("key", StringType))))

  private def currentVersion(stateRoot: String): Option[Long] = {
    val p = java.nio.file.Paths.get(stateRoot, "_current")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong)
    else None
  }

  private def commitVersion(stateRoot: String, v: Long): Unit = {
    val dir = java.nio.file.Paths.get(stateRoot)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, "_current_", ".tmp")
    java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, dir.resolve("_current"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the live accepted/keys state, empty frames when none. */
  def readState(spark: SparkSession, stateRoot: String,
      idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, DataFrame, Long) = {
    val (accSchema, keySchema) = stateSchemas(idCol, textCol)
    currentVersion(stateRoot) match {
      case Some(v) => (
        spark.read.parquet(s"$stateRoot/v$v/accepted"),
        spark.read.parquet(s"$stateRoot/v$v/keys"), v)
      case None => (
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], accSchema),
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], keySchema), 0L)
    }
  }

  /** Replay a parquet backlog with AvailableNow, one file per micro-batch
    * by default. After the run, `readState` yields the accepted corpus
    * with each doc's acceptance batch number.
    */
  def runAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      stateRoot: String,
      checkpointDir: String,
      threshold: Double = 0.3,
      maxFilesPerTrigger: Int = 1,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): Unit = {
    StreamingUpsert.runBatches(spark, sourceDir, schema, checkpointDir,
        maxFilesPerTrigger) { batch =>
      val s = batch.sparkSession
      val (accepted0, keys0, v) = readState(s, stateRoot, idCol, textCol)
      val (accL, _) = Dedup.dedupIndexAddBatch(
        keys0, accepted0.select(col(idCol), col(textCol)),
        batch.select(col(idCol), col(textCol)), threshold,
        idCol = idCol, textCol = textCol)
      // the accepted set feeds BOTH state files — materialize once
      val acc = accL.localCheckpoint()
      val next = v + 1
      accepted0.unionByName(
          acc.withColumn("batch", lit(next)))
        .write.mode("overwrite").parquet(s"$stateRoot/v$next/accepted")
      keys0.unionByName(Dedup.dedupIndexKeys(acc, idCol = idCol,
          textCol = textCol))
        .write.mode("overwrite").parquet(s"$stateRoot/v$next/keys")
      commitVersion(stateRoot, next) // marker LAST: see crash note above
    }
  }
}
