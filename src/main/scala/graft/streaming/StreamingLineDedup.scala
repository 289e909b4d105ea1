package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dedup

/** Streaming line-level dedup — [[Dedup.lineIndexAddBatch]] applied per
  * micro-batch, the line-granular member of the streaming dedup family
  * (whole-doc exact dedup has `StreamingDedup`, near-dup has
  * `StreamingDedupIndex`): every arriving document sheds the lines the
  * corpus has already seen (CCNet/RefinedWeb keep-first semantics,
  * batch by batch), WITHOUT ever rescanning the accepted corpus.
  *
  * State layout under `stateRoot`, the family's marker-committed
  * append-only discipline: batch N writes exactly its own output —
  * `delta/d<N>/cleaned` (the batch's docs with seen lines removed, each
  * stamped with its acceptance batch) and `delta/d<N>/lines` (the
  * batch's FRESH distinct lines, the index delta) — and then commits
  * the `_current` marker LAST (atomic rename). A crash after the delta
  * write but before the marker leaves `_current` behind, so the
  * checkpoint replay recomputes from the OLD state and overwrites the
  * orphan; the state can never be half a batch ahead of the marker.
  * Per-batch state I/O is O(batch lines + probe), never O(corpus).
  *
  * Replays are SEMANTICALLY idempotent BY ID: each batch first
  * anti-joins away doc ids already in the cleaned state (ids are
  * required globally unique, so a present id is by definition a
  * replay), which keeps a replayed batch from re-probing its own lines
  * out of its own output — a replayed batch appends nothing even when
  * the marker advanced before the crash. The id guard prunes the
  * cleaned parquet to its id column; cleaned TEXT is never read back.
  */
object StreamingLineDedup {

  private def stateSchemas(idCol: String, textCol: String,
      hashLines: Boolean) = (
    StructType(Seq(StructField(idCol, LongType),
      StructField(textCol, StringType), StructField("batch", LongType))),
    StructType(Seq(StructField("line",
      if (hashLines) LongType else StringType))))

  /** Read the live cleaned/line-index state — the committed snapshot
    * (if one exists) plus deltas after it, up to `_current`. Orphans
    * past either marker are invisible; empty frames before the first
    * commit. `hashLines` picks the index representation (see
    * [[Dedup.lineIndexAddBatch]]) and pins the scan schema; a
    * PERSISTED index whose parquet representation contradicts the
    * declared one fails loudly at scan time (the long/string physical
    * types are not convertible).
    */
  def readState(spark: SparkSession, stateRoot: String,
      idCol: String = "doc_id", textCol: String = "text",
      hashLines: Boolean = false)
      : (DataFrame, DataFrame, Long) = {
    val (cleanSchema, lineSchema) = stateSchemas(idCol, textCol, hashLines)
    StreamingDedupIndex.marker(stateRoot, "_current") match {
      case Some(v) if v >= 1 =>
        (StateCompaction.readSub(spark, stateRoot, "cleaned", v, cleanSchema),
          StateCompaction.readSub(spark, stateRoot, "lines", v, lineSchema),
          v)
      case _ => (
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], cleanSchema),
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], lineSchema), 0L)
    }
  }

  /** Fold the committed log into one snapshot ([[StateCompaction]]'s
    * marker discipline) so [[readState]] stops unioning an ever-growing
    * delta list; [[vacuum]] deletes what the snapshot covers. Run
    * between batches, like any lakehouse OPTIMIZE.
    */
  def compact(spark: SparkSession, stateRoot: String): Unit =
    StateCompaction.compact(spark, stateRoot, Seq("cleaned", "lines"))

  def vacuum(stateRoot: String): Unit = StateCompaction.vacuum(stateRoot)

  /** Replay a parquet backlog with AvailableNow, one file per
    * micro-batch by default. After the run, [[readState]] yields the
    * line-deduplicated corpus with each doc's acceptance batch: under
    * the backlog's mtime arrival order the composition equals the
    * batch-by-batch [[Dedup.lineIndexAddBatch]] chain doc-for-doc —
    * lines are OWNED by the batch that saw them first (a later batch's
    * smaller doc id never wins retroactively), which is what the
    * arrival-order oracle gates.
    */
  def runAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      stateRoot: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1,
      idCol: String = "doc_id",
      textCol: String = "text",
      sep: String = "\n",
      hashLines: Boolean = false,
  ): Unit = {
    StreamingUpsert.runBatches(spark, sourceDir, schema, checkpointDir,
        maxFilesPerTrigger) { batch =>
      val s = batch.sparkSession
      val (cleanedAll, lines, v) =
        readState(s, stateRoot, idCol, textCol, hashLines)
      // replay guard: an id already cleaned is by definition a replay
      val fresh = batch.select(col(idCol), col(textCol))
        .join(cleanedAll.select(col(idCol)), Seq(idCol), "left_anti")
      val (cleaned, freshLines) = Dedup.lineIndexAddBatchParts(
        lines, fresh, idCol, textCol, sep, hashLines)
      val next = v + 1
      // both writes read the ONE materialization lineIndexAddBatchParts
      // made of the probed batch; marker LAST — see crash note above
      cleaned.withColumn("batch", lit(next))
        .write.mode("overwrite").parquet(s"$stateRoot/delta/d$next/cleaned")
      freshLines
        .write.mode("overwrite").parquet(s"$stateRoot/delta/d$next/lines")
      StreamingDedupIndex.commitMarker(stateRoot, "_current", next)
    }
  }
}
