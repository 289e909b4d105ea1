package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared compaction machinery for the marker-committed append-only
  * state logs (the [[StreamingDedupIndex]] discipline, reused by the
  * line family): live state = committed snapshot (if any) + deltas
  * after it, up to `_current`; [[compact]] folds the log into one
  * snapshot and commits `_compacted` LAST (atomic rename — a crash
  * mid-compaction leaves an orphan snapshot readers never see);
  * [[vacuum]] deletes what the snapshot covers. Run both between
  * batches, like any lakehouse OPTIMIZE. A `fold` lets a sub-state
  * compact to its SEMANTIC fold rather than a row union — the
  * frequent-line count log sums per line, so its snapshot is
  * index-sized, not log-sized.
  */
private[streaming] object StateCompaction {

  /** Union one sub-state's committed snapshot + post-snapshot deltas at
    * state version `v` (callers read `v` off the `_current` marker),
    * SCHEMA-PINNED to the runner's declared sub-state layout (mirrors
    * the StreamingDedupIndex reader): inferring from an arbitrary
    * file's footer would silently project nulls for a column a
    * divergent delta dropped, where the old per-delta unionByName
    * failed loudly. A delta whose physical types contradict the pin
    * still fails loudly at scan time.
    */
  def readSub(spark: SparkSession, stateRoot: String, sub: String,
      v: Long, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(subPaths(stateRoot, sub, v): _*)

  /** [[readSub]] with footer-inferred schema — ONLY for [[compact]],
    * which must rewrite exactly the representation that is on disk
    * (e.g. the line index persists hashed OR string lines; the
    * compacted snapshot has to preserve whichever one the stream
    * wrote, not what a caller currently believes).
    */
  private def readSubInferred(spark: SparkSession, stateRoot: String,
      sub: String, v: Long): DataFrame =
    spark.read.parquet(subPaths(stateRoot, sub, v): _*)

  // ONE multi-path scan, not a reduce of per-delta reads: the union
  // form grew the state plan by one scan subtree per committed batch
  // (linear plan size, quadratic planning over a stream's life). A
  // sub-state's deltas are all written by the same runner with one
  // layout, so the single relation is row-identical to the union.
  private def subPaths(stateRoot: String, sub: String, v: Long)
      : Seq[String] = {
    val c = StreamingDedupIndex.marker(stateRoot, "_compacted")
      .getOrElse(0L).min(v)
    val snap = if (c >= 1) Seq(s"$stateRoot/snapshot/s$c/$sub") else Seq.empty
    snap ++ ((c + 1) to v).map(i => s"$stateRoot/delta/d$i/$sub")
  }

  /** Fold the committed log into `snapshot/s<v>` for every sub-state,
    * applying each sub's `fold` (identity when absent), then commit
    * `_compacted = v` LAST. No-op when already compacted at the head
    * version (re-running would overwrite the snapshot being read).
    */
  def compact(spark: SparkSession, stateRoot: String, subs: Seq[String],
      fold: Map[String, DataFrame => DataFrame] = Map.empty): Unit = {
    val v = StreamingDedupIndex.marker(stateRoot, "_current").getOrElse(0L)
    if (v < 1 ||
        StreamingDedupIndex.marker(stateRoot, "_compacted").contains(v))
      return
    subs.foreach { sub =>
      val folded = fold.getOrElse(sub, identity[DataFrame] _)(
        readSubInferred(spark, stateRoot, sub, v))
      folded.write.mode("overwrite").parquet(s"$stateRoot/snapshot/s$v/$sub")
    }
    StreamingDedupIndex.commitMarker(stateRoot, "_compacted", v)
  }

  /** Delete delta directories the committed snapshot covers and
    * superseded older snapshots — destructive, schedule AFTER
    * [[compact]]'s marker landed; ≤ `_compacted` is never still read.
    */
  def vacuum(stateRoot: String): Unit = {
    val c = StreamingDedupIndex.marker(stateRoot, "_compacted").getOrElse(0L)
    (1L to c).foreach { i =>
      graft.store.UpsertWriter.deleteRecursively(
        java.nio.file.Paths.get(s"$stateRoot/delta/d$i"))
    }
    val snapRoot = java.nio.file.Paths.get(s"$stateRoot/snapshot")
    if (java.nio.file.Files.isDirectory(snapRoot)) {
      val ls = java.nio.file.Files.list(snapRoot)
      try ls.forEach { p =>
        val n = p.getFileName.toString
        // n.drop(1).nonEmpty: a stray directory named exactly "s" would
        // otherwise pass the all-digits test vacuously and abort the
        // whole vacuum on the toLong parse
        if (n.startsWith("s") && n.drop(1).nonEmpty &&
            n.drop(1).forall(_.isDigit) && n.drop(1).toLong < c)
          graft.store.UpsertWriter.deleteRecursively(p)
      } finally ls.close()
    }
  }
}
