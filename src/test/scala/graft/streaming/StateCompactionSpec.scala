package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The generic compaction machinery's crash matrix (r15 verdict #8) —
  * the StreamingUpsert-style path pinning, applied to the shared
  * [[StateCompaction]] object: compaction crashing before its marker,
  * vacuum after compaction (including the stray-directory regression),
  * and replay/append into an already-compacted state. The line-family
  * specs cover their operators' use of this object; these cases pin the
  * object's own marker discipline with a SEMANTIC fold in play (the
  * per-key sum the frequent-line count log uses), where a wrong union
  * would silently double-count rather than fail.
  */
class StateCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val fold = Map("counts" -> ((df: org.apache.spark.sql.DataFrame) =>
    df.groupBy("k").agg(sum(col("n")).as("n"))))

  /** Write delta d<v>/counts and commit `_current` = v. */
  private def writeDelta(root: String, v: Long,
      rows: Seq[(String, Long)]): Unit = {
    rows.toDF("k", "n").write.mode("overwrite")
      .parquet(s"$root/delta/d$v/counts")
    StreamingDedupIndex.commitMarker(root, "_current", v)
  }

  private def readCounts(root: String): Map[String, Long] = {
    val v = StreamingDedupIndex.marker(root, "_current").getOrElse(0L)
    StateCompaction.readSub(spark, root, "counts", v)
      .groupBy("k").agg(sum(col("n")).as("n"))
      .as[(String, Long)].collect().toMap
  }

  test("a compact crash BEFORE the _compacted marker leaves readers on " +
      "the delta log; re-running compact completes it") {
    val root = Files.createTempDirectory("graft_scmp1_").toString
    writeDelta(root, 1, Seq(("a", 1L), ("b", 2L)))
    writeDelta(root, 2, Seq(("a", 3L)))
    val before = readCounts(root)
    assert(before == Map("a" -> 4L, "b" -> 2L))
    // simulate the crash: the folded snapshot lands on disk but the
    // process dies before commitMarker — write an orphan snapshot by
    // hand (same bytes compact would produce, WRONG on purpose so a
    // reader that trusted it would be caught)
    Seq(("a", 999L)).toDF("k", "n").write
      .parquet(s"$root/snapshot/s2/counts")
    assert(StreamingDedupIndex.marker(root, "_compacted").isEmpty)
    // readers never see the orphan: state still reads from the log
    assert(readCounts(root) == before)
    // re-running compact overwrites the orphan and commits the marker;
    // the fold makes the snapshot one row per key (index-sized)
    StateCompaction.compact(spark, root, Seq("counts"), fold)
    assert(StreamingDedupIndex.marker(root, "_compacted").contains(2L))
    assert(readCounts(root) == before)
    assert(spark.read.parquet(s"$root/snapshot/s2/counts").count() == 2)
    // compact at the same head version is a no-op (it would otherwise
    // overwrite the snapshot being read)
    StateCompaction.compact(spark, root, Seq("counts"), fold)
    assert(readCounts(root) == before)
  }

  test("vacuum removes covered deltas and superseded snapshots only, " +
      "and survives a stray non-versioned directory") {
    val root = Files.createTempDirectory("graft_scmp2_").toString
    writeDelta(root, 1, Seq(("a", 1L)))
    StateCompaction.compact(spark, root, Seq("counts"), fold)
    writeDelta(root, 2, Seq(("b", 5L)))
    StateCompaction.compact(spark, root, Seq("counts"), fold)
    // two committed snapshots (s1 superseded by s2) + two covered
    // deltas; plant the ADVICE regression — a directory named exactly
    // "s" under snapshot/ aborted the whole vacuum on toLong before
    Files.createDirectories(Paths.get(s"$root/snapshot/s"))
    Files.createDirectories(Paths.get(s"$root/snapshot/sother"))
    StateCompaction.vacuum(root)
    assert(!Files.isDirectory(Paths.get(s"$root/delta/d1")))
    assert(!Files.isDirectory(Paths.get(s"$root/delta/d2")))
    assert(!Files.isDirectory(Paths.get(s"$root/snapshot/s1")))
    assert(Files.isDirectory(Paths.get(s"$root/snapshot/s2")))
    // stray dirs are left alone, not parsed, not deleted
    assert(Files.isDirectory(Paths.get(s"$root/snapshot/s")))
    assert(Files.isDirectory(Paths.get(s"$root/snapshot/sother")))
    assert(readCounts(root) == Map("a" -> 1L, "b" -> 5L))
  }

  test("appends and replays after compact+vacuum read correctly: " +
      "snapshot + post-snapshot deltas, orphans invisible") {
    val root = Files.createTempDirectory("graft_scmp3_").toString
    writeDelta(root, 1, Seq(("a", 1L), ("b", 2L)))
    writeDelta(root, 2, Seq(("a", 3L)))
    StateCompaction.compact(spark, root, Seq("counts"), fold)
    StateCompaction.vacuum(root)
    // a new batch lands on the compacted state: snapshot + d3
    writeDelta(root, 3, Seq(("b", 7L), ("c", 1L)))
    assert(readCounts(root) == Map("a" -> 4L, "b" -> 9L, "c" -> 1L))
    // a crash AFTER the d4 delta write but BEFORE the _current rename:
    // the orphan is invisible — the checkpoint replay recomputes batch
    // 4 from the marker's state and overwrites it, never double-counts
    Seq(("c", 100L)).toDF("k", "n").write
      .parquet(s"$root/delta/d4/counts")
    assert(readCounts(root) == Map("a" -> 4L, "b" -> 9L, "c" -> 1L))
    // the replayed batch rewrites d4 (overwrite, same version) and THEN
    // commits — exactly once semantics by marker, not by write count
    Seq(("c", 2L)).toDF("k", "n").write.mode("overwrite")
      .parquet(s"$root/delta/d4/counts")
    StreamingDedupIndex.commitMarker(root, "_current", 4L)
    assert(readCounts(root) == Map("a" -> 4L, "b" -> 9L, "c" -> 3L))
    // compacting the grown log folds snapshot + d3 + d4 into s4
    StateCompaction.compact(spark, root, Seq("counts"), fold)
    StateCompaction.vacuum(root)
    assert(!Files.isDirectory(Paths.get(s"$root/delta/d3")))
    assert(readCounts(root) == Map("a" -> 4L, "b" -> 9L, "c" -> 3L))
  }
}
