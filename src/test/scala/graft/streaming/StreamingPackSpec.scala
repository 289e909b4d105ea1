package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Corpus

class StreamingPackSpec extends SparkSpec {
  import spark.implicits._
  import StreamingPack.PackDocIn

  private def writeFile(df: org.apache.spark.sql.DataFrame,
      dest: String): Unit = {
    val tmp = Files.createTempDirectory("graft_w_").toString + "/out"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(java.nio.file.Paths.get(dest).getParent)
    Files.move(part.toPath, java.nio.file.Paths.get(dest))
  }

  // deterministic little corpus: two shards, token counts chosen so packs
  // straddle both a doc boundary and (later) the file split at id 6
  private val docs = Seq(
    ("en", 1L, 3L), ("en", 2L, 4L), ("en", 3L, 2L), ("en", 4L, 5L),
    ("en", 5L, 1L), ("en", 6L, 4L), ("en", 7L, 3L), ("en", 8L, 6L),
    ("de", 1L, 7L), ("de", 2L, 2L), ("de", 3L, 3L), ("de", 4L, 4L),
    ("de", 5L, 0L), ("de", 6L, 5L))

  private def batchPackIds(budget: Long): Map[(String, Long), Long] =
    Corpus.packSequences(
        docs.toDF("shard", "doc_id", "nt"), "shard", "doc_id",
        col("nt"), budget)
      .select("shard", "doc_id", "pack_id")
      .as[(String, Long, Long)].collect()
      .map { case (s, d, p) => (s, d) -> p }.toMap

  test("batch-mode packTyped equals the batch prefix-sum packer") {
    val got = StreamingPack.packTyped(
        docs.map { case (s, d, n) => PackDocIn(s, d, n) }.toDS(), 8L)
      .collect().map(a => (a.shard, a.doc_id) -> a.pack_id).toMap
    assert(got == batchPackIds(8L))
  }

  test("zero-token docs keep their row and advance nothing") {
    val got = StreamingPack.packTyped(Seq(
        PackDocIn("x", 1L, 8L), PackDocIn("x", 2L, 0L),
        PackDocIn("x", 3L, 1L)).toDS(), 8L)
      .collect().map(a => a.doc_id -> a.pack_id).toMap
    // doc 2 sits exactly at the boundary cum=8 -> pack 1, doc 3 follows it
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("batch-mode materializeTyped equals the batch export minus last packs") {
    import StreamingPack.PackDocIds
    // ids lengths mirror `docs`' token counts; budget 8 gives en packs
    // 0,1,2(open) and de packs 0,1(open)
    val withIds = docs.map { case (s, d, n) =>
      PackDocIds(s, d, (0 until n.toInt).map(i => (d * 100 + i).toInt))
    }
    val got = StreamingPack.materializeTyped(withIds.toDS(), 8L)
      .collect().map(p => (p.shard, p.pack_id) ->
        ((p.n_docs, p.pack_tokens, p.pack_ids))).toMap
    val idsDf = withIds.toDF()
      .withColumn("__n_tokens", size(col("ids")).cast("long"))
    val packed = Corpus.packSequences(idsDf, "shard", "doc_id",
      col("__n_tokens"), 8L)
    val batch = Corpus.materializeTokenPacks(packed, "shard", "doc_id",
        "ids")
      .select("shard", "pack_id", "n_docs", "pack_tokens", "pack_ids")
      .as[(String, Long, Long, Long, Seq[Int])].collect()
    val lastPack = batch.groupBy(_._1).map { case (s, ps) =>
      s -> ps.map(_._2).max }
    val want = batch.filter(p => p._2 < lastPack(p._1))
      .map(p => (p._1, p._2) -> ((p._3, p._4, p._5))).toMap
    assert(want.nonEmpty && got == want)
  }

  test("a doc longer than the budget closes its pack and skips ids") {
    import StreamingPack.PackDocIds
    val ds = Seq(
      PackDocIds("x", 1L, Seq(1, 2)),          // pack 0
      PackDocIds("x", 2L, (10 to 30).map(identity)), // straddles: pack 0
      PackDocIds("x", 3L, Seq(7)),             // cum 23 -> pack 2 (skip 1)
      PackDocIds("x", 4L, (40 to 60).map(identity))  // cum 24 -> pack 3
    ).toDS()
    val got = StreamingPack.materializeTyped(ds, 8L)
      .collect().map(p => p.pack_id ->
        ((p.n_docs, p.pack_tokens, p.pack_ids))).toMap
    // pack 0 holds docs 1+2 (23 tokens, over budget — docs never split);
    // pack 1 is empty, never emitted; pack 2 closes when doc 4 opens 3
    assert(got == Map(
      0L -> ((2L, 23L, Seq(1, 2) ++ (10 to 30))),
      2L -> ((1L, 1L, Seq(7)))))
  }

  test("a restart against the same checkpoint resumes, not recomputes") {
    // run 1 sees only the low file; the high file lands AFTER the query
    // terminated; run 2 reuses the checkpoint — the cursor must resume
    // from the state store (not restart at 0, not re-emit batch 1) and
    // the union of both runs' sink output must equal the batch result
    val root = Files.createTempDirectory("graft_spk2_").toString
    val src = s"$root/src"
    val df = docs.toDF("shard", "doc_id", "n_tokens")
    writeFile(df.where(col("doc_id") <= 3), s"$src/a_low.parquet")
    val schema = spark.read.parquet(src).schema
    StreamingPack.runAvailableNow(spark, src, schema,
      s"$root/out", s"$root/ckpt", tokenBudget = 8L)
    val afterRun1 = spark.read.parquet(s"$root/out").count()
    writeFile(df.where(col("doc_id") > 3), s"$src/b_high.parquet")
    StreamingPack.runAvailableNow(spark, src, schema,
      s"$root/out", s"$root/ckpt", tokenBudget = 8L)
    val got = spark.read.parquet(s"$root/out")
      .select("shard", "doc_id", "pack_id")
      .as[(String, Long, Long)].collect()
    assert(afterRun1 == docs.count(_._2 <= 3L) &&
      got.length == docs.length, "run 2 re-emitted or dropped docs")
    assert(got.map { case (s, d, p) => (s, d) -> p }.toMap
      == batchPackIds(8L))
  }

  test("a null n_tokens from prepare fails loudly, naming the contract") {
    val root = Files.createTempDirectory("graft_spkn_").toString
    val src = s"$root/src"
    val df = Seq(("x", 1L, Some(3L)), ("x", 2L, None))
      .toDF("shard", "doc_id", "n_tokens")
    writeFile(df, s"$src/a.parquet")
    val schema = spark.read.parquet(src).schema
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingPack.runAvailableNow(spark, src, schema,
        s"$root/out", s"$root/ckpt", tokenBudget = 8L)
    }
    // the guard's message, not the typed deserializer's opaque
    // null-value-in-non-nullable-field failure
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("StreamingPack: null n_tokens")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
  }

  test("the cursor carries across micro-batch boundaries") {
    val root = Files.createTempDirectory("graft_spk_").toString
    val src = s"$root/src"
    val df = docs.toDF("shard", "doc_id", "n_tokens")
    writeFile(df.where(col("doc_id") <= 3), s"$src/a_low.parquet")
    writeFile(df.where(col("doc_id") > 3), s"$src/b_high.parquet")
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$src/a_low.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$src/b_high.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000600000L))
    val schema = spark.read.parquet(src).schema
    StreamingPack.runAvailableNow(spark, src, schema,
      s"$root/out", s"$root/ckpt", tokenBudget = 8L)
    val got = spark.read.parquet(s"$root/out")
      .select("shard", "doc_id", "pack_id")
      .as[(String, Long, Long)].collect()
      .map { case (s, d, p) => (s, d) -> p }.toMap
    val want = batchPackIds(8L)
    assert(got == want)
    // the equality is only probative if the batch-1 cursor MATTERS: a
    // shard whose batch-1 token total were a multiple of the budget
    // would assign batch-2 docs identically from a fresh (lost) cursor
    val batch1Cum = docs.filter(_._2 <= 3L)
      .groupBy(_._1).map { case (s, ds) => s -> ds.map(_._3).sum }
    assert(batch1Cum.values.exists(_ % 8L != 0L),
      "fixture no longer exercises the cross-batch cursor")
  }

  test("a contaminated doc never reaches a pack when decontamination " +
      "rides prepare") {
    import graft.operators.Dedup
    // doc 3 contains the eval 2-gram (20,21); docs 2 and 3 straddle the
    // file split so the drop happens in DIFFERENT micro-batches
    val all = Seq(
      ("x", 1L, Seq(1, 2, 3)),
      ("x", 2L, Seq(4, 5, 6, 7)),
      ("x", 3L, Seq(19, 20, 21, 22)), // contaminated
      ("x", 4L, Seq(8, 9)),
      ("x", 5L, Seq(10, 11, 12)))
    val ev = Seq((100L, Seq(20, 21))).toDF("doc_id", "ids")
    val hashes = Dedup.evalWindowHashSet(ev, n = 2)
    val root = Files.createTempDirectory("graft_spkd_").toString
    val src = s"$root/src"
    val df = all.toDF("shard", "doc_id", "ids")
    writeFile(df.where(col("doc_id") <= 2), s"$src/a_low.parquet")
    writeFile(df.where(col("doc_id") > 2), s"$src/b_high.parquet")
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$src/a_low.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$src/b_high.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000600000L))
    val schema = spark.read.parquet(src).schema
    StreamingPack.runMaterializeAvailableNow(spark, src, schema,
      s"$root/out", s"$root/ckpt", tokenBudget = 4L,
      prepare = d => Dedup.dropContaminatedStream(d, hashes, n = 2))
    val packs = spark.read.parquet(s"$root/out")
      .select("shard", "pack_id", "n_docs", "pack_tokens", "pack_ids")
      .as[(String, Long, Long, Long, Seq[Int])].collect()
    // no emitted pack carries any of doc 3's ids
    assert(packs.nonEmpty &&
      packs.forall(p => p._5.intersect(Seq(19, 20, 21, 22)).isEmpty))
    // and the emitted packs equal the batch arithmetic over the CLEAN
    // corpus, minus the shard's final open pack
    val clean = all.filterNot(_._2 == 3L)
    val idsDf = clean.toDF("shard", "doc_id", "ids")
      .withColumn("__n_tokens", size(col("ids")).cast("long"))
    val packed = Corpus.packSequences(idsDf, "shard", "doc_id",
      col("__n_tokens"), 4L)
    val batch = Corpus.materializeTokenPacks(packed, "shard", "doc_id",
        "ids")
      .select("shard", "pack_id", "n_docs", "pack_tokens", "pack_ids")
      .as[(String, Long, Long, Long, Seq[Int])].collect()
    val lastPack = batch.groupBy(_._1).map { case (s, ps) =>
      s -> ps.map(_._2).max }
    val want = batch.filter(p => p._2 < lastPack(p._1))
      .map(p => (p._1, p._2) -> ((p._3, p._4, p._5))).toMap
    val got = packs.map(p => (p._1, p._2) -> ((p._3, p._4, p._5))).toMap
    assert(want.nonEmpty && got == want)
  }
}
