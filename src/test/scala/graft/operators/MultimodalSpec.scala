package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world", "web"),
    (2L, "", "crawl"),
    (3L, "binary-ish  content", "web"))
    .toDF("doc_id", "text", "source")

  test("fromDocuments wraps text as binary payload with typed metadata") {
    val assets = Multimodal.fromDocuments(docs)
    assert(assets.schema("payload").dataType.typeName == "binary")
    val row = assets.where($"asset_id" === 1L).collect()(0)
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    assert(row.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes") == 11L)
  }

  test("decodeFeatures is deterministic and partition-count independent") {
    val assets = Multimodal.fromDocuments(docs)
    val f1 = Multimodal.decodeFeatures(assets.repartition(1), dim = 4)
      .orderBy("asset_id").collect().map(_.getSeq[Float](1))
    val f8 = Multimodal.decodeFeatures(assets.repartition(8), dim = 4)
      .orderBy("asset_id").collect().map(_.getSeq[Float](1))
    assert(f1.toSeq == f8.toSeq)
    assert(f1(0).length == 4)
    assert(f1(1).forall(_ == 0.0f)) // empty payload -> zero features
  }

  test("stub features are integer-exact lane byte sums") {
    val f = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs), dim = 4)
      .where($"asset_id" === 1L).collect()(0).getSeq[Float](1)
    val bytes = "hello world".getBytes("UTF-8").map(_ & 0xff)
    val expect = Array.tabulate(4)(j =>
      bytes.zipWithIndex.collect { case (b, i) if i % 4 == j => b }.sum.toFloat)
    assert(f.toArray.sameElements(expect))
  }

  test("perceptual hashes: aHash/dHash bits follow the lane arithmetic " +
      "exactly") {
    // "abca" -> bytes 97,98,99,97; dim=4 lanes [97,98,99,97], total 391
    // ahash bit j: lane_j*4 > 391 -> F,T,T,F -> phash 0b0110 = 6
    // dhash bit j: lane_j > lane_j+1 -> F,F,T  -> phash 0b100  = 4
    val one = Multimodal.fromDocuments(
      Seq((1L, "abca", "web")).toDF("doc_id", "text", "source"))
    assert(Multimodal.perceptualHashes(one, dim = 4, kind = "ahash")
      .collect()(0).getLong(1) == 6L)
    assert(Multimodal.perceptualHashes(one, dim = 4, kind = "dhash")
      .collect()(0).getLong(1) == 4L)
    // empty payload hashes to 0 under both kinds
    val empty = Multimodal.fromDocuments(
      Seq((2L, "", "web")).toDF("doc_id", "text", "source"))
    assert(Multimodal.perceptualHashes(empty, dim = 4, kind = "ahash")
      .collect()(0).getLong(1) == 0L)
    assert(Multimodal.perceptualHashes(empty, dim = 4, kind = "dhash")
      .collect()(0).getLong(1) == 0L)
    assert(intercept[IllegalArgumentException] {
      Multimodal.perceptualHashes(one, dim = 4, kind = "md5")
    }.getMessage.contains("ahash | dhash"))
  }

  test("imageNearDupPairs: banded Hamming pairs match the hand arithmetic") {
    // "abca" ahash(4)=6 (above); "abcb" lanes [97,98,99,98] total 392 ->
    // bits F,F,T,F -> 4; xor(6,4)=2 -> hamming 1. "zzzz" lanes all 122 ->
    // 488 > 488 false everywhere -> 0; hamming vs 6 is 2 (> 1, excluded)
    // but vs 4 is 1 (included).
    val assets = Multimodal.fromDocuments(Seq(
      (1L, "abca", "web"), (2L, "abcb", "web"), (3L, "zzzz", "web"),
      (4L, "abca", "web")) // exact dup of 1 -> hamming 0
      .toDF("doc_id", "text", "source"))
    val pairs = Multimodal.imageNearDupPairs(assets, maxHamming = 1,
        dim = 4, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 1L), (1L, 4L, 0L), (2L, 4L, 1L),
      (2L, 3L, 1L)))
    // dhash flavor: 1 and 4 are byte-identical -> hamming 0 pair survives
    val dpairs = Multimodal.imageNearDupPairs(assets, maxHamming = 0,
        dim = 4, bands = 2, kind = "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dpairs.contains((1L, 4L)))
  }

  test("frameDedupStats: ownership by packed minimum, within and across " +
      "assets; empty payloads report zeros") {
    val assets = Multimodal.fromDocuments(Seq(
      (1L, "abcdwxyz", "web"), // frames abcd, wxyz — owns both
      (2L, "abcdqqqq", "web"), // abcd deduped to asset 1; qqqq owned
      (3L, "", "web"),         // no frames
      (4L, "zzzzzzzz", "web")) // zzzz twice: within-asset dedup
      .toDF("doc_id", "text", "source"))
    val got = Multimodal.frameDedupStats(assets, frameBytes = 4)
      .orderBy("asset_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 0L, 0L),
      (2L, 2L, 1L, 1L, 4L),
      (3L, 0L, 0L, 0L, 0L),
      (4L, 2L, 1L, 1L, 4L)))
    // a short tail frame dedups against an identical short tail only
    val tails = Multimodal.fromDocuments(Seq(
      (5L, "abcdef", "web"), (6L, "qqqqef", "web")) // tails "ef" match
      .toDF("doc_id", "text", "source"))
    val t = Multimodal.frameDedupStats(tails, frameBytes = 4)
      .orderBy("asset_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(t == Seq((5L, 0L, 0L), (6L, 1L, 2L))) // 2-byte tail reclaimed
  }

  test("frameSequenceNearDupPairs pairs clips sharing a k-frame run") {
    // 4-char frames at dim=4: each frame's lanes are its byte values,
    // so single-'z' frames hash to one distinct ahash bit each —
    // "zaaa"->1, "azaa"->2, "aaza"->4, "aaaz"->8, "zzaa"->3, "azza"->6
    val P = "zaaa"; val Q = "azaa"; val R = "aaza"; val S = "aaaz"
    val assets = Multimodal.fromDocuments(Seq(
      // 1 and 2 differ in their FIRST frame but share the 4-frame run
      // P,Q,R,S — a 3-frame shingle window lands inside it
      (1L, "zzaa" + P + Q + R + S, "web"),
      (2L, "azza" + P + Q + R + S, "web"),
      // 3 shares no frames at all with 1/2 (negative control)
      (3L, "zaza" + "azaz" + "zaza" + "azaz" + "zaza", "web"))
      .toDF("doc_id", "text", "source"))
    // the per-frame hash stream, in frame order
    val streams = Multimodal.frameSequenceDocs(assets, frameBytes = 4,
        dim = 4).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streams == Map(
      1L -> "3 1 2 4 8", 2L -> "6 1 2 4 8", 3L -> "5 10 5 10 5"))
    // the shared run pairs 1-2; the disjoint clip 3 pairs with nothing
    val pairs = Multimodal.frameSequenceNearDupPairs(assets,
        frameBytes = 4, k = 3, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // per-frame hashes themselves: packed ids unpack to (asset, idx)
    val ph = Multimodal.framePerceptualHashes(assets, frameBytes = 4,
        dim = 4).where($"asset_id" === 1L).orderBy("frame_idx")
      .collect().map(_.getLong(2)).toSeq
    assert(ph == Seq(3L, 1L, 2L, 4L, 8L))
  }

  test("frameSequenceNearDupVerified carries the true shared-window " +
      "fraction; frameIndexAddBatch remembers digests across batches") {
    val P = "zaaa"; val Q = "azaa"; val R = "aaza"; val S = "aaaz"
    val assets = Multimodal.fromDocuments(Seq(
      (1L, "zzaa" + P + Q + R + S, "web"),
      (2L, "azza" + P + Q + R + S, "web"),
      (3L, "zaza" + "azaz" + "zaza" + "azaz" + "zaza", "web"))
      .toDF("doc_id", "text", "source"))
    // streams "3 1 2 4 8" / "6 1 2 4 8": shingle sets {312,124,248} /
    // {612,124,248} -> intersection 2, union 4 -> jaccard 0.5
    val v = Multimodal.frameSequenceNearDupVerified(assets,
        frameBytes = 4, threshold = 0.4, k = 3, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(v.toSeq == Seq((1L, 2L, 0.5)))
    // a threshold above the true fraction kills the candidate
    assert(Multimodal.frameSequenceNearDupVerified(assets,
      frameBytes = 4, threshold = 0.6, k = 3, dim = 4).count() == 0)

    // incremental digest index: batch 1 = asset 1 seeds; batch 2 =
    // assets 2 and 4 probe it (frames P,Q,R,S already stored; "azza"
    // fresh; asset 4 repeats "azza" twice -> within-batch keep-first)
    val sess = spark
    import sess.implicits._
    val b2 = Multimodal.fromDocuments(Seq(
      (2L, "azza" + P + Q + R + S, "web"),
      (4L, "azza" + "azza", "web")).toDF("doc_id", "text", "source"))
    val idx0 = Seq.empty[String].toDF("digest")
    val (st1, d1) = Multimodal.frameIndexAddBatch(idx0,
      assets.where($"asset_id" === 1L), frameBytes = 4)
    assert(st1.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSeq == Seq((1L, 5L, 5L, 0L)))
    assert(d1.count() == 5)
    val (st2, d2) = Multimodal.frameIndexAddBatch(d1, b2, frameBytes = 4)
    val m = st2.collect().map(r => (r.getLong(0),
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // asset 2: 5 frames, only "azza" fresh (P..S seen in batch 1)
    assert(m(2L) == ((5L, 1L, 4L, 16L)))
    // asset 4: "azza" seen within THIS batch at asset 2's earlier
    // occurrence -> both copies dup
    assert(m(4L) == ((2L, 0L, 2L, 8L)))
    assert(d2.as[String].collect().toSeq.length == 1) // one new digest

    // index duplicates are harmless: a caller unioning overlapping
    // replay deltas without distinct must mark frames seen, not
    // multiply their occurrence rows (the probe distinct()s its index
    // projection — the line family's anti-join immunity, here on the
    // left-join shape)
    val (st2d, d2d) = Multimodal.frameIndexAddBatch(
      d1.union(d1).union(d1), b2, frameBytes = 4)
    assert(st2d.collect().map(r => (r.getLong(0),
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      == m)
    assert(d2d.as[String].collect().toSeq ==
      d2.as[String].collect().toSeq)
  }

  test("crossModalDupPairs demands BOTH channels: a planted image-text " +
      "dup survives, text-only and image-only decoys drop") {
    val cm = "alpha beta gamma delta epsilon"
    val c34 = "lambda mu nu xi omicron"
    val p12 = Array.fill[Byte](16)(0x02) // identical images for 1/2
    // 3 vs 4: ahash differs in bit 0 (lane-0 loaded vs uniform), so
    // maxHamming = 0 rejects the image channel while captions match
    val p3 = Array.tabulate[Byte](16)(i =>
      if (i % 8 == 0) 0xFF.toByte else 0x01)
    val p4 = Array.fill[Byte](16)(0x01)
    val p56 = Array.fill[Byte](16)(0x03) // identical images for 5/6
    val pairs = Seq(
      (1L, cm, p12), (2L, cm, p12),         // cross-modal dup
      (3L, c34, p3), (4L, c34, p4),         // caption-only decoy
      (5L, "one two three four five", p56), // image-only decoy
      (6L, "six seven eight nine ten", p56))
      .toDF("asset_id", "caption", "payload")
    val dup = Multimodal.crossModalDupPairs(pairs, threshold = 0.9,
        maxHamming = 0, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(dup.toSeq == Seq((1L, 2L, 1.0, 0L)))
    // keep-one: only the planted dup collapses; every decoy row stands
    val kept = Multimodal.crossModalDedupClusters(pairs, threshold = 0.9,
        maxHamming = 0, dim = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(kept == Map(1L -> ((1L, true)), 2L -> ((1L, false)),
      3L -> ((3L, true)), 4L -> ((4L, true)),
      5L -> ((5L, true)), 6L -> ((6L, true))))
  }

  test("resizeStub truncates payloads and updates metadata, keeping schema") {
    val resized = Multimodal.resizeStub(Multimodal.fromDocuments(docs), 5)
    assert(resized.schema == Multimodal.fromDocuments(docs).schema)
    val r = resized.where($"asset_id" === 1L).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes") == 5L)
    // empty payload survives as empty
    val e = resized.where($"asset_id" === 2L).collect()(0)
    assert(e.getAs[Array[Byte]]("payload").isEmpty)
  }

  test("frameSample cuts fixed-size frames and keeps every Nth") {
    val assets = Multimodal.fromDocuments(
      Seq((9L, "abcdefghij", "web")).toDF("doc_id", "text", "source"))
    val frames = Multimodal.frameSample(assets, frameBytes = 3, everyN = 2)
      .orderBy("frame_idx").collect()
    // 10 bytes -> frames of 3,3,3,1 at idx 0..3; keep idx 0 and 2
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    assert(new String(frames(0).getAs[Array[Byte]]("frame"), "UTF-8") == "abc")
    assert(new String(frames(1).getAs[Array[Byte]]("frame"), "UTF-8") == "ghi")
  }

  test("packMultimodalSequences interleaves text ids and image " +
      "placeholder spans under one offsets discipline") {
    import org.apache.spark.sql.functions._
    // image dims → patch counts: 32×32/16 → 4 patches; 48×33/16 → 3·2=6
    // (partial patches drop — floor semantics)
    val imgs = Seq((2L, "s", 32, 32), (4L, "s", 48, 33))
      .toDF("doc_id", "shard", "w", "h")
      .select(col("doc_id"), col("shard"), lit("image").as("modality"),
        Multimodal.imagePlaceholderIds(col("w"), col("h"), patchSize = 16,
          placeholderId = 0).as("ids"))
    val txts = Seq((1L, "s", Seq(7, 8, 9)), (3L, "s", Seq(5, 6)))
      .toDF("doc_id", "shard", "ids")
      .select(col("doc_id"), col("shard"), lit("text").as("modality"),
        col("ids"))
    // budget 9: docs in id order weigh 3,4,2,6 → cum-before 0,3,7,9 →
    // packs 0,0,0,1 (doc 4 starts exactly at the boundary)
    val packs = Multimodal.packMultimodalSequences(
        txts.unionByName(imgs), "shard", "doc_id", "ids", "modality",
        tokenBudget = 9)
      .orderBy("pack_id").collect()
    assert(packs.length == 2)
    val p0 = packs(0)
    assert(p0.getAs[Long]("n_docs") == 3L &&
      p0.getAs[Long]("pack_tokens") == 9L &&
      p0.getAs[Long]("n_text_docs") == 2L &&
      p0.getAs[Long]("n_image_docs") == 1L &&
      p0.getAs[Long]("text_tokens") == 5L &&
      p0.getAs[Long]("image_patches") == 4L)
    // the flat stream interleaves in doc order; offsets delineate every
    // segment including the placeholder span
    assert(p0.getSeq[Int](p0.fieldIndex("pack_ids")) ==
      Seq(7, 8, 9, 0, 0, 0, 0, 5, 6))
    assert(p0.getSeq[Int](p0.fieldIndex("doc_offsets")) == Seq(0, 3, 7, 9))
    val p1 = packs(1)
    assert(p1.getAs[Long]("n_image_docs") == 1L &&
      p1.getAs[Long]("image_patches") == 6L &&
      p1.getSeq[Int](p1.fieldIndex("pack_ids")) == Seq.fill(6)(0) &&
      p1.getSeq[Int](p1.fieldIndex("doc_offsets")) == Seq(0, 6))
  }

  test("streamed multimodal packs equal the batch packer, and the " +
      "zero-id count recovers the image mix from the artifact alone") {
    import graft.streaming.StreamingPack
    import graft.streaming.StreamingPack.PackDocIds
    // text ids are byte-vocab-style (>=1); images are 0-spans — the
    // q169/q170 convention where id 0 is reserved for placeholders
    val mixed = Seq(
      ("s", 1L, "text", Seq(7, 8, 9)),
      ("s", 2L, "image", Seq(0, 0, 0, 0)),
      ("s", 3L, "text", Seq(5, 6)),
      ("s", 4L, "image", Seq(0, 0, 0, 0, 0, 0)),
      ("s", 5L, "text", Seq(1, 2, 3, 4)))
    val batch = Multimodal.packMultimodalSequences(
        mixed.toDF("shard", "doc_id", "modality", "ids"),
        "shard", "doc_id", "ids", "modality", tokenBudget = 9)
      .orderBy("pack_id").collect()
    val streamed = StreamingPack.materializeTyped(
        mixed.map { case (s, d, _, ids) => PackDocIds(s, d, ids) }.toDS(),
        tokenBudget = 9)
      .collect().sortBy(_.pack_id)
    // closed stream packs == batch packs minus the final open one,
    // boundaries included — modality changes nothing in the arithmetic
    assert(streamed.length == batch.length - 1)
    streamed.zip(batch).foreach { case (sp, bp) =>
      assert(sp.pack_id == bp.getAs[Long]("pack_id") &&
        sp.pack_ids == bp.getSeq[Int](bp.fieldIndex("pack_ids")) &&
        sp.doc_offsets == bp.getSeq[Int](bp.fieldIndex("doc_offsets")))
      // the artifact is self-describing: zero-id count == the batch
      // side's metadata-derived image_patches (q170's derivation)
      assert(sp.pack_ids.count(_ == 0).toLong ==
        bp.getAs[Long]("image_patches"))
    }
  }

  test("metadata-only query prunes the payload column at the parquet scan") {
    val dir = Files.createTempDirectory("graft_mm_").toString + "/assets"
    Multimodal.fromDocuments(docs).write.parquet(dir)
    val summary = Multimodal.metadataSummary(spark.read.parquet(dir))
    val physical = summary.queryExecution.executedPlan.toString
    // ReadSchema must not include the payload bytes
    assert(physical.contains("ReadSchema"))
    assert(!physical.contains("payload"),
      s"payload column not pruned from scan:\n$physical")
    val row = summary.collect()(0)
    assert(row.getAs[Long]("n_assets") == 3L)
  }
}
