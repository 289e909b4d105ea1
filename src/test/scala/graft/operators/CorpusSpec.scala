package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample is deterministic and honors per-stratum rates") {
    val docs = (0 until 2000)
      .map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 10, "de" -> 50)
    val s1 = Corpus.stratifiedSample(docs, "lang", "doc_id", rates)
      .collect().map(_.getLong(0)).toSet
    val s2 = Corpus.stratifiedSample(docs.repartition(7), "lang", "doc_id", rates)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // reproducible regardless of partitioning
    val en = s1.count(_ % 2 == 0).toDouble / 1000
    val de = s1.count(_ % 2 == 1).toDouble / 1000
    assert(en > 0.05 && en < 0.15, s"en rate $en should be near 0.10")
    assert(de > 0.42 && de < 0.58, s"de rate $de should be near 0.50")
    // unlisted strata drop by default
    val none = Corpus.stratifiedSample(docs, "lang", "doc_id", Map.empty)
    assert(none.count() == 0)
  }

  test("chunkDocuments: sliding windows with overlap, short tails, empty docs") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b c d"),                        // exactly one budget
      (3L, "x y"),                            // short single chunk
      (4L, "   ")                             // no tokens -> no chunks
    ).toDF("doc_id", "text")
    val got = Corpus.chunkDocuments(docs, maxTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"), // 1-token overlap carried over
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (2L, 0L, 4L, "a b c d"),
      (3L, 0L, 2L, "x y")))
    // a 5-token doc gets a short tail chunk, not a dropped one
    val tail = Corpus.chunkDocuments(
      Seq((9L, "a b c d e")).toDF("doc_id", "text"), maxTokens = 4, overlap = 1)
      .orderBy("chunk_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(tail == Seq((9L, 0L, 4L, "a b c d"), (9L, 1L, 2L, "d e")))
  }

  test("clusterSplit assigns whole clusters; near-dup pairs never straddle") {
    val docs = (1L to 6L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("doc_id", "root")
    for (pct <- Seq(0, 10, 50, 90, 100)) {
      val got = Corpus.clusterSplit(docs, clusters, pct)
        .select("doc_id", "root", "split")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.length == 6)
      // same root -> same side, for every percentage
      val byRoot = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
      assert(byRoot.values.forall(_.size == 1), s"straddle at pct=$pct: $got")
    }
    val all0 = Corpus.clusterSplit(docs, clusters, 0)
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(all0 == Seq("train"))
    val all100 = Corpus.clusterSplit(docs, clusters, 100)
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(all100 == Seq("eval"))
  }

  test("splitLeakCount: zero on a cluster-granular split, counts naive straddles") {
    val docs = (1L to 7L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // chain {1,2,3} root 1, pair {5,6} root 5, singletons 4 and 7
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L),
      (6L, 5L), (7L, 7L)).toDF("doc_id", "root")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    // any clusterSplit assignment is constant per component -> audit = 0
    for (pct <- Seq(10, 50, 90)) {
      val asg = Corpus.clusterSplit(docs, clusters, pct)
      val n = Corpus.splitLeakCount(asg, pairs).collect()(0).getLong(0)
      assert(n == 0L, s"cluster split must never straddle (pct=$pct)")
    }
    // a cluster-oblivious per-doc assignment (multiples of 3 → eval)
    // splits the 2-3 and 5-6 edges but NOT 1-2: exactly 2 straddles
    import org.apache.spark.sql.functions.{col, lit, when}
    val naive = docs.withColumn("split",
      when(col("doc_id") % 3 === 0, lit("eval")).otherwise(lit("train")))
    val bad = Corpus.splitLeakCount(naive, pairs).collect()(0).getLong(0)
    assert(bad == 2L, s"expected the 2-3 and 5-6 straddles, got $bad")
    // pairs mentioning ids absent from the assignment don't count (inner
    // join semantics — audit is over the assigned universe)
    val stale = pairs.union(Seq((8L, 9L)).toDF("id_a", "id_b"))
    assert(Corpus.splitLeakCount(naive, stale).collect()(0).getLong(0) == 2L)
  }

  test("clusterWeightedSample keeps roots always, thins big clusters by hash") {
    // clusters: {1,2,3,4} root 1, {5,6} root 5, singletons 7..10
    val docs = (1L to 10L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L), (6L, 5L),
      (7L, 7L), (8L, 8L), (9L, 9L), (10L, 10L)).toDF("doc_id", "root")
    // independent reimplementation of the portable hash rule (first 8 hex
    // digits of md5 as unsigned int) — NOT the Spark expression under test
    def ph(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    val byRoot = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val csz = byRoot.values.groupBy(identity).view.mapValues(_.size).toMap
    def expected(target: Int): Set[Long] = byRoot.collect {
      case (id, root) if id == root ||
        ph(s"$root|$id") % csz(root) < target - 1 => id
    }.toSet
    val got2 = Corpus.clusterWeightedSample(docs, clusters, 2)
      .collect().map(_.getLong(0)).toSet
    assert(got2 == expected(2), s"got $got2, want ${expected(2)}")
    // representatives and singletons always survive
    assert(Set(1L, 5L, 7L, 8L, 9L, 10L).subsetOf(got2))
    // target = 1 degrades to exactly hard dedup (roots only)
    val got1 = Corpus.clusterWeightedSample(docs, clusters, 1)
      .collect().map(_.getLong(0)).toSet
    assert(got1 == Set(1L, 5L, 7L, 8L, 9L, 10L))
    // reproducible regardless of partitioning
    val gotR = Corpus.clusterWeightedSample(
      docs.repartition(5), clusters.repartition(3), 2)
      .collect().map(_.getLong(0)).toSet
    assert(gotR == got2)
  }

  test("quantizeInt8 bounds components to [-127,127] and round-trips") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Corpus.quantizeInt8(df).orderBy("vec_id").collect()
    val q1 = q(0).getSeq[Int](q(0).fieldIndex("qvec"))
    val s1 = q(0).getDouble(q(0).fieldIndex("qscale"))
    assert(s1 == 2.0)
    assert(q1 == Seq(64, -127, 32)) // floor(x*127/2 + .5)
    // dequantized error bounded by half a quantization step
    val step = s1 / 127.0
    Seq(1.0, -2.0, 0.5).zip(q1).foreach { case (x, qi) =>
      assert(math.abs(x - qi * step) <= step / 2 + 1e-12)
    }
    // zero vector quantizes to zeros (scale floor keeps the divide finite)
    assert(q(1).getSeq[Int](q(1).fieldIndex("qvec")) == Seq(0, 0, 0))
  }

  test("samplePerGroup keeps exactly k rows per group, reproducibly") {
    val docs = (0 until 900)
      .map(i => (i.toLong, Seq("en", "de", "fr")(i % 3)))
      .toDF("doc_id", "lang")
    val s1 = Corpus.samplePerGroup(docs, "lang", "doc_id", 25)
      .collect().map(_.getLong(0)).toSet
    val s2 = Corpus.samplePerGroup(docs.repartition(7), "lang", "doc_id", 25)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "hash-rank sample must not depend on partitioning")
    assert(s1.size == 75)
    Seq(0, 1, 2).foreach { g => assert(s1.count(_ % 3 == g) == 25) }
    // a group smaller than k keeps all its rows
    val tiny = Corpus.samplePerGroup(
      docs.where(col("doc_id") < 9), "lang", "doc_id", 25)
    assert(tiny.count() == 9)
  }

  test("selectToTokenBudget keeps the best-score prefix that fits") {
    // scores: id 5 best (50), then 4, 3, 2, 1; 10 tokens each, budget 25
    // -> ids 5 and 4 fit (cum 10, 20); id 3 would overflow (30): dropped,
    // and everything ranked below it drops too
    val docs = (1 to 5).map(i => (i.toLong, i * 10.0, 10L))
      .toDF("id", "score", "nt")
    val got = Corpus.selectToTokenBudget(docs, col("score"), "id",
        col("nt"), 25L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 10L, 4L -> 20L))
    // score ties broken by id ascending: equal scores, budget fits two
    val tied = Seq((7L, 1.0, 10L), (3L, 1.0, 10L), (9L, 1.0, 10L))
      .toDF("id", "score", "nt")
    val t = Corpus.selectToTokenBudget(tied, col("score"), "id",
        col("nt"), 20L)
      .select("id").as[Long].collect().toSet
    assert(t == Set(3L, 7L))
    // null token counts are not selectable and don't consume budget
    val withNull = Seq((1L, 9.0, Some(10L)), (2L, 8.0, None),
      (3L, 7.0, Some(10L))).toDF("id", "score", "nt")
    val n = Corpus.selectToTokenBudget(withNull, col("score"), "id",
        col("nt"), 20L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(n == Map(1L -> 10L, 3L -> 20L))
    // budget 0 selects nothing; empty input yields empty output
    assert(Corpus.selectToTokenBudget(docs, col("score"), "id",
      col("nt"), 0L).count() == 0)
    assert(Corpus.selectToTokenBudget(docs.where(col("id") > 99),
      col("score"), "id", col("nt"), 25L).count() == 0)
  }

  test("allocateEpochs repeats scarce domains, subsamples abundant ones") {
    // two domains, budget 2000 -> target 1000 tokens each:
    //  - "small" holds 100 tokens -> 4 full epochs (capped), no partial
    //  - "big" holds 5000 tokens -> 0 full epochs, 1e6*1000/5000 = 200000
    //    partial threshold: roughly a fifth of big's docs land in epoch 0
    val docs = ((0 until 10).map(i => (i.toLong, "small", 10L)) ++
      (100 until 600).map(i => (i.toLong, "big", 10L)))
      .toDF("doc_id", "lang", "nt")
    val out = Corpus.allocateEpochs(docs, "lang", "doc_id", col("nt"),
      tokenBudget = 2000L, maxEpochs = 4)
      .select("doc_id", "lang", "epoch")
      .as[(Long, String, Long)].collect().toSeq
    val small = out.filter(_._2 == "small")
    // every small doc appears in epochs 0..3, nothing more (cap hit)
    assert(small.groupBy(_._1).forall(_._2.map(_._3).sorted == Seq(0L, 1L, 2L, 3L)))
    assert(small.size == 40)
    val big = out.filter(_._2 == "big")
    // abundant domain: only partial epoch 0, about a fifth of the docs
    assert(big.forall(_._3 == 0L))
    assert(big.size > 50 && big.size < 150, s"got ${big.size}")
    // partitioning-invariant
    val out2 = Corpus.allocateEpochs(docs.repartition(7), "lang",
      "doc_id", col("nt"), 2000L, 4)
      .select("doc_id", "lang", "epoch")
      .as[(Long, String, Long)].collect().toSeq
    assert(out.toSet == out2.toSet)
    // null domains are rejected loudly
    val err = intercept[IllegalArgumentException] {
      Corpus.allocateEpochs(
        Seq((1L, null: String, 5L)).toDF("doc_id", "lang", "nt"),
        "lang", "doc_id", col("nt"), 100L, 2)
    }
    assert(err.getMessage.contains("sentinel"))
  }

  test("temperatureSample flattens the domain distribution deterministically") {
    // 4000 en vs 250 de: with T=2 the de share of the sample should rise
    // well above its 1/17 corpus share
    val docs = ((0 until 4000).map(i => (i.toLong, "en")) ++
      (4000 until 4250).map(i => (i.toLong, "de"))).toDF("doc_id", "lang")
    val s1 = Corpus.temperatureSample(docs, "lang", "doc_id", fracPct = 20)
      .collect().map(_.getLong(0)).toSet
    val s2 = Corpus.temperatureSample(docs.repartition(5), "lang", "doc_id", 20)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "temperature sample must not depend on partitioning")
    val de = s1.count(_ >= 4000).toDouble
    val en = s1.count(_ < 4000).toDouble
    // weights sqrt(4000)≈63.2, sqrt(250)≈15.8 -> de gets ~20% of the
    // sample vs 5.9% of the corpus; expected takes: M=850, de≈170, en≈680
    assert(de > 120 && de < 220, s"de take $de should be near 170")
    assert(en > 560 && en < 800, s"en take $en should be near 680")
    // fracPct=100: the small domain caps at keep-all (thr > 1e6) while
    // the large one still downsamples (~85%) — that asymmetry IS the
    // temperature reweighting
    val full = Corpus.temperatureSample(docs, "lang", "doc_id", 100)
    val fullIds = full.collect().map(_.getLong(0)).toSet
    assert(fullIds.count(_ >= 4000) == 250, "small domain keeps all rows")
    val enFull = fullIds.count(_ < 4000)
    assert(enFull > 3200 && enFull < 3600, s"en take $enFull should be near 3400")
    // null domains fail loudly — a silent drop would skew every other
    // domain's share while reporting success
    val withNull = docs.union(Seq((9999L, null.asInstanceOf[String]))
      .toDF("doc_id", "lang"))
    intercept[IllegalArgumentException] {
      Corpus.temperatureSample(withNull, "lang", "doc_id", 20)
    }
  }

  test("buildVocab assigns dense ids by count desc, token asc") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a a b d"),
      (3L, "e")).toDF("doc_id", "text")
    // counts: a=4, b=4, c=1, d=1, e=1
    val v = Corpus.buildVocab(docs, "text", minCount = 1, maxSize = 4)
      .orderBy("token_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(v.toSeq == Seq((1, "a", 4L), (2, "b", 4L), (3, "c", 1L), (4, "d", 1L)))
    // minCount filters the tail before the cap
    val v2 = Corpus.buildVocab(docs, "text", minCount = 2, maxSize = 10)
      .collect().map(_.getString(1)).toSet
    assert(v2 == Set("a", "b"))
  }

  test("packSequences fills packs to the token budget in id order") {
    val docs = (0 until 10).map(i => (i.toLong, "en", "w " * 30))
      .toDF("doc_id", "lang", "text") // 30 tokens each
    val packed = Corpus.packSequences(docs, "lang", "doc_id",
        graft.functions.TextFunctions.nTokens(col("text")), tokenBudget = 100)
      .select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 30-token docs, 100 budget: offsets 0,30,60,90 -> pack 0; 120.. -> pack 1
    assert(packed(0L) == 0 && packed(3L) == 0)
    assert(packed(4L) == 1 && packed(7L) == 2)
    // per-pack token totals never exceed budget + one straddling doc
    val totals = Corpus.packSequences(docs, "lang", "doc_id",
        graft.functions.TextFunctions.nTokens(col("text")), tokenBudget = 100)
      .groupBy("pack_id").agg(sum("n_tokens").as("t"))
      .collect().map(_.getLong(1))
    assert(totals.forall(_ <= 100 + 30))
  }

  test("packSequences pack_ids are partition-invariant and equal the window form") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    // skewed shard mix: one dominant language, like a real corpus
    val rows = (0 until 500).map { i =>
      val lang = if (i % 17 == 0) "de" else if (i % 23 == 0) "fr" else "en"
      (i.toLong, lang, rnd.nextInt(60) + 1)
    }
    val base = rows.toDF("doc_id", "lang", "nt")
    def packIds(df: org.apache.spark.sql.DataFrame) =
      Corpus.packSequences(df, "lang", "doc_id", col("nt"), tokenBudget = 100)
        .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    val a = packIds(base.repartition(1))
    val b = packIds(base.repartition(7, col("doc_id")))
    val c = packIds(base.repartition(32))
    assert(a == b && b == c, "pack ids must not depend on input partitioning")
    // the global prefix sum must reproduce the per-shard window exactly
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = base
      .withColumn("cum", sum(col("nt").cast("long")).over(w))
      .select($"doc_id", expr("(cum - nt) div 100").as("pack_id"))
      .as[(Long, Long)].collect().toMap
    assert(a == want)
  }

  test("packSequences: null token counts get null pack_id, don't shift offsets") {
    val docs = Seq(
      (0L, "en", Some(40L)), (1L, "en", None), (2L, "en", Some(70L)),
      (3L, "en", Some(10L)))
      .toDF("doc_id", "lang", "nt")
    val out = Corpus.packSequences(docs, "lang", "doc_id", col("nt"), 100)
      .select("doc_id", "pack_id").as[(Long, Option[Long])].collect().toMap
    // cum before: 0, (null), 40, 110 — the null row neither packs nor
    // advances the offset, same as the window-sum form
    assert(out == Map(0L -> Some(0L), 1L -> None, 2L -> Some(0L),
      3L -> Some(1L)))
  }

  test("shuffleShard: positions are partition-invariant and equal row_number") {
    import org.apache.spark.sql.expressions.Window
    val base = (0 until 300).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    def out(df: org.apache.spark.sql.DataFrame) =
      Corpus.shuffleShard(df, "doc_id", nShards = 4, seed = "s1")
        .select("doc_id", "shard", "sort_key", "pos")
        .as[(Long, Long, Long, Long)].collect().toSet
    val a = out(base.repartition(1))
    val b = out(base.repartition(7, col("doc_id")))
    val c = out(base.repartition(32))
    assert(a == b && b == c, "shuffle order must not depend on partitioning")
    // the prefix-sum ordinal must reproduce a per-shard row_number exactly
    val keyed = base
      .withColumn("sort_key", graft.functions.TextFunctions.portableHash(
        concat(lit("s1"), lit("|"), $"doc_id".cast("string"))))
      .withColumn("shard", pmod(graft.functions.TextFunctions.portableHash(
        concat(lit("s1"), lit("#"), $"doc_id".cast("string"))), lit(4))
        .cast("long"))
    val want = keyed.withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("sort_key", "doc_id")) - 1)
      .select($"doc_id", $"shard", $"sort_key", $"pos".cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == want)
    // every shard's positions are dense 0..n-1
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._4) == (0L until rows.size.toLong).toSet)
    }
  }

  test("materializePacks concatenates each pack in id order, null-safe") {
    val docs = Seq(
      (0L, "en", "a b", Some(2L)), (1L, "en", "c", Some(1L)),
      (2L, "en", "d d d", Some(3L)), (3L, "fr", "x", Some(1L)),
      (4L, "en", "skip", None), // null count -> null pack_id -> excluded
      // null text with a DECLARED count: a contract violation — it must
      // drop from the pack and its counts, not leave pack_tokens
      // claiming tokens pack_text never got
      (5L, "en", null.asInstanceOf[String], Some(2L)))
      .toDF("doc_id", "lang", "text", "nt")
    val packed = Corpus.packSequences(docs, "lang", "doc_id", col("nt"), 3)
    val out = Corpus.materializePacks(packed, "lang", "doc_id", "text")
      .orderBy("lang", "pack_id")
      .select("lang", "pack_id", "n_docs", "pack_tokens", "pack_text")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    // en: offsets 0,2,3 -> docs 0+1 fill pack 0 (3 tokens), doc 2 pack 1
    assert(out == Seq(
      ("en", 0L, 2L, 3L, "a b c"),
      ("en", 1L, 1L, 3L, "d d d"),
      ("fr", 0L, 1L, 1L, "x")))
  }

  test("materializeTokenPacks concatenates id arrays in id order, null-safe") {
    val docs = Seq(
      (0L, "en", Seq(7, 8), Some(2L)),
      (1L, "en", Seq(9), Some(1L)),
      (2L, "en", Seq(1, 2, 3), Some(3L)),
      (3L, "fr", Seq(4), Some(1L)),
      (4L, "en", Seq.empty[Int], Some(0L)),        // real zero-token doc: stays
      (5L, "en", null.asInstanceOf[Seq[Int]], None)) // null ids -> dropped
      .toDF("doc_id", "lang", "__ids", "nt")
    val packed = Corpus.packSequences(docs, "lang", "doc_id", col("nt"), 3)
    val out = Corpus.materializeTokenPacks(packed, "lang", "doc_id", "__ids")
      .orderBy("lang", "pack_id")
      .select("lang", "pack_id", "n_docs", "pack_tokens", "pack_ids",
        "doc_offsets")
      .as[(String, Long, Long, Long, Seq[Int], Seq[Int])].collect().toSeq
    // en offsets: doc0@0, doc1@2, doc2@3, doc4@6(zero) -> packs 0,0,1,2;
    // doc_offsets carry n_docs+1 boundaries (0, then each member's end)
    // — a zero-token member repeats the previous boundary
    assert(out == Seq(
      ("en", 0L, 2L, 3L, Seq(7, 8, 9), Seq(0, 2, 3)),
      ("en", 1L, 1L, 3L, Seq(1, 2, 3), Seq(0, 3)),
      ("en", 2L, 1L, 0L, Seq.empty[Int], Seq(0, 0)),
      ("fr", 0L, 1L, 1L, Seq(4), Seq(0, 1))))
  }

  test("unigram ids round-trip through the packer: decode equals the " +
      "member texts minus whitespace, segment-for-segment") {
    val docs = Seq(
      (1L, "en", "low lower low"), (2L, "en", "newest low"),
      (3L, "en", ""), // zero-token doc: zero-length segment, never lost
      (4L, "fr", "lowest newest"))
      .toDF("doc_id", "lang", "text")
    val pieces = Corpus.collectUnigramPieces(
      Corpus.buildUnigramVocab(docs, "text", maxPieceLen = 3,
        minCount = 2, maxSize = 20))
    val vocab = pieces.map(p => (p._1, p._2))
    val withIds = docs.select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.unigramEncode(col("text"), pieces)
          .as("__ids"))
      .withColumn("nt", size(col("__ids")).cast("long"))
    val packs = Corpus.materializeTokenPacks(
      Corpus.packSequences(withIds, "lang", "doc_id", col("nt"), 8),
      "lang", "doc_id", "__ids")
    val decoded = packs.select(col("lang"), col("pack_id"),
        graft.functions.TextFunctions.bpeDecode(col("pack_ids"), vocab)
          .as("txt"),
        transform(sequence(lit(1), size(col("doc_offsets")) - 1),
          i => graft.functions.TextFunctions.bpeDecode(
            slice(col("pack_ids"),
              element_at(col("doc_offsets"), i) + 1,
              element_at(col("doc_offsets"), i + 1)
                - element_at(col("doc_offsets"), i)), vocab)).as("segs"))
      .orderBy("lang", "pack_id")
      .as[(String, Long, String, Seq[String])].collect().toSeq
    // whole-pack decode = concat of its member segments, and the
    // segments are the member texts with whitespace removed, in order
    val expectSegs = Map(
      1L -> "lowlowerlow", 2L -> "newestlow", 3L -> "", 4L -> "lowestnewest")
    val allSegs = decoded.flatMap(_._4)
    assert(allSegs.sorted == expectSegs.values.toSeq.sorted)
    assert(decoded.forall { case (_, _, txt, segs) => txt == segs.mkString })
    // every doc's ids landed in exactly one pack (total token accounting)
    val totalIds = withIds.agg(sum(col("nt"))).collect()(0).getLong(0)
    assert(decoded.map(_._3.length).sum ==
      expectSegs.values.map(_.length).sum)
    assert(totalIds > 0)
  }

  test("learnBpeMerges matches the hand-trained Sennrich toy corpus") {
    // the ACL'16 example dictionary: low×5 lower×2 newest×6 widest×3.
    // Hand-run of count→top→merge under the (count DESC, lhs, rhs)
    // tie-break:
    //   1. (e,s)=9 ties (s,t)=9, lhs 'e' wins        → es
    //   2. (es,t)=9                                  → est
    //   3. (l,o)=7 ties (o,w)=7, lhs 'l' wins        → lo
    //   4. (lo,w)=7                                  → low
    //   5. (e,w)=6 ties (n,e),(w,est), lhs 'e' wins  → ew
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Corpus.learnBpeMerges(docs, "text", numMerges = 5)
      .orderBy("merge_rank")
      .select("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L),
      (5, "e", "w", "ew", 6L)))
    // slicing invariance: the dictionary aggregation makes the result
    // independent of how docs are partitioned
    val got7 = Corpus.learnBpeMerges(docs.repartition(7), "text", 5)
      .orderBy("merge_rank")
      .select("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got7 == got)
  }

  test("byte-level BPE: decode is the exact inverse of encode, " +
      "whitespace and all planes included") {
    import graft.functions.TextFunctions
    // every UTF-8 width, messy whitespace (leading, doubled, tabs,
    // trailing newline), and a supplementary-plane emoji (surrogate
    // pair in the JVM, 4 bytes in UTF-8)
    val texts = Seq(
      "  the café café serves  café\tau lait\n",
      "日本語→λ 😀😀 end ",
      "plain ascii words here",
      "\t\n", // all-whitespace doc: one leading-ws pretoken
      "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mt = Corpus.learnByteBpeMerges(docs, "text", numMerges = 8)
    val merges = Corpus.collectMerges(mt)
    val vocab = Corpus.byteMergeVocab(mt)
    // vocab layout: all 256 byte symbols at ids 1..256, merges above
    val vm = vocab.toMap
    assert((0 until 256).forall(b => vm(String.valueOf(b.toChar)) == b + 1))
    assert(vocab.count(_._2 > 256) == merges.length)
    val out = docs.select(col("doc_id"),
        TextFunctions.byteBpeEncode(col("text"), merges, vocab).as("ids"))
      .select(col("doc_id"), col("ids"),
        TextFunctions.byteBpeDecode(col("ids"), vocab).as("back"))
      .as[(Long, Seq[Int], String)].collect().sortBy(_._1)
    // EXACT identity — not the stripped-text contract
    out.foreach { case (id, ids, back) =>
      assert(back == texts(id.toInt), s"doc $id roundtrip")
      assert(!ids.contains(0), s"doc $id emitted UNK") // structurally impossible
    }
    // merges compress: total ids strictly under total bytes on a
    // corpus with repeated byte pairs
    val totalIds = out.map(_._2.length).sum
    val totalBytes = texts.map(_.getBytes("UTF-8").length).sum
    assert(totalIds < totalBytes)
    // UNK impossible even on text DISJOINT from the training corpus
    val alien = Seq((9L, "zürich øre 🤖"))
      .toDF("doc_id", "text")
    val alienOut = alien.select(
        TextFunctions.byteBpeEncode(col("text"), merges, vocab).as("ids"),
        TextFunctions.byteBpeDecode(TextFunctions.byteBpeEncode(col("text"),
          merges, vocab), vocab).as("back"))
      .as[(Seq[Int], String)].collect()(0)
    assert(!alienOut._1.contains(0) &&
      alienOut._2 == "zürich øre 🤖")
  }

  test("learnByteBpeMerges learns byte pairs over whitespace-preserving " +
      "pretokens") {
    // "ab ab ab": pretokens "ab " ×2 + "ab" ×1 -> pairs (a,b)=3,
    // (b,' ')=2; rank 1 merges (a,b), rank 2 merges ("ab", ' ')
    val docs = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val got = Corpus.learnByteBpeMerges(docs, "text", numMerges = 2)
      .orderBy("merge_rank")
      .select("merge_rank", "lhs", "rhs", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 3L), (2, "ab", " ", 2L)))
  }

  test("learned merges apply through the q137 trie (alphabet + merged pieces)") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merged = Corpus.learnBpeMerges(docs, "text", numMerges = 5)
      .select("merged").as[String].collect().toSeq
    // deployment vocabulary: corpus alphabet as fallback + the learned
    // merge products; greedy longest-match inference (WordPiece MaxMatch
    // over a learned-BPE vocabulary)
    val alphabet = words.flatMap(_.toSeq).distinct.sorted.map(_.toString)
    val pieces = (alphabet ++ merged).zipWithIndex
      .map { case (p, i) => (p, i + 1) }
    val id2piece = pieces.map(_.swap).toMap
    val enc = docs.limit(0).sparkSession.createDataFrame(Seq(
        Tuple1("newest"), Tuple1("lowest"), Tuple1("wider")))
      .toDF("text")
      .select(graft.functions.TextFunctions.bpeEncode(col("text"), pieces)
        .as("ids"))
      .as[Seq[Int]].collect().toSeq
      .map(_.map(id2piece))
    // newest = n + ew + est (exactly the hand-trained BPE segmentation);
    // lowest reuses low + est on a word the training never saw whole;
    // wider falls back through w,i,d + e,r singles
    assert(enc == Seq(
      Seq("n", "ew", "est"),
      Seq("low", "est"),
      Seq("w", "i", "d", "e", "r")))
  }

  test("collectMerges restores rank order from any table order") {
    // the load-bearing property: merges apply IN RANK ORDER, and a
    // persisted table read back (parquet, shuffled, reversed) does not
    // arrive rank-ordered — collectMerges must re-impose it
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val table = Corpus.learnBpeMerges(docs, "text", numMerges = 5)
    val expect = Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w",
      "e" -> "w")
    assert(Corpus.collectMerges(table) == expect)
    assert(Corpus.collectMerges(
      table.orderBy(col("merge_rank").desc)) == expect)
    assert(Corpus.collectMerges(table.repartition(7)) == expect)
    // and the apply kernel really is order-sensitive: rank order and
    // reversed order segment "newest" differently under these merges
    // (rank: es,est,ew -> n|ew|est = 3; reversed applies (e,w) first)
    val one = Seq((1L, "newest")).toDF("doc_id", "text")
    val byRank = one.select(graft.functions.TextFunctions
      .bpeMergeCount(col("text"), expect)).collect()(0).getInt(0)
    val reversed = one.select(graft.functions.TextFunctions
      .bpeMergeCount(col("text"), expect.reverse)).collect()(0).getInt(0)
    assert(byRank == 3)
    assert(byRank != reversed)
  }

  test("learnBpeMerges stops early when no pair meets minPairCount") {
    val docs = Seq((0L, "ab cd ab")).toDF("doc_id", "text")
    val got = Corpus.learnBpeMerges(docs, "text", numMerges = 10,
        minPairCount = 2L)
      .select("merge_rank", "merged", "pair_count")
      .as[(Int, String, Long)].collect().toSeq
    // only (a,b)=2 reaches the floor; after that merge every surviving
    // pair counts 1 and the loop stops at rank 1 of 10
    assert(got == Seq((1, "ab", 2L)))
  }

  test("buildMergeVocab: sorted alphabet 1..A, merges at A+rank, min-id") {
    val docs = Seq((1L, "cab cab ba")).toDF("doc_id", "text")
    // alphabet {a,b,c} sorted → a=1 b=2 c=3; merges offset by A=3
    val mt = Seq((1, "c", "a", "ca", 2L), (2, "ca", "b", "cab", 2L))
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
    val v = Corpus.buildMergeVocab(docs, "text", mt).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v == Map("a" -> 1, "b" -> 2, "c" -> 3, "ca" -> 4, "cab" -> 5))
    // two merges producing the same string keep the lower-rank id
    val mt2 = Seq((1, "a", "b", "ab", 9L), (2, "x", "y", "ab", 1L))
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
    val v2 = Corpus.buildMergeVocab(docs, "text", mt2).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v2("ab") == 4)
    // and it drives the encode kernel end to end: the learned
    // tokenizer's ids match a hand segmentation
    val ids = docs.select(graft.functions.TextFunctions.bpeMergeEncode(
        col("text"), Seq(("c", "a"), ("ca", "b")), v.toSeq).as("ids"))
      .collect().head.getSeq[Int](0)
    assert(ids == Seq(5, 5, 2, 1)) // cab cab b a
  }

  test("unified tokenizer artifact round-trips both kinds, one loader") {
    val docs = Seq((1L, "low lower low low"), (2L, "newest widest lowest"))
      .toDF("doc_id", "text")
    val builtMax = MaxMatchTokenizer(Corpus.collectPieces(
      Corpus.buildPieceVocab(docs, "text", minCount = 2, maxSize = 10)))
    val mt = Corpus.learnBpeMerges(docs, "text", numMerges = 3)
    val builtMerge = MergeTokenizer(Corpus.collectMerges(mt),
      Corpus.collectPieces(Corpus.buildMergeVocab(docs, "text", mt)))
    val dir = java.nio.file.Files.createTempDirectory("tok_art_").toString
    Tokenizer.save(spark, builtMax, s"$dir/max")
    Tokenizer.save(spark, builtMerge, s"$dir/mrg")
    // the artifact's kind column, not the call site, picks the family
    val lm = Tokenizer.load(spark, s"$dir/max") match {
      case m: MaxMatchTokenizer => m
      case other => fail(s"maxmatch artifact loaded as $other")
    }
    val lg = Tokenizer.load(spark, s"$dir/mrg") match {
      case m: MergeTokenizer => m
      case other => fail(s"merge artifact loaded as $other")
    }
    // model equality: vocabularies order-normalized, merges RANK order
    assert(lm.pieces.toSet == builtMax.pieces.toSet)
    assert(lg.merges == builtMerge.merges)
    assert(lg.vocab.toSet == builtMerge.vocab.toSet)
    // loaded handles drive the kernels identically to the built ones
    val r = docs.select(
      builtMax.count(col("text")).as("a"), lm.count(col("text")).as("b"),
      builtMerge.encode(col("text")).as("c"), lg.encode(col("text")).as("d"))
      .collect()
    assert(r.forall(x => x.getInt(0) == x.getInt(1)
      && x.getSeq[Int](2) == x.getSeq[Int](3)))
    // a frame carrying two kinds is not an artifact
    val mixed = Tokenizer.toArtifact(spark, builtMax)
      .unionByName(Tokenizer.toArtifact(spark, builtMerge))
    intercept[IllegalArgumentException] { Tokenizer.fromArtifact(mixed) }
  }

  test("learnUnigram shrinks to the target vocab, keeps coverage, and " +
      "its result is a working tokenizer") {
    val docs = Seq(
      (1L, "low lower low low lowest"),
      (2L, "newest widest lowest low lower"),
      (3L, "low lowest newest newest wide")).toDF("doc_id", "text")
    val seed = Corpus.collectUnigramPieces(
      Corpus.buildUnigramVocab(docs, "text", maxPieceLen = 3,
        minCount = 2, maxSize = 50))
    val singles = seed.count(_._1.length == 1)
    // target between |singles| and the seed size so the shrink bites
    val target = singles + 3
    val learned = Corpus.learnUnigram(docs, "text", vocabSize = target,
      rounds = 8, maxPieceLen = 3, minCount = 2, seedSize = 50)
    // every single character survives (coverage is never pruned) and
    // the multi-piece count landed exactly on the target's budget
    assert(seed.filter(_._1.length == 1).map(_._1).toSet
      .subsetOf(learned.map(_._1).toSet))
    assert(learned.count(_._1.length > 1) == 3)
    // ids are stable: every learned piece keeps its seed id
    val seedIds = seed.map(p => p._1 -> p._2).toMap
    assert(learned.forall(p => seedIds(p._1) == p._2))
    // the learned table drives the Viterbi kernel: encode covers the
    // build corpus with no UNK (id 0)
    val ids = docs.select(explode(
        graft.functions.TextFunctions.unigramEncode(col("text"), learned))
        .as("id")).collect().map(_.getInt(0))
    assert(ids.nonEmpty && !ids.contains(0))
    // deterministic: a second run reproduces the table exactly
    assert(Corpus.learnUnigram(docs, "text", vocabSize = target,
      rounds = 8, maxPieceLen = 3, minCount = 2, seedSize = 50) == learned)
    // guards
    intercept[IllegalArgumentException] {
      Corpus.learnUnigram(docs, "text", vocabSize = 0, rounds = 2) }
    intercept[IllegalArgumentException] {
      Corpus.learnUnigram(docs, "text", vocabSize = 10, rounds = 0) }
  }

  test("unigramSoftCounts: exact lattice marginals, and soft-EM " +
      "provably diverges from hard-EM on an ambiguous dictionary") {
    // the hand lattice: word "ab", pieces a(3) ab(2) b(3), Z = 8.
    // Two segmentations: [ab] with homogenized weight 2·8 = 16 and
    // [a][b] with 3·3 = 9 → A = 25. Lattice marginals (exact):
    // e(ab) = 16/25 = 0.64, e(a) = e(b) = 9/25 = 0.36. Viterbi takes
    // [ab] alone — hard usage (ab → 1, a/b → 0). The divergence the
    // soft E-step exists for: mass on the runner-up path.
    val pieces = Seq(("a", 1, 3L), ("ab", 2, 2L), ("b", 3, 3L))
    val soft = Seq("ab").toDF("tok")
      .select(explode(graft.functions.TextFunctions.unigramSoftCounts(
        col("tok"), pieces, expScale = 1000000L)).as("s"))
      .select(col("s.id"), col("s.e"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    assert(soft == Seq((1, 360000L), (2, 640000L), (3, 360000L)))
    // hard E-step on the same model (smaller numerator = higher cost):
    // Viterbi usage puts EVERYTHING on [ab] — ids a/b never appear
    val costs = pieces.map { case (p, id, n) => (p, id, 10L - n) }
    val hardIds = Seq("ab").toDF("tok")
      .select(explode(graft.functions.TextFunctions.unigramEncode(
        col("tok"), costs)).as("id"))
      .collect().map(_.getInt(0)).toSeq
    assert(hardIds == Seq(2))
    // quantization floors, never rounds (thirds on a 4-grid)
    val third = Seq(("x", 1, 1L), ("xx", 2, 1L), ("xxx", 3, 0L))
    // Z = 2; word "xx": [xx] weight 1·2 = 2, [x][x] 1·1 = 1, A = 3
    val q = Seq("xx").toDF("tok")
      .select(explode(graft.functions.TextFunctions.unigramSoftCounts(
        col("tok"), third, expScale = 4L)).as("s"))
      .select(col("s.id"), col("s.e"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    // e(x) = ⌊4·(1+1)/3⌋ = 2 (both occurrences ride the [x][x] path),
    // e(xx) = ⌊4·2/3⌋ = 2 — the exact 8/3 and 8/3 floor identically
    assert(q == Seq((1, 2L), (2, 2L)))
    // a word whose only tilings use zero-numerator pieces throws
    intercept[Exception] {
      Seq("xxx").toDF("tok")
        .select(explode(graft.functions.TextFunctions.unigramSoftCounts(
          col("tok"), Seq(("x", 1, 0L), ("xxx", 3, 0L)), 10L)).as("s"))
        .collect()
    }
  }

  test("learnUnigram softEm mode: lattice E-step keeps runner-up mass " +
      "and diverges from the hard loop where ambiguity persists") {
    // "ab" dominates, so every round the lattice splits mass between
    // [ab] and [a][b] while Viterbi puts everything on [ab] — the
    // single-char usages (and so the cost table) stay apart at the
    // fixed point, not just mid-trajectory
    val docs = Seq(
      (1L, "ab ab ab ab"),
      (2L, "ab ab cd cd"),
      (3L, "cd ab ab ef")).toDF("doc_id", "text")
    val seed = Corpus.collectUnigramPieces(
      Corpus.buildUnigramVocab(docs, "text", maxPieceLen = 2,
        minCount = 2, maxSize = 50))
    val singles = seed.count(_._1.length == 1)
    val target = singles + 2 // keeps both "ab" and "cd"
    val hard = Corpus.learnUnigram(docs, "text", vocabSize = target,
      rounds = 1, maxPieceLen = 2, minCount = 2, seedSize = 50)
    val soft = Corpus.learnUnigram(docs, "text", vocabSize = target,
      rounds = 1, maxPieceLen = 2, minCount = 2, seedSize = 50,
      softEm = true)
    // the E-steps diverge: under Viterbi the letters a/b carry ZERO
    // usage (every "ab" token encodes as the one piece), so hard-EM
    // maxes their costs after one round; the lattice assigns the
    // [a][b] segmentation its true probability mass (~23% of the seed
    // model), so soft-EM costs them strictly cheaper. (Further rounds
    // show EM's rich-get-richer dynamic: the runner-up mass decays
    // geometrically and the two modes meet at the same local optimum —
    // the divergence is the E-step's, pinned here at one round.)
    def cost(t: Seq[(String, Int, Long)], p: String): Long =
      t.find(_._1 == p).get._3
    val maxCost = graft.functions.UnigramDefaults.costScale + 1
    assert(cost(hard, "a") == maxCost && cost(hard, "b") == maxCost)
    assert(cost(soft, "a") < maxCost && cost(soft, "b") < maxCost)
    assert(hard != soft)
    // both modes keep the budget, coverage, and stable ids
    assert(hard.count(_._1.length > 1) == 2)
    assert(soft.count(_._1.length > 1) == 2)
    assert(soft.filter(_._1.length == 1).map(_._1).toSet ==
      hard.filter(_._1.length == 1).map(_._1).toSet)
    // soft mode is deterministic, at one round and at its fixed point
    assert(Corpus.learnUnigram(docs, "text", vocabSize = target,
      rounds = 1, maxPieceLen = 2, minCount = 2, seedSize = 50,
      softEm = true) == soft)
    assert(Corpus.learnUnigram(docs, "text", vocabSize = target,
        rounds = 4, maxPieceLen = 2, minCount = 2, seedSize = 50,
        softEm = true) ==
      Corpus.learnUnigram(docs, "text", vocabSize = target,
        rounds = 4, maxPieceLen = 2, minCount = 2, seedSize = 50,
        softEm = true))
    // and its table still drives the Viterbi kernel UNK-free
    val ids = docs.select(explode(
        graft.functions.TextFunctions.unigramEncode(col("text"), soft))
        .as("id")).collect().map(_.getInt(0))
    assert(ids.nonEmpty && !ids.contains(0))
  }

  test("unigram tokenizer persists costs in the unified artifact and " +
      "refuses corruption loudly") {
    val docs = Seq((1L, "low lower low low"), (2L, "newest widest lowest"))
      .toDF("doc_id", "text")
    val built = UnigramTokenizer(Corpus.collectUnigramPieces(
      Corpus.buildUnigramVocab(docs, "text", maxPieceLen = 3,
        minCount = 2, maxSize = 10)))
    val dir = java.nio.file.Files.createTempDirectory("tok_uni_").toString
    Tokenizer.save(spark, built, s"$dir/uni")
    val loaded = Tokenizer.load(spark, s"$dir/uni") match {
      case u: UnigramTokenizer => u
      case other => fail(s"unigram artifact loaded as $other")
    }
    assert(loaded.pieces.toSet == built.pieces.toSet)
    val r = docs.select(built.encode(col("text")).as("a"),
        loaded.encode(col("text")).as("b")).collect()
    assert(r.forall(x => x.getSeq[Int](0) == x.getSeq[Int](1)))
    // a null cost is corruption, not a default — the Viterbi table is
    // meaningless without it
    val corrupted = Tokenizer.toArtifact(spark, built)
      .withColumn("cost", when(col("piece") === built.pieces.head._1,
        lit(null).cast("long")).otherwise(col("cost")))
    intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(corrupted) }
    // a non-default unkCost cannot ship (no schema column to carry it)
    intercept[IllegalArgumentException] {
      Tokenizer.toArtifact(spark, built.copy(unkCost = 7L)) }
    // duplicate ids would silently merge hard-EM usage counts keyed by
    // id — refused like the merge family's rank 1..k check
    val firstId = built.pieces.head._2
    val dupId = Tokenizer.toArtifact(spark, built)
      .withColumn("id", when(col("id") === built.pieces.last._2,
        lit(firstId)).otherwise(col("id")))
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(dupId) }.getMessage.contains("duplicate"))
    // id 0 collides with the reserved UNK; negatives are corruption too
    val zeroId = Tokenizer.toArtifact(spark, built)
      .withColumn("id", when(col("id") === firstId, lit(0))
        .otherwise(col("id")))
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(zeroId) }.getMessage.contains("reserved UNK"))
    // pre-cost artifacts (no cost column at all) still load for the
    // older kinds
    val legacy = Tokenizer.toArtifact(spark,
      MaxMatchTokenizer(Seq(("a", 1), ("b", 2)))).drop("cost")
    assert(Tokenizer.fromArtifact(legacy)
      .isInstanceOf[MaxMatchTokenizer])
  }

  test("byte tokenizer persists in the unified artifact and loads back " +
      "identical, control-char symbols included") {
    import graft.functions.TextFunctions
    val docs = Seq((1L, "  ab ab\tab\n"), (2L, "日本 😀 ab "))
      .toDF("doc_id", "text")
    val mt = Corpus.learnByteBpeMerges(docs, "text", numMerges = 4)
    val built = ByteMergeTokenizer(Corpus.collectMerges(mt),
      Corpus.byteMergeVocab(mt))
    val dir = java.nio.file.Files.createTempDirectory("tok_byte_").toString
    Tokenizer.save(spark, built, s"$dir/byte")
    val loaded = Tokenizer.load(spark, s"$dir/byte") match {
      case b: ByteMergeTokenizer => b
      case other => fail(s"bytemerge artifact loaded as $other")
    }
    // the 256-byte alphabet (control chars, NUL included) survives the
    // parquet round trip symbol for symbol
    assert(loaded.merges == built.merges &&
      loaded.vocab.toSet == built.vocab.toSet)
    val r = docs.select(col("text"),
        built.encode(col("text")).as("a"), loaded.encode(col("text")).as("b"))
      .select(col("text"), col("a"), col("b"),
        loaded.decode(col("b")).as("back"))
      .collect()
    assert(r.forall(x => x.getSeq[Int](1) == x.getSeq[Int](2)
      && x.getString(3) == x.getString(0))) // EXACT text back
    // an artifact whose alphabet doesn't cover all 256 bytes would
    // resurrect UNK — refused at load
    val holey = Tokenizer.toArtifact(spark, built)
      .where(col("id").isNull || col("id") =!= 7)
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(holey) }.getMessage.contains("256"))
    // id coverage alone is not enough: a row can cover id b+1 with the
    // WRONG piece — the mapping itself is asserted, so this is refused
    // too instead of loading and resurrecting UNK on byte 0x07
    val wrongPiece = Tokenizer.toArtifact(spark, built)
      .withColumn("piece", when(col("id") === 7, lit("seven"))
        .otherwise(col("piece")))
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(wrongPiece) }.getMessage.contains("256"))
  }

  test("gpt2-pretokenizer byte tokenizer round-trips through the " +
      "artifact as its own kind; custom patterns refuse to ship") {
    import graft.functions.ByteBpeKernel
    val docs = Seq((1L, "we don't stop  now"), (2L, " don't 123 😀 "))
      .toDF("doc_id", "text")
    val mt = Corpus.learnByteBpeMerges(docs, "text", numMerges = 3,
      pretokPattern = ByteBpeKernel.gpt2Pattern)
    val built = ByteMergeTokenizer(Corpus.collectMerges(mt),
      Corpus.byteMergeVocab(mt), pretokPattern = ByteBpeKernel.gpt2Pattern)
    assert(built.kind == Tokenizer.ByteMergeGpt2)
    val dir = java.nio.file.Files.createTempDirectory("tok_gpt2_").toString
    Tokenizer.save(spark, built, s"$dir/gpt2")
    val loaded = Tokenizer.load(spark, s"$dir/gpt2") match {
      case b: ByteMergeTokenizer => b
      case other => fail(s"bytemerge_gpt2 artifact loaded as $other")
    }
    // the pretokenizer mode survives the round trip (it is PART of the
    // model: the same merges under the default pretokenizer would emit
    // different ids on multi-space/contraction text)
    assert(loaded.pretokPattern == ByteBpeKernel.gpt2Pattern)
    val r = docs.select(col("text"),
        built.encode(col("text")).as("a"), loaded.encode(col("text")).as("b"))
      .select(col("text"), col("a"), col("b"),
        loaded.decode(col("b")).as("back"))
      .collect()
    assert(r.forall(x => x.getSeq[Int](1) == x.getSeq[Int](2)
      && x.getString(3) == x.getString(0)))
    // a custom pattern can't round-trip through the unified schema —
    // refused at the WRITE end (an artifact every future load rejects
    // must never ship), and the loader refuses the kind independently
    val custom = ByteMergeTokenizer(built.merges, built.vocab,
      pretokPattern = "[a-z]+|[^a-z]+")
    val dir2 = java.nio.file.Files.createTempDirectory("tok_cust_").toString
    assert(intercept[IllegalArgumentException] {
      Tokenizer.save(spark, custom, s"$dir2/c")
    }.getMessage.contains("not artifact-shippable"))
    val foreignKind = Tokenizer.toArtifact(spark, built)
      .withColumn("tokenizer_kind", lit("bytemerge_custom_pretok"))
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(foreignKind)
    }.getMessage.contains("unknown tokenizer_kind"))
  }

  test("malformed tokenizer artifacts fail loudly, never load silently") {
    def art(rows: Seq[(String, String, Integer, Integer, String, String)]) =
      rows.toDF("tokenizer_kind", "piece", "id", "merge_rank", "lhs", "rhs")
    // a null lhs in a merge row
    val nullLhs = art(Seq(
      ("merge", "a", 1, null, null, null),
      ("merge", null, null, 1, null, "b")))
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(nullLhs) }.getMessage.contains("null lhs/rhs"))
    // duplicate merge_rank values
    val dupRank = art(Seq(
      ("merge", "a", 1, null, null, null),
      ("merge", null, null, 1, "a", "b"),
      ("merge", null, null, 1, "b", "a")))
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(dupRank) }.getMessage.contains("merge_rank"))
    // a gapped rank (1,3) reorders the apply walk — refused too
    val gapRank = art(Seq(
      ("merge", "a", 1, null, null, null),
      ("merge", null, null, 1, "a", "b"),
      ("merge", null, null, 3, "b", "a")))
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(gapRank) }.getMessage.contains("merge_rank"))
    // a vocabulary row with a null id
    val nullId = art(Seq(("maxmatch", "a", null, null, null, null)))
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(nullId) }.getMessage.contains("null id"))
    // a merge-kind row that is neither vocab nor merge
    val stray = art(Seq(
      ("merge", "a", 1, null, null, null),
      ("merge", null, null, null, null, null)))
    assert(intercept[IllegalArgumentException] {
      Tokenizer.fromArtifact(stray) }.getMessage.contains("neither"))
  }

  test("packSequencesNoSplit runs first-fit-decreasing inside one bucket") {
    // sizes 6,5,4,3,2 under budget 10: FFD opens {6,4} and {5,3,2}
    val docs = Seq((1L, 6L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 2L))
      .toDF("doc_id", "n").withColumn("lang", lit("en"))
    val out = Corpus.packSequencesNoSplit(docs, "lang", "doc_id",
        col("n"), tokenBudget = 10, nBuckets = 1)
      .select($"pack_seq", $"doc_id").as[(Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out.values.toSet == Set(Set(1L, 3L), Set(2L, 4L, 5L)))
  }

  test("packSequencesNoSplit: oversize docs get singleton packs, nulls are excluded") {
    val docs = Seq((1L, Some(15L)), (2L, Some(4L)), (3L, Some(4L)),
        (4L, None))
      .toDF("doc_id", "n").withColumn("lang", lit("en"))
    val rows = Corpus.packSequencesNoSplit(docs, "lang", "doc_id",
        col("n"), tokenBudget = 10, nBuckets = 1)
      .select($"pack_seq", $"doc_id", $"n_tokens")
      .as[(Int, Long, Long)].collect().toSeq
    assert(rows.map(_._2).toSet == Set(1L, 2L, 3L)) // null-cost doc absent
    val byPack = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the 15-token doc sits alone (fill > budget blocks all joiners);
    // the two 4-token docs share one pack
    assert(byPack.values.toSet == Set(Set(1L), Set(2L, 3L)))
  }

  test("packSequencesNoSplit is partition-independent and within budget") {
    val docs = (0 until 400)
      .map(i => (i.toLong, 1L + i % 97, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "n", "lang")
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.packSequencesNoSplit(df, "lang", "doc_id", col("n"),
          tokenBudget = 256, nBuckets = 4)
        .select($"shard", $"bucket", $"pack_seq", $"doc_id")
        .as[(String, Long, Int, Long)].collect().toSet
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a == b) // pack contents depend on ids, never on partitioning
    assert(a.size == 400) // every doc placed exactly once
    // every pack within budget (no doc here exceeds it)
    val fills = Corpus.packSequencesNoSplit(docs, "lang", "doc_id",
        col("n"), tokenBudget = 256, nBuckets = 4)
      .groupBy($"shard", $"bucket", $"pack_seq")
      .agg(sum($"n_tokens").as("fill"))
      .select($"fill").as[Long].collect()
    assert(fills.forall(_ <= 256))
    // first-fit theorem: at most one ≤-half-full pack per group
    val halfByGroup = Corpus.packSequencesNoSplit(docs, "lang", "doc_id",
        col("n"), tokenBudget = 256, nBuckets = 4)
      .groupBy($"shard", $"bucket", $"pack_seq")
      .agg(sum($"n_tokens").as("fill"))
      .where($"fill" * 2 <= 256)
      .groupBy($"shard", $"bucket").count()
      .select($"count").as[Long].collect()
    assert(halfByGroup.forall(_ <= 1))
  }

  test("tokenDistributionDrift: exact cross-multiplied TVD contributions") {
    val a = Seq("x x y", "x").toDF("text") // x:3 y:1, T_a=4
    val b = Seq("x z", null.asInstanceOf[String]).toDF("text") // x:1 z:1, T_b=2
    val got = Corpus.tokenDistributionDrift(a, b, "text")
      .orderBy("token")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).longValueExact())).toSeq
    // drift_num = |n_a*T_b - n_b*T_a|: x |3*2-1*4|=2, y |1*2-0|=2,
    // z |0-1*4|=4
    assert(got == Seq(("x", 3L, 1L, 2L), ("y", 1L, 0L, 2L),
      ("z", 0L, 1L, 4L)))
    // ngram=2 drifts the shingle distribution; a doc shorter than n
    // contributes its whole-doc shingle (the suite's fixed semantics)
    val g2 = Corpus.tokenDistributionDrift(
        Seq("x y z").toDF("text"), Seq("x y", "q").toDF("text"),
        "text", ngram = 2)
      .orderBy("token")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // side a grams: "x y","y z" (T_a=2); side b: "x y" + whole-doc "q"
    assert(g2 == Seq(("q", 0L, 1L), ("x y", 1L, 1L), ("y z", 1L, 0L)))
  }

  test("attributeRejections: first stage wins, accepted fills the rest") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val got = Corpus.attributeRejections(docs, "doc_id", Seq(
        "alpha" -> Seq(2L, 3L).toDF("doc_id"),
        "beta" -> Seq(3L, 4L).toDF("doc_id")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // 3 is in both reject sets — the EARLIER stage owns it
    assert(got == Seq((1L, "accepted"), (2L, "alpha"), (3L, "alpha"),
      (4L, "beta")))
    intercept[IllegalArgumentException] {
      Corpus.attributeRejections(docs, "doc_id",
        Seq("a" -> docs, "a" -> docs)) }
    intercept[IllegalArgumentException] {
      Corpus.attributeRejections(docs, "doc_id",
        Seq("accepted" -> docs)) }
    intercept[IllegalArgumentException] {
      Corpus.attributeRejections(docs, "doc_id", Seq.empty) }
  }
}
