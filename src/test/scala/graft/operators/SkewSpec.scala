package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + tail keys
  private lazy val skewed = spark.range(1000)
    .select(
      when($"id" < 900, "HOT").otherwise(concat(lit("k"), $"id" % 37)).as("key"),
      $"id".as("v"))

  test("saltedAgg equals the plain groupBy aggregation") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    val salted = Skew.saltedAgg(skewed, Seq("key"), $"v", 16)(
        partials = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
        finals = Seq(sum($"n").as("n"), sum($"s").as("s")))
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin equals the plain equi-join") {
    val dim = Seq(("HOT", "hot-attr"), ("k1", "a1"), ("k2", "a2"))
      .toDF("key", "attr")
    val plain = skewed.join(dim, Seq("key"))
      .orderBy("key", "v").as[(String, Long, String)].collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("key"), $"v", 8)
      .select("key", "v", "attr")
      .orderBy("key", "v").as[(String, Long, String)].collect().toSeq
    assert(salted == plain)
  }

  // pathological clustered embedding corpus: 240 of 300 vectors are tiny
  // jitters around ONE direction, so k-means concentrates them in a single
  // hot cell — the shape that made the unbounded cell self-join go
  // quadratic on one straggler task
  private lazy val clusteredEmbeddings = {
    val dim = 8
    (0L until 300L).map { i =>
      val v =
        if (i < 240)
          Array.tabulate(dim)(d =>
            (if (d == 0) 100f else 1f) + (i % 7) * 0.001f * (d + 1))
        else
          Array.tabulate(dim)(d =>
            if (d == (i % dim).toInt) 50f + i * 0.01f else 1f)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("oversized IVF cells split into hash blocks bounded by the cap") {
    val cap = 32L
    val cent = Similarity.kmeans(clusteredEmbeddings, 4, 2)
    val asg = Similarity.ivfAssignN(clusteredEmbeddings, cent, 2)
    val blocked = Dedup.withCellBlocks(asg, cap, "vec_id")
    val cellStats = blocked.groupBy("cell")
      .agg(count(lit(1)).as("cnt"), max($"__nblk").as("nblk"),
        min($"__nblk").as("nblk_min"))
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    // block count is exactly ceil(cnt / cap), uniform within the cell
    assert(cellStats.forall { case (cnt, nblk, nblkMin) =>
      nblk == nblkMin && nblk == math.ceil(cnt.toDouble / cap).toInt })
    // the hot cell genuinely splits
    assert(cellStats.exists(_._2 > 1), s"fixture not skewed: ${cellStats.toSeq}")
    // no hash block exceeds 2× the cap (hash-balance margin) — the bound
    // every within-cell join task inherits
    val maxBlock = blocked.groupBy("cell", "__blk").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxBlock <= 2 * cap, s"block of $maxBlock rows exceeds 2×cap")
  }

  test("bounded cell pairs equal the unbounded cell join; subset of exact") {
    def auto(cap: Long) = Dedup.embeddingNearDupPairsAuto(
      clusteredEmbeddings, threshold = 0.9, allPairsRowLimit = 10,
      cells = 4, nprobe = 2, maxCellRows = cap)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bounded = auto(32)       // hot cell splits into ≥ 8 blocks
    val unbounded = auto(1000000) // one block per cell = plain cell join
    assert(bounded == unbounded,
      "block decomposition must not change the pair set")
    val exact = Dedup.embeddingNearDupPairs(clusteredEmbeddings, 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded.subsetOf(exact), "verified pairs must be exact")
    assert(bounded.nonEmpty)
  }

  test("semanticDedup keep labels are invariant under the hot-cell cap") {
    val cent = Similarity.kmeans(clusteredEmbeddings, 4, 2)
    def keeps(cap: Long) = Similarity.semanticDedup(
      clusteredEmbeddings, cent, threshold = 0.9, maxCellRows = cap)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    val capped = keeps(32)        // the 240-row hot cell splits into blocks
    val unbounded = keeps(1000000) // one block per cell = the plain join
    assert(capped == unbounded,
      "block decomposition must not change the keep labels")
    // the fixture genuinely exercises both outcomes
    assert(capped.values.exists(identity) && capped.values.exists(!_))
    assert(capped.size == 300)
  }

  test("salt is deterministic across evaluations") {
    val a = skewed.select(Skew.saltOf($"v", 16).as("s")).collect().map(_.getInt(0))
    val b = skewed.select(Skew.saltOf($"v", 16).as("s")).collect().map(_.getInt(0))
    assert(a.toSeq == b.toSeq)
    assert(a.toSet.subsetOf((0 until 16).toSet))
  }
}
