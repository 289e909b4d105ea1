package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 2-d corpus with two obvious clusters around the axes
  private val emb = Seq(
    (0L, Array(1.0f, 0.0f)),   // centroid-ish x
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.8f, 0.2f)),
    (10L, Array(0.0f, 1.0f)),  // centroid-ish y
    (11L, Array(0.1f, 0.9f)),
    (12L, Array(0.2f, 0.8f))
  ).toDF("vec_id", "embedding")

  private val centroids = Seq(
    (100L, Array(1.0f, 0.0f)),
    (200L, Array(0.0f, 1.0f))
  ).toDF("centroid_id", "cvec")

  test("bruteForceTopK ranks by cosine desc, excludes self, caps at k") {
    val q = emb.where($"vec_id" === 0L)
    val out = Similarity.bruteForceTopK(emb, q, k = 2)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((0L, 1L, 1), (0L, 2L, 2))) // x-cluster first, no self
  }

  test("ivfAssign puts each vector in its nearest centroid's cell") {
    val cells = Similarity.ivfAssign(emb, centroids)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(Seq(0L, 1L, 2L).forall(cells(_) == 100L))
    assert(Seq(10L, 11L, 12L).forall(cells(_) == 200L))
  }

  test("ivfTopK nprobe=1 only sees the query's own cell") {
    val q = emb.where($"vec_id" === 0L)
    val out = Similarity.ivfTopK(emb, q, centroids, k = 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L)) // y-cluster invisible at nprobe=1
  }

  test("ivfTopK nprobe=2 widens recall to the second cell") {
    val q = emb.where($"vec_id" === 0L)
    val out = Similarity.ivfTopK(emb, q, centroids, k = 5, nprobe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 10L, 11L, 12L))
  }

  test("kmeans separates obvious clusters and feeds ivfTopK") {
    val rng = new scala.util.Random(3)
    def around(base: Array[Float]) =
      base.map(x => x + rng.nextFloat() * 0.05f)
    val cl1 = Array(1.0f, 0.0f, 0.0f)
    val cl2 = Array(0.0f, 1.0f, 0.0f)
    val vecs = (0 until 30).map(i =>
      (i.toLong, around(if (i % 2 == 0) cl1 else cl2)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val centroids = Similarity.kmeans(corpus, k = 2, iterations = 4)
    assert(centroids.count() == 2)
    // each trained centroid should align strongly with one cluster axis
    val cs = centroids.orderBy("centroid_id")
      .select("cvec").as[Array[Float]].collect()
    val axes = cs.map(c => c.zipWithIndex.maxBy(_._1)._2).toSet
    assert(axes == Set(0, 1), s"centroids ${cs.map(_.toSeq).toSeq}")
    // ANN through the trained index finds same-cluster neighbors only
    val q = corpus.where($"vec_id" === 0L)
    val nn = Similarity.ivfTopK(corpus, q, centroids, k = 5)
      .select("neighbor_id").as[Long].collect()
    assert(nn.nonEmpty && nn.forall(_ % 2 == 0)) // cluster-1 members are even ids
  }

  test("kmeans is deterministic across runs") {
    val corpus = (0 until 20).map(i =>
      (i.toLong, Array(i.toFloat, (i % 5).toFloat))).toDF("vec_id", "embedding")
    val a = Similarity.kmeans(corpus, k = 3, iterations = 3)
      .orderBy("centroid_id").select("cvec").as[Array[Float]].collect()
    val b = Similarity.kmeans(corpus, k = 3, iterations = 3)
      .orderBy("centroid_id").select("cvec").as[Array[Float]].collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("ivf ranking equals brute force when nprobe covers all cells") {
    val q = emb.where($"vec_id" === 0L)
    val bf = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("neighbor_id", "rnk").as[(Long, Int)].collect().toSeq
    val ivf = Similarity.ivfTopK(emb, q, centroids, k = 5, nprobe = 2)
      .select("neighbor_id", "rnk").as[(Long, Int)].collect().toSeq
    assert(ivf == bf)
  }

  // deterministic pseudo-random 16-dim corpus (two planted near-dups)
  private def pqCorpus(n: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(7)
    val base = (0 until n).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
    val planted = base.take(2).map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.01f)) // near-identical partners
    }
    (base ++ planted).toDF("vec_id", "embedding")
  }

  test("pqEncode emits m in-range codeword ids per vector") {
    val corpus = pqCorpus(40)
    val cb = Similarity.pqCodebooks(corpus, m = 4, k = 8, iterations = 2)
    assert(cb.count() == 32) // 4 subspaces x 8 codewords
    val codes = Similarity.pqEncode(corpus, cb)
      .select("code").as[Seq[Long]].collect()
    assert(codes.length == 42)
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
  }

  test("pqTopKRerank with a full-corpus shortlist equals brute force") {
    val corpus = pqCorpus(30)
    val probes = corpus.where($"vec_id" < 5)
    val cb = Similarity.pqCodebooks(corpus, m = 4, k = 8, iterations = 2)
    val enc = Similarity.pqEncode(corpus, cb)
    // shortlist covers everything -> the exact rerank IS the answer
    val got = Similarity.pqTopKRerank(enc, cb, corpus, probes,
        k = 3, shortlist = 100)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(corpus, probes, k = 3)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("two-phase top-k equals window ranking: few queries × many candidates") {
    // the skew shape the bounded heap exists for — 3 queries against a
    // 4000-vector corpus, so each query's candidate set is corpus-sized
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.{cosineWithNorms, dot, norm}
    val corpus = spark.range(4000).select($"id".as("vec_id"),
      array(
        (pmod($"id" * 37 + 11, lit(97)).cast("float") / 97f),
        (pmod($"id" * 53 + 29, lit(89)).cast("float") / 89f),
        (pmod($"id" * 71 + 43, lit(83)).cast("float") / 83f))
        .as("embedding"))
    val probes = corpus.where($"vec_id" < 3)
    val got = Similarity.bruteForceTopK(corpus, probes, k = 7)
      .select("query_id", "neighbor_id", "rnk", "sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    // reference: the SAME scored frame ranked by the window form the
    // aggregate replaced
    val q = broadcast(probes.select($"vec_id".as("query_id"),
      $"embedding".as("qv"), norm($"embedding").as("qn")))
    val c = corpus.select($"vec_id".as("neighbor_id"),
      $"embedding".as("cv"), norm($"embedding").as("cn"))
    val want = q.join(c, $"query_id" =!= $"neighbor_id")
      .withColumn("sim", cosineWithNorms(dot($"qv", $"cv"), $"qn", $"cn"))
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy($"sim".desc, $"neighbor_id".asc)))
      .where($"rnk" <= 7)
      .select("query_id", "neighbor_id", "rnk", "sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == want)
    assert(got.size == 21) // 3 queries × k=7
  }

  test("topKByScore handles string ids and groups under k candidates") {
    val scored = Seq(
      ("q1", "docB", 0.9), ("q1", "docA", 0.9), ("q1", "docC", 0.5),
      ("q2", "docZ", 0.1))
      .toDF("query_id", "doc", "sim")
    val got = scored.groupBy("query_id")
      .agg(graft.functions.TopKAggregate.topKByScore($"sim", $"doc", 2)
        .as("top"))
      .select($"query_id", posexplode($"top").as(Seq("pos", "e")))
      .select($"query_id", $"e.id", $"pos")
      .as[(String, String, Int)].collect().toSet
    // tie at 0.9 breaks by id asc; q2 has only one candidate
    assert(got == Set(("q1", "docA", 0), ("q1", "docB", 1), ("q2", "docZ", 0)))
  }

  test("pqTopK refuses a data-sized query set before collecting it") {
    val corpus = pqCorpus(30)
    val cb = Similarity.pqCodebooks(corpus, m = 4, k = 8, iterations = 1)
    val enc = Similarity.pqEncode(corpus, cb)
    // m=4 × k=8 codebooks cap the probe set at 2^20/32 = 32768 rows —
    // 40k "queries" must refuse loudly instead of OOMing the driver
    val vec = array((0 until 16).map(i => lit(0.1f * (i + 1))): _*)
    val huge = spark.range(40000).select($"id".as("vec_id"),
      vec.as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(enc, cb, huge, k = 3)
    }
    assert(e.getMessage.contains("PROBE set"), e.getMessage)
  }

  test("pqCodebooks on an all-zero corpus fails with a trainability message") {
    val zeros = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(zeros, m = 2, k = 2, iterations = 1)
    }
    assert(e.getMessage.contains("nonzero"), e.getMessage)
  }

  test("ivfAdcTopK at nprobe=cells is rank-identical to pqTopK") {
    val corpus = pqCorpus(40)
    val cb = Similarity.pqCodebooks(corpus, m = 4, k = 8, iterations = 2)
    val enc = Similarity.pqEncode(corpus, cb)
    val cents = Similarity.kmeans(corpus, k = 4, iterations = 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_").toString + "/idx"
    Similarity.writeClusteredPQ(corpus, cents, cb, path)
    val probes = corpus.where($"vec_id" < 3)
    // every cell probed -> candidate routing keeps every pair, so the
    // composed index must reproduce the whole-corpus ADC rank for rank
    val got = Similarity.ivfAdcTopK(spark, path, cb, cents, probes,
        k = 5, nprobe = 4)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val want = Similarity.pqTopK(enc, cb, probes, k = 5)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("ivfAdcTopKRerank with all cells + full shortlist equals brute force") {
    val corpus = pqCorpus(30)
    val cb = Similarity.pqCodebooks(corpus, m = 4, k = 8, iterations = 2)
    val cents = Similarity.kmeans(corpus, k = 4, iterations = 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_rr_").toString + "/idx"
    Similarity.writeClusteredPQ(corpus, cents, cb, path)
    val probes = corpus.where($"vec_id" < 5)
    val got = Similarity.ivfAdcTopKRerank(spark, path, cb, cents, corpus,
        probes, k = 3, nprobe = 4, shortlist = 100)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(corpus, probes, k = 3)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("residual IVFADC: codes in range, rerank at full coverage is exact") {
    val corpus = pqCorpus(30)
    val cents = Similarity.kmeans(corpus, k = 4, iterations = 3)
    val rcb = Similarity.pqCodebooksResidual(corpus, cents, m = 4, k = 8,
      iterations = 2)
    assert(rcb.count() == 32)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_res_").toString + "/idx"
    Similarity.writeClusteredPQ(corpus, cents, rcb, path, residual = true)
    val codes = spark.read.parquet(path)
      .select("code").as[Seq[Long]].collect()
    assert(codes.length == 32) // 30 + 2 planted
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    // every cell probed + corpus-wide shortlist -> the exact rerank IS
    // the answer, whatever the residual quantization did to the shortlist
    val probes = corpus.where($"vec_id" < 5)
    val got = Similarity.ivfAdcTopKRerank(spark, path, rcb, cents, corpus,
        probes, k = 3, nprobe = 4, shortlist = 100, residual = true)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(corpus, probes, k = 3)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("residual ADC ranks a planted near-duplicate first before rerank") {
    val corpus = pqCorpus(40)
    val probes = corpus.where($"vec_id" === 0L || $"vec_id" === 1L)
    val cents = Similarity.kmeans(corpus, k = 4, iterations = 3)
    val rcb = Similarity.pqCodebooksResidual(corpus, cents, m = 4, k = 8,
      iterations = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_res2_").toString + "/idx"
    Similarity.writeClusteredPQ(corpus, cents, rcb, path, residual = true)
    // q̂·c_cell + residual table hits must rank each planted partner
    // first from codes alone, like the plain ADC test
    val top1 = Similarity.ivfAdcTopK(spark, path, rcb, cents, probes,
        k = 1, nprobe = 4, residual = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(top1 == Map(0L -> 1000L, 1L -> 1001L))
  }

  test("maintainClusteredPQ is row-identical to a rebuild (upd/del/ins)") {
    val corpus = pqCorpus(30)
    val cents = Similarity.kmeans(corpus, k = 4, iterations = 3)
    val cb = Similarity.pqCodebooks(corpus, m = 4, k = 8, iterations = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pqm_").toString + "/idx"
    Similarity.writeClusteredPQ(corpus, cents, cb, path)
    def vec(seed: Int) = Array.tabulate(16)(i => (0.05f * (i + seed)) - 0.4f)
    // update id 3, delete id 4, insert id 77 — one signed feed
    val feed = (
      corpus.where($"vec_id".isin(3L, 4L))
        .select($"vec_id", $"embedding", lit(-1L).as("__sign"))
      ).unionByName(Seq((3L, vec(9)), (77L, vec(2)))
        .toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding", lit(1L).as("__sign")))
    Similarity.maintainClusteredPQ(spark, path, cents, cb, feed)
    val finalCorpus = corpus.where(!$"vec_id".isin(3L, 4L))
      .unionByName(Seq((3L, vec(9)), (77L, vec(2))).toDF("vec_id", "embedding"))
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft_pqm_rb_").toString + "/idx"
    Similarity.writeClusteredPQ(finalCorpus, cents, cb, rebuilt)
    def rows(p: String) = spark.read.parquet(p)
      .select($"vec_id", $"cell".cast("long"), $"code")
      .as[(Long, Long, Seq[Long])].collect().toSet
    assert(rows(path) == rows(rebuilt))
  }

  test("maintainClusteredPQ re-applies the same feed without duplicating") {
    val cents2 = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "cvec")
    val cb2 = Similarity.pqCodebooks(emb, m = 2, k = 2, iterations = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pqm_idem_").toString + "/idx"
    Similarity.writeClusteredPQ(emb, cents2, cb2, path)
    // update id 1 (stays cell 0), delete id 10, insert id 20 (cell 1)
    val feed = emb.where($"vec_id".isin(1L, 10L))
      .select($"vec_id", $"embedding", lit(-1L).as("__sign"))
      .unionByName(Seq((1L, Array(0.7f, 0.3f)), (20L, Array(0.3f, 0.7f)))
        .toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding", lit(1L).as("__sign")))
    def rows(p: String) = spark.read.parquet(p)
      .select($"vec_id", $"cell".cast("long"), $"code")
      .as[(Long, Long, Seq[Long])].collect().toSet
    Similarity.maintainClusteredPQ(spark, path, cents2, cb2, feed)
    val once = rows(path)
    // a replayed fold (crash between a COMPLETED index mutation and the
    // stream's checkpoint commit) must upsert, never duplicate
    Similarity.maintainClusteredPQ(spark, path, cents2, cb2, feed)
    assert(rows(path) == once)
  }

  test("repairClusteredPQCells restores old/missing touched-cell damage") {
    val cents2 = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "cvec")
    val cb2 = Similarity.pqCodebooks(emb, m = 2, k = 2, iterations = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pqm_rep_").toString + "/idx"
    Similarity.writeClusteredPQ(emb, cents2, cb2, path)
    // update id 0 (cell 0), delete id 12 (cell 1), insert id 20 (cell 1)
    val feed = emb.where($"vec_id".isin(0L, 12L))
      .select($"vec_id", $"embedding", lit(-1L).as("__sign"))
      .unionByName(Seq((0L, Array(0.6f, 0.4f)), (20L, Array(0.3f, 0.7f)))
        .toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding", lit(1L).as("__sign")))
    // pre-feed image of cell 0, saved to fake a cell the crashed fold
    // never reached
    val pre0 = spark.read.parquet(path).where($"cell" === 0)
      .select("vec_id", "code").collect().toSeq
    Similarity.maintainClusteredPQ(spark, path, cents2, cb2, feed)
    // crash damage, one touched cell each way: cell 0 rolled back to its
    // OLD content, cell 1's directory lost mid-commit
    spark.createDataFrame(
        spark.sparkContext.parallelize(pre0),
        spark.read.parquet(path).select("vec_id", "code").schema)
      .write.mode("overwrite").parquet(s"$path/cell=0")
    graft.store.UpsertWriter.deleteRecursively(
      java.nio.file.Paths.get(path).resolve("cell=1"))
    val post = emb.where(!$"vec_id".isin(0L, 12L))
      .unionByName(Seq((0L, Array(0.6f, 0.4f)), (20L, Array(0.3f, 0.7f)))
        .toDF("vec_id", "embedding"))
    Similarity.repairClusteredPQCells(spark, path, post, cents2, cb2, feed)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft_pqm_rep_rb_").toString + "/idx"
    Similarity.writeClusteredPQ(post, cents2, cb2, rebuilt)
    def rows(p: String) = spark.read.parquet(p)
      .select($"vec_id", $"cell".cast("long"), $"code")
      .as[(Long, Long, Seq[Long])].collect().toSet
    assert(rows(path) == rows(rebuilt))
  }

  test("rebuildClusteredPQ rebuilds in place, sparing root-level files") {
    val cents2 = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "cvec")
    val cb2 = Similarity.pqCodebooks(emb, m = 2, k = 2, iterations = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pqm_rbip_").toString + "/idx"
    Similarity.writeClusteredPQ(emb, cents2, cb2, path)
    // arbitrary damage: one cell lost, plus a STALE extra cell no
    // current vector maps to, plus a root-level recovery marker that
    // must survive (writeClusteredPQ's static overwrite would kill it)
    graft.store.UpsertWriter.deleteRecursively(
      java.nio.file.Paths.get(path).resolve("cell=1"))
    Seq((999L, Seq(0L, 0L))).toDF("vec_id", "code")
      .write.parquet(s"$path/cell=99")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path).resolve("_indexed_version"),
      "7".getBytes("UTF-8"))
    Similarity.rebuildClusteredPQ(spark, path, emb, cents2, cb2)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft_pqm_rbip_rb_").toString + "/idx"
    Similarity.writeClusteredPQ(emb, cents2, cb2, rebuilt)
    def rows(p: String) = spark.read.parquet(p)
      .select($"vec_id", $"cell".cast("long"), $"code")
      .as[(Long, Long, Seq[Long])].collect().toSet
    assert(rows(path) == rows(rebuilt))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path).resolve("cell=99")))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path).resolve("_indexed_version")),
      "UTF-8") == "7")
  }

  test("maintainClusteredPQ drops a fully-emptied cell's directory") {
    val cents2 = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "cvec")
    val cb2 = Similarity.pqCodebooks(emb, m = 2, k = 2, iterations = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pqm_empty_").toString + "/idx"
    Similarity.writeClusteredPQ(emb, cents2, cb2, path)
    // retract the entire y-cluster: cell 1 must vanish, not go stale
    val feed = emb.where($"vec_id" >= 10L)
      .select($"vec_id", $"embedding", lit(-1L).as("__sign"))
    Similarity.maintainClusteredPQ(spark, path, cents2, cb2, feed)
    val left = spark.read.parquet(path)
      .select($"vec_id", $"cell".cast("long")).as[(Long, Long)].collect()
    assert(left.map(_._1).toSet == Set(0L, 1L, 2L))
    assert(left.forall(_._2 == 0L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path).resolve("cell=1")))
  }

  test("PQ ADC ranks a planted near-duplicate first even before rerank") {
    val corpus = pqCorpus(40)
    val probes = corpus.where($"vec_id" === 0L || $"vec_id" === 1L)
    val cb = Similarity.pqCodebooks(corpus, m = 4, k = 8, iterations = 2)
    val enc = Similarity.pqEncode(corpus, cb)
    val top1 = Similarity.pqTopK(enc, cb, probes, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // strong similarity survives quantization: each planted pair finds
    // its partner at rank 1 from codes alone
    assert(top1 == Map(0L -> 1000L, 1L -> 1001L))
  }

  test("semanticDedup drops one member per same-cell dup pair, ties keep the smaller id") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),  // x cell — exact dup of 5
      (5L, Array(1.0f, 0.0f)),  //   tie on centroid_sim → 0 kept
      (7L, Array(0.6f, 0.8f)),  // y cell (cos 0.8 to y beats 0.6 to x)
      (10L, Array(0.0f, 1.0f)), // y cell — same DIRECTION as 11
      (11L, Array(0.0f, 2.0f))  //   cos(10,11)=1 → one of them drops
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(corpus, centroids, threshold = 0.95)
      .select($"vec_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(out.keySet == Set(0L, 5L, 7L, 10L, 11L))
    assert(out(0L) && !out(5L))   // exact tie → smaller id survives
    assert(out(7L))               // no same-cell pair above threshold
    assert(out(10L) && !out(11L)) // direction dup: tie again, 10 kept
  }

  test("semanticDedup keep-priority is LEAST similar to centroid, not smallest id") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),   // centroid_sim = 1.0
      (1L, Array(0.9f, 0.15f))   // same cell, cos(0,1)≈0.986 > τ, sim < 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(corpus, centroids, threshold = 0.95)
      .select($"vec_id", $"keep").as[(Long, Boolean)].collect().toMap
    // the farther-from-centroid member survives despite the larger id
    assert(!out(0L) && out(1L))
  }

  test("semanticDedup excludes null embeddings and never pairs across cells") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (10L, Array(0.0f, 1.0f)),
      (99L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    // 0 and 10 are orthogonal AND in different cells: both keep; the
    // null-embedding row has no cell and is absent, same contract as
    // ivfAssign
    val out = Similarity.semanticDedup(corpus, centroids, threshold = 0.0)
      .select($"vec_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(out == Map(0L -> true, 10L -> true))
  }
}
