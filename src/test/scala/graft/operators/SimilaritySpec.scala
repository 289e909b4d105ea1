package graft.operators

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
}
