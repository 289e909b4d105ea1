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

  test("ivf ranking equals brute force when nprobe covers all cells") {
    val q = emb.where($"vec_id" === 0L)
    val bf = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("neighbor_id", "rnk").as[(Long, Int)].collect().toSeq
    val ivf = Similarity.ivfTopK(emb, q, centroids, k = 5, nprobe = 2)
      .select("neighbor_id", "rnk").as[(Long, Int)].collect().toSeq
    assert(ivf == bf)
  }
}
