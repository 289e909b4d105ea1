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
