package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Classify

class StreamingCurateSpec extends SparkSpec {
  import spark.implicits._

  test("curated output is invariant to micro-batch slicing") {
    val docs = Seq(
      (1L, "en", "alpha beta mail me a.b@x.org now"),
      (2L, "de", "omega psi chi at 10.1.2.3 up"),
      (3L, "en", "alpha alpha beta gamma"),
      (4L, "de", "psi chi omega omega"))
    val model = Classify.centroidModel(
      docs.toDF("doc_id", "lang", "text"), col("lang") === "en")
      .localCheckpoint()

    def run(files: Seq[Seq[(Long, String)]]): Map[Long, (Long, Long, Boolean)] = {
      val root = Files.createTempDirectory("graft_scur_").toString
      val src = s"$root/src"
      Files.createDirectories(Paths.get(src))
      files.zipWithIndex.foreach { case (rows, i) =>
        val d = s"$root/stage$i"
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(d)
        val ls = Files.list(Paths.get(d))
        val part = try ls.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst.get finally ls.close()
        Files.copy(part, Paths.get(src, f"f$i%02d.parquet"))
      }
      val data = files.flatten
      val schema = spark.read.parquet(src).schema
      StreamingCurate.runAvailableNow(spark, src, schema, model,
        s"$root/out", s"$root/ckpt")
      spark.read.parquet(s"$root/out")
        .select("doc_id", "n_email", "margin", "quality_pred")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    }

    val texts = docs.map(d => (d._1, d._3))
    val oneBatch = run(Seq(texts))
    val perDoc = run(texts.map(Seq(_)))
    assert(oneBatch == perDoc)
    assert(oneBatch.size == 4)
    // the scrub actually fired and the model actually separates
    assert(oneBatch(1L)._1 == 1L) // one email redacted
    assert(oneBatch(1L)._3 && oneBatch(3L)._3) // en docs positive
    assert(!oneBatch(2L)._3 && !oneBatch(4L)._3) // de docs negative
  }
}
