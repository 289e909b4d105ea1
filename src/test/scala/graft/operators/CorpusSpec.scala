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
}
