package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: token "hh_i" appears (200 - 18*i) times for i in 0..9,
  // plus a long tail of singletons — known exact counts
  private def stream: Seq[String] =
    (0 until 10).flatMap(i => Seq.fill(200 - 18 * i)(s"hh_$i")) ++
      (0 until 800).map(i => s"tail_$i")

  test("Misra-Gries candidates are a superset of true heavy hitters") {
    val toks = stream.toDF("token")
    val n = stream.size.toLong
    val k = 16
    for (parts <- Seq(1, 4, 13)) {
      val sketch = toks.repartition(parts)
        .agg(Sketches.heavyHitterSketch(k)(col("token")).as("s"))
        .collect()(0).getMap[String, Long](0)
      assert(sketch.size <= k, s"sketch kept ${sketch.size} > k=$k counters")
      val threshold = n.toDouble / (k + 1)
      val trueHeavy = stream.groupBy(identity)
        .map { case (t, v) => t -> v.size }
        .filter(_._2 > threshold).keySet
      assert(trueHeavy.nonEmpty, "test needs at least one true heavy hitter")
      val missing = trueHeavy -- sketch.keySet
      assert(missing.isEmpty,
        s"guarantee violated at $parts partitions: missing $missing")
      // estimates are lower bounds within N/(k+1) of truth
      sketch.foreach { case (t, est) =>
        val truth = stream.count(_ == t).toLong
        assert(est <= truth && truth - est <= threshold + 1)
      }
    }
  }

  test("weighted count-min equals the per-occurrence build; never undercounts") {
    val toks = stream.toDF("token")
    val cnts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val weighted = Sketches.countMinOfCounts(cnts, "token", "cnt",
      eps = 0.001, confidence = 0.99, seed = 42)
    val raw = toks.stat.countMinSketch("token", 0.001, 0.99, 42)
    val n = stream.size.toLong
    for (t <- Seq("hh_0", "hh_5", "tail_3", "absent_token")) {
      val exact = stream.count(_ == t).toLong
      assert(weighted.estimateCount(t) == raw.estimateCount(t),
        s"weighted and per-occurrence builds disagree on '$t'")
      assert(weighted.estimateCount(t) >= exact)
      assert(weighted.estimateCount(t) <= exact + math.ceil(0.001 * n).toLong)
    }
  }

  test("MisraGries reduce and merge keep at most k counters") {
    val mg = new Sketches.MisraGries(3)
    def counts(seq: Seq[String]) =
      mg.finish(seq.foldLeft(mg.zero)(mg.reduce))
    val b = Seq("a", "b", "c", "d", "a", "a").foldLeft(mg.zero)(mg.reduce)
    assert(mg.finish(b).size <= 3)
    assert(mg.finish(b)("a") >= 1) // the dominant token survives decrements
    val other = Seq("x", "y", "z", "x").foldLeft(mg.zero)(mg.reduce)
    val merged = mg.finish(mg.merge(b, other))
    assert(merged.size <= 3)
    // merge of disjoint buffers subtracts the (k+1)-th largest count (here
    // the 4th largest = 1) and drops non-positives; exact-count buffers
    // built by folding fewer than k distinct tokens
    val x = Seq.fill(5)("a").++(Seq.fill(3)("b")).foldLeft(mg.zero)(mg.reduce)
    val y = Seq.fill(2)("c").++(Seq.fill(1)("d")).foldLeft(mg.zero)(mg.reduce)
    assert(counts(Seq.fill(5)("a") ++ Seq.fill(3)("b")) == Map("a" -> 5L, "b" -> 3L))
    val m2 = mg.finish(mg.merge(x, y))
    assert(m2 == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
  }

  test("weighted sketch over pre-aggregated counts keeps the superset bound") {
    val toks = stream.toDF("token")
    val n = stream.size.toLong
    val k = 16
    val cnts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val sketch = cnts.repartition(7)
      .agg(Sketches.heavyHitterSketchWeighted(k)(col("token"), col("cnt")).as("s"))
      .collect()(0).getMap[String, Long](0)
    assert(sketch.size <= k)
    val threshold = n.toDouble / (k + 1)
    val trueHeavy = stream.groupBy(identity)
      .map { case (t, v) => t -> v.size }
      .filter(_._2 > threshold).keySet
    assert((trueHeavy -- sketch.keySet).isEmpty)
    sketch.foreach { case (t, est) =>
      val truth = stream.count(_ == t).toLong
      assert(est <= truth && truth - est <= threshold + 1)
    }
  }
}
