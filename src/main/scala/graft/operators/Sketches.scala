package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Streaming frequency sketches for corpus-scale token statistics
  * (driver-mandated extension — SURVEY.md §7.9). No reference counterpart;
  * the algorithmic shapes are public literature (Misra & Gries 1982;
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * The point at 100 TB: an exact token-frequency groupBy shuffles one
  * record per DISTINCT token — fine for counts, but finding "the heavy
  * hitters" does not need the full distribution. A Misra-Gries summary
  * holds at most k counters per aggregation buffer, merges associatively
  * (so Spark's partial-aggregation path applies map-side), and GUARANTEES
  * every token with true count > N/(k+1) survives — the candidate set is a
  * superset of the true heavy hitters, which one cheap exact pass over ≤ k
  * candidates then confirms. Shuffle traffic: k counters per partition,
  * independent of corpus size.
  *
  * Buffer representation: two parallel arrays (token, lower-bound count)
  * of fixed capacity k plus a fill pointer, mutated in place and encoded
  * with a plain product encoder — no per-token persistent-map allocation
  * and no Kryo on the partial→final exchange. For the k ≤ a-few-hundred
  * regime this sketch targets, a linear array probe beats a hash map
  * (cache-resident, branch-predictable) and the decrement path is a
  * single compaction sweep.
  */
object Sketches {

  /** Misra-Gries aggregation buffer: parallel (token, count) arrays of
    * capacity k, `used` live entries in slots [0, used). Slots at and
    * beyond `used` are null/stale and ignored; the product encoder
    * round-trips them harmlessly.
    */
  final case class MGBuffer(keys: Array[String], vals: Array[Long], var used: Int)

  object MGBuffer {
    def empty(k: Int): MGBuffer =
      MGBuffer(new Array[String](k), new Array[Long](k), 0)
  }

  /** Weighted counter insert — the classic k-counter step generalized to
    * weight c (equals the textbook algorithm at c = 1): if the token is
    * held, add; if a slot is free, insert; else subtract
    * `cut = min(held counts, c)` from everything (including the
    * incoming counter) and keep the positives. Equivalent to merging a
    * singleton summary, so the mergeable-summaries bound applies with N =
    * total inserted WEIGHT. Mutates and returns `b`.
    */
  private[operators] def addWeighted(b: MGBuffer, k: Int, tok: String, c: Long): MGBuffer = {
    if (c <= 0) return b
    var i = 0
    while (i < b.used) {
      if (b.keys(i) == tok) { b.vals(i) += c; return b }
      i += 1
    }
    if (b.used < k) {
      b.keys(b.used) = tok
      b.vals(b.used) = c
      b.used += 1
      b
    } else {
      // full: cut = (k+1)-th largest of the k held counts plus c, which is
      // simply the minimum of them all
      var cut = c
      i = 0
      while (i < b.used) { if (b.vals(i) < cut) cut = b.vals(i); i += 1 }
      var w = 0
      i = 0
      while (i < b.used) {
        val nc = b.vals(i) - cut
        if (nc > 0) { b.keys(w) = b.keys(i); b.vals(w) = nc; w += 1 }
        i += 1
      }
      if (c > cut) { b.keys(w) = tok; b.vals(w) = c - cut; w += 1 }
      i = w
      while (i < b.used) { b.keys(i) = null; i += 1 } // drop stale refs
      b.used = w
      b
    }
  }

  /** Merge `y` into `x` (Mergeable Summaries §3.1): sum matching counters,
    * then if more than k remain subtract the (k+1)-th largest count and
    * drop non-positives — keeps ≤ k counters and preserves
    * `true − estimate ≤ N/(k+1)` across arbitrary merge trees, which is
    * exactly what a distributed partial aggregate needs. Mutates and
    * returns `x` (scratch arrays sized x.used + y.used, allocated once per
    * merge, not per token).
    */
  private[operators] def mergeBuf(x: MGBuffer, y: MGBuffer, k: Int): MGBuffer = {
    if (y.used == 0) return x
    if (x.used == 0) return y
    val cap = x.used + y.used
    val tk = new Array[String](cap)
    val tv = new Array[Long](cap)
    System.arraycopy(x.keys, 0, tk, 0, x.used)
    System.arraycopy(x.vals, 0, tv, 0, x.used)
    var n = x.used
    var i = 0
    while (i < y.used) {
      val tok = y.keys(i)
      var j = 0
      var found = false
      while (j < n && !found) {
        if (tk(j) == tok) { tv(j) += y.vals(i); found = true }
        j += 1
      }
      if (!found) { tk(n) = tok; tv(n) = y.vals(i); n += 1 }
      i += 1
    }
    var m = n
    if (n > k) {
      val sorted = java.util.Arrays.copyOfRange(tv, 0, n)
      java.util.Arrays.sort(sorted)
      val cut = sorted(n - 1 - k) // (k+1)-th largest
      var w = 0
      i = 0
      while (i < n) {
        if (tv(i) > cut) { tk(w) = tk(i); tv(w) = tv(i) - cut; w += 1 }
        i += 1
      }
      m = w
    }
    System.arraycopy(tk, 0, x.keys, 0, m)
    System.arraycopy(tv, 0, x.vals, 0, m)
    i = m
    while (i < x.used) { x.keys(i) = null; i += 1 }
    x.used = m
    x
  }

  private[operators] def bufToMap(b: MGBuffer): Map[String, Long] = {
    val builder = Map.newBuilder[String, Long]
    var i = 0
    while (i < b.used) { builder += (b.keys(i) -> b.vals(i)); i += 1 }
    builder.result()
  }

  /** Misra-Gries heavy-hitter summary over raw token rows as a typed
    * [[Aggregator]], usable as a DataFrame aggregate via
    * [[heavyHitterSketch]].
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuffer, Map[String, Long]] {
    require(k >= 1, "MisraGries needs at least one counter")

    override def zero: MGBuffer = MGBuffer.empty(k)

    override def reduce(b: MGBuffer, tok: String): MGBuffer =
      addWeighted(b, k, tok, 1L)

    override def merge(x: MGBuffer, y: MGBuffer): MGBuffer = mergeBuf(x, y, k)

    override def finish(b: MGBuffer): Map[String, Long] = bufToMap(b)

    override def bufferEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Weighted Misra-Gries over pre-aggregated (token, count) rows. Each
    * input row is an EXACT singleton summary of `count` occurrences, and
    * merging exact summaries preserves the N/(k+1) bound with N = the
    * total weight — so sketching `groupBy(token).count()` output yields
    * the same guarantee as sketching the raw stream while letting the
    * caller reuse ONE corpus scan for both the sketch and the exact gate
    * (see q84).
    */
  final class MisraGriesWeighted(k: Int)
      extends Aggregator[(String, Long), MGBuffer, Map[String, Long]] {
    require(k >= 1, "MisraGries needs at least one counter")

    override def zero: MGBuffer = MGBuffer.empty(k)

    override def reduce(b: MGBuffer, row: (String, Long)): MGBuffer =
      addWeighted(b, k, row._1, row._2)

    override def merge(x: MGBuffer, y: MGBuffer): MGBuffer = mergeBuf(x, y, k)

    override def finish(b: MGBuffer): Map[String, Long] = bufToMap(b)

    override def bufferEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The sketch as a DataFrame aggregate column: `df.agg(heavyHitterSketch(k)(col))`
    * yields one `map<string,bigint>` of ≤ k candidate heavy hitters.
    */
  def heavyHitterSketch(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(k))

  /** Weighted form over (token, count) columns:
    * `cnts.agg(heavyHitterSketchWeighted(k)(col("token"), col("cnt")))`.
    */
  def heavyHitterSketchWeighted(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGriesWeighted(k))

  /** Distributed WEIGHTED Count-Min build over pre-aggregated
    * (token, count) rows — `df.stat.countMinSketch` replays one add per
    * occurrence, which would force a second corpus scan when the exact
    * counts already exist; `CountMinSketch.add(item, count)` folds a whole
    * token in O(depth). One sketch per partition, merged pairwise — the
    * same mergeable-summaries shape as the Misra-Gries aggregate, shuffle
    * traffic = one ~eps⁻¹·depth table per partition. Deterministic for a
    * fixed seed regardless of partitioning (cell updates commute).
    */
  def countMinOfCounts(cnts: org.apache.spark.sql.DataFrame,
      tokenCol: String, cntCol: String, eps: Double, confidence: Double,
      seed: Int): org.apache.spark.util.sketch.CountMinSketch = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.util.sketch.CountMinSketch
    val spark = cnts.sparkSession
    import spark.implicits._
    def toBytes(s: CountMinSketch): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      s.writeTo(bos)
      bos.toByteArray
    }
    def fromBytes(b: Array[Byte]): CountMinSketch =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
    val parts = cnts
      .select(col(tokenCol).cast("string"), col(cntCol).cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val s = CountMinSketch.create(eps, confidence, seed)
        it.foreach { case (t, c) => s.add(t, c) }
        Iterator(toBytes(s))
      }
    fromBytes(parts.reduce { (a, b) =>
      val sa = fromBytes(a)
      sa.mergeInPlace(fromBytes(b))
      toBytes(sa)
    })
  }
}
