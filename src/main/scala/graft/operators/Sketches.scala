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
  */
object Sketches {

  /** Misra-Gries heavy-hitter summary as a typed [[Aggregator]] usable as
    * a DataFrame aggregate via [[heavyHitterSketch]]. Buffer = at most `k`
    * (token → lower-bound count) counters.
    *
    *  - reduce: increment a held counter, insert when a slot is free, else
    *    decrement all (the classic k-counter step).
    *  - merge: sum counterpart counters, then subtract the (k+1)-th
    *    largest count and drop non-positives (Mergeable Summaries, §3.1) —
    *    keeps ≤ k counters and preserves the error bound
    *    `true − estimate ≤ N/(k+1)` across arbitrary merge trees, which is
    *    exactly what a distributed partial aggregate needs.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, "MisraGries needs at least one counter")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1)
        case None if b.size < k => b.updated(tok, 1L)
        case None =>
          b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val combined = y.foldLeft(x) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count from everything, keep positives
        val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
        combined.flatMap { case (t, c) =>
          if (c > cut) Some(t -> (c - cut)) else None
        }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b

    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The sketch as a DataFrame aggregate column: `df.agg(heavyHitterSketch(k)(col))`
    * yields one `map<string,bigint>` of ≤ k candidate heavy hitters.
    */
  def heavyHitterSketch(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(k))
}
