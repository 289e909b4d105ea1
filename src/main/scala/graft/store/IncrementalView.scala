package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained aggregates over a versioned table — the
  * lakehouse "incremental materialized view" pattern: instead of
  * recomputing a corpus-wide groupBy after every merge (the reference's
  * merge-then-rebuild flow, py_pipeline/orchestration.py:186-209), a
  * count+sum STATE per group is updated from the delta-sized
  * [[VersionedTable.changeFeed]] alone. Correctness rests on
  * sign-weighted associativity: every change contributes `+new − old`, so
  * folding feeds v0→v1→…→vN over the v0 state must equal the aggregate
  * recomputed from vN — which is exactly what the q95 gate asserts.
  *
  * The sums run in DECIMAL so maintenance is EXACT: a float state drifts
  * under retractions (±x cancels only approximately), a decimal one
  * cancels bit-for-bit, and the final double cast happens once at read
  * time.
  *
  * At 100 TB: the state table is group-cardinality-sized, each refresh
  * shuffles only the delta (one pk-join to build the feed, one
  * group-shuffle to fold it), and the full-table groupBy never runs
  * again after bootstrap.
  */
object IncrementalView {

  /** Bootstrap the (n, total) state per group from a full snapshot:
    * `groupCol → (count(*), sum(decimal(18,2) value))`.
    */
  def state(snapshot: DataFrame, groupCol: String, valueCol: String)
      : DataFrame =
    snapshot.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast(DecimalType(18, 2))).as("total"))

  /** Fold one signed change feed into the state: the feed's per-group
    * sign-weighted contributions (`sum(sign)`, `sum(sign·value)`) union
    * with the state and re-aggregate — two delta-sized shuffles, no
    * snapshot scan. Groups whose count reaches zero vanish, matching a
    * recompute that never sees them.
    */
  def applyFeed(state: DataFrame, feed: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val delta = feed.groupBy(groupCol).agg(
      sum(col("__sign")).as("n"),
      sum(col("__sign") * col(valueCol).cast(DecimalType(18, 2))).as("total"))
    state.select(col(groupCol), col("n"),
        col("total").cast(DecimalType(28, 2)).as("total"))
      .unionByName(delta.select(col(groupCol), col("n"),
        col("total").cast(DecimalType(28, 2)).as("total")))
      .groupBy(groupCol)
      .agg(sum("n").as("n"), sum("total").cast(DecimalType(28, 2)).as("total"))
      .where(col("n") > 0)
  }
}
