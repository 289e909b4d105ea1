package graft.store

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Bootstrap the (n, total, total2) state per group — [[state]] extended
    * with the decimal-exact SECOND moment. Unlike min/max the second
    * moment IS invertible: every change contributes ±x and ±x², so mean
    * and variance stay maintainable from delta-sized feeds alone — no
    * dirty-group rescan path exists or is needed. `total2` carries the
    * widened decimal(38,4) of the squared scale-2 values, so retractions
    * cancel bit-for-bit like they do for `total`.
    *
    * Magnitude bound: a decimal(18,2) value squares to at most ~10³², and
    * total2 holds 34 integer digits, so a group can absorb ~100 worst-case
    * values (or ~10²⁴ realistic ones) before the sum overflows. Under ANSI
    * mode (the Spark 4 default) overflow throws; under non-ANSI it would
    * silently null the lane — and because a recompute nulls identically,
    * the corruption would pass the maintained-vs-recompute gate. So both
    * state builders FAIL LOUDLY on the overflow signature instead: a null
    * total2 beside a non-null total is impossible for real data (a group
    * is either all-null — both lanes null — or has a value in both sums).
    */
  def stateMoments(snapshot: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val v = col(valueCol).cast(DecimalType(18, 2))
    snapshot.groupBy(groupCol).agg(
        count(lit(1)).as("n"),
        sum(v).cast(DecimalType(28, 2)).as("total"),
        sum((v * v).cast(DecimalType(38, 4))).cast(DecimalType(38, 4))
          .as("total2"))
      .select(col(groupCol), col("n"), col("total"), total2Checked)
  }

  /** The non-ANSI decimal-overflow tripwire for the moments state: see
    * [[stateMoments]]' magnitude-bound note.
    */
  private def total2Checked: Column =
    when(col("total2").isNull && col("total").isNotNull,
      raise_error(lit("IncrementalView moments: total2 overflowed " +
        "decimal(38,4) — the maintained variance lane would be silently " +
        "corrupt. Scale the values down or maintain per-subgroup states.")))
      .otherwise(col("total2")).as("total2")

  /** Fold one signed feed into a moments state — the same union +
    * re-aggregate shape as [[applyFeed]] with the x² lane added; two
    * delta-sized shuffles, never a snapshot scan. Derived statistics read
    * off the state: mean = total/n, variance = (total2 − total²/n)/n.
    */
  def applyFeedMoments(state: DataFrame, feed: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast(DecimalType(18, 2))
    val delta = feed.groupBy(groupCol).agg(
      sum(col("__sign")).as("n"),
      sum(col("__sign") * v).cast(DecimalType(28, 2)).as("total"),
      sum((col("__sign") * (v * v)).cast(DecimalType(38, 4)))
        .cast(DecimalType(38, 4)).as("total2"))
    state.select(col(groupCol), col("n"),
        col("total").cast(DecimalType(28, 2)).as("total"),
        col("total2").cast(DecimalType(38, 4)).as("total2"))
      .unionByName(delta)
      .groupBy(groupCol)
      .agg(sum("n").as("n"),
        sum("total").cast(DecimalType(28, 2)).as("total"),
        sum("total2").cast(DecimalType(38, 4)).as("total2"))
      .where(col("n") > 0)
      .select(col(groupCol), col("n"), col("total"), total2Checked)
  }

  /** Bootstrap the per-(group, value) multiplicity state for incremental
    * COUNT DISTINCT — the aggregate whose state must be finer-grained
    * than its result: distinctness is not invertible from a scalar, but
    * the (group, value) → multiplicity table IS sign-foldable, and
    * [[distinctCounts]] reads the answer as a count of live values per
    * group. Values key as decimal(18,2) so identity is exact and
    * engine-portable. NULL values are excluded, matching COUNT(DISTINCT)
    * semantics — with the one contract divergence that a group holding
    * ONLY nulls has no state row at all (reads as absent, where a
    * recompute's groupBy would keep it at 0). State size is O(distinct
    * (group, value) pairs) — the cardinality a recompute would shuffle on
    * EVERY refresh, held once and updated with delta-sized folds instead.
    */
  def stateDistinct(snapshot: DataFrame, groupCol: String, valueCol: String)
      : DataFrame =
    snapshot.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol),
        col(valueCol).cast(DecimalType(18, 2)).as("__v"))
      .agg(count(lit(1)).as("m"))

  /** Fold one signed feed into the multiplicity state: per-(group, value)
    * sign sums union in and re-aggregate; multiplicities that reach zero
    * vanish, so a value deleted from its last row stops counting — two
    * delta-sized shuffles, never a snapshot scan.
    */
  def applyFeedDistinct(state: DataFrame, feed: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    state.unionByName(
        feed.where(col(valueCol).isNotNull)
          .groupBy(col(groupCol),
            col(valueCol).cast(DecimalType(18, 2)).as("__v"))
          .agg(sum(col("__sign")).as("m")))
      .groupBy(groupCol, "__v")
      .agg(sum("m").as("m"))
      .where(col("m") > 0)

  /** Read per-group distinct counts off a [[stateDistinct]] state. */
  def distinctCounts(state: DataFrame, groupCol: String): DataFrame =
    state.groupBy(groupCol).agg(count(lit(1)).as("n_distinct"))

  /** Bootstrap the (n, total, lo, hi) state per group — [[state]] extended
    * with the NON-invertible extrema, for [[applyFeedMinMax]].
    */
  def stateMinMax(snapshot: DataFrame, groupCol: String, valueCol: String)
      : DataFrame =
    snapshot.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast(DecimalType(18, 2)))
        .cast(DecimalType(28, 2)).as("total"),
      min(col(valueCol).cast(DecimalType(18, 2))).as("lo"),
      max(col(valueCol).cast(DecimalType(18, 2))).as("hi"))

  /** Fold one signed feed into a min/max-bearing state. count/sum stay
    * sign-weighted (invertible); min/max are NOT invertible — a retraction
    * can only be absorbed when it provably misses the extremum:
    *
    *  - inserts tighten monotonically: `lo' = least(lo, min(inserted))`
    *  - a delete strictly above `lo` (below `hi`) leaves the extremum's
    *    witness row in place — still O(delta)
    *  - a delete AT the extremum makes the group DIRTY: the survivor set
    *    alone determines the new min/max, so exactly those groups re-scan
    *    their own rows in `newSnapshot` (the standard lakehouse
    *    recompute-only-affected-groups pattern)
    *
    * At 100 TB the re-scan is a semi-join on the dirty group keys — with
    * the lake partitioned/z-ordered by group it touches only their files,
    * and a delete-free or extremum-missing refresh stays delta-sized.
    */
  def applyFeedMinMax(state: DataFrame, feed: DataFrame,
      newSnapshot: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val v = col(valueCol).cast(DecimalType(18, 2))
    val delta = feed.groupBy(groupCol).agg(
      sum(col("__sign")).as("__dn"),
      sum(col("__sign") * v).as("__dtotal"),
      min(when(col("__sign") === 1, v)).as("__ins_lo"),
      max(when(col("__sign") === 1, v)).as("__ins_hi"),
      min(when(col("__sign") === -1, v)).as("__del_lo"),
      max(when(col("__sign") === -1, v)).as("__del_hi"))
    val merged = state.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("total").cast(DecimalType(28, 2)), lit(0).cast(DecimalType(28, 2)))
          + coalesce(col("__dtotal").cast(DecimalType(28, 2)), lit(0).cast(DecimalType(28, 2))))
          .cast(DecimalType(28, 2)).as("total"),
        col("lo"), col("hi"),
        col("__ins_lo"), col("__ins_hi"), col("__del_lo"), col("__del_hi"))
      .where(col("n") > 0)
    // a null comparison (no deletes / new group) is not dirty
    val dirtyCond = (col("__del_lo") <= col("lo")) <=> lit(true) ||
      (col("__del_hi") >= col("hi")) <=> lit(true)
    val rescan = newSnapshot
      .join(merged.where(dirtyCond).select(groupCol), Seq(groupCol), "left_semi")
      .groupBy(groupCol).agg(min(v).as("__r_lo"), max(v).as("__r_hi"))
    merged.join(rescan, Seq(groupCol), "left")
      .select(col(groupCol), col("n"), col("total"),
        when(col("__r_lo").isNotNull, col("__r_lo"))
          .otherwise(least(col("lo"), col("__ins_lo"))).as("lo"),
        when(col("__r_hi").isNotNull, col("__r_hi"))
          .otherwise(greatest(col("hi"), col("__ins_hi"))).as("hi"))
  }
}
