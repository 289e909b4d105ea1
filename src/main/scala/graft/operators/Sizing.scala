package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded broadcast decisions (the `countAtMost` probe pattern from
  * [[graft.store.UpsertWriter]], shared by the dedup/similarity operators).
  *
  * A `broadcast()` hint on a table that does NOT fit executor memory is a
  * scale-killer: the driver collects the whole table and every executor
  * holds a full copy. These helpers keep the broadcast fast-path for
  * provably-small inputs and fall back to a plain (hash-partitioned
  * shuffle) join otherwise — the 100 TB-safe default.
  */
object Sizing {

  /** Default row cap for a broadcast side — ~1M rows of ids+sizes or
    * 64-float embeddings stays well under typical executor memory and
    * `spark.sql.autoBroadcastJoinThreshold`-scale budgets.
    */
  val DefaultBroadcastRows: Long = 1L << 20

  /** Cheap "has at most n rows" probe without a full count:
    * limit(n+1).count() stops scanning once n+1 rows are found.
    */
  def countAtMost(df: DataFrame, n: Long): Boolean =
    df.limit((math.min(n, Int.MaxValue - 1L) + 1).toInt).count() <= n

  /** Hint `df` for broadcast only when provably at most `rowLimit` rows;
    * otherwise return it unhinted so the join shuffles both sides by key.
    */
  def maybeBroadcast(df: DataFrame, rowLimit: Long): DataFrame =
    if (countAtMost(df, rowLimit)) broadcast(df) else df
}
