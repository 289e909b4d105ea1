package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over event/price streams: as-of join and gap
  * sessionization. Natural securities extensions (SURVEY.md §2.7 — the
  * reference has no as-of join; daily bars + PK merge stand in for it).
  *
  * Both are implemented with the union-and-window trick rather than a range
  * join: a range/theta join shuffles BOTH sides and explodes pairs, while
  * the union form is ONE shuffle by key + ONE sort by time — the same cost
  * as any window, and robust at 100 TB (the sort is per-key, spillable).
  */
object Temporal {

  /** As-of join: for each left row, the most recent right row with
    * `rightTime <= leftTime`, per key. Right rows at the exact same
    * timestamp DO match (inclusive).
    *
    * Implementation: tag and union both sides, window per key ordered by
    * (time, side) with right rows first at equal times, carry
    * `last(right value, ignoreNulls=true)` over the preceding frame
    * including current, then keep left rows.
    *
    * @param rightCarry columns from the right side to carry (renamed as-is
    *                   onto matched left rows; null when no match).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTime: String, rightTime: String, rightCarry: Seq[String],
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    val tagged = {
      val l = left.select(
        (key.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side")) ++
          leftCols.filterNot(key.contains).map(c => col(c).as(s"__l_$c")) ++
          rightCarry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))
          : _*)
      val r = right.select(
        (key.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side")) ++
          leftCols.filterNot(key.contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
          rightCarry.map(c => col(c).as(s"__r_$c")): _*)
      l.unionByName(r)
    }
    // The match is carried as ONE struct per right row — atomic, so every
    // output column comes from the SAME matched right row, nulls inside
    // the matched row are preserved (not back-filled from older rows),
    // and ties at equal (key, time) break deterministically on the struct
    // itself (greatest carry values win, matching the oracle's ordering).
    val matchStruct = when(col("__side") === 0,
      struct(col("__t").as("__mt") +:
        rightCarry.map(c => col(s"__r_$c").as(c)): _*))
    // backward: nearest right row at-or-before; forward: at-or-after
    // (reversed time order). Either way right rows sort before left rows
    // at equal times (side 0 < 1), keeping the match inclusive.
    val ord =
      if (direction == "backward")
        Seq(col("__t").asc, col("__side").asc, col("__m").asc_nulls_first)
      else
        Seq(col("__t").desc, col("__side").asc, col("__m").asc_nulls_first)
    val w = Window.partitionBy(key.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged.withColumn("__m", matchStruct)
      .withColumn("__c", last(col("__m"), ignoreNulls = true).over(w))
    // tolerance: void matches farther than toleranceUs from the left time
    def toUs(c: Column): Column = tagged.schema("__t").dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val within = toleranceUs.fold(col("__c").isNotNull) { tol =>
      col("__c").isNotNull &&
        abs(toUs(col("__t")) - toUs(col("__c.__mt"))) <= tol
    }
    carried.where(col("__side") === 1).select(
      key.map(col) ++
        leftCols.filterNot(key.contains).map(c => col(s"__l_$c").as(c)) ++
        rightCarry.map(c =>
          when(within, col(s"__c.$c"))
            .otherwise(lit(null).cast(right.schema(c).dataType)).as(c)): _*)
  }

  /** Point-in-interval (range) join WITHOUT an equi key, binned: a naive
    * theta join `p BETWEEN s AND e` is a cross product; instead both sides
    * map to coarse time bins — points to their bin, intervals to EVERY bin
    * they overlap — the join becomes an equi-join on bin, and the exact
    * containment predicate filters within bins. Cost is linear in
    * points + intervals×(span/binSize) instead of points×intervals; pick
    * `binSizeUs` near the typical interval span.
    *
    * Inputs carry epoch-µs long columns. Output: one row per (point row,
    * containing interval), exact.
    */
  def rangeJoinBinned(points: DataFrame, pointTimeUs: String,
      intervals: DataFrame, startUs: String, endUs: String,
      binSizeUs: Long): DataFrame = {
    // integer `div`: epoch-µs values would lose precision through a
    // double-typed `/`
    val p = points.withColumn("__bin", expr(s"`$pointTimeUs` div $binSizeUs"))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        expr(s"`$startUs` div $binSizeUs"), expr(s"`$endUs` div $binSizeUs"))))
    p.join(i, Seq("__bin"))
      .where(col(pointTimeUs).between(col(startUs), col(endUs)))
      .drop("__bin")
  }

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event (per key) exceeds `gapSeconds`. Returns the input plus
    * a `session_id` column (0-based per key, ordered by time).
    * lag + running sum — one shuffle by key, one sort.
    */
  def sessionize(events: DataFrame, key: Seq[String], timeCol: String,
      gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(key.map(col): _*).orderBy(col(timeCol))
    val prevT: Column = lag(col(timeCol), 1).over(order)
    val isNew = when(prevT.isNull, 1L)
      .when(unix_micros(col(timeCol)) - unix_micros(prevT) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    val runningW = Window.partitionBy(key.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(runningW) - 1)
      .drop("__new")
  }
}
