package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt test surface
  * (reference: dw_transformer/models/properties.yml; SURVEY.md §2.9).
  *
  * Each check returns the VIOLATING rows as a DataFrame (empty = pass),
  * exactly like dbt's generated `SELECT ... WHERE <violation>` tests; the
  * runner counts them. Checks compose into a suite evaluated in one pass
  * per table where possible.
  *
  * Scale: not_null/accepted_values are narrow scans (predicate-pushdown
  * friendly); unique is one hash-aggregate shuffle on the key;
  * relationships is a left-anti join — broadcast when the parent side is a
  * dim (dim_symbols is ~1.5k rows vs a 100 TB fact: always broadcast).
  */
object DataTests {

  /** dbt `not_null` (properties.yml:11,19,...). */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.where(col(column).isNull)

  /** dbt `unique` (properties.yml:12,21,104). */
  def unique(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column)).count().where(col("count") > 1)

  /** dbt `accepted_values` (properties.yml:36-52,119-142). */
  def acceptedValues(df: DataFrame, column: String, values: Seq[Any]): DataFrame =
    df.where(!col(column).isin(values: _*) || col(column).isNull)

  /** dbt `relationships` (properties.yml:105-108,157-160): every child key
    * must exist in the parent. Returns orphan child rows.
    */
  def relationships(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(
      broadcast(parent.select(col(parentKey).as(childKey)).distinct()),
      Seq(childKey), "left_anti")

  final case class CheckResult(table: String, check: String, column: String,
      violations: Long) {
    def passed: Boolean = violations == 0L
  }

  sealed trait Check { def name: String; def column: String }
  final case class NotNull(column: String) extends Check { val name = "not_null" }
  final case class Unique(column: String) extends Check { val name = "unique" }
  final case class AcceptedValues(column: String, values: Seq[Any]) extends Check {
    val name = "accepted_values"
  }
  final case class Relationships(column: String, parent: DataFrame,
      parentKey: String) extends Check { val name = "relationships" }

  /** One 1-row frame holding every check's violation count, columns
    * `<prefix><index>`. The row-predicate checks (not_null,
    * accepted_values) FUSE into a single aggregate over one scan of the
    * table; each shuffling check (unique's groupBy, relationships'
    * anti-join) contributes its own 1-row count; all pieces cross-join
    * into one row, so an entire table's suite — any number of checks —
    * materializes in ONE Spark action instead of one job per check (dbt
    * runs its generated tests one statement at a time; there is no reason
    * for a Spark suite to pay that serialization).
    */
  private def checksFrame(df: DataFrame, checks: Seq[Check],
      prefix: String): DataFrame = {
    // count(when(cond, 1)) rather than sum: count is never null on an
    // empty table
    val narrow = checks.zipWithIndex.collect {
      case (NotNull(c), i) =>
        count(when(col(c).isNull, 1)).as(s"$prefix$i")
      case (AcceptedValues(c, vs), i) =>
        count(when(!col(c).isin(vs: _*) || col(c).isNull, 1)).as(s"$prefix$i")
    }
    val shuffling = checks.zipWithIndex.collect {
      case (Unique(c), i) =>
        unique(df, c).agg(count(lit(1)).as(s"$prefix$i"))
      case (Relationships(c, parent, pk), i) =>
        relationships(df, c, parent, pk).agg(count(lit(1)).as(s"$prefix$i"))
    }
    val pieces =
      (if (narrow.isEmpty) Nil
       else Seq(df.agg(narrow.head, narrow.tail: _*))) ++ shuffling
    require(pieces.nonEmpty, "empty check suite")
    pieces.reduce(_.crossJoin(_)) // all 1-row
  }

  private def extract(row: org.apache.spark.sql.Row, table: String,
      checks: Seq[Check], prefix: String): Seq[CheckResult] =
    checks.zipWithIndex.map { case (c, i) =>
      CheckResult(table, c.name, c.column, row.getAs[Long](s"$prefix$i"))
    }

  def run(table: String, df: DataFrame, checks: Seq[Check]): Seq[CheckResult] =
    extract(checksFrame(df, checks, "v").head(), table, checks, "v")

  /** The reference's full declared suite over the two core models
    * (properties.yml:96-160), both directions of the dim↔fct relationship
    * included. Both tables' frames cross-join, so the WHOLE suite — ten
    * checks over two tables — is one Spark action.
    */
  def coreModelSuite(dimSymbols: DataFrame, fctPrices: DataFrame): Seq[CheckResult] = {
    val dimChecks = Seq[Check](
      NotNull("symbol"), Unique("symbol"),
      AcceptedValues("asset_type", Seq("FX", "Stock")),
      AcceptedValues("in_sp400", Seq(true, false)),
      AcceptedValues("in_sp500", Seq(true, false)),
      AcceptedValues("in_sp600", Seq(true, false)),
      Relationships("symbol", fctPrices, "symbol"))
    val fctChecks = Seq[Check](
      NotNull("date_stamp"), NotNull("symbol"),
      Relationships("symbol", dimSymbols, "symbol"))
    val row = checksFrame(dimSymbols, dimChecks, "d")
      .crossJoin(checksFrame(fctPrices, fctChecks, "f"))
      .head()
    extract(row, "dim_symbols", dimChecks, "d") ++
      extract(row, "fct_prices", fctChecks, "f")
  }
}
