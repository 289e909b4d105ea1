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

  def run(table: String, df: DataFrame, checks: Seq[Check]): Seq[CheckResult] =
    checks.map { c =>
      val viol = c match {
        case NotNull(col0) => notNull(df, col0)
        case Unique(col0) => unique(df, col0)
        case AcceptedValues(col0, vs) => acceptedValues(df, col0, vs)
        case Relationships(col0, parent, pk) => relationships(df, col0, parent, pk)
      }
      CheckResult(table, c.name, c.column, viol.count())
    }

  /** The reference's full declared suite over the two core models
    * (properties.yml:96-160), both directions of the dim↔fct relationship
    * included.
    */
  def coreModelSuite(dimSymbols: DataFrame, fctPrices: DataFrame): Seq[CheckResult] =
    run("dim_symbols", dimSymbols, Seq(
      NotNull("symbol"), Unique("symbol"),
      AcceptedValues("asset_type", Seq("FX", "Stock")),
      AcceptedValues("in_sp400", Seq(true, false)),
      AcceptedValues("in_sp500", Seq(true, false)),
      AcceptedValues("in_sp600", Seq(true, false)),
      Relationships("symbol", fctPrices, "symbol"),
    )) ++ run("fct_prices", fctPrices, Seq(
      NotNull("date_stamp"), NotNull("symbol"),
      Relationships("symbol", dimSymbols, "symbol"),
    ))
}
