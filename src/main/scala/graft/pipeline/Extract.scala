package graft.pipeline

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's only "query API" — the lake read path
  * (py_pipeline/extract.py:16-39,80-119): select columns, filter a date
  * range, optionally reduce to the distinct symbol universe.
  *
  * Catalyst turns the optional arguments into a column-pruned,
  * predicate-pushed parquet scan (SURVEY.md §3.3) — the reference needed
  * explicit `columns=`/`filters=` arguments to its Rust reader; here the
  * same API shape simply builds a lazy plan and the optimizer does the
  * pushdown (asserted in PlanAuditSpec).
  */
object Extract {

  /** Lake path scheme per the reference: `<root>/<dataset>/<category>`
    * (extract.py:115).
    */
  def lakePath(lakeRoot: String, dataset: String, assetCategory: String): String =
    s"$lakeRoot/$dataset/$assetCategory"

  def fromLake(
      spark: SparkSession,
      lakeRoot: String,
      dataset: String,
      assetCategory: String,
      columns: Option[Seq[String]] = None,
      dateRange: Option[(Date, Date)] = None,
      symbolsOnly: Boolean = false,
  ): DataFrame = {
    val scan0 = spark.read.parquet(lakePath(lakeRoot, dataset, assetCategory))
    val filtered = dateRange.fold(scan0) { case (s, e) =>
      scan0.where(col("date_stamp").between(s, e))
    }
    if (symbolsOnly)
      filtered.select("symbol").distinct()
    else
      columns.fold(filtered)(cs => filtered.select(cs.map(col): _*))
  }

  /** The distinct symbol universe as a driver-side list (A1,
    * extract.py:80-99) — sorted for determinism.
    */
  def symbolUniverse(spark: SparkSession, lakeRoot: String, dataset: String,
      assetCategory: String): Seq[String] =
    fromLake(spark, lakeRoot, dataset, assetCategory, symbolsOnly = true)
      .orderBy("symbol").collect().map(_.getString(0)).toSeq
}
