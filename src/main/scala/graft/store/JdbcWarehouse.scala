package graft.store

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC warehouse I/O (S9/W3): the reference's load step targets a JDBC
  * database — Postgres or Snowflake selected by config
  * (py_pipeline/load.py:126-137) — with merge or replace dispositions
  * (tests/load_test.py:81-157). This engine speaks the same contract through
  * Spark's JDBC source; the in-process Derby engine stands in for the remote
  * database in tests (same JDBC surface, zero network).
  *
  * Scale shape: writes stream partition-wise over JDBC (`df.write.jdbc`
  * opens one connection per partition — `numPartitions`/`batchsize` are the
  * knobs), and the PK merge runs SERVER-side via `MERGE INTO` from a staged
  * table, so the existing warehouse rows never round-trip through Spark.
  * That matches warehouse practice (stage + MERGE) rather than re-reading
  * the target into the cluster.
  */
object JdbcWarehouse {

  /** W2 disposition: drop-and-recreate the table from `df`. */
  def replace(df: DataFrame, url: String, table: String,
      props: Properties): Unit =
    df.write.mode(SaveMode.Overwrite)
      .options(optionMap(props))
      .jdbc(url, table, props)

  /** W1/W3 disposition: PK merge. New keys insert, existing keys update —
    * load_test.py:81-157 semantics (duplicate keys within `updates`
    * collapse first; untouched rows survive).
    *
    * Mechanics: stage the (deduplicated) delta via a partition-parallel
    * JDBC write, then one server-side `MERGE INTO target USING stage`, then
    * drop the stage. First write just creates the table.
    */
  def upsert(spark: SparkSession, updates: DataFrame, url: String,
      table: String, pk: Seq[String], props: Properties): Unit = {
    require(pk.nonEmpty, "upsert requires a primary key")
    // Spark's JDBC writer interpolates the table name UNQUOTED into its
    // DDL, so the server case-folds it; our MERGE/DROP must use the same
    // unquoted form to resolve to the same object. That contract only
    // holds for plain identifiers (optionally schema-qualified) — reject
    // anything else loudly instead of emitting inconsistent SQL.
    requirePlainIdentifier(table)
    val deduped = updates.dropDuplicates(pk)
    if (!tableExists(url, table, props)) {
      deduped.write.mode(SaveMode.ErrorIfExists)
        .options(optionMap(props)).jdbc(url, table, props)
      return
    }
    // per-invocation nonce: the stage name can never collide with a real
    // user table named "<table>_stage" (which Overwrite would destroy) nor
    // with a concurrent upsert's stage on the same target; a stage
    // stranded by a crashed JVM is uniquely named scratch, not a
    // correctness hazard — but it is also never reclaimed automatically
    // (dropping <table>_stage_% here could kill a CONCURRENT upsert's live
    // stage). Call [[dropStrandedStages]] from a maintenance window when no
    // upserts are in flight to reclaim them.
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val stage = s"${table}_stage_$nonce"
    deduped.write.mode(SaveMode.Overwrite)
      .options(optionMap(props)).jdbc(url, stage, props)
    val cols = deduped.columns.toSeq
    val nonPk = cols.filterNot(pk.contains)
    def q(c: String) = "\"" + c + "\""
    val on = pk.map(c => s"t.${q(c)} = s.${q(c)}").mkString(" AND ")
    val setClause = nonPk.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
    val insertCols = cols.map(q).mkString(", ")
    val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
    val merge =
      s"""MERGE INTO $table t USING $stage s ON $on
         |${if (nonPk.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setClause" else ""}
         |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"""
        .stripMargin
    withConnection(url, props) { conn =>
      val st = conn.createStatement()
      // the stage is scratch state: drop it whether or not the MERGE
      // succeeded, and let the MERGE's exception (if any) propagate
      try st.executeUpdate(merge)
      finally {
        try st.executeUpdate(s"DROP TABLE $stage")
        catch { case _: java.sql.SQLException => () }
        st.close()
      }
    }
  }

  /** Reclaim stage tables stranded by JVMs that crashed between the stage
    * write and its DROP. Stage names are `<table>_stage_<8-hex-nonce>` per
    * [[upsert]]; this drops every table matching that shape for `table`.
    * ONLY call when no upsert against `table` is in flight — a live
    * concurrent stage matches the same pattern and would be destroyed.
    * Returns the names dropped.
    */
  def dropStrandedStages(url: String, table: String,
      props: Properties): Seq[String] = {
    requirePlainIdentifier(table)
    val bare = table.split('.').last
    val pattern = s"(?i)${java.util.regex.Pattern.quote(bare)}_stage_[0-9a-f]{8}".r
    withConnection(url, props) { conn =>
      val meta = conn.getMetaData
      val rs = meta.getTables(null, null, "%", Array("TABLE"))
      val stages = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("TABLE_NAME"))
        .filter(pattern.pattern.matcher(_).matches()).toList
      rs.close()
      val st = conn.createStatement()
      try stages.filter { sName =>
        try { st.executeUpdate(s"DROP TABLE $sName"); true }
        catch { case _: java.sql.SQLException => false }
      } finally st.close()
    }
  }

  private def requirePlainIdentifier(name: String): Unit =
    require(name.split('.').forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"table name must be a plain (optionally schema-qualified) SQL " +
        s"identifier, got: $name")

  /** Read a warehouse table back (load_test.py reads via read_sql_table). */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties): DataFrame =
    spark.read.options(optionMap(props)).jdbc(url, table, props)

  def tableExists(url: String, table: String, props: Properties): Boolean =
    withConnection(url, props) { conn =>
      // Derby folds unquoted identifiers to uppercase; Spark's JDBC writer
      // quotes, preserving case — probe both forms
      val meta = conn.getMetaData
      Seq(table, table.toUpperCase(java.util.Locale.ROOT)).exists { t =>
        val rs = meta.getTables(null, null, t, null)
        try rs.next() finally rs.close()
      }
    }

  private def withConnection[A](url: String, props: Properties)
      (body: Connection => A): A = {
    Option(props.getProperty("driver"))
      .foreach(d => Class.forName(d))
    val conn = DriverManager.getConnection(url, props)
    try body(conn) finally conn.close()
  }

  private def optionMap(props: Properties): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    props.stringPropertyNames().asScala
      .map(k => k -> props.getProperty(k)).toMap
  }
}
