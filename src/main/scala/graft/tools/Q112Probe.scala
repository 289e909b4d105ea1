package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side stall probe for q112 (round-17 investigation): runs the
  * q112_incremental_index composition N times in one JVM, timing each
  * SUB-STAGE separately, to localize the per-rep escalation the r16
  * judge flagged (quiet-host solo reps [3.1, 3.1, 19.6] s). Deleted or
  * kept as a diagnostic — not part of the gated surface.
  */
object Q112Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = if (args.nonEmpty) args(0).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Retrieval
    import graft.store.VersionedTable

    // fixture once (the registered query memoizes it the same way)
    val docs = graft.SparkEntry.t(spark, sfDir, "documents")
      .select("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("q112probe_")
      .toString + "/tbl"
    VersionedTable.write(docs, root)
    VersionedTable.upsert(spark, root,
      docs.where(col("doc_id") % 5 === 0)
        .withColumn("text", concat(col("text"), lit(" graftextra"))),
      Seq("doc_id"))
    VersionedTable.delete(spark, root,
      docs.where(col("doc_id") % 7 === 0).select("doc_id"), Seq("doc_id"))

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[q112] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (rep <- 1 to n) {
      println(s"[q112] ---- rep $rep ----")
      val s0 = time("indexState") {
        val d = Retrieval.indexState(
          VersionedTable.read(spark, root, Some(0L)), "doc_id", "text")
        d.count(); d
      }
      val s1 = time("feed1") {
        val d = Retrieval.applyFeedIndex(s0,
          VersionedTable.changeFeed(spark, root, 0L, 1L, Seq("doc_id")),
          "doc_id", "text")
        d.count(); d
      }
      val s2 = time("feed2") {
        val d = Retrieval.applyFeedIndex(s1,
          VersionedTable.changeFeed(spark, root, 1L, 2L, Seq("doc_id")),
          "doc_id", "text")
        d.count(); d
      }
      val inc = time("termStats") {
        val d = Retrieval.termStats(s2)
          .select(col("term"), col("df").as("df_i"),
            col("tf_total").as("t_i"))
        d.count(); d
      }
      val full = time("fullRebuild") {
        val d = Retrieval.termStats(Retrieval.indexState(
          VersionedTable.read(spark, root), "doc_id", "text"))
        d.count(); d
      }
      time("finalJoin") {
        full.join(inc, Seq("term"), "full_outer")
          .select(col("term"), col("df"), col("tf_total"),
            (col("df") <=> col("df_i") && col("tf_total") <=> col("t_i"))
              .as("ok"))
          .orderBy("term").count()
      }
    }
    spark.stop()
  }
}
