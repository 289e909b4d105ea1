package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round deliverable helper: writes the
  * `.explain("formatted")` output of named registered queries to
  * `plans/<round>/<query>_<tag>.txt` (tag = before/after; round from
  * SPARK_GRAFT_PLANS_DIR, default plans/r18), with the final AQE plan
  * forced by running the query once first. Diagnostic only — not part
  * of the gated surface.
  *
  * Usage: sbt "runMain graft.tools.PlanSnap before q141_corpus_to_packs[,...]"
  *   (SPARK_GRAFT_SF_DIR overrides the default sf0.1 data dir)
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <tag> q<name>[,q<name>...]")
    val tag = args(0)
    val names = args(1).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    if (sys.props.get("graft.scratch").isEmpty &&
        new java.io.File("/dev/shm").isDirectory) {
      graft.store.UpsertWriter.deleteRecursively(
        java.nio.file.Paths.get("/dev/shm/graft_plansnap"))
      System.setProperty("graft.scratch", "/dev/shm/graft_plansnap")
    }
    graft.SparkEntry.wipeStaleFixtures()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r18"))
    java.nio.file.Files.createDirectories(outDir)
    // INTERNAL frames whose plans never surface in a registered query's
    // gated explain (the vocab is collected driver-side and baked into
    // the encode kernel as literals) — snapshot them by pseudo-name
    val internal: Map[String, (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame] = Map(
      "piece_vocab_build" -> ((s, dir) =>
        graft.operators.Corpus.buildPieceVocab(
          s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
          "text", minCount = 5, maxSize = 200)))
    for (name <- names) {
      val fn = internal.getOrElse(name,
        graft.SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query $name")))
      val df = fn(spark, sfDir)
      df.count() // force the AQE final plan
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = outDir.resolve(s"${name}_$tag.txt")
      java.nio.file.Files.writeString(p, txt)
      println(s"[plansnap] wrote $p (${txt.length} chars)")
    }
    spark.stop()
  }
}
