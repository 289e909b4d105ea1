package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Builder-side profiling probe (round-17 optimization): runs named
  * registered queries cold + N reps in one JVM with a SparkListener
  * recording every Spark JOB's wall time, description, and its stages'
  * shuffle/task totals — the "which action inside this composition is
  * the expensive one" answer the bench's single end-to-end number
  * can't give. Diagnostic only — not part of the gated surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.QueryProfile q141_corpus_to_packs[,q158_...]" [reps]
  */
object QueryProfile {

  private case class JobRow(id: Int, desc: String, wallMs: Long,
      tasks: Int, shufWriteB: Long, shufReadB: Long, inputB: Long,
      stages: Seq[String], execMs: Long)

  private final class Recorder extends SparkListener {
    val rows = mutable.ArrayBuffer[JobRow]()
    private val starts = mutable.Map[Int, (Long, String)]()
    private val jobOfStage = mutable.Map[Int, Int]()
    private val agg = mutable.Map[Int, (Int, Long, Long, Long, Long)]()
    private val names = mutable.Map[Int, mutable.ArrayBuffer[String]]()
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      starts(e.jobId) = (System.nanoTime(), desc)
      e.stageIds.foreach(sid => jobOfStage(sid) = e.jobId)
      agg(e.jobId) = (0, 0L, 0L, 0L, 0L)
      names(e.jobId) = mutable.ArrayBuffer[String]()
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        val si = e.stageInfo
        jobOfStage.get(si.stageId).foreach { jid =>
          val (t, w, r, i, x) = agg.getOrElse(jid, (0, 0L, 0L, 0L, 0L))
          val m = si.taskMetrics
          agg(jid) = (t + si.numTasks,
            w + m.shuffleWriteMetrics.bytesWritten,
            r + m.shuffleReadMetrics.totalBytesRead,
            i + m.inputMetrics.bytesRead,
            x + m.executorRunTime)
          val wall = (for (a <- si.completionTime; b <- si.submissionTime)
            yield a - b).getOrElse(-1L)
          names.getOrElseUpdate(jid, mutable.ArrayBuffer[String]()) +=
            s"${si.name.takeWhile(_ != ':')}(${si.numTasks}t,${wall}ms)"
        }
      }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      starts.remove(e.jobId).foreach { case (t0, desc) =>
        val (t, w, r, i, x) = agg.getOrElse(e.jobId, (0, 0L, 0L, 0L, 0L))
        rows += JobRow(e.jobId, desc, (System.nanoTime() - t0) / 1000000L,
          t, w, r, i, names.getOrElse(e.jobId, Nil).toSeq, x)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    val reps = if (args.length > 1) args(1).toInt else 2
    require(names.nonEmpty, "usage: QueryProfile q<name>[,q<name>...] [reps]")
    // same harness I/O setup as Bench: scratch + checkpoints on tmpfs
    if (sys.props.get("graft.scratch").isEmpty &&
        new java.io.File("/dev/shm").isDirectory) {
      graft.store.UpsertWriter.deleteRecursively(
        java.nio.file.Paths.get("/dev/shm/graft_profile"))
      System.setProperty("graft.scratch", "/dev/shm/graft_profile")
    }
    graft.SparkEntry.wipeStaleFixtures()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment knob: SPARK_GRAFT_PROF_CONF="k=v;k=v" applies extra
    // session confs so a config hypothesis can be measured before it is
    // promoted into the real harness
    sys.env.get("SPARK_GRAFT_PROF_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    val rec = new Recorder
    spark.sparkContext.addSparkListener(rec)
    // SPARK_GRAFT_PROF_STREAM=1: additionally dump every micro-batch's
    // StreamingQueryProgress durationMs breakdown (triggerExecution,
    // queryPlanning, walCommit, commitOffsets, addBatch, getBatch,
    // latestOffset) — the "where does the per-batch constant go"
    // answer the job listener can't give. Diagnostic only.
    if (sys.env.get("SPARK_GRAFT_PROF_STREAM").contains("1"))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit =
            println(s"[stream] started ${e.id}")
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            val p = e.progress
            import scala.jdk.CollectionConverters._
            val dur = p.durationMs.asScala.toSeq.sortBy(-_._2)
              .map { case (k, v) => s"$k=$v" }.mkString(" ")
            println(s"[stream] batch ${p.batchId} rows=${p.numInputRows} " +
              s"$dur")
          }
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
            println(s"[stream] terminated ${e.id}")
        })
    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      for (rep <- 0 to reps) {
        rec.synchronized { rec.rows.clear() }
        val label = if (rep == 0) "cold" else s"rep$rep"
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"$name[$label]")
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give the bus a moment
        Thread.sleep(300)
        val rows = rec.synchronized { rec.rows.toVector }
        val jobSum = rows.map(_.wallMs).sum / 1000.0
        println(f"[profile] ==== $name $label wall=$wall%.2f s " +
          f"jobs=${rows.length} jobSum=$jobSum%.2f s " +
          f"gap=${wall - jobSum}%.2f s (driver/planning)")
        rows.sortBy(-_.wallMs).take(30).foreach { r =>
          println(f"[profile]   job ${r.id}%4d ${r.wallMs}%6d ms " +
            f"tasks=${r.tasks}%4d exec=${r.execMs}%5d ms " +
            f"sw=${r.shufWriteB / 1024}%6d KiB sr=${r.shufReadB / 1024}%6d KiB " +
            f"in=${r.inputB / 1024}%6d KiB" +
            f"  ${r.stages.mkString("|").take(100)}")
        }
      }
      // per-query scratch hygiene, as Bench does between queries
      sys.props.get("graft.scratch").foreach { root =>
        val d = java.nio.file.Paths.get(root)
        if (java.nio.file.Files.isDirectory(d)) {
          val ls = java.nio.file.Files.list(d)
          try ls.forEach { p =>
            if (p.getFileName.toString != "fixtures")
              graft.store.UpsertWriter.deleteRecursively(p)
          } finally ls.close()
        }
      }
    }
    spark.stop()
  }
}
