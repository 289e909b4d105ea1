package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-harness isolating the CONSTANT cost of one Structured Streaming
  * AvailableNow micro-batch run — query start/stop, offset WAL, commit
  * log, state-store bootstrap — from any data volume: the source is a
  * 2-row parquet file, so every measured second is machinery, not data.
  * Run with checkpoints on disk and on tmpfs to split the constant into
  * fsync latency vs scheduler/plumbing; numbers are recorded in SCALE.md
  * ("Streaming constant overhead"). Usage:
  * `runMain graft.tools.StreamOverhead [reps]`.
  */
object StreamOverhead {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val srcDir = java.nio.file.Files.createTempDirectory("graft_so_src_")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.parquet(srcDir.toString + "/t")
    val schema = spark.read.parquet(srcDir.toString + "/t").schema

    def once(base: String): Double = {
      val root = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(base), "graft_so_")
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema)
        .parquet(srcDir.toString + "/t")
        .select("id", "v")
        .writeStream
        .format("parquet")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", root.toString + "/ckpt")
        .option("path", root.toString + "/out")
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    def measure(base: String): Seq[Double] = {
      once(base) // warm codegen/JIT
      (1 to reps).map(_ => once(base))
    }

    val disk = measure(System.getProperty("java.io.tmpdir"))
    val shm =
      if (new java.io.File("/dev/shm").isDirectory) measure("/dev/shm")
      else Seq.empty
    def stats(xs: Seq[Double]) =
      if (xs.isEmpty) "null"
      else f"""{"median":${xs.sorted.apply(xs.size / 2)}%.3f,"min":${xs.min}%.3f,"max":${xs.max}%.3f}"""
    println(s"""{"metric":"stream_constant_sec","reps":$reps,"disk":${stats(disk)},"tmpfs":${stats(shm)}}""")
    spark.stop()
  }
}
