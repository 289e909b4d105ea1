package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Each query runs twice: the first (untimed, recorded as cold) pays
    // one-shot janino codegen compilation and JIT; the second measures
    // steady-state execution — the number that scales with data volume.
    // Both totals are reported; `value` is the steady-state total.
    def time(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val cold = time(fn)
      val warm = time(fn)
      name -> (cold, warm)
    }
    val qs = results.map { case (k, (_, w)) => s"\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val total = results.values.map(_._2).sum
    val coldTotal = results.values.map(_._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
