package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Print the formatted physical plan of named [[graft.SparkEntry]]
  * queries — the generator for PLANS.md dumps, pinned to the same
  * sf0.001 + 4-partition shape the existing entries were captured at.
  * Usage: `runMain graft.tools.DumpPlan <sfDir> <query> [query ...]`.
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpPlan <sfDir> <query> [query ...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
