package graft.store

import java.nio.file.Files

import graft.SparkSpec

class CompactorSpec extends SparkSpec {
  import spark.implicits._

  test("compact collapses a many-file table without changing its rows") {
    val dir = Files.createTempDirectory("graft_cpt_").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    df.repartition(40).write.parquet(dir)
    assert(Compactor.dataFileCount(dir) >= 40)
    val before = spark.read.parquet(dir).collect().toSet
    val n = Compactor.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(n == 1)
    assert(Compactor.dataFileCount(dir) == 1)
    assert(spark.read.parquet(dir).collect().toSet == before)
    // missing table is a no-op
    assert(Compactor.compact(spark, dir + "_nope") == 0)
  }

  test("target size drives the output file count") {
    val dir = Files.createTempDirectory("graft_cpt2_").toString + "/t"
    (1 to 5000).map(i => (i.toLong, "x" * 50)).toDF("id", "v")
      .repartition(20).write.parquet(dir)
    val bytes = {
      val s = Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
    val n = Compactor.compact(spark, dir, targetFileBytes = bytes / 4)
    assert(n >= 4 && n <= 6, s"expected ~4-6 files for a quarter target, got $n")
    assert(spark.read.parquet(dir).count() == 5000)
  }
}
