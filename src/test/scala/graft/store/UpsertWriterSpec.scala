package graft.store

import java.nio.file.Files

import graft.SparkSpec

/** Merge/replace semantics per the reference's load tests
  * (tests/load_test.py:92-157,207-265): new PKs insert, existing PKs are
  * replaced, re-merging the same batch is a no-op (idempotent).
  */
class UpsertWriterSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_upsert_").toString + "/t"

  test("first upsert creates the table") {
    val p = tmp()
    UpsertWriter.upsert(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    assert(spark.read.parquet(p).count() == 2)
  }

  test("merge replaces matching PKs and inserts new ones") {
    val p = tmp()
    UpsertWriter.upsert(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    UpsertWriter.upsert(spark, p, Seq((2L, "B"), (3L, "c")).toDF("id", "v"), Seq("id"))
    val got = spark.read.parquet(p).orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("merge is idempotent: re-merging the same batch changes nothing") {
    val p = tmp()
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    UpsertWriter.upsert(spark, p, batch, Seq("id"))
    UpsertWriter.upsert(spark, p, batch, Seq("id"))
    val got = spark.read.parquet(p).orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
  }

  test("composite primary key merges on the full key") {
    val p = tmp()
    UpsertWriter.upsert(spark, p,
      Seq((1L, "x", 10.0), (1L, "y", 20.0)).toDF("id", "k", "v"), Seq("id", "k"))
    UpsertWriter.upsert(spark, p,
      Seq((1L, "y", 99.0)).toDF("id", "k", "v"), Seq("id", "k"))
    val got = spark.read.parquet(p).orderBy("id", "k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "x", 10.0), (1L, "y", 99.0)))
  }

  test("replace overwrites the whole table") {
    val p = tmp()
    UpsertWriter.replace(Seq((1L, "a")).toDF("id", "v"), p)
    UpsertWriter.replace(Seq((9L, "z")).toDF("id", "v"), p)
    val got = spark.read.parquet(p).as[(Long, String)].collect().toSeq
    assert(got == Seq((9L, "z")))
  }

  test("update batch with internal PK dups is deduped before merge") {
    val p = tmp()
    UpsertWriter.upsert(spark, p,
      Seq((1L, "a"), (1L, "a2")).toDF("id", "v"), Seq("id"))
    assert(spark.read.parquet(p).count() == 1)
  }

  test("mergePlan (relational form) matches the writer semantics") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val got = UpsertWriter.mergePlan(target, updates, Seq("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }
}
