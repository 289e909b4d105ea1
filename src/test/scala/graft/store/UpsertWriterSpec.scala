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

  test("merge semantics are identical when the broadcast guard rejects") {
    val p = tmp()
    UpsertWriter.upsert(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    // force the non-broadcast (shuffle join) fallback path
    UpsertWriter.upsert(spark, p, Seq((2L, "B"), (3L, "c")).toDF("id", "v"),
      Seq("id"), broadcastThresholdRows = 1L)
    val got = spark.read.parquet(p).orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("partitioned upsert rewrites ONLY the touched partitions") {
    val p = tmp()
    UpsertWriter.upsertPartitioned(spark, p,
      Seq(("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"),
        ("2024-01-02", 3L, "c")).toDF("day", "id", "v"),
      Seq("day", "id"), "day")
    // record the untouched partition's file listing before the merge
    def files(day: String) =
      new java.io.File(s"$p/day=$day").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    val day1Before = files("2024-01-01")
    UpsertWriter.upsertPartitioned(spark, p,
      Seq(("2024-01-02", 3L, "C2"), ("2024-01-03", 4L, "d"))
        .toDF("day", "id", "v"),
      Seq("day", "id"), "day")
    // day=2024-01-01 files untouched byte-for-byte
    assert(files("2024-01-01") == day1Before)
    val got = spark.read.parquet(p).orderBy("id")
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "C2"), (4L, "d")))
  }

  test("partitioned upsert is idempotent per partition") {
    val p = tmp()
    val batch = Seq(("2024-01-01", 1L, "a")).toDF("day", "id", "v")
    UpsertWriter.upsertPartitioned(spark, p, batch, Seq("day", "id"), "day")
    UpsertWriter.upsertPartitioned(spark, p, batch, Seq("day", "id"), "day")
    assert(spark.read.parquet(p).count() == 1)
  }

  test("schema evolution: a delta with a NEW column widens the table") {
    val path = tmp()
    UpsertWriter.upsert(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    // strict default fails loudly on drift
    intercept[Exception] {
      UpsertWriter.upsert(spark, path,
        Seq((3L, "c", 9.9)).toDF("id", "v", "extra"), Seq("id"))
    }
    // evolving merge widens: survivors get a typed null for `extra`
    UpsertWriter.upsert(spark, path,
      Seq((2L, "B", 9.9)).toDF("id", "v", "extra"), Seq("id"),
      allowNewColumns = true)
    val got = spark.read.parquet(path)
      .orderBy("id").as[(Long, String, Option[Double])].collect().toSeq
    assert(got == Seq((1L, "a", None), (2L, "B", Some(9.9))))
  }

  test("delete removes every row for the given keys, others survive") {
    val p = tmp()
    UpsertWriter.upsert(spark, p,
      Seq((1L, "u1", "a"), (2L, "u1", "b"), (3L, "u2", "c"), (4L, "u3", "d"))
        .toDF("id", "user", "v"), Seq("id"))
    // delete by NON-unique key: all of u1's rows go
    UpsertWriter.delete(spark, p, Seq("u1").toDF("user"), Seq("user"))
    val got = spark.read.parquet(p).orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((3L, "u2", "c"), (4L, "u3", "d")))
    // deleting an absent key is a no-op
    UpsertWriter.delete(spark, p, Seq("nope").toDF("user"), Seq("user"))
    assert(spark.read.parquet(p).count() == 2)
  }

  test("deletePartitioned prunes to touched partitions and drops emptied ones") {
    val p = tmp()
    val rows = Seq(
      ("d1", 1L, "a"), ("d1", 2L, "b"),
      ("d2", 3L, "c"), ("d3", 4L, "d"), ("d3", 5L, "e"))
      .toDF("day", "id", "v")
    rows.write.partitionBy("day").parquet(p)
    val d1File = java.nio.file.Paths.get(p, "day=d1")
    val d1Mtime = Files.getLastModifiedTime(d1File)
    // empty d2 entirely, delete one of d3's two rows; d1 untouched
    UpsertWriter.deletePartitioned(spark, p,
      Seq(("d2", 3L), ("d2", 99L), ("d3", 5L)).toDF("day", "id"),
      Seq("day", "id"), "day")
    assert(!Files.exists(java.nio.file.Paths.get(p, "day=d2")),
      "fully-emptied partition directory must be dropped")
    assert(Files.getLastModifiedTime(d1File) == d1Mtime,
      "untouched partition must not be rewritten")
    val got = spark.read.parquet(p).orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "a", "d1"), (2L, "b", "d1"), (4L, "d", "d3")))
  }

  test("deletePartitioned handles hive-escaped partition values and rejects nulls") {
    val p = tmp()
    // ':' is hive-escaped to %3A in the partition directory name
    Seq(("d:1", 1L, "a"), ("d:1", 2L, "b"), ("d2", 3L, "c"))
      .toDF("day", "id", "v").write.partitionBy("day").parquet(p)
    UpsertWriter.deletePartitioned(spark, p,
      Seq(("d:1", 1L), ("d:1", 2L)).toDF("day", "id"), Seq("day", "id"), "day")
    val dirs = new java.io.File(p).list().toSeq
    assert(dirs.exists(_.startsWith("day=")), s"sanity: $dirs")
    assert(!dirs.exists(_.contains("d%3A1")),
      s"escaped emptied-partition dir must be dropped, saw $dirs")
    assert(spark.read.parquet(p).count() == 1)
    // null partition value in the key set fails loudly, not silently
    intercept[IllegalArgumentException] {
      UpsertWriter.deletePartitioned(spark, p,
        Seq((Option.empty[String], 3L)).toDF("day", "id"), Seq("day", "id"), "day")
    }
  }

  test("mergePlan (relational form) matches the writer semantics") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val got = UpsertWriter.mergePlan(target, updates, Seq("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }
}
