package graft.store

import java.nio.file.Files

import graft.SparkSpec

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def root() = Files.createTempDirectory("graft_vt_").toString + "/t"

  test("writes commit as monotonically increasing versions; reads see latest") {
    val r = root()
    assert(VersionedTable.write(Seq((1L, "a")).toDF("id", "v"), r) == 0L)
    assert(VersionedTable.write(Seq((1L, "a2")).toDF("id", "v"), r) == 1L)
    assert(VersionedTable.read(spark, r).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a2")))
  }

  test("time travel: asOf reads an older immutable snapshot") {
    val r = root()
    VersionedTable.write(Seq((1L, "old")).toDF("id", "v"), r)
    VersionedTable.write(Seq((1L, "new")).toDF("id", "v"), r)
    assert(VersionedTable.read(spark, r, asOf = Some(0L))
      .as[(Long, String)].collect().toSeq == Seq((1L, "old")))
  }

  test("versioned upsert merges against the snapshot and keeps history") {
    val r = root()
    VersionedTable.upsert(spark, r, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    VersionedTable.upsert(spark, r, Seq((2L, "B"), (3L, "c")).toDF("id", "v"), Seq("id"))
    assert(VersionedTable.read(spark, r).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    assert(VersionedTable.read(spark, r, asOf = Some(0L)).count() == 2)
  }

  test("snapshotDiff classifies insert/update/delete/unchanged between versions") {
    val r = root()
    VersionedTable.write(
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, null, 4.0))
        .toDF("id", "v", "x"), r)
    // v1: 2 updated, 3 deleted, 5 inserted, 1 unchanged, 4 null→"" edge
    VersionedTable.write(
      Seq((1L, "a", 1.0), (2L, "B", 2.0), (5L, "e", 5.0), (4L, "", 4.0))
        .toDF("id", "v", "x"), r)
    val got = VersionedTable.snapshotDiff(spark, r, 0L, 1L, Seq("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "unchanged"), (2L, "update"), (3L, "delete"),
      (4L, "update"), (5L, "insert")))
  }

  test("rollback repoints; vacuum keeps the pointed version") {
    val r = root()
    VersionedTable.write(Seq((1L, "v0")).toDF("id", "v"), r)
    VersionedTable.write(Seq((1L, "v1")).toDF("id", "v"), r)
    VersionedTable.write(Seq((1L, "v2")).toDF("id", "v"), r)
    VersionedTable.rollback(r, 1L)
    assert(VersionedTable.read(spark, r).as[(Long, String)].collect().toSeq ==
      Seq((1L, "v1")))
    VersionedTable.vacuum(r, keepLast = 1)
    assert(VersionedTable.versions(r).contains(1L)) // pointer target survives
    assert(VersionedTable.read(spark, r).count() == 1)
  }
}
