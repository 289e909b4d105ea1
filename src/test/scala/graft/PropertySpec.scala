package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.store.UpsertWriter

/** Property-based invariants over generated inputs — semantics that must
  * hold for ANY data, not just the golden fixtures. Uses raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge artifact is not on
  * the offline classpath), so failures are reproducible.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAllSampled[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    samples(g, n).foreach(body)

  private val batchGen: Gen[List[(Long, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0L, 15L), Gen.alphaStr.map(_.take(5))))

  test("mergePlan: result is PK-unique and updates always win") {
    forAllSampled(Gen.zip(batchGen, batchGen)) { case (t0, u0) =>
      if (t0.nonEmpty || u0.nonEmpty) {
        val target = t0.toDF("id", "v").dropDuplicates("id")
        val updates = u0.toDF("id", "v")
        val merged = UpsertWriter.mergePlan(target, updates, Seq("id")).cache()
        try {
          // PK-unique
          assert(merged.groupBy("id").count().where($"count" > 1).isEmpty)
          val updKeys = updates.select("id").distinct().as[Long].collect().toSet
          // all target and update keys survive, nothing else
          val mergedKeys = merged.select("id").as[Long].collect().toSet
          val targetKeys = target.select("id").as[Long].collect().toSet
          assert((targetKeys ++ updKeys) == mergedKeys)
        } finally merged.unpersist()
      }
    }
  }

  test("ffill never alters non-null cells and volume is never null") {
    val rowGen = Gen.listOfN(12, Gen.zip(
      Gen.choose(1, 28), Gen.oneOf("A", "B"),
      Gen.option(Gen.choose(1.0, 100.0)), Gen.option(Gen.choose(1L, 50L))))
    forAllSampled(rowGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.zipWithIndex.map { case ((d, sym, px, vol), i) =>
          (java.sql.Date.valueOf(f"2024-01-$d%02d"), sym + i, px, px, px, px, vol)
        }.toDF("date_stamp", "symbol", "open", "high", "low", "close", "volume")
        val out = graft.warehouse.Models.ffillCandles(df, "symbol")
        val joined = out.as("o").join(df.as("i"),
          $"o.symbol" === $"i.symbol" && $"o.date_stamp" === $"i.date_stamp")
        // non-null inputs unchanged
        assert(joined.where($"i.close".isNotNull &&
          ($"o.close" =!= $"i.close")).isEmpty)
        // null volume patched to 0, never null out
        assert(out.where($"volume".isNull).isEmpty)
      }
    }
  }

  test("sessionize: ids start at 0, increase by ≤1 in time order per key") {
    val evGen = Gen.listOfN(20, Gen.zip(Gen.choose(1L, 3L),
      Gen.choose(0L, 100000L)))
    forAllSampled(evGen) { evs =>
      if (evs.nonEmpty) {
        val df = evs.map { case (u, off) =>
          (u, new java.sql.Timestamp(1700000000000L + off * 1000L))
        }.toDF("user_id", "ts")
        val out = graft.operators.Temporal
          .sessionize(df, Seq("user_id"), "ts", gapSeconds = 30L)
          .select("user_id", "ts", "session_id")
          .as[(Long, java.sql.Timestamp, Long)].collect()
          .groupBy(_._1)
        out.values.foreach { rows =>
          val ids = rows.sortBy(r => (r._2.getTime, r._3)).map(_._3)
          assert(ids.head == 0L)
          ids.sliding(2).foreach {
            case Array(a, b) => assert(b == a || b == a + 1)
            case _ => ()
          }
        }
      }
    }
  }

  test("asOfJoin equals a brute-force reference for every direction/tolerance") {
    // (key, time-offset, side): coarse offsets force plenty of exact-time
    // ties, the edge the window tie-break must resolve deterministically
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L), Gen.oneOf(0, 1)))
    val base = 1700000000000000L
    forAllSampled(gen, n = 6) { evs =>
      val lefts = evs.zipWithIndex.collect {
        case ((k, t, 1), i) => (i.toLong, k, base + t * 1000000L)
      }
      val rights = evs.zipWithIndex.collect {
        case ((k, t, 0), i) => (k, base + t * 1000000L, i.toLong)
      }
      if (lefts.nonEmpty && rights.nonEmpty) {
        val l = lefts.toDF("lid", "k", "t")
        val r = rights.toDF("k", "t", "rid")
        for (dir <- Seq("backward", "forward");
             tol <- Seq(None, Some(5L * 1000000L))) {
          val got = graft.operators.Temporal
            .asOfJoin(l, r, Seq("k"), "t", "t", Seq("rid"), dir, tol)
            .select("lid", "rid").collect()
            .map(row => row.getLong(0) ->
              (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
          val expect = lefts.map { case (lid, k, lt) =>
            val cands = rights.filter(_._1 == k).filter { case (_, rt, _) =>
              if (dir == "backward") rt <= lt else rt >= lt
            }
            // nearest time wins; exact-time ties break on the GREATEST
            // carried struct (documented contract)
            val best =
              if (dir == "backward") cands.sortBy(c => (c._2, c._3)).lastOption
              else cands.sortBy(c => (-c._2, c._3)).lastOption
            val withinTol = best.filter { case (_, rt, _) =>
              tol.forall(t => math.abs(lt - rt) <= t)
            }
            lid -> withinTol.map(_._3)
          }.toMap
          assert(got == expect, s"direction=$dir tolerance=$tol")
        }
      }
    }
  }

  test("Misra-Gries guarantee holds for arbitrary streams and merge orders") {
    val streamGen = Gen.listOfN(400,
      Gen.frequency(
        3 -> Gen.const("hot"), 2 -> Gen.const("warm"),
        5 -> Gen.choose(0, 50).map(i => s"t$i")))
    forAllSampled(Gen.zip(streamGen, Gen.choose(2, 12)), n = 8) {
      case (stream, k) =>
        if (stream.nonEmpty) {
          val mg = new graft.operators.Sketches.MisraGries(k)
          // split at arbitrary points and merge pairwise — any merge tree
          // must preserve the bound
          val parts = stream.grouped(math.max(stream.size / 3, 1)).toSeq
          val sketch = mg.finish(parts
            .map(p => p.foldLeft(mg.zero)(mg.reduce))
            .reduce(mg.merge))
          assert(sketch.size <= k)
          val n = stream.size.toDouble
          val counts = stream.groupBy(identity).map { case (t, v) => t -> v.size }
          counts.filter(_._2 > n / (k + 1)).keys.foreach { heavy =>
            assert(sketch.contains(heavy),
              s"k=$k n=$n: heavy '$heavy' (${counts(heavy)}) missing")
          }
          // estimates are lower bounds within n/(k+1)
          sketch.foreach { case (t, est) =>
            assert(est <= counts(t) && counts(t) - est <= n / (k + 1) + 1)
          }
        }
    }
  }

  test("minhash lanes are permutation-invariant over document word order") {
    forAllSampled(Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta")), n = 5) { ws =>
      if (ws.nonEmpty) {
        // signatures over DISTINCT shingles: shuffling whole-document
        // token order changes shingles, so instead check determinism and
        // stability under duplication of the full text
        val text = ws.mkString(" ")
        val df = Seq((1L, text), (2L, text + " " + text)).toDF("doc_id", "text")
        val sig = graft.operators.Dedup.minhashSignature(df, numHashes = 4)
          .orderBy("doc_id").collect()
        val s1 = (1 to 4).map(sig(0).getLong)
        val s1again = graft.operators.Dedup.minhashSignature(df, numHashes = 4)
          .orderBy("doc_id").collect()
        assert((1 to 4).map(s1again(0).getLong) == s1) // deterministic
      }
    }
  }

  test("incremental view folds equal recomputes for random version chains") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    import graft.store.{IncrementalView, VersionedTable}
    // random (id, group, value) batches; values step by 0.25 so the
    // decimal(18,2) cast is exact and retractions must cancel bit-for-bit
    val rowsGen: Gen[List[(Long, Long, Double)]] =
      Gen.listOfN(25, Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 4L),
        Gen.choose(0, 400).map(_ / 4.0)))
    forAllSampled(Gen.listOfN(3, rowsGen), n = 3) { versionBatches =>
      val r = java.nio.file.Files
        .createTempDirectory("graft_pv_").toString + "/t"
      VersionedTable.write(
        versionBatches.head.toDF("id", "g", "x").dropDuplicates("id"), r)
      for (batch <- versionBatches.tail)
        VersionedTable.upsert(spark, r, batch.toDF("id", "g", "x"), Seq("id"))
      // a delete wave, hitting extremum witnesses with good probability
      VersionedTable.delete(spark, r,
        VersionedTable.read(spark, r).where(col("id") % 4 === 0).select("id"),
        Seq("id"))
      val vs = VersionedTable.versions(r).sorted
      var s = IncrementalView.state(
        VersionedTable.read(spark, r, Some(vs.head)), "g", "x")
      var m = IncrementalView.stateMoments(
        VersionedTable.read(spark, r, Some(vs.head)), "g", "x")
      var d = IncrementalView.stateDistinct(
        VersionedTable.read(spark, r, Some(vs.head)), "g", "x")
      var mm = IncrementalView.stateMinMax(
        VersionedTable.read(spark, r, Some(vs.head)), "g", "x")
      for ((a, b) <- vs.zip(vs.tail)) {
        val feed = VersionedTable.changeFeed(spark, r, a, b, Seq("id"))
        s = IncrementalView.applyFeed(s, feed, "g", "x")
        m = IncrementalView.applyFeedMoments(m, feed, "g", "x")
        d = IncrementalView.applyFeedDistinct(d, feed, "g", "x")
        mm = IncrementalView.applyFeedMinMax(mm, feed,
          VersionedTable.read(spark, r, Some(b)), "g", "x")
      }
      val fin = VersionedTable.read(spark, r)
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
          .toSeq.sorted
      assert(rows(s.selectExpr("g", "n", "CAST(total AS DOUBLE)")) ==
        rows(IncrementalView.state(fin, "g", "x")
          .selectExpr("g", "n", "CAST(total AS DOUBLE)")))
      assert(rows(m.selectExpr("g", "n", "CAST(total AS DOUBLE)",
          "CAST(total2 AS DOUBLE)")) ==
        rows(IncrementalView.stateMoments(fin, "g", "x")
          .selectExpr("g", "n", "CAST(total AS DOUBLE)",
            "CAST(total2 AS DOUBLE)")))
      assert(rows(IncrementalView.distinctCounts(d, "g")) ==
        rows(fin.groupBy("g")
          .agg(countDistinct(col("x")).as("n_distinct"))))
      assert(rows(mm.selectExpr("g", "n", "CAST(total AS DOUBLE)",
          "CAST(lo AS DOUBLE)", "CAST(hi AS DOUBLE)")) ==
        rows(IncrementalView.stateMinMax(fin, "g", "x")
          .selectExpr("g", "n", "CAST(total AS DOUBLE)",
            "CAST(lo AS DOUBLE)", "CAST(hi AS DOUBLE)")))
    }
  }

  test("incremental index folds equal rebuilds for random corpus mutations") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Retrieval
    import graft.store.VersionedTable
    // random (id, text) batches from a small vocab: rewrites retract old
    // term multisets and add new ones, then a delete wave retracts whole
    // docs — the folded (term, doc, tf) state must equal a re-tokenize of
    // the final snapshot for ANY chain
    val word = Gen.oneOf("ab", "cd", "ef", "gh", "ij")
    val docGen = Gen.zip(Gen.choose(0L, 9L),
      Gen.choose(1, 6).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" "))))
    val batchGen = Gen.listOfN(12, docGen)
    forAllSampled(Gen.listOfN(3, batchGen), n = 3) { versionBatches =>
      val r = java.nio.file.Files
        .createTempDirectory("graft_pix_").toString + "/t"
      VersionedTable.write(
        versionBatches.head.toDF("doc_id", "text").dropDuplicates("doc_id"), r)
      for (batch <- versionBatches.tail)
        VersionedTable.upsert(spark, r,
          batch.toDF("doc_id", "text").dropDuplicates("doc_id"), Seq("doc_id"))
      VersionedTable.delete(spark, r,
        VersionedTable.read(spark, r).where(col("doc_id") % 3 === 0)
          .select("doc_id"),
        Seq("doc_id"))
      val vs = VersionedTable.versions(r).sorted
      var st = Retrieval.indexState(
        VersionedTable.read(spark, r, Some(vs.head)), "doc_id", "text", n = 2)
      for ((a, b) <- vs.zip(vs.tail))
        st = Retrieval.applyFeedIndex(st,
          VersionedTable.changeFeed(spark, r, a, b, Seq("doc_id")),
          "doc_id", "text", n = 2)
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
          .toSeq.sorted
      // the fine-grained state itself must match, not just the term stats
      assert(rows(st) == rows(Retrieval.indexState(
        VersionedTable.read(spark, r), "doc_id", "text", n = 2)))
    }
  }

  test("topKByScore equals sort-and-take for any scores, ties, NaN, k") {
    // the bounded heap is hand-rolled: ties (score desc, id asc), NaN
    // (SQL ordering ranks it greatest), duplicate ids, groups under k,
    // and null scores (skipped) all have to match the reference exactly
    // for ANY input and ANY partitioning
    import org.apache.spark.sql.functions.posexplode
    val rowGen: Gen[List[(Long, Long, Option[Double])]] = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L),
        Gen.option(Gen.oneOf(Gen.choose(-1.0, 1.0), Gen.oneOf(
          0.5, 0.5, -0.25, Double.NaN, 0.0, -0.0)))))
    forAllSampled(Gen.zip(rowGen, Gen.oneOf(1, 3, 7), Gen.oneOf(1, 5)),
        n = 8) { case (rows, k, parts) =>
      val df = rows.toDF("g", "id", "s").repartition(parts)
      // scores compare as canonical BITS: Scala's == on boxed doubles has
      // NaN != NaN, which would make identical NaN tuples "differ". ±0.0
      // canonicalizes to +0.0 FIRST: a (g, id) drawn with both zero signs
      // is a full SQL tie (score equal, id equal) whose relative order is
      // unspecified, so the zero's sign at those positions must not
      // distinguish the sets
      def bits(d: Double): Long =
        java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
      val got = df.groupBy("g")
        .agg(graft.functions.TopKAggregate.topKByScore($"s", $"id", k)
          .as("top"))
        .select($"g", posexplode($"top").as(Seq("pos", "e")))
        .select($"g", $"pos", $"e.id", $"e.score")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          bits(r.getDouble(3))))
        .toSet
      // reference: SQL double ordering — NaN greatest, -0.0 == 0.0
      // (java.lang.Double.compare would order -0.0 < 0.0 and miss the
      // id tie-break Spark applies to a ±0 tie)
      def sqlCmp(a: Double, b: Double): Int =
        if (a < b) -1 else if (a > b) 1 else if (a == b) 0
        else if (a.isNaN && b.isNaN) 0 else if (a.isNaN) 1 else -1
      val expect = rows.collect { case (g, id, Some(s)) => (g, id, s) }
        .groupBy(_._1).toSeq.flatMap { case (g, grp) =>
          grp.map(r => (r._2, r._3))
            .sortWith { case ((ia, sa), (ib, sb)) =>
              val c = sqlCmp(sa, sb)
              if (c != 0) c > 0 else ia < ib
            }
            .take(k).zipWithIndex
            .map { case ((id, s), pos) => (g, pos, id, bits(s)) }
        }.toSet
      assert(got == expect, s"k=$k parts=$parts")
    }
  }

  test("repairClusteredPQCells equals a rebuild under random feeds and damage") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.Similarity
    // random corpus × random update/delete/insert feed: fold it, then
    // damage EVERY touched cell one of three ways — leave the folded
    // result, lose the directory, or roll back to the pre-feed image —
    // and the repair must land on the rebuild exactly, whatever mixture
    // the simulated crash left behind (the invariant the streaming
    // runner's marker-lag recovery rests on)
    val caseGen = for {
      n <- Gen.choose(12, 24)
      rows <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-1f, 1f)))
      dels <- Gen.someOf(1 until n)
      upds <- Gen.someOf(1 until n)
      nIns <- Gen.choose(0, 4)
      rot <- Gen.choose(0, 2)
    } yield (rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) },
      dels.map(_.toLong).toSet -- upds.map(_.toLong),
      upds.map(_.toLong).toSet, nIns, rot)
    forAllSampled(caseGen, n = 4) { case (rows, dels, upds, nIns, rot) =>
      val corpus = rows.toDF("vec_id", "embedding")
      val cents = Similarity.kmeans(corpus, 3, 2)
      val cb = Similarity.pqCodebooks(corpus, m = 2, k = 4, iterations = 1)
      val path = java.nio.file.Files
        .createTempDirectory("graft_pqrep_").toString + "/idx"
      Similarity.writeClusteredPQ(corpus, cents, cb, path)
      def newVec(i: Long) =
        Array.tabulate(4)(d => 0.1f * ((i + d) % 5) - 0.2f)
      val outIds = (dels ++ upds).toSeq
      val plusRows = upds.toSeq.sorted.map(i => (i, newVec(i))) ++
        (0 until nIns).map(j => (rows.length.toLong + j,
          newVec(rows.length.toLong + j)))
      val minus =
        if (outIds.isEmpty) corpus.where(lit(false))
          .select($"vec_id", $"embedding", lit(-1L).as("__sign"))
        else corpus.where($"vec_id".isin(outIds: _*))
          .select($"vec_id", $"embedding", lit(-1L).as("__sign"))
      val feed = minus.unionByName(plusRows.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding", lit(1L).as("__sign")))
      val pre = spark.read.parquet(path)
        .select($"vec_id", $"cell".cast("long").as("cell"), $"code")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      Similarity.maintainClusteredPQ(spark, path, cents, cb, feed)
      val post = (if (outIds.isEmpty) corpus
        else corpus.where(!$"vec_id".isin(outIds: _*)))
        .unionByName(plusRows.toDF("vec_id", "embedding"))
      val rebuilt = java.nio.file.Files
        .createTempDirectory("graft_pqrep_rb_").toString + "/idx"
      Similarity.writeClusteredPQ(post, cents, cb, rebuilt)
      def rowsOf(p: String) = spark.read.parquet(p)
        .select($"vec_id", $"cell".cast("long"), $"code")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Long](2))).toSet
      val plusIds = plusRows.map(_._1).toSet
      val touched = pre.filter(r => dels(r._1) || upds(r._1)).map(_._2).toSet ++
        rowsOf(rebuilt).filter(r => plusIds(r._1)).map(_._2)
      touched.foreach { c =>
        val dir = java.nio.file.Paths.get(path).resolve(s"cell=$c")
        (((c + rot) % 3).toInt) match {
          case 1 => UpsertWriter.deleteRecursively(dir)
          case 2 =>
            val old = pre.filter(_._2 == c)
            if (old.isEmpty) UpsertWriter.deleteRecursively(dir)
            else old.toSeq.map { case (id, _, code) => (id, code) }
              .toDF("vec_id", "code")
              .write.mode("overwrite").parquet(dir.toString)
          case _ => () // crash landed after this cell committed
        }
      }
      if (touched.nonEmpty)
        Similarity.repairClusteredPQCells(spark, path, post, cents, cb, feed)
      assert(rowsOf(path) == rowsOf(rebuilt),
        s"dels=$dels upds=$upds nIns=$nIns rot=$rot touched=$touched")
    }
  }

  test("prefix-sum operators equal their window forms for any corpus shape") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, concat, expr, lit, pmod,
      row_number, sum}
    import graft.operators.Corpus
    // random corpora — including empty frames, null token counts, and
    // single-shard skew — under every partitioning: the distributed
    // prefix sum must reproduce the per-group window EXACTLY, the
    // invariant both packSequences and shuffleShard rest on
    val gen = for {
      n <- Gen.choose(0, 80)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 1000L),
        Gen.oneOf("a", "b", "c", "zz"),
        Gen.option(Gen.choose(0L, 50L))))
      parts <- Gen.oneOf(1, 3, 8)
      budget <- Gen.oneOf(1L, 7L, 100L)
      nShards <- Gen.oneOf(1, 2, 5)
    } yield (rows.distinctBy(_._1), parts, budget, nShards)
    forAllSampled(gen, n = 6) { case (rows, parts, budget, nShards) =>
      val base = rows.toDF("id", "lang", "nt")
      val packed = Corpus.packSequences(base.repartition(parts),
          "lang", "id", col("nt"), budget)
        .select("id", "pack_id").as[(Long, Option[Long])].collect().toMap
      val w = Window.partitionBy("lang").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wantPack = base
        .withColumn("cum", sum(col("nt")).over(w))
        .select($"id", expr(s"(cum - nt) div $budget").as("pack_id"))
        .as[(Long, Option[Long])].collect().toMap
      assert(packed == wantPack, s"parts=$parts budget=$budget")
      val sharded = Corpus.shuffleShard(
          base.select("id", "nt").repartition(parts), "id", nShards, "pp")
        .select("id", "shard", "pos").as[(Long, Long, Long)]
        .collect().toSet
      val wantShard = base.select("id", "nt")
        .withColumn("sort_key", graft.functions.TextFunctions.portableHash(
          concat(lit("pp"), lit("|"), $"id".cast("string"))))
        .withColumn("shard", pmod(graft.functions.TextFunctions.portableHash(
          concat(lit("pp"), lit("#"), $"id".cast("string"))),
          lit(nShards)).cast("long"))
        .withColumn("pos", row_number().over(
          Window.partitionBy("shard").orderBy("sort_key", "id")) - 1)
        .select($"id", $"shard", $"pos".cast("long"))
        .as[(Long, Long, Long)].collect().toSet
      assert(sharded == wantShard, s"parts=$parts nShards=$nShards")
    }
  }

  test("streaming packer equals the batch packer for any corpus and budget") {
    import org.apache.spark.sql.functions.{col, size}
    import graft.operators.Corpus
    import graft.streaming.StreamingPack
    import StreamingPack.{PackDocIds, PackDocIn}
    // random corpora (including empty frames, empty id arrays,
    // single-shard skew) × random budgets: batch-mode packTyped must
    // equal packSequences doc-for-doc, and materializeTyped must equal
    // materializeTokenPacks on every CLOSED pack (all but each shard's
    // last) — the invariant the q153/q155 gates rest on
    val gen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L),
        Gen.oneOf("a", "b", "zz"),
        Gen.choose(0, 30).flatMap(k =>
          Gen.listOfN(k, Gen.choose(0, 99)))))
      budget <- Gen.oneOf(1L, 8L, 64L)
    } yield (rows.distinctBy(_._1), budget)
    forAllSampled(gen, n = 6) { case (rows, budget) =>
      val typedIn = rows.map { case (id, sh, ids) =>
        PackDocIds(sh, id, ids) }
      val assigned = StreamingPack.packTyped(
          typedIn.map(d => PackDocIn(d.shard, d.doc_id,
            d.ids.length.toLong)).toDS(), budget)
        .collect().map(a => (a.shard, a.doc_id) -> a.pack_id).toMap
      val idsDf = typedIn.toDF()
        .withColumn("__n_tokens", size(col("ids")).cast("long"))
      val packed = Corpus.packSequences(idsDf, "shard", "doc_id",
        col("__n_tokens"), budget)
      val wantAssign = packed.select("shard", "doc_id", "pack_id")
        .as[(String, Long, Long)].collect()
        .map { case (s, d, p) => (s, d) -> p }.toMap
      assert(assigned == wantAssign, s"budget=$budget")
      val closed = StreamingPack.materializeTyped(typedIn.toDS(), budget)
        .collect().map(p => (p.shard, p.pack_id) ->
          ((p.n_docs, p.pack_tokens, p.pack_ids.toList,
            p.doc_offsets.toList))).toMap
      val batch = Corpus.materializeTokenPacks(packed, "shard", "doc_id",
          "ids")
        .select("shard", "pack_id", "n_docs", "pack_tokens", "pack_ids",
          "doc_offsets")
        .as[(String, Long, Long, Long, Seq[Int], Seq[Int])].collect()
      val lastPack = batch.groupBy(_._1).map { case (s, ps) =>
        s -> ps.map(_._2).max }
      val wantClosed = batch.filter(p => p._2 < lastPack(p._1))
        .map(p => (p._1, p._2) ->
          ((p._3, p._4, p._5.toList, p._6.toList))).toMap
      assert(closed == wantClosed, s"budget=$budget")
    }
  }

  test("bounded cell pairs equal the unbounded join for any corpus and cap") {
    import org.apache.spark.sql.functions.col
    import graft.operators.{Dedup, Similarity}
    import graft.functions.VectorFunctions
    // random 4-dim corpora with a shared offset (so cells form non-trivial
    // clusters) × caps from pathological (1) to no-op (1000): the triangle
    // block decomposition must reproduce the plain cell join's pair set
    // EXACTLY for every shape
    val vecGen: Gen[List[(Long, List[Float])]] = for {
      n <- Gen.choose(20, 60)
      base <- Gen.listOfN(4, Gen.choose(-5f, 5f))
      rows <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-1f, 1f)))
    } yield rows.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.zip(base).map { case (a, b) => a + b }) }
    forAllSampled(Gen.zip(vecGen, Gen.oneOf(1L, 2L, 3L, 7L, 1000L)), n = 6) {
      case (rows, cap) =>
        val emb = rows.toDF("vec_id", "embedding")
        val cent = Similarity.kmeans(emb, 3, 1)
        val asg = Similarity.ivfAssignN(emb, cent, 2)
          .withColumn("nrm", VectorFunctions.norm(col("embedding")))
        def pairs(c: Long): Set[(Long, Long)] =
          Dedup.boundedCellPairs(asg, -1.0, c, "vec_id", "embedding")
            .select("id_a", "id_b")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(pairs(cap) == pairs(1000000L), s"cap $cap changed the pair set")
    }
  }

  test("samplePerGroup equals its row_number window form for any input") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, concat, lit, row_number}
    import graft.functions.TextFunctions
    import graft.operators.Corpus
    // the heap port must reproduce the window form's selection EXACTLY:
    // same hash-ascending rank, same id tie-break, under every
    // partitioning — including empty frames and groups smaller than k
    val gen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L),
        // null is a group too: the heap port must sample the null
        // partition exactly like the window form did (ADVICE r9)
        Gen.oneOf("en", "fr", "de", "zz", null: String)))
      k <- Gen.oneOf(1, 3, 10)
      parts <- Gen.oneOf(1, 3, 8)
    } yield (rows.distinctBy(_._1), k, parts)
    forAllSampled(gen, n = 8) { case (rows, k, parts) =>
      val df = rows.toDF("doc_id", "lang").repartition(parts)
      val got = Corpus.samplePerGroup(df, "lang", "doc_id", k)
        .select("doc_id", "lang").as[(Long, String)].collect().toSet
      val w = Window.partitionBy("lang").orderBy(
        TextFunctions.portableHash(
          concat(org.apache.spark.sql.functions.coalesce(col("lang"),
            lit(" ")), lit("|"), col("doc_id").cast("string"))),
        col("doc_id"))
      val want = df.withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= k).drop("__rk")
        .select("doc_id", "lang").as[(Long, String)].collect().toSet
      assert(got == want, s"k=$k parts=$parts")
    }
  }

  test("selectToTokenBudget equals the global-sort window form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, sum}
    import graft.operators.Corpus
    // score ties, null token counts, NULL SCORES (not selectable and
    // must not pre-empt the budget — ADVICE r9), empty frames, every
    // partitioning: the distributed prefix sum must keep EXACTLY the
    // window's null-score-free prefix
    val gen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L),
        Gen.option(Gen.choose(0, 5).map(_.toDouble)),
        Gen.option(Gen.choose(0L, 30L))))
      parts <- Gen.oneOf(1, 3, 8)
      budget <- Gen.oneOf(0L, 10L, 100L, 10000L)
    } yield (rows.distinctBy(_._1), parts, budget)
    forAllSampled(gen, n = 8) { case (rows, parts, budget) =>
      val df = rows.toDF("id", "score", "nt").repartition(parts)
      val got = Corpus.selectToTokenBudget(df, col("score"), "id",
          col("nt"), budget)
        .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
      val w = Window.orderBy(col("score").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.where(col("nt").isNotNull && col("score").isNotNull)
        .withColumn("cum", sum(col("nt")).over(w))
        .where(col("cum") <= budget)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == want, s"parts=$parts budget=$budget")
    }
  }

  test("dedupIndexAddBatch equals a plain-Scala replay of the policy") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextKernels
    import graft.operators.Dedup
    // documents drawn from a tiny alphabet so shingle overlaps actually
    // happen; the reference below re-derives banding + jaccard + the
    // accept/reject rules with NO Spark involved
    val words = Vector("alpha", "beta", "gamma", "delta", "omega", "psi")
    val docGen = Gen.listOfN(6,
      Gen.oneOf(words)).map(_.mkString(" "))
    val gen = for {
      nIdx <- Gen.choose(0, 8)
      idx <- Gen.listOfN(nIdx, docGen)
      nB <- Gen.choose(0, 8)
      bat <- Gen.listOfN(nB, docGen)
      parts <- Gen.oneOf(1, 3)
    } yield (idx.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      bat.zipWithIndex.map { case (t, i) => ((100 + i).toLong, t) }, parts)

    def bandsOf(text: String): Set[(Int, String)] = {
      val sig = TextKernels.minhashLanes(UTF8String.fromString(text), 8, 3)
        .toLongArray()
      (0 until 4).map(b => b -> s"${sig(2 * b)}_${sig(2 * b + 1)}").toSet
    }
    def shOf(text: String): Set[String] =
      TextKernels.shingleStrings(UTF8String.fromString(text), 3).toSet
    def jacOk(a: String, b: String): Boolean = {
      val (sa, sb) = (shOf(a), shOf(b))
      val i = sa.intersect(sb).size
      i.toDouble >= 0.3 * (sa.size + sb.size - i)
    }

    forAllSampled(gen, n = 8) { case (accepted, batch, parts) =>
      val spark2 = spark
      import spark2.implicits._
      val accDf = accepted.toDF("doc_id", "text").repartition(parts)
      val batDf = batch.toDF("doc_id", "text").repartition(parts)
      val (got, _) = Dedup.dedupIndexAddBatch(
        Dedup.dedupIndexKeys(accDf), batDf)
      val gotIds = got.select("doc_id").as[Long].collect().toSet

      val accBands = accepted.map { case (id, t) => id -> bandsOf(t) }
      val batBands = batch.map { case (id, t) => id -> bandsOf(t) }.toMap
      val texts = (accepted ++ batch).toMap
      val wantIds = batch.collect { case (d, td)
        if !(accBands.exists { case (a, bk) =>
              bk.intersect(batBands(d)).nonEmpty && jacOk(td, texts(a)) } ||
             batch.exists { case (a, ta) => a < d &&
               batBands(a).intersect(batBands(d)).nonEmpty &&
               jacOk(td, ta) }) => d }.toSet
      assert(gotIds == wantIds, s"parts=$parts accepted=$accepted batch=$batch")
    }
  }

  test("allocateEpochs equals a plain-Scala replay of the allocation") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextKernels
    import graft.operators.Corpus
    val gen = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L),
        Gen.oneOf("aa", "bb", "cc"), Gen.option(Gen.choose(0L, 20L))))
      budget <- Gen.oneOf(0L, 50L, 400L, 5000L)
      maxE <- Gen.oneOf(1, 3)
      parts <- Gen.oneOf(1, 4)
    } yield (rows.distinctBy(_._1), budget, maxE, parts)
    def pHash(s: String): Long =
      TextKernels.portableHash(s.getBytes("UTF-8"))
    forAllSampled(gen, n = 8) { case (rows, budget, maxE, parts) =>
      val df = rows.toDF("doc_id", "lang", "nt").repartition(parts)
      val got = Corpus.allocateEpochs(df, "lang", "doc_id", col("nt"),
          budget, maxE)
        .select("doc_id", "epoch").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      val byDomain = rows.groupBy(_._2)
      val want = if (rows.isEmpty) Map.empty[Long, Seq[Long]] else {
        val target = BigInt(budget) / byDomain.size
        rows.flatMap { case (id, d, _) =>
          val n = byDomain(d).map(_._3.getOrElse(0L)).sum
          if (n <= 0) Seq.empty
          else {
            val full = (target / n).min(BigInt(maxE)).toLong
            val keep = if (full >= maxE) BigInt(0)
              else (BigInt(1000000) * (target - full * n) / n)
                .min(BigInt(1000000))
            val fulls = (0L until full).map(id -> _)
            val partial =
              if (pHash(s"$d@$full|$id") % 1000000 < keep)
                Seq(id -> full) else Seq.empty
            fulls ++ partial
          }
        }.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      }
      assert(got == want, s"budget=$budget maxE=$maxE parts=$parts")
    }
  }

  test("bpeEncode equals a plain-Scala greedy MaxMatch for any vocab and text") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextExpressions
    // distinct piece strings (same-string min-id collisions are pinned by
    // the hand tests); a 3-letter piece alphabet against 4-letter words so
    // partial matches, char fallbacks, and UNKs all occur
    val pieceGen = for {
      n <- Gen.choose(1, 12)
      strs <- Gen.listOfN(n, Gen.choose(1, 3).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    } yield strs.distinct.zipWithIndex.map { case (s, i) => s -> (i + 1) }
    val textGen = for {
      nw <- Gen.choose(0, 6)
      ws <- Gen.listOfN(nw, Gen.choose(1, 6).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf('a', 'b', 'c', 'z')).map(_.mkString)))
    } yield ws.mkString(" ")
    def ref(text: String, pieces: Seq[(String, Int)]): Seq[Int] = {
      val m = pieces.toMap
      text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
        val out = scala.collection.mutable.ArrayBuffer[Int]()
        var p = 0
        while (p < w.length) {
          (w.length to (p + 1) by -1).iterator
            .map(e => w.substring(p, e)).find(m.contains) match {
            case Some(s) => out += m(s); p += s.length
            case None => out += 0; p += 1
          }
        }
        out
      }
    }
    forAllSampled(Gen.zip(pieceGen, Gen.listOfN(5, textGen)), n = 8) {
      case (pieces, texts) =>
        val df = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val got = df.select(col("doc_id"),
            TextExpressions.bpeEncode(col("text"), pieces).as("ids"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
        texts.zipWithIndex.foreach { case (t, i) =>
          assert(got(i.toLong) == ref(t, pieces),
            s"text='$t' pieces=$pieces")
        }
    }
  }

  test("clusterSplit never leaks a pair; naive leak count matches a reference") {
    import org.apache.spark.sql.functions.{col, lit, when}
    import graft.operators.{Corpus, Dedup}
    val words = Vector("alpha", "beta", "gamma", "delta")
    val docGen = Gen.listOfN(5, Gen.oneOf(words)).map(_.mkString(" "))
    val gen = for {
      n <- Gen.choose(2, 12)
      ds <- Gen.listOfN(n, docGen)
      pct <- Gen.oneOf(10, 50, 90)
    } yield (ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }, pct)
    forAllSampled(gen, n = 6) { case (docs, pct) =>
      val df = docs.toDF("doc_id", "text")
      val pairs = Dedup.minhashLshPairs(df)
      val clusters = Dedup.nearDupClusters(df, pairs)
      // the structural invariant, on pair graphs of the real banding rule
      val asg = Corpus.clusterSplit(df, clusters, pct)
      assert(Corpus.splitLeakCount(asg, pairs).collect()(0).getLong(0) == 0L,
        s"pct=$pct docs=$docs")
      // an arbitrary per-doc assignment's leak count equals a plain count
      val naive = df.withColumn("split",
        when(col("doc_id") % 2 === 0, lit("eval")).otherwise(lit("train")))
      val got = Corpus.splitLeakCount(naive, pairs).collect()(0).getLong(0)
      val want = pairs.select("id_a", "id_b").as[(Long, Long)].collect()
        .count { case (a, b) => (a % 2 == 0) != (b % 2 == 0) }
      assert(got == want.toLong, s"docs=$docs")
    }
  }

  /** Plain-Scala replay of the learn-BPE loop: adjacent-pair counts
    * (overlaps included) over the word dictionary, top pair under
    * (count DESC, lhs, rhs), fold-left greedy merge, early stop under
    * `minPair` — the spec-level definition the Spark aggregates and
    * the DuckDB CTE chain must both equal.
    */
  private def refLearnBpe(words: Seq[String], k: Int, minPair: Long)
      : Seq[(Int, String, String, String, Long)] = {
    def applyMerge(syms: Vector[String], l: String, r: String)
        : Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc.init :+ (l + r)
        else acc :+ x
      }
    var state = words.filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (w, c) => (w.map(_.toString).toVector, c) }
      .filter(_._1.size >= 2)
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, String, String, Long)]
    var i = 0
    var stop = false
    while (i < k && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, c) =>
        var j = 0
        while (j + 1 < syms.size) {
          val key = (syms(j), syms(j + 1))
          counts(key) = counts.getOrElse(key, 0L) + c
          j += 1
        }
      }
      val valid = counts.filter(_._2 >= minPair)
      if (valid.isEmpty) stop = true
      else {
        val ((l, r), c) = valid.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((i + 1, l, r, l + r, c))
        state = state
          .map { case (syms, cnt) => (applyMerge(syms, l, r), cnt) }
          .filter(_._1.size >= 2)
        i += 1
      }
    }
    out.toSeq
  }

  test("learnBpeMerges equals the plain-Scala replay on random corpora") {
    // small alphabet forces dense pair collisions, repeats, and ties
    val wordGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.zip(
      Gen.choose(5, 30).flatMap(n => Gen.listOfN(n, wordGen)),
      Gen.oneOf(1L, 2L)) // minPairCount: both the always-merge and the floor path
    forAllSampled(corpusGen, n = 6) { case (words, minPair) =>
      // pack words into multi-token docs: tokenization must not matter
      val docs = words.grouped(4).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val got = graft.operators.Corpus.learnBpeMerges(docs, "text",
          numMerges = 6,
          minPairCount = minPair)
        .orderBy("merge_rank")
        .select("merge_rank", "lhs", "rhs", "merged", "pair_count")
        .as[(Int, String, String, String, Long)].collect().toSeq
      val want = refLearnBpe(words, k = 6, minPair = minPair)
      assert(got == want, s"words=$words minPair=$minPair")
    }
  }
}
