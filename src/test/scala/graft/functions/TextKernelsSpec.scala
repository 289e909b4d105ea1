package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** The fused codegen kernels must agree exactly with their compositional
  * Spark-builtin equivalents (which in turn are pinned to the DuckDB
  * oracle fragments).
  */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    TextKernels.tokenize(UTF8String.fromString(s)).toSeq

  test("tokenize edge cases match split+filter semantics") {
    assert(toks("") == Seq())
    assert(toks("   ") == Seq())
    assert(toks(" a  b ") == Seq("a", "b"))
    assert(toks("a\tb\nc") == Seq("a", "b", "c"))
    assert(toks("one") == Seq("one"))
  }

  test("shingles: n-grams, short docs collapse to one whole-doc shingle") {
    def sh(s: String, n: Int = 3) =
      TextKernels.shingleStrings(UTF8String.fromString(s), n).toSeq
    assert(sh("a b c d") == Seq("a b c", "b c d"))
    assert(sh("a b") == Seq("a b"))   // < n tokens -> whole doc
    assert(sh("") == Seq(""))         // empty doc -> single empty shingle
  }

  test("portableHash matches Spark's conv(substring(md5(x),1,8),16,10)") {
    val samples = Seq("", "a", "hello world", "naïve café — ünïcode ✓")
    val viaSpark = samples.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    val viaKernel = samples.map(s => TextKernels.portableHash(s.getBytes("UTF-8")))
    assert(viaKernel == viaSpark)
  }

  test("minhashLanes equals the explicit explode+groupBy computation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b"),
      (3L, ""),
      (4L, "x y z x y z x y z")).toDF("doc_id", "text")
    // compositional form: distinct shingles -> hash -> per-lane min
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(TextExpressions.shingles(col("text"), 3))).as("sh"))
      .withColumn("h", conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long"))
    val lanes = graft.operators.Dedup.minhashCoeffs(8).zipWithIndex.map {
      case ((a, b), i) =>
        min((col("h") * a + b) % graft.operators.Dedup.MinhashP).as(s"mh$i")
    }
    val expected = sh.groupBy("doc_id").agg(lanes.head, lanes.tail: _*)
      .orderBy("doc_id").collect().map(r => (0 until 8).map(i => r.getLong(i + 1)))
    val got = graft.operators.Dedup.minhashSignature(docs)
      .orderBy("doc_id").collect().map(r => (0 until 8).map(i => r.getLong(i + 1)))
    assert(got.toSeq == expected.toSeq)
  }

  test("SimhashExpr equals the explicit explode+bit-sum computation") {
    val docs = Seq(
      (1L, "the quick brown fox the quick"),
      (2L, ""),
      (3L, "one"),
      (4L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(TextExpressions.tokens(col("text")))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 16).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"s$b")
    }
    val expected = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
          .as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.operators.Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // token-less docs produce no row in either formulation
    assert(!got.contains(2L))
    assert(got == expected)
  }

  test("TokensExpr/ShinglesExpr survive whole-stage codegen paths") {
    val df = Seq("a b c", "", " x ").toDF("text")
      .select(TextExpressions.tokens(col("text")).as("t"),
        TextExpressions.shingles(col("text"), 2).as("s"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) == Seq("a", "b", "c"))
    assert(rows(0).getSeq[String](1) == Seq("a b", "b c"))
    assert(rows(1).getSeq[String](0) == Seq())
    assert(rows(1).getSeq[String](1) == Seq(""))
    assert(rows(2).getSeq[String](0) == Seq("x"))
  }

  test("null text propagates null (not a crash) through the kernels") {
    val df = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(TextExpressions.tokens(col("text")).as("t"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("nfcNormalize composes decomposed sequences, is idempotent") {
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = "Cafe\u0301 bar" // 'e' + combining acute
    val composed = "Caf\u00e9 bar" // precomposed U+00E9
    def nfc(s: String): String =
      TextKernels.nfcNormalize(UTF8String.fromString(s)).toString
    assert(nfc(decomposed) == composed)
    assert(nfc(composed) == composed) // already-NFC input is a no-op
    assert(nfc("plain ascii 123") == "plain ascii 123")
    // the Column path agrees and nulls propagate
    val out = Seq[(java.lang.Long, String)]((1L, decomposed), (2L, null))
      .toDF("id", "text")
      .select(col("id"), TextExpressions.nfcNormalize(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == composed && out(2L) == null)
  }

  test("hashEmbed matches the per-token hash histogram; edge cases hold") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextExpressions.hashEmbed(col("text"), 8).as("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    // reference: same portable hash, driver-side
    def h(t: String) = TextKernels.portableHash(t.getBytes("UTF-8"))
    val expect = Array.fill(8)(0L)
    Seq("alpha", "beta", "alpha").foreach { t =>
      expect((h(t) % 8).toInt) += (if (((h(t) >> 16) & 1L) == 1L) 1L else -1L)
    }
    assert(got(1L) == expect.toSeq)
    assert(got(2L) == Seq.fill(8)(0L)) // empty text: a zero histogram
    assert(got(3L) == null)            // null text: null, not a crash
    // repeated tokens accumulate: "alpha" contributes twice
    assert(got(1L).map(math.abs).sum == 3)
  }

  test("repetitionStats: line dup counts, top-bigram mass, edge cases") {
    val docs = Seq(
      (1L, "aaa\nbb\naaa\ncc\n\naaa"), // aaa x3, bb, cc; blank dropped
      (2L, "x y x y x y"),             // one line; bigram "x y" x3
      (3L, ""),                        // no lines; one degenerate "" gram
      (4L, null.asInstanceOf[String]), // null propagates
      (5L, "héé\nhéé"))                // code-point chars, not UTF-16
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextExpressions.repetitionStats(col("text")).as("st"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    // lines: aaa(3) + bb + cc -> 5 occurrences, 3 duplicated; chars
    // 3·3+2+2 = 13, dup 9. Bigrams all unique -> tie broken to the
    // byte-smallest "aaa bb" (6 chars, count 1)
    assert(got(1L) == Seq(5L, 3L, 13L, 9L, 1L, 6L))
    assert(got(2L) == Seq(1L, 0L, 11L, 0L, 3L, 9L)) // "x y" x3 -> 9 chars
    assert(got(3L) == Seq(0L, 0L, 0L, 0L, 1L, 0L))  // "" gram: 0 chars
    assert(got(4L) == null)
    assert(got(5L) == Seq(2L, 2L, 6L, 6L, 1L, 7L))  // héé = 3 code points
  }

  test("bpeEncode: greedy longest-match, UNK fallback, min-id ties, nulls") {
    val pieces = Seq("ab" -> 1, "abc" -> 2, "a" -> 10, "b" -> 11, "c" -> 12,
      "a" -> 3) // duplicate piece string: the smaller id must win
    val docs = Seq(
      (1L, "abc ab ba zx"), // whole piece / piece / char+char / UNK+UNK
      (2L, "abab"),         // greedy: ab+ab, never a+b+a+b
      (3L, "abca"),         // longest first: abc then a(id 3, not 10)
      (4L, ""),             // empty text -> empty encoding
      (5L, null: String))   // null text -> null encoding
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextExpressions.bpeEncode(col("text"), pieces).as("ids"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    // hand-computed greedy MaxMatch encodings
    assert(got(1L) == Seq(2, 1, 11, 3, 0, 0))
    assert(got(2L) == Seq(1, 1))
    assert(got(3L) == Seq(2, 3))
    assert(got(4L) == Seq.empty[Int])
    assert(got(5L) == null)
  }

  test("bpeEncode over a built piece vocab decomposes unseen compounds") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "the quick brown fox"), (4L, "the quick brown fox"),
      (5L, "the quick brown fox"), (6L, "quickbrown fox thequick"))
      .toDF("doc_id", "text")
    val vocab = graft.operators.Corpus.buildPieceVocab(docs, "text",
      minCount = 5, maxSize = 200)
    val pieces = graft.operators.Corpus.collectPieces(vocab)
    val byPiece = pieces.toMap
    // word ids are dense 1.. by (count desc, token asc): fox appears 6x
    // (docs 1-5 plus doc 6), the rest 5x and rank alphabetically; the
    // char alphabet starts at maxSize+1 = 201
    assert(Set("brown", "fox", "quick", "the").subsetOf(byPiece.keySet))
    assert(byPiece("fox") == 1 && byPiece("brown") == 2 &&
      byPiece("quick") == 3 && byPiece("the") == 4)
    assert(byPiece("b") > 200)
    val got = docs.where(col("doc_id") === 6L)
      .select(TextExpressions.bpeEncode(col("text"), pieces))
      .collect().head.getSeq[Int](0)
    // compounds split into the known word pieces, no chars needed
    assert(got == Seq(byPiece("quick"), byPiece("brown"), byPiece("fox"),
      byPiece("the"), byPiece("quick")))
  }

  test("bpeUnkCount: counts exactly the UNK emissions of the encode walk") {
    val pieces = Seq("ab" -> 1, "abc" -> 2, "a" -> 10, "b" -> 11, "c" -> 12)
    val docs = Seq(
      (1L, "abc ab ba zx"), // encodes [2,1,11,10,0,0] -> 2 UNKs (z, x)
      (2L, "zzz"),          // all-UNK word: 3
      (3L, "abcabc"),       // fully covered: 0
      (4L, ""),             // empty text: 0
      (5L, null: String))   // null text -> null
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextExpressions.bpeUnkCount(col("text"), pieces).as("u"),
        TextExpressions.bpeCount(col("text"), pieces).as("n"),
        size(TextExpressions.bpeEncode(col("text"), pieces)).as("sz"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getInt(1), r.getInt(2)))).toMap
    assert(got(1L) == (2, 6))
    assert(got(2L) == (3, 3))
    assert(got(3L) == (0, 2))
    assert(got(4L) == (0, 0))
    assert(got(5L) == null)
    // invariant: unk emissions are a subset of all emissions, and the
    // count kernel agrees with size(encode) even through UNK paths
    val rows = docs.where(col("text").isNotNull).select(
      TextExpressions.bpeUnkCount(col("text"), pieces).as("u"),
      TextExpressions.bpeCount(col("text"), pieces).as("n"),
      size(TextExpressions.bpeEncode(col("text"), pieces)).as("sz"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) <= r.getInt(1) && r.getInt(1) == r.getInt(2))
    }
  }

  test("bpeCountUnk fuses count+unk in one walk; tokenByteSum counts UTF-8 bytes") {
    val pieces = Seq("ab" -> 1, "abc" -> 2, "a" -> 10, "b" -> 11, "c" -> 12)
    val docs = Seq((1L, "abc ab ba zx"), (2L, "zzz"), (3L, "abcabc"),
      (4L, ""), (5L, null: String)).toDF("doc_id", "text")
    val rows = docs.select(col("doc_id"),
        TextExpressions.bpeCountUnk(col("text"), pieces).as("cu"),
        TextExpressions.bpeCount(col("text"), pieces).as("n"),
        TextExpressions.bpeUnkCount(col("text"), pieces).as("u"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2) && r.isNullAt(3))
      else {
        val cu = r.getStruct(1)
        assert(cu.getInt(0) == r.getInt(2)) // n_pieces == bpeCount
        assert(cu.getInt(1) == r.getInt(3)) // n_unk == bpeUnkCount
      }
    }
    // tokenByteSum: UTF-8 BYTES, not characters — ö is 2 bytes, 汉 is
    // 3; a swap to char-based length() would fail this pin (the parquet
    // corpora are pure ASCII, where the two are indistinguishable)
    val multi = Seq((1L, "naïve 汉字 ab"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val got = multi.select(col("doc_id"), TextFunctions.tokenByteSum(
        TextFunctions.tokens(col("text"))).as("b")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got(1L) == 6L + 6L + 2L) // naïve=6B, 汉字=6B, ab=2B
    assert(got(2L) == 0L)
    assert(got(3L) == null)
  }

  test("bpeUnkCount is zero on the vocab's own build corpus") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "the quick brown fox"), (4L, "the quick brown fox"),
      (5L, "the quick brown fox"), (6L, "quickbrown fox thequick"))
      .toDF("doc_id", "text")
    val pieces = graft.operators.Corpus.collectPieces(
      graft.operators.Corpus.buildPieceVocab(docs, "text",
        minCount = 5, maxSize = 200))
    val unks = docs.select(
      TextExpressions.bpeUnkCount(col("text"), pieces)).collect()
    assert(unks.forall(_.getInt(0) == 0))
    // but uppercase (absent from the lowercase alphabet) is OOV
    val up = docs.select(TextExpressions.bpeUnkCount(
      concat(col("text"), lit(" FOX")), pieces)).collect()
    assert(up.forall(_.getInt(0) == 3))
  }

  test("bpeMergeCount: rank-ordered apply, differs from MaxMatch, overlaps, nulls") {
    // merges ranked (b,c) BEFORE (a,b): the rank-1 merge consumes the
    // b of "abc" first, so merge-order segments "abc" as [a, bc] — the
    // MaxMatch rule over the same pieces would take [ab, c]. Both are
    // 2 symbols here, so "abcb" pins the actual divergence: merge-order
    // a,bc,b = 3; MaxMatch ab,c,b = 3 too — use the id-level check via
    // counts on words where the COUNTS differ: "abab" with merge (a,b)
    // only → [ab, ab] = 2, while merges [(b,a),(a,b)] → a [ba] b → 3.
    val docs = Seq(
      (1L, "abc"),     // (b,c) first: a + bc = 2
      (2L, "abab"),    // (b,a) rank 1: a ba b = 3; (a,b) then matches nothing
      (3L, "aaa aaaa"),// overlap: (a,a) greedy → [aa,a]=2, [aa,aa]=2 → 4
      (4L, "x"),       // single char: 1
      (5L, ""),        // no tokens: 0
      (6L, null: String))
      .toDF("doc_id", "text")
    def counts(merges: Seq[(String, String)]): Map[Long, Any] =
      docs.select(col("doc_id"),
          TextExpressions.bpeMergeCount(col("text"), merges).as("n"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    val g1 = counts(Seq(("b", "c"), ("a", "b"), ("a", "a")))
    assert(g1(1L) == 2) // a + bc (the a,b merge finds no adjacent pair left)
    assert(g1(3L) == 4) // aa,a + aa,aa
    assert(g1(4L) == 1 && g1(5L) == 0 && g1(6L) == null)
    val g2 = counts(Seq(("b", "a"), ("a", "b")))
    assert(g2(2L) == 3) // a [ba] b — rank order matters
    val g3 = counts(Seq(("a", "b")))
    assert(g3(2L) == 2) // [ab][ab]
    // divergence from MaxMatch pinned directly: same piece inventory,
    // different inference rule
    val maxMatch = docs.where(col("doc_id") === 1L)
      .select(TextExpressions.bpeCount(col("text"),
        Seq("bc" -> 1, "ab" -> 2, "a" -> 3, "b" -> 4, "c" -> 5)))
      .collect().head.getInt(0)
    assert(maxMatch == 2) // [ab, c] — same count, different segmentation
  }

  test("bpeMergeCount splits by code point: surrogate pairs are one symbol") {
    // U+1F600 is a surrogate PAIR in UTF-16: the word must start as
    // 3 base symbols (a, emoji, b), matching learnBpeMerges'
    // split(word, "") and the oracle's '(.)' — not 4 UTF-16 units.
    // The (emoji, b) merge must then actually apply.
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, s"a${emoji}b")).toDF("doc_id", "text")
    val noMerge = docs.select(
        TextExpressions.bpeMergeCount(col("text"), Seq.empty))
      .collect().head.getInt(0)
    assert(noMerge == 3, "base symbols must be code points")
    val merged = docs.select(
        TextExpressions.bpeMergeCount(col("text"), Seq((emoji, "b"))))
      .collect().head.getInt(0)
    assert(merged == 2, "supplementary-plane merge must match")
  }

  test("bpeMergeEncode: id-level emission, UNK, collisions, count parity") {
    // vocab laid out the buildMergeVocab way: alphabet a=1,b=2,c=3,
    // then merges (b,c)→4, (a,b)→5 at alphabet + rank
    val merges = Seq(("b", "c"), ("a", "b"))
    val vocab = Seq("a" -> 1, "b" -> 2, "c" -> 3, "bc" -> 4, "ab" -> 5)
    val docs = Seq(
      (1L, "abc abc"), // rank order: a,bc per word → 1 4 1 4
      (2L, "ab"),      // (b,c) finds nothing; (a,b) merges → 5
      (3L, "xyz"),     // symbols outside the vocab → UNK 0 each
      (4L, ""),        // no tokens → empty array, not null
      (5L, null: String))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextExpressions.bpeMergeEncode(col("text"), merges, vocab).as("ids"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    assert(got(1L) == Seq(1, 4, 1, 4))
    assert(got(2L) == Seq(5))
    assert(got(3L) == Seq(0, 0, 0))
    assert(got(4L) == Seq.empty[Int])
    assert(got(5L) == null)
    // a vocab string collision keeps the smallest id (the shared
    // min(id) rule)
    val dup = docs.where(col("doc_id") === 3L)
      .select(TextExpressions.bpeMergeEncode(col("text"), Nil,
        Seq("x" -> 9, "x" -> 2, "y" -> 6)).as("ids"))
      .collect().head.getSeq[Int](0)
    assert(dup == Seq(2, 6, 0))
    // size(encode) ≡ the count kernel over the same merge table
    val parity = docs.select(
        size(TextExpressions.bpeMergeEncode(col("text"), merges, vocab))
          .as("a"),
        TextExpressions.bpeMergeCount(col("text"), merges).as("b"))
      .collect()
    assert(parity.forall(r => r.isNullAt(0) == r.isNullAt(1)
      && (r.isNullAt(0) || r.getInt(0) == r.getInt(1))))
  }

  test("bpeDecode inverts both tokenizer families up to whitespace") {
    import graft.operators.Corpus
    val docs = Seq((1L, "low lower  low\nnewest low"), (2L, "widest"),
      (3L, ""), (4L, null: String)).toDF("doc_id", "text")
    // decode∘encode == text minus whitespace, on the vocab's own corpus
    val pieces = Corpus.collectPieces(
      Corpus.buildPieceVocab(docs, "text", minCount = 2, maxSize = 10))
    val mt = Corpus.learnBpeMerges(docs, "text", numMerges = 4)
    val merges = Corpus.collectMerges(mt)
    val mv = Corpus.collectPieces(Corpus.buildMergeVocab(docs, "text", mt))
    val r = docs.select(
        regexp_replace(col("text"), "\\s+", "").as("want"),
        TextExpressions.bpeDecode(
          TextExpressions.bpeEncode(col("text"), pieces), pieces).as("mm"),
        TextExpressions.bpeDecode(
          TextExpressions.bpeMergeEncode(col("text"), merges, mv), mv)
          .as("mg"))
      .collect()
    r.foreach { x =>
      if (x.isNullAt(0)) assert(x.isNullAt(1) && x.isNullAt(2))
      else {
        assert(x.getString(1) == x.getString(0), "MaxMatch round trip")
        assert(x.getString(2) == x.getString(0), "merge round trip")
      }
    }
    // an id outside the vocabulary decodes VISIBLY, never silently
    val unk = docs.limit(1).select(TextExpressions.bpeDecode(
        array(lit(999999), lit(0)), pieces)).collect().head.getString(0)
    assert(unk == "\uFFFD\uFFFD")
  }

  test("gpt2 pretokenizer: contractions, space-prefix, class splits, " +
      "whitespace-run shedding — and every mode tiles the input") {
    def gpt2(s: String): Seq[String] =
      ByteBpeKernel.pretokenize(s, ByteBpeKernel.gpt2Pattern).toSeq
    // contractions split off; a word absorbs AT MOST one leading space
    assert(gpt2("we don't") == Seq("we", " don", "'t"))
    assert(gpt2("isn'T it's") == Seq("isn", "'", "T", " it", "'s"))
    // letter/digit/punct runs split; the space prefix binds per class
    assert(gpt2("abc123!?") == Seq("abc", "123", "!?"))
    assert(gpt2("3.14 x-y") == Seq("3", ".", "14", " x", "-", "y"))
    // a multi-space run sheds all but its LAST space into its own
    // pretoken (the \s+(?!\S) lookahead); the survivor prefixes the word
    assert(gpt2("a  big   gap") == Seq("a", " ", " big", "  ", " gap"))
    assert(gpt2("  lead") == Seq(" ", " lead"))
    // only a literal space prefixes a word — a tab stays standalone,
    // and a run ENDING in a non-space whitespace char splits once more
    // (the q168 oracle's RE2 adjustment term counts exactly these)
    assert(gpt2("tab\tword") == Seq("tab", "\t", "word"))
    assert(gpt2("x \tword") == Seq("x", " ", "\t", "word"))
    assert(gpt2("a\t b") == Seq("a", "\t", " b"))
    assert(gpt2("a\r\nb") == Seq("a", "\r", "\n", "b"))
    // Java \s includes \x0B (vertical tab); RE2's \s does not — the
    // q168 twin spells the Java class out, so pin the Java reading
    assert(gpt2("a\u000B\u000Bb") == Seq("a", "\u000B", "\u000B", "b"))
    // trailing whitespace is one pretoken; Unicode categories drive the
    // classes (CJK letters, a math-symbol arrow, a surrogate-pair emoji)
    assert(gpt2("end  ") == Seq("end", "  "))
    assert(gpt2("  néé 日本語→λ 😀 ") ==
      Seq(" ", " néé", " 日本語", "→", "λ", " 😀", " "))
    // complete tiling: concat == input for BOTH shipped modes, so the
    // byte family's exact-reconstruction contract is mode-independent
    val salted = "don't we'll 3.14words—and\tmore  ok \r\n"
    for (p <- Seq(ByteBpeKernel.whitespacePattern,
        ByteBpeKernel.gpt2Pattern))
      assert(ByteBpeKernel.pretokenize(salted, p).mkString == salted)
  }

  test("byteBpeEncode under the gpt2 pretokenizer: exact roundtrip, " +
      "merges confined to pretokens") {
    val docs = Seq(
      (1L, "we don't stop, we don't stop"),
      (2L, "  don't   stop\tnow — 123 José 😀 "),
      (3L, "don'T DON'T don't")).toDF("doc_id", "text")
    val mt = graft.operators.Corpus.learnByteBpeMerges(docs, "text",
      numMerges = 6, pretokPattern = ByteBpeKernel.gpt2Pattern)
    val merges = graft.operators.Corpus.collectMerges(mt)
    val vocab = graft.operators.Corpus.byteMergeVocab(mt)
    val back = docs.select(col("text"),
        TextExpressions.byteBpeDecode(
          TextExpressions.byteBpeEncode(col("text"), merges, vocab,
            ByteBpeKernel.gpt2Pattern), vocab).as("back"))
      .where(col("text") =!= col("back")).count()
    assert(back == 0L) // decode∘encode is the exact identity in gpt2 mode
    // a merge can never span a pretoken boundary: " don" and "'t" are
    // separate dictionary words, so no learned merge glues n to '
    assert(!merges.exists { case (l, r) =>
      l.endsWith("n") && r.startsWith("'") })
  }

  private def uniEnc(t: UnigramTable, w: String): (Seq[Int], Long) = {
    val out = new java.util.ArrayList[Integer]()
    val c = t.encodeWord(w, out)
    (Seq.tabulate(out.size)(out.get(_).intValue()), c)
  }

  test("unigram Viterbi picks the globally cheapest segmentation") {
    // chars cost 10; "ab"/"bc" cost 15; "abc" cost 40
    val t = new UnigramTable(Seq(("a", 1, 10L), ("b", 2, 10L),
      ("c", 3, 10L), ("ab", 4, 15L), ("bc", 5, 15L), ("abc", 6, 40L)),
      unkCost = 1L << 21)
    // a+b+c=30, ab+c=25, a+bc=25, abc=40 → min 25, tie between
    // [ab,c] and [a,bc]; paths \x01ab\x01c vs \x01a\x01bc differ at
    // byte 3 ('b' vs \x01) → [a,bc] is UTF-8-binary smaller
    assert(uniEnc(t, "abc") == (Seq(1, 5), 25L))
    assert(uniEnc(t, "ab") == (Seq(4), 15L)) // one piece beats two
    assert(uniEnc(t, "a") == (Seq(1), 10L))
    assert(uniEnc(t, "") == (Seq(), 0L))
  }

  test("unigram tie-break: equal cost resolves by binary path order") {
    // x+y = 20 == xy = 20; \x01x\x01y < \x01xy at byte 3 (\x01 < 'y')
    val t = new UnigramTable(
      Seq(("x", 1, 10L), ("y", 2, 10L), ("xy", 3, 20L)), unkCost = 100L)
    assert(uniEnc(t, "xy") == (Seq(1, 2), 20L))
    // but a CHEAPER two-piece split still loses to a cheaper-still pair
    val t2 = new UnigramTable(
      Seq(("x", 1, 10L), ("y", 2, 10L), ("xy", 3, 19L)), unkCost = 100L)
    assert(uniEnc(t2, "xy") == (Seq(3), 19L))
  }

  test("unigram UNK: only characters outside the alphabet emit id 0") {
    val t = new UnigramTable(Seq(("a", 1, 10L), ("b", 2, 10L)),
      unkCost = 1000L)
    assert(uniEnc(t, "axb") == (Seq(1, 0, 2), 1020L))
    // an uncovered word whose route is only UNK still encodes
    assert(uniEnc(t, "zz") == (Seq(0, 0), 2000L))
    // UNK never competes where the alphabet covers: even with a cheap
    // unkCost the edge simply does not exist for an in-alphabet char
    val cheap = new UnigramTable(Seq(("a", 1, 10L), ("b", 2, 10L)),
      unkCost = 1L)
    assert(uniEnc(cheap, "ab") == (Seq(1, 2), 20L))
  }

  test("unigram UNK advances by codepoint: a supplementary-plane char " +
      "is ONE UNK, not two surrogate halves") {
    val t = new UnigramTable(Seq(("a", 1, 10L), ("b", 2, 10L)),
      unkCost = 1000L)
    // U+1D11E (musical G clef) is two UTF-16 code units; the vocab
    // builder and the DuckDB twin both count it as one codepoint, so
    // the UNK fallback must charge unkCost ONCE and emit one id 0
    val clef = new String(Character.toChars(0x1D11E))
    assert(uniEnc(t, s"a${clef}b") == (Seq(1, 0, 2), 1020L))
    assert(uniEnc(t, clef * 2) == (Seq(0, 0), 2000L))
    // a supplementary char IN the alphabet rides the normal DP edge
    val t2 = new UnigramTable(Seq(("a", 1, 10L), (clef, 2, 10L)),
      unkCost = 1000L)
    assert(uniEnc(t2, s"a$clef") == (Seq(1, 2), 20L))
    // malformed UTF-16 (a lone surrogate half) still reaches the end:
    // one UNK per unpaired unit, never a require failure
    val loneHi = "\uD834" // high half of U+1D11E, unpaired
    assert(uniEnc(t, s"a$loneHi") == (Seq(1, 0), 1010L))
    assert(uniEnc(t, s"${loneHi}a")._1 == Seq(0, 1))
    val loneLo = "\uDD1E"
    assert(uniEnc(t, s"a${loneLo}b") == (Seq(1, 0, 2), 1020L))
  }

  test("unigram expressions: encode/count agree and handle nulls") {
    val pieces = Seq(("h", 1, 5L), ("e", 2, 5L), ("l", 3, 5L),
      ("o", 4, 5L), ("he", 5, 6L), ("llo", 6, 7L))
    val df = Seq((1L, "hello he"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextFunctions.unigramEncode(col("text"), pieces).as("ids"),
        TextFunctions.unigramCount(col("text"), pieces).as("n"))
      .orderBy("doc_id").collect()
    // "hello" → he(6)+llo(7)=13 vs h+e+llo=17 vs he+l+l+o=21 … → [5,6]
    assert(got(0).getSeq[Int](1) == Seq(5, 6, 5))
    assert(got(0).getInt(2) == 3)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(got(2).getSeq[Int](1) == Seq() && got(2).getInt(2) == 0)
  }

  test("unigram cost: the fused struct matches encode's walk exactly") {
    val pieces = Seq(("h", 1, 5L), ("e", 2, 5L), ("l", 3, 5L),
      ("o", 4, 5L), ("he", 5, 6L), ("llo", 6, 7L))
    val df = Seq((1L, "hello he"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextFunctions.unigramCost(col("text"), pieces).as("c"),
        TextFunctions.unigramCount(col("text"), pieces).as("n"))
      .orderBy("doc_id").collect()
    // "hello he" = he+llo (13) + he (6) → 3 pieces, cost 19
    val r0 = got(0).getStruct(1)
    assert(r0.getInt(0) == 3 && r0.getLong(1) == 19L)
    assert(r0.getInt(0) == got(0).getInt(2)) // fused count == count kernel
    assert(got(1).isNullAt(1)) // null text → null struct
    val r2 = got(2).getStruct(1)
    assert(r2.getInt(0) == 0 && r2.getLong(1) == 0L)
  }

  test("unigram hard-EM step: zero-usage prune, alphabet kept, recost") {
    val p1 = Seq(("a", 1, 10L), ("b", 2, 10L), ("ab", 3, 5L),
      ("ba", 4, 5L))
    // usage says: ab won every path, ba never did, 'b' appears alone too
    val p2 = graft.operators.Corpus.unigramHardEmStep(p1,
      Map(3 -> 8L, 2 -> 2L), scale = 100L)
    // 'ba' (multi-char, usage 0) pruned; chars kept even at usage 0
    assert(p2.map(_._2).toSet == Set(1, 2, 3))
    // T = 0 + 2 + 8 = 10: cost(a)=1+100*10/10=101, cost(b)=1+80=81,
    // cost(ab)=1+20=21
    assert(p2.toSet == Set(("a", 1, 101L), ("b", 2, 81L), ("ab", 3, 21L)))
    intercept[IllegalArgumentException] {
      graft.operators.Corpus.unigramHardEmStep(p1, Map.empty) }
  }

  test("unigram builder: alphabet always kept, ids by (cnt desc, piece)") {
    val docs = Seq("ab ab ab b", "ab cd").toDF("text")
    val vocab = graft.operators.Corpus.buildUnigramVocab(docs, "text",
      maxPieceLen = 2, minCount = 2, maxSize = 10)
      .orderBy("id").collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    // token occurrences: ab×4, b×1, cd×1 → substr counts:
    // a=4, b=5, ab=4, c=1, d=1, cd=1; multi with cnt>=2: ab(4)
    // selected: ab + chars a,b,c,d → order (cnt desc, piece asc):
    // b(5), a(4), ab(4), c(1), d(1)
    assert(vocab == Seq(("b", 1, 5L), ("a", 2, 4L), ("ab", 3, 4L),
      ("c", 4, 1L), ("d", 5, 1L)))
    val costed = graft.operators.Corpus.collectUnigramPieces(
      Seq(("b", 1, 5L), ("a", 2, 4L), ("ab", 3, 4L), ("c", 4, 1L),
        ("d", 5, 1L)).toDF("piece", "id", "cnt"), scale = 100L)
    // T=15: cost = 1 + ⌊100*(15-c)/15⌋
    assert(costed.toSet == Set(("b", 1, 67L), ("a", 2, 74L),
      ("ab", 3, 74L), ("c", 4, 94L), ("d", 5, 94L)))
  }

  test("jaccardMeets equals the SQL array_intersect threshold form, " +
      "empty/disjoint/null sets never reject") {
    import org.apache.spark.sql.functions.{array_intersect, size, lit, expr}
    // mixed overlaps, asymmetric sizes, empties — per-row comparison of
    // the fused kernel against the exact SQL arithmetic it replaces,
    // across a threshold grid including values that land exactly ON a
    // pair's jaccard (the >= boundary)
    val rows = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L)),
      (Seq(1L, 2L), Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(7L, 8L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(-9223372036854775808L, 0L, 9223372036854775807L),
        Seq(9223372036854775807L, -9223372036854775808L)),
      ((1L to 100L).toSeq, (51L to 160L).toSeq))
      .toDF("a", "b")
    for (t <- Seq(0.001, 0.2, 2.0 / 5.0, 0.5, 2.0 / 3.0, 1.0)) {
      val got = rows.select(
        TextExpressions.jaccardMeets(col("a"), col("b"), t).as("k"),
        (size(array_intersect(col("a"), col("b"))) >= 1 &&
          size(array_intersect(col("a"), col("b"))).cast("double") >=
            lit(t) * (size(col("a")).cast("long") +
              size(col("b")).cast("long") -
              size(array_intersect(col("a"), col("b"))).cast("long"))
              .cast("double")).as("s"))
        .collect()
      got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1),
        s"threshold $t: kernel ${r.getBoolean(0)} != sql ${r.getBoolean(1)}"))
    }
    // null on either side propagates null (a filter drops it), never true
    val nulls = rows.select(TextExpressions.jaccardMeets(
      expr("CAST(NULL AS ARRAY<BIGINT>)"), col("b"), 0.3).as("k"))
      .collect()
    nulls.foreach(r => assert(r.isNullAt(0)))
  }

  test("string jaccardMeets/jaccardValue match the SQL form; value is " +
      "null exactly when the explode form emitted no intersection row") {
    import org.apache.spark.sql.functions.{array_intersect, size, lit}
    val rows = Seq(
      (Seq("a b c", "b c d", "c d e"), Seq("c d e", "x y z")),
      (Seq("a b c"), Seq("a b c")),
      (Seq("a b c", "q r s"), Seq("x y z")),
      (Seq.empty[String], Seq("a b c")),
      (Seq.empty[String], Seq.empty[String]),
      ((1 to 40).map(i => s"sh$i"), (30 to 90).map(i => s"sh$i")))
      .toDF("a", "b")
    for (t <- Seq(0.001, 1.0 / 3.0, 0.5, 1.0)) {
      val got = rows.select(
        TextExpressions.jaccardMeets(col("a"), col("b"), t).as("k"),
        (size(array_intersect(col("a"), col("b"))) >= 1 &&
          size(array_intersect(col("a"), col("b"))).cast("double") >=
            lit(t) * (size(col("a")).cast("long") +
              size(col("b")).cast("long") -
              size(array_intersect(col("a"), col("b"))).cast("long"))
              .cast("double")).as("s"))
        .collect()
      got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1),
        s"threshold $t: kernel ${r.getBoolean(0)} != sql ${r.getBoolean(1)}"))
    }
    val vals = rows.select(
      TextExpressions.jaccardValue(col("a"), col("b")).as("v"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("i"),
      size(col("a")).cast("long").as("na"),
      size(col("b")).cast("long").as("nb")).collect()
    vals.foreach { r =>
      val i = r.getLong(1)
      if (i == 0L) assert(r.isNullAt(0), "zero overlap must be null")
      else assert(r.getDouble(0) ==
        i.toDouble / (r.getLong(2) + r.getLong(3) - i).toDouble)
    }
  }

  test("hashEmbed feeds the vector stack end to end (cast to float)") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "completely different words here"))
      .toDF("doc_id", "text")
    val emb = docs.select(col("doc_id").as("vec_id"),
      org.apache.spark.sql.functions.transform(
        TextExpressions.hashEmbed(col("text"), 16),
        x => x.cast("float")).as("embedding"))
    val nn = graft.operators.Similarity.bruteForceTopK(emb,
      emb.where(col("vec_id") === 1L), k = 1)
      .select("neighbor_id").collect().map(_.getLong(0))
    assert(nn.toSeq == Seq(2L)) // the duplicate text is the top neighbor
  }
}
