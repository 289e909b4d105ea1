package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** A shipped tokenizer — the inference-side handle the unified artifact
  * loader returns. Both shipped families expose the same surface: token
  * COUNTS (what packing/budget operators consume) and token IDS (what a
  * trainer consumes), each dispatching to its codegen'd kernel with the
  * model riding the expression as metadata.
  */
sealed trait Tokenizer {
  /** Artifact discriminator — the `tokenizer_kind` column value. */
  def kind: String
  /** Token count of a text column under this tokenizer's inference. */
  def count(text: Column): Column
  /** Token ids of a text column; `size(encode(t)) == count(t)`. */
  def encode(text: Column): Column
  /** The symbol→id vocabulary [[decode]] reverses (for the MaxMatch
    * family this is the piece vocab itself). */
  def vocabulary: Seq[(String, Int)]
  /** Ids back to text: `decode(encode(t))` == `t` minus whitespace on
    * the vocabulary's own corpus; unknown ids surface as U+FFFD. */
  def decode(ids: Column): Column =
    TextFunctions.bpeDecode(ids, vocabulary)
}

/** Frequency piece vocabulary under greedy longest-match (WordPiece /
  * MaxMatch) inference — `Corpus.buildPieceVocab` builds it.
  */
final case class MaxMatchTokenizer(pieces: Seq[(String, Int)])
    extends Tokenizer {
  val kind: String = Tokenizer.MaxMatch
  def count(text: Column): Column = TextFunctions.bpeCount(text, pieces)
  def encode(text: Column): Column = TextFunctions.bpeEncode(text, pieces)
  def vocabulary: Seq[(String, Int)] = pieces
}

/** Learned merge table under rank-ordered (Sennrich apply_bpe)
  * inference — `Corpus.learnBpeMerges` trains the table,
  * `Corpus.buildMergeVocab` lays out the symbol ids.
  */
final case class MergeTokenizer(merges: Seq[(String, String)],
    vocab: Seq[(String, Int)]) extends Tokenizer {
  val kind: String = Tokenizer.Merge
  def count(text: Column): Column = TextFunctions.bpeMergeCount(text, merges)
  def encode(text: Column): Column =
    TextFunctions.bpeMergeEncode(text, merges, vocab)
  def vocabulary: Seq[(String, Int)] = vocab
}

/** BYTE-level merge family (GPT-2-style) — `Corpus.learnByteBpeMerges`
  * trains the table, `Corpus.byteMergeVocab` lays out the fixed
  * 256-byte alphabet + merge ids. Vocabulary symbols are Latin-1
  * byte-carrier strings; they persist through the unified parquet
  * artifact like any other piece strings. Unlike the word-level
  * families, [[decode]]∘[[encode]] is the EXACT identity (whitespace
  * included) and UNK is structurally impossible.
  */
final case class ByteMergeTokenizer(merges: Seq[(String, String)],
    vocab: Seq[(String, Int)],
    pretokPattern: String =
      graft.functions.ByteBpeKernel.whitespacePattern) extends Tokenizer {
  // the pretokenizer mode is PART of the model (the same merge table
  // applied under a different pretokenizer emits different ids), so it
  // rides the artifact's kind column: the two shipped modes map to
  // distinct kinds and a custom pattern persists as a kind the loader
  // refuses loudly (a pattern string can't round-trip through the
  // unified schema — ship custom modes in code, not artifacts)
  val kind: String = pretokPattern match {
    case graft.functions.ByteBpeKernel.whitespacePattern =>
      Tokenizer.ByteMerge
    case graft.functions.ByteBpeKernel.gpt2Pattern =>
      Tokenizer.ByteMergeGpt2
    case _ => "bytemerge_custom_pretok"
  }
  def count(text: Column): Column =
    org.apache.spark.sql.functions.size(encode(text))
  def encode(text: Column): Column =
    TextFunctions.byteBpeEncode(text, merges, vocab, pretokPattern)
  def vocabulary: Seq[(String, Int)] = vocab
  override def decode(ids: Column): Column =
    TextFunctions.byteBpeDecode(ids, vocab)
}

/** Unigram-LM piece table under minimum-cost Viterbi inference
  * (Kudo ACL'18 / SentencePiece) — `Corpus.buildUnigramVocab` +
  * `Corpus.collectUnigramPieces` build it. Pieces carry integer costs
  * (the exact-arithmetic −log p surrogate); inference picks the
  * globally cheapest segmentation per whitespace token, ties broken
  * toward the UTF-8-binary-smallest piece sequence.
  */
final case class UnigramTokenizer(pieces: Seq[(String, Int, Long)],
    unkCost: Long = graft.functions.UnigramDefaults.unkCost)
    extends Tokenizer {
  val kind: String = Tokenizer.Unigram
  def count(text: Column): Column =
    TextFunctions.unigramCount(text, pieces, unkCost)
  def encode(text: Column): Column =
    TextFunctions.unigramEncode(text, pieces, unkCost)
  def vocabulary: Seq[(String, Int)] = pieces.map(p => (p._1, p._2))
}

/** ONE artifact schema for every tokenizer kind, so a loader never has
  * to know which shape it is reading:
  *
  * {{{
  *   tokenizer_kind string,  -- every row; exactly one distinct value
  *   piece string, id int,   -- vocabulary rows (all kinds)
  *   merge_rank int, lhs string, rhs string, -- merge rows (merge kinds)
  *   cost bigint             -- per-piece Viterbi cost (unigram kind)
  * }}}
  *
  * A MaxMatch artifact is vocabulary rows only; a merge artifact (word-
  * or byte-level — `tokenizer_kind` distinguishes them) is its symbol
  * vocabulary PLUS the rank-ordered merge table; a unigram artifact is
  * vocabulary rows each carrying its integer piece cost. [[load]] reads
  * the kind column and returns the matching [[Tokenizer]] — the single
  * entry point the ship-a-tokenizer contract goes through. Artifacts
  * are model metadata (vocab + k merges), so the collects here are
  * bounded exactly like `Corpus.collectPieces`.
  */
object Tokenizer {
  val MaxMatch = "maxmatch"
  val Merge = "merge"
  val ByteMerge = "bytemerge"
  val ByteMergeGpt2 = "bytemerge_gpt2"
  val Unigram = "unigram"

  /** The unified-artifact frame for a tokenizer (one small DataFrame —
    * write it wherever model files live). Refuses a tokenizer whose
    * kind the loader cannot dispatch (a ByteMergeTokenizer with a
    * custom pretokenizer pattern — the pattern string has no column in
    * the unified schema): failing HERE, at the write end, beats
    * shipping an artifact that every future load rejects.
    */
  def toArtifact(spark: SparkSession, tok: Tokenizer): DataFrame = {
    import spark.implicits._
    require(Set(MaxMatch, Merge, ByteMerge, ByteMergeGpt2, Unigram)
        .contains(tok.kind),
      s"tokenizer kind '${tok.kind}' is not artifact-shippable — the " +
        "unified schema carries no pretokenizer pattern column; ship " +
        "custom pretokenizer modes in code, not artifacts")
    tok match {
      // same rule as the pretokenizer: the schema carries no unkCost
      // column, so a non-default value would silently revert at load
      case UnigramTokenizer(_, u) =>
        require(u == graft.functions.UnigramDefaults.unkCost,
          "a unigram tokenizer with a non-default unkCost is not " +
            "artifact-shippable — the unified schema carries no unkCost " +
            "column; ship custom UNK costs in code, not artifacts")
      case _ => ()
    }
    def vocabRows(vocab: Seq[(String, Int)]): DataFrame =
      vocab.toDF("piece", "id").select(
        lit(tok.kind).as("tokenizer_kind"), col("piece"),
        col("id").cast("int"),
        lit(null).cast("int").as("merge_rank"),
        lit(null).cast("string").as("lhs"),
        lit(null).cast("string").as("rhs"),
        lit(null).cast("long").as("cost"))
    def withMergeRows(merges: Seq[(String, String)],
        vocab: Seq[(String, Int)]): DataFrame = {
      val mergeRows = merges.zipWithIndex
        .map { case ((l, r), i) => (i + 1, l, r) }
        .toDF("merge_rank", "lhs", "rhs")
        .select(lit(tok.kind).as("tokenizer_kind"),
          lit(null).cast("string").as("piece"),
          lit(null).cast("int").as("id"),
          col("merge_rank").cast("int"), col("lhs"), col("rhs"),
          lit(null).cast("long").as("cost"))
      vocabRows(vocab).unionByName(mergeRows)
    }
    tok match {
      case MaxMatchTokenizer(pieces) => vocabRows(pieces)
      case MergeTokenizer(merges, vocab) => withMergeRows(merges, vocab)
      case ByteMergeTokenizer(merges, vocab, _) =>
        withMergeRows(merges, vocab) // pretok mode rides tok.kind
      case UnigramTokenizer(pieces, _) =>
        pieces.toDF("piece", "id", "cost").select(
          lit(tok.kind).as("tokenizer_kind"), col("piece"),
          col("id").cast("int"),
          lit(null).cast("int").as("merge_rank"),
          lit(null).cast("string").as("lhs"),
          lit(null).cast("string").as("rhs"),
          col("cost").cast("long"))
    }
  }

  /** Persist `tok` at `path` (parquet, overwrite) in the unified
    * schema. */
  def save(spark: SparkSession, tok: Tokenizer, path: String): Unit =
    toArtifact(spark, tok).write.mode("overwrite").parquet(path)

  /** Load whatever tokenizer kind lives at `path`. Parquet read order
    * is arbitrary, so vocab rows re-sort by id and merge rows by rank —
    * the same load-bearing reorder as `Corpus.collectMerges`.
    */
  def load(spark: SparkSession, path: String): Tokenizer =
    fromArtifact(spark.read.parquet(path))

  /** [[load]] without the IO — accepts any frame in the unified
    * schema. */
  def fromArtifact(artifact: DataFrame, maxRows: Int = 1 << 20): Tokenizer = {
    // artifacts written before the unigram kind existed carry no cost
    // column; they are never unigram, so a null column keeps them loading
    val withCost = if (artifact.columns.contains("cost")) artifact
      else artifact.withColumn("cost", lit(null).cast("long"))
    val rows = withCost
      .select(col("tokenizer_kind"), col("piece"), col("id").cast("int"),
        col("merge_rank").cast("int"), col("lhs"), col("rhs"),
        col("cost").cast("long"))
      .limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"tokenizer artifact exceeds $maxRows rows — not a model file")
    val kinds = rows.map(_.getString(0)).distinct
    require(kinds.length == 1,
      s"tokenizer artifact must carry exactly one kind, got " +
        kinds.mkString("[", ", ", "]"))
    val vocabRows = rows.filter(!_.isNullAt(1))
    vocabRows.foreach(r => require(!r.isNullAt(2),
      s"tokenizer artifact: vocabulary row '${r.getString(1)}' has a " +
        "null id"))
    val vocab = vocabRows
      .map(r => (r.getString(1), r.getInt(2))).sortBy(_._2).toSeq
    kinds.head match {
      case MaxMatch =>
        require(rows.length == vocab.length,
          "a maxmatch artifact carries vocabulary rows only")
        MaxMatchTokenizer(vocab)
      case Unigram =>
        require(rows.length == vocabRows.length,
          "a unigram artifact carries vocabulary rows only")
        // the Viterbi table is meaningless without costs — a null cost
        // is a corrupted artifact, not a default
        val costed = vocabRows.map { r =>
          require(!r.isNullAt(6),
            s"unigram artifact: piece '${r.getString(1)}' has a null cost")
          (r.getString(1), r.getInt(2), r.getLong(6))
        }.sortBy(_._2).toSeq
        // ids key the hard-EM usage merge and id 0 is the reserved UNK:
        // a duplicate id would silently merge two pieces' counts, an
        // id <= 0 would collide with (or shadow) UNK — both are
        // corrupted artifacts, refused like the merge family's rank 1..k
        val ids = costed.map(_._2)
        require(ids.distinct.length == ids.length,
          s"unigram artifact: duplicate piece ids " +
            ids.diff(ids.distinct).distinct.mkString("[", ",", "]") +
            " — id-keyed EM usage would merge their counts")
        require(ids.forall(_ > 0),
          s"unigram artifact: non-positive piece id " +
            s"${ids.filter(_ <= 0).head} — id 0 is the reserved UNK")
        UnigramTokenizer(costed)
      case Merge | ByteMerge | ByteMergeGpt2 =>
        val mergeRows = rows.filter(r => r.isNullAt(1) && !r.isNullAt(3))
        // a malformed artifact must fail as loudly as the kind/row-count
        // checks, not load silently: every row is vocab or merge, merge
        // rows carry non-null lhs/rhs, and ranks are exactly 1..k (a
        // duplicate or gapped rank would silently reorder the
        // rank-ordered apply walk)
        require(rows.length == vocab.length + mergeRows.length,
          "merge artifact carries rows that are neither vocabulary " +
            "(piece, id) nor merge (merge_rank, lhs, rhs)")
        mergeRows.foreach(r => require(!r.isNullAt(4) && !r.isNullAt(5),
          s"merge artifact: rank ${r.getInt(3)} has a null lhs/rhs"))
        val ranks = mergeRows.map(_.getInt(3)).sorted
        require(ranks.sameElements(1 to mergeRows.length),
          s"merge artifact: merge_rank values must be exactly " +
            s"1..${mergeRows.length}, got ${ranks.mkString("[", ",", "]")}")
        val merges = mergeRows
          .map(r => (r.getInt(3), r.getString(4), r.getString(5)))
          .sortBy(_._1).map(m => (m._2, m._3)).toSeq
        if (kinds.head == Merge) MergeTokenizer(merges, vocab)
        else {
          // the byte family's base alphabet is CLOSED by construction —
          // an artifact missing byte symbols would resurrect UNK, the
          // one failure mode the family exists to exclude. Checking ids
          // alone is not enough: a corrupted row can cover id b+1 with
          // the WRONG piece, so assert the byte→symbol MAPPING itself
          // (byte b as a Latin-1 one-char piece at id b+1, the
          // byteMergeVocab layout)
          val pairs = vocab.toSet
          require((0 until 256).forall(b =>
              pairs.contains((String.valueOf(b.toChar), b + 1))),
            "bytemerge artifact: vocabulary must map each byte b " +
              "(as a Latin-1 one-char piece) to id b+1 for all 256 bytes")
          ByteMergeTokenizer(merges, vocab,
            pretokPattern = if (kinds.head == ByteMergeGpt2)
              graft.functions.ByteBpeKernel.gpt2Pattern
            else graft.functions.ByteBpeKernel.whitespacePattern)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown tokenizer_kind $other")
    }
  }
}
