package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines
  * (no reference counterpart — driver-mandated extensions, SURVEY.md §7.9).
  *
  * Everything here is built from codegen'd Spark built-ins (split /
  * regexp / aggregate / filter) — no UDFs — so the whole text pipeline
  * stays inside WholeStageCodegen and scales linearly with input bytes.
  *
  * Portability contract: each function has an exact ANSI-SQL twin runnable
  * by DuckDB (used as the correctness oracle), so semantics are pinned by
  * construction, not by convention.
  */
object TextFunctions {

  /** Whitespace tokenization. Empty string → empty array (split of "" gives
    * [""], filtered out). Codegen'd kernel ([[TokensExpr]]) — the
    * filter-HOF form is interpreted per element.
    */
  def tokens(text: Column): Column = TextExpressions.tokens(text)

  /** Portable 32-bit token hash shared with the DuckDB oracle:
    * first 8 hex digits of md5, parsed as an unsigned int.
    * Spark: conv(substr(md5(x),1,8),16,10)::long
    * DuckDB: ('0x'||substr(md5(x),1,8))::bigint
    */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Word n-gram shingles (default 3) as space-joined strings; documents
    * shorter than n yield a single whole-document shingle so they still
    * participate in dedup.
    */
  def shingles(text: Column, n: Int = 3): Column =
    TextExpressions.shingles(text, n)

  /** Greedy longest-match subword encoding (`array<int>` of piece ids in
    * token order — [[TextExpressions.bpeEncode]]): apply a
    * `Corpus.buildPieceVocab` piece vocabulary with the WordPiece
    * MaxMatch rule; unmatched characters emit UNK (0). `size(bpeEncode(
    * …))` is the REAL token count the packing/budget operators
    * (`packSequences`, `selectToTokenBudget`, `allocateEpochs`) accept
    * through their token-count column parameter.
    */
  def bpeEncode(text: Column, pieces: Seq[(String, Int)]): Column =
    TextExpressions.bpeEncode(text, pieces)

  /** `size(bpeEncode(…))` without materializing the id array — the same
    * greedy MaxMatch walk counting emissions ([[graft.functions
    * .BpeCountExpr]]). This is the form the packing/budget operators
    * consume; the `size(bpeEncode(…))` spelling is rewritten to this
    * node by [[graft.BpeCountRewrite]] when the extensions are installed.
    */
  def bpeCount(text: Column, pieces: Seq[(String, Int)]): Column =
    TextExpressions.bpeCount(text, pieces)

  /** TRUE rank-ordered BPE inference over a LEARNED merge table
    * ([[graft.functions.BpeMergeCountExpr]]): per whitespace token,
    * chars → one greedy pass per merge in rank order → symbol count.
    * The apply-side companion of `Corpus.learnBpeMerges`; differs from
    * [[bpeCount]]'s MaxMatch rule when a lower-rank merge consumes a
    * character a longer piece would have taken.
    */
  def bpeMergeCount(text: Column, merges: Seq[(String, String)]): Column =
    TextExpressions.bpeMergeCount(text, merges)

  /** Token IDS under the same rank-ordered inference as
    * [[bpeMergeCount]] ([[graft.functions.BpeMergeEncodeExpr]]): final
    * symbols map through the merge tokenizer's vocabulary
    * (`Corpus.collectMergeVocab` — corpus alphabet then merged symbols
    * in rank order; unseen symbols emit UNK 0). The id stream the
    * trainer-facing pack export ships when the LEARNED tokenizer wins
    * model selection; `size(...)` of it equals [[bpeMergeCount]].
    */
  def bpeMergeEncode(text: Column, merges: Seq[(String, String)],
      vocab: Seq[(String, Int)]): Column =
    TextExpressions.bpeMergeEncode(text, merges, vocab)

  /** Token ids back to text ([[graft.functions.BpeDecodeExpr]]):
    * pieces concatenate in stream order through the vocabulary's
    * id→piece reverse table; unknown/null ids emit U+FFFD. Over either
    * tokenizer family's vocabulary, `decode(encode(text))` equals
    * `text` minus its whitespace on the vocabulary's own corpus — the
    * pack-integrity audit's contract.
    */
  def bpeDecode(ids: Column, vocab: Seq[(String, Int)]): Column =
    TextExpressions.bpeDecode(ids, vocab)

  /** BYTE-level BPE encoding ([[graft.functions.ByteBpeEncodeExpr]]):
    * pretokens (whitespace-preserving by default; pass
    * `ByteBpeKernel.gpt2Pattern` for GPT-2's published pretokenization
    * — contractions, single-space word prefixes, letter/digit/punct
    * class runs) → UTF-8 bytes as Latin-1 symbols → the rank-ordered
    * merge walk → ids through `Corpus.byteMergeVocab` (bytes 1..256,
    * merges at 256+rank). The GPT-2-style family: UNK structurally
    * impossible, and [[byteBpeDecode]] inverts it EXACTLY — whitespace
    * included — on any input, not just the vocabulary's own corpus
    * (every shipped pretokenizer tiles the input completely, so the
    * identity is mode-independent).
    */
  def byteBpeEncode(text: Column, merges: Seq[(String, String)],
      vocab: Seq[(String, Int)],
      pretokPattern: String = ByteBpeKernel.whitespacePattern): Column =
    TextExpressions.byteBpeEncode(text, merges, vocab, pretokPattern)

  /** Exact inverse of [[byteBpeEncode]]
    * ([[graft.functions.ByteBpeDecodeExpr]]): ids → byte symbols →
    * UTF-8 text. Unknown/null ids decode to U+FFFD.
    */
  def byteBpeDecode(ids: Column, vocab: Seq[(String, Int)]): Column =
    TextExpressions.byteBpeDecode(ids, vocab)

  /** Sum of the UTF-8 BYTE lengths of an already-tokenized text (an
    * in-row `aggregate` fold, `octet_length` per token — no explode) —
    * the denominator of bytes-per-token tokenizer compression, fed by
    * [[tokens]]. Deliberately bytes, not characters: DuckDB's `strlen`
    * twin is byte-based too, and TextKernelsSpec pins the multi-byte
    * behavior (the shipped test corpus is pure ASCII, where the two
    * are indistinguishable — the spec is what holds this to bytes).
    */
  def tokenByteSum(toks: Column): Column =
    org.apache.spark.sql.functions.aggregate(toks,
      org.apache.spark.sql.functions.lit(0L),
      (a, x) => a + org.apache.spark.sql.functions.octet_length(x)
        .cast("long"))

  /** UNK emissions of the [[bpeCount]] MaxMatch walk
    * ([[graft.functions.BpeUnkCountExpr]]): positions where no piece —
    * not even the single character — matches. Zero on the vocabulary's
    * own build corpus; on held-out or cross-lingual text this is the
    * character-level OOV count, the vocabulary-coverage audit.
    */
  def bpeUnkCount(text: Column, pieces: Seq[(String, Int)]): Column =
    TextExpressions.bpeUnkCount(text, pieces)

  /** [[bpeCount]] and [[bpeUnkCount]] from ONE fused walk
    * (`struct<n_pieces:int, n_unk:int>` —
    * [[graft.functions.BpeCountUnkExpr]]): for consumers that need both
    * per row, halving the tokenize + trie passes.
    */
  def bpeCountUnk(text: Column, pieces: Seq[(String, Int)]): Column =
    TextExpressions.bpeCountUnk(text, pieces)

  /** Minimum-cost (Viterbi) subword ids under a unigram-LM piece table
    * ([[graft.functions.UnigramEncodeExpr]] — Kudo ACL'18 /
    * SentencePiece inference): per whitespace token, the globally
    * cheapest segmentation under additive integer piece costs, ties
    * broken toward the UTF-8-binary-smallest piece sequence (the
    * `ORDER BY cost, path` a SQL twin applies). Pieces come from
    * `Corpus.buildUnigramVocab` via `Corpus.collectUnigramPieces`.
    * A character outside the table's alphabet emits UNK (0) at
    * `unkCost`.
    */
  def unigramEncode(text: Column, pieces: Seq[(String, Int, Long)],
      unkCost: Long = UnigramDefaults.unkCost): Column =
    TextExpressions.unigramEncode(text, pieces, unkCost)

  /** `size(unigramEncode(…))` without materializing the ids
    * ([[graft.functions.UnigramCountExpr]]) — same tie-broken Viterbi
    * (equal-cost segmentations may differ in length, so the count
    * cannot shortcut the tie-break).
    */
  def unigramCount(text: Column, pieces: Seq[(String, Int, Long)],
      unkCost: Long = UnigramDefaults.unkCost): Column =
    TextExpressions.unigramCount(text, pieces, unkCost)

  /** `struct<n_pieces:int, cost:bigint>` — the Viterbi minimum total
    * cost fused with the piece count
    * ([[graft.functions.UnigramCostExpr]]): the document's exact
    * integer surprise under the unigram LM, the CCNet-style quality
    * signal. cost/n_pieces is the mean-surprise rank key; keep it
    * cross-multiplied downstream.
    */
  def unigramCost(text: Column, pieces: Seq[(String, Int, Long)],
      unkCost: Long = UnigramDefaults.unkCost): Column =
    TextExpressions.unigramCost(text, pieces, unkCost)

  /** `array<struct<id:int, e:bigint>>` — expected piece counts under
    * the lattice forward-backward marginals
    * ([[graft.functions.UnigramSoftCountsExpr]]): SentencePiece's soft
    * E-step, exact-integer via the Z-homogenized weights, quantized
    * once per row onto the `expScale` grid. `pieces` carries
    * probability NUMERATORS (usage counts, or `scale + 1 − cost` to
    * read the costScale grid back as probabilities), not costs.
    */
  def unigramSoftCounts(text: Column, pieces: Seq[(String, Int, Long)],
      expScale: Long = UnigramDefaults.costScale): Column =
    TextExpressions.unigramSoftCounts(text, pieces, expScale)

  /** Feature-hashing text embedding (`array<long>` signed token-count
    * histogram — [[TextKernels.hashEmbedOf]]): the model-free featurizer
    * that closes the text → vector → near-dup/ANN pipeline. Integer-exact
    * and engine-portable; normalize downstream for cosine geometry.
    */
  def hashEmbed(text: Column, dim: Int = 64): Column =
    TextExpressions.hashEmbed(text, dim)

  /** Language-ID by marker-word voting: count hits against small per-language
    * marker sets; highest count wins, ties broken by language code. A
    * real pipeline would swap in fastText scores — the n-gram-heuristic
    * shape (per-language evidence columns → argmax) is what scales.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "fast", "slow", "big", "small"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "ne"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo"),
  )

  def langHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*)))

  /** Quality signals (length / punctuation / stopword ratios) — the
    * standard C4/Gopher-style heuristics, all single-pass expressions.
    */
  def nTokens(text: Column): Column = size(tokens(text))

  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double")
        / size(t))
  }

  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
          .cast("double") / length(text))

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, x => x.isin(stopwords.map(lit): _*))).cast("double")
        / size(t))
  }

  /** Gopher-style repetition signal: fraction of tokens that are repeats
    * of an earlier token (1 − distinct/total). 0 for empty docs.
    */
  def dupTokenRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(t)).cast("double") / size(t))
  }

  /** Gopher-style top-bigram fraction: share of all bigram occurrences
    * taken by the single most frequent bigram. 0 when < 2 tokens.
    * Computed with aggregate over the shingle array — per-row, no shuffle.
    */
  def dupBigramRatio(text: Column): Column = {
    val grams = shingles(text, 2)
    val counts = aggregate(
      array_distinct(grams), lit(0),
      (mx, g) => greatest(mx, size(filter(grams, x => x === g))))
    when(size(tokens(text)) < 2, lit(0.0))
      .otherwise(counts.cast("double") / size(grams))
  }

  /** Gopher repetition statistics, one fused pass per row: `[n_lines,
    * dup_lines, line_chars, dup_line_chars, top2_cnt, top2_chars]` —
    * see [[TextKernels.repetitionStatsOf]] for the exact counting
    * rules. The Gopher filters threshold the corresponding FRACTIONS;
    * keep those as cross-multiplied integer comparisons so the gate is
    * hash-exact.
    */
  def repetitionStats(text: Column): Column =
    TextExpressions.repetitionStats(text)

  /** Unicode NFC canonicalization (codegen'd kernel; the same form
    * DuckDB's `nfc_normalize` produces) — run before hashing/dedup so
    * decomposed accents and compatibility sequences hash identically.
    */
  def nfcNormalize(text: Column): Column = TextExpressions.nfcNormalize(text)

  /** BPE-ish sub-token count: runs of letters, runs of digits, or single
    * other non-space characters (the usual pre-tokenizer regex shape).
    */
  def subTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Winnowing-style document fingerprint: the k minimum shingle hashes,
    * order-independent (so it needs no ordered aggregate — safe to compute
    * distributed). Returns array<long> of size ≤ k.
    */
  def fingerprint(text: Column, shingleN: Int = 3, k: Int = 4): Column =
    slice(array_sort(transform(array_distinct(shingles(text, shingleN)),
      s => portableHash(s))), 1, k)

  /** Content hash for exact dedup: md5 of whitespace-normalized, lowercased
    * text.
    */
  def contentHash(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** PII scrubbing patterns, deliberately inside the regex subset Java
    * (Spark) and RE2 (DuckDB) interpret identically, so the oracle can
    * apply the very same expressions.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Replace emails / phone patterns with placeholder tokens — the
    * standard pre-training privacy pass; a pure narrow map. This is the
    * minimal scalar form (kept stable as the q72 surface); the full
    * category-counting sequential pass is
    * [[graft.operators.Scrub.redactPii]].
    */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
}
