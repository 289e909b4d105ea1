package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-construction operators for large-scale training-data pipelines
  * (driver-mandated extension — SURVEY.md §7.9): dataset mixing via
  * per-stratum deterministic sampling, int8 embedding quantization, and
  * token-budget sequence packing. All three are pure narrow/window
  * DataFrame ops — no driver state, no collect — and every arithmetic
  * step is either integer-exact or one IEEE op, so each has an exact
  * DuckDB oracle twin.
  */
object Corpus {

  /** Per-stratum deterministic sampling: keep a row when the portable hash
    * of its id, SALTED BY STRATUM, lands under the stratum's per-cent
    * rate. This is how training mixtures are built at corpus scale —
    * up/down-weighting sources or languages with a pure filter (no
    * shuffle, no RNG state, reproducible across runs and executors).
    *
    * `rates` maps stratum value → percentage in [0,100]; strata not listed
    * fall back to `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Int], defaultRate: Int = 0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val bucket = pmod(TextFunctions.portableHash(
      concat(col(stratumCol), lit("|"), col(idCol).cast("string"))), lit(100))
    df.where(bucket < rate)
  }

  /** Sliding-window document chunking: split each document into
    * `maxTokens`-token chunks advancing by `maxTokens − overlap`, the
    * standard long-document preprocessing step before sequence packing
    * (overlap preserves context across chunk boundaries). One chunk for
    * docs at or under the budget; the final chunk may run short; empty
    * docs produce no chunks. Pure narrow transform + posexplode — no
    * shuffle at any corpus size — and all chunk arithmetic is integer, so
    * the DuckDB twin reproduces it exactly.
    *
    * Returns (idCol, chunk_id, n_tokens, textCol) with the chunk text
    * rebuilt space-joined.
    */
  def chunkDocuments(docs: DataFrame, maxTokens: Int, overlap: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxTokens >= 1, "chunkDocuments needs a positive token budget")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens) or chunks never advance")
    val step = maxTokens - overlap
    // nChunks − 1 = ceil(max(nTok − maxTokens, 0) / step) — integer `div`,
    // not a double divide, matching the DuckDB twin's `//` exactly (the
    // same exactness convention packSequences follows)
    val lastIdx = expr(
      s"CAST((greatest(size(__toks) - $maxTokens, 0) + ${step - 1}) " +
        s"DIV $step AS INT)")
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lastIdx),
          i => slice(col("__toks"), i * step + 1, lit(maxTokens))))
          .as(Seq("chunk_id", "__chunk")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        array_join(col("__chunk"), " ").as(textCol))
  }

  /** Cluster-downweighted ("soft dedup") sampling: instead of hard-keeping
    * one document per near-duplicate cluster, keep the cluster's
    * minimum-id representative ALWAYS and each remaining member with
    * probability (targetPerCluster−1)/cluster_size via the deterministic
    * portable hash — so a 10,000-copy boilerplate cluster thins to
    * ~targetPerCluster docs while unique documents always survive, and
    * popular content retains slightly more mass than hard dedup would
    * give it (the standard soft-dedup trade for training mixtures).
    *
    * `clusters` is a (idCol, root) frame as produced by
    * [[Dedup.nearDupClusters]]. Deterministic: no RNG, reproducible
    * across runs, engines, and partitionings — the DuckDB twin applies
    * the same integer hash rule.
    *
    * Scale shape: one shuffle on root for the cluster sizes (map-side
    * combined; the join back reuses that partitioning), one semi-join on
    * the id — linear at any corpus size, no driver state.
    */
  def clusterWeightedSample(docs: DataFrame, clusters: DataFrame,
      targetPerCluster: Int, idCol: String = "doc_id"): DataFrame = {
    require(targetPerCluster >= 1,
      "clusterWeightedSample needs targetPerCluster >= 1")
    val sizes = clusters.groupBy("root").agg(count(lit(1)).as("__csz"))
    val extraOk = pmod(TextFunctions.portableHash(
        concat(col("root").cast("string"), lit("|"), col(idCol).cast("string"))),
      col("__csz")) < targetPerCluster - 1
    val keep = clusters.join(sizes, Seq("root"))
      .where(col(idCol) === col("root") || extraOk)
      .select(idCol)
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Leakage-safe train/eval split: the split decision hashes the
    * near-dup CLUSTER root, not the document id, so an entire cluster
    * lands on one side and no near-duplicate pair ever straddles the
    * boundary — the contamination mode a per-document split invites
    * (eval docs whose near-twins sit in train). `clusters` is the
    * (idCol, root) frame from [[Dedup.nearDupClusters]]; documents absent
    * from it are treated as their own singleton cluster. Deterministic
    * portable-hash rule, `evalPct` percent of CLUSTERS to eval.
    */
  def clusterSplit(docs: DataFrame, clusters: DataFrame, evalPct: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(evalPct >= 0 && evalPct <= 100, "evalPct is a percentage")
    val withRoot = docs
      .join(clusters.select(col(idCol), col("root")), Seq(idCol), "left")
      .withColumn("root", coalesce(col("root"), col(idCol)))
    withRoot.withColumn("split",
      when(pmod(TextFunctions.portableHash(
          concat(lit("split|"), col("root").cast("string"))), lit(100))
        < evalPct, lit("eval")).otherwise(lit("train")))
  }

  /** Split-leakage audit for [[clusterSplit]] (or any (id, split)
    * assignment): the number of near-dup pairs whose endpoints sit on
    * DIFFERENT sides of the split. Structurally zero for any assignment
    * constant per connected component of the pair graph — so a nonzero
    * count proves the assignment was NOT cluster-granular over (a
    * superset of) these pairs, which is exactly the contamination a
    * per-document hash split invites (eval docs whose near-twins remain
    * in train). One row out; cost is two pair-sized equi-joins against
    * the (id → split) labels — candidate-scale, never corpus-scale.
    */
  def splitLeakCount(assignment: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val lbl = assignment.select(col(idCol), col("split"))
    pairs
      .join(lbl.select(col(idCol).as("id_a"), col("split").as("sa")), "id_a")
      .join(lbl.select(col(idCol).as("id_b"), col("split").as("sb")), "id_b")
      .agg(count(when(col("sa") =!= col("sb"), 1)).as("cross_pairs"))
  }

  /** Symmetric int8 quantization of an embedding column: per-vector scale
    * = max |x| (the standard absmax scheme), each component mapped to
    * round(x·127/scale) via floor(y + 0.5) — floor keeps the rounding
    * IEEE-identical across engines, where a half-even `round` would not
    * be. Returns the input plus `qvec array<int>` and `qscale double`;
    * dequantize is `qvec[i] · qscale / 127`.
    *
    * At 100 TB this is the storage/bandwidth lever: 4× smaller vectors,
    * narrow map, and the quantized ints are exact join/aggregate keys.
    */
  def quantizeInt8(embeddings: DataFrame, vecCol: String = "embedding")
      : DataFrame = {
    val x = col(vecCol)
    val scale = greatest(
      array_max(transform(x, v => abs(v.cast("double")))), lit(1e-12))
    embeddings
      .withColumn("qscale", scale)
      .withColumn("qvec", transform(x, v =>
        floor(v.cast("double") * 127.0 / col("qscale") + 0.5).cast("int")))
  }

  /** Deterministic exact-k per-group sample (the distributed reservoir):
    * within each group, rows are ranked by the portable hash of their
    * group-salted id (a fixed random-but-reproducible order) and the first
    * `k` kept. Because the rank order is a HASH order, the result is a
    * uniform-without-replacement sample that every run, engine, and
    * executor layout agrees on (a true reservoir's output depends on
    * partition visit order; this one's never does).
    *
    * Ranking is the bounded [[graft.functions.TopKAggregate]] heap, NOT a
    * `row_number` window: the window form shuffles every row of a group
    * to ONE task and sorts it there — a group at corpus scale is
    * data-sized, so that task is a scale wall. Here each input partition
    * partially aggregates to ≤ k ids per group before the shuffle
    * (hash ASC ≡ negated-hash score DESC, ties by id ASC — the identical
    * selection), and the kept rows are recovered with an equi-join on
    * (group, id). The join's build side is #groups × k rows — sample
    * metadata, not data — so AQE plans it as a broadcast join at any
    * realistic k.
    *
    * Requires `idCol` unique and NON-NULL within its group (it is the
    * sample's identity; a null id has none and is excluded). A null
    * GROUP is a group like any other — its hash input is null-coalesced
    * and the recover join is null-safe on the group column, so the null
    * partition samples exactly as the `row_number` window form did.
    */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    val negHash = negate(TextFunctions.portableHash(
      concat(coalesce(col(groupCol).cast("string"), lit(" ")),
        lit("|"), col(idCol).cast("string")))
      .cast("double"))
    val keep = df
      .select(col(groupCol), col(idCol), negHash.as("__neg_hash"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKAggregate.topKByScore(
        col("__neg_hash"), col(idCol), k).as("__top"))
      .select(col(groupCol).as("__keep_g"),
        explode(col("__top").getField("id")).as("__keep_id"))
    df.join(keep,
        col(groupCol) <=> col("__keep_g") && col(idCol) === col("__keep_id"))
      .drop("__keep_g", "__keep_id")
  }

  /** Temperature-reweighted mixture sampling (the multilingual-corpus
    * standard: p_d ∝ n_d^(1/T), T > 1 flattens the domain distribution so
    * low-resource domains are up-weighted relative to their share).
    * Returns the sampled rows.
    *
    * Determinism contract: domain weights are computed driver-side from
    * EXACT domain counts (an O(#domains) collect — metadata, not data)
    * with `floor(1e6·n^(1/T))` fixed-point arithmetic, and every
    * subsequent step — weight sum, per-domain keep threshold
    * `(1e6·w_d·M)/(S·n_d)` in BigInt, hash-vs-threshold row filter — is
    * integer-exact, so an ANSI-SQL twin reproduces the sample bit-for-bit
    * (for T=2 the weight is `sqrt`, correctly rounded IEEE in any engine).
    * The Scala side computes the threshold in BigInt; a twin must match
    * that width — the intermediate `1e6·w_d·M` product exceeds 64 bits
    * once the corpus passes ~1e5 rows, so e.g. DuckDB needs the product
    * computed in HUGEINT (see the q87 oracle) rather than BIGINT.
    * The row filter itself is a pure narrow predicate: no RNG state, no
    * shuffle, safe at any scale.
    *
    * @param fracPct overall sample size as a percent of the corpus;
    *   per-domain expected take is M·p_d (capped at the domain size).
    */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
      fracPct: Int, temperature: Double = 2.0): DataFrame = {
    require(fracPct >= 0 && fracPct <= 100, "fracPct must be in [0,100]")
    require(df.schema(domainCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"temperatureSample needs a string domain column, got " +
        df.schema(domainCol).dataType.simpleString)
    val counts = df.groupBy(domainCol).count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // a null domain would neither match a threshold nor hash — reject
    // loudly instead of silently excluding those rows from every sample
    require(!counts.contains(None),
      s"temperatureSample: $domainCol contains nulls — coalesce them to " +
        "a sentinel domain first")
    val named = counts.map { case (d, n) => d.get -> n }
    val invT = 1.0 / temperature
    val weights = named.map { case (d, n) =>
      // sqrt for the T=2 default: correctly-rounded IEEE everywhere, so
      // the fixed-point weight is cross-engine exact (pow is not)
      val w = if (temperature == 2.0) math.sqrt(n.toDouble)
        else math.pow(n.toDouble, invT)
      d -> math.floor(1e6 * w).toLong
    }
    val s = weights.values.map(BigInt(_)).sum
    val total = named.values.sum
    val m = BigInt(total) * fracPct / 100
    val thresholds = named.map { case (d, n) =>
      val thr = BigInt(1000000) * weights(d) * m / (s * n)
      d -> thr.min(BigInt(1000000)).toLong
    }
    // thresholds join as a broadcast dim rather than an O(#domains)-deep
    // when/otherwise chain — flat plan at any domain cardinality
    val spark = df.sparkSession
    import spark.implicits._
    val thrDf = thresholds.toSeq.toDF(domainCol, "__thr")
    val bucket = pmod(TextFunctions.portableHash(
      concat(col(domainCol), lit("|"), col(idCol).cast("string"))),
      lit(1000000L))
    df.join(broadcast(thrDf), domainCol)
      .where(bucket < col("__thr"))
      .select(df.columns.map(col): _*)
  }

  /** Vocabulary construction: distinct-token counts over the corpus,
    * frequency-filtered (`minCount`), capped at `maxSize`, each surviving
    * token assigned a dense id by (count desc, token asc) — the id order
    * every tokenizer expects. The count is one shuffle with map-side
    * partial aggregation; the rank window runs AFTER the top-`maxSize`
    * cut, so it orders at most `maxSize` rows (vocab-sized, not
    * corpus-sized) and the single-partition window is O(vocab), never a
    * corpus-wide sort.
    */
  def buildVocab(docs: DataFrame, textCol: String, minCount: Long,
      maxSize: Int): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token"))
      .limit(maxSize)
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.withColumn("token_id", row_number().over(w).cast("int"))
      .select("token_id", "token", "cnt")
  }

  /** Subword piece vocabulary for the greedy longest-match tokenizer
    * ([[graft.functions.BpeEncodeExpr]]): the [[buildVocab]] frequent
    * words keep their dense ids 1..maxSize, and the corpus's character
    * alphabet joins as fallback pieces with ids maxSize+1… (dense rank
    * by character, a FIXED offset so char ids never depend on how many
    * words survived the frequency cut). A string present as both a
    * 1-letter word and an alphabet char keeps its smaller (word) id —
    * the min(id) rule the encode trie and the SQL twin share. Because
    * the alphabet covers every character of every corpus token, encoding
    * the training corpus never emits UNK; unseen text at apply time may
    * (id 0).
    *
    * Scale shape: the char-alphabet rank window is alphabet-sized (the
    * same O(vocab) single-partition window [[buildVocab]] already pays),
    * and the distinct-token feed is the one shuffle buildVocab makes
    * anyway. BMP caveat as q134: characters are UTF-16 units on the
    * Spark side and codepoints in DuckDB — identical on BMP-only
    * corpora like this one.
    */
  def buildPieceVocab(docs: DataFrame, textCol: String, minCount: Long,
      maxSize: Int): DataFrame = {
    // ONE corpus-wide word-count aggregate feeds BOTH halves (r17
    // optimization): the frequent-word vocabulary (buildVocab's exact
    // algebra) and the character alphabet, whose source set — the
    // corpus's DISTINCT tokens — is precisely the count's keys, so the
    // old second corpus scan + explode + distinct is now a
    // dictionary-sized projection. Within the one action that collects
    // the vocab the physical planner reuses the count's exchange
    // (ReusedExchange in the plan), so the corpus is read and
    // tokenized ONCE instead of twice — at 100 TB this halves the
    // operator's corpus passes.
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val wv = Window.orderBy(col("cnt").desc, col("word"))
    val words = counts.where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("word")).limit(maxSize)
      .withColumn("id", row_number().over(wv).cast("int"))
      .select(col("word").as("piece"), col("id"))
    // the cnt >= 1 predicate is vacuously true (every counted word was
    // seen) but LOAD-BEARING: it keeps the count column alive in this
    // branch, so column pruning cannot specialize the branch's partial
    // aggregate away from the vocab branch's — the two word-count
    // exchanges then CANONICALIZE EQUAL and AQE's runtime stage cache
    // executes the map side once, both branches reading its shuffle
    // output (measured: the q137 job inventory drops from two
    // scan+tokenize map stages to one — see OPTIMIZATION_r17.md)
    val alpha = counts.where(col("cnt") >= 1)
      .select(explode(filter(split(col("word"), ""), c => c =!= "")).as("ch"))
      .distinct()
    val w = Window.orderBy(col("ch"))
    val chars = alpha
      .withColumn("id", (row_number().over(w) + maxSize).cast("int"))
      .select(col("ch").as("piece"), col("id"))
    words.unionByName(chars).groupBy("piece").agg(min("id").as("id"))
  }

  /** Symbol→id vocabulary for the LEARNED merge tokenizer
    * ([[graft.functions.BpeMergeEncodeExpr]]): the corpus's character
    * alphabet sorted ascending takes ids 1..A, then the merged symbols
    * take A + merge_rank — base vocabulary first, merges in learn
    * order, the layout a BPE tokenizer artifact ships (id 0 stays
    * UNK). A merged symbol colliding with another string keeps the
    * smaller id via the shared min(id) rule. The alphabet offset is
    * data-dependent (A = |alphabet|) but deterministic on both
    * engines: character sort is UTF-8 binary order in Spark and
    * DuckDB alike.
    *
    * Scale shape: same as [[buildPieceVocab]] — the only corpus-wide
    * work is the distinct-token feed; the rank window orders the
    * alphabet (metadata-sized), and the merge table is k rows riding a
    * broadcast of the 1-row alphabet count. Same BMP caveat as
    * buildPieceVocab on the char split.
    */
  def buildMergeVocab(docs: DataFrame, textCol: String,
      mergeTable: DataFrame): DataFrame = {
    val alpha = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .distinct()
      .select(explode(filter(split(col("tok"), ""), c => c =!= "")).as("ch"))
      .distinct()
    val w = Window.orderBy(col("ch"))
    val chars = alpha.withColumn("id", row_number().over(w).cast("int"))
      .select(col("ch").as("piece"), col("id"))
    val a = chars.agg(count(lit(1)).cast("int").as("__a"))
    val merged = mergeTable.crossJoin(broadcast(a))
      .select(col("merged").as("piece"),
        (col("merge_rank") + col("__a")).cast("int").as("id"))
    chars.unionByName(merged).groupBy("piece").agg(min("id").as("id"))
  }

  /** Driver-side materialization of a [[buildPieceVocab]] frame for the
    * encode kernel — size-guarded like the IVF codebook collects: a
    * piece vocabulary is model metadata (≤ maxSize words + an
    * alphabet), never data.
    */
  def collectPieces(pieceVocab: DataFrame, maxPieces: Int = 1 << 20)
      : Seq[(String, Int)] = {
    val rows = pieceVocab.select(col("piece"), col("id").cast("int"))
      .limit(maxPieces + 1).collect()
    require(rows.length <= maxPieces,
      s"piece vocabulary exceeds $maxPieces entries — not a vocabulary")
    rows.toSeq.map(r => (r.getString(0), r.getInt(1)))
  }

  /** Driver-side materialization of a [[learnBpeMerges]] table for the
    * apply kernels ([[graft.functions.BpeMergeCountExpr]]) — the
    * orderBy is load-bearing: merges apply IN RANK ORDER and parquet
    * read order is not rank order, so every consumer goes through this
    * one definition. Merge tables are model metadata (k rows).
    */
  def collectMerges(mergeTable: DataFrame): Seq[(String, String)] =
    mergeTable.orderBy("merge_rank").select("lhs", "rhs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** One hard-EM iteration for the unigram tokenizer (the Viterbi
    * (hard) variant of Kudo ACL'18 §3.2's EM loop, with the
    * SentencePiece-style prune folded in): given the current piece
    * table and the corpus-wide piece-usage counts under ITS OWN
    * Viterbi segmentation (the E-step — the caller computes it with
    * one `explode(unigramEncode(…))` aggregate), re-estimate every
    * kept piece's cost from its usage (M-step, the same integer
    * −log p surrogate as [[collectUnigramPieces]]) and DROP
    * multi-character pieces the segmentation never used (they carried
    * seed-count mass but won no Viterbi path; single characters stay
    * unconditionally — coverage is never pruned). Ids are stable
    * across iterations: a piece keeps its identity, only its cost
    * moves. Driver-side BigInt arithmetic on a vocab-sized table —
    * model metadata, like the collect it follows.
    */
  /** The corpus-wide SOFT (lattice) E-step: expected piece usage under
    * the forward-backward marginals ([[graft.functions.UnigramLattice]]
    * — SentencePiece's published E-step; the Viterbi usage aggregate in
    * [[learnUnigram]] is the hard variant). `piecesProb` carries
    * probability NUMERATORS (usage counts, or `scale + 1 − cost` to
    * read the costScale grid back as probabilities). Returns (id, u)
    * with u = Σ_words wc · e_word(id) on the `expScale` grid — every
    * value an exact integer (DECIMAL(38,0) aggregation), so the E-step
    * is associative, engine-portable, and oracle-twinnable. One
    * dictionary-sized explode + aggregate, never a corpus rescan.
    */
  def unigramSoftUsage(dict: DataFrame, tokCol: String, wcCol: String,
      piecesProb: Seq[(String, Int, Long)],
      expScale: Long = graft.functions.UnigramDefaults.costScale)
      : DataFrame =
    dict.select(col(wcCol).cast("decimal(38,0)").as("__wc"),
        explode(TextFunctions.unigramSoftCounts(col(tokCol), piecesProb,
          expScale)).as("__s"))
      .groupBy(col("__s.id").as("id"))
      .agg(sum(col("__s.e").cast("decimal(38,0)") * col("__wc")).as("u"))

  def unigramHardEmStep(pieces: Seq[(String, Int, Long)],
      usage: Map[Int, Long],
      scale: Long = graft.functions.UnigramDefaults.costScale)
      : Seq[(String, Int, Long)] = {
    val kept = pieces.filter { case (p, id, _) =>
      p.length == 1 || usage.getOrElse(id, 0L) > 0L }
    val t2 = kept.iterator.map(x => BigInt(usage.getOrElse(x._2, 0L))).sum
    require(t2 > 0,
      "unigramHardEmStep: zero total usage — the E-step saw no corpus")
    kept.map { case (p, id, _) =>
      val u: Long = usage.getOrElse(id, 0L)
      (p, id, 1L + (BigInt(scale) * (t2 - BigInt(u)) / t2).toLong)
    }
  }

  /** SentencePiece's unigram TRAINING LOOP (Kudo ACL'18 §3.2, the
    * hard-EM variant [[unigramHardEmStep]] is one iteration of), run to
    * a target vocabulary size as a driver arc mirroring
    * [[learnBpeMerges]]' shape: seed → repeat (E → M → prune) → final
    * piece table, artifact-ready for [[UnigramTokenizer]].
    *
    * The corpus is scanned exactly TWICE regardless of `rounds` — once
    * by the seed build, once into the word-frequency dictionary the EM
    * loop re-segments (document encoding concatenates per-token
    * segmentations, so per-word Viterbi ids weighted by word
    * multiplicity equal the corpus-wide usage EXACTLY; this is also
    * SentencePiece's own layout, which trains on the sentence/word
    * frequency table). Each round: (E) one dictionary-sized
    * `explode(unigramEncode)` aggregate under the current table; (M)
    * [[unigramHardEmStep]] — usage-based integer re-costing + the
    * zero-usage multi-piece drop, ids stable; then the SHRINK step:
    * single characters are never pruned (coverage), multi-character
    * pieces keep the top max(vocabSize − |singles|, ⌊¾·|multis|⌋) by
    * (usage desc, piece asc) — SentencePiece's default shrink factor,
    * floored at the target so the last round lands ON vocabSize when
    * reachable. Survivor costs are the M-step's (computed over the
    * pre-shrink total); the next E-step renormalizes.
    *
    * Scale shape: after the two corpus passes every round is
    * dictionary-sized work plus a vocab-sized collect — at 100 TB the
    * loop cost is the E-step's dictionary aggregate per round, never a
    * corpus rescan.
    *
    * `softEm = true` swaps the E-step for the LATTICE marginals
    * ([[unigramSoftUsage]] — SentencePiece's published forward-backward
    * E-step; on ambiguous dictionaries the two provably diverge,
    * CorpusSpec pins a hand case): expected counts over ALL
    * segmentations on the exact `expScale` integer grid, same
    * dictionary-sized aggregate per round, hard-EM kept as the fast
    * default.
    */
  def learnUnigram(docs: DataFrame, textCol: String, vocabSize: Int,
      rounds: Int, maxPieceLen: Int = 4, minCount: Long = 2,
      seedSize: Int = 4096,
      scale: Long = graft.functions.UnigramDefaults.costScale,
      probe: Option[(Int, Int) => Unit] = None,
      softEm: Boolean = false,
      expScale: Long = graft.functions.UnigramDefaults.costScale)
      : Seq[(String, Int, Long)] = {
    require(rounds >= 1, "learnUnigram needs at least one EM round")
    require(vocabSize >= 1, "learnUnigram needs a positive target size")
    val dict = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("wc"))
      .localCheckpoint()
    var pieces = collectUnigramPieces(
      buildUnigramVocab(docs, textCol, maxPieceLen, minCount, seedSize),
      scale)
    var r = 0
    while (r < rounds) {
      // E-step, either variant one dictionary-sized aggregate:
      //  - hard (default): Viterbi-path id counts — fast, codegen'd;
      //  - soft: lattice forward-backward expected counts
      //    (SentencePiece's published E-step), probabilities read back
      //    off the cost grid as numerators scale + 1 − cost; soft
      //    usages live on the wc × expScale grid, and the ratio-based
      //    M-step is grid-invariant. Single-char numerators floor at 1
      //    (coverage smoothing): a single whose usage quantized to
      //    zero must stay REACHABLE, or a word it alone covers would
      //    have probability 0 and the lattice would rightly throw.
      val usage: Map[Int, Long] =
        if (!softEm)
          dict.select(col("wc"),
              explode(TextFunctions.unigramEncode(col("tok"), pieces))
                .as("id"))
            .groupBy("id").agg(sum(col("wc")).as("u"))
            .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
        else {
          val probs = pieces.map { case (p, id, c) =>
            val n = math.max(scale + 1 - c, 0L)
            (p, id, if (p.length == 1) math.max(n, 1L) else n)
          }
          unigramSoftUsage(dict, "tok", "wc", probs, expScale)
            .collect().map { x =>
              x.getInt(0) -> x.getDecimal(1).longValueExact()
            }.toMap
        }
      val em = unigramHardEmStep(pieces, usage, scale)
      val (singles, multis) = em.partition(_._1.length == 1)
      val kMult = math.max(vocabSize - singles.size, multis.size * 3 / 4)
      val kept = multis.sortBy { case (p, id, _) =>
        (-usage.getOrElse(id, 0L), p) }.take(kMult)
      pieces = (singles ++ kept).sortBy(_._2)
      r += 1
      probe.foreach(_(r, pieces.size))
    }
    pieces
  }

  /** Corpus-drift monitor: per-token occurrence counts of two corpus
    * snapshots side by side, with the EXACT total-variation-distance
    * contribution of each token — the pipeline-health check a
    * continuously-refreshed training corpus runs between snapshots
    * (did the crawl mix shift? did a filter change eat a domain?).
    *
    * TVD(P, Q) = ½ Σ|p(t) − q(t)| is kept as an exact rational:
    * per token, `drift_num` = |n_a·T_b − n_b·T_a| as DECIMAL(38,0)
    * (cross-multiplied — no float division anywhere), and the caller
    * divides Σ drift_num by 2·T_a·T_b if it wants the scalar. Floats
    * would sum in partition order and hash-desync any twin; the
    * decimal form is associative and engine-portable.
    *
    * Scale shape: both sides explode to tokens and meet in ONE
    * combine-enabled shuffle on the token (side-tagged union, not two
    * aggregates + an outer join); the totals are a 1-row aggregate
    * broadcast back. Nothing is ever collected; the output is
    * vocabulary-sized.
    */
  def tokenDistributionDrift(a: DataFrame, b: DataFrame,
      textCol: String, ngram: Int = 1): DataFrame = {
    require(ngram >= 1, "tokenDistributionDrift needs ngram >= 1")
    // ngram > 1 drifts the SHINGLE distribution (word-order / phrase
    // shifts a unigram histogram cannot see), under the suite's fixed
    // shingle semantics: a doc shorter than n contributes its one
    // whole-doc shingle. The output column stays `token` — it names
    // the distribution's feature, whatever its arity
    def feats(c: Column): Column =
      if (ngram == 1) TextFunctions.tokens(c)
      else TextFunctions.shingles(c, ngram)
    def side(df: DataFrame, tag: Int): DataFrame = df
      .select(explode(feats(col(textCol))).as("token"))
      .withColumn("__side", lit(tag))
    // the counts frame feeds BOTH the totals row and the output — a
    // lazy plan would re-run the corpus-sized explode+shuffle once per
    // consumer, so the vocabulary-sized result checkpoints once (the
    // lineIndexAddBatch precedent; at deployment this is the natural
    // materialization point anyway)
    val counts = side(a, 0).unionByName(side(b, 1))
      .groupBy("token")
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("n_b"))
      .localCheckpoint()
    val dec = "decimal(38,0)"
    val totals = counts.agg(
      sum(col("n_a")).cast(dec).as("__ta"),
      sum(col("n_b")).cast(dec).as("__tb"))
    counts.crossJoin(broadcast(totals))
      .withColumn("drift_num", abs(
        col("n_a").cast(dec) * col("__tb") -
          col("n_b").cast(dec) * col("__ta")))
      .select("token", "n_a", "n_b", "drift_num")
  }

  /** Curation-audit attribution: given the ORDERED reject sets of a
    * multi-stage filter chain, label every document with its FIRST
    * rejecting stage (or `accepted`) — the operability report a
    * production curation pipeline ships next to its output (why did
    * 40% of the crawl disappear, and at which stage?). Priority is the
    * argument order; a doc in several reject sets gets the earliest.
    *
    * The caller computes each stage's reject set with the semantics it
    * means to audit. Population-INdependent stages (per-doc predicates,
    * fixed-reference decontamination) may be computed over the whole
    * corpus — the priority resolution here reproduces the sequential
    * outcome. Population-DEPENDENT stages (exact-dup keep-first, LSH
    * clustering) must be computed on the survivors of the earlier
    * stages, exactly as the real chain would run them — q182 shows the
    * pattern.
    *
    * Scale shape: ONE shuffle over the union of the (id-only, tagged)
    * reject sets for the min-rank aggregate, then one left join back to
    * the corpus ids. Stage names resolve from a literal array — no
    * per-stage join chain, no driver collect.
    */
  def attributeRejections(docs: DataFrame, idCol: String,
      stages: Seq[(String, DataFrame)]): DataFrame = {
    require(stages.nonEmpty, "attributeRejections needs at least one stage")
    require(stages.map(_._1).distinct.length == stages.length,
      "attributeRejections: stage names must be distinct")
    require(!stages.exists(_._1 == "accepted"),
      "attributeRejections: 'accepted' is the reserved no-rejection label")
    val tagged = stages.zipWithIndex.map { case ((_, rej), i) =>
      rej.select(col(idCol)).withColumn("__rank", lit(i))
    }.reduce(_ unionByName _)
    val first = tagged.groupBy(idCol).agg(min(col("__rank")).as("__rank"))
    val names = array(stages.map(s => lit(s._1)): _*)
    docs.select(col(idCol))
      .join(first, Seq(idCol), "left")
      // the null test must be EXPLICIT: element_at over a literal array
      // with a null ordinal does NOT return null (measured on 4.1 — the
      // folded extract yields the last element), so a coalesce-based
      // default would mislabel every accepted doc with the final stage
      .select(col(idCol),
        when(col("__rank").isNull, lit("accepted"))
          .otherwise(element_at(names, col("__rank").cast("int") + 1))
          .as("stage"))
  }

  /** Piece table for the unigram-LM (Viterbi) tokenizer
    * ([[graft.functions.UnigramEncodeExpr]] — Kudo ACL'18): candidate
    * pieces are every contiguous substring (length 1..`maxPieceLen`) of
    * every whitespace-token OCCURRENCE, counted corpus-wide; the
    * selection keeps ALL single characters (the coverage alphabet — the
    * same never-UNK-on-the-build-corpus contract as
    * [[buildPieceVocab]]) plus the top `maxSize` multi-character pieces
    * at `minCount`+ occurrences by (count desc, piece asc); ids are
    * 1..N by the same order over the selected set (0 stays UNK).
    * SentencePiece prunes this seed lattice with EM; the
    * frequency-seeded table IS its iteration-0 model, and the Viterbi
    * kernel is identical either way — swap the counts for EM'd
    * probabilities at deployment, the inference contract doesn't move.
    *
    * Returns (piece, id, cnt) — feed [[collectUnigramPieces]] for the
    * kernel's costed form.
    *
    * Scale shape: the substring explode multiplies distinct-token rows
    * by O(len × maxPieceLen) BEFORE its count shuffle — candidates are
    * counted per distinct token with the token's occurrence count, so
    * corpus size enters only through the one token-count shuffle
    * [[buildVocab]] already pays. The multi-piece cut is a distributed
    * TakeOrdered (orderBy + limit), and the id window runs on the
    * selected vocab-sized set only.
    */
  def buildUnigramVocab(docs: DataFrame, textCol: String,
      maxPieceLen: Int, minCount: Long, maxSize: Int): DataFrame = {
    require(maxPieceLen >= 1, "buildUnigramVocab needs maxPieceLen >= 1")
    val tcnt = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("wc"))
    val cand = tcnt
      .select(col("tok"), col("wc"), explode(sequence(lit(1),
        least(length(col("tok")), lit(maxPieceLen)))).as("l"))
      .select(col("wc"),
        explode(sequence(lit(1), length(col("tok")) - col("l") + 1))
          .as("i"), col("tok"), col("l"))
      .select(col("tok").substr(col("i"), col("l")).as("piece"), col("wc"))
      .groupBy("piece").agg(sum("wc").as("cnt"))
    val multi = cand.where(length(col("piece")) >= 2 &&
        col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(maxSize)
    val chars = cand.where(length(col("piece")) === 1)
    val w = Window.orderBy(col("cnt").desc, col("piece"))
    multi.unionByName(chars)
      .withColumn("id", row_number().over(w).cast("int"))
      .select("piece", "id", "cnt")
  }

  /** Driver-side costed materialization of a [[buildUnigramVocab]]
    * frame for the Viterbi kernel: cost(piece) = 1 + ⌊scale × (T −
    * cnt) / T⌋ with T = Σ cnt over the selected pieces — an exact
    * integer surrogate for −log p(piece): monotone decreasing in the
    * count, bounded in [1, scale + 1], and reproducible bit for bit in
    * any engine with integer division (the float −log would hash-desync
    * the twins). BigInt arithmetic so corpus-scale totals never
    * overflow the product. Size-guarded like [[collectPieces]].
    */
  def collectUnigramPieces(vocab: DataFrame,
      scale: Long = graft.functions.UnigramDefaults.costScale,
      maxPieces: Int = 1 << 20): Seq[(String, Int, Long)] = {
    val rows = vocab
      .select(col("piece"), col("id").cast("int"), col("cnt").cast("long"))
      .limit(maxPieces + 1).collect()
    require(rows.length <= maxPieces,
      s"unigram piece table exceeds $maxPieces entries — not a vocabulary")
    val t = rows.iterator.map(r => BigInt(r.getLong(2))).sum
    rows.toSeq.map { r =>
      val cost = 1L + (BigInt(scale) * (t - r.getLong(2)) / t).toLong
      (r.getString(0), r.getInt(1), cost)
    }
  }

  /** The merge-free byte vocabulary (ids == bytes + 1): the identity
    * byte tokenizer's model. Data-independent — callers wanting the
    * 0-merge tokenizer use this directly instead of fabricating an
    * empty merge table and paying two collect jobs for constants.
    */
  val identityByteVocab: Seq[(String, Int)] =
    (0 until 256).map(b => (String.valueOf(b.toChar), b + 1))

  /** Symbol→id vocabulary for the BYTE-level merge tokenizer
    * ([[learnByteBpeMerges]]) — [[buildMergeVocab]]'s layout with the
    * data-dependent corpus alphabet replaced by the FIXED byte
    * alphabet: all 256 byte symbols (as Latin-1 one-char strings) take
    * ids 1..256 in byte order, merged symbols take 256 + merge_rank,
    * string collisions keep the smaller id. No corpus scan at all —
    * the base vocabulary is closed by construction, which is exactly
    * why byte-level UNK is structurally impossible (id 0 stays
    * reserved but unreachable at apply time). Pure driver metadata:
    * 256 + k entries.
    */
  def byteMergeVocab(mergeTable: DataFrame): Seq[(String, Int)] = {
    val alphabet = identityByteVocab
    val merged = mergeTable.orderBy("merge_rank")
      .select(col("merged"), col("merge_rank").cast("int"))
      .collect().map(r => (r.getString(0), 256 + r.getInt(1))).toSeq
    (alphabet ++ merged).groupBy(_._1)
      .map { case (s, ids) => (s, ids.map(_._2).min) }.toSeq.sortBy(_._2)
  }

  /** Bounded-iteration BPE merge LEARNING (Sennrich et al., ACL'16,
    * `learn_bpe`): k rounds of count-pairs → pick-top → merge, run as
    * Spark aggregates over the word-frequency DICTIONARY — BPE
    * training's working set is distinct words × counts, never the
    * corpus, so after the one corpus-wide word count every iteration
    * touches only dict-sized state (and the state SHRINKS: a word
    * reduced to one symbol can never pair again and is dropped).
    *
    * Per iteration: (1) adjacent symbol pairs explode from the symbol
    * arrays (every adjacent position counts, overlapping included —
    * Sennrich's `get_stats` convention), (2) a map-side-combined
    * groupBy sums counts, (3) TakeOrdered(1) under the TOTAL order
    * (count DESC, lhs ASC, rhs ASC — deterministic across engines)
    * collects the winning pair (one 3-field row: model metadata), and
    * (4) a fold-left `aggregate` HOF applies the merge greedily
    * left-to-right non-overlapping (a merged symbol is strictly longer
    * than its left half, so it can never cascade within the pass —
    * byte-equal to string `replace` over sentinel-wrapped symbols,
    * which is what the DuckDB twin does). `localCheckpoint` after each
    * apply truncates the k-deep HOF lineage; the checkpointed frame is
    * dict-sized.
    *
    * Cost model: one corpus scan + k × (dict-sized narrow pass +
    * pair-agg shuffle + 1-row collect). k is bounded (≤ 4096) and the
    * per-iteration shuffle is O(distinct adjacent pairs) ≤ O(dict ×
    * avg word length) — at 100 TB the dict is millions of rows against
    * billions of docs, so iterations are metadata-scale next to the
    * initial count. Stops early when no pair reaches `minPairCount`.
    *
    * Returns the merge table: (merge_rank int, lhs, rhs,
    * merged = lhs||rhs, pair_count long) — apply it by feeding
    * `initial alphabet + merged pieces` to the
    * [[graft.functions.BpeEncodeExpr]] trie (WordPiece-style greedy
    * inference over a learned-BPE vocabulary).
    */
  def learnBpeMerges(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 1L,
      // per-iteration observer (iteration 1-based, dict rows AFTER the
      // merge applied): progress/telemetry for real-k runs — a 100 TB
      // learn is hours of driver loop and needs a heartbeat. The dict
      // count is an extra dict-sized job, so it runs ONLY when a probe
      // is installed; None keeps the loop's job count unchanged.
      probe: Option[(Int, Long) => Unit] = None): DataFrame = {
    val dict = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    learnMergesFromDict(dict, numMerges, minPairCount, probe)
  }

  /** BYTE-level merge learning — the GPT-2-style variant of
    * [[learnBpeMerges]]: the dictionary entries are whitespace-
    * PRESERVING pretokens (regex `\S+\s*|^\s+` — a word plus its
    * trailing whitespace run, with a leading-whitespace pretoken at
    * the front; the pretokens concatenate back to the exact text), and
    * each pretoken's base symbols are its UTF-8 BYTES, carried as
    * one-char Latin-1 strings (byte b ↔ char U+00bb — the bijection
    * `decode(encode(s, 'UTF-8'), 'ISO-8859-1')` computes in-plan, so
    * the whole symbol pipeline reuses the string machinery unchanged).
    * With a base alphabet of all 256 bytes, UNK is STRUCTURALLY
    * impossible at apply time and decode∘encode reconstructs the
    * EXACT original text — whitespace included — not the
    * stripped-text contract the char-level family gives (q152/q159).
    * Same Sennrich loop, same scale shape: iterations touch only the
    * pretoken dictionary. `pretokPattern` switches the pretokenizer
    * (default whitespace-preserving; `ByteBpeKernel.gpt2Pattern` for
    * GPT-2's published regex — q168); every shipped pattern tiles the
    * input completely, so the exact-reconstruction contract is
    * mode-independent.
    */
  def learnByteBpeMerges(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 1L,
      probe: Option[(Int, Long) => Unit] = None,
      // pretokenizer mode: the default whitespace-preserving pattern,
      // or ByteBpeKernel.gpt2Pattern for GPT-2's published
      // pretokenization. Learn-time runs the SAME pattern in-plan
      // (Spark's regexp_extract_all is Java regex, like the apply
      // kernel's Matcher) so learn and apply symbols can never drift;
      // pass the matching pattern to byteBpeEncode at apply time.
      pretokPattern: String =
        graft.functions.ByteBpeKernel.whitespacePattern): DataFrame = {
    val dict = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(pretokPattern), lit(0))).as("pretok"))
      .groupBy("pretok").agg(count(lit(1)).as("cnt"))
      .select(decode(encode(col("pretok"), "UTF-8"), "ISO-8859-1")
        .as("word"), col("cnt"))
      // two pretokens may collide post-mapping only if equal pre-mapping
      // (the byte mapping is a bijection), so no re-group is needed
    learnMergesFromDict(dict, numMerges, minPairCount, probe)
  }

  /** The k-bounded Sennrich loop shared by [[learnBpeMerges]] (char
    * symbols of whitespace words) and [[learnByteBpeMerges]] (byte
    * symbols of whitespace-preserving pretokens): `dict` is any
    * (word string, cnt long) frequency table; symbols are the word's
    * code points. All scale notes on [[learnBpeMerges]] apply — the
    * loop never touches anything but dict-sized state.
    */
  /** The exact total order of the learn loop's old DataFrame
    * `orderBy(c desc, lhs, rhs)`: count DESC, then lhs/rhs ASC compared
    * as UNSIGNED UTF-8 BYTES — Catalyst strings are UTF8String, whose
    * binary comparison differs from java.lang.String's UTF-16 order
    * once supplementary-plane symbols are in play (the emoji salts).
    * Self-contained and Serializable: takeOrdered ships it to the
    * partition-local top-1 tasks.
    */
  private final class PairTopOrdering
      extends Ordering[((String, String), Long)] with Serializable {
    private def utf8Compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
    def compare(a: ((String, String), Long),
        b: ((String, String), Long)): Int = {
      if (a._2 != b._2) return java.lang.Long.compare(b._2, a._2)
      val dl = utf8Compare(a._1._1, b._1._1)
      if (dl != 0) return dl
      utf8Compare(a._1._2, b._1._2)
    }
  }

  private def learnMergesFromDict(dict: DataFrame, numMerges: Int,
      minPairCount: Long,
      probe: Option[(Int, Long) => Unit]): DataFrame = {
    require(numMerges >= 1 && numMerges <= 4096,
      s"numMerges must be in [1, 4096], got $numMerges — the driver " +
        "loop is k-bounded by design")
    val spark = dict.sparkSession
    // The SEED stays a Catalyst projection (split-to-code-points is the
    // one corpus-derived, codegen-worthy pass, and its split("")
    // semantics — surrogate pairs are ONE symbol — must match the apply
    // kernels exactly); the ITERATIONS run on its RDD. Rationale (r17
    // optimization): each loop round is two tiny dict-sized actions, and
    // the DataFrame form re-analyzed/re-optimized a FRESH plan per round
    // (the merge constants change), costing ~35 ms of driver planning
    // per job — ~60% of a 16-round learn's wall clock, and minutes of
    // pure driver time at the k=4096 bound. The RDD loop submits the
    // same row work with microseconds of driver overhead per job. The
    // row work itself was never codegen-bound: the old apply step was a
    // fold-left `aggregate` HOF, which Catalyst interprets per row just
    // like a closure.
    var state: org.apache.spark.rdd.RDD[(Array[String], Long)] = dict
      .select(col("cnt"),
        filter(split(col("word"), ""), c => c =!= "").as("syms"))
      .where(size(col("syms")) >= 2)
      .select("syms", "cnt").rdd
      .map(r => (r.getSeq[String](0).toArray, r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    state.count() // eager, like the localCheckpoint it replaces
    val topOrd = new PairTopOrdering
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val minC = minPairCount
      val top = state.mapPartitions { it =>
          // partition-local pair pre-aggregation (the map-side combine
          // the old groupBy had)
          // values boxed explicitly: with a scala.Long value type the
          // compiler auto-unboxes m.get(k), turning the null (absent-key)
          // check into dead code that only works because unboxToLong(null)
          // happens to be 0L
          val m = new java.util.HashMap[(String, String), java.lang.Long]()
          it.foreach { case (syms, cnt) =>
            var j = 0
            while (j < syms.length - 1) {
              val k = (syms(j), syms(j + 1))
              val old = m.get(k)
              m.put(k, (if (old == null) 0L else old.longValue()) + cnt)
              j += 1
            }
          }
          import scala.jdk.CollectionConverters._
          m.entrySet().iterator().asScala
            .map(e => (e.getKey, e.getValue.longValue()))
        }
        .reduceByKey(_ + _)
        .filter(_._2 >= minC)
        .takeOrdered(1)(topOrd)
      if (top.isEmpty) exhausted = true
      else {
        val ((l, r), c) = top(0)
        merges += ((i + 1, l, r, c))
        val merged = l + r
        // greedy left-to-right non-overlapping apply — element-equal to
        // the old fold-left `aggregate` HOF (append unless the running
        // tail is lhs and the current symbol rhs, then fuse)
        val next = state.mapPartitions(_.map { case (syms, cnt) =>
            val out = new scala.collection.mutable.ArrayBuffer[String](
              syms.length)
            var j = 0
            while (j < syms.length) {
              if (out.nonEmpty && out(out.length - 1) == l && syms(j) == r)
                out(out.length - 1) = merged
              else out += syms(j)
              j += 1
            }
            (out.toArray, cnt)
          }, preservesPartitioning = true)
          .filter(_._1.length >= 2)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = next.count() // eager: next materializes before prev frees
        state.unpersist(blocking = false)
        state = next
        i += 1
        probe.foreach(_(i, n))
      }
    }
    state.unpersist(blocking = false)
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
      .select(col("merge_rank").cast("int"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"),
        col("pair_count").cast("long").as("pair_count"))
  }

  /** Token-budget sequence packing: within each shard (e.g. language),
    * docs are laid out in deterministic id order and cut into packs of at
    * most `tokenBudget` tokens by cumulative offset — pack_id =
    * (cumulative tokens BEFORE this doc) div budget. This is the
    * distributed shape of sequence packing for LLM pretraining batches (a
    * doc may straddle a boundary; the trainer's loader splits it, which
    * is not a relational concern).
    *
    * Scale shape — DISTRIBUTED PREFIX SUM, not a per-shard window: a
    * `sum().over(Window.partitionBy(shard))` puts every row of a shard in
    * ONE sort task, and a shard here is a language — most of the corpus
    * at 100 TB. Instead the corpus range-partitions on (shard, id) — the
    * same global order, but a shard spans as many partitions as its size
    * demands — then (1) one metadata-sized pass collects per-(partition,
    * shard) token subtotals, (2) the driver turns them into prefix
    * offsets (O(partitions + shards) entries, broadcast back), and (3) a
    * narrow second pass over the SAME shuffle output runs the local
    * cumulative sum seeded by its partition's offset. Both passes share
    * one RDD instance, so the range boundaries agree and the second job
    * reuses the first's shuffle files. The pack arithmetic is identical
    * to the window form: pack_id = (cum before this doc) div budget,
    * integer-exact; a null token count yields a null pack_id and does not
    * advance the offset, exactly as a window sum ignores nulls.
    *
    * Column note: the RDD boundary blocks Catalyst column pruning, so
    * EVERY input column rides the range shuffle. A materializing consumer
    * wants exactly that (text co-located with its pack); a stats-only
    * consumer should pre-project to (shard, id, token-count) before
    * packing — the registered q68/q79 twins do.
    */
  def packSequences(docs: DataFrame, shardCol: String, idCol: String,
      nTokensCol: Column, tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 1, "packSequences needs a positive token budget")
    val spark = docs.sparkSession
    val prepared = docs.withColumn("__n_tokens", nTokensCol.cast("long"))
    val sorted = prepared
      .repartitionByRange(col(shardCol), col(idCol))
      .sortWithinPartitions(col(shardCol), col(idCol))
    val schema = sorted.schema
    val shardIdx = schema.fieldIndex(shardCol)
    val ntIdx = schema.fieldIndex("__n_tokens")
    // ONE materialized RDD: both jobs below hang off the same shuffle
    // dependency, so partition boundaries cannot drift between the
    // subtotal pass and the cumsum pass
    val rdd = sorted.rdd
    val bOffsets = spark.sparkContext.broadcast(
      prefixOffsets(rdd, shardIdx,
        r => if (r.isNullAt(ntIdx)) 0L else r.getLong(ntIdx)))
    // pass 2 (narrow, shuffle-file reuse): local running sum seeded by the
    // broadcast offset; integer `div`-equivalent Long division keeps large
    // cumulative offsets exact
    val packed = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bOffsets.value
      var cur: Any = null
      var started = false
      var cum = 0L
      it.map { r =>
        val sKey = r.get(shardIdx)
        if (!started || sKey != cur) {
          cur = sKey
          started = true
          cum = off.getOrElse((pid, sKey), 0L)
        }
        val packId: Any =
          if (r.isNullAt(ntIdx)) null
          else {
            val before = cum
            cum += r.getLong(ntIdx)
            java.lang.Long.valueOf(before / tokenBudget)
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ packId)
      }
    }
    spark.createDataFrame(packed,
      schema.add(org.apache.spark.sql.types.StructField("pack_id",
        org.apache.spark.sql.types.LongType, nullable = true)))
      .withColumnRenamed("__n_tokens", "n_tokens")
  }

  /** Materialize [[packSequences]] output into actual training
    * sequences: one row per (shard, pack) with the member documents'
    * text concatenated in id order — the order the pack arithmetic
    * assumed. The aggregation state is BOUNDED BY THE TOKEN BUDGET, not
    * the corpus: a pack holds ~budget tokens of text however large the
    * corpus is, so the collect never scales past one sequence. Docs with
    * a null pack_id (null token counts — nothing to place) OR null text
    * are excluded from the pack AND its counts: the emitted n_docs /
    * pack_tokens describe exactly what pack_text concatenates, never a
    * phantom row `array_join` would silently skip (a null-text doc with
    * a non-null declared token count is a caller contract violation —
    * the counts stay internally consistent rather than inheriting it).
    */
  def materializePacks(packed: DataFrame, shardCol: String, idCol: String,
      textCol: String, sep: String = " "): DataFrame =
    packed.where(col("pack_id").isNotNull && col(textCol).isNotNull)
      .groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        array_join(transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            x => x.getField(textCol)), sep).as("pack_text"))

  /** Token-ID pack materialization — the trainer-facing sibling of
    * [[materializePacks]]: within each (shard, pack), documents' token-id
    * arrays concatenate in id order into one flat `pack_ids`
    * (`array<int>`), the exact id stream a training loader consumes.
    * Same ordering-safe shape (`array_sort(collect_list(struct(id,
    * ids)))` — the unique id is the sort key, so the array field is
    * never compared), same null discipline: a null ids array (null
    * text) drops with its pack_id, a present-but-empty array keeps its
    * row (it is a real zero-token document) and contributes nothing to
    * the stream. One shuffle on (shard, pack_id); pack payloads are
    * budget-bounded by construction, so the per-group state is
    * O(tokenBudget), never corpus-scaled.
    *
    * Alongside the flat stream each pack carries `doc_offsets`
    * (`array<int>`, n_docs + 1 boundaries: 0, then each member's
    * cumulative end) — the segment map a trainer needs for attention /
    * loss masking, and what lets q152's decode audit verify each
    * document's slice independently. A zero-token member repeats the
    * previous boundary, so boundaries stay index-aligned with the
    * pack's members in id order. The running-concat build is
    * O(n_docs²) array copies per pack, but n_docs is budget-bounded
    * (a pack holds ~budget tokens), so per-group work stays
    * O(tokenBudget) at any corpus size.
    */
  def materializeTokenPacks(packed: DataFrame, shardCol: String,
      idCol: String, idsCol: String,
      // extra per-pack aggregates computed IN the one pack shuffle
      // (e.g. the multimodal mix rollup) — they see the same
      // null-discipline-filtered rows as the built-in counts, so a
      // dropped doc is absent from every reported number consistently
      extraAggs: Seq[Column] = Nil): DataFrame =
    packed.where(col("pack_id").isNotNull && col(idsCol).isNotNull)
      .groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_tokens")).as("pack_tokens") +: extraAggs) ++ Seq(
          array_sort(collect_list(struct(col(idCol), col(idsCol))))
            .as("__members")): _*)
      .withColumn("pack_ids",
        flatten(transform(col("__members"), x => x.getField(idsCol))))
      .withColumn("doc_offsets",
        aggregate(
          transform(col("__members"), x => size(x.getField(idsCol))),
          array(lit(0)),
          (acc, l) => concat(acc, array(element_at(acc, -1) + l))))
      .drop("__members")

  /** No-split (document-preserving) sequence packing — the SFT-style
    * sibling of [[packSequences]]: a document is never cut across packs,
    * so a pack is a SET of whole documents whose token counts sum to at
    * most `tokenBudget` (pretraining packs split stragglers at the
    * boundary; instruction-tuning rows must stay intact, so their packer
    * bin-packs instead). Exact bin packing is NP-hard; this runs
    * first-fit-decreasing — the classical 11/9·OPT+1 approximation — made
    * distributed and DETERMINISTIC by hash-bucketing: each doc lands in
    * `pmod(xxhash64(id), nBuckets)` within its shard, and FFD runs
    * independently inside each (shard, bucket) group, sorted (n_tokens
    * desc, id asc). Group membership depends only on ids — never on
    * partitioning — so pack contents are reproducible across runs,
    * cluster sizes, and AQE decisions.
    *
    * Scale shape: one shuffle on (shard, bucket); per-group state is the
    * group's (id, n_tokens) pairs — corpus/nBuckets rows — so `nBuckets`
    * is the scale knob (size it to keep groups task-sized at 100 TB).
    * Bucket-local packing costs at most one under-filled pack per group
    * vs a global FFD — the standard block-shuffle approximation
    * production SFT packers make. First-fit guarantees at most ONE pack
    * per group at ≤ half fill (two half-empty packs would have merged),
    * which q176 verifies from the output.
    *
    * A doc longer than the budget gets a singleton pack (fill > budget
    * blocks all joiners); every multi-doc pack is within budget by
    * construction. Rows with a null token count are EXCLUDED — a
    * no-split pack cannot place a doc whose cost is unknown.
    *
    * Returns one row per doc: (shard, bucket, pack_seq, doc_id,
    * n_tokens); (shard, bucket, pack_seq) identifies the pack.
    */
  def packSequencesNoSplit(docs: DataFrame, shardCol: String,
      idCol: String, nTokensCol: Column, tokenBudget: Long,
      nBuckets: Int): DataFrame = {
    require(tokenBudget >= 1,
      "packSequencesNoSplit needs a positive token budget")
    require(nBuckets >= 1, "packSequencesNoSplit needs nBuckets >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .select(col(shardCol).cast("string").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        nTokensCol.cast("long").as("n_tokens"))
      .where(col("n_tokens").isNotNull)
      .withColumn("bucket",
        pmod(xxhash64(col("doc_id")), lit(nBuckets.toLong)))
      .as[(String, Long, Long, Long)]
    prepared
      .groupByKey { case (shard, _, _, bucket) => (shard, bucket) }
      .flatMapGroups { (key: (String, Long),
          it: Iterator[(String, Long, Long, Long)]) =>
        val (shard, bucket) = key
        // FFD: longest first (ties by id), each doc into the FIRST open
        // pack with room, else a new pack — O(docs × packs) per group,
        // both bucket-bounded
        val sorted = it.toArray.sortBy { case (_, id, n, _) => (-n, id) }
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.iterator.map { case (_, id, n, _) =>
          var placed = -1
          var i = 0
          while (placed < 0 && i < fills.length) {
            if (fills(i) + n <= tokenBudget) { fills(i) += n; placed = i }
            i += 1
          }
          if (placed < 0) { fills += n; placed = fills.length - 1 }
          (shard, bucket, placed, id, n)
        }
      }
      .toDF("shard", "bucket", "pack_seq", "doc_id", "n_tokens")
  }

  /** The subtotal half of the distributed prefix sum [[packSequences]]
    * and [[shuffleShard]] share: one metadata-sized pass collects
    * per-(partition, group) weight subtotals in partition order, and the
    * driver folds them into "weight of the same group in EARLIER
    * partitions" offsets — O(partitions × groups-per-partition) entries,
    * never row-scaled. Every group PRESENT in a partition is recorded
    * (zero weights included) so the offset chain stays unbroken.
    */
  private def prefixOffsets(rdd: org.apache.spark.rdd.RDD[Row],
      groupIdx: Int, weight: Row => Long): Map[(Int, Any), Long] = {
    val subtotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      val perGroup = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      it.foreach { r =>
        val k = r.get(groupIdx)
        perGroup.update(k, perGroup.getOrElse(k, 0L) + weight(r))
      }
      Iterator.single(pid -> perGroup.toVector)
    }.collect()
    val offsets = scala.collection.mutable.HashMap.empty[(Int, Any), Long]
    val running = scala.collection.mutable.HashMap.empty[Any, Long]
    subtotals.sortBy(_._1).foreach { case (pid, groups) =>
      groups.foreach { case (k, tot) =>
        offsets((pid, k)) = running.getOrElse(k, 0L)
        running.update(k, running.getOrElse(k, 0L) + tot)
      }
    }
    offsets.toMap
  }

  /** Deterministic global shuffle + shard assignment — the training-order
    * export stage: every row gets a pseudorandom but REPRODUCIBLE
    * `sort_key` (portable 32-bit hash of the id salted by `seed`), a
    * `shard` (an independently-salted hash mod `nShards`), and `pos`, its
    * 0-based ordinal within the shard under (sort_key, id) order — the
    * exact order a sharded training-data export writes. No RNG state, no
    * driver data: rerunning with the same seed reproduces the permutation
    * bit-for-bit on any cluster.
    *
    * Scale shape: within-shard ordinals are the same distributed prefix
    * sum as [[packSequences]] (weight 1 per row) over a
    * (shard, sort_key, id) range partitioning — a shard spans as many
    * partitions as its size demands, so no task ever sorts a shard-sized
    * partition the way a `row_number().over(partitionBy(shard))` would.
    * Both passes share one RDD instance (offsets cannot drift from the
    * ordinal pass), and the RDD boundary carries every input column —
    * the materializing-export shape; a stats-only caller pre-projects,
    * as with [[packSequences]].
    */
  def shuffleShard(df: DataFrame, idCol: String, nShards: Int,
      seed: String): DataFrame = {
    require(nShards >= 1, "shuffleShard needs at least one shard")
    val reserved = Seq("__sort_key", "__shard", "sort_key", "shard", "pos")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty, // fail loudly, not an ambiguous-column surprise
      s"shuffleShard emits ${reserved.mkString("/")}; input already has " +
        clash.mkString(", "))
    val spark = df.sparkSession
    val keyed = df
      .withColumn("__sort_key", TextFunctions.portableHash(
        concat(lit(seed), lit("|"), col(idCol).cast("string"))))
      .withColumn("__shard", pmod(TextFunctions.portableHash(
        concat(lit(seed), lit("#"), col(idCol).cast("string"))),
        lit(nShards)).cast("long"))
    val sorted = keyed
      .repartitionByRange(col("__shard"), col("__sort_key"), col(idCol))
      .sortWithinPartitions(col("__shard"), col("__sort_key"), col(idCol))
    val schema = sorted.schema
    val shardIdx = schema.fieldIndex("__shard")
    val rdd = sorted.rdd
    val bOffsets = spark.sparkContext.broadcast(
      prefixOffsets(rdd, shardIdx, _ => 1L))
    val positioned = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bOffsets.value
      var cur: Any = null
      var started = false
      var cnt = 0L
      it.map { r =>
        val k = r.get(shardIdx)
        if (!started || k != cur) {
          cur = k
          started = true
          cnt = off.getOrElse((pid, k), 0L)
        }
        val pos = cnt
        cnt += 1
        Row.fromSeq(r.toSeq :+ java.lang.Long.valueOf(pos))
      }
    }
    spark.createDataFrame(positioned,
      schema.add(org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false)))
      .withColumnRenamed("__sort_key", "sort_key")
      .withColumnRenamed("__shard", "shard")
  }

  /** Epoch-repetition mixing for data-constrained training (Muennighoff
    * et al. '23: repeat scarce domains up to a few epochs rather than
    * letting abundant ones crowd them out): give every domain an EQUAL
    * token target `tokenBudget / #domains`, fill it with full epochs of
    * the domain (capped at `maxEpochs`) plus a hash-thresholded partial
    * epoch, and emit each input row once per epoch with an `epoch`
    * column (0-based). A domain bigger than its target contributes a
    * partial epoch 0 only — this operator SUBSAMPLES abundant domains
    * and REPEATS scarce ones with one policy. Capped-uniform is
    * deliberate: no iterative waterfill, so allocation is one integer
    * expression per domain and an oracle replays it exactly.
    *
    * Determinism contract (the [[temperatureSample]] discipline): domain
    * token counts are EXACT (an O(#domains) driver collect — metadata),
    * full-epoch counts and the 1e6-fixed-point partial threshold are
    * integer arithmetic in BigInt, and partial-epoch membership is a
    * pure hash predicate on the epoch-salted id — no RNG, reproducible
    * on any cluster, bit-identical in an ANSI-SQL twin (the q132 oracle
    * computes the same quantities in HUGEINT).
    *
    * Scale shape: stats collect is metadata-sized; the per-domain plan
    * (full epochs, threshold) joins back as a broadcast dim; full-epoch
    * replication is a narrow `explode(sequence)` whose fan-out is capped
    * by `maxEpochs`; the partial epoch is a narrow filter. No shuffle
    * anywhere. Null domains are rejected loudly; null token counts
    * count zero mass but still replicate with their domain.
    */
  def allocateEpochs(df: DataFrame, domainCol: String, idCol: String,
      nTokensCol: Column, tokenBudget: Long, maxEpochs: Int): DataFrame = {
    require(tokenBudget >= 0, "allocateEpochs needs a budget >= 0")
    require(maxEpochs >= 1, "allocateEpochs needs maxEpochs >= 1")
    require(df.schema(domainCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"allocateEpochs needs a string domain column, got " +
        df.schema(domainCol).dataType.simpleString)
    val counts = df.groupBy(col(domainCol))
      .agg(coalesce(sum(nTokensCol.cast("long")), lit(0L)).as("__n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    require(!counts.contains(None),
      s"allocateEpochs: $domainCol contains nulls — coalesce them to a " +
        "sentinel domain first")
    val named = counts.map { case (d, n) => d.get -> n }
    if (named.isEmpty) return df.withColumn("epoch", lit(0L)).limit(0)
    val target = BigInt(tokenBudget) / named.size
    val plan = named.map { case (d, n) =>
      if (n <= 0) (d, 0L, 0L) // empty domain: nothing to repeat
      else {
        val full = (target / n).min(BigInt(maxEpochs)).toLong
        val rem = if (full >= maxEpochs) BigInt(0) else target - full * n
        val keepMilli = (BigInt(1000000) * rem / n).min(BigInt(1000000))
        (d, full, keepMilli.toLong)
      }
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val planDf = broadcast(plan.toDF(domainCol, "__full", "__keep"))
    val joined = df.join(planDf, Seq(domainCol))
    val fullCopies = joined
      .withColumn("epoch", explode(
        when(col("__full") > 0, sequence(lit(0L), col("__full") - 1))
          .otherwise(array().cast("array<long>"))))
    val partial = joined
      .where(pmod(TextFunctions.portableHash(
          concat(col(domainCol), lit("@"), col("__full").cast("string"),
            lit("|"), col(idCol).cast("string"))),
        lit(1000000)) < col("__keep"))
      .withColumn("epoch", col("__full"))
    fullCopies.unionByName(partial).drop("__full", "__keep")
  }

  /** Budget-bounded corpus selection — how a training mix is actually
    * cut: order the corpus by (score DESC, id ASC) and keep the maximal
    * prefix whose cumulative token count fits `tokenBudget` ("take the
    * best documents until N tokens"). A doc is kept iff its cumulative
    * count AFTER inclusion is ≤ budget, so the first overflowing doc and
    * everything ranked below it drop. Null token counts are not
    * selectable and do not advance the cumulative sum (same null rule as
    * [[packSequences]]); a null SCORE is not selectable either —
    * ENFORCED, not just documented: a null-score doc is treated exactly
    * like a null-count doc (engines disagree on where DESC places
    * nulls, and Spark's nulls-first ascending default would otherwise
    * let a scoreless doc pre-empt the whole budget).
    *
    * Scale shape: the obvious `sum().over(Window.orderBy(score DESC))`
    * is a single-task GLOBAL sort — the worst window of all. Instead the
    * corpus range-partitions on the (negated-score, id) sort key — the
    * same total order spread over as many partitions as the data
    * demands — and runs the shared two-pass distributed prefix sum:
    * O(partitions) subtotal collect, broadcast offsets, narrow seeded
    * local cumsum + filter. Output: the kept rows with `n_tokens` and
    * `cum_tokens` (cumulative count INCLUDING the row) appended.
    */
  def selectToTokenBudget(docs: DataFrame, scoreCol: Column, idCol: String,
      nTokensCol: Column, tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 0, "selectToTokenBudget needs a budget >= 0")
    val spark = docs.sparkSession
    val prepared = docs
      // the null-score guard: a scoreless doc is a countless doc — its
      // cum stays null and the final filter drops it, wherever the
      // engine's null ordering happened to place it
      .withColumn("__n_tokens",
        when(scoreCol.isNull, lit(null).cast("long"))
          .otherwise(nTokensCol.cast("long")))
      .withColumn("__neg_score", negate(scoreCol.cast("double")))
      .withColumn("__grp", lit(0)) // single global group for the offsets
    val sorted = prepared
      .repartitionByRange(col("__neg_score"), col(idCol))
      .sortWithinPartitions(col("__neg_score"), col(idCol))
    val schema = sorted.schema
    val grpIdx = schema.fieldIndex("__grp")
    val ntIdx = schema.fieldIndex("__n_tokens")
    val rdd = sorted.rdd
    val bOffsets = spark.sparkContext.broadcast(
      prefixOffsets(rdd, grpIdx,
        r => if (r.isNullAt(ntIdx)) 0L else r.getLong(ntIdx)))
    val cumd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bOffsets.value
      var cum = off.getOrElse((pid, 0), 0L)
      it.map { r =>
        val cumAfter: Any =
          if (r.isNullAt(ntIdx)) null
          else { cum += r.getLong(ntIdx); java.lang.Long.valueOf(cum) }
        Row.fromSeq(r.toSeq :+ cumAfter)
      }
    }
    spark.createDataFrame(cumd,
        schema.add(org.apache.spark.sql.types.StructField("cum_tokens",
          org.apache.spark.sql.types.LongType, nullable = true)))
      .where(col("cum_tokens").isNotNull && col("cum_tokens") <= tokenBudget)
      .drop("__neg_score", "__grp")
      .withColumnRenamed("__n_tokens", "n_tokens")
  }
}
