package graft
import org.apache.spark.sql.SparkSession
object DumpPlans {
  /** The ONE q155-class micro-batch shape (shared by the q155/q163 plan
    * stand-ins; q158 adds its decontamination filter before calling the
    * same materializeTyped): an encode projection into
    * materializeTyped's groupByKey(shard) pass — the shared shape lives
    * here so a change to it (e.g. the null-ids guard) cannot silently
    * pin two different shapes.
    */
  private def materializeShape(spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      encode: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, size}
    import spark.implicits._
    val typed = docs.select(col("lang").cast("string").as("shard"),
        col("doc_id").cast("long").as("doc_id"),
        encode.cast("array<int>").as("ids"))
      .where(size(col("ids")) >= 0)
      .as[graft.streaming.StreamingPack.PackDocIds]
    graft.streaming.StreamingPack.materializeTyped(typed, 2048L).toDF()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val picks = Seq(
      "q01_pruned_scan" -> "pruned+pushed parquet scan",
      "q13_ffill_candles" -> "single-window forward fill",
      "q19_join_agg" -> "broadcast dim joins + decimal agg",
      "q31_minhash_signatures" -> "zero-shuffle fused minhash kernel",
      "q40_embedding_neardup" -> "all-pairs cosine via codegen VecDot",
      "q23_asof_join" -> "as-of join as union + one window",
      "q56_embedding_neardup_lsh" ->
        "LSH near-dup: narrow VecHyperplaneSig signatures, banded candidates",
      "q62_salted_agg" -> "two-phase salted aggregation",
      "q68_pack_sequences" -> "sequence packing: one shuffle + per-shard window",
      "q71_decontaminate" -> "eval-shingle semi-join + anti-join",
      "q84_heavy_hitters" ->
        "Misra-Gries sketch: partial+final ObjectHashAggregate, k counters per partition",
      "q85_targeted_delete" -> "GDPR delete: broadcast anti-join, target never shuffled",
      "q90_approx_distinct" -> "HLL partial aggregation vs exact distinct",
      "q94_span_dedup" ->
        "linear span dedup: digest-window count, islands reuse the doc exchange",
      "q98_matched_spans" ->
        "variable-length matched spans: seed join + diagonal islands",
      "q100_hub_shingles" ->
        "hub-shingle diagnostic: one digest shuffle + scalar aggregate",
      "q99_incremental_minmax" ->
        "incremental min/max gate: delta-sized state folds, one full-outer per feed",
      "q109_inverted_index" ->
        "inverted index: two combine-enabled shuffles, posting lists elided over the df cap",
      "q110_bm25_topk" ->
        "BM25 top-k: tf counted in-array (no corpus shuffle), one-row stats broadcast, TakeOrdered",
      "q111_rare_ngram_gate" ->
        "rare-ngram gate: one count shuffle + frequency-annotation join",
      "q113_decontaminate_neardup" ->
        "near-dup decontamination: banded candidates, candidate-routed Jaccard verify, corpus anti-join",
      "q126_pii_scrub" ->
        "PII scrub: pure narrow codegen'd regex map, no exchange",
      "q127_budget_select" ->
        "budget selection: range shuffle + prefix-sum RDD, no global-sort window",
      "q130_quality_classifier" ->
        "centroid classifier: dim-bounded training agg, 1-row model broadcast, narrow margin map",
      "q132_epoch_mix" ->
        "epoch mixing: broadcast plan join + bounded explode, no post-join exchange",
      "q133_curation_pipeline" ->
        "composed curation: 1-row broadcast model join, gate, prefix-sum select, epoch mix — no data-sized window anywhere",
      "q134_nfc_normalize" ->
        "NFC canonicalization: one codegen'd narrow kernel pass, no exchange",
      "q135_stream_curate" ->
        "streaming curation final batch shape: stateless narrow scrub+score with the 1-row broadcast model (the streaming form adds only source/sink machinery)",
      "q136_dedup_unlearn" ->
        "dedup unlearning: delta-sized anti-join removals + hash-set replay verify — band-key equi-joins only, accepted text never rescanned",
      "q137_bpe_encode" ->
        "BPE apply: piece-vocab build (q86 class) + codegen'd trie encode, one narrow kernel pass over docs",
      "q138_split_leak_audit" ->
        "split-leakage audit: alternating-star clusters, two pair-sized label joins per split rule, 1-row broadcast crossJoins",
      "q51_range_join" ->
        "binned range join: <=2-bin interval explode (span == binSize), bin equi-join + residual containment filter — no interval cross product",
      "q139_bpe_pack" ->
        "tokenizer x packing: count-only BPE kernel projection (no id-array allocation) feeding the range-shuffle prefix-sum packer — no Window, no data-sized sort",
      "q140_stream_curate_dedup" ->
        "composed curation->dedup micro-batch shape: stateless narrow scrub + 1-row broadcast score IN FRONT of the band-key equi-join + hash-set verify — no new exchange or state vs the bare index add",
      "q141_corpus_to_packs" ->
        "corpus->tokens->packs back half over the accepted curated corpus (front half = q140's pinned shape): vocab-build aggregation + count-kernel narrow projection + range-shuffle prefix-sum packer + pack materialization — no Window, no new shuffle class",
      "q142_bpe_learn" ->
        "one BPE-learn iteration's job shape (the query output itself is a k-row driver table): dict-sized adjacent-pair explode + map-side-combined pair aggregation + TakeOrdered(1) — the per-iteration cost the k-bounded loop repeats",
      "q143_bpe_learn_apply" ->
        "rank-ordered BPE apply: one narrow memoized kernel projection over the corpus (the learned merge table rides the expression as model metadata) — no exchange beyond the output sort",
      "q144_token_packs" ->
        "token-ID pack export: encode-kernel projection -> range-shuffle prefix-sum packer -> ONE (shard, pack_id) group shuffle flattening id arrays in id order — per-group state bounded by tokenBudget, no Window",
      "q145_artifact_roundtrip" ->
        "tokenizer artifact round-trip: the two persisted-artifact kernel projections (MaxMatch count, rank-ordered merge count) joined on doc_id — artifact load is model-metadata-sized driver work, the corpus passes stay narrow",
      "q146_tokenizer_fertility" ->
        "per-lang tokenizer eval: ONE narrow codegen projection (tokens + merge-count kernels) then ONE O(#langs) hash aggregate — per-word byte sums fold inside the row via functions.aggregate, no per-word explode or shuffle",
      "q147_pack_efficiency" ->
        "pack-efficiency audit: the pinned q139 packer shape + two metadata-sized rollups (per (shard,pack) then per shard) — the oversize census rides the first rollup, no new shuffle class",
      "q148_vocab_coverage" ->
        "vocabulary-coverage audit: en-trained vocab applied cross-lingually — ONE narrow projection with the FUSED count+UNK kernel (a single tokenize + trie walk emits both; vocab rides the expression as model metadata), no exchange beyond the output sort",
      "q149_chunk_repack" ->
        "chunk-then-repack (the q147 oversize fix, gated): narrow chunk explode (slice off one tokens array, no per-token explode) -> count-kernel projection -> the pinned packer + two rollups — oversize census provably zero, same shuffle classes as q139/q147",
      "q150_tokenizer_compare" ->
        "tokenizer A/B report: both inference kernels (MaxMatch vocab, rank-ordered merges) side by side in ONE narrow projection over the same corpus, then one O(#langs) aggregate with the win census — no shuffle beyond the rollup",
      "q153_stream_token_packs" ->
        "streaming packer micro-batch shape: stateless codegen tokenize projection -> ONE hash exchange on shard -> FlatMapGroupsWithState (one Long cursor per shard) — no Window, no second shuffle; per-batch work O(batch)",
      "q154_token_decontaminate" ->
        "token-level 13-gram decontamination: eval windows DISTINCT then BROADCAST, corpus pass = ONE typed sliding-window traversal (MapPartitions) -> BroadcastHashJoin -> partial-agg per-doc count — the only exchange carries the hit set, never corpus windows",
      "q155_stream_pack_export" ->
        "streaming closed-pack export micro-batch shape: stateless codegen encode projection -> ONE hash exchange on shard -> FlatMapGroupsWithState (budget-bounded open-pack buffer) — the q144 artifact emitted incrementally, no Window, no second shuffle",
      "q156_token_decontaminate_bloom" ->
        "bloom-prefiltered token decontamination: driver bloom rides the typed sliding pass (clean docs emit ZERO rows), only the candidate sliver reaches the exact verify join — the corpus stage is one narrow traversal, no corpus-window relation anywhere",
      "q157_token_decontaminate_hashed" ->
        "q154's join with every window collapsed to an int64 fingerprint INSIDE the same typed sliding pass on both sides — the join relation is 8 bytes/window (no window string ever materializes), same broadcast + partial-agg shape otherwise",
      "q159_byte_bpe_roundtrip" ->
        "byte-level BPE roundtrip audit: ONE narrow codegen projection (pretokenize -> byte symbols -> merge walk -> ids -> decode) — no shuffle at all before the final sort; both kernels ride the same whole-stage codegen span",
      "q158_stream_decontam_packs" ->
        "token-decontaminated streaming packer micro-batch shape: the q155 encode projection with the eval-fingerprint binary-search FILTER riding it (no new exchange, no state growth) -> ONE hash exchange on shard -> FlatMapGroupsWithState — a contaminated doc never reaches the stateful packer",
      "q162_byte_packs_exact" ->
        "byte packs with exact-reconstruction audit: byte-encode kernel projection -> the pinned q144 packer (range-shuffle prefix sums + ONE (shard, pack_id) group shuffle) -> decode ONCE per pack row for the digest — no new shuffle class vs q144/q152",
      "q163_stream_byte_packs" ->
        "streaming byte-pack export micro-batch shape: identity-byte encode projection into materializeTyped's groupByKey(shard) pass — q155's pinned shape with the byte kernel as the stateless prepare, no second shuffle",
      "q164_token_decontaminate_bloom_hashed" ->
        "bloom prefilter over int64 fingerprints: q156's pinned shape (driver bloom rides the typed pass, clean docs emit zero rows) with the join relation collapsed to 8 bytes/window — no window string anywhere in the plan",
      "q165_token_decontaminate_delta" ->
        "growing-eval-suite maintenance: eval-sized delta anti-join (novel windows only) -> the pinned q157 corpus join over the delta -> hit-table full-outer merge — the corpus pass is the same ONE traversal, the build side shrinks to the new benchmark's novel windows",
      "q166_token_decontaminate_coverage" ->
        "matched-span coverage: the pinned q157 corpus pass with window start positions riding candidate rows -> broadcast join -> the position explode runs on the MATCHED SLIVER only (checkpointed, reused by both aggregates) — never corpus-sized",
      "q167_contamination_by_eval_doc" ->
        "attribution report: the same ONE corpus traversal joined against the doc-attributed eval windows (broadcast, no distinct) -> one partial-agg rollup per eval doc — the corpus never shuffles",
      "q168_byte_bpe_gpt2_pretok" ->
        "q159's pinned shape under the GPT-2 pretokenizer: ONE narrow codegen projection (gpt2-regex pretokenize -> byte symbols -> merge walk -> ids -> decode) — the pretokenizer mode changes per-row kernel work only, no shuffle before the final sort",
      "q169_multimodal_packs" ->
        "multimodal packs: metadata-only placeholder spans (array_repeat off dims arithmetic, no payload read) unioned with identity-byte text ids -> the pinned q144 packer (range-shuffle prefix sums + ONE (shard, pack_id) group shuffle) with the modality-mix aggregates riding the SAME group agg — no extra exchange for the mix",
      "q171_decontaminate_by_coverage" ->
        "coverage-thresholded gate: the pinned q166 coverage shape (one typed corpus traversal, matched-sliver aggregates) -> threshold filter on the contaminated sliver -> LEFT ANTI join back to the corpus with the tiny drop set broadcast — the corpus is never shuffled",
      "q172_multimodal_pack_segments" ->
        "multimodal per-segment audit: the pinned q169 pack shape, then segment slices cut from each pack row's own arrays (doc_offsets-indexed slice + branch on the reserved placeholder id) — a per-pack-row projection, no new exchange; decode runs only on text segments",
      "q173_pack_trainer_tensors" ->
        "trainer tensors: the pinned q144 pack shape + per-pack-row offset algebra (zip_with lengths -> sequence / array_repeat flatten) — position_ids and segment_ids are a projection over budget-bounded arrays, no new exchange",
      "q174_eod_packs" ->
        "EOD-separated packs: the separator id concatenates inside the SAME encode projection (weight = n_tokens + 1) feeding the pinned q144 packer — no new shuffle class; the eod gate is a per-pack-row forall over the artifact arrays",
      "q175_semantic_dedup" ->
        "SemDeDup: narrow kernel cell assignment (centroids are broadcast driver metadata) -> cell-keyed exchanges into the within-cell pair join -> distinct losers -> id-keyed label join — ~corpus²/k candidate pairs scoped by the cell key, never all-pairs; k is the scale knob",
      "q176_ffd_pack_nosplit" ->
        "no-split FFD packing: ONE hash exchange on (shard, hash-bucket) -> per-group first-fit-decreasing in flatMapGroups (group = corpus/nBuckets rows, the scale knob) — deterministic bucketing off ids, no Window, no collect",
      "q177_line_dedup_keep_first" ->
        "line-level keep-first dedup: line explode -> ONE combine-enabled shuffle on line with the winner as a codegen'd HashAggregate min over the PACKED (id<<24|pos) long (min over a struct falls back to SortAggregate — both phases then sort every line row by the string key) -> left-semi winner mark -> one doc shuffle to reassemble — no corpus-sized group state anywhere",
      "q178_strip_frequent_lines" ->
        "frequent-line strip: the q177 explode/reassemble frame with a distinct-doc count per line and the (tiny) frequent set anti-joined back — boilerplate is rare by definition of being worth stripping, so the anti-join build side broadcasts at any scale",
      "q179_incremental_line_dedup" ->
        "incremental line dedup batch shape (one addBatch): seen-line anti-join IN FRONT of the q177 winner aggregate/semi-join — per-batch work is O(batch lines + index probe), the corpus never rescans; checkpointed fresh set cuts the chained-batch lineage",
      "q180_unigram_viterbi" ->
        "unigram-LM Viterbi encode: builder = one token-count shuffle + substring-candidate count + TakeOrdered cut (windows only on the vocab-sized selected set); apply = ONE narrow codegen projection carrying the piece table as expression metadata, zero shuffle before the final sort",
      "q181_corpus_drift" ->
        "corpus-drift TVD: side-tagged token union into ONE combine-enabled shuffle (not two aggregates + outer join), 1-row totals broadcast back, exact decimal cross-multiplication — no float division, no collect",
      "q182_curation_audit" ->
        "curation-audit attribution: per-stage reject sets resolve in ONE shuffle over the tagged id-only union (min-rank aggregate), stage names from a literal array — no per-stage join chain",
      "q183_unigram_surprise" ->
        "unigram-surprise LM quality filter: q180's narrow codegen cost projection + a 1-row totals broadcast; the mean-surprise gate is a decimal cross-multiplication riding the same projection",
      "q184_unigram_hard_em" ->
        "unigram hard-EM re-encode: the E-step usage aggregate is one explode+combine shuffle, M-step is driver metadata, and the re-encode is again ONE narrow codegen projection — the learn loop never shuffles the corpus twice per iteration",
      "q185_drift_bigrams" ->
        "bigram-distribution drift: q181's one side-tagged combine shuffle with the fused ShinglesExpr kernel feeding it — arity changes the feature, never the plan")
    // args: query names to APPEND to PLANS.md (preserves the manually
    // curated entries past the picks list); no args = full regeneration
    val appendOnly = args.nonEmpty
    val labels = picks.toMap
    val todo = if (appendOnly)
      args.toSeq.map(q => q -> labels.getOrElse(q, "appended plan"))
      else picks
    val sb = new StringBuilder
    if (!appendOnly) {
      sb.append("# PLANS — formatted physical plans of headline queries\n\n")
      sb.append("Generated by `graft.DumpPlans` at sf0.001. What to look for:\n")
      sb.append("`PushedFilters`/`ReadSchema` on scans, `(n)` whole-stage\n")
      sb.append("codegen ids, a single Exchange per window/agg, broadcast\n")
      sb.append("exchanges on dim sides.\n")
    }
    for ((q, why) <- todo) {
      // q135's registered query materializes the stream and returns a
      // scan of its OUTPUT — plan the batch-identical transform chain
      // instead (StreamingCurate is batch-identical by construction;
      // the streaming form only adds source/sink machinery around it)
      val df = if (q == "q135_stream_curate") {
        import org.apache.spark.sql.functions.{col, md5}
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "lang", "text")
        val model = graft.operators.Classify.centroidModel(
          docs.where(col("doc_id") % 5 =!= 0), col("lang") === "en")
          .localCheckpoint()
        val scrubbed = graft.operators.Scrub.redactPii(
          docs.select("doc_id", "text"))
        graft.operators.Classify.scoreByModel(
            scrubbed.drop("text").withColumnRenamed("redacted", "text"), model)
          .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
            md5(col("text")).as("redacted_md5"),
            col("margin").cast("long").as("margin"), col("quality_pred"))
      } else if (q == "q142_bpe_learn") {
        // the registered query returns the k-row merge table (a driver
        // list) — the plan that matters is the ITERATION job the
        // k-bounded loop repeats: adjacent-pair explode over the dict
        // state + pair aggregation + top-1
        import org.apache.spark.sql.functions._
        val dict = spark.read.parquet(s"$dir/documents.parquet")
          .select(explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
        val state = dict
          .select(col("cnt"),
            filter(split(col("word"), ""), c => c =!= "").as("syms"))
          .where(size(col("syms")) >= 2)
          .localCheckpoint()
        state
          .select(col("cnt"), explode(transform(
            sequence(lit(1), size(col("syms")) - 1),
            j => struct(element_at(col("syms"), j).as("lhs"),
              element_at(col("syms"), j + 1).as("rhs")))).as("p"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("lhs"), col("rhs"))
          .limit(1)
      } else if (q == "q141_corpus_to_packs") {
        // front half = q140's pinned micro-batch shape; plan the BACK
        // half over a batch-identical accepted stand-in: piece-vocab
        // build + count-kernel projection + prefix-sum packer + pack
        // materialization (the registered query materializes the
        // stream, so its own plan is just an output scan)
        import org.apache.spark.sql.functions.{col, md5}
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "lang", "text")
        val model = graft.operators.Classify.centroidModel(
          docs.where(col("doc_id") % 5 =!= 0), col("lang") === "en")
          .localCheckpoint()
        val curated = graft.operators.Classify.scoreByModel(
            graft.operators.Scrub.redactPii(docs.select("doc_id", "text"))
              .drop("text").withColumnRenamed("redacted", "text"), model)
          .where(col("quality_pred")).select("doc_id", "text")
          .localCheckpoint()
        val corpus = curated.join(docs.select("doc_id", "lang"), Seq("doc_id"))
        val pieces = graft.operators.Corpus.collectPieces(
          graft.operators.Corpus.buildPieceVocab(corpus, "text",
            minCount = 5, maxSize = 200))
        val withN = corpus.select(col("doc_id"), col("lang"), col("text"),
          graft.functions.TextFunctions.bpeCount(col("text"), pieces)
            .cast("long").as("__n_tokens"))
        val packed = graft.operators.Corpus.packSequences(withN, "lang",
          "doc_id", col("__n_tokens"), tokenBudget = 2048)
        graft.operators.Corpus.materializePacks(packed, "lang", "doc_id",
            "text")
          .select(col("lang"), col("pack_id"), col("n_docs"),
            col("pack_tokens"), md5(col("pack_text")).as("pack_md5"))
      } else if (q == "q140_stream_curate_dedup") {
        // like q135: the registered query materializes the stream and
        // returns a scan of its output — plan the batch-identical
        // micro-batch shape instead: the stateless curate stages
        // (scrub + 1-row broadcast score) composed IN FRONT of the
        // stateful index add (band equi-join + hash-set verify), with
        // batch-1's index as the existing state so the add-batch side
        // shows its real state join
        import org.apache.spark.sql.functions.col
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "lang", "text")
        val model = graft.operators.Classify.centroidModel(
          docs.where(col("doc_id") % 5 =!= 0), col("lang") === "en")
          .localCheckpoint()
        def curate(b: org.apache.spark.sql.DataFrame) = {
          val scrubbed = graft.operators.Scrub.redactPii(
            b.select("doc_id", "text"))
            .drop("text").withColumnRenamed("redacted", "text")
          graft.operators.Classify.scoreByModel(scrubbed, model)
            .where(col("quality_pred")).select("doc_id", "text")
        }
        val (_, idx1) = graft.operators.Dedup.dedupIndexAddBatch(
          graft.operators.Dedup.dedupIndexKeys(docs.limit(0)),
          curate(docs.where(col("doc_id") % 2 === 0)))
        graft.operators.Dedup.dedupIndexAddBatch(idx1.localCheckpoint(),
          curate(docs.where(col("doc_id") % 2 === 1)))._1
      } else if (q == "q153_stream_token_packs") {
        // the registered query materializes the stream and returns a
        // scan of its output — plan the batch-identical stateful shape
        // instead: the stateless tokenize projection (codegen count
        // kernel) feeding packTyped's groupByKey(shard) pass (batch
        // mode plans the same FlatMapGroupsWithState operator the
        // micro-batch runs, minus source/sink machinery)
        import org.apache.spark.sql.functions.col
        import spark.implicits._
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .where(col("text").isNotNull).select("doc_id", "lang", "text")
        val pieces = graft.operators.Corpus.collectPieces(
          graft.operators.Corpus.buildPieceVocab(docs, "text",
            minCount = 5, maxSize = 200))
        val typed = docs.select(col("lang").cast("string").as("shard"),
            col("doc_id").cast("long").as("doc_id"),
            graft.functions.TextFunctions.bpeCount(col("text"), pieces)
              .cast("long").as("n_tokens"))
          .as[graft.streaming.StreamingPack.PackDocIn]
        graft.streaming.StreamingPack.packTyped(typed, 2048L).toDF()
      } else if (q == "q155_stream_pack_export") {
        // batch-identical stateful shape, as q153: encode projection
        // into materializeTyped's groupByKey(shard) pass
        import org.apache.spark.sql.functions.col
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .where(col("text").isNotNull).select("doc_id", "lang", "text")
        val pieces = graft.operators.Corpus.collectPieces(
          graft.operators.Corpus.buildPieceVocab(docs, "text",
            minCount = 5, maxSize = 200))
        materializeShape(spark, docs,
          graft.functions.TextFunctions.bpeEncode(col("text"), pieces))
      } else if (q == "q158_stream_decontam_packs") {
        // batch-identical stateful shape, as q155, with the
        // decontamination filter riding the stateless prepare: the
        // eval-fingerprint set binary-searched per row BEFORE the
        // shard exchange — the plan must show no new exchange or
        // state operator vs q155
        import org.apache.spark.sql.functions.{col, size}
        import spark.implicits._
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .where(col("text").isNotNull).select("doc_id", "lang", "text")
        val pieces = graft.operators.Corpus.collectPieces(
          graft.operators.Corpus.buildPieceVocab(docs, "text",
            minCount = 5, maxSize = 200))
        val evalIds = docs.where(col("doc_id") % 50 === 0)
          .select(col("doc_id"),
            graft.functions.TextFunctions.bpeEncode(col("text"), pieces)
              .cast("array<int>").as("ids"))
        val fp = graft.operators.Dedup.evalWindowHashSet(evalIds, n = 13)
        val prepared = graft.operators.Dedup.dropContaminatedStream(
          docs.where(col("doc_id") % 50 =!= 0)
            .select(col("lang").cast("string").as("shard"),
              col("doc_id").cast("long").as("doc_id"),
              graft.functions.TextFunctions.bpeEncode(col("text"), pieces)
                .cast("array<int>").as("ids")),
          fp, n = 13)
        graft.streaming.StreamingPack.materializeTyped(
          prepared.where(size(col("ids")) >= 0)
            .as[graft.streaming.StreamingPack.PackDocIds], 2048L).toDF()
      } else if (q == "q163_stream_byte_packs") {
        // batch-identical stateful shape: the identity byte tokenizer's
        // encode projection (0 merges, ids == bytes) into
        // materializeTyped's groupByKey(shard) pass
        import org.apache.spark.sql.functions.col
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .where(col("text").isNotNull).select("doc_id", "lang", "text")
        materializeShape(spark, docs,
          graft.functions.TextFunctions.byteBpeEncode(col("text"),
            Seq.empty, graft.operators.Corpus.identityByteVocab))
      } else if (q == "q175_semantic_dedup") {
        // the registered query wraps the operator in its all-pairs
        // exact AUDIT (deliberately corpus²) — pin the OPERATOR's
        // shape: assignment kernel + cell-scoped pair join + loser
        // anti-join
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val centroids = graft.operators.Similarity.kmeans(emb, k = 16,
          iterations = 3)
        graft.operators.Similarity.semanticDedup(emb, centroids,
          threshold = 0.9)
      } else if (q == "q176_ffd_pack_nosplit") {
        // pin the OPERATOR's shape (the registered query adds 1-row
        // audit rollups): one (shard, bucket) exchange into the
        // per-group FFD
        import org.apache.spark.sql.functions.col
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .where(col("text").isNotNull)
        graft.operators.Corpus.packSequencesNoSplit(docs, "lang",
          "doc_id", graft.functions.TextFunctions.nTokens(col("text")),
          tokenBudget = 512, nBuckets = 4)
      } else SparkEntry.queries(q)(spark, dir)
      df.count() // force AQE final plan
      sb.append(s"\n## $q — $why\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(6000))
      sb.append("\n```\n")
    }
    val path = java.nio.file.Paths.get("/root/repo/PLANS.md")
    if (appendOnly)
      java.nio.file.Files.writeString(path, sb.toString,
        java.nio.file.StandardOpenOption.APPEND)
    else java.nio.file.Files.writeString(path, sb.toString)
    spark.stop()
  }
}
