package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run as partition-local batch functions (driver-mandated extension —
  * SURVEY.md §7.9).
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container): [[StubDecoder]] produces deterministic fake features from the
  * bytes. Everything Spark-side is real — the asset schema, the
  * mapPartitions batching, the output encoder — so swapping in a real
  * decoder is a one-function change.
  *
  * Scale notes: payload bytes stay in Tungsten rows end-to-end (no
  * collect); decode parallelism = partition count, so `repartition(N)`
  * before decode sizes the GPU/CPU batch workers; metadata-only queries
  * never touch the payload column (parquet column pruning drops it at the
  * scan).
  */
object Multimodal {

  /** Canonical multimodal asset schema: payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
    )), nullable = false),
  ))

  /** Wrap a text corpus as binary assets — the harness's stand-in for real
    * media ingestion: payload = UTF-8 bytes, metadata = byte length + source.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").cast(BinaryType).as("payload"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** A decoded feature batch: fixed-width float features per asset. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false)),
  ))

  /** Deterministic fake decoder: "features" are per-lane byte histograms
    * (lane j = sum of payload bytes at positions ≡ j mod dim). Sums are
    * accumulated in integer arithmetic and only REPRESENTED as float at the
    * end — exact for payloads below 2²⁴/255 ≈ 65 KB per lane — so every
    * downstream aggregate is decimal-exact and oracle-checkable. A real
    * implementation would decode the payload (JPEG/WAV/...) here; the
    * signature — Iterator[Row] → Iterator[Row], batch-local, no driver
    * round-trip — is the real contract.
    */
  object StubDecoder extends Serializable {
    /** The exact integer lane accumulators — the source of truth both
      * decode surfaces share.
      */
    def decodeLaneBatch(rows: Iterator[Row], dim: Int): Iterator[Row] =
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("asset_id"))
        val bytes = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.empty)
        val lanes = new Array[Long](dim)
        var i = 0
        while (i < bytes.length) {
          lanes(i % dim) += (bytes(i) & 0xff)
          i += 1
        }
        Row(id, lanes.toSeq)
      }

    def decodeBatch(rows: Iterator[Row], dim: Int): Iterator[Row] =
      decodeLaneBatch(rows, dim).map(r =>
        Row(r.getLong(0), r.getAs[Seq[Long]](1).map(_.toFloat)))
  }

  /** Decode assets to features via mapPartitions (partition-local batches,
    * the Scala analogue of mapInPandas).
    */
  def decodeFeatures(assets: DataFrame, dim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val encoder = RowEncoder.encoderFor(featureSchema)
    assets.select("asset_id", "payload")
      .mapPartitions(rows => StubDecoder.decodeBatch(rows, dim))(encoder)
  }

  /** Integer-exact decoded lanes — [[StubDecoder]]'s Long accumulators
    * WITHOUT the trip through [[featureSchema]]'s Float element type. The
    * perceptual-hash path must compare exact integers: a Float lane holds
    * 24 mantissa bits, so a lane sum past 2²⁴ (≈ a 4–8 MB payload at
    * dim=32) would round, and a rounded lane can flip an aHash/dHash bit
    * against the DuckDB twin's exact arithmetic. A real decoder slots in
    * here by quantizing its grayscale cells to integers (the standard
    * pHash pipelines hash 8-bit cells anyway).
    */
  val laneSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("lane", ArrayType(LongType, containsNull = false)),
  ))

  def decodeLanes(assets: DataFrame, dim: Int): DataFrame = {
    val encoder = RowEncoder.encoderFor(laneSchema)
    assets.select("asset_id", "payload")
      .mapPartitions(rows => StubDecoder.decodeLaneBatch(rows, dim))(encoder)
  }

  /** Resize assets to at most `targetBytes` of payload via mapPartitions —
    * the batch-local transcode contract (a real implementation decodes,
    * resamples, re-encodes here; the stub truncates deterministically so
    * the plumbing is oracle-checkable). Metadata tracks the new size;
    * payloads never visit the driver.
    */
  def resizeStub(assets: DataFrame, targetBytes: Int): DataFrame = {
    val schema = assets.schema
    val encoder = RowEncoder.encoderFor(schema)
    assets.mapPartitions { rows =>
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.empty)
        val resized = payload.take(targetBytes)
        val meta = r.getAs[Row]("meta")
        Row(r.getAs[Long]("asset_id"), r.getAs[String]("media_type"), resized,
          Row(resized.length.toLong, meta.getAs[String]("source")))
      }
    }(encoder)
  }

  /** One row per sampled frame: the payload is cut into fixed-size
    * `frameBytes` frames and every `everyN`-th frame is kept — the
    * video-frame-sampling shape (a real decoder yields actual frames; the
    * fixed-byte cut is the deterministic stand-in). Exploding inside
    * mapPartitions keeps the codec batch-local while the output stays a
    * flat relational table downstream ops can join/aggregate.
    */
  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = false),
  ))

  def frameSample(assets: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val encoder = RowEncoder.encoderFor(frameSchema)
    assets.select("asset_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty)
        payload.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % everyN == 0 =>
            Row(id, idx.toLong, frame)
        }
      }
    }(encoder)
  }

  /** Perceptual image hash over the decoded feature lanes — aHash /
    * dHash (public knowledge: average hash and difference hash, the
    * standard near-duplicate-image fingerprints). A real decoder yields
    * `dim` grayscale cells; the harness's [[StubDecoder]] yields `dim`
    * integer byte-histogram lanes — the hash definition is identical
    * either way, which is exactly the swap-in-a-real-decoder contract:
    *
    *  - `ahash`: bit j set iff lane j is above the mean lane — computed
    *    as `lane_j · dim > Σ lanes` (integer cross-multiply, no float
    *    division anywhere, so the DuckDB twin reproduces it bit-exactly
    *    — q47's hex-exact byte convention extended to bits). `dim` bits.
    *  - `dhash`: bit j set iff lane j > lane j+1 (horizontal gradient
    *    sign). `dim − 1` bits.
    *
    * Lane sums are exact integers end-to-end — the hash path rides
    * [[decodeLanes]]'s Long lanes, never [[featureSchema]]'s Float
    * representation (whose 24-bit mantissa would round lane sums on
    * multi-MB payloads and could flip a bit vs the twin) — so both
    * hashes are deterministic pure arithmetic: one narrow pass after
    * decode, no shuffle, no payload byte leaves its partition. Returns
    * (asset_id, phash). Null payloads hash the empty lane vector
    * (phash 0), same contract as decode.
    */
  def perceptualHashes(assets: DataFrame, dim: Int = 32,
      kind: String = "ahash"): DataFrame =
    withPhash(decodeLanes(assets, dim)
      .select(col("asset_id"), col("lane").as("__l")), dim, kind)
      .select("asset_id", "phash")

  /** The aHash/dHash bit arithmetic over a `__l` integer-lane column —
    * shared by the whole-asset hash and the per-frame hash. Bit
    * positions are compile-time constants, so the hash unrolls into
    * one flat codegen'd expression — element_at on ArrayData is O(1)
    * indexed access. Σ lanes rides its OWN projection: CollapseProject
    * never inlines a non-cheap alias referenced by all dim bit terms,
    * so the aggregate evaluates once per row, not once per bit.
    * Adds `phash`, drops the working columns, keeps everything else.
    */
  private def withPhash(lanes: DataFrame, dim: Int,
      kind: String): DataFrame = {
    require(dim >= 2 && dim <= 62, "perceptual hash needs 2..62 lanes")
    require(kind == "ahash" || kind == "dhash",
      s"unknown perceptual hash kind '$kind' (ahash | dhash)")
    val prepared =
      if (kind == "ahash")
        lanes.withColumn("__tot",
          aggregate(col("__l"), lit(0L), (a, x) => a + x))
      else lanes
    val bit: Int => Column =
      if (kind == "ahash")
        j => element_at(col("__l"), j + 1) * dim > col("__tot")
      else
        j => element_at(col("__l"), j + 1) > element_at(col("__l"), j + 2)
    val nBits = if (kind == "ahash") dim else dim - 1
    prepared.withColumn("phash",
        (0 until nBits).map(j =>
          when(bit(j), lit(1L << j)).otherwise(lit(0L))).reduce(_ + _))
      .drop("__l", "__tot")
  }

  /** Per-FRAME perceptual hashes: every [[frameSample]] frame through
    * the same integer lane arithmetic as [[perceptualHashes]] — the
    * frame stream a video-sequence fingerprint builds on. Frames ride
    * the decode pass under the packed (asset ‖ idx) long (the
    * [[frameDedupStats]]/line-dedup 39/24 pack, unpacked after), so the
    * batch decoder contract is untouched. Returns
    * (asset_id, frame_idx, phash); assets with empty/null payloads
    * yield no rows (no frames to hash).
    */
  def framePerceptualHashes(assets: DataFrame, frameBytes: Int,
      dim: Int = 8, kind: String = "ahash", everyN: Int = 1): DataFrame = {
    val packed = frameSample(assets, frameBytes, everyN)
      .select({
        val id = col("asset_id")
        when(id.isNull || id < 0 || id >= lit(1L << 39) ||
            col("frame_idx") >= lit(1 << 24),
          raise_error(lit("framePerceptualHashes: frame outside the " +
            "packable range (numeric asset id in [0, 2^39), frame idx " +
            "< 2^24)")).cast(LongType))
          .otherwise(shiftleft(id, 24) + col("frame_idx")).as("asset_id")
      }, col("frame").as("payload"))
    withPhash(decodeLanes(packed, dim)
        .select(col("asset_id"), col("lane").as("__l")), dim, kind)
      .select(shiftrightunsigned(col("asset_id"), 24).as("asset_id"),
        (col("asset_id") % lit(1 << 24)).as("frame_idx"), col("phash"))
  }

  /** FRAME-SEQUENCE near-duplicate pairs — the video-shaped member of
    * the multimodal dedup family: two clips pair when they share a run
    * of `k` consecutive near-identical frames, even inside otherwise
    * different footage (the standard video-copy-detection shape:
    * per-frame perceptual hashes, shingled along time, MinHash/LSH over
    * the shingle sets). Implementation is pure reuse: the per-frame
    * hash stream renders as a space-joined decimal string in frame
    * order ([[frameSequenceDocs]]) and feeds
    * [[Dedup.minhashLshPairs]] verbatim — a k-frame window IS a k-token
    * shingle, so the banded candidate generation, its linear scale
    * shape, and the q32 oracle conventions all carry over unchanged.
    * Candidates shuffle on (band, key); never all-pairs.
    */
  def frameSequenceDocs(assets: DataFrame, frameBytes: Int,
      dim: Int = 8, kind: String = "ahash"): DataFrame =
    framePerceptualHashes(assets, frameBytes, dim, kind)
      .groupBy("asset_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("frame_idx"), col("phash")))),
        x => x.getField("phash").cast(StringType)), " ")
        .as("phash_stream"))

  def frameSequenceNearDupPairs(assets: DataFrame, frameBytes: Int,
      k: Int = 3, dim: Int = 8, kind: String = "ahash",
      bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    Dedup.minhashLshPairs(frameSequenceDocs(assets, frameBytes, dim, kind),
      bands, rowsPerBand, shingleN = k,
      idCol = "asset_id", textCol = "phash_stream")

  /** [[frameSequenceNearDupPairs]] with the exact verify stage: the
    * banded candidates pass through [[Dedup.minhashLshVerifiedPairs]]'
    * candidate-restricted Jaccard over the k-frame shingle sets, so
    * each surviving pair carries its TRUE shared-window fraction —
    * precision the raw band collisions can't promise, at verify cost
    * bounded by the candidate set, never all-pairs. Returns
    * (id_a, id_b, jaccard ≥ threshold).
    */
  def frameSequenceNearDupVerified(assets: DataFrame, frameBytes: Int,
      threshold: Double, k: Int = 3, dim: Int = 8, kind: String = "ahash",
      bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    Dedup.minhashLshVerifiedPairs(
      frameSequenceDocs(assets, frameBytes, dim, kind), threshold,
      bands, rowsPerBand, shingleN = k,
      idCol = "asset_id", textCol = "phash_stream")

  /** INCREMENTAL frame-level storage dedup — the ingest path of the
    * dedup store ([[frameDedupStats]] is the retrospective corpus
    * stat; this absorbs an arriving batch against the store's
    * persistent DIGEST INDEX, the [[Dedup.lineIndexAddBatch]] shape on
    * frames): a batch frame whose digest the index already holds is a
    * duplicate (its canonical copy is stored); the fresh remainder
    * dedups within the batch by the packed (asset ‖ idx) window min
    * (first occurrence stores, later copies dedup), and ALL fresh
    * digests fold into the returned delta — append-only state, the
    * family pattern. Returns (stats, freshDigests): per-asset
    * (n_frames, stored_frames, dup_frames, dup_bytes) and the batch's
    * distinct new digests.
    *
    * Scale shape per batch: one in-partition cut+digest pass, a
    * batch-sized anti-join probe against the index (a deployment
    * buckets the index on the digest), ONE digest exchange for the
    * within-batch window, a per-asset aggregate. The index never
    * rewrites; work is O(batch frames + probe), the store is never
    * rescanned.
    */
  def frameIndexAddBatch(index: DataFrame, assets: DataFrame,
      frameBytes: Int): (DataFrame, DataFrame) = {
    val keyed = frameSample(assets, frameBytes, everyN = 1)
      .select(col("asset_id"), col("frame_idx"),
        octet_length(col("frame")).cast(LongType).as("__fb"),
        md5(lower(hex(col("frame")))).as("__k"))
      .withColumn("__o", {
        val id = col("asset_id").cast(LongType)
        when(id.isNull || id < 0 || id >= lit(1L << 39) ||
            col("frame_idx") >= lit(1 << 24),
          raise_error(lit("frameIndexAddBatch: occurrence outside the " +
            "packable range (numeric asset id in [0, 2^39), frame idx " +
            "< 2^24)")).cast(LongType))
          .otherwise(shiftleft(id, 24) + col("frame_idx"))
      })
      // seen digests are duplicates wholesale; fresh frames resolve
      // ownership inside the one digest exchange, like frameDedupStats.
      // The index projection is distinct()ed before the probe join: an
      // index carrying duplicate digests (overlapping replay deltas
      // unioned without distinct) must mark rows seen, not multiply
      // them — the same immunity the line family's anti-join probe has
      .join(index.select(col("digest").as("__k")).distinct()
          .withColumn("__seen", lit(1)),
        Seq("__k"), "left")
    val occ = keyed.withColumn("__own",
        min(when(col("__seen").isNull, col("__o")))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("__k"))))
      .withColumn("__stored",
        col("__seen").isNull && col("__o") === col("__own"))
    val per = occ.groupBy("asset_id").agg(
      count(lit(1)).as("n_frames"),
      sum(when(col("__stored"), 1L).otherwise(0L)).as("stored_frames"),
      sum(when(!col("__stored"), 1L).otherwise(0L)).as("dup_frames"),
      sum(when(!col("__stored"), col("__fb")).otherwise(0L))
        .as("dup_bytes"))
    val stats = assets.select(col("asset_id"))
      .join(per, Seq("asset_id"), "left")
      .select(col("asset_id"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("stored_frames"), lit(0L)).as("stored_frames"),
        coalesce(col("dup_frames"), lit(0L)).as("dup_frames"),
        coalesce(col("dup_bytes"), lit(0L)).as("dup_bytes"))
    val fresh = occ.where(col("__seen").isNull)
      .select(col("__k").as("digest")).distinct()
    (stats, fresh)
  }

  /** CROSS-MODAL pair dedup — the image-text (LAION-style) member of
    * the dedup family: a row is an (image, caption) PAIR, and two rows
    * duplicate each other only when BOTH channels agree — captions are
    * near-dup (two-stage MinHash with exact-Jaccard verification,
    * [[Dedup.minhashLshVerifiedPairs]]) AND images are
    * perceptual-hash-near-dup ([[imageNearDupPairs]], banded exact
    * Hamming). The conjunction is what pair-dataset curation needs:
    * the same stock photo under different captions is NOT a dup (the
    * captions carry the training signal), and the same boilerplate
    * caption on different images is NOT a dup either — only a
    * both-channels match is redundant. Returns
    * (id_a, id_b, jaccard, hamming), id_a < id_b.
    *
    * `pairs` carries (`asset_id`, `caption` string, `payload` binary).
    * Scale shape: each channel is its own banded/verified linear
    * pipeline (never all-pairs; the caption verify stage is
    * candidate-bounded); the conjunction is one equi-join of two
    * candidate-sized pair sets on (id_a, id_b).
    */
  def crossModalDupPairs(pairs: DataFrame, threshold: Double,
      maxHamming: Int = 3, dim: Int = 32, kind: String = "ahash",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      hamBands: Int = 4): DataFrame = {
    val cap = Dedup.minhashLshVerifiedPairs(
      pairs.select(col("asset_id"), col("caption")), threshold,
      bands, rowsPerBand, shingleN,
      idCol = "asset_id", textCol = "caption")
    val img = imageNearDupPairs(pairs, maxHamming, dim, hamBands, kind)
    cap.join(img.select(col("id_a"), col("id_b"), col("hamming")),
        Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("jaccard"), col("hamming"))
  }

  /** [[crossModalDupPairs]] closed to the keep-one decision: the
    * conjunction pair graph walks to connected components via the
    * modality-agnostic large-star/small-star machinery
    * ([[Dedup.nearDupClusters]], O(log n) rounds), min asset id per
    * component is the canonical pair, every other member drops —
    * exactly the q189 image arc with the cross-modal edge rule.
    * Returns one row per input pair row: (asset_id, root, keep).
    */
  def crossModalDedupClusters(pairs: DataFrame, threshold: Double,
      maxHamming: Int = 3, dim: Int = 32, kind: String = "ahash",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      hamBands: Int = 4): DataFrame =
    Dedup.nearDupClusters(
        pairs.select(col("asset_id").as("doc_id")),
        crossModalDupPairs(pairs, threshold, maxHamming, dim, kind,
          bands, rowsPerBand, shingleN, hamBands)
          .select(col("id_a"), col("id_b")))
      .select(col("doc_id").as("asset_id"), col("root"),
        (col("doc_id") === col("root")).as("keep"))

  /** Image near-duplicate pairs: perceptual hashes within `maxHamming`
    * bits, via the same banded exact-Hamming machinery as the text
    * SimHash path ([[Dedup.bandedHammingPairs]]) — candidates shuffle on
    * (band, key), linear in corpus size, recall exactly 1; never an
    * all-pairs join. Returns (id_a, id_b, hamming), id_a < id_b.
    */
  def imageNearDupPairs(assets: DataFrame, maxHamming: Int = 2,
      dim: Int = 32, bands: Int = 4, kind: String = "ahash"): DataFrame = {
    val nBits = if (kind == "ahash") dim else dim - 1
    Dedup.bandedHammingPairs(perceptualHashes(assets, dim, kind),
      "asset_id", "phash", nBits, bands, maxHamming)
  }

  /** Frame-level STORAGE dedup across assets — fixed-size chunking
    * (the classic dedup-store design: cut payloads into fixed blocks,
    * key each block by a content digest, store one canonical copy per
    * distinct block — public knowledge from every dedup filesystem /
    * object store). Each payload cuts into `frameBytes` frames
    * ([[frameSample]] at everyN = 1, so the cut IS the storage layout);
    * a frame's canonical copy is its corpus-global minimum occurrence
    * under the packed (asset_id ‖ frame_idx) order — the line-dedup
    * packing trick, so ownership resolves as a plain `min` over one
    * long INSIDE the digest exchange (a window min partitioned by the
    * digest: the comparison never leaves the digest group, so a packed
    * value colliding across DIFFERENT digests — e.g. duplicate asset
    * ids — can neither mark a wrong row canonical nor multiply rows,
    * the hazard the earlier join-back-on-the-pack form carried).
    * Returns one row per asset: total frames, frames it canonically
    * owns, duplicate occurrences, and the bytes dedup would reclaim
    * from it.
    *
    * Scale shape: one digest pass (no payload byte leaves its
    * partition), ONE corpus-scale exchange — the digest shuffle, whose
    * sort-within-partition the window pays in place of the old
    * join-back exchange — then one per-asset aggregate. Assets with
    * empty/null payloads report zeros.
    */
  def frameDedupStats(assets: DataFrame, frameBytes: Int): DataFrame = {
    val keyed = frameSample(assets, frameBytes, everyN = 1)
      .select(col("asset_id"), col("frame_idx"),
        octet_length(col("frame")).cast(LongType).as("__fb"),
        md5(lower(hex(col("frame")))).as("__k"))
      .withColumn("__o", {
        val id = col("asset_id").cast(LongType)
        when(id.isNull || id < 0 || id >= lit(1L << 39) ||
            col("frame_idx") >= lit(1 << 24),
          raise_error(lit("frameDedupStats: occurrence outside the " +
            "packable range (numeric asset id in [0, 2^39), frame idx " +
            "< 2^24)")).cast(LongType))
          .otherwise(shiftleft(id, 24) + col("frame_idx"))
      })
    val occ = keyed.withColumn("__own",
      min(col("__o")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("__k"))))
      .withColumn("__own",
        when(col("__o") === col("__own"), col("__own")))
    val per = occ.groupBy("asset_id").agg(
      count(lit(1)).as("n_frames"),
      sum(when(col("__own").isNotNull, 1L).otherwise(0L)).as("own_frames"),
      sum(when(col("__own").isNull, 1L).otherwise(0L)).as("dup_frames"),
      sum(when(col("__own").isNull, col("__fb")).otherwise(0L))
        .as("dup_bytes"))
    assets.select(col("asset_id"))
      .join(per, Seq("asset_id"), "left")
      .select(col("asset_id"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("own_frames"), lit(0L)).as("own_frames"),
        coalesce(col("dup_frames"), lit(0L)).as("dup_frames"),
        coalesce(col("dup_bytes"), lit(0L)).as("dup_bytes"))
  }

  /** Metadata-only projection — must prune the payload column at the scan
    * (verified in tests via the physical plan's ReadSchema).
    */
  def metadataSummary(assets: DataFrame): DataFrame =
    assets.groupBy(col("media_type"))
      .agg(count("*").as("n_assets"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))

  /** Fixed-length image placeholder span: the id array an IMAGE doc
    * contributes to a packed training sequence — `placeholderId`
    * repeated once per ViT patch, patch count derived from the STORED
    * dims as floor(width/patchSize) × floor(height/patchSize) (partial
    * patches drop, the standard ViT convention). The trainer later
    * splices patch embeddings over the placeholder span; pick an id
    * the text tokenizer can never emit (the byte family reserves id 0
    * exactly for this — unreachable at text-encode time). Pure
    * arithmetic on metadata columns: no payload read, no decode.
    */
  def imagePlaceholderIds(width: Column, height: Column, patchSize: Int,
      placeholderId: Int = 0): Column = {
    require(patchSize >= 1, "imagePlaceholderIds needs a positive patch size")
    array_repeat(lit(placeholderId),
      ((width / patchSize).cast(IntegerType) *
        (height / patchSize).cast(IntegerType)))
  }

  /** MULTIMODAL sequence packing — interleaved text/image docs through
    * the one token packer (`Corpus.packSequences` +
    * `materializeTokenPacks`), which is modality-agnostic by
    * construction: every doc arrives as (shard, id, ids array,
    * modality), text docs carrying tokenizer ids and image docs a
    * [[imagePlaceholderIds]] span, and the pack arithmetic, the flat
    * `pack_ids` stream, and the `doc_offsets` boundary discipline are
    * EXACTLY the text pipeline's (q144) — a boundary delineates a
    * segment regardless of what fills it, so attention/loss masking and
    * the per-segment audit (q162) carry over unchanged. On top of the
    * standard pack columns each pack reports its modality mix
    * (`n_text_docs`/`n_image_docs`/`text_tokens`/`image_patches`),
    * computed IN the same pack shuffle as the stream itself — one extra
    * aggregate, no second pass, no join.
    *
    * At 100 TB nothing changes: the mix columns are per-pack integers,
    * the pack state stays budget-bounded, and image docs are CHEAPER
    * than text docs through the shuffle (a placeholder span compresses
    * to its length; the payload bytes never enter the packer at all —
    * dims are metadata).
    */
  def packMultimodalSequences(docs: DataFrame, shardCol: String,
      idCol: String, idsCol: String, modalityCol: String,
      tokenBudget: Long): DataFrame = {
    val packed = Corpus.packSequences(docs, shardCol, idCol,
      size(col(idsCol)).cast(LongType), tokenBudget)
    Corpus.materializeTokenPacks(packed, shardCol, idCol, idsCol,
      extraAggs = Seq(
        sum(when(col(modalityCol) === "text", lit(1L)).otherwise(0L))
          .as("n_text_docs"),
        sum(when(col(modalityCol) === "image", lit(1L)).otherwise(0L))
          .as("n_image_docs"),
        sum(when(col(modalityCol) === "text", col("n_tokens"))
          .otherwise(0L)).as("text_tokens"),
        sum(when(col(modalityCol) === "image", col("n_tokens"))
          .otherwise(0L)).as("image_patches")))
  }
}
