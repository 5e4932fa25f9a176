package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The Spark-side shape is real — schema, partition-parallel batch
  * processing via `mapPartitions` (the Scala analog of `mapInPandas`:
  * iterator-of-batches in, iterator out, no driver materialization),
  * deterministic output contract — while the actual media decode is a
  * clearly-marked STUB (no codec libs in this environment). Swapping
  * [[MediaDecode.decodeStub]] for a real JNI/codec call changes nothing
  * about the distributed plan.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(
      docId: Long, byteLen: Int, format: String,
      width: Int, height: Int, nFrames: Int, durationMs: Long)

  object MediaDecode {
    /** STUB decode: derives deterministic pseudo-metadata from the doc id
      * and payload byte length (stands in for an image/video header
      * parse). Real implementation would parse the container here — this
      * is the only function to replace.
      *
      * The derivation is plain modular arithmetic on (docId, byteLen)
      * rather than an opaque byte fold, so the SAME formulas are
      * expressible in ANSI SQL — the frame-sample and resize plans built
      * on it get a real differential oracle (value check), not just a
      * rows-only one. */
    def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
      val len = payload.length.toLong
      // floorMod, not %: ids may be negative (hash-derived) or overflow
      // the multiply — truncated % would go negative (MatchError on the
      // format switch, negative widths). SQL form: ((x % m) + m) % m.
      def m(x: Long, mod: Long): Long = java.lang.Math.floorMod(x, mod)
      val h = m(docId * 131071L + len * 8191L, 1000003L)
      val fmt = (m(h, 3L): @unchecked) match {
        case 0L => "jpeg"; case 1L => "png"; case 2L => "webm"
      }
      MediaMeta(docId, payload.length, fmt,
        width = (64L + m(docId * 37L + len * 11L, 1024L)).toInt,
        height = (64L + m(docId * 59L + len * 7L, 1024L)).toInt,
        nFrames = if (fmt == "webm") (1L + m(docId * 17L + len, 300L)).toInt else 1,
        durationMs = if (fmt == "webm") m(docId * 97L + len * 13L, 60000L) else 0L)
    }
  }

  /** Attach a binary payload column (here: utf-8 of text — in production
    * the storage layer supplies real media bytes). */
  def withPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("doc_id"),
      col(srcCol).cast(BinaryType).as("payload"))

  /** Batch decode: one partition = one iterator pass, constant memory —
    * this is the mapInPandas batch shape. Output is a typed Dataset. */
  def decode(payloads: DataFrame): Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .mapPartitions { (rows: Iterator[Row]) =>
        rows.map(r => MediaDecode.decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
  }

  /** Frame-sample plan for video rows: every `everyMs` milliseconds, at
    * most `maxFrames` — returns (doc_id, frame_idx, ts_ms) rows. Pure
    * expression fan-out (sequence + explode), no UDF. */
  def frameSamplePlan(meta: Dataset[MediaMeta], everyMs: Long,
      maxFrames: Int): DataFrame =
    meta.toDF()
      .filter(col("nFrames") > 1)
      .select(col("docId").as("doc_id"),
        explode(slice(sequence(lit(0L), col("durationMs"), lit(everyMs)),
          1, maxFrames)).as("ts_ms"))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast(IntegerType))

  /** Resize stub: records the target size in metadata; a real kernel would
    * transform payload bytes per partition exactly like [[decode]]. */
  def resizePlan(meta: Dataset[MediaMeta], maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim).cast(DoubleType) / greatest(col("width"), col("height")))
    meta.toDF().select(
      col("docId").as("doc_id"),
      col("width"), col("height"),
      floor(col("width") * scale + 0.5).cast(IntegerType).as("out_width"),
      floor(col("height") * scale + 0.5).cast(IntegerType).as("out_height"))
  }

  /** Tile plan: one row per `tile×tile` grid cell of each image —
    * the fan-out step a patch-based vision pipeline (ViT tiling,
    * super-resolution shards, OCR blocks) runs before per-tile decode.
    * Pure integer arithmetic on the metadata: `nx·ny` tiles with
    * clamped pixel rectangles (`x1 = min(x0 + tile, width)`), emitted
    * via an explode — the FAN-OUT is declared in the plan (Spark sizes
    * splits after it), never materialized driver-side. Tile ids run
    * row-major; a real kernel maps payload bytes per tile exactly like
    * [[decode]]. */
  def tilePlan(meta: Dataset[MediaMeta], tile: Int = 256): DataFrame = {
    require(tile >= 1, s"tile must be >= 1, got $tile")
    val nx = ((col("width") + tile - 1) / tile).cast(IntegerType)
    val ny = ((col("height") + tile - 1) / tile).cast(IntegerType)
    meta.toDF()
      .select(col("docId").as("doc_id"), col("width"), col("height"),
        nx.as("__nx"), ny.as("__ny"))
      .select(col("doc_id"), col("width"), col("height"),
        (col("__nx") * col("__ny")).as("n_tiles"), col("__nx"),
        explode(sequence(lit(0), col("__nx") * col("__ny") - 1))
          .as("tile_id"))
      .select(col("doc_id"), col("width"), col("height"), col("n_tiles"),
        col("tile_id"),
        (pmod(col("tile_id"), col("__nx")) * tile).as("x0"),
        ((col("tile_id") / col("__nx")).cast(IntegerType) * tile).as("y0"))
      .select(col("doc_id"), col("width"), col("height"), col("n_tiles"),
        col("tile_id"), col("x0"), col("y0"),
        least(col("x0") + tile, col("width")).as("x1"),
        least(col("y0") + tile, col("height")).as("y1"))
  }

  /** Scene-cut detection over per-frame signatures: a cut is a frame
    * whose signature differs from the previous frame's (per doc, in
    * frame order); reports per doc (n_frames, n_cuts, n_scenes,
    * mean_scene_frames). Generic over the signature column — a real
    * pipeline feeds `dhash64(frame_bytes)` per sampled frame (the
    * [[perceptualNearDups]] kernel applied per frame); the gate feeds
    * a deterministic stub signature, exercising the same plan. Static
    * videos (all frames one signature) report 0 cuts / 1 scene — the
    * static-content screen.
    *
    * Scale: ONE doc-keyed window pass over the frames table + a
    * map-side-combinable per-doc aggregate; mean_scene_frames is one
    * double division of exact counts. */
  def sceneCuts(frames: DataFrame, idCol: String, orderCol: String,
      sigCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(orderCol))
    frames
      .withColumn("__prev", lag(col(sigCol), 1).over(w))
      .withColumn("__cut",
        (col("__prev").isNotNull &&
          col(sigCol) =!= col("__prev")).cast("long"))
      .groupBy(col(idCol).as("doc_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("__cut")).as("n_cuts"))
      .select(col("doc_id"), col("n_frames"), col("n_cuts"),
        (col("n_cuts") + 1L).as("n_scenes"),
        (col("n_frames").cast(DoubleType) /
          (col("n_cuts") + 1L).cast(DoubleType)).as("mean_scene_frames"))
  }

  import org.apache.spark.sql.graft.NativeFunctions

  /** Content-defined chunk postings of a binary column: one row per
    * chunk, `(id, chunk_hash, off, len)` — the storage-dedup view of a
    * payload corpus (LBFS/Rabin CDC via a codegen'd buzhash kernel:
    * boundaries are a local rolling-hash decision, so a payload whose
    * encoding inserts/splices bytes still shares every re-synchronized
    * chunk with its original, which fixed-size chunking cannot).
    * Explode is narrow — a map-only pass; join/group the postings on
    * `chunk_hash` for cross-payload sharing. */
  def cdcPostings(df: DataFrame, idCol: String, binCol: String,
      minSize: Int = 64, avgBits: Int = 8, maxSize: Int = 1024): DataFrame =
    df.select(col(idCol).as("id"),
        explode(NativeFunctions.contentChunks(col(binCol),
          minSize, avgBits, maxSize)).as("__c"))
      .select(col("id"), col("__c.hash").as("chunk_hash"),
        col("__c.off").as("off"), col("__c.len").as("len"))

  /** Corpus storage-dedup report over content-defined chunks: ONE row —
    * payload count, total bytes, chunk occurrences, distinct chunks
    * (identity = (hash, len): a 64-bit-collision pair would also need
    * equal lengths to alias), distinct bytes, and the dedup ratio
    * `total/distinct` (≥ 1; 2.0 ≈ half the corpus is redundant at chunk
    * granularity). Shuffle carries (hash, len) pairs only — 12 B per
    * CHUNK (not per byte), map-side combined; payload bytes never leave
    * their partition. */
  def storageDedupReport(df: DataFrame, idCol: String, binCol: String,
      minSize: Int = 64, avgBits: Int = 8, maxSize: Int = 1024): DataFrame = {
    val posts = cdcPostings(df, idCol, binCol, minSize, avgBits, maxSize)
    val distinct = posts.groupBy(col("chunk_hash"), col("len"))
      .agg(count(lit(1)).as("occ"))
      .agg(count(lit(1)).as("distinct_chunks"),
        sum(col("len").cast(LongType)).as("distinct_bytes"),
        sum(col("len").cast(LongType) * col("occ")).as("total_bytes"),
        sum(col("occ")).as("n_chunks"))
    val payloads = df.agg(count(lit(1)).as("n_payloads"))
    payloads.crossJoin(distinct) // two one-row frames
      .select(col("n_payloads"), col("total_bytes"), col("n_chunks"),
        col("distinct_chunks"), col("distinct_bytes"),
        round(col("total_bytes").cast(DoubleType) /
          col("distinct_bytes"), 4).as("dedup_ratio"))
  }

  /** Binary near-duplicate pairs at CHUNK granularity: payloads sharing
    * ≥ `threshold` of their bytes (byte-weighted Jaccard over distinct
    * content-defined chunks). Because CDC boundaries re-synchronize
    * across byte splices, a payload with a prepended header or an
    * in-place edit still pairs with its original — the binary analogue
    * of text near-dup, with no decode step (works on opaque media).
    *
    * Shape: postings (12 B/chunk identity) → ubiquity cap (chunks in
    * more than `maxChunkDocs` payloads are boilerplate — container
    * magic, shared headers — carrying quadratic pair cost and no
    * discriminative signal; the same skew-guard role as `capBuckets` in
    * the text family) → equi-join on chunk identity → per-pair shared
    * bytes → exact byte-Jaccard filter. Payload bytes never shuffle.
    * Returns (id_a, id_b, shared_bytes, jaccard_bytes), id_a < id_b. */
  /** Perceptual near-duplicate pairs via 64-bit dHash — the
    * re-encoding-robust complement of [[binaryNearDups]]: CDC chunking
    * finds payloads sharing raw BYTES, so a JPEG re-encoded as PNG (or
    * re-compressed at another quality) shares nothing; dHash fingerprints
    * the coarse content gradient (public dHash recipe: downsample to a
    * 9×8 grid, hash the adjacent-cell compares), so re-encodes and mild
    * edits land within a few Hamming bits. Decode-to-luma is the one
    * STUBbed step ([[org.apache.spark.sql.graft.PerceptualKernels]]);
    * the hashing, banding, skew guard, and pair join are the real
    * 100 TB plan.
    *
    * Scale shape — never all-pairs: the hash splits into `bands`
    * equal bit-slices; by pigeonhole, any pair within `maxHamming <
    * bands` bits agrees on at least one slice, so candidates come from
    * equi-joining (band_idx, band_val) buckets, `capBuckets`-guarded
    * against degenerate buckets (uniform payloads — all-white frames —
    * collapse to one hash), then exact-verified with one
    * `bit_count(xor)`. 8 B per payload per band shuffles; payload bytes
    * never leave the scan. Returns (id_a, id_b, hamming), id_a < id_b.
    */
  def perceptualNearDups(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 6, bands: Int = 8,
      maxBucketSize: Int = 256): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"guaranteed recall needs maxHamming < bands (pigeonhole), got " +
        s"maxHamming=$maxHamming bands=$bands")
    val bits = 64 / bands
    val mask = (1L << bits) - 1L
    val sigs = df.select(col(idCol).as("id"),
        NativeFunctions.dhash64(col(binCol)).as("__ph"))
      .filter(col("__ph").isNotNull)
    val banded = sigs.select(col("id"), col("__ph"), posexplode(array(
        (0 until bands).map(b => call_function("shiftrightunsigned",
          col("__ph"), lit(b * bits)).bitwiseAND(lit(mask))): _*)))
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_val"))
    val pruned = Dedup.capBuckets(banded,
      Seq("band_idx", "band_val"), maxBucketSize)
    Dedup.bucketPairs(pruned, Seq("band_idx", "band_val"),
        payload = Seq("__ph"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        call_function("bit_count",
          col("a.__ph").bitwiseXOR(col("b.__ph"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  def binaryNearDups(df: DataFrame, idCol: String, binCol: String,
      threshold: Double = 0.5,
      minSize: Int = 64, avgBits: Int = 8, maxSize: Int = 1024,
      maxChunkDocs: Int = 256): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"bad threshold $threshold")
    val posts = cdcPostings(df, idCol, binCol, minSize, avgBits, maxSize)
      .select(col("id"), col("chunk_hash"), col("len")).distinct()
    val bytesPerId = posts.groupBy(col("id"))
      .agg(sum(col("len").cast(LongType)).as("__bytes"))
    val freq = posts.groupBy(col("chunk_hash"), col("len"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxChunkDocs)
      .select(col("chunk_hash"), col("len"))
    val rare = posts.join(freq, Seq("chunk_hash", "len"), "left_semi")
    val pairs = rare.as("a").join(rare.as("b"),
        col("a.chunk_hash") === col("b.chunk_hash") &&
          col("a.len") === col("b.len") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.len").cast(LongType)).as("shared_bytes"))
    pairs
      .join(bytesPerId.select(col("id").as("id_a"), col("__bytes").as("__ba")),
        Seq("id_a"))
      .join(bytesPerId.select(col("id").as("id_b"), col("__bytes").as("__bb")),
        Seq("id_b"))
      .withColumn("jaccard_bytes",
        col("shared_bytes").cast(DoubleType) /
          (col("__ba") + col("__bb") - col("shared_bytes")))
      .filter(col("jaccard_bytes") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared_bytes"),
        round(col("jaccard_bytes"), 4).as("jaccard_bytes"))
  }

  /** Windowed energy profile of audio-like payloads: one row per
    * (payload, window) with the EXACT integer squared-amplitude sum
    * (bytes read as unsigned 8-bit PCM centered at 128 — the stub
    * "decode"; a real codec's sample buffer slots into the same
    * kernel). The loudness/activity timeline feeding [[silenceTrim]],
    * clipping detection, and energy-based segment sampling.
    *
    * Scale: the kernel is one codegen'd pass over payload bytes inside
    * the scan stage; the explode emits len/window rows per payload —
    * the profile table is windows-sized, and nothing shuffles until
    * the caller aggregates it. */
  def audioEnergy(df: DataFrame, idCol: String, binCol: String,
      windowBytes: Int = 256): DataFrame = {
    import org.apache.spark.sql.graft.NativeFunctions
    df.select(col(idCol).as("doc_id"),
        explode(NativeFunctions.audioEnergyWindows(col(binCol),
          windowBytes)).as("__w"))
      .select(col("doc_id"), col("__w.win").as("win"),
        col("__w.n").as("n_bytes"), col("__w.sum_sq").as("sum_sq"))
  }

  /** Silence trim: per payload, the first/last ACTIVE window (a window
    * is active iff `sum_sq ≥ meanSqThreshold · n` — the integer form of
    * "mean square amplitude above threshold", no float compare) and the
    * trimmed byte length of the active span. The lead-in/lead-out
    * cutter of an audio-curation pipeline; all-silent payloads report 0
    * active windows and NULL span columns rather than disappearing.
    *
    * Scale: one kernel pass + array HOFs per row, zero shuffle — the
    * span arithmetic runs on the windows array (len/window elements)
    * inside codegen. */
  def silenceTrim(df: DataFrame, idCol: String, binCol: String,
      windowBytes: Int = 256, meanSqThreshold: Long = 100L): DataFrame = {
    import org.apache.spark.sql.graft.NativeFunctions
    val wins = NativeFunctions.audioEnergyWindows(col(binCol), windowBytes)
    df.select(col(idCol).as("doc_id"), wins.as("__wins"))
      .withColumn("__active", filter(col("__wins"), w =>
        w.getField("sum_sq") >= lit(meanSqThreshold) * w.getField("n")))
      .withColumn("__aw", transform(col("__active"),
        w => w.getField("win")))
      .select(col("doc_id"),
        size(col("__wins")).cast(LongType).as("n_windows"),
        size(col("__active")).cast(LongType).as("active_windows"),
        when(size(col("__active")) > 0, array_min(col("__aw")))
          .cast(LongType).as("first_active"),
        when(size(col("__active")) > 0, array_max(col("__aw")))
          .cast(LongType).as("last_active"),
        when(size(col("__active")) > 0,
          (array_max(col("__aw")) - array_min(col("__aw")))
            .cast(LongType) * windowBytes +
            element_at(col("__wins"), array_max(col("__aw")) + 1)
              .getField("n").cast(LongType))
          .as("trimmed_bytes"))
  }

  /** Aspect-ratio bucketing + capacity batching — the standard
    * vision-training batching step (SDXL-style): every image is
    * assigned to the CLOSEST target aspect bucket, then images within
    * a bucket are packed into fixed-`capacity` batches so a batch
    * never mixes shapes (mixed shapes force padding or per-image
    * resizes).
    *
    * Exactness: "closest ratio" is decided WITHOUT division — bucket
    * i beats j iff `|w·bhᵢ − bwᵢ·h| · bhⱼ < |w·bhⱼ − bwⱼ·h| · bhᵢ`
    * (cross-multiplied; h > 0 cancels), realized by scaling every
    * distance to the common denominator `lcm(bh)` so a single integer
    * sort key `|w·bhᵢ − bwᵢ·h| · (L/bhᵢ)` ranks buckets exactly; ties
    * break on bucket index. Batch numbering is pure integer
    * arithmetic on a distributed global rank.
    *
    * Scale: the argmin is a per-row expression over a literal bucket
    * list (no join); batching is ONE
    * [[graft.operators.Linkage.globalRank]] pass sorted by
    * (bucket, id) plus a buckets-sized offset join — never a
    * single-partition window. Returns
    * (id, width, height, bucket_w, bucket_h, batch_idx). */
  def aspectBuckets(df: DataFrame, idCol: String, widthCol: String,
      heightCol: String, buckets: Seq[(Int, Int)],
      capacity: Int): DataFrame = {
    require(buckets.nonEmpty, "need at least one aspect bucket")
    require(buckets.forall { case (w, h) => w >= 1 && h >= 1 },
      s"bucket dims must be >= 1, got $buckets")
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmBh = buckets.map(_._2.toLong).reduce((a, b) => a / gcd(a, b) * b)
    val base = df.select(col(idCol).as("__id"),
        col(widthCol).cast("long").as("__w"),
        col(heightCol).cast("long").as("__h"))
      .filter(col("__w").isNotNull && col("__h").isNotNull &&
        col("__w") > 0 && col("__h") > 0)
    val keyed = buckets.zipWithIndex.map { case ((bw, bh), i) =>
      struct(
        (abs(col("__w") * bh - lit(bw.toLong) * col("__h")) *
          lit(lcmBh / bh)).as("key"),
        lit(i).as("idx"))
    }
    val assigned = base
      .withColumn("__best", array_min(array(keyed: _*)))
      .withColumn("__bidx", col("__best").getField("idx"))
    val ranked = graft.operators.Linkage.globalRank(
      assigned.select(col("__id"), col("__w"), col("__h"),
        col("__bidx")),
      "__id", col("__bidx"))
    val offsets = ranked.groupBy(col("__bidx"))
      .agg(min(col("grank")).as("__first"))
    val bucketW = element_at(array(buckets.map(b => lit(b._1)): _*),
      col("__bidx").cast(IntegerType) + 1)
    val bucketH = element_at(array(buckets.map(b => lit(b._2)): _*),
      col("__bidx").cast(IntegerType) + 1)
    val local0 = col("grank") - col("__first")
    ranked.join(broadcast(offsets), Seq("__bidx"))
      .select(col("__id").as("id"), col("__w").as("width"),
        col("__h").as("height"),
        bucketW.cast(IntegerType).as("bucket_w"),
        bucketH.cast(IntegerType).as("bucket_h"),
        ((local0 - pmod(local0, lit(capacity.toLong))) / capacity)
          .cast(LongType).as("batch_idx"))
  }

  /** Letterbox resize/pad geometry for bucketed images — the
    * per-image plan that turns an [[aspectBuckets]] assignment into
    * concrete preprocessing parameters: aspect-preserving scale
    * `min(bucket_w/w, bucket_h/h)`, the resized dims (floored, never
    * exceeding the bucket), and centered pads
    * (`pad_left = ⌊(bucket_w − resize_w)/2⌋`, remainder to the
    * right/bottom — the asymmetric pixel goes to the same side every
    * time, so the plan is reproducible).
    *
    * Division-free dims: `resize_w = ⌊w·bucket_h/h⌋` when height
    * binds (integer cross-multiplication picks the binding side), so
    * the plan is exact integer arithmetic end to end — no float scale
    * whose rounding could disagree between planner and executor.
    * Pure per-row projection: zero shuffle, embarrassingly parallel,
    * composes directly onto the aspectBuckets output columns. Returns
    * the input plus (resize_w, resize_h, pad_left, pad_right,
    * pad_top, pad_bottom). */
  def padPlan(df: DataFrame, widthCol: String = "width",
      heightCol: String = "height", bucketWCol: String = "bucket_w",
      bucketHCol: String = "bucket_h"): DataFrame = {
    val (w, h) = (col(widthCol).cast(LongType), col(heightCol).cast(LongType))
    val (bw, bh) = (col(bucketWCol).cast(LongType),
      col(bucketHCol).cast(LongType))
    // width binds when bw/w <= bh/h  ⇔  bw·h <= bh·w (integer compare)
    val widthBinds = bw * h <= bh * w
    // lower clamp at 1px (standard letterbox convention): an extreme
    // aspect relative to the bucket would otherwise floor the
    // non-binding dim to 0 — an invalid preprocessing plan
    val rw = greatest(lit(1L), when(widthBinds, bw)
      .otherwise(floor(w * bh / h).cast(LongType)))
    val rh = greatest(lit(1L), when(widthBinds,
      floor(h * bw / w).cast(LongType)).otherwise(bh))
    val (padW, padH) = (bw - rw, bh - rh)
    df
      .withColumn("resize_w", rw)
      .withColumn("resize_h", rh)
      .withColumn("pad_left", floor(padW / 2).cast(LongType))
      .withColumn("pad_right", padW - floor(padW / 2).cast(LongType))
      .withColumn("pad_top", floor(padH / 2).cast(LongType))
      .withColumn("pad_bottom", padH - floor(padH / 2).cast(LongType))
  }
}
