package graft.pipelines

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.operators.{Dedup, Multimodal, TextAnalysis}
import graft.sources.PartitionedWrite

/** End-to-end MULTIMODAL curation pipeline — the media sibling of
  * [[TrainingDataPipeline]] (the reference's data-carrier pipelines move
  * opaque payload columns the same way, e.g. flume-plugin event bodies;
  * see SURVEY §2.1/§2.9): binary payloads → content-defined-chunk
  * near-dup screen → metadata decode (stub kernel, real plan) → video
  * frame sampling → fixed-budget batch packing → partitioned manifest
  * write.
  *
  * Every stage is payload-local except the two it genuinely cannot
  * avoid: the chunk-identity shuffle inside the near-dup screen (12 B
  * per chunk, never payload bytes) and the per-format window cumsum in
  * the packer (manifest-scale rows). Payload bytes themselves never
  * shuffle — at 100 TB of media that is the difference between a
  * metadata job and moving the corpus.
  *
  * Stage counts ride `observe()` on plans the pipeline executes anyway
  * (same no-persist discipline as [[TrainingDataPipeline.run]]); only
  * the batch and video counts are read back from the written manifest —
  * a frames-scale table, not the corpus. */
object MediaCurationPipeline {

  /** Knobs, defaulted to the unit-fixture scale. */
  final case class Config(
      /** Byte-weighted Jaccard at or above which two payloads are
        * near-duplicates ([[Multimodal.binaryNearDups]]). */
      nearDupThreshold: Double = 0.5,
      chunkMinSize: Int = 64,
      chunkAvgBits: Int = 8,
      chunkMaxSize: Int = 1024,
      /** Ubiquity cap: chunks in more payloads than this are container
        * boilerplate, not signal (skew guard). */
      maxChunkDocs: Int = 256,
      /** Video frame-sampling stride and per-video cap. */
      frameEveryMs: Long = 1000L,
      maxFramesPerVideo: Int = 8,
      /** Frames per training batch (packer capacity). */
      framesPerBatch: Int = 64)

  /** Stage counts observed on the single write pass. */
  final case class Report(
      input: Long,
      /** Payloads surviving the binary near-dup screen (cluster-canonical:
        * one representative per connected component, min id). */
      afterNearDedup: Long,
      /** Survivors decoded as multi-frame video (the rest are stills). */
      videos: Long,
      /** Sampled frame rows written (stills contribute one frame each). */
      frames: Long,
      /** Distinct (format, bin) training batches in the manifest. */
      batches: Long)

  /** Run the pipeline; the frame manifest lands in `outDir` partitioned
    * by container format. `docs` needs `idCol` (castable to long) and
    * `payloadCol` (castable to binary). */
  def run(spark: SparkSession, docs: DataFrame, outDir: String,
      idCol: String = "doc_id", payloadCol: String = "text",
      cfg: Config = Config()): Report = {
    val (obsIn, obsKept, obsFrames) =
      (Observation(), Observation(), Observation())

    val payloads = Multimodal.withPayload(docs, idCol, payloadCol)
      .observe(obsIn, count(lit(1)).as("n"))

    // near-dup screen at chunk granularity: pairs → connected components
    // → keep each cluster's min id. Same cluster-canonical rule as the
    // text pipeline (pairwise loser-dropping over-drops on chains).
    val pairs = Multimodal.binaryNearDups(payloads, "doc_id", "payload",
      threshold = cfg.nearDupThreshold, minSize = cfg.chunkMinSize,
      avgBits = cfg.chunkAvgBits, maxSize = cfg.chunkMaxSize,
      maxChunkDocs = cfg.maxChunkDocs)
    val losers = Dedup.dupClusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    val kept = payloads.join(losers, Seq("doc_id"), "left_anti")
      .observe(obsKept, count(lit(1)).as("n"))

    // decode survivors (stub kernel — the one function a real deployment
    // replaces; everything downstream is the real distributed plan)
    val metaDs = Multimodal.decode(kept)
    val meta = metaDs.toDF()

    // frame sampling: videos every frameEveryMs capped at
    // maxFramesPerVideo; stills contribute exactly one frame at t=0.
    // The media tag travels on every manifest row so downstream loaders
    // (and the video count below) never re-decode to tell them apart.
    val videoFrames = Multimodal.frameSamplePlan(metaDs,
        everyMs = cfg.frameEveryMs, maxFrames = cfg.maxFramesPerVideo)
      .withColumn("media", lit("video"))
    val stillFrames = meta.filter(col("nFrames") <= 1)
      .select(col("docId").as("doc_id"), lit(0L).as("ts_ms"),
        lit(0).cast(IntegerType).as("frame_idx"), lit("still").as("media"))
    val frames = videoFrames.unionByName(stillFrames)

    // pack into training batches by running frame budget, per format
    // (decode geometry differs per container — batches never mix): one
    // window cumsum over the per-doc frame counts, manifest-scale
    val perDoc = frames.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"))
      .join(meta.select(col("docId").as("doc_id"), col("format")),
        Seq("doc_id"))
    val binned = TextAnalysis.packByTokenBudget(perDoc, "n_frames",
      cfg.framesPerBatch, group = col("format"), order = col("doc_id"))

    val manifest = frames
      .join(binned.select(col("doc_id"), col("format"), col("bin")),
        Seq("doc_id"))
      .select(col("format"), col("bin"), col("doc_id"), col("media"),
        col("frame_idx"), col("ts_ms"))
      .observe(obsFrames, count(lit(1)).as("n"))

    PartitionedWrite.writePartitioned(manifest, outDir, Seq("format"))

    // batch + video counts from the written manifest — frames-scale
    // reads, not corpus-scale recomputation
    val written = spark.read.parquet(outDir)
    val batches = written.select(col("format"), col("bin")).distinct().count()
    val videos = written.filter(col("media") === "video")
      .select(col("doc_id")).distinct().count()

    Report(
      input = obsIn.get("n").asInstanceOf[Long],
      afterNearDedup = obsKept.get("n").asInstanceOf[Long],
      videos = videos,
      frames = obsFrames.get("n").asInstanceOf[Long],
      batches = batches)
  }
}
