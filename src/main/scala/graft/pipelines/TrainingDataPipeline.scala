package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.PartitionedWrite

/** End-to-end training-data curation: the composition a 100 TB pretraining
  * pipeline actually runs, built entirely from this library's operators —
  * ingest → language-ID → quality filter → exact dedup → MinHash near-dup
  * removal → tokenize/stats → partitioned shard write.
  *
  * Every stage is a DataFrame transform (Catalyst-optimized end to end:
  * the quality filter's expressions push into the same stage as language
  * scoring; only the dedups shuffle). Survivor selection is deterministic
  * (min doc_id) so shards are reproducible run-over-run.
  */
object TrainingDataPipeline {

  final case class Config(
      minQuality: Double = 0.7,
      minTokens: Int = 10,
      nearDupThreshold: Double = 0.8,
      shingleK: Int = 5,
      outputPartitionCol: String = "lang")

  final case class Report(
      input: Long, afterQuality: Long, afterExactDedup: Long,
      afterNearDedup: Long, totalTokens: Long)

  /** Annotate: language, quality, token count — one codegen'd pass. */
  def annotate(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), col("source"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      org.apache.spark.sql.graft.NativeFunctions.tokenCount(col("text"))
        .cast(LongType).as("n_tokens"))

  /** Quality gate: per-row predicate, fully pushed into the scan stage. */
  def qualityFilter(annotated: DataFrame, cfg: Config): DataFrame =
    annotated.filter(col("quality") >= cfg.minQuality &&
      col("n_tokens") >= cfg.minTokens)

  /** Exact dedup: keep the min-id survivor per identical text. */
  def dropExactDups(df: DataFrame): DataFrame = {
    val survivors = Dedup.exact(df, "doc_id", Seq("text"))
      .select(col("survivor_id").as("doc_id"))
    df.join(survivors, "doc_id")
  }

  /** Near-dup removal: MinHash candidate pairs above threshold; the larger
    * doc_id of each pair is dropped (min-id survivor, transitively safe
    * because pairs are verified with exact Jaccard). */
  def dropNearDups(df: DataFrame, cfg: Config): DataFrame = {
    val losers = Dedup.minhashNearDups(df, "doc_id", "text",
        shingleK = cfg.shingleK, threshold = cfg.nearDupThreshold)
      .select(col("id_b").as("doc_id")).distinct()
    df.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Run the full pipeline; write shards partitioned by language. */
  def run(spark: SparkSession, docs: DataFrame, outDir: String,
      cfg: Config = Config()): Report = {
    val annotated = annotate(docs).persist()
    val quality = qualityFilter(annotated, cfg).persist()
    val exact = dropExactDups(quality).persist()
    val deduped = dropNearDups(exact, cfg).persist()

    PartitionedWrite.writePartitioned(
      deduped, outDir, Seq(cfg.outputPartitionCol))

    val report = Report(
      input = annotated.count(),
      afterQuality = quality.count(),
      afterExactDedup = exact.count(),
      afterNearDedup = deduped.count(),
      totalTokens = deduped.agg(sum("n_tokens")).head().getLong(0))
    Seq(annotated, quality, exact, deduped).foreach(_.unpersist())
    report
  }
}
