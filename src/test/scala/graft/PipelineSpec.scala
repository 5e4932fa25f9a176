package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipelines.TrainingDataPipeline

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("end-to-end curation pipeline: filter, dedup, shard write") {
    val docs = Tables.documents(spark, sf)
    // plant an exact dup and a near dup to exercise both dedup stages
    val donor = docs.filter($"doc_id" === 3).head()
    val text = donor.getAs[String]("text")
    val near = text.split(" ").dropRight(1).mkString(" ") + " zzz"
    val planted = docs.unionByName(Seq(
      (900001L, text, "xx", "srcdup", text.length.toLong),
      (900002L, near, "xx", "srcnear", near.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val outDir = Files.createTempDirectory("graft_pipeline").toString
    val report = TrainingDataPipeline.run(spark, planted, outDir,
      TrainingDataPipeline.Config(minQuality = 0.0, minTokens = 1,
        nearDupThreshold = 0.6))

    assert(report.input == docs.count() + 2)
    // both planted copies must be dropped (doc 3 is the min-id survivor)
    assert(report.afterExactDedup == report.afterQuality - 1)
    assert(report.afterNearDedup < report.afterExactDedup)
    val out = spark.read.parquet(outDir)
    assert(out.count() == report.afterNearDedup)
    assert(!out.filter($"doc_id".isin(900001L, 900002L)).head(1).nonEmpty)
    assert(out.filter($"doc_id" === 3).count() == 1)
    // partitioned layout by lang
    assert(out.select("lang").distinct().count() >= 1)
    assert(report.totalTokens > 0)
  }

  test("pipeline is deterministic across runs") {
    val docs = Tables.documents(spark, sf)
    val out1 = Files.createTempDirectory("graft_p1").toString
    val out2 = Files.createTempDirectory("graft_p2").toString
    val r1 = TrainingDataPipeline.run(spark, docs, out1)
    val r2 = TrainingDataPipeline.run(spark, docs.repartition(13), out2)
    assert(r1 == r2)
    val a = spark.read.parquet(out1).select("doc_id")
    val b = spark.read.parquet(out2).select("doc_id")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
