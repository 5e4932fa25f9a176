package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token packing: bins split at capacity, oversized doc gets its own bin") {
    val docs = Seq(
      ("g", 1L, 60L),   // cum 60   -> bin 0
      ("g", 2L, 50L),   // cum 110  -> bin floor(60/100)=0
      ("g", 3L, 30L),   // cum 140  -> bin floor(110/100)=1
      ("g", 4L, 250L),  // cum 390  -> bin floor(140/100)=1 (oversized, own overflow)
      ("g", 5L, 10L)    // cum 400  -> bin floor(390/100)=3
    ).toDF("grp", "doc_id", "n_tokens")
    val got = TextAnalysis.packByTokenBudget(docs, "n_tokens", 100,
        $"grp", $"doc_id")
      .orderBy("doc_id").collect().map(_.getLong(3)).toSeq
    assert(got == Seq(0L, 0L, 1L, 1L, 3L), got.toString)
  }

  test("topTokens: exact counts, total tie-break order, top-k plan") {
    val docs = Seq((1L, "a b b c c c"), (2L, "c a a x")).toDF("doc_id", "text")
    val got = TextAnalysis.topTokens(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // c:4, a:3, b:2, x:1 -> top 3; a before b would only matter on ties
    assert(got == Seq(("c", 4L), ("a", 3L), ("b", 2L)))
    // ties break by token ascending (deterministic across engines)
    val tied = Seq((1L, "z y z y")).toDF("doc_id", "text")
    val t2 = TextAnalysis.topTokens(tied, "text", 1).collect().head.getString(0)
    assert(t2 == "y")
    // per-partition top-k, not a global sort
    val plan = TextAnalysis.topTokens(Tables.documents(spark, sf), "text", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(300))
  }

  test("packing preserves every document exactly once per group") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang",
      TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
    val packed = TextAnalysis.packByTokenBudget(docs, "n_tokens", 2048,
      $"lang", $"doc_id")
    assert(packed.count() == docs.count())
    // each bin except a group's last holds <= capacity + one overflow doc
    val binTotals = packed.groupBy($"lang", $"bin")
      .agg(sum($"n_tokens").as("t"), max($"n_tokens").as("mx"))
    assert(binTotals.filter($"t" - $"mx" >= 2048).isEmpty)
  }
}
