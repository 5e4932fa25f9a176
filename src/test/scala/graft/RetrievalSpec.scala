package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // corpus: 3 docs, hand-checkable frequencies
  private def corpus = Seq(
    (1L, "spark merge spark merge merge"), // dl 5, tf(merge)=3
    (2L, "merge row row row row"),         // dl 5, tf(merge)=1
    (3L, "row row row row row row row")    // dl 7, no query terms
  ).toDF("doc_id", "text")

  test("bm25: hand-computed score for a single-term query") {
    val got = Retrieval.bm25Scores(corpus, "doc_id", "text", Seq("merge"),
        k1 = 1.2, b = 0.75, roundTo = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, avgdl=17/3, df(merge)=2 -> idf = ln(1 + (3-2+0.5)/(2+0.5))
    val idf = math.log(1.0 + 1.5 / 2.5)
    def w(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (17.0 / 3.0)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L)) // doc 3 has no query term
    assert(got(1L) == r6(w(3, 5)), s"${got(1L)} vs ${w(3, 5)}")
    assert(got(2L) == r6(w(1, 5)))
    assert(got(1L) > got(2L)) // higher tf wins at equal dl
  }

  test("bm25: multi-term scores sum per term; rarer term scores higher") {
    val docs = Seq(
      (1L, "alpha beta beta beta"),
      (2L, "alpha gamma gamma gamma"),
      (3L, "alpha alpha delta delta")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25Scores(docs, "doc_id", "text",
        Seq("alpha", "beta"), roundTo = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    // beta is rarer (df 1 vs alpha's 3): doc 1 must outrank the others
    assert(got(1L) > got(2L) && got(1L) > got(3L))
    // docs 2 and 3 score on alpha alone; doc 3 has tf 2 > doc 2's tf 1
    assert(got(3L) > got(2L))
  }

  test("bm25TopK: deterministic cut, tie-break by id, top-k plan") {
    // two identical docs -> identical scores; tie must break by id
    val docs = Seq(
      (10L, "merge merge x x"), (2L, "merge merge x x"), (5L, "x x x x")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("merge"), k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
    val plan = Retrieval.bm25TopK(Tables.documents(spark, sf), "doc_id",
        "text", Seq("merge", "vector"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("bm25TopKIndexed equals the inline form on the fixture corpus") {
    val docs = Tables.documents(spark, sf)
    val query = Seq("merge", "vector", "window")
    val inline = Retrieval.bm25TopK(docs, "doc_id", "text", query, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val postings = Retrieval.bm25Postings(docs, "doc_id", "text")
    val stats = Retrieval.bm25CorpusStats(docs, "doc_id", "text")
    val indexed = Retrieval.bm25TopKIndexed(postings, stats, query, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inline == indexed)
  }

  test("bm25 indexed probe partition-prunes a tb-partitioned store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_idx")
      .toString + "/postings"
    val docs = Tables.documents(spark, sf)
    Retrieval.bm25Postings(docs, "doc_id", "text")
      .write.partitionBy("tb").parquet(dir)
    val store = spark.read.parquet(dir)
    val stats = Retrieval.bm25CorpusStats(docs, "doc_id", "text")
    val got = Retrieval.bm25TopKIndexed(store, stats, Seq("merge"), k = 5)
    assert(got.count() == 5)
    val scan = got.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(scan).isDefined,
      scan.take(600))
  }

  test("bm25 plan: df/stats joins broadcast, never sort-merge") {
    val plan = Retrieval.bm25Scores(Tables.documents(spark, sf),
        "doc_id", "text", Seq("merge", "vector"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan.take(400))
    assert(!plan.contains("SortMergeJoin"), plan.take(400))
  }

  test("snippets: earliest term wins, window clamps at both edges") {
    val docs = Seq(
      (1L, "x merge y z w q r s"),   // match at 2, left edge clamps
      (2L, "a b c d e f vector g"),  // match at 7, right edge clamps
      (3L, "merge a b vector c"),    // both terms: earliest (merge, 1)
      (4L, "nothing relevant here")  // no match -> absent
    ).toDF("doc_id", "text")
    val got = Retrieval.snippets(docs, "doc_id", "text",
        Seq("vector", "merge"), window = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == (2L, "x merge y z"))
    assert(got(2L) == (7L, "e f vector g"))
    assert(got(3L) == (1L, "merge a b"))
  }

  test("bm25: repeated query terms weight by query-side multiplicity") {
    val docs = Seq((1L, "spark x y"), (2L, "other x y")).toDF("doc_id", "text")
    def scores(q: Seq[String]) =
      Retrieval.bm25Scores(docs, "doc_id", "text", q, roundTo = 6)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val once = scores(Seq("spark"))
    val twice = scores(Seq("spark", "spark"))
    assert(math.abs(twice(1L) - 2 * once(1L)) < 1e-4,
      s"${twice(1L)} vs 2*${once(1L)}")
  }

  test("bm25: b=0 removes length normalization entirely") {
    val docs = Seq(
      (1L, "merge short"),
      (2L, "merge " + Seq.fill(50)("pad").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25Scores(docs, "doc_id", "text", Seq("merge"),
        b = 0.0, roundTo = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == got(2L)) // same tf, length ignored
  }

  test("rrf: hand-computed fusion of two shortlists") {
    // list A ranks (10, 20, 30); list B ranks (20, 10, 40)
    val a = Seq((10L, 3.0), (20L, 2.0), (30L, 1.0)).toDF("id", "score")
    val b = Seq((20L, 9.0), (10L, 8.0), (40L, 7.0)).toDF("id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Map( // 1/(60+rank) per list
      10L -> r6(1.0 / 61 + 1.0 / 62), 20L -> r6(1.0 / 62 + 1.0 / 61),
      30L -> r6(1.0 / 63), 40L -> r6(1.0 / 63))
    assert(got.map(g => g._1 -> g._2).toMap == exp)
    // 10 and 20 tie exactly (symmetric ranks) -> id ascending
    assert(got.map(_._1).toSeq == Seq(10L, 20L, 30L, 40L))
    assert(got.map(g => g._1 -> g._3).toMap ==
      Map(10L -> 2L, 20L -> 2L, 30L -> 1L, 40L -> 1L))
  }

  test("rrf: rank ties within a list break by ascending id") {
    // identical scores: rank order must be id order in BOTH engines
    val a = Seq((5L, 1.0), (3L, 1.0), (4L, 1.0)).toDF("id", "score")
    val got = Retrieval.rrfFuse(Seq(a), k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(3L -> r6(1.0 / 61), 4L -> r6(1.0 / 62), 5L -> r6(1.0 / 63)))
  }

  test("rrf: k cuts after fusion, absent ids contribute nothing") {
    val a = Seq((1L, 2.0), (2L, 1.0)).toDF("id", "score")
    val b = Seq((3L, 5.0)).toDF("id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 2).collect()
    // fused: 1 -> 1/61, 3 -> 1/61, 2 -> 1/62; cut keeps (1, 3) by tie/id
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("rankEval: hand-checked P@k/recall/MRR/nDCG; no-qrel queries " +
      "absent, no-hit queries report zeros") {
    val results = Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3),
      (2L, "a", 1), (2L, "b", 2)).toDF("query", "doc", "rank")
    val qrels = Seq((1L, "b"), (1L, "d"), (2L, "z"), (3L, "zz"))
      .toDF("query", "doc")
    val got = Retrieval.rankEval(results, qrels, k = 3)
      .orderBy("query").collect()
    // query 3 has qrels but never appears in results -> zeros row;
    // a query in results with NO qrels would be absent entirely
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val q1 = got(0)
    def g(r: Int): Long = math.floor(BigDecimal(
      1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e9
      + 0.5).toLong
    assert(q1.getLong(1) === 2L && q1.getLong(2) === 1L) // n_rel, hits
    assert(q1.getDouble(3) === 1.0 / 3.0)                // p@3
    assert(q1.getDouble(4) === 0.5)                      // recall
    assert(q1.getDouble(5) === 0.5)                      // mrr (rank 2)
    assert(q1.getDouble(6) ===
      g(2).toDouble / (g(1) + g(2)).toDouble)            // ndcg
    val q2 = got(1) // qrels exist, none retrieved
    assert(q2.getLong(2) === 0L && q2.getDouble(5) === 0.0 &&
      q2.getDouble(6) === 0.0)
    val q3 = got(2)
    assert(q3.getLong(1) === 1L && q3.getDouble(3) === 0.0)
  }

  test("rankEval: ranks beyond k are ignored and qrel duplicates " +
      "count once") {
    val results = Seq((1L, "a", 1), (1L, "b", 5)).toDF("query", "doc", "rank")
    val qrels = Seq((1L, "b"), (1L, "b")).toDF("query", "doc")
    val got = Retrieval.rankEval(results, qrels, k = 3).head()
    assert(got.getLong(1) === 1L)      // duplicate qrel distincted
    assert(got.getLong(2) === 0L)      // b at rank 5 > k
  }
}
