package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Keyword retrieval over a document corpus — Okapi BM25 ranking
  * (Robertson & Zaragoza 2009, the Lucene-default formula) expressed as
  * relational operators, the query-side capability a warehouse user gets
  * from the reference's SQL surface via `LIKE`/full scans
  * (`metabase-maxcompute-driver/src/metabase/driver/maxcompute.clj` builds
  * exactly such filter SQL) upgraded to ranked retrieval.
  *
  * Two serve paths, mirroring the ANN operators' inline/prebuilt split:
  *  - [[bm25Scores]]/[[bm25TopK]] tokenize inline — one pruned corpus scan
  *    per query (the ad-hoc path);
  *  - [[bm25Postings]]+[[bm25CorpusStats]] build a postings store once;
  *    [[bm25TopKIndexed]] then answers a query from `|query| / buckets`
  *    of the postings partitions without ever re-reading document text —
  *    the repeated-query 100 TB path.
  *
  * Scale shape (100 TB corpus, 1000 executors):
  *  - the corpus is tokenized per row (no shuffle) and exploded terms are
  *    filtered to the QUERY terms before any wide operator — the only
  *    per-doc shuffle carries (id, term) pairs for matching terms, a
  *    vanishing fraction of the corpus;
  *  - document frequencies collapse to ≤ |query| rows (map-side combined)
  *    and broadcast back; corpus stats (N, avgdl) are a single aggregated
  *    row, broadcast as a scalar join — no driver round-trip inside the
  *    plan;
  *  - the final top-k is `TakeOrderedAndProject` (per-partition heaps +
  *    driver merge of k·partitions rows), never a global sort.
  *
  * Scores are rounded to `roundTo` decimals BEFORE ranking so that the
  * ordering (and therefore the top-k cut) is reproducible across engines
  * and summation orders — ties break by ascending id.
  */
object Retrieval {

  private def toks(c: Column): Column = filter(split(c, " "), t => t =!= "")

  /** Shared scoring tail: `tf` must carry (id, dl, term, tf); `stats` one
    * row (n_docs, avgdl). df is recomputed from tf (one row per (id,term)
    * pair ⇒ count = document frequency), collapsed to ≤ |query| rows.
    * A term repeated in the query weights by its query-side multiplicity
    * (Okapi bag-of-words semantics — the probe plans dedup terms, so the
    * multiplicity re-enters here as a literal per-term factor). */
  private def score(tf: DataFrame, stats: DataFrame, query: Seq[String],
      k1: Double, b: Double, roundTo: Int): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tfd = col("tf").cast(DoubleType)
    val idf = log(lit(1.0) +
      (col("n_docs").cast(DoubleType) - col("df") + lit(0.5)) /
        (col("df").cast(DoubleType) + lit(0.5)))
    val norm = tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl").cast(DoubleType) / col("avgdl")))
    val mult = query.groupBy(identity).view.mapValues(_.size.toDouble)
      .foldLeft(lit(1.0)) { case (acc, (t, m)) =>
        if (m == 1.0) acc else when(col("term") === t, lit(m)).otherwise(acc)
      }
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats)) // one-row scalar join
      .select(col("id"), (idf * norm * mult).as("__w"))
      .groupBy(col("id"))
      .agg(round(sum(col("__w")), roundTo).as("score"))
  }

  /** BM25 scores for every document matching ≥ 1 query term:
    * `(id, score)` with `score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`,
    * `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`. Non-matching documents
    * are absent (their score is 0 by definition). */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 4): DataFrame = {
    require(query.nonEmpty, "query must contain at least one term")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val base = docs
      .select(col(idCol).as("id"), toks(col(textCol)).as("__toks"))
      .select(col("id"), col("__toks"), size(col("__toks")).as("dl"))
    // One corpus-wide aggregate → a single row, broadcast as a scalar.
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // Postings restricted to query terms BEFORE the shuffle: only matching
    // (id, term) occurrences enter the exchange, map-side combined.
    val tf = base
      .select(col("id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isInCollection(query))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    score(tf, stats, query, k1, b, roundTo)
  }

  /** Top-k documents for a bag-of-words query; deterministic order
    * (score desc, id asc) and a `TakeOrderedAndProject` plan. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    bm25Scores(docs, idCol, textCol, query, k1, b, roundTo)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** One-time postings build for [[bm25TopKIndexed]]: one row per
    * (term, document) with the term frequency, the document length, and
    * the term's hash bucket `tb`. Persist partitioned by `tb` (e.g.
    * `.write.partitionBy("tb")`) and each query scans only
    * `|query| / buckets` of the store — document text is never read at
    * query time. One vocabulary-keyed shuffle at build, map-side
    * combined; Zipf bounds distinct (term, doc) pairs. */
  def bm25Postings(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    docs.select(col(idCol).as("id"), toks(col(textCol)).as("__toks"))
      .select(col("id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(xxhash64(col("term")), lit(buckets.toLong)))
  }

  /** Corpus stats companion of [[bm25Postings]] — ONE row (n_docs,
    * avgdl) over ALL documents, including those the postings table
    * cannot see (empty after tokenization). Persist it with the
    * postings; [[bm25TopKIndexed]] broadcasts it. */
  def bm25CorpusStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(size(toks(col(textCol))).as("__dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("__dl")).as("avgdl"))

  /** BM25 top-k from a prebuilt postings store ([[bm25Postings]]) +
    * stats table ([[bm25CorpusStats]]): identical results to
    * [[bm25TopK]], but the probe is a `tb IN (...) AND term IN (...)`
    * filter — partition-pruned when the store is partitioned by `tb` —
    * so a query touches `|query| / buckets` of the postings and never
    * the corpus text. The query terms' buckets are resolved by one
    * 1-row local job (the same engine hash the build used, never
    * reimplemented driver-side). `buckets` MUST match the build-time
    * value: the probe addresses partitions by `hash(term) % buckets`,
    * so a mismatch looks in the wrong buckets and silently returns
    * wrong (usually empty) results — store the bucket count with the
    * postings (e.g. in the directory name) like any index metadata. */
  def bm25TopKIndexed(postings: DataFrame, stats: DataFrame,
      query: Seq[String], k: Int, buckets: Int = 64,
      k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 4): DataFrame = {
    require(query.nonEmpty, "query must contain at least one term")
    require(k > 0, s"k must be positive, got $k")
    val hashRow = postings.sparkSession.range(1)
      .select(query.zipWithIndex.map { case (t, i) =>
        pmod(xxhash64(lit(t)), lit(buckets.toLong)).as(s"h$i") }: _*)
      .head()
    val tbs = query.indices.map(hashRow.getLong(_): java.lang.Long)
    val tf = postings
      .filter(col("tb").isin(tbs: _*) && col("term").isInCollection(query))
    score(tf, stats, query, k1, b, roundTo)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009 —
    * the public hybrid-search combiner every lexical+vector engine
    * ships): fuse N ranked SHORTLISTS into one ranking by
    * `rrf(id) = Σ_lists 1 / (rrfK + rank_list(id))`, where `rank` is the
    * 1-based position under (score desc, id asc). A document absent from
    * a list simply contributes no term for it — the standard convention;
    * `n_lists` reports how many lists ranked each survivor.
    *
    * Rank-based fusion is what makes heterogeneous scorers composable:
    * BM25 scores and cosine similarities live on incomparable scales, but
    * their RANKS are scale-free. Compose [[bm25TopK]] with an embedding
    * top-k (`Similarity.bruteForceTopK` / the LSH/IVF serve paths) for
    * hybrid retrieval.
    *
    * CONTRACT: inputs are top-k shortlists (each ≤ a few thousand rows),
    * not corpus-scale rankings — ranking within a list is a single-task
    * window by design (the lists are driver-mergeable by definition; a
    * corpus-scale global ranking would be a global sort no fusion
    * formula needs). Cost: N tiny windows + one union + one group-by on
    * O(N·k) rows. The fused score is rounded to `roundTo` decimals
    * BEFORE the final ordering so the cut is engine-reproducible; ties
    * break by ascending id. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60,
      idCol: String = "id", scoreCol: String = "score",
      roundTo: Int = 6): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    val ranked = rankings.map { r =>
      r.select(col(idCol).as("id"), col(scoreCol).as("__s"))
        .select(col("id"), row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("__s").desc, col("id"))).as("__rnk"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(
        round(sum(lit(1.0) / (lit(rrfK.toDouble) + col("__rnk"))), roundTo)
          .as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(k)
  }

  /** Ranking-quality evaluation at cutoff `k` — precision/recall@k,
    * MRR and binary nDCG@k per query, the report a retrieval stage
    * (BM25 decontamination probe, ANN serving, fused rankings) is
    * tuned by. Inputs: `results` as (query, doc, rank) with rank
    * 1-based within each query, and `qrels` as (query, doc) rows
    * naming the relevant documents (binary relevance).
    *
    * Numerics (engine-exact): hits/counts are exact integers;
    * p@k, recall@k and MRR (`1/first_hit_rank`) are ONE double
    * division each. nDCG's per-rank gain `1/log₂(r+1)` is ln-derived,
    * so it follows the repo's log discipline — `round(·, 9)` on both
    * engines, then nano-quantized (`floor(g·10⁹ + 0.5)`) so DCG and
    * IDCG accumulate as order-free exact integers; nDCG is ONE final
    * division of the two. IDCG joins a k-row gain grid against
    * `min(k, n_rel)` — never a per-document expansion.
    *
    * Scale shape: one semi-join of results⋈qrels on (query, doc) —
    * both sides are (query·k)- and qrel-sized, not corpus-sized —
    * then query-keyed aggregates; the gain grid is k rows,
    * broadcast. Queries with no qrels are absent (no ground truth =
    * not evaluable); queries with qrels but no hits report zeros.
    * Returns (query, n_rel, hits, p_at_k, recall_at_k, mrr, ndcg)
    * — one row per query with ground truth. */
  def rankEval(results: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query", docCol: String = "doc",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = results.sparkSession
    val res = results.select(col(queryCol).as("__q"),
        col(docCol).as("__d"), col(rankCol).cast("long").as("__r"))
      .filter(col("__r") >= 1 && col("__r") <= k)
    val rel = qrels.select(col(queryCol).as("__q"), col(docCol).as("__d"))
      .distinct()
    // nano-quantized binary gain per rank, shared by DCG and IDCG
    val gains = broadcast(spark.range(1, k + 1L).select(
      col("id").as("__r"),
      floor(round(lit(1.0) /
          (log(col("id").cast("double") + 1.0) / log(lit(2.0))), 9) *
        1000000000.0 + 0.5).cast("long").as("__g")))
    val nRel = rel.groupBy(col("__q")).agg(count(lit(1)).as("n_rel"))
    val hits = res.join(rel, Seq("__q", "__d"), "left_semi")
      .join(gains, Seq("__r"))
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("hits"), min(col("__r")).as("__first"),
        sum(col("__g")).as("__dcg"))
    val idcg = nRel.join(gains, col("__r") <= least(col("n_rel"), lit(k.toLong)))
      .groupBy(col("__q")).agg(sum(col("__g")).as("__idcg"))
    nRel.join(idcg, Seq("__q")) // every n_rel >= 1 row has an idcg row
      .join(hits, Seq("__q"), "left")
      .select(col("__q").as("query"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / k.toDouble)
          .as("p_at_k"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_rel").cast("double")).as("recall_at_k"),
        when(col("__first").isNull, 0.0)
          .otherwise(lit(1.0) / col("__first").cast("double")).as("mrr"),
        when(col("__dcg").isNull, 0.0)
          .otherwise(col("__dcg").cast("double") /
            col("__idcg").cast("double")).as("ndcg"))
  }

  /** Keyword-in-context snippets — the search-result companion of
    * [[bm25TopK]]: for every document containing ≥ 1 query term, the
    * 1-based token position of the FIRST occurrence of any query term
    * (earliest across terms) and a `window`-token context around it,
    * as `(id, match_pos, snippet)`. Deterministic and engine-portable
    * (pure array positions — no scoring); zero shuffle, embarrassingly
    * parallel: one tokenize + a few array_position probes per row. */
  def snippets(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], window: Int = 5): DataFrame = {
    require(query.nonEmpty, "query must contain at least one term")
    require(window >= 0, s"window must be non-negative, got $window")
    // array_position yields 0 for "absent" — nullif so least() skips it
    // (least ignores nulls in both Spark and DuckDB)
    val firstPos = least(query.map(t =>
      nullif(array_position(col("__toks"), lit(t)), lit(0L))): _*)
    docs.select(col(idCol).as("id"), toks(col(textCol)).as("__toks"))
      .withColumn("match_pos", firstPos)
      .filter(col("match_pos").isNotNull)
      .select(col("id"), col("match_pos"),
        concat_ws(" ", slice(col("__toks"),
          greatest(lit(1), col("match_pos") - window).cast("int"),
          (least(size(col("__toks")).cast("long"), col("match_pos") + window)
            - greatest(lit(1), col("match_pos") - window) + 1).cast("int")))
          .as("snippet"))
  }
}
