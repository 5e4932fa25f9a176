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
      .select(col("id"), col("__toks"), size(col("__toks")).as("__dl"))
    // One corpus-wide aggregate → a single row, broadcast as a scalar.
    val stats = base.agg(count(lit(1)).as("__n_docs"), avg(col("__dl")).as("__avgdl"))
    // Postings restricted to query terms BEFORE the shuffle: only matching
    // (id, term) occurrences enter the exchange, map-side combined.
    val tf = base
      .select(col("id"), col("__dl"), explode(col("__toks")).as("__term"))
      .filter(col("__term").isInCollection(query))
      .groupBy(col("id"), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__term"))
      .agg(count(lit(1)).as("__df")) // one row per (id,term) → count = df
    val tfd = col("__tf").cast(DoubleType)
    val idf = log(lit(1.0) +
      (col("__n_docs").cast(DoubleType) - col("__df") + lit(0.5)) /
        (col("__df").cast(DoubleType) + lit(0.5)))
    val norm = tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("__dl").cast(DoubleType) / col("__avgdl")))
    tf.join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats)) // one-row scalar join
      .select(col("id"), (idf * norm).as("__w"))
      .groupBy(col("id"))
      .agg(round(sum(col("__w")), roundTo).as("score"))
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
}
