package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-quality expectations (Deequ-style, declarative): per-row
  * predicates verified in ONE aggregation pass over the table, returned
  * as an auditable report DataFrame. The point of the single pass: a
  * 100 TB validation must not scan once per rule — every check folds
  * into the same partial aggregate (a handful of counters per
  * partition), and the report is rules-cardinality-sized.
  *
  * A NULL predicate result counts as a violation (a rule that cannot
  * evaluate did not pass — the conservative reading for gates).
  */
object Expectations {

  /** One expectation: `name`, a boolean per-row `predicate`, and the
    * violation rate the table is allowed before `passed` flips false
    * (0.0 = hard constraint). */
  final case class Check(name: String, predicate: Column,
      maxViolationRate: Double = 0.0)

  /** Run all checks in one pass. Returns one row per check:
    * (check, n_rows, n_violations, violation_rate, passed), ordered by
    * check name. An empty table passes every check (rate 0 over 0 rows).
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks supplied")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names")
    require(checks.forall(c =>
      c.maxViolationRate >= 0.0 && c.maxViolationRate <= 1.0),
      "maxViolationRate must be in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("__n") +: checks.map(c =>
      sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L))
        .as(s"__v_${c.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    val out = checks.zipWithIndex.map { case (c, i) =>
      val v = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      val rate = if (n == 0L) 0.0 else v.toDouble / n
      (c.name, n, v, rate, rate <= c.maxViolationRate)
    }
    out.sortBy(_._1)
      .toDF("check", "n_rows", "n_violations", "violation_rate", "passed")
  }

  /** Key-uniqueness check as a report row — needs its own (hash-first)
    * aggregate, so it is not a per-row [[Check]]: the corpus-wide count
    * runs on `xxhash64(keys)` with map-side combine, and only colliding
    * hash groups re-verify on the true keys ([[Dedup.exactDupGroups]]'s
    * contract). `n_violations` = rows beyond the first of each duplicate
    * key group. */
  def uniquenessReport(df: DataFrame, keyCols: Seq[String],
      maxViolationRate: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    // exactDupGroups needs an id column; synthesize a unique one
    // (monotonically_increasing_id is per-row unique, never compared
    // across runs — only the group count is used)
    val withId = df.withColumn("__eid", monotonically_increasing_id())
    val dupRows = Dedup.exactDupGroups(withId, "__eid", keyCols)
      .agg(coalesce(sum(col("dup_count") - 1L), lit(0L)).as("extra"))
      .head().getLong(0)
    val rate = if (n == 0L) 0.0 else dupRows.toDouble / n
    Seq((s"unique(${keyCols.mkString(",")})", n, dupRows, rate,
      rate <= maxViolationRate))
      .toDF("check", "n_rows", "n_violations", "violation_rate", "passed")
  }

  /** Equi-width histogram of a numeric column — the distribution half of
    * column profiling ([[report]] answers rule questions, this answers
    * "what does the column LOOK like"): one map-side-combined count
    * aggregate to a bins-sized table, nothing else corpus-scale.
    *
    * Bins are half-open `[lo_edge, hi_edge)` over `[lo, hi)`; values
    * below `lo` land in bin −1 (underflow, NULL lo_edge), values ≥ `hi`
    * in bin `bins` (overflow, NULL hi_edge); NULLs and NaNs are
    * excluded (null RATES belong to [[report]]; a NaN is a value that
    * cannot be ordered into any bin), −Infinity lands in the underflow
    * bin and +Infinity in the overflow bin. Only non-empty bins appear — at 100 TB
    * a dense calendar of empty bins is presentation, not data. Bin
    * assignment and edges use one fixed double evaluation order
    * (`floor((x−lo)/width)`, `lo + bin·width`), so the q161 gate
    * hash-matches the oracle; `share` is each bin's fraction of counted
    * rows (window total over the bins-sized result, rounded to 6). */
  def histogram(df: DataFrame, value: Column, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo")
    import org.apache.spark.sql.expressions.Window
    val width = (hi - lo) / bins
    val v = value.cast("double")
    // the long cast runs ONLY on finite in-range values: ±Infinity is
    // routed to the under/overflow bins by the raw-double comparisons
    // (floor of ±Inf is ±Inf, which compares correctly) and NaN is
    // excluded with NULLs BEFORE the cast — otherwise a single
    // non-finite value kills the whole profiling job under ANSI mode
    // (CAST_INVALID_INPUT / overflow) instead of binning or skipping
    val raw = floor((v - lit(lo)) / lit(width))
    val bin = when(raw < 0, lit(-1L))
      .when(raw >= bins, lit(bins.toLong))
      .otherwise(raw.cast("long"))
    val counted = df.filter(value.isNotNull && !isnan(v))
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("cnt"))
    counted
      .withColumn("lo_edge",
        when(col("bin") === -1L, lit(null).cast("double"))
          .otherwise(round(lit(lo) + col("bin") * lit(width), 6)))
      .withColumn("hi_edge",
        when(col("bin") === bins.toLong, lit(null).cast("double"))
          .otherwise(round(lit(lo) + (col("bin") + 1) * lit(width), 6)))
      .withColumn("share",
        round(col("cnt").cast("double") /
          sum(col("cnt")).over(Window.partitionBy()), 6))
      .orderBy(col("bin"))
  }
}
