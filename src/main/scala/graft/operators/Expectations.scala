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
}
