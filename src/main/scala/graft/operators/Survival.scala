package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event (survival) estimation over subject tables — the
  * churn/retention companion of [[Retention]] and [[Funnel]]: those
  * count who is still active per period; Kaplan–Meier estimates the
  * survival FUNCTION under right-censoring, which is the correct tool
  * when observation windows differ per subject (every churn study: a
  * user who joined last week hasn't had TIME to churn — dropping or
  * death-coding them both bias the curve; censoring does neither).
  * Reference provenance: the reference suite ships event collectors
  * feeding exactly this product-analytics consumer (see `Funnel`'s
  * provenance note); the estimator itself is public-textbook
  * (Kaplan & Meier 1958).
  */
object Survival {

  /** Kaplan–Meier survival curve per group from per-subject rows
    * `(group, duration, observed)`: at each distinct duration t,
    * `n_risk` = subjects with duration ≥ t, `d` = observed events at
    * t, `c` = censored at t, and
    * `S(t) = Π_{t_i ≤ t, d_i > 0} (1 − d_i / n_i)`.
    *
    * Engine-reproducibility: the product is evaluated in LOG space
    * with the repo's micro-integer discipline — each factor becomes
    * `floor(ln((n−d)/n)·10⁹ + 0.5)` (the ratio is ONE correctly-
    * rounded division of exact longs; the quantization absorbs the
    * ≤1-ulp cross-engine `ln` difference), the running sum is exact
    * 64-bit integer arithmetic under ANY window-aggregation order, and
    * the reported survival is `exp(Σ/10⁹)` rounded to 6 — display
    * rounding of a bit-identical double. A step where everyone at
    * risk dies (n = d) sends the curve to exactly 0 from that t on
    * (the log route would need ln 0), via a window max flag.
    *
    * Scale: one (group, duration) aggregate with map-side combine,
    * then windows over the group×distinct-duration table — corpus
    * shuffles once; everything after is curve-sized. */
  def kaplanMeier(subjects: DataFrame, groupCol: String,
      durationCol: String, observed: Column): DataFrame = {
    val steps = subjects
      .filter(col(durationCol).isNotNull && col(durationCol) >= 0)
      .groupBy(col(groupCol).as("group"),
        col(durationCol).cast("long").as("t"))
      .agg(sum(observed.cast("long")).as("d"),
        sum((!observed).cast("long")).as("c"))
    val wRisk = Window.partitionBy(col("group")).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.partitionBy(col("group")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    steps
      .withColumn("n_risk", sum(col("d") + col("c")).over(wRisk))
      // ln(1 - d/n) quantized to exact nano-units; d = 0 steps
      // contribute exactly 0 (ln 1), so censor-only rows are no-ops
      .withColumn("__lnq",
        when(col("d") === col("n_risk"), lit(0L)) // flagged below
          .otherwise(floor(
            log((col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double")) * lit(1000000000.0)
              + lit(0.5)).cast("long")))
      .withColumn("__dead",
        max((col("d") === col("n_risk")).cast("int")).over(wCum))
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0))
          .otherwise(round(
            exp(sum(col("__lnq")).over(wCum).cast("double") /
              lit(1000000000.0)), 6)))
      .select(col("group"), col("t"), col("n_risk"), col("d"), col("c"),
        col("survival"))
  }
}
