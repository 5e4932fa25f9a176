package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate anomaly detection — "did the error rate spike this hour?":
  * the monitoring consumer at the end of the reference's log-collector
  * pipelines (Flume/log-service sinks feed exactly this kind of alerting
  * query downstream).
  *
  * Method: per (series, time-bucket) counts, then a z-score of each
  * bucket against its TRAILING window of `lookback` buckets (the bucket
  * itself excluded — a spike must not inflate its own baseline).
  *
  * Engine-reproducibility: the baseline variance is computed from EXACT
  * integer window sums (Σc and Σc² are BIGINTs — bucket counts are
  * integers, so both sums are exact in any engine) with one fixed
  * double-arithmetic formula, `(Σc² − (Σc)²/n)/(n−1)` — never from a
  * built-in `stddev`, whose accumulation algorithm (Welford vs naive)
  * differs across engines in final ULPs. The q159 oracle mirrors the
  * formula token-for-token and hash-matches.
  *
  * Scale: one map-side-combined count aggregate over the events (output
  * is series×calendar-sized), then one window pass over THAT — the
  * window sorts series×buckets, never events. Alert tables stay tiny at
  * any corpus size.
  */
object Anomaly {

  /** Per-(series, bucket) rate table with trailing-baseline z-scores:
    * (series, bucket, n, baseline_mean, baseline_sd, z, is_anomaly).
    * Buckets with fewer than `minPoints` trailing points (series start)
    * or zero baseline variance get NULL z and are never flagged.
    * `bucket` is a `date_trunc` unit ("hour", "day", ...). */
  def rateAnomalies(events: DataFrame, seriesCol: String, tsCol: String,
      bucket: String = "hour", lookback: Int = 24, minPoints: Int = 8,
      zThreshold: Double = 3.0, dense: Boolean = false,
      twoSided: Boolean = false): DataFrame = {
    require(lookback >= 2 && minPoints >= 2 && minPoints <= lookback,
      s"need 2 <= minPoints <= lookback, got $minPoints/$lookback")
    val sparse = events
      .groupBy(col(seriesCol).as("series"),
        date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
    // `dense` fills each series' calendar with explicit ZERO buckets
    // before scoring — without it a total outage is a MISSING row that
    // neither scores nor feeds baselines, and the operator can only see
    // spikes. `twoSided` flags |z|, catching those drops.
    val counts = if (!dense) sparse else {
      val step = Map("hour" -> "interval 1 hour", "day" -> "interval 1 day",
        "week" -> "interval 7 days")
      require(step.contains(bucket),
        s"dense calendars support hour/day/week buckets, got $bucket")
      val checkpointed = sparse.localCheckpoint(eager = false)
      checkpointed
        .groupBy(col("series"))
        .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
        .select(col("series"),
          explode(sequence(col("__lo"), col("__hi"),
            expr(step(bucket)))).as("bucket"))
        .join(checkpointed, Seq("series", "bucket"), "left")
        .select(col("series"), col("bucket"),
          coalesce(col("n"), lit(0L)).as("n"))
    }
    val w = Window.partitionBy(col("series")).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    // exact integer sums over the trailing frame; all double math happens
    // in ONE fixed expression order below
    val withSums = counts
      .withColumn("__k", count(col("n")).over(w))
      .withColumn("__s1", sum(col("n")).over(w))
      .withColumn("__s2", sum(col("n") * col("n")).over(w))
    val k = col("__k").cast("double")
    val s1 = col("__s1").cast("double")
    val s2 = col("__s2").cast("double")
    val mean = s1 / k
    val variance = (s2 - s1 * s1 / k) / (k - 1)
    val sd = sqrt(variance)
    withSums
      .withColumn("baseline_mean",
        when(col("__k") >= minPoints, round(mean, 6)))
      .withColumn("baseline_sd",
        when(col("__k") >= minPoints, round(sd, 6)))
      .withColumn("z",
        when(col("__k") >= minPoints && variance > 0,
          round((col("n").cast("double") - mean) / sd, 6)))
      .withColumn("is_anomaly",
        coalesce(
          if (twoSided) abs(col("z")) > zThreshold
          else col("z") > zThreshold,
          lit(false)))
      .drop("__k", "__s1", "__s2")
  }

  /** Robust per-series outlier flags — the median/MAD counterpart of
    * [[rateAnomalies]]' mean/sd z-score, for VALUE columns where a few
    * extreme points wreck a moment-based baseline (mean and stddev are
    * both dragged by the outliers they are supposed to find; the median
    * and the median-absolute-deviation are not):
    *
    *   robust_z = 0.6745 · (v − median) / MAD
    *
    * (0.6745 ≈ Φ⁻¹(0.75) rescales MAD to σ under normality — the
    * standard Iglewicz-Hoaglin form; |robust_z| > 3.5 is their
    * recommended cut, the `k` default.) A series whose MAD is 0 (over
    * half the points identical) yields NULL z and never flags — the
    * [[rateAnomalies]] zero-variance contract. NULL values pass through
    * unflagged with NULL z; NaN likewise (unordered).
    *
    * Scale: two exact per-series percentile aggregates (group-sized
    * buffers — series are few by definition; the 100 TB path swaps
    * `percentile_approx` in) + broadcast joins of the series-sized
    * stats; flagging is per-row codegen. Appends `median`, `mad`,
    * `robust_z`, `is_outlier`. */
  def robustOutliers(df: DataFrame, seriesCol: String, value: Column,
      k: Double = 3.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val appended = Seq("median", "mad", "robust_z", "is_outlier")
    val clash = df.columns.toSet.intersect(appended.toSet)
    require(clash.isEmpty,
      s"robustOutliers appends ${clash.mkString(", ")} — already present " +
        "on the input; rename or drop them first")
    val v = value.cast("double")
    val med = df.filter(value.isNotNull && !isnan(v))
      .groupBy(col(seriesCol))
      .agg(percentile(v, lit(0.5)).as("median"))
    val withMed = df.join(broadcast(med), Seq(seriesCol), "left")
    val mad = withMed.filter(value.isNotNull && !isnan(v))
      .groupBy(col(seriesCol))
      .agg(percentile(abs(v - col("median")), lit(0.5)).as("mad"))
    val z = lit(0.6745) * (v - col("median")) / col("mad")
    withMed.join(broadcast(mad), Seq(seriesCol), "left")
      .withColumn("robust_z",
        when(col("mad") > 0 && !isnan(v), round(z, 6)))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > k, lit(false)))
  }
}
