package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sessionization — gap-based session windows per key, the event-time
  * superset of the reference's processing-time bucketing (SURVEY §2.9; the
  * reference's `DateTimePartitionAssigner` buckets by wall clock only).
  * Spark's `session_window` handles merging in both batch and streaming;
  * the streaming form gets watermark-driven state eviction for free.
  */
object Sessionize {

  /** Per-key gap sessions: (key, session_start, n_events) —
    * `session_window(ts, gap)` merges events closer than `gap`. */
  def sessions(df: DataFrame, ts: String, key: String, gap: String): DataFrame =
    df.groupBy(session_window(col(ts), gap).as("session"), col(key))
      .agg(count(lit(1)).as("n_events"))
      .select(col(key), col("session.start").as("session_start"), col("n_events"))

  /** Session ids without the built-in (portable formulation — identical to
    * what the DuckDB oracle computes): new-session flag via lag, running
    * sum per key. Used to cross-check `session_window` semantics.
    *
    * Gap boundary (pinned by SessionizeSpec): `session_window` MERGES an
    * event whose gap equals the duration exactly — the session interval is
    * closed at prev_ts + gap — so a new session starts only when the gap is
    * STRICTLY GREATER than the duration; this formulation and the q49
    * oracle both use `>`. */
  def sessionIds(df: DataFrame, ts: String, key: String, tieBreak: String,
      gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    df.withColumn("__prev_ts", lag(col(ts), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          // double seconds, not long: a long cast truncates sub-second
          // precision and merges sessions session_window would split
          // (gap 1800.9s reads as 1800), breaking the pinned equivalence
          col(ts).cast("double") - col("__prev_ts").cast("double")
            > gapSeconds.toDouble, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }

  /** Interval-union coverage (the gaps-and-islands merge): per key,
    * collapse overlapping-or-touching `[ts, ts + duration)` intervals
    * into maximal segments and report the total covered microseconds
    * and segment count — "how much wall-clock does this user/sensor
    * actually cover once overlaps collapse", the de-double-counted
    * complement of [[sessions]] (which counts events; this measures
    * TIME). Touching intervals (next start == running max end) merge.
    *
    * Everything is exact integer microseconds (`unix_micros`), so the
    * result is engine-portable with no float anywhere. The classic
    * single-window formulation: running max-end over the per-key
    * start-ordered intervals flags island starts; a cumulative sum
    * names the islands; two aggregates finish. Equal-start ties need no
    * tie-break — any order yields the same islands (a tied row is
    * always inside its predecessor's interval).
    *
    * Scale: ONE shuffle keyed by `keyCol`; both windows ride the same
    * sort, the island aggregate is map-side combinable, and per-key
    * state is the key's interval count — no global window anywhere. */
  def intervalCoverage(df: DataFrame, keyCol: String, tsCol: String,
      durationUs: Long): DataFrame =
    islands(df, keyCol, tsCol, durationUs)
      .groupBy(col("key"))
      .agg(sum((col("__ee") - col("__ss")).cast("decimal(28,0)"))
          .cast("bigint").as("covered_us"),
        count(lit(1)).as("n_segments"))

  /** The merged maximal segments behind [[intervalCoverage]] /
    * [[intervalGaps]]: (key, __isl, __ss, __ee) in exact integer
    * microseconds. */
  private def islands(df: DataFrame, keyCol: String, tsCol: String,
      durationUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(durationUs > 0, s"durationUs must be > 0, got $durationUs")
    val iv = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("__s"))
      .withColumn("__e", col("__s") + lit(durationUs))
    val w = Window.partitionBy(col("key")).orderBy(col("__s"), col("__e"))
    val pme = max(col("__e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    iv.withColumn("__ni",
        when(pme.isNull || col("__s") > pme, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__ni")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("__isl"))
      .agg(min(col("__s")).as("__ss"), max(col("__e")).as("__ee"))
  }

  /** Uncovered gaps BETWEEN a key's merged segments — the outage/
    * silence report that is [[intervalCoverage]]'s complement: per key,
    * the number of gaps (segments − 1), total and maximum gap length.
    * A sensor that covers 99% of wall-clock in one long stretch and
    * one that drops out hourly have the same coverage; this tells them
    * apart. Keys with a single segment report 0 gaps and NULL max.
    *
    * Exact integer microseconds throughout (no float anywhere); one
    * extra segment-level lag window over [[islands]]' per-key segments
    * — segment counts per key are interval-count-bounded, so the
    * added window is cheap at any scale. */
  def intervalGaps(df: DataFrame, keyCol: String, tsCol: String,
      durationUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col("key")).orderBy(col("__ss"))
    islands(df, keyCol, tsCol, durationUs)
      .withColumn("__pe", lag(col("__ee"), 1).over(wk))
      .withColumn("__gap",
        when(col("__pe").isNotNull, col("__ss") - col("__pe")))
      .groupBy(col("key"))
      .agg(count(col("__gap")).as("n_gaps"),
        coalesce(sum(col("__gap")), lit(0L)).as("gap_us"),
        max(col("__gap")).as("max_gap_us"))
  }

  /** Corpus session-quality summary over [[sessionIds]]' portable gap
    * sessions: total sessions, distinct entities, BOUNCE sessions
    * (single event — the engagement red flag), events per session and
    * mean session duration. One row:
    * (n_sessions, n_entities, n_events, bounce_sessions, bounce_rate,
    * mean_events, mean_duration_secs).
    *
    * Numerics: counts and per-session microsecond durations
    * (`unix_micros(max) − unix_micros(min)`, exact integers) fold
    * exactly; every reported mean/rate is ONE double division of
    * exact operands — engine-exact. Duration sums ride DECIMAL(28,0)
    * (headroom ~10²² µs ≈ 300 My of summed session time).
    *
    * Scale: [[sessionIds]]' single key-partitioned window pass, one
    * (key, session) aggregate (map-side combinable), one global
    * reduce. */
  def sessionStats(df: DataFrame, ts: String, key: String,
      tieBreak: String, gapSeconds: Long): DataFrame = {
    val sid = sessionIds(
      df.filter(col(key).isNotNull && col(ts).isNotNull),
      ts, key, tieBreak, gapSeconds)
    val per = sid.groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("__n"),
        (unix_micros(max(col(ts))) - unix_micros(min(col(ts))))
          .as("__durus"))
    def dbl(c: Column): Column = c.cast("string").cast("double")
    per.agg(count(lit(1)).as("n_sessions"),
        countDistinct(col(key)).as("n_entities"),
        sum(col("__n")).as("n_events"),
        sum(when(col("__n") === 1, 1L).otherwise(0L))
          .as("bounce_sessions"),
        sum(col("__durus").cast("decimal(19,0)")).cast("decimal(28,0)")
          .as("__dur"))
      .select(col("n_sessions"), col("n_entities"), col("n_events"),
        col("bounce_sessions"),
        (col("bounce_sessions").cast("double") /
          col("n_sessions").cast("double")).as("bounce_rate"),
        (col("n_events").cast("double") /
          col("n_sessions").cast("double")).as("mean_events"),
        (dbl(col("__dur")) /
          (col("n_sessions").cast("double") * 1000000.0))
          .as("mean_duration_secs"))
  }

  /** First-order path transition matrix — the Markov view of user
    * journeys ("after a view, what happens next, and how often?"):
    * per key, events order by (ts, state) and each consecutive pair
    * emits a (from, to) transition; every key's first event arrives
    * from the `__start` pseudo-state and its last departs to `__end`,
    * so walk entry and exit probabilities read from the same table.
    * `prob = n / Σ n over from` is ONE division of exact counts.
    *
    * Determinism: ties at one timestamp order by state (then the pair
    * is state-identical and order-free); exact integer counts make
    * the table identical at any partitioning. Scale: one per-key
    * window pass (lag/lead) + one (from, to)-keyed count — the output
    * is |states|²-sized, report-shaped. Returns (from, to, n, prob)
    * ordered by (from, to). */
  def pathTransitions(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(stateCol).cast("string").as("__s"))
      .filter(col("__k").isNotNull && col("__ts").isNotNull &&
        col("__s").isNotNull)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__s"))
    val steps = base
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .withColumn("__next", lead(col("__s"), 1).over(w))
    val inner = steps.select(
      coalesce(col("__prev"), lit("__start")).as("from"),
      col("__s").as("to"))
    val exits = steps.filter(col("__next").isNull)
      .select(col("__s").as("from"), lit("__end").as("to"))
    val counts = inner.unionByName(exits)
      .groupBy(col("from"), col("to")).agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from"))
    counts
      .select(col("from"), col("to"), col("n"),
        (col("n").cast("double") /
          sum(col("n")).over(wFrom).cast("double")).as("prob"))
      .orderBy(col("from"), col("to"))
  }
}
