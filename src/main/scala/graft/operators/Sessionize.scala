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
}
