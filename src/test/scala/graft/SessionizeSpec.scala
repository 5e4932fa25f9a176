package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("gap boundary: exact-gap event MERGES, gap+1s starts a new session") {
    // pins Spark's closed-interval merge semantics: an event exactly
    // `gap` after the previous one stays in the session; one second more
    // starts a new session — the lag/sum oracle formulation uses `>`
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(mins: Int, secs: Int = 0) =
      new Timestamp(t0.getTime + mins * 60000L + secs * 1000L)
    val df = Seq(
      (1L, 1L, t0),
      (1L, 2L, plus(30)),          // exactly 30 min later → merges (closed boundary)
      (1L, 3L, plus(60, 1))        // 30:01 after event 2 → NEW session
    ).toDF("user_id", "event_id", "ts")

    val sw = Sessionize.sessions(df, "ts", "user_id", "30 minutes")
      .orderBy("session_start")
      .collect().map(_.getLong(2)).toSeq
    assert(sw == Seq(2L, 1L), s"session_window events per session: $sw")

    // the portable lag/sum formulation must agree on the boundary
    val ids = Sessionize.sessionIds(df, "ts", "user_id", "event_id", 1800L)
      .groupBy("session_id").agg(count(lit(1)).as("n"))
      .orderBy("session_id")
      .collect().map(_.getLong(1)).toSeq
    assert(ids == Seq(2L, 1L), s"sessionIds events per session: $ids")
  }

  test("session_window and sessionIds agree on real event data") {
    val ev = Tables.events(spark, sf)
    val a = Sessionize.sessions(ev, "ts", "user_id", "30 minutes")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val b = Sessionize.sessionIds(ev, "ts", "user_id", "event_id", 1800L)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("intervalCoverage: overlapping and touching intervals merge, " +
      "gaps split segments, null keys drop, exact microseconds") {
    import spark.implicits._
    // u: [0,300)+[100,400)+[400,700) chain (touch merges) then a gap to
    // [1000,1300); v: a single interval; one null-key row ignored
    val rows = Seq(("u", 0L), ("u", 100L), ("u", 400L), ("u", 1000L),
      ("v", 5L)).toDF("key", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .unionByName(Seq(("x", 7L)).toDF("key", "sec")
        .withColumn("ts", timestamp_seconds(col("sec")))
        .withColumn("key", lit(null: String)))
    val got = Sessionize.intervalCoverage(rows, "key", "ts",
        durationUs = 300000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "u" -> ((1000000000L, 2L)), // 700s + 300s covered, 2 segments
      "v" -> ((300000000L, 1L))))
    // partitioning-invariant
    val re = Sessionize.intervalCoverage(rows.repartition(7), "key",
        "ts", 300000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(re === got)
  }

  test("intervalGaps: two islands yield one gap of the exact silence; " +
      "a single-segment key reports 0 gaps and NULL max") {
    import spark.implicits._
    import graft.operators.Sessionize
    // 5-minute intervals: 10:00 and 10:02 merge; 10:20 is an island →
    // gap = 10:20 − 10:07 = 13 min = 780e6 us
    val ev = Seq(
      ("u1", "2024-01-01 10:00:00"), ("u1", "2024-01-01 10:02:00"),
      ("u1", "2024-01-01 10:20:00"),
      ("u2", "2024-01-01 09:00:00"))
      .toDF("user_id", "tss")
      .select(col("user_id"), col("tss").cast("timestamp").as("ts"))
    val got = Sessionize.intervalGaps(ev, "user_id", "ts",
        durationUs = 300000000L)
      .orderBy("key").collect()
    assert(got(0).getLong(1) === 1L)
    assert(got(0).getLong(2) === 780000000L)
    assert(got(0).getLong(3) === 780000000L)
    assert(got(1).getLong(1) === 0L && got(1).getLong(2) === 0L &&
      got(1).isNullAt(3))
  }

  test("sessionStats: bounces, per-session events and exact mean " +
      "duration over the portable gap sessions") {
    import java.sql.Timestamp
    def at(min: Int): Timestamp =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        min * 60000L)
    // u1: events at 0, 10 (one session, 600 s), then 120 -> new
    // session (bounce); u2: single event (bounce)
    val df = Seq(
      (1L, at(0), 1L), (1L, at(10), 2L), (1L, at(120), 3L),
      (2L, at(5), 4L)).toDF("u", "ts", "eid")
    val got = graft.operators.Sessionize.sessionStats(df, "ts", "u",
      "eid", gapSeconds = 1800L).head()
    assert(got.getLong(0) === 3L)               // sessions
    assert(got.getLong(1) === 2L)               // entities
    assert(got.getLong(2) === 4L)               // events
    assert(got.getLong(3) === 2L)               // bounces
    assert(got.getDouble(4) === 2.0 / 3.0)      // bounce rate
    assert(got.getDouble(5) === 4.0 / 3.0)      // mean events
    assert(got.getDouble(6) === 600.0 / 3.0)    // mean duration secs
    // partitioning invariance
    val re = graft.operators.Sessionize.sessionStats(df.repartition(5),
      "ts", "u", "eid", gapSeconds = 1800L).head()
    assert(re.getDouble(6) === got.getDouble(6))
  }

  test("pathTransitions: start/end pseudo-states, exact counts, row " +
      "probabilities sum to 1 per source; partitioning-invariant") {
    val df = Seq(("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "a"),
      ("u2", 1L, "b")).toDF("u", "ts", "s")
    val got = Sessionize.pathTransitions(df, "u", "ts", "s")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("__start", "a", 1L, 0.5), ("__start", "b", 1L, 0.5),
      ("a", "__end", 1L, 0.5), ("a", "b", 1L, 0.5),
      ("b", "__end", 1L, 0.5), ("b", "a", 1L, 0.5)))
    // probabilities sum to 1 within every source state
    val sums = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(sums.values.forall(s => math.abs(s - 1.0) < 1e-12))
    val re = Sessionize.pathTransitions(df.repartition(7), "u", "ts",
      "s").collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(re.toSeq === got.toSeq)
  }
}
