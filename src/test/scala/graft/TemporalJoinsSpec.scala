package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof backward picks latest right row at-or-before left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "o1"),
      (1L, ts("2024-01-01 12:00:00"), "o2"),
      (2L, ts("2024-01-01 09:00:00"), "o3") // no event at or before
    ).toDF("k", "lts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // equal ts → inclusive match
      (1L, ts("2024-01-01 11:00:00"), 102L),
      (2L, ts("2024-01-01 09:30:00"), 200L)
    ).toDF("k", "rts", "eid")
    val out = TemporalJoins.asofBackward(left, right, "k", "lts", "rts",
        Seq("eid"), "eid")
      .orderBy("name").collect()
      .map(r => (r.getAs[String]("name"), Option(r.get(r.fieldIndex("asof_eid")))))
    assert(out.toSeq == Seq(
      ("o1", Some(101L)),  // inclusive: equal-ts event wins over 09:30
      ("o2", Some(102L)),
      ("o3", None)))
  }

  test("asof forward picks earliest right row at-or-after left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "o1"),
      (1L, ts("2024-01-01 12:00:00"), "o2"), // no event at or after
      (2L, ts("2024-01-01 09:00:00"), "o3")
    ).toDF("k", "lts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // equal ts → inclusive match
      (1L, ts("2024-01-01 11:00:00"), 102L),
      (2L, ts("2024-01-01 09:30:00"), 200L)
    ).toDF("k", "rts", "eid")
    val out = TemporalJoins.asofForward(left, right, "k", "lts", "rts",
        Seq("eid"), "eid")
      .orderBy("name").collect()
      .map(r => (r.getAs[String]("name"), Option(r.get(r.fieldIndex("asof_eid")))))
    assert(out.toSeq == Seq(
      ("o1", Some(101L)),  // inclusive: equal-ts event beats 11:00
      ("o2", None),        // nothing follows
      ("o3", Some(200L))))
  }

  test("asof forward mirrors backward on reversed time") {
    // forward(t) on data D == backward(-t) on time-negated D: check the
    // two agree on real events via the mirror
    val ev = Tables.events(spark, sf).limit(500)
      .select(col("user_id").as("k"), col("ts"), col("event_id"))
    val probes = ev.select(col("k"), col("ts").as("lts")).limit(50)
    val fwd = TemporalJoins.asofForward(probes, ev, "k", "lts", "ts",
        Seq("event_id"), "event_id")
      .select(col("k"), col("lts"), col("asof_event_id"))
    val neg = (c: org.apache.spark.sql.Column) => -unix_timestamp(c)
    val evN = ev.select(col("k"), neg(col("ts")).as("nts"), col("event_id"))
    val probesN = probes.select(col("k"), neg(col("lts")).as("nlts"),
      col("lts"))
    val bwd = TemporalJoins.asofBackward(probesN, evN, "k", "nlts", "nts",
        Seq("event_id"), "event_id")
      .select(col("k"), col("lts"), col("asof_event_id"))
    assert(fwd.exceptAll(bwd).isEmpty && bwd.exceptAll(fwd).isEmpty)
  }

  test("asof: a tie-break column outside the payload resolves") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "lts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "old", 1L),
      (1L, ts("2024-01-01 09:00:00"), "new", 2L)) // same ts, higher seq wins
      .toDF("k", "rts", "v", "seq")
    val out = TemporalJoins.asofBackward(left, right, "k", "lts", "rts",
      rightPayload = Seq("v"), rightTieBreak = "seq")
    assert(out.select("asof_v").head().getString(0) == "new")
  }

  test("interval join tolerates identical column names on both sides") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "L"))
      .toDF("k", "ts", "tag")
    val r = Seq((1L, ts("2024-01-01 10:30:00"), "R"),
      (1L, ts("2024-01-01 12:30:00"), "far"))
      .toDF("k", "ts", "tag")
    val out = TemporalJoins.intervalJoin(l, r, "k", "ts", "ts", 3600L)
    assert(out.count() == 1)
    val row = out.select("tag", "tag_r").head()
    assert(row.getString(0) == "L" && row.getString(1) == "R")
  }

  test("interval join equals brute-force theta join") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), $"ts".as("p_ts"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts".as("e_ts"))
    val bucketed = TemporalJoins.intervalJoin(
        purchases, errors, "user_id", "p_ts", "e_ts", 3600L)
      .select("p_id", "e_ts")
    val brute = purchases.join(errors, Seq("user_id"))
      .filter(abs($"p_ts".cast("double") - $"e_ts".cast("double")) <= 3600.0)
      .select("p_id", "e_ts")
    assert(bucketed.except(brute).isEmpty && brute.except(bucketed).isEmpty)
    assert(bucketed.count() == brute.count())
  }
}
