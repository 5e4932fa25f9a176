package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Merge}

class MergeCdcSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert: new rows win, old-only rows survive") {
    val old = Seq((1L, "a", 10L), (2L, "b", 11L)).toDF("k", "v", "ver")
    val neu = Seq((2L, "B", 20L), (3L, "c", 21L)).toDF("k", "v", "ver")
    val out = Merge.upsert(old, neu, Seq("k"), Seq(col("ver")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("upsert prefers new side even on equal order key") {
    val old = Seq((1L, "old", 5L)).toDF("k", "v", "ver")
    val neu = Seq((1L, "new", 5L)).toDF("k", "v", "ver")
    val out = Merge.upsert(old, neu, Seq("k"), Seq(col("ver"))).collect()
    assert(out.head.getString(1) == "new")
  }

  test("upsert: new side wins even when the old row orders HIGHER") {
    // backfill correction: old row carries a larger version — Sqoop
    // MergeJob semantics say the new dataset still replaces it
    val old = Seq((1L, "stale", 10L)).toDF("k", "v", "ver")
    val neu = Seq((1L, "corrected", 5L)).toDF("k", "v", "ver")
    val out = Merge.upsert(old, neu, Seq("k"), Seq(col("ver"))).collect()
    assert(out.head.getString(1) == "corrected")
  }

  test("before-image audit flags a NULL before-image on an update") {
    val ops = Seq(
      (1L, Cdc.OpInsert, 1L, null.asInstanceOf[String], "a"),
      (1L, Cdc.OpUpdate, 2L, null.asInstanceOf[String], "b") // lost image
    ).toDF("k", "op", "seq", "before_img", "after_img")
    val bad = Cdc.beforeImageViolations(ops, Seq("k"), "op", col("seq"),
      "before_img", "after_img").collect()
    assert(bad.length == 1, "NULL before-image must be a violation")
    assert(bad.head.getAs[String]("expected_before") == "a")
  }

  test("cdc applyLog: delete drops key, latest update wins") {
    val ops = Seq(
      (1L, Cdc.OpInsert, 1L, 1.0), (1L, Cdc.OpUpdate, 2L, 2.0),
      (2L, Cdc.OpInsert, 3L, 3.0), (2L, Cdc.OpDelete, 4L, 0.0),
      (3L, Cdc.OpInsert, 5L, 5.0)
    ).toDF("k", "op", "seq", "v")
    val out = Cdc.applyLog(ops, Seq("k"), "op", Seq(col("seq")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2.0), (3L, 5.0)))
  }

  test("unionEvolved + applyLogEvolved: a later batch's added nullable " +
      "column back-fills NULL; integral widths widen; final state is " +
      "the evolved schema") {
    // batch 1: the original (k, op, seq, v:int) shape
    val b1 = Seq((1, Cdc.OpInsert, 1L, 10), (2, Cdc.OpInsert, 2L, 20))
      .toDF("k", "op", "seq", "v")
    // batch 2: source migrated — v widened int->long, new `tag` column
    val b2 = Seq((2L, Cdc.OpUpdate, 3L, 21L, "hot"),
      (3L, Cdc.OpInsert, 4L, 30L, "new"))
      .toDF("k", "op", "seq", "v", "tag")
    val st = Cdc.applyLogEvolved(Seq(b1, b2), Seq("k"), "op",
      Seq(col("seq")))
    assert(st.schema("v").dataType ==
      org.apache.spark.sql.types.LongType, "v must widen to long")
    assert(st.columns.toSeq == Seq("k", "op", "seq", "v", "tag"),
      "first-seen column order, added column last")
    val rows = st.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(3),
        Option(r.getString(4)).getOrElse("NULL")))
    // key 1 predates `tag` -> NULL; key 2 rewritten by batch 2 -> hot
    assert(rows.toSeq == Seq((1L, 10L, "NULL"), (2L, 21L, "hot"),
      (3L, 30L, "new")), rows.mkString(","))
  }

  test("unionEvolved rejects non-widening type drift loudly, naming " +
      "the column") {
    val b1 = Seq((1L, "a")).toDF("k", "v")
    val b2 = Seq((2L, 7L)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      Cdc.unionEvolved(Seq(b1, b2))
    }
    assert(ex.getMessage.contains("v (string vs bigint)"), ex.getMessage)
    // float->double IS sanctioned, in either encounter order
    val f = Seq((1L, 1.5f)).toDF("k", "x")
    val d = Seq((2L, 2.5)).toDF("k", "x")
    for (order <- Seq(Seq(f, d), Seq(d, f))) {
      val u = Cdc.unionEvolved(order)
      assert(u.schema("x").dataType ==
        org.apache.spark.sql.types.DoubleType)
      assert(u.count() == 2L)
    }
  }

  test("cdc netEffect summarizes without window shuffle") {
    val ops = Seq(
      (1L, Cdc.OpInsert, 1L), (1L, Cdc.OpDelete, 2L), (2L, Cdc.OpInsert, 3L)
    ).toDF("k", "op", "seq")
    val out = Cdc.netEffect(ops, Seq("k"), "op", col("seq"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2), r.getBoolean(3))).toSeq ==
      Seq((1L, "D", false), (2L, "I", true)))
  }

  test("before-image audit flags broken update chains") {
    val ops = Seq(
      // key 1: consistent chain I(→"a") U("a"→"b")
      (1L, Cdc.OpInsert, 1L, null.asInstanceOf[String], "a"),
      (1L, Cdc.OpUpdate, 2L, "a", "b"),
      // key 2: broken chain — update claims before="x" but prior after="c"
      (2L, Cdc.OpInsert, 3L, null.asInstanceOf[String], "c"),
      (2L, Cdc.OpUpdate, 4L, "x", "d")
    ).toDF("k", "op", "seq", "before_img", "after_img")
    val bad = Cdc.beforeImageViolations(ops, Seq("k"), "op", col("seq"),
      "before_img", "after_img").collect()
    assert(bad.length == 1)
    assert(bad.head.getLong(0) == 2L)
    assert(bad.head.getAs[String]("expected_before") == "c")
  }

  test("incremental append pushes the filter to the scan") {
    val df = Merge.incrementalAppend(Tables.events(spark, sf), "event_id", lit(500L))
    assert(df.count() == Tables.events(spark, sf)
      .filter(col("event_id") > 500).count())
  }

  test("scd2: validity intervals, delete closes without opening, ties by seq") {
    import java.sql.Timestamp
    def t(min: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    val log = Seq(
      (1L, "I", t(0), 10.0, 1L), (1L, "U", t(5), 20.0, 2L),
      (1L, "D", t(9), 0.0, 3L),                       // closes, no row
      (2L, "I", t(1), 5.0, 4L),                       // still current
      (3L, "I", t(2), 1.0, 5L), (3L, "U", t(2), 2.0, 6L)) // same ts, seq tie
      .toDF("k", "op", "ts", "v", "seq")
    val got = Cdc.scd2(log, Seq("k"), "op", "ts", Seq(col("seq")))
      .select(col("k"), col("valid_from"), col("valid_to"), col("v"),
        col("is_current"))
      .orderBy(col("k"), col("valid_from"), col("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (1L, t(0), Some(t(5)), 10.0, false),
      (1L, t(5), Some(t(9)), 20.0, false),   // closed BY the delete
      (2L, t(1), None, 5.0, true),
      (3L, t(2), Some(t(2)), 1.0, false),    // tie: earlier seq closed at same ts
      (3L, t(2), None, 2.0, true)))
  }
}
