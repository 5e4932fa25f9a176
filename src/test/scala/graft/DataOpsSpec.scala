package graft

import org.apache.spark.sql.functions._
import graft.operators.{Anomaly, Cdc, Dedup, Expectations, Experiment, Regression, Skew, Survival, TimeSeries}

/** Table-versioning and data-quality operators: snapshot diff (the
  * inverse of CDC apply) and single-pass expectations reports. */
class DataOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val before = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "s", "v")
  private val after = Seq(
    (1L, "a", 10.0),           // unchanged → absent from the diff
    (2L, "b", 25.0),           // U
    (4L, "dd", 40.0),          // U (string field)
    (5L, "e", 50.0))           // I; 3 deleted
    .toDF("k", "s", "v")

  test("snapshotDiff emits the minimal I/U/D log") {
    val got = Cdc.snapshotDiff(before, after, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (2L, "b", 25.0, "U"),
      (3L, "c", 30.0, "D"),
      (4L, "dd", 40.0, "U"),
      (5L, "e", 50.0, "I")))
  }

  test("incrementalAgg folds an imaged diff into a rollup: moves, " +
      "deletes, group death, and incremental ≡ recompute") {
    // groups: a{1,2}, b{3}, c{4}; after: 2 moves a→b (group-moving U),
    // 3 deletes (group c... wait 3 is b) — build explicitly:
    val v1 = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
      (4L, "c", 40.0)).toDF("k", "g", "v")
    val v2 = Seq((1L, "a", 11.0),   // U in place
      (2L, "b", 20.0),              // U moving a→b
      (5L, "a", 5.0))               // I; 3 (b) and 4 (c: group dies) D
      .toDF("k", "g", "v")
    val prior = v1.groupBy("g")
      .agg(count(lit(1)).as("n"), graft.dsum(col("v"), 6).as("sum_v"))
    val log = Cdc.snapshotDiffImaged(v1, v2, Seq("k"))
    val got = Cdc.incrementalAgg(prior, log, "g", "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = v2.groupBy("g")
      .agg(count(lit(1)).as("n"), graft.dsum(col("v"), 6).as("sum_v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq)
    assert(got.toSeq === Seq(("a", 2L, 16.0), ("b", 1L, 20.0)),
      "group c must die with its last row; the move lands in b")
  }

  test("incrementalAgg deltas commute: diff-before-inserts converges to " +
      "the same rollup once both batches land") {
    val v1 = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("k", "g", "v")
    val v2 = Seq((1L, "a", 11.0), (2L, "b", 20.0), (5L, "a", 5.0))
      .toDF("k", "g", "v")
    val ins = Cdc.snapshotDiffImaged(v1.limit(0), v1, Seq("k"))
    val dif = Cdc.snapshotDiffImaged(v1, v2, Seq("k"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_v",
          org.apache.spark.sql.types.DoubleType))))
    def apply2(first: org.apache.spark.sql.DataFrame,
        second: org.apache.spark.sql.DataFrame) = {
      val mid = Cdc.incrementalAgg(empty, first, "g", "v",
        pruneEmpty = false)
      Cdc.incrementalAgg(mid, second, "g", "v", pruneEmpty = false)
        .filter(col("n") > 0)
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    val want = v2.groupBy("g")
      .agg(count(lit(1)).as("n"), graft.dsum(col("v"), 6).as("sum_v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(apply2(ins, dif) === want)
    assert(apply2(dif, ins) === want,
      "reversed arrival order must converge to the same state")
  }

  test("snapshotDiff round-trips: applyLog(before ++ diff) == after") {
    val diff = Cdc.snapshotDiff(before, after, Seq("k"))
    // seed ops (the standing snapshot as inserts at t=0) + the diff at t=1
    val ops = before.withColumn("op", lit("I")).withColumn("t", lit(0))
      .unionByName(diff.withColumn("t", lit(1)))
    val applied = Cdc.applyLog(ops, Seq("k"), "op", Seq(col("t")))
      .select("k", "s", "v").orderBy("k").collect().toSeq
    val want = after.orderBy("k").collect().toSeq
    assert(applied === want)
  }

  test("snapshotDiff handles null values null-safely") {
    val b = Seq((1L, Some("x")), (2L, None: Option[String])).toDF("k", "s")
    val a = Seq((1L, None: Option[String]), (2L, None: Option[String])).toDF("k", "s")
    val got = Cdc.snapshotDiff(b, a, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    // key 2: null == null → unchanged; key 1: x → null is an update
    assert(got.toSeq === Seq((1L, "U")))
  }

  test("snapshotDiff rejects mismatched schemas and bad keys") {
    intercept[IllegalArgumentException](
      Cdc.snapshotDiff(before, after.drop("v"), Seq("k")))
    intercept[IllegalArgumentException](
      Cdc.snapshotDiff(before, after, Seq("nope")))
  }

  test("expectations: single pass, violation counting, tolerance") {
    val df = Seq((1, 10), (2, -5), (3, 200), (4, 30)).toDF("id", "x")
    val got = Expectations.report(df, Seq(
        Expectations.Check("x_positive", col("x") > 0),
        Expectations.Check("x_small", col("x") < 100, maxViolationRate = 0.3),
        Expectations.Check("id_low", col("id") <= 4)))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4)))
    assert(got.toSeq === Seq(
      ("id_low", 4L, 0L, 0.0, true),
      ("x_positive", 4L, 1L, 0.25, false),
      ("x_small", 4L, 1L, 0.25, true))) // 0.25 <= 0.3 tolerance
  }

  test("expectations: NULL predicate counts as a violation; empty passes") {
    val df = Seq(Some(1), None, Some(3)).toDF("x")
    val got = Expectations.report(df,
        Seq(Expectations.Check("x_odd", col("x") % 2 === 1)))
      .head()
    assert(got.getLong(2) === 1L) // only the NULL row violates
    val empty = Expectations.report(df.filter(lit(false)),
      Seq(Expectations.Check("any", lit(true))))
    assert(empty.head().getBoolean(4))
  }

  test("uniquenessReport counts rows beyond the first per duplicate key") {
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"))
      .toDF("k", "p")
    val r = Expectations.uniquenessReport(df, Seq("k")).head()
    assert(r.getLong(1) === 5L && r.getLong(2) === 2L)
    assert(!r.getBoolean(4))
    val ok = Expectations.uniquenessReport(df.dropDuplicates("k"), Seq("k"))
      .head()
    assert(ok.getLong(2) === 0L && ok.getBoolean(4))
  }

  test("groupBottomK equals the rank-window formulation on real documents") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val got = Dedup.groupBottomK(docs, "source", "doc_id", 7)
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // pre-reduced form of (doc_id·2654435761) mod 1000003 — same values,
    // overflow-free for any Long id (427799 = 2654435761 mod 1000003)
    val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(427799L),
      lit(1000003L))
    val want = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(h, col("doc_id"))))
      .where(col("rn") <= 7)
      .select(col("source"), col("doc_id").cast("long"))
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got === want)
  }

  test("groupBottomK: k beyond group size keeps whole group; " +
      "partitioning-invariant; null ids skipped") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 9L))
      .toDF("g", "id")
    val all = Dedup.groupBottomK(df, "g", "id", 10)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(all.toSeq === Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 9L)))

    val p1 = Dedup.groupBottomK(df.repartition(1), "g", "id", 2)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    val p7 = Dedup.groupBottomK(df.repartition(7), "g", "id", 2)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(p1.toSeq === p7.toSeq,
      "the sample must be a function of the input set, not the partitioning")

    val withNull = Seq(("a", java.lang.Long.valueOf(1L)),
      ("a", null.asInstanceOf[java.lang.Long])).toDF("g", "id")
    val r = Dedup.groupBottomK(withNull, "g", "id", 5).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq === Seq(("a", 1L)))
  }

  test("keyProfile: top-N, share, tie-break by key, exact count percentiles") {
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val df = rows.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "x")
    val got = Skew.keyProfile(df, col("k"), 3).collect()
    assert(got.length === 3)
    val first = got(0)
    assert(first.getLong(0) === 1L && first.getString(1) === "a" &&
      first.getLong(2) === 5L)
    assert(first.getDouble(3) === 0.416667)          // 5/12 rounded
    assert(first.getLong(4) === 4L)                  // distinct keys
    assert(first.getLong(5) === 12L)                 // total rows
    assert(first.getLong(6) === 5L)                  // max
    assert(first.getDouble(7) === 3.0)               // p50 of [1,3,3,5]
    assert(first.getDouble(8) === 4.94)              // 3 + 0.97*(5-3)
    // count tie between b and c breaks by key ascending
    assert(got(1).getString(1) === "b" && got(2).getString(1) === "c")
  }

  test("groupTopKByScore equals rank-window-desc; null skipped; NaN above Inf") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val got = Dedup.groupTopKByScore(docs, "lang", "doc_id", "n_chars", 4)
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang")
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .where(col("rn") <= 4)
      .select(col("lang"), col("doc_id").cast("long"))
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got === want)

    val edge = Seq(
      ("g", 1L, Double.NaN), ("g", 2L, Double.PositiveInfinity),
      ("g", 3L, 5.0), ("g", 4L, Double.NegativeInfinity))
      .toDF("g", "id", "score")
    val top2 = Dedup.groupTopKByScore(edge, "g", "id", "score", 2)
      .collect().map(_.getLong(1)).toSet
    assert(top2 === Set(1L, 2L), "NaN must rank above +Inf, like Spark sort")

    val withNull = Seq(("g", 1L, Option(1.0)), ("g", 2L, Option.empty[Double]))
      .toDF("g", "id", "score")
    val r = Dedup.groupTopKByScore(withNull, "g", "id", "score", 5)
      .collect().map(_.getLong(1)).toSeq
    assert(r === Seq(1L), "null scores cannot be selected")
  }

  test("rateAnomalies: planted spike flags, series start and flat " +
      "baseline stay null") {
    import java.sql.Timestamp
    def hour(h: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * 3600000L)
    // 20 hourly buckets alternating 2/4 events, then a 40-event spike
    val calm = (0 until 20).flatMap { h =>
      (0 until (if (h % 2 == 0) 2 else 4)).map(i => ("err", hour(h)))
    }
    val spike = (0 until 40).map(i => ("err", hour(20)))
    // a second, CONSTANT series: zero variance -> never flagged
    val flat = (0 until 22).flatMap { h =>
      (0 until 3).map(i => ("ok", hour(h)))
    }
    val df = (calm ++ spike ++ flat).toDF("event_type", "ts")
    val out = Anomaly.rateAnomalies(df, "event_type", "ts", "hour",
        lookback = 12, minPoints = 8, zThreshold = 3.0)
      .orderBy(col("series"), col("bucket")).collect()

    val err = out.filter(_.getString(0) == "err")
    // first minPoints buckets of the series have no baseline
    assert(err.take(8).forall(_.isNullAt(5)), "series start must be null-z")
    val spikeRow = err.last
    assert(spikeRow.getLong(2) === 40L)
    assert(spikeRow.getBoolean(6), s"spike must flag, z=${spikeRow.get(5)}")
    assert(spikeRow.getDouble(5) > 3.0)
    // calm alternation never flags
    assert(err.init.forall(!_.getBoolean(6)))

    val ok = out.filter(_.getString(0) == "ok")
    assert(ok.forall(!_.getBoolean(6)))
    assert(ok.drop(8).forall(_.isNullAt(5)),
      "zero-variance baseline must yield null z, not infinity")
  }

  test("histogram: half-open bins, under/overflow, nulls excluded, shares") {
    val df = Seq(Some(-1.0), Some(0.0), Some(2.5), Some(4.999), Some(5.0),
      Some(10.0), Some(12.0), None).toDF("x")
    val got = Expectations.histogram(df, col("x"), 0.0, 10.0, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getDouble(4))).toSeq
    assert(got === Seq(
      (-1L, 1L, None, Some(0.0), 0.142857),        // underflow
      (0L, 3L, Some(0.0), Some(5.0), 0.428571),    // [0,5): 0, 2.5, 4.999
      (1L, 1L, Some(5.0), Some(10.0), 0.142857),   // [5,10): 5.0
      (2L, 2L, Some(10.0), None, 0.285714)))       // >= hi incl. 10.0 exactly
  }

  test("histogram: NaN rows are skipped, ±Infinity bins as under/overflow " +
      "— a non-finite value must never kill the profiling job") {
    val df = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.0, 7.0).toDF("x")
    val got = Expectations.histogram(df, col("x"), 0.0, 10.0, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq(
      (-1L, 1L),  // -Inf -> underflow
      (0L, 1L),   // 1.0
      (1L, 1L),   // 7.0
      (2L, 1L)))  // +Inf -> overflow; NaN contributes nowhere
  }

  test("quantileBins: equal-frequency deciles, boundary goes low, " +
      "non-finite rows skipped") {
    val df = ((1 to 100).map(_.toDouble) ++
      Seq(Double.NaN)).map(Option(_)).toDF("x")
    val got = Expectations.quantileBins(df, col("x"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    // cuts at p25/p50/p75 of 1..100 = 25.75, 50.5, 75.25; `<= cut` puts
    // 25/50/75 in the lower bin -> 25 rows per bin, NaN contributes none
    assert(got === Seq(
      (1L, 25L, 1.0, 25.0), (2L, 25L, 26.0, 50.0),
      (3L, 25L, 51.0, 75.0), (4L, 25L, 76.0, 100.0)))
  }

  test("winsorize: tails clip to the percentile cuts, NaN and NULL " +
      "pass through, clashing output name rejected") {
    val df = ((1 to 100).map(i => Option(i.toDouble)) ++
      Seq(Some(Double.NaN), None)).toDF("x")
    val out = Expectations.winsorize(df, col("x"), 0.1, 0.9, "xw")
    val m = out.filter(col("x").isNotNull && !isnan(col("x")))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // interpolated cuts of 1..100: p10 ≈ 10.9, p90 ≈ 90.1; tails must
    // clip to EXACTLY the percentile aggregate's own doubles
    val cuts = df.filter(col("x").isNotNull && !isnan(col("x")))
      .agg(percentile(col("x"), lit(Array(0.1, 0.9))))
      .head().getSeq[Double](0)
    assert(math.abs(cuts(0) - 10.9) < 1e-9 &&
      math.abs(cuts(1) - 90.1) < 1e-9)
    assert(m(1.0) === cuts(0) && m(5.0) === cuts(0))
    assert(m(50.0) === 50.0)
    assert(m(95.0) === cuts(1) && m(100.0) === cuts(1))
    assert(out.filter(isnan(col("xw"))).count() === 1L)
    assert(out.filter(col("xw").isNull).count() === 1L)
    intercept[IllegalArgumentException] {
      Expectations.winsorize(out, col("x"), 0.1, 0.9, "xw")
    }
  }

  test("robustOutliers: median/MAD flags the planted spike, zero-MAD " +
      "series never flags, clash rejected") {
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0)) ++ Seq(("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0)))
      .toDF("g", "v")
    val out = Anomaly.robustOutliers(df, "g", col("v"))
    val a = out.filter(col("g") === "a").orderBy("v").collect()
    // series a: median 3, |v-3| = [2,1,0,1,97] -> MAD 1
    assert(a.forall(r => r.getDouble(2) === 3.0 && r.getDouble(3) === 1.0))
    val spike = a.last
    assert(spike.getDouble(4) === 65.4265 && spike.getBoolean(5),
      s"spike z=${spike.get(4)}")
    assert(a.init.forall(!_.getBoolean(5)), "body must not flag")
    // series b: median 5, deviations [0,0,0,4] -> MAD 0 -> null z
    val b = out.filter(col("g") === "b").collect()
    assert(b.forall(r => r.isNullAt(4) && !r.getBoolean(5)),
      "zero-MAD series must yield null z, never a flag")
    intercept[IllegalArgumentException] {
      Anomaly.robustOutliers(out, "g", col("v"))
    }
  }

  test("mutualInfo: independent columns give zero MI, dependent give " +
      "positive, nulls are a class") {
    // independent: every (a, b) combination equally likely
    val ind = (for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val mi0 = Expectations.mutualInfo(ind, "a", "b")
      .agg(sum("mi_part")).head().getDouble(0)
    assert(math.abs(mi0) < 1e-9, s"independent MI must be 0, got $mi0")
    // perfectly dependent: b = f(a) -> MI = H(a) = ln 2 for a fair coin
    val dep = ((1 to 10).map(_ => ("x", "u")) ++
      (1 to 10).map(_ => ("y", "v"))).toDF("a", "b")
    val mi1 = Expectations.mutualInfo(dep, "a", "b")
      .agg(sum("mi_part")).head().getDouble(0)
    assert(math.abs(mi1 - math.log(2)) < 1e-5, s"MI=ln2 expected, $mi1")
    val withNull = Seq(("x", Some("u")), ("x", None), ("y", Some("u")))
      .toDF("a", "b")
    val rows = Expectations.mutualInfo(withNull, "a", "b").collect()
    assert(rows.exists(_.getString(1) == "__null__"),
      "null category must profile as its own class")
  }

  test("resample: an OBSERVED bucket whose aggregate is null stays null " +
      "— LOCF fills only calendar holes, it invents nothing") {
    import java.sql.Timestamp
    def hour(h: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * 3600000L)
    val df = Seq(
      ("a", hour(0), Some(10.0)),
      ("a", hour(2), None: Option[Double]), // observed, all-null values
      ("a", hour(4), Some(7.0)))
      .toDF("g", "ts", "value")
    val got = TimeSeries.resample(df, "g", "ts", sum(col("value")))
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got === Seq(
      (1L, Some(10.0)),  // observed
      (0L, Some(10.0)),  // hole: carries the last observation
      (1L, None),        // OBSERVED null aggregate: emitted as null
      (0L, None),        // hole after an observed-null: carries the null
      (1L, Some(7.0))))  // observed
  }

  test("timeWeightedAvg: step-function integral over uneven intervals, " +
      "singletons report null, last reading carries no weight") {
    import java.sql.Timestamp
    def at(sec: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000L)
    val df = Seq(
      ("a", at(0), Some(10.0)), ("a", at(10), Some(20.0)),
      ("a", at(40), Some(99.0)),     // last obs: no interval, no weight
      ("b", at(5), Some(7.0)),       // singleton
      ("c", at(0), Some(1.0)), ("c", at(3), None)) // null obs skipped
      .toDF("g", "ts", "v")
    val got = TimeSeries.timeWeightedAvg(df, "g", "ts", col("v"))
      .orderBy("series").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // a: (10·10 + 20·30) / 40 = 17.5 — 99.0 never enters
    assert(got.toSeq === Seq(
      ("a", 3L, 40.0, Some(17.5)),
      ("b", 1L, 0.0, None),
      ("c", 1L, 0.0, None))) // the null obs is missing, c is a singleton
  }

  test("groupBottomK default hash survives ids past 2^32 under ANSI mode " +
      "— pre-reduced modular multiply never overflows a Long") {
    val huge = Seq(("g", 5000000000L), ("g", Long.MaxValue),
      ("g", 9999999999L), ("g", 1L)).toDF("g", "id")
    val got = Dedup.groupBottomK(huge, "g", "id", 2)
      .collect().map(_.getLong(1)).toSet
    // values, not a crash: the pre-reduced hash equals (id·A) mod M
    def h(id: Long) = BigInt(id) * BigInt(2654435761L) mod BigInt(1000003L)
    val want = Seq(5000000000L, Long.MaxValue, 9999999999L, 1L)
      .sortBy(id => (h(id), id)).take(2).toSet
    assert(got === want)
  }

  test("resample: holes become zero-count rows, values carry forward, " +
      "spans are per-series") {
    import java.sql.Timestamp
    def hour(h: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * 3600000L)
    val df = Seq(
      ("a", hour(0), 10.0), ("a", hour(0), 20.0),  // bucket 0: n=2, v=30
      ("a", hour(3), 5.0),                         // holes at 1, 2
      ("b", hour(5), 1.0))                         // own 1-bucket span
      .toDF("g", "ts", "value")
    val got = TimeSeries.resample(df, "g", "ts",
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6))
      .orderBy(col("series"), col("bucket"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", hour(0), 2L, 30.0),
      ("a", hour(1), 0L, 30.0),   // filled, value carried
      ("a", hour(2), 0L, 30.0),
      ("a", hour(3), 1L, 5.0),
      ("b", hour(5), 1L, 1.0)))   // b's calendar never bleeds into a's
  }

  test("rateAnomalies dense+twoSided: a total-outage hour flags as a drop") {
    import java.sql.Timestamp
    def hour(h: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * 3600000L)
    // steady 3-or-5 events/hour, hour 15 completely MISSING, then resumes
    val rows = (0 until 20).filter(_ != 15).flatMap { h =>
      (0 until (if (h % 2 == 0) 3 else 5)).map(_ => ("err", hour(h)))
    }
    val df = rows.toDF("event_type", "ts")
    val sparse = Anomaly.rateAnomalies(df, "event_type", "ts", "hour",
      lookback = 12, minPoints = 8, zThreshold = 3.0)
    // without densification the outage hour does not even EXIST
    assert(sparse.filter(col("bucket") === hour(15)).isEmpty)
    val dense = Anomaly.rateAnomalies(df, "event_type", "ts", "hour",
      lookback = 12, minPoints = 8, zThreshold = 3.0,
      dense = true, twoSided = true)
    val outage = dense.filter(col("bucket") === hour(15)).head()
    assert(outage.getLong(2) === 0L)
    assert(outage.getDouble(5) < -3.0, s"z=${outage.get(5)}")
    assert(outage.getBoolean(6), "the drop must flag")
    // one-sided scoring must NOT flag the same drop
    val oneSided = Anomaly.rateAnomalies(df, "event_type", "ts", "hour",
      lookback = 12, minPoints = 8, zThreshold = 3.0, dense = true)
      .filter(col("bucket") === hour(15)).head()
    assert(!oneSided.getBoolean(6))
  }

  test("rollingDistinct: exact below sketch capacity, window unions " +
      "across days, partitioning-invariant") {
    // series X: users 1..10 on day 1, 6..15 on day 2, 100 on day 5
    val ts = (d: Int, u: Int) =>
      (s"X", java.sql.Timestamp.valueOf(f"2024-03-0$d 12:00:00"), u.toLong)
    val rows = (1 to 10).map(ts(1, _)) ++ (6 to 15).map(ts(2, _)) :+
      ts(5, 100)
    val df = rows.toDF("series", "ts", "uid")
    val got = TimeSeries.rollingDistinct(df, "series", "ts", "uid",
        window = 3)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // day1: 10/10; day2: 10 distinct, rolling |1..15| = 15;
    // day5: window [3,5] sees only day5 → 1/1
    assert(got.toSeq === Seq((10L, 10L), (10L, 15L), (1L, 1L)))
    val again = TimeSeries.rollingDistinct(df.repartition(7), "series",
        "ts", "uid", window = 3)
      .orderBy("bucket").collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(again.toSeq === got.toSeq)
  }

  test("populationStability: identical distributions score ~0, a planted " +
      "shift scores large; empty-side bins yield NULL psi") {
    val ref = (1 to 2000).map(i => (i % 100).toDouble).toDF("v")
    // same distribution → every bin share matches → psi ≈ 0
    val same = Expectations.populationStability(ref, ref, col("v"), bins = 10)
      .agg(sum(col("psi_part"))).head().getDouble(0)
    assert(math.abs(same) < 1e-12, s"identical corpora drifted: $same")
    // shifted distribution → mass leaves low bins for the top bin
    val shifted = (1 to 2000).map(i => (i % 100).toDouble + 50.0).toDF("v")
    val drift = Expectations.populationStability(ref, shifted, col("v"),
        bins = 10)
    val psi = drift.agg(sum(col("psi_part"))).head().getDouble(0)
    assert(psi > 0.25, s"planted shift must trip the act threshold: $psi")
    // the emptied low bins carry NULL psi_part, never ±Infinity
    assert(drift.filter(col("cur_n") === 0 && col("psi_part").isNotNull)
      .count() == 0)
    assert(drift.filter(col("psi_part").isNaN).count() == 0)
  }

  test("seasonalDecompose: recovers a planted weekly rhythm; edges get " +
      "NULL trend; value = trend + seasonal + residual where defined") {
    // 28 days of baseline 10 with +5 every Sunday-slot day
    val rows = (0 until 28).flatMap { d =>
      val day = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 3, 4).plusDays(d).atTime(12, 0))
      val n = if ((d % 7) == 6) 15 else 10 // planted weekly spike
      Seq.fill(n)(("s", day))
    }
    val df = rows.toDF("series", "ts")
    val got = TimeSeries.seasonalDecompose(df, "series", "ts", lit(1.0))
      .orderBy("bucket").collect()
    assert(got.length == 28)
    // first and last 3 days: no full centered window → null trend
    assert(got.take(3).forall(_.isNullAt(3)))
    assert(got.takeRight(3).forall(_.isNullAt(3)))
    val defined = got.filter(r => !r.isNullAt(3) && !r.isNullAt(4))
    assert(defined.nonEmpty)
    defined.foreach { r =>
      val (v, t, s, res) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      // det is rounded to 6 places before the residual, so the identity
      // holds to half an ulp of that scale
      assert(math.abs(v - (t + s + res)) < 1e-6, s"decomposition broke: $r")
    }
    // the planted spike day carries the large positive seasonal index
    val bySlot = defined.map(r => (r.getDate(1).toLocalDate.getDayOfWeek,
      r.getDouble(4)))
    val maxSlot = bySlot.maxBy(_._2)._1
    assert(maxSlot == java.time.DayOfWeek.SUNDAY, s"got $maxSlot")
  }

  test("rollingQuantile: exact-mode quantiles equal inclusive order " +
      "statistics over the folded window") {
    val ts = (d: Int, m: Int) =>
      java.sql.Timestamp.valueOf(f"2024-03-0$d 12:$m%02d:00")
    val rows = (1 to 10).map(i => ("X", ts(1, i), i.toDouble)) ++
      (11 to 20).map(i => ("X", ts(2, i), i.toDouble))
    val df = rows.toDF("series", "ts", "v")
    val got = TimeSeries.rollingQuantile(df, "series", "ts", col("v"),
        ranks = Seq("p50" -> 0.5, "p95" -> 0.95), window = 2, k = 200)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // day1: n=10, p50=v[5]=5, p95=v[ceil(9.5)]=v[10]=10
    // day2 folds both days: n=20, p50=v[10]=10, p95=v[19]=19
    assert(got.toSeq === Seq((10L, 5.0, 10.0), (20L, 10.0, 19.0)))
  }

  test("cusum: a planted level shift trips the one-sided statistic where " +
      "single-bucket z-scores stay quiet; zero-variance series never flag") {
    // 20 buckets at 100, then 20 at 106 — a 0.75σ-ish drift per bucket
    // that a 3σ spike detector never sees
    val rows = (1 to 20).map(i => ("s", i, 100.0)) ++
      (21 to 40).map(i => ("s", i, 106.0))
    val df = rows.toDF("series", "bucket", "v")
    val got = Anomaly.cusum(df, "series", "bucket", col("v"),
      slack = 0.25, threshold = 3.0)
    assert(got.filter(col("is_shift")).count() > 0, "shift must flag")
    // the UPWARD statistic fires only in the shifted half (the mirror
    // statistic legitimately flags the below-mean first half — with a
    // whole-series baseline a step is a drop then a rise)
    val firstHi = got.filter(col("cusum_hi") > 3.0)
      .agg(min(col("bucket"))).head().getInt(0)
    assert(firstHi > 20, s"cusum_hi before the shift: $firstHi")
    // a pure downward step trips cusum_lo in its shifted half
    val down = rows.map { case (s, i, v) => (s, i, 200.0 - v) }
      .toDF("series", "bucket", "v")
    val gotDown = Anomaly.cusum(down, "series", "bucket", col("v"),
      slack = 0.25, threshold = 3.0)
    val firstLo = gotDown.filter(col("cusum_lo") > 3.0)
      .agg(min(col("bucket"))).head().getInt(0)
    assert(firstLo > 20, s"cusum_lo before the drop: $firstLo")
    // constant series: NULL statistics, no flags
    val flat = (1 to 10).map(i => ("f", i, 5.0)).toDF("series", "bucket", "v")
    val gotFlat = Anomaly.cusum(flat, "series", "bucket", col("v"))
    assert(gotFlat.filter(col("is_shift")).count() == 0)
    assert(gotFlat.filter(col("cusum_hi").isNotNull).count() == 0)
  }

  test("cusum: the window reformulation equals Page's sequential " +
      "recursion exactly on pseudo-random series") {
    // S_i = max(0, S_{i-1} + z_i − slack) computed by literal fold must
    // equal the running-sum − running-min formulation bit-for-bit: the
    // operator rounds z to 6 and folds DECIMALs, so both sides run the
    // same exact arithmetic
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rng.nextInt(40)
      val vals = Vector.fill(n)(math.floor(rng.nextDouble() * 1e4) / 100.0)
      val df = vals.zipWithIndex.map { case (v, i) => ("s", i, v) }
        .toDF("series", "bucket", "v")
      val got = Anomaly.cusum(df, "series", "bucket", col("v"),
          slack = 0.25, threshold = 3.0)
        .orderBy("bucket").collect()
        .map(r => (Option(r.getAs[Any]("cusum_hi")).map(_.asInstanceOf[Double]),
          Option(r.getAs[Any]("cusum_lo")).map(_.asInstanceOf[Double])))
      // reference: same stats formulas in the same evaluation order
      val k = n.toDouble
      val s1 = vals.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val s2 = vals.map(v => BigDecimal(v * v).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val mean = s1 / k
      val variance = (s2 - s1 * s1 / k) / (k - 1)
      val sd = math.sqrt(variance)
      if (variance > 0) {
        val z = vals.map(v => BigDecimal((v - mean) / sd)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        val slack = BigDecimal("0.25")
        def page(zs: Seq[BigDecimal]): Seq[BigDecimal] =
          zs.scanLeft(BigDecimal(0)) { (s, zi) =>
            (s + zi - slack).max(BigDecimal(0)) }.tail
        val hi = page(z).map(_.toDouble)
        val lo = page(z.map(-_)).map(_.toDouble)
        got.zip(hi.zip(lo)).zipWithIndex.foreach {
          case (((gh, gl), (rh, rl)), i) =>
            assert(gh.contains(rh) && gl.contains(rl),
              s"trial $trial row $i: got ($gh, $gl) want ($rh, $rl)")
        }
      }
    }
  }

  test("groupSplit: all rows of a group land on one side, fractions " +
      "land near targets, assignment is repartition-invariant") {
    val rows = for (g <- 1L to 500L; r <- 1 to 3) yield (g, r)
    val df = rows.toDF("gid", "rep")
    val got = Dedup.groupSplit(df, "gid",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // no group straddles splits
    assert(got.groupBy("gid")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") =!= 1).count() == 0)
    // every row assigned (fractions sum to 1) and shares are plausible
    assert(got.filter(col("split").isNull).count() == 0)
    val shares = got.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shares("train") > 1000 && shares("train") < 1400, s"$shares")
    // deterministic under partitioning
    val again = Dedup.groupSplit(df.repartition(11), "gid",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(again.exceptAll(got).count() == 0 && got.exceptAll(again).count() == 0)
    // remainder band: fractions summing below 1 leave NULL holdout
    val hold = Dedup.groupSplit(df, "gid", Seq("train" -> 0.5))
    assert(hold.filter(col("split").isNull).count() > 0)
  }

  test("autocorrelation: an alternating daily series has acf1 = -1, " +
      "acf2 = +1, and same-day events sum into one bucket") {
    // 10 days alternating totals 1.0 / 3.0, each day split into two
    // half-value events (the daily sum must see 1.0/3.0, not halves)
    val rows = (0 until 10).flatMap { day =>
      val v = if (day % 2 == 0) 0.5 else 1.5
      Seq((f"2024-01-${day + 1}%02d 03:00:00", "s", v),
        (f"2024-01-${day + 1}%02d 17:00:00", "s", v))
    }
    val ev = rows.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = TimeSeries.autocorrelation(ev, "event_type", "ts",
      col("value"), maxLag = 2).head
    assert(got.getString(0) === "s" && got.getLong(1) === 10L)
    assert(got.getDouble(2) === -1.0 && got.getDouble(3) === 1.0)
  }

  test("tukeyFences: exact quartiles of 1..8 plus a planted outlier — " +
      "fences at 1.5 IQR, only the outlier lands beyond") {
    val df = ((1 to 8).map(i => ("a", i.toDouble, i.toLong)) :+
      (("a", 100.0, 9L))).toDF("g", "v", "id")
    val got = Expectations.tukeyFences(df, "g", col("v"), "id").head
    // n=9: p25 = rank 3 -> 3, p50 = rank 5 -> 5, p75 = rank 7 -> 7
    assert(got.getLong(1) === 9L && got.getDouble(2) === 3.0 &&
      got.getDouble(3) === 5.0 && got.getDouble(4) === 7.0)
    assert(got.getDouble(5) === -3.0 && got.getDouble(6) === 13.0)
    assert(got.getLong(7) === 0L && got.getLong(8) === 1L)
  }

  test("ksDrift: hand CDFs give D = 0.5 exactly; identical samples " +
      "give 0; bucket-count invariant") {
    val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    def run(b: Int) = Expectations.ksDrift(ref, cur, col("v"), b).head
    val got = run(64)
    assert(got.getLong(0) === 4L && got.getLong(1) === 4L &&
      got.getDouble(2) === 0.5)
    assert(run(2).getDouble(2) === 0.5 && run(1).getDouble(2) === 0.5)
    assert(Expectations.ksDrift(ref, ref, col("v")).head
      .getDouble(2) === 0.0)
  }

  test("giniConcentration: uniform values give 0, a single holder " +
      "gives (n-1)/n, and the result is partitioning-invariant") {
    import graft.operators.Skew
    val even = (1L to 4L).map(i => (i, 5L)).toDF("id", "y")
    val g1 = Skew.giniConcentration(even, "id", col("y")).head
    assert(g1.getLong(0) === 4L && g1.getLong(1) === 20L &&
      g1.getDouble(2) === 0.0)
    val solo = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 10L)).toDF("id", "y")
    assert(Skew.giniConcentration(solo, "id", col("y"))
      .head.getDouble(2) === 0.75)
    assert(Skew.giniConcentration(solo.repartition(7), "id", col("y"))
      .head.getDouble(2) === 0.75)
  }

  test("ewma: truncated renormalized weights — first row is its own " +
      "value, window cuts old history, exact ratios") {
    val rows = Seq(("2024-01-01 06:00:00", "s", 2.0),
      ("2024-01-02 06:00:00", "s", 4.0), ("2024-01-03 06:00:00", "s", 8.0))
    val ev = rows.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = TimeSeries.ewma(ev, "event_type", "ts", col("value"),
        alpha = "0.5", window = 2)
      .orderBy("bucket").collect().map(_.getDouble(3))
    // day1: .5·2/.5 = 2; day2: (.5·4+.25·2)/.75; day3 drops day1
    assert(got.toSeq === Seq(2.0, 2.5 / 0.75, 5.0 / 0.75))
  }

  test("crossCorrelation: a series that is yesterday's other series " +
      "scaled correlates perfectly at lag 1 and imperfectly at lag 0") {
    val yv = Seq(1.0, 5.0, 2.0, 8.0, 3.0) // y on days 1..5
    val rows =
      yv.zipWithIndex.map { case (v, i) =>
        (f"2024-01-${i + 1}%02d 12:00:00", "v", v) } ++
      yv.zipWithIndex.map { case (v, i) => // x(d) = 2·y(d−1), days 2..6
        (f"2024-01-${i + 2}%02d 12:00:00", "p", 2.0 * v) }
    val ev = rows.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = TimeSeries.crossCorrelation(ev, "event_type", "ts",
        col("value"), seriesX = "p", seriesY = "v", maxLag = 2)
      .orderBy("lag").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got(1) === ((1L, 5L, 1.0))) // perfect lead at k = 1
    assert(got(0)._2 === 4L && got(0)._3 < 1.0)
  }

  test("linearTrend: perfect line gets exact slope and r2 = 1; " +
      "constant series r2 NULL; single-day series slope NULL; " +
      "same-day events fold into the daily sum") {
    val rows = Seq(
      // series s: y = 10,20,30,40,50 over 5 days (day 1 split 4+6)
      ("2024-01-01", "s", 4L), ("2024-01-01", "s", 6L),
      ("2024-01-02", "s", 20L), ("2024-01-03", "s", 30L),
      ("2024-01-04", "s", 40L), ("2024-01-05", "s", 50L),
      // series c: constant
      ("2024-01-01", "c", 7L), ("2024-01-02", "c", 7L),
      ("2024-01-03", "c", 7L),
      // series one: single day
      ("2024-01-09", "one", 3L))
      .toDF("ds", "series", "cents")
    val got = TimeSeries.linearTrend(rows.toDF(), "series",
        to_date(col("ds")), col("cents"))
      .orderBy("series").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === Seq(
      ("c", 3L, Some(0.0), None),
      ("one", 1L, None, None),
      ("s", 5L, Some(10.0), Some(1.0))))
  }

  test("benford: exact digit extraction from integer text, all nine " +
      "digits present with zero-fills, nonpositive values excluded") {
    val df = Seq(10L, 199L, 25L, -5L, 0L).toDF("v")
    val got = Expectations.benford(df, col("v")).orderBy("digit")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length === 9)
    assert(got(0)._1 === 1L && got(0)._2 === 2L &&
      got(0)._3 === 2.0 / 3.0 &&
      got(0)._4 === math.log(2.0) / math.log(10.0))
    assert(got(1)._2 === 1L && got(2)._2 === 0L)
    // zero-count digit: chi2_part = (0 - n·e)²/(n·e) = n·e
    val e9 = math.log(1.0 + 1.0 / 9.0) / math.log(10.0)
    assert(math.abs(got(8)._5 - 3.0 * e9) < 1e-12)
  }

  test("exactQuantiles: hand-computed lower discrete quantiles, " +
      "duplicate values, a 1-row group, and bucket-count invariance") {
    // group a: values 1..10 → p50 = 5 (rank ceil(.5*10)=5),
    //   p90 = 9, p99 = 10 (rank ceil(9.9)=10)
    // group b: 7,7,7 → every quantile 7; group c: single 42
    val df = ((1 to 10).map(i => ("a", i.toDouble, i.toLong)) ++
      Seq(("b", 7.0, 1L), ("b", 7.0, 2L), ("b", 7.0, 3L),
        ("c", 42.0, 9L))).toDF("g", "v", "id")
    def run(buckets: Int) =
      Expectations.exactQuantiles(df, "g", col("v"),
          Seq(0.5, 0.9, 0.99), "id", buckets)
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
    val want = Seq(("a", 10L, 5.0, 9.0, 10.0), ("b", 3L, 7.0, 7.0, 7.0),
      ("c", 1L, 42.0, 42.0, 42.0))
    assert(run(64).toSeq === want)
    assert(run(3).toSeq === want) // group split across range buckets
    assert(run(1).toSeq === want)
  }

  test("kAnonymity: exactly the under-k and under-l groups are " +
      "reported, passing groups are absent") {
    val df = Seq(
      // group (1, "x"): size 3 (< k=4) — size violation
      (1, "x", 10.0), (1, "x", 11.0), (1, "x", 12.0),
      // group (2, "y"): size 4, but all share one sensitive value (< l=2)
      (2, "y", 5.0), (2, "y", 5.0), (2, "y", 5.0), (2, "y", 5.0),
      // group (3, "z"): size 4, 2 distinct — passes both
      (3, "z", 1.0), (3, "z", 2.0), (3, "z", 1.0), (3, "z", 2.0)
    ).toDF("nat", "seg", "bal")
    val got = Expectations.kAnonymity(df, Seq("nat", "seg"), "bal",
        k = 4, l = 2)
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((1, "x", 3L, 3L), (2, "y", 4L, 1L)))
  }

  test("doubleSmoothing: constant series forecasts itself exactly; " +
      "warmup rows are dropped; linear series forecasts ahead") {
    val const = (1 to 20).map(i => (f"2024-01-$i%02d 06:00:00", "c", 7.0))
    val cEv = const.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val cGot = TimeSeries.doubleSmoothing(cEv, "event_type", "ts",
        col("value"), alpha = "0.5", window = 4)
      .orderBy("bucket").collect()
    // 2·window−2 = 6 warmup rows dropped
    assert(cGot.length === 20 - 6)
    // both levels and the forecast equal the constant exactly: every
    // weighted mean of a constant is the constant
    cGot.foreach { r =>
      assert(r.getDouble(3) === 7.0 && r.getDouble(4) === 7.0 &&
        r.getDouble(5) === 7.0, r.toString)
    }
    // linear series v_t = 10·t: Brown's recovers the trend; with the
    // truncated window the forecast overshoots the plain level and
    // lands near the next value
    val lin = (1 to 20).map(i =>
      (f"2024-01-$i%02d 06:00:00", "l", 10.0 * i))
    val lEv = lin.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val lGot = TimeSeries.doubleSmoothing(lEv, "event_type", "ts",
        col("value"), alpha = "0.5", window = 8)
      .orderBy("bucket").collect()
    val last = lGot.last
    val nextVal = 10.0 * 21
    assert(math.abs(last.getDouble(5) - nextVal) < 1.0,
      s"forecast ${last.getDouble(5)} far from $nextVal")
    // s1 lags the series, s2 lags s1 — strict order on a rising line
    assert(last.getDouble(4) < last.getDouble(3) &&
      last.getDouble(3) < 10.0 * 20)
  }

  test("fdProfile: a key pair holds, a violated pair counts its " +
      "violating determinants, rows, and worst fan-out") {
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y"),
      (4L, "b", "z"), (5L, "b", "z"), (6L, "c", "x"))
      .toDF("id", "det", "dep")
    val got = Expectations.fdProfile(df,
        Seq(("id", "det"), ("det", "dep")))
      .orderBy("determinant").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // det→dep: 'b' maps to {y,z} — 1 violating det over 3 rows, fanout 2
    assert(got.toSeq === Seq(
      ("det", 3L, 1L, 3L, 2L, false),
      ("id", 6L, 0L, 0L, 1L, true)))
  }

  test("weightedPrioritySample: replayable, weight-monotone, and " +
      "excludes non-positive weights") {
    val df = (1L to 100L).map(i =>
      (i, if (i % 10 == 0) 0.0 else i.toDouble)).toDF("id", "w")
    val got = Dedup.weightedPrioritySample(df, "id", col("w"), 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length === 20)
    // zero-weight rows can never win
    assert(got.forall(_._1 % 10 != 0))
    // priorities are exactly u/w for the portable two-stage MINSTD hash
    got.foreach { case (id, p) =>
      val m = 2147483647L
      val u = ((((id % m) * 48271L) % m * 48271L) % m + 1L).toDouble
      assert(p === u / id.toDouble, s"id=$id")
    }
    // replay: same draw on a different partitioning
    val again = Dedup.weightedPrioritySample(df.repartition(7), "id",
      col("w"), 20).collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // weight-monotone: a huge weight pulls its row into the sample
    val all = Dedup.weightedPrioritySample(
      df.union(Seq((9999L, 1e9)).toDF("id", "w")), "id", col("w"), 20)
      .collect().map(_.getLong(0))
    assert(all.contains(9999L), "huge weight must win a slot")
  }

  test("theilSen: one outlier day cannot bend the median slope; " +
      "single-day series reports NULL; lower median on even pairs") {
    // days 1..5: 1,2,3,4,100 — six of ten pairwise slopes are exactly 1
    val rows = Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map {
      case (v, i) => (f"2024-02-${i + 1}%02d 12:00:00", "s", v) } ++
      Seq(("2024-02-01 12:00:00", "one", 5.0))
    val ev = rows.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = TimeSeries.theilSen(ev, "event_type", "ts", col("value"))
      .orderBy("series").collect()
    val one = got.head
    assert(one.getString(0) === "one" && one.getLong(1) === 1L &&
      one.getLong(2) === 0L && one.isNullAt(3))
    val s = got.last
    assert((s.getLong(1), s.getLong(2), s.getDouble(3)) ===
      ((5L, 10L, 1.0)))
    // OLS on the same series is dragged far above 1 — the robustness
    // this operator exists for
    val ols = TimeSeries.linearTrend(ev.filter(col("event_type") === "s"),
        "event_type", col("ts"), col("value").cast("long"))
      .head.getDouble(3)
    assert(ols > 10.0, s"OLS should chase the outlier, got $ols")
  }

  test("mannKendall: hand-computed S and tie-corrected z; all-tied " +
      "series yields NULL z; decreasing series continuity-corrects up") {
    val rows =
      Seq(1.0, 2.0, 3.0, 4.0, 5.0).zipWithIndex.map { case (v, i) =>
        (f"2024-04-${i + 1}%02d 08:00:00", "up", v) } ++
      Seq(("2024-04-01 08:00:00", "tied", 3.0),
        ("2024-04-02 08:00:00", "tied", 3.0),
        ("2024-04-03 08:00:00", "tied", 3.0)) ++
      Seq(("2024-04-01 08:00:00", "down", 5.0),
        ("2024-04-02 08:00:00", "down", 3.0),
        ("2024-04-03 08:00:00", "down", 1.0))
    val ev = rows.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = TimeSeries.mannKendall(ev, "event_type", "ts", col("value"))
      .orderBy("series").collect()
      .map(r => r.getString(0) -> r).toMap
    val up = got("up")
    assert(up.getLong(1) === 5L && up.getLong(2) === 10L)
    // varS = 5·4·15/18; z = (10 − 1)/√varS
    assert(math.abs(up.getDouble(3) -
      9.0 / math.sqrt(5.0 * 4.0 * 15.0 / 18.0)) < 1e-12)
    val tied = got("tied")
    assert(tied.getLong(2) === 0L && tied.isNullAt(3))
    val down = got("down")
    assert(down.getLong(2) === -3L)
    assert(math.abs(down.getDouble(3) -
      (-2.0) / math.sqrt(3.0 * 2.0 * 11.0 / 18.0)) < 1e-12)
  }

  test("abcAnalysis: the crossing item stays in A, exact integer cuts, " +
      "partitioning-invariant") {
    // values 80, 15, 5 of 100: item1 (before 0%) -> A, item2 (before
    // 80%, NOT < 80) -> B, item3 (before 95%, NOT < 95) -> C
    val items = Seq((1L, 80L), (2L, 15L), (3L, 5L)).toDF("id", "v")
    val got = Skew.abcAnalysis(items, "id", col("v"))
      .orderBy("abc_class").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact(), r.getDouble(3)))
    assert(got.toSeq === Seq(("A", 1L, 80L, 0.8), ("B", 1L, 15L, 0.15),
      ("C", 1L, 5L, 0.05)))
    // a big item crossing the 80% line still lands in A
    val cross = Seq((1L, 79L), (2L, 11L), (3L, 10L)).toDF("id", "v")
    val g2 = Skew.abcAnalysis(cross, "id", col("v"))
      .orderBy("abc_class").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // item2: before 79% < 80 -> A (it crosses); item3: before 90% -> B
    assert(g2.toSeq === Seq(("A", 2L), ("B", 1L)))
    val again = Skew.abcAnalysis(items.repartition(7), "id", col("v"))
      .orderBy("abc_class").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact(), r.getDouble(3)))
    assert(again.toSeq === got.toSeq)
  }

  test("sequenceAudit: gaps count as missing, replays as duplicates, " +
      "a dense unique range is complete") {
    val rows = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 5L),
      ("g2", 10L), ("g2", 10L), ("g2", 11L),
      ("g3", 20L), ("g3", 21L))
      .toDF("g", "k")
    val got = Expectations.sequenceAudit(rows, "g", col("k"))
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(6), r.getLong(7),
        r.getBoolean(8)))
    assert(got.toSeq === Seq(("g1", 1L, 0L, false),
      ("g2", 0L, 1L, false), ("g3", 0L, 0L, true)))
  }

  test("peaks: strict-left/tie-right compares give one peak per " +
      "plateau; edges never self-peak against an empty side wrongly") {
    val vals = Seq(1.0, 5.0, 2.0, 2.0, 2.0, 7.0, 7.0, 3.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (f"2024-07-${i + 1}%02d 10:00:00", "s", v) }
    val ev = rows.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = TimeSeries.peaks(ev, "event_type", "ts", col("value"),
        window = 2)
      .orderBy("bucket").collect()
      .map(r => r.getDate(1).toString)
    // day 2 (5 beats both sides) and day 6 (first of the 7-plateau)
    assert(got.toSeq === Seq("2024-07-02", "2024-07-06"))
  }

  test("erasureAudit: per-table affected counts with an explicit " +
      "cascade; empty tables report share 0") {
    val keys = Seq(1L, 3L).toDF("k")
    val parent = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L))
      .toDF("oid", "cust")
    val affectedParents = parent.join(keys,
      col("cust") === col("k"), "left_semi").select(col("oid"))
    val child = Seq((10L, "a"), (10L, "b"), (12L, "c"), (13L, "d"))
      .toDF("oid", "x")
    val empty = spark.emptyDataFrame
      .withColumn("cust", lit(0L)).filter(lit(false))
    val got = Expectations.erasureAudit(Seq(
        ("parent", parent, col("cust"), keys),
        ("child", child, col("oid"), affectedParents),
        ("empty", empty, col("cust"), keys)))
      .orderBy("table").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // parent: custs 1,3 own orders 10,11,13 → 3/4; child rows under
    // those orders: a,b,d → 3/4; empty table → 0 share, not a crash
    assert(got.toSeq === Seq(("child", 4L, 3L, 0.75),
      ("empty", 0L, 0L, 0.0), ("parent", 4L, 3L, 0.75)))
  }

  test("priceVolumeMix: pure-price and pure-volume moves decompose " +
      "exactly; a segment missing the baseline reports NULLs") {
    val rows = Seq(
      // seg p: 10 units @ 200c -> 10 units @ 300c (price only)
      ("p", "1994", 2000L, 10L), ("p", "1995", 3000L, 10L),
      // seg v: 10 @ 200c -> 20 @ 200c (volume only)
      ("v", "1994", 2000L, 10L), ("v", "1995", 4000L, 20L),
      // seg m: no baseline period
      ("m", "1995", 999L, 3L))
      .toDF("seg", "p", "cents", "qty")
    val got = TimeSeries.priceVolumeMix(rows, "seg", col("p"),
        "1994", "1995", col("cents"), col("qty"))
      .orderBy("segment").collect()
    val m = got(0)
    assert(m.getString(0) === "m" && m.isNullAt(5) && m.isNullAt(6))
    val p = got(1)
    assert((p.getDouble(5), p.getDouble(6), p.getDouble(7),
      p.getDouble(8)) === ((1000.0, 1000.0, 0.0, 0.0)))
    val v = got(2)
    assert((v.getDouble(5), v.getDouble(6), v.getDouble(7),
      v.getDouble(8)) === ((2000.0, 0.0, 2000.0, 0.0)))
  }

  test("burstiness: constant daily counts score fano = cv = 0 exactly; " +
      "a bursty series scores the hand Fano factor") {
    // steady: 3/day for 4 days. bursty: 1,1,1,9 → mean 3,
    // pop-var = (4·84 − 144)/16 = 12 → fano = 12/3 = 4, cv = 2/√3·...
    val rows =
      (1 to 4).flatMap(dd => Seq.fill(3)((f"2024-06-$dd%02d 10:00:00", "s"))) ++
      (1 to 3).map(dd => (f"2024-06-$dd%02d 10:00:00", "b")) ++
      Seq.fill(9)(("2024-06-04 10:00:00", "b"))
    val ev = rows.toDF("tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = TimeSeries.burstiness(ev, "event_type", "ts")
      .orderBy("series").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val b = got(0)
    assert((b._1, b._2, b._3, b._4) === (("b", 4L, 12L, 3.0)))
    // disp = d·Σn² − N² = 4·84 − 144 = 192; fano = 192/(4·12) = 4
    assert(b._5 === 4.0)
    assert(math.abs(b._6 - math.sqrt(192.0) / 12.0) < 1e-15)
    val s = got(1)
    assert((s._1, s._4, s._5, s._6) === (("s", 3.0, 0.0, 0.0)))
  }

  test("tCloseness: perfectly-skewed groups score the hand-computed " +
      "EMD; a group matching the global distribution scores 0") {
    // global over v∈{1,2} is 50/50; A holds only 1s, B only 2s →
    // EMD = 0.5 each; C mirrors the global mix → EMD = 0
    val rows = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L),
      ("C", 1L), ("C", 2L))
    val got = Expectations.tCloseness(rows.toDF("g", "v"), Seq("g"), "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // global: 3 ones, 3 twos of 6. A: cum(1)=2/2 vs 3/6 → num
    // |2·6 − 3·2| = 6; emd = 6/(2·6·1) = 0.5
    assert(got.toSeq === Seq(("A", 2L, 0.5), ("B", 2L, 0.5),
      ("C", 2L, 0.0)))
  }

  test("changepoint: a clean level shift localizes to its last " +
      "pre-shift day with exact segment means; a constant series " +
      "tie-breaks to the earliest day with gap 0") {
    val rows = (1 to 10).map(i =>
      (f"2024-05-$i%02d 12:00:00", "shift",
        if (i <= 5) 10.0 else 20.0)) ++
      (1 to 4).map(i => (f"2024-05-$i%02d 12:00:00", "flat", 7.0))
    val ev = rows.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = Anomaly.changepoint(ev, "event_type", "ts", col("value"))
      .orderBy("series").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDate(2).toString, r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(got.toSeq === Seq(
      ("flat", 4L, "2024-05-01", 7.0, 7.0, 0.0),
      ("shift", 10L, "2024-05-05", 10.0, 20.0, 10.0)))
  }

  test("weightedMedian: mass pulls the median to the heavy value; " +
      "lower-median rule on an even split; zero weights excluded") {
    val rows = Seq(
      ("heavy", 1L, 1L), ("heavy", 2L, 1L), ("heavy", 3L, 10L),
      ("even", 1L, 5L), ("even", 2L, 5L),
      ("zeros", 1L, 0L))
      .toDF("g", "v", "w")
    val got = Expectations.weightedMedian(rows, "g", col("v"), col("w"))
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getDecimal(1).longValueExact(),
        r.getLong(2)))
    // 'zeros' has only zero-weight rows → absent entirely
    assert(got.toSeq === Seq(("even", 10L, 1L), ("heavy", 12L, 3L)))
  }

  test("hhi: monopoly scores exactly 1.0, an even n-way split scores " +
      "exactly 1/n, null firms are excluded") {
    val rows = Seq(
      ("mono", "f1", 100L), ("mono", "f1", 50L),
      ("even", "a", 10L), ("even", "b", 10L), ("even", "c", 10L),
      ("even", "d", 10L),
      ("even", null, 999L))
      .toDF("market", "firm", "cents")
    val got = Skew.hhi(rows, "market", "firm", col("cents"))
      .orderBy("market").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq === Seq(("even", 4L, 0.25), ("mono", 1L, 1.0)))
  }

  test("entropyProfile: constant column scores ~0 with NULL normalized; " +
      "uniform column hits ln(k) with normalized ~1; nulls are skipped") {
    val rows = (1 to 40).map(i =>
      ("const", s"u${i % 4}", if (i % 2 == 0) null else "x"))
      .toDF("c1", "c2", "c3")
    val got = Expectations.entropyProfile(rows, Seq("c1", "c2", "c3"))
      .orderBy("col_name").collect()
    val c1 = got(0)
    assert(c1.getLong(1) === 40L && c1.getLong(2) === 1L &&
      math.abs(c1.getDouble(3)) <= 1e-9 && c1.isNullAt(4))
    val c2 = got(1)
    assert(c2.getLong(2) === 4L &&
      math.abs(c2.getDouble(3) - math.log(4.0)) < 1e-8 &&
      math.abs(c2.getDouble(4) - 1.0) < 1e-8)
    val c3 = got(2) // nulls skipped: 20 surviving 'x' rows, constant
    assert(c3.getLong(1) === 20L && c3.getLong(2) === 1L)
  }

  test("corrMatrix: exact linear pair hits ±1.0 bit-exactly, constant " +
      "column is NULL, one aggregate feeds every pair") {
    val rows = (1 to 8).map(i =>
      (i.toDouble, 2.0 * i + 1.0, -i.toDouble, 42.0))
      .toDF("x", "y", "w", "k")
    val got = Expectations.corrMatrix(rows, Seq("x", "y", "w", "k"))
      .orderBy("col_a", "col_b").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(("x", "y")) === Some(1.0))
    assert(got(("x", "w")) === Some(-1.0))
    assert(got(("y", "w")) === Some(-1.0))
    assert(got(("x", "k")) === None && got(("w", "k")) === None)
    assert(got.size === 6)
  }

  test("kaplanMeier: textbook 3-subject curve — death, censor, then " +
      "terminal death drives survival to exactly zero; censor-only " +
      "steps leave the curve flat") {
    // durations: t=1 death, t=2 censored, t=3 death (last at risk)
    val subj = Seq(("g", 1L, true), ("g", 2L, false), ("g", 3L, true))
      .toDF("grp", "dur", "obs")
    val got = Survival.kaplanMeier(subj, "grp", "dur", col("obs"))
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(got.toSeq === Seq(
      (1L, 3L, 1L, 0L, 0.666667), // S = 2/3 (rounded to 6)
      (2L, 2L, 0L, 1L, 0.666667), // censor step: curve flat
      (3L, 1L, 1L, 0L, 0.0)))     // n = d: exact zero, not exp(-inf)
    // partitioning-invariant
    val again = Survival.kaplanMeier(subj.repartition(5), "grp", "dur",
        col("obs")).orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(got.toSeq === again.toSeq)
  }

  test("cochranArmitage: a monotone dose-response yields positive z; " +
      "reversing the doses negates T; flat response z ~ 0; degenerate " +
      "tables yield NULL z") {
    def table(rows: (Int, Int, Int)*) = rows.toSeq.flatMap {
      case (w, n, r) => Seq.fill(r)((w, true)) ++ Seq.fill(n - r)((w, false))
    }.toDF("dose", "resp")
    val up = table((0, 10, 1), (1, 10, 5), (2, 10, 9))
    val g1 = Experiment.cochranArmitage(up, col("dose"), col("resp")).head
    assert(g1.getLong(0) === 30L && g1.getLong(1) === 15L)
    assert(g1.getDouble(4) > 3.0, s"monotone trend must score, got $g1")
    val down = table((2, 10, 1), (1, 10, 5), (0, 10, 9))
    val g2 = Experiment.cochranArmitage(down, col("dose"), col("resp")).head
    assert(g2.getDouble(3) === -g1.getDouble(3), "reversal negates T")
    val flat = table((0, 10, 5), (1, 10, 5), (2, 10, 5))
    assert(math.abs(Experiment.cochranArmitage(flat, col("dose"),
      col("resp")).head.getDouble(4)) < 1e-12)
    val allResp = table((0, 10, 10), (1, 10, 10))
    assert(Experiment.cochranArmitage(allResp, col("dose"), col("resp"))
      .head.isNullAt(4), "R = N must yield NULL z")
  }

  test("overdispersion: constant daily counts give dispersion 0; a " +
      "bursty series computes the exact (k·s2 − s1²)/((k−1)·s1) form") {
    val ev = (1 to 4).flatMap(day => Seq.fill(5)(
        (f"2024-03-$day%02d 10:00:00", "flat"))) ++
      Seq.fill(2)(("2024-03-01 10:00:00", "bursty")) ++
      Seq.fill(8)(("2024-03-02 10:00:00", "bursty"))
    val df = ev.toDF("tss", "event_type")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"))
    val got = Anomaly.overdispersion(df, "event_type", "ts")
      .orderBy("series").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // bursty: k=2, s1=10, s2=4+64=68 → D=(2·68−100)/(1·10)=3.6
    assert(got(0) === (("bursty", 2L, 10L, 5.0, 3.6)))
    // flat: k=4, s1=20, s2=100 → D=(400−400)/(3·20)=0
    assert(got(1) === (("flat", 4L, 20L, 5.0, 0.0)))
  }

  test("largestRemainder: allocations sum to the total exactly; bonus " +
      "units go to the largest remainders with key ties; zero-weight " +
      "groups are excluded") {
    import spark.implicits._
    // weights 1,1,1 over total 10 → bases 3,3,3, remainder 1 → the
    // smallest key of the all-equal remainders gets the bonus
    val eq = Seq(("a", 1L), ("b", 1L), ("c", 1L), ("z", 0L))
      .toDF("k", "w")
    val got = Skew.largestRemainder(eq, "k", col("w"), total = 10L)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 4L), ("b", 3L), ("c", 3L)))
    // skewed: 5,3,1 over 7 → exact shares 35/9, 21/9, 7/9 → bases
    // 3,2,0, remainders 8/9, 3/9, 7/9 → bonuses to a then c
    val sk = Seq(("a", 5L), ("b", 3L), ("c", 1L)).toDF("k", "w")
    val got2 = Skew.largestRemainder(sk, "k", col("w"), total = 7L)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got2.toSeq === Seq(("a", 4L), ("b", 2L), ("c", 1L)))
    assert(got2.map(_._2).sum === 7L)
  }

  test("effectiveSampleSize: uniform weights give ESS = n, deff = 1; " +
      "a dominating weight collapses ESS toward 1") {
    import spark.implicits._
    val df = Seq(("u", 5L), ("u", 5L), ("u", 5L), ("u", 5L),
      ("k", 1L), ("k", 1000000L), ("z", 0L)).toDF("g", "w")
    val got = Skew.effectiveSampleSize(df, "g", col("w"))
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // k: sw=1000001, sww=1+1e12 → ESS ≈ 1.000002
    assert(got(0)._1 === "k" && got(0)._2 === 2L)
    assert(got(0)._4 > 1.0 && got(0)._4 < 1.001)
    assert(got(1) === (("u", 4L, 20L, 4.0, 1.0)))
  }

  test("sampleRatioMismatch: a perfect split scores 0 everywhere; a " +
      "skewed split concentrates chi2; undesigned variants never match " +
      "designed rows") {
    import spark.implicits._
    val perfect = (1L to 40L).map(i =>
      (i, if (i % 4 == 0) "b" else "a")).toDF("id", "v")
    val got = Experiment.sampleRatioMismatch(perfect, col("v"),
        Seq("a" -> 3L, "b" -> 1L))
      .orderBy("variant").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(("a", 30L, 30.0, 0.0), ("b", 10L, 10.0, 0.0)))
    // all 40 rows land on 'a': chi2 = (40-30)^2/30 + (0-10)^2/10
    val skew = (1L to 40L).map(i => (i, "a")).toDF("id", "v")
    val s2 = Experiment.sampleRatioMismatch(skew, col("v"),
        Seq("a" -> 3L, "b" -> 1L))
      .orderBy("variant").collect()
    assert(math.abs(s2(0).getDouble(3) - 100.0 / 30.0) < 1e-12)
    assert(s2(1).getLong(1) === 0L && s2(1).getDouble(3) === 10.0)
  }

  test("benjaminiHochberg: step-up rule rejects below the max passing " +
      "rank even when an intermediate test fails its own threshold") {
    // m=4, q=0.25 -> thresholds k/16: p=(0.01, 0.11, 0.14, 0.8)
    // rank2 (0.11 > 2/16) fails its own line, rank3 (0.14 < 3/16)
    // passes -> kmax=3 rejects ranks 1..3 including rank2
    val df = Seq(("a", 0.01), ("b", 0.11), ("c", 0.14), ("d", 0.8))
      .toDF("key", "p")
    val got = Experiment.benjaminiHochberg(df, "key", col("p"), q = 0.25)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(4)))
    assert(got.toSeq === Seq(("a", 1L, true), ("b", 2L, true),
      ("c", 3L, true), ("d", 4L, false)))
    // nothing passes -> nothing rejected (kmax NULL path)
    val none = Experiment.benjaminiHochberg(
      Seq(("a", 0.9), ("b", 0.95)).toDF("key", "p"), "key", col("p"),
      q = 0.05).collect()
    assert(none.forall(!_.getBoolean(4)))
  }

  test("cuped: a covariate proportional to the metric removes the " +
      "between-variant difference; zero-variance covariate is a no-op") {
    // y = 2x exactly: theta = 2, adjusted means all equal the grand mean
    val df = Seq(("a", 2.0, 1.0), ("a", 4.0, 2.0), ("b", 6.0, 3.0),
      ("b", 8.0, 4.0)).toDF("variant", "y", "x")
    val got = Experiment.cuped(df, col("y"), col("x"), "variant")
      .orderBy("variant").collect()
    assert(got.forall(r => math.abs(r.getDouble(3) - 2.0) < 1e-12))
    assert(got.forall(r => math.abs(r.getDouble(4) - 5.0) < 1e-12))
    assert(got(0).getDouble(2) === 3.0 && got(1).getDouble(2) === 7.0)
    // constant covariate: theta NULL, adjusted falls back to the mean
    val const = Experiment.cuped(
      Seq(("a", 2.0, 1.0), ("b", 6.0, 1.0)).toDF("variant", "y", "x"),
      col("y"), col("x"), "variant").orderBy("variant").collect()
    assert(const.forall(_.isNullAt(3)))
    assert(const(0).getDouble(4) === 2.0 && const(1).getDouble(4) === 6.0)
    // partitioning invariance
    val re = Experiment.cuped(df.repartition(7), col("y"), col("x"),
      "variant").orderBy("variant").collect()
    assert(re.map(_.getDouble(4)).toSeq === got.map(_.getDouble(4)).toSeq)
    // NaN/Inf rows are excluded, not quantized to 0 / saturation: the
    // result over {clean rows + NaN metric + Inf covariate} equals the
    // result over the clean rows alone
    val dirty = df.unionByName(Seq(("a", Double.NaN, 1.0),
      ("b", 3.0, Double.PositiveInfinity)).toDF("variant", "y", "x"))
    val cleaned = Experiment.cuped(dirty, col("y"), col("x"), "variant")
      .orderBy("variant").collect()
    assert(cleaned.map(_.getLong(1)).toSeq === got.map(_.getLong(1)).toSeq)
    assert(cleaned.map(_.getDouble(4)).toSeq ===
      got.map(_.getDouble(4)).toSeq)
  }

  test("powerMde: a typo'd control name raises instead of returning " +
      "an empty frame") {
    val df = Seq(("control", true), ("control", false),
      ("treat", true), ("treat", true)).toDF("variant", "converted")
    // the happy path still returns every variant
    val ok = Experiment.powerMde(df, "variant", col("converted"),
      control = "control").orderBy("variant").collect()
    assert(ok.length === 2)
    assert(ok(0).isNullAt(4)) // control row carries NULL MDEs
    assert(!ok(1).isNullAt(4))
    val err = intercept[Exception] {
      Experiment.powerMde(df, "variant", col("converted"),
        control = "contorl").collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(err).contains("contorl"))
  }

  test("theilIndex: 0 for perfect equality, ln(n) for total " +
      "concentration, partitioning-invariant") {
    val even = Seq(("g", 1L, 50L), ("g", 2L, 50L), ("g", 3L, 50L),
      ("g", 4L, 50L)).toDF("grp", "id", "v")
    val g1 = Skew.theilIndex(even, "grp", col("v")).head
    assert(g1.getDouble(3) === 0.0 && g1.getDouble(4) === 0.0)
    // one unit holds everything except epsilon-free zeros are dropped:
    // use {0-excluded} {1,1,1,97} style concentration instead
    val conc = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L),
      ("g", 4L, 997L)).toDF("grp", "id", "v")
    val g2 = Skew.theilIndex(conc, "grp", col("v")).head
    assert(g2.getDouble(3) > 1.0 && g2.getDouble(3) < math.log(4.0))
    assert(g2.getDouble(4) > 0.0 && g2.getDouble(4) < 1.0)
    val re = Skew.theilIndex(conc.repartition(7), "grp", col("v")).head
    assert(re.getDouble(3) === g2.getDouble(3))
    // n = 1: theil 0, normalized NULL (ln 1 = 0)
    val one = Skew.theilIndex(Seq(("g", 1L, 5L)).toDF("grp", "id", "v"),
      "grp", col("v")).head
    assert(one.getDouble(3) === 0.0 && one.isNullAt(4))
  }

  test("lorenzCurve: hand-checked deciles, boundary ties cannot " +
      "perturb prefix sums, partitioning-invariant") {
    // values 1..10 ascending: bottom k units hold k(k+1)/2 of 55
    val df = (1L to 10L).map(i => (i, i)).toDF("id", "v")
    val got = Skew.lorenzCurve(df, "id", col("v"), points = 10)
      .orderBy("point").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    (1 to 10).foreach { k =>
      val (pt, units, cum, share) = got(k - 1)
      assert(pt === k.toLong && units === k.toLong)
      assert(cum === (k.toLong * (k + 1)) / 2)
      assert(share === cum.toDouble / 55.0)
    }
    // tie at a boundary: {5,5} at ranks 2-3 with points=2 -> the
    // bottom half takes one of the tied units, sum is unambiguous
    val tied = Seq((1L, 1L), (2L, 5L), (3L, 5L), (4L, 9L))
      .toDF("id", "v")
    val half = Skew.lorenzCurve(tied, "id", col("v"), points = 2)
      .orderBy("point").collect()
    assert(half(0).getLong(3) === 6L && half(1).getLong(3) === 20L)
    val re = Skew.lorenzCurve(tied.repartition(7), "id", col("v"),
      points = 2).orderBy("point").collect()
    assert(re.map(_.getLong(3)).toSeq === half.map(_.getLong(3)).toSeq)
  }

  test("schemaDrift: per-column exact counts from one aggregate per " +
      "side; null-rate and distinct-ratio flag the drifted column") {
    val a = Seq((1L, Some("x")), (2L, Some("y")), (3L, Some("z")))
      .toDF("id", "s")
    val b = Seq((1L, Some("x")), (2L, None: Option[String]),
      (3L, Some("x")), (4L, None: Option[String])).toDF("id", "s")
    val got = Expectations.schemaDrift(a, b, Seq("id", "s"))
      .orderBy("col_name").collect()
    val id = got(0)
    assert((id.getLong(1), id.getLong(2), id.getLong(3)) === ((3L, 0L, 3L)))
    assert((id.getLong(4), id.getLong(5), id.getLong(6)) === ((4L, 0L, 4L)))
    assert(id.getDouble(9) === 4.0 / 3.0)  // distinct_ratio
    val s = got(1)
    assert(s.getDouble(7) === 0.0 && s.getDouble(8) === 0.5)
    assert(s.getLong(6) === 1L)            // distinct collapsed to {x}
    assert(s.getDouble(9) === 1.0 / 3.0)
  }

  test("referentialIntegrity: orphans counted exactly, NULL keys " +
      "reported separately, clean child audits zero") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(8L),
      None).toDF("fk")
    val got = Expectations.referentialIntegrity(child, col("fk"),
      parent, col("pk")).head()
    assert(got.getLong(0) === 6L)  // child rows
    assert(got.getLong(1) === 1L)  // null keys
    assert(got.getLong(2) === 3L)  // orphan rows (9,9,8)
    assert(got.getLong(3) === 2L)  // orphan keys {9,8}
    assert(got.getDouble(4) === 3.0 / 6.0)
    val clean = Expectations.referentialIntegrity(
      Seq(1L, 2L).toDF("fk"), col("fk"), parent, col("pk")).head()
    assert(clean.getLong(2) === 0L && clean.getDouble(4) === 0.0)
  }

  test("categoryDrift: new, lost and shared categories exact; jaccard " +
      "over the union") {
    val a = Seq("x", "x", "y", "z").toDF("c")
    val b = Seq("x", "y", "w").toDF("c")
    val got = Expectations.categoryDrift(a, b, "c").head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) === ((3L, 3L, 2L, 1L, 1L)))
    assert(got.getDouble(5) === 2.0 / 4.0)
    // identical snapshots: jaccard 1, nothing new or lost
    val same = Expectations.categoryDrift(a, a, "c").head()
    assert(same.getLong(3) === 0L && same.getLong(4) === 0L &&
      same.getDouble(5) === 1.0)
  }

  test("palmaRatio: hand-built tails, bottom-40 zero mass gives NULL, " +
      "partitioning-invariant") {
    // 10 units 1..10 ascending: bottom-40% = ranks 1..4 (1+2+3+4=10),
    // top-10% = rank 10 (10); total 55 -> palma 1.0
    val df = (1L to 10L).map(i => (i, i)).toDF("id", "v")
    val got = Skew.palmaRatio(df, "id", col("v")).head()
    assert(got.getLong(0) === 10L && got.getLong(1) === 55L)
    assert(got.getLong(2) === 10L && got.getLong(3) === 10L)
    assert(got.getDouble(6) === 1.0)
    val re = Skew.palmaRatio(df.repartition(7), "id", col("v")).head()
    assert(re.getDouble(6) === 1.0)
    // bottom 40% all zeros -> palma NULL, shares still defined
    val zeros = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (5L, 5L), (6L, 5L), (7L, 5L), (8L, 5L), (9L, 5L), (10L, 5L))
      .toDF("id", "v")
    val z = Skew.palmaRatio(zeros, "id", col("v")).head()
    assert(z.isNullAt(6) && z.getDouble(4) === 0.0)
  }

  test("atkinsonIndex: equality gives 0; hand two-value case gives " +
      "1 - geomean/mean; partitioning-invariant") {
    val df = Seq(("eq", 7L), ("eq", 7L), ("eq", 7L),
      ("sk", 1L), ("sk", 4L), ("sk", 0L)).toDF("g", "v") // 0 excluded
    val got = Skew.atkinsonIndex(df, "g", col("v"))
      .orderBy("group").collect()
    assert(got(0).getString(0) === "eq" && got(0).getDouble(5) === 0.0)
    // sk: mean 2.5, geomean 2 -> A = 0.2
    assert(got(1).getLong(1) === 2L && got(1).getLong(2) === 5L)
    assert(got(1).getDouble(3) === 2.5 && got(1).getDouble(4) === 2.0)
    assert(got(1).getDouble(5) === 0.2)
    val re = Skew.atkinsonIndex(df.repartition(7), "g", col("v"))
      .orderBy("group").collect()
    assert(re.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("welchTTest: hand two-variant case matches the closed form; " +
      "control row carries NULLs; typo'd control raises") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("control", _)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map(("treat", _))).toDF("variant", "y")
    val got = Experiment.welchTTest(df, "variant", col("y"), "control")
      .orderBy("variant").collect()
    assert(got(0).getString(0) === "control" && got(0).isNullAt(4))
    assert(got(0).getDouble(2) === 2.5)
    assert(math.abs(got(0).getDouble(3) - 5.0 / 3.0) < 1e-12)
    // equal variances 5/3, n=4 each: se² = 5/6, t = 2/√(5/6), df = 6
    val t = got(1).getDouble(4)
    assert(math.abs(t - 2.0 / math.sqrt(5.0 / 6.0)) < 1e-12)
    assert(math.abs(got(1).getDouble(5) - 6.0) < 1e-9)
    // two-sided normal p = erfc(t/√2) ≈ 0.02846 (A&S poly, |ε|<1.5e-7)
    assert(math.abs(got(1).getDouble(6) - 0.028458) < 1e-4)
    val err = intercept[Exception] {
      Experiment.welchTTest(df, "variant", col("y"), "contorl").collect()
    }
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + " | " + chain(x.getCause)
    assert(chain(err).contains("contorl"))
    // partitioning-invariance: exact integer sums
    val re = Experiment.welchTTest(df.repartition(7), "variant",
      col("y"), "control").orderBy("variant").collect()
    assert(re.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("cmhTest: single-stratum case reduces to the plain MH " +
      "statistic; single-row strata excluded; OR from the cells") {
    // one stratum: a=20 b=10 c=5 d=15 (the chi2 fixture)
    val rows = Seq.fill(20)(("s1", true, true)) ++
      Seq.fill(10)(("s1", true, false)) ++
      Seq.fill(5)(("s1", false, true)) ++
      Seq.fill(15)(("s1", false, false))
    val df = rows.toDF("s", "e", "o")
    val got = Experiment.cmhTest(df, "s", col("e"), col("o"),
      continuity = false).head
    assert(got.getLong(0) === 1L && got.getLong(1) === 50L &&
      got.getLong(2) === 20L)
    // E = 30·25/50 = 15, V = 30·20·25·25/(2500·49)
    assert(math.abs(got.getDouble(3) - 15.0) < 1e-9)
    val v = 30.0 * 20.0 * 25.0 * 25.0 / (2500.0 * 49.0)
    assert(math.abs(got.getDouble(4) - v) < 1e-9)
    assert(math.abs(got.getDouble(5) - 25.0 / v) < 1e-6)
    // MH OR for one stratum = ad/bc = 300/50 = 6
    assert(math.abs(got.getDouble(7) - 6.0) < 1e-9)
    // a second single-row stratum changes nothing
    val withTiny = df.union(Seq(("s2", true, true)).toDF("s", "e", "o"))
    val g2 = Experiment.cmhTest(withTiny, "s", col("e"), col("o"),
      continuity = false).head
    assert(g2.getLong(0) === 1L && g2.getLong(1) === 50L)
    // partitioning-invariance
    val re = Experiment.cmhTest(df.repartition(7), "s", col("e"),
      col("o"), continuity = false).head
    assert(re.toSeq === got.toSeq)
  }

  test("contingencyEffects: 2x2 fixture gives the q330 chi2, " +
      "Cramer's V = sqrt(chi2/n), and the hand odds ratio + Woolf CI") {
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(10)(("y", "n")) ++
      Seq.fill(5)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val got = Experiment.contingencyEffects(rows.toDF("a", "b"),
      col("a"), col("b")).head
    assert(got.getLong(0) === 50L)
    // chi2 = 50/6 (hand: parts 2.5+2.5+5/3+5/3)
    assert(math.abs(got.getDouble(3) - 50.0 / 6.0) < 1e-6)
    assert(math.abs(got.getDouble(4) -
      math.sqrt(got.getDouble(3) / 50.0)) < 1e-12)
    // sorted labels: rows n<y, cols n<y → a=(n,n)=15 b=(n,y)=5
    // c=(y,n)=10 d=(y,y)=20 → OR = 15·20/(5·10) = 6
    assert(math.abs(got.getDouble(5) - 6.0) < 1e-12)
    val se = math.sqrt(1.0 / 15 + 1.0 / 5 + 1.0 / 10 + 1.0 / 20)
    assert(math.abs(got.getDouble(6) -
      math.exp(math.log(6.0) - 1.959964 * se)) < 1e-9)
    assert(math.abs(got.getDouble(7) -
      math.exp(math.log(6.0) + 1.959964 * se)) < 1e-9)
    // a 3-category column with a structurally-ZERO (m,n) cell: chi2
    // must carry the absent cell's full expected count E = r·c/n (the
    // exact complement), matching the all-cells hand sum — not the
    // observed-cells-only sum that biases V low on sparse tables
    val tri = (rows ++ Seq.fill(4)(("m", "y"))).toDF("a", "b")
    val t3 = Experiment.contingencyEffects(tri, col("a"), col("b")).head
    assert(t3.getLong(1) === 3L && t3.isNullAt(5) && !t3.isNullAt(4))
    val o = Map(("y", "y") -> 20.0, ("y", "n") -> 10.0, ("n", "y") -> 5.0,
      ("n", "n") -> 15.0, ("m", "y") -> 4.0, ("m", "n") -> 0.0)
    val ra = Map("y" -> 30.0, "n" -> 20.0, "m" -> 4.0)
    val cb = Map("y" -> 29.0, "n" -> 25.0)
    val full = (for { (a, r) <- ra.toSeq; (b, c) <- cb.toSeq } yield {
      val e0 = r * c / 54.0; val d = o((a, b)) - e0; d * d / e0
    }).sum
    assert(math.abs(t3.getDouble(3) - full) < 1e-6)
    // chi2 output is round(x, 9); V is computed from the unrounded x
    assert(math.abs(t3.getDouble(4) -
      math.sqrt(t3.getDouble(3) / 54.0)) < 1e-9)
  }

  test("bradleyTerry: two-player MLE matches the closed form " +
      "w/(w+l); zero-win variant hits the boundary; deterministic") {
    // a beats b 3 times, b beats a once: p_a/p_b = 3 → normalized to
    // mean 1: p_a = 1.5, p_b = 0.5
    val df = (Seq.fill(3)(("a", "b")) ++ Seq(("b", "a"))).toDF("w", "l")
    val got = Experiment.bradleyTerry(df, "w", "l").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(got(0).getLong(1) === 3L && got(0).getLong(2) === 4L)
    assert(math.abs(got(0).getDouble(3) - 1.5) < 1e-9)
    assert(math.abs(got(1).getDouble(3) - 0.5) < 1e-9)
    assert(got.map(_.getLong(4)).toSeq === Seq(1L, 2L))
    // a variant that never wins converges to the 0 boundary
    val shut = (Seq.fill(2)(("a", "c")) ++ Seq.fill(2)(("b", "c")) ++
      Seq(("a", "b"), ("b", "a"))).toDF("w", "l")
    val s = Experiment.bradleyTerry(shut, "w", "l").collect()
    assert(s.find(_.getString(0) == "c").get.getDouble(3) === 0.0)
    assert(s.find(_.getString(0) == "c").get.getLong(4) === 3L)
    // partitioning-invariance: the fit runs on exact collected counts
    val re = Experiment.bradleyTerry(df.repartition(7), "w", "l")
      .collect()
    assert(re.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
    // self-games and NULLs are excluded, not fitted
    val noisy = df.union(Seq(("a", "a"), (null, "b")).toDF("w", "l"))
    val n2 = Experiment.bradleyTerry(noisy, "w", "l").collect()
    assert(n2.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("bradleyTerry: maxVariants fires IN-PLAN (raise_error), before " +
      "any pair row reaches the driver") {
    // 40 variants in a cycle — feeding ids as variants must refuse via
    // the in-plan guard (SparkException from raise_error), NOT the
    // post-collect require (IllegalArgumentException)
    val big = (1 to 40).map(i => (s"v$i", s"v${i % 40 + 1}")).toDF("w", "l")
    val e = intercept[Exception] {
      Experiment.bradleyTerry(big, "w", "l", maxVariants = 10)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(!e.isInstanceOf[IllegalArgumentException])
    assert(chain(e).exists(_.contains("exceed maxVariants=10")))
  }

  test("ucbAllocation: exact means, closed-form bounds, argmax with " +
      "total tie-break; an under-pulled arm can win on exploration") {
    // arm a: 8 pulls, mean 0.5; arm b: 2 pulls, mean 0.5 → same mean,
    // b's bonus is larger → b chosen
    val df = ((1 to 8).map(i => ("a", if (i <= 4) 1.0 else 0.0)) ++
      Seq(("b", 1.0), ("b", 0.0))).toDF("arm", "r")
    val got = Experiment.ucbAllocation(df, "arm", col("r"))
      .orderBy("arm").collect()
    val c = math.sqrt(2.0)
    assert(got(0).getString(0) === "a" && got(0).getLong(1) === 8L)
    assert(got(0).getDouble(2) === 0.5 && got(1).getDouble(2) === 0.5)
    assert(math.abs(got(0).getDouble(3) -
      (0.5 + c * math.sqrt(math.log(10.0) / 8.0))) < 1e-12)
    assert(math.abs(got(1).getDouble(3) -
      (0.5 + c * math.sqrt(math.log(10.0) / 2.0))) < 1e-12)
    assert(!got(0).getBoolean(4) && got(1).getBoolean(4))
    // exact tie (same n, same mean): smaller arm label wins
    val tie = Seq(("x", 1.0), ("x", 0.0), ("y", 0.0), ("y", 1.0))
      .toDF("arm", "r")
    val t = Experiment.ucbAllocation(tie, "arm", col("r"))
      .orderBy("arm").collect()
    assert(t(0).getBoolean(4) && !t(1).getBoolean(4))
    val re = Experiment.ucbAllocation(df.repartition(7), "arm",
      col("r")).orderBy("arm").collect()
    assert(re.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("postStratify: balanced strata reproduce the raw mean; the " +
      "closed-form se; a variant missing a stratum gets NULL ps_mean") {
    val df = Seq(
      ("A", "s1", 1.0), ("A", "s1", 3.0), ("A", "s2", 5.0), ("A", "s2", 7.0),
      ("B", "s1", 2.0), ("B", "s1", 4.0), ("B", "s2", 6.0), ("B", "s2", 8.0))
      .toDF("variant", "s", "y")
    val got = Experiment.postStratify(df, "variant", col("y"), "s")
      .orderBy("variant").collect()
    // pooled W = (4/8, 4/8); A: means (2, 6) → ps_mean 4 = raw_mean
    assert(got(0).getString(0) === "A" && got(0).getLong(1) === 4L)
    assert(got(0).getLong(2) === 2L && got(0).getLong(3) === 2L)
    assert(got(0).getDouble(4) === 4.0)
    assert(math.abs(got(0).getDouble(5) - 4.0) < 1e-9)
    // se = √(W²·s²/n per stratum) = √(0.25·2/2 + 0.25·2/2) = √0.5
    assert(math.abs(got(0).getDouble(6) - math.sqrt(0.5)) < 1e-9)
    // a variant covering one stratum only: NULL ps_mean/ps_se
    val skew = df.union(Seq(("C", "s1", 9.0), ("C", "s1", 11.0))
      .toDF("variant", "s", "y"))
    val c = Experiment.postStratify(skew, "variant", col("y"), "s")
      .filter(col("variant") === "C").head
    assert(c.getLong(3) === 1L && c.isNullAt(5) && c.isNullAt(6))
    // partitioning-invariance
    val re = Experiment.postStratify(df.repartition(7), "variant",
      col("y"), "s").orderBy("variant").collect()
    assert(re.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("pacf: alternating series gives pacf1 = acf1 = -1 and NULL " +
      "beyond (innovation variance exhausted); AR-like decay case") {
    val rows = (0 until 10).flatMap { day =>
      val v = if (day % 2 == 0) 0.5 else 1.5
      Seq((f"2024-01-${day + 1}%02d 03:00:00", "s", v),
        (f"2024-01-${day + 1}%02d 17:00:00", "s", v))
    }
    val ev = rows.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = TimeSeries.pacf(ev, "event_type", "ts", col("value"),
      maxLag = 3).orderBy("lag").collect()
    assert(got.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
    assert(got(0).getDouble(2) === -1.0 && got(0).getDouble(3) === -1.0)
    // v₁ = 1 − (−1)² = 0: lags 2+ are undefined, not fabricated
    assert(got(1).isNullAt(3) && got(2).isNullAt(3))
    // Durbin-Levinson hand case at lag 2 on a decaying ACF: a series
    // with acf1 = r; pacf2 = (r2 − r1²)/(1 − r1²)
    val rows2 = (0 until 12).flatMap { day =>
      val v = Seq(1.0, 2.0, 4.0, 3.0)(day % 4)
      Seq((f"2024-02-${day + 1}%02d 03:00:00", "s", v))
    }
    val ev2 = rows2.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val g2 = TimeSeries.pacf(ev2, "event_type", "ts", col("value"),
      maxLag = 2).orderBy("lag").collect()
    val (r1, r2) = (g2(0).getDouble(2), g2(1).getDouble(2))
    assert(g2(0).getDouble(3) === r1)
    assert(math.abs(g2(1).getDouble(3) -
      (r2 - r1 * r1) / (1.0 - r1 * r1)) < 1e-12)
  }

  test("seasonalStrength: a pure weekly pattern scores ~1 seasonal " +
      "strength with ~0 residual variance; constant series NULL") {
    // 35 days, value depends only on day-of-week: after the 7-day
    // centered trend (constant) the seasonal means absorb everything
    val rows = (0 until 35).map { day =>
      val v = Seq(10.0, 20.0, 15.0, 30.0, 25.0, 5.0, 40.0)(day % 7)
      (java.time.LocalDate.of(2024, 1, 1).plusDays(day).toString +
        " 12:00:00", "s", v)
    }
    val ev = rows.toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = TimeSeries.seasonalStrength(ev, "event_type", "ts",
      col("value")).head
    assert(got.getLong(1) === 29L) // 35 − 6 warmup/tail days
    assert(got.getDouble(2) < 1e-6)               // var_residual ~ 0
    assert(got.getDouble(5) > 0.999)              // seasonal_strength
    // constant series: all variances 0 → strengths NULL
    val const = rows.map { case (t, s, _) => (t, s, 7.0) }
      .toDF("tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val c = TimeSeries.seasonalStrength(const, "event_type", "ts",
      col("value")).head
    assert(c.isNullAt(5) && c.isNullAt(6))
  }

  test("bootstrapCI: deterministic across runs and partitionings; the " +
      "interval brackets the mean; empty-weight replicates dropped") {
    val df = (1 to 100).map(i => ("a", i.toLong, i.toDouble))
      .toDF("g", "id", "y")
    val got = Experiment.bootstrapCI(df, "g", "id", col("y"),
      reps = 100, alpha = 0.05, seed = 7L).head()
    assert(got.getLong(1) === 100L && got.getDouble(2) === 50.5)
    val (lo, hi) = (got.getDouble(3), got.getDouble(4))
    assert(lo < 50.5 && hi > 50.5)
    assert(lo > 35.0 && hi < 66.0) // sd(mean) ≈ 2.9 — sane percentiles
    assert(got.getLong(5) === 100L)
    val re = Experiment.bootstrapCI(df.repartition(13), "g", "id",
      col("y"), reps = 100, alpha = 0.05, seed = 7L).head()
    assert(re.toSeq === got.toSeq)
  }

  test("forecastAccuracy: hand MAE/RMSE/MASE; constant actuals give " +
      "NULL MASE; partitioning-invariant") {
    val df = (Seq((1L, 10.0, 11.0), (2L, 12.0, 11.0), (3L, 14.0, 15.0),
        (4L, 16.0, 15.0)).map { case (t, a, f) => ("s", t, a, f) } ++
      Seq((1L, 5.0, 6.0), (2L, 5.0, 6.0))
        .map { case (t, a, f) => ("c", t, a, f) })
      .toDF("g", "ts", "a", "f")
    val got = TimeSeries.forecastAccuracy(df, "g", "ts", col("a"),
      col("f")).collect()
    // c: constant actuals -> naive MAE 0 -> MASE NULL
    assert(got(0).getString(0) === "c" && got(0).getDouble(2) === 1.0)
    assert(got(0).isNullAt(4))
    // s: MAE 1, RMSE 1, naive MAE 2 -> MASE 0.5
    assert(got(1).getDouble(2) === 1.0 && got(1).getDouble(3) === 1.0)
    assert(got(1).getDouble(4) === 0.5)
    val re = TimeSeries.forecastAccuracy(df.repartition(7), "g", "ts",
      col("a"), col("f")).collect()
    assert(re.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("tableDiff: added/removed/changed-by-column exact; NULL-safe " +
      "on both keys and values") {
    val before = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (5L, null.asInstanceOf[String], 50L)).toDF("k", "cat", "v")
    val after = Seq((2L, "b", 25L), (3L, "c", 30L), (4L, "d", 40L),
      (5L, "e", 50L)).toDF("k", "cat", "v")
    val got = Expectations.tableDiff(before, after, Seq("k"),
        Seq("cat", "v"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // added: k=4; removed: k=1; changed: k=2 (v), k=5 (NULL→'e' cat)
    assert(got.toSeq === Seq(
      ("cat", 4L, 4L, 1L, 1L, 2L, 1L),
      ("v", 4L, 4L, 1L, 1L, 2L, 1L)))
    val re = Expectations.tableDiff(before.repartition(7),
        after.repartition(5), Seq("k"), Seq("cat", "v"))
      .orderBy("col_name").collect().map(_.toSeq)
    assert(re.toSeq === got.map(t => Seq(t._1, t._2, t._3, t._4, t._5,
      t._6, t._7)))
  }

  test("freshness: exact lag against a fixed as-of; all-NULL group " +
      "is stale with NULL lag; fresh group passes") {
    val df = Seq(
      ("live", java.sql.Timestamp.valueOf("2024-01-01 11:59:30")),
      ("live", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("old", java.sql.Timestamp.valueOf("2024-01-01 09:00:00")),
      ("dead", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("g", "ts")
    val got = Expectations.freshness(df, "g", col("ts"),
        asOf = "2024-01-01 12:00:00", maxLagSeconds = 60L)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4)))
    assert(got.toSeq === Seq(
      ("dead", 1L, None, true),
      ("live", 2L, Some(30L), false),
      ("old", 1L, Some(10800L), true)))
  }

  test("chiSquareIndependence: hand 2x2 gives chi2 = 20; perfectly " +
      "independent table gives 0; partitioning-invariant") {
    val dep = (Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y")))
      .toDF("u", "v")
    val got = Expectations.chiSquareIndependence(dep, col("u"),
      col("v")).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) === ((80L, 2L, 2L, 1L)))
    assert(got.getDouble(4) === 20.0)
    assert(got.getDouble(5) < 1e-3) // strongly dependent
    val ind = (Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(20)(("b", "y")))
      .toDF("u", "v")
    val z = Expectations.chiSquareIndependence(ind, col("u"), col("v"))
      .head()
    assert(z.getDouble(4) === 0.0)
    val re = Expectations.chiSquareIndependence(dep.repartition(7),
      col("u"), col("v")).head()
    assert(re.toSeq === got.toSeq)
  }

  test("madProfile: hand medians and MAD; the planted outlier flags; " +
      "zero MAD yields NULL outlier count") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("g", _)) ++
      Seq(5.0, 5.0, 5.0, 6.0).map(("h", _))).toDF("grp", "v")
    val got = Expectations.madProfile(df, "grp", col("v"))
      .orderBy("group").collect()
    // g: median 3, deviations {2,1,0,1,97} -> MAD 1; only 100 exceeds
    // 3.5·1.4826·1
    assert(got(0).getLong(1) === 5L && got(0).getDouble(2) === 3.0)
    assert(got(0).getDouble(3) === 1.0 && got(0).getLong(4) === 1L)
    // h: median 5 (lower), MAD 0 -> NULL outliers
    assert(got(1).getDouble(2) === 5.0 && got(1).getDouble(3) === 0.0)
    assert(got(1).isNullAt(4))
    val re = Expectations.madProfile(df.repartition(7), "grp", col("v"))
      .orderBy("group").collect()
    assert(re.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("cusum: prefix-extremum identity reproduces the recursive " +
      "CUSUM; sustained up and down shifts alarm, spikes do not") {
    val up = Seq(1.0, 1.0, 6.0, 6.0, 1.0).zipWithIndex
      .map { case (v, i) => ("up", i.toLong, v) }
    val dn = Seq(1.0, 1.0, -4.0, -4.0, 1.0).zipWithIndex
      .map { case (v, i) => ("dn", i.toLong, v) }
    val df = (up ++ dn).toDF("s", "ts", "v")
    val got = TimeSeries.cusum(df, "s", "ts", col("v"),
        target = 1.0, slack = 0.0, threshold = 8.0)
      .orderBy("s", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    // recursive S⁺ for up: 0,0,5,10,10; S⁻ stays 0
    assert(got.filter(_._1 == "up").map(t => (t._3, t._4, t._5)).toSeq ===
      Seq((0.0, 0.0, false), (0.0, 0.0, false), (5.0, 0.0, false),
        (10.0, 0.0, true), (10.0, 0.0, true)))
    // symmetric downward shift lands in cusum_neg
    assert(got.filter(_._1 == "dn").map(t => (t._3, t._4, t._5)).toSeq ===
      Seq((0.0, 0.0, false), (0.0, 0.0, false), (0.0, 5.0, false),
        (0.0, 10.0, true), (0.0, 10.0, true)))
    val re = TimeSeries.cusum(df.repartition(7), "s", "ts", col("v"),
        target = 1.0, slack = 0.0, threshold = 8.0)
      .orderBy("s", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(re.toSeq === got.toSeq)
  }

  test("linearFit: exact plane recovered with r2 = 1 and zero std_err; " +
      "single-feature slope matches the closed form; collinear " +
      "features refuse with NULLs; partitioning-invariant") {
    import graft.operators.Regression
    // y = 2 + 3x1 − 0.5x2, exact (values at micro-grid)
    val plane = (1 to 40).map { i =>
      val x1 = (i % 7).toDouble
      val x2 = (i % 5).toDouble * 2.0
      (2.0 + 3.0 * x1 - 0.5 * x2, x1, x2)
    }.toDF("y", "x1", "x2")
    val fit = Regression.linearFit(plane, col("y"),
      Seq("x1" -> col("x1"), "x2" -> col("x2")))
      .orderBy("term").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(fit("intercept") - 2.0) < 1e-6)
    assert(math.abs(fit("x1") - 3.0) < 1e-6)
    assert(math.abs(fit("x2") + 0.5) < 1e-6)
    val r2 = Regression.linearFit(plane, col("y"),
      Seq("x1" -> col("x1"), "x2" -> col("x2")))
      .filter(col("term") === "intercept").head()
    assert(math.abs(r2.getDouble(4) - 1.0) < 1e-9, "perfect fit r2")
    assert(r2.getDouble(2) == 0.0, "zero residual → zero std_err")
    // noisy single feature: slope must equal the closed form over the
    // same micro-quantized values
    val noisy = (1 to 30).map { i =>
      val x = i.toDouble
      (x * 1.5 + ((i * 13) % 7).toDouble, x)
    }
    val (sx, sy) = (noisy.map(_._2).sum, noisy.map(_._1).sum)
    val sxx = noisy.map(t => t._2 * t._2).sum
    val sxy = noisy.map(t => t._1 * t._2).sum
    val n = noisy.size.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val one = Regression.linearFit(noisy.toDF("y", "x"), col("y"),
      Seq("x" -> col("x")))
      .filter(col("term") === "x").head()
    assert(math.abs(one.getDouble(1) - slope) < 1e-9)
    assert(one.getDouble(3) != 0.0, "t-stat present on noisy fit")
    // collinear: x2 = 2·x1 → singular → NULL coefficients
    val sing = (1 to 20).map(i =>
      (i.toDouble, i.toDouble, 2.0 * i)).toDF("y", "x1", "x2")
    val s = Regression.linearFit(sing, col("y"),
      Seq("x1" -> col("x1"), "x2" -> col("x2"))).collect()
    assert(s.forall(_.isNullAt(1)), "collinear fit must refuse")
    // partitioning invariance
    val rep = Regression.linearFit(plane.repartition(13), col("y"),
      Seq("x1" -> col("x1"), "x2" -> col("x2")))
      .orderBy("term").collect().map(r => (r.getString(0), r.getDouble(1)))
    val base = Regression.linearFit(plane, col("y"),
      Seq("x1" -> col("x1"), "x2" -> col("x2")))
      .orderBy("term").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rep.toSeq === base.toSeq)
  }

  test("leveneTest: hand Brown–Forsythe W on two 3-row groups; k=1 " +
      "refuses with NULLs; partitioning-invariant") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 3L),
      ("b", 10.0, 4L), ("b", 20.0, 5L), ("b", 30.0, 6L))
      .toDF("g", "v", "id")
    val got = Experiment.leveneTest(df, "g", col("v"), "id").head()
    assert(got.getLong(0) == 2 && got.getLong(1) == 6)
    // medians 2 / 20 → z: {1,0,1} and {10,0,10} → W = 648/202
    assert(math.abs(got.getDouble(2) - 648.0 / 202.0) < 1e-3,
      s"w = ${got.getDouble(2)}")
    assert(got.getLong(3) == 1 && got.getLong(4) == 4)
    assert(!got.isNullAt(5) && got.getDouble(5) > 0.0 &&
      got.getDouble(5) < 1.0)
    // one group → no test
    val k1 = Experiment.leveneTest(df.filter(col("g") === "a"), "g",
      col("v"), "id").head()
    assert(k1.isNullAt(2) && k1.isNullAt(5))
    // mean-centering on these symmetric groups gives the same centers
    val mean = Experiment.leveneTest(df, "g", col("v"), "id",
      center = "mean").head()
    assert(math.abs(mean.getDouble(2) - got.getDouble(2)) < 1e-3)
    val rep = Experiment.leveneTest(df.repartition(5), "g", col("v"),
      "id").head()
    assert(rep.getDouble(2) == got.getDouble(2) &&
      rep.getDouble(5) == got.getDouble(5))
  }

  test("grangerScreen: a series that exactly copies yesterday's " +
      "driver fits the full model near-perfectly; " +
      "partitioning-invariant") {
    val yVals = (0 until 50).map(i => ((i * 7) % 13 + 1).toDouble)
    // x copies yesterday's y plus a small INDEPENDENT wiggle — an exact
    // copy would make x_{t−1} ≡ y_{t−2} and the full design singular
    val base = (0 until 50).flatMap { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      val w = ((i * 3) % 4).toDouble * 0.1
      val x = (if (i >= 1) yVals(i - 1) else 0.0) + w
      Seq(("y", day.toString, yVals(i)), ("x", day.toString, x))
    }.toDF("series", "day", "v")
      .select(col("series"), to_timestamp(col("day")).as("ts"), col("v"))
    val got = graft.operators.Regression.grangerScreen(base, "series", "ts", col("v"),
      "x", "y", maxLag = 2).head()
    assert(got.getString(0) == "x" && got.getString(1) == "y")
    assert(got.getLong(3) >= 40, s"aligned days = ${got.getLong(3)}")
    val (rssR, rssF) = (got.getDouble(4), got.getDouble(5))
    assert(rssF < rssR * 0.01,
      s"y's lag explains x: rssF=$rssF rssR=$rssR")
    assert(got.getDouble(7) < 1e-6, s"p = ${got.getDouble(7)}")
    val rep = graft.operators.Regression.grangerScreen(base.repartition(7), "series",
      "ts", col("v"), "x", "y", maxLag = 2).head()
    assert(rep.getDouble(6) == got.getDouble(6) &&
      rep.getDouble(7) == got.getDouble(7))
  }

  test("dpNoisyCounts: seeded release is deterministic and " +
      "partitioning-invariant; noise scales as 1/ε; suppression " +
      "drops below-threshold groups; exact count never emitted") {
    import graft.operators.Expectations
    val df = (1 to 300).map(i => (s"g${i % 7}", i)).toDF("g", "v")
    val r1 = Expectations.dpNoisyCounts(df, Seq("g"), epsilon = 1.0)
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    val r2 = Expectations.dpNoisyCounts(df.repartition(11), Seq("g"),
      epsilon = 1.0).orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(r1.toSeq === r2.toSeq, "seeded release must reproduce")
    assert(r1.length == 7)
    val exact = df.groupBy("g").count().orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // same u per group ⇒ noise(ε=10) = noise(ε=1)/10 exactly
    val r10 = Expectations.dpNoisyCounts(df, Seq("g"), epsilon = 10.0)
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
      .toMap
    r1.foreach { case (g, noisy1) =>
      val n = exact(g).toDouble
      assert(math.abs((r10(g) - n) - (noisy1 - n) / 10.0) < 1e-9)
      assert(noisy1 != n, s"group $g released the exact count")
    }
    val kept = Expectations.dpNoisyCounts(df, Seq("g"), epsilon = 1.0,
      suppressBelow = 1e9).count()
    assert(kept == 0, "suppression threshold must drop all groups")
  }

  test("croston: hand sizes/intervals at alpha=0.5; first occurrence " +
      "has NULL interval smoothing; SBA factor exact; " +
      "partitioning-invariant") {
    val df = Seq(("s", "2024-03-01", 10.0), ("s", "2024-03-03", 20.0),
      ("s", "2024-03-07", 30.0))
      .toDF("series", "day", "v")
      .select(col("series"), to_timestamp(col("day")).as("ts"), col("v"))
    val got = TimeSeries.croston(df, "series", "ts", col("v"),
      alpha = "0.5", window = 16).orderBy("bucket").collect()
    assert(got.length == 3)
    // row 0: no interval yet
    assert(got(0).isNullAt(5) && got(0).isNullAt(6))
    assert(math.abs(got(0).getDouble(4) - 10.0) < 1e-12)
    // row 1: sizes (.5·20+.25·10)/.75; interval 2 alone
    assert(math.abs(got(1).getDouble(4) - 12.5 / 0.75) < 1e-12)
    assert(math.abs(got(1).getDouble(5) - 2.0) < 1e-12)
    assert(math.abs(got(1).getDouble(6) - (12.5 / 0.75) / 2.0) < 1e-12)
    // row 2: sizes (.5·30+.25·20+.125·10)/.875; intervals (.5·4+.25·2)/.75
    val s2 = 21.25 / 0.875
    val i2 = 2.5 / 0.75
    assert(math.abs(got(2).getDouble(4) - s2) < 1e-12)
    assert(math.abs(got(2).getDouble(5) - i2) < 1e-12)
    assert(math.abs(got(2).getDouble(6) - s2 / i2) < 1e-12)
    assert(math.abs(got(2).getDouble(7) - s2 / i2 * 0.75) < 1e-12)
    val rep = TimeSeries.croston(df.repartition(5), "series", "ts",
      col("v"), alpha = "0.5", window = 16).orderBy("bucket").collect()
    assert(rep.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("welchAnova: at k=2 the statistic is the squared Welch t with " +
      "the same df; degenerate groups refuse with NULLs; " +
      "partitioning-invariant") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 2.5),
      ("b", 10.0), ("b", 14.0), ("b", 12.0), ("b", 13.0), ("b", 11.0))
      .toDF("g", "v")
    val anova = Experiment.welchAnova(df, "g", col("v")).head()
    assert(anova.getLong(0) == 2 && anova.getLong(1) == 9)
    val t = Experiment.welchTTest(df, "g", col("v"), control = "a")
      .filter(col("variant") === "b").head()
    val tStat = t.getDouble(t.fieldIndex("t_stat"))
    val tDf = t.getDouble(t.fieldIndex("welch_df"))
    assert(math.abs(anova.getDouble(2) - tStat * tStat) < 1e-3,
      s"f_w=${anova.getDouble(2)} vs t²=${tStat * tStat}")
    assert(math.abs(anova.getDouble(4) - tDf) < 1e-3,
      s"df2=${anova.getDouble(4)} vs welch df=$tDf")
    assert(anova.getDouble(5) > 0.0 && anova.getDouble(5) < 1.0)
    // a singleton group breaks the variance weight → NULL refusal
    val degen = Experiment.welchAnova(
      df.unionByName(Seq(("c", 5.0)).toDF("g", "v")), "g", col("v"))
      .head()
    assert(degen.isNullAt(2) && degen.isNullAt(5))
    val rep = Experiment.welchAnova(df.repartition(7), "g", col("v"))
      .head()
    assert(rep.getDouble(2) == anova.getDouble(2) &&
      rep.getDouble(5) == anova.getDouble(5))
  }

  test("ipwAte: constant propensity reduces to plain arm means with " +
      "the hand linearization SE; clipping reports its fraction; an " +
      "empty arm refuses; partitioning-invariant") {
    val df = Seq((true, 1.0, 0.5), (true, 2.0, 0.5), (true, 3.0, 0.5),
      (false, 2.0, 0.5), (false, 4.0, 0.5)).toDF("t", "y", "e")
    val got = Experiment.ipwAte(df, col("t"), col("y"), col("e")).head()
    assert(got.getLong(0) == 3 && got.getLong(1) == 2)
    assert(got.getDouble(2) == 0.0, "e=0.5 is never clipped")
    assert(math.abs(got.getDouble(3) - 2.0) < 1e-6)
    assert(math.abs(got.getDouble(4) - 3.0) < 1e-6)
    assert(math.abs(got.getDouble(5) + 1.0) < 1e-6)
    // w=2 both arms: Var_t = 4·Σ(y−2)²/36 = 2/9, Var_c = 4·2/16 = 1/2
    assert(math.abs(got.getDouble(6) - math.sqrt(2.0 / 9.0 + 0.5)) < 1e-4)
    assert(math.abs(got.getDouble(7) - 3.0) < 1e-6, "ESS = n at const w")
    assert(math.abs(got.getDouble(8) - 2.0) < 1e-6)
    // extreme propensity clips and is counted
    val clip = Experiment.ipwAte(
      Seq((true, 1.0, 0.001), (true, 2.0, 0.5), (false, 2.0, 0.5))
        .toDF("t", "y", "e"),
      col("t"), col("y"), col("e")).head()
    assert(math.abs(clip.getDouble(2) - 1.0 / 3.0) < 1e-9)
    // one empty arm → NULL estimates
    val empty = Experiment.ipwAte(df.filter(col("t")), col("t"),
      col("y"), col("e")).head()
    assert(empty.isNullAt(5) && empty.isNullAt(6))
    val rep = Experiment.ipwAte(df.repartition(5), col("t"), col("y"),
      col("e")).head()
    assert(rep.getDouble(5) == got.getDouble(5) &&
      rep.getDouble(6) == got.getDouble(6))
  }

  test("wilcoxonSignedRank: hand rank sums on distinct diffs; zeros " +
      "drop and ties correct the variance; partitioning-invariant") {
    // diffs 1, −2, 3, 4, 5 → ranks 1..5, W⁺ = 1+3+4+5 = 13, W⁻ = 2
    val df = Seq((2.0, 1.0), (1.0, 3.0), (4.0, 1.0), (6.0, 2.0),
      (10.0, 5.0)).toDF("a", "b")
    val got = Experiment.wilcoxonSignedRank(df, col("a"), col("b"))
      .head()
    assert(got.getLong(0) == 5 && got.getLong(1) == 0)
    assert(got.getDouble(2) == 13.0 && got.getDouble(3) == 2.0)
    val z = 5.5 / math.sqrt(5.0 * 6.0 * 11.0 / 24.0)
    assert(math.abs(got.getDouble(4) - z) < 1e-9)
    assert(got.getDouble(5) > 0.13 && got.getDouble(5) < 0.15)
    // zeros drop; a full tie at |d|=2 takes midrank 2 everywhere and
    // the tie term (t³−t)/48 = 0.5 shrinks σ² from 3.5 to 3
    val tied = Seq((1.0, 1.0), (3.0, 1.0), (5.0, 3.0), (1.0, 3.0))
      .toDF("a", "b")
    val t = Experiment.wilcoxonSignedRank(tied, col("a"), col("b"))
      .head()
    assert(t.getLong(0) == 3 && t.getLong(1) == 1)
    assert(t.getDouble(2) == 4.0 && t.getDouble(3) == 2.0)
    assert(math.abs(t.getDouble(4) - 1.0 / math.sqrt(3.0)) < 1e-9)
    val rep = Experiment.wilcoxonSignedRank(df.repartition(7),
      col("a"), col("b")).head()
    assert(rep.getDouble(4) == got.getDouble(4) &&
      rep.getDouble(5) == got.getDouble(5))
  }

  test("friedmanTest: unanimous ordering gives the textbook Q = 8 and " +
      "Kendall W = 1; incomplete blocks are excluded and counted; " +
      "partitioning-invariant") {
    val rows = (1 to 4).flatMap(b => Seq(
      (s"b$b", "t1", 1.0 + b * 0.0), (s"b$b", "t2", 2.0),
      (s"b$b", "t3", 3.0)))
    val df = rows.toDF("blk", "trt", "s")
    val got = Experiment.friedmanTest(df, "blk", "trt", col("s")).head()
    assert(got.getLong(0) == 3 && got.getLong(1) == 4 &&
      got.getLong(2) == 0)
    assert(math.abs(got.getDouble(3) - 8.0) < 1e-9, s"q=${got.getDouble(3)}")
    assert(math.abs(got.getDouble(4) - 1.0) < 1e-9)
    assert(got.getLong(5) == 2)
    assert(got.getDouble(6) > 0.0 && got.getDouble(6) < 0.05)
    // a block missing one treatment drops from the rank pass
    val withBad = df.unionByName(
      Seq(("b9", "t1", 1.0), ("b9", "t2", 2.0)).toDF("blk", "trt", "s"))
    val g2 = Experiment.friedmanTest(withBad, "blk", "trt", col("s"))
      .head()
    assert(g2.getLong(1) == 4 && g2.getLong(2) == 1)
    assert(g2.getDouble(3) == got.getDouble(3))
    val rep = Experiment.friedmanTest(df.repartition(7), "blk", "trt",
      col("s")).head()
    assert(rep.getDouble(3) == got.getDouble(3) &&
      rep.getDouble(6) == got.getDouble(6))
  }

  test("pairedTTest: hand moments on diffs 1..4; constant diffs " +
      "refuse the statistic; partitioning-invariant") {
    val df = Seq((2.0, 1.0), (4.0, 2.0), (6.0, 3.0), (8.0, 4.0))
      .toDF("a", "b")
    val got = Experiment.pairedTTest(df, col("a"), col("b")).head()
    assert(got.getLong(0) == 4)
    assert(math.abs(got.getDouble(1) - 2.5) < 1e-9)
    val sd = math.sqrt(5.0 / 3.0)
    assert(math.abs(got.getDouble(2) - sd) < 1e-9)
    assert(math.abs(got.getDouble(3) - 2.5 / (sd / 2.0)) < 1e-9)
    assert(got.getDouble(4) > 0.0 && got.getDouble(4) < 0.001)
    val const = Experiment.pairedTTest(
      Seq((2.0, 1.0), (3.0, 2.0)).toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(math.abs(const.getDouble(1) - 1.0) < 1e-9)
    assert(const.isNullAt(3) && const.isNullAt(4))
    val rep = Experiment.pairedTTest(df.repartition(5), col("a"),
      col("b")).head()
    assert(rep.getDouble(3) == got.getDouble(3))
  }

  test("coxPh: the three-subject closed form (beta = -ln(2)/2); " +
      "translation invariance; constant covariate refuses; " +
      "partitioning-invariant") {
    import graft.operators.Survival
    // subjects (t=1,e,x=1), (t=2,e,x=0), (t=3,e,x=1): the score
    // equation reduces to 2u² = 1 with u = e^β ⇒ β = −ln 2 / 2
    val df = Seq((1L, true, 1.0), (2L, true, 0.0), (3L, true, 1.0))
      .toDF("t", "e", "x")
    val got = Survival.coxPh(df, "t", col("e"), Seq("x" -> col("x")))
      .head()
    val expected = -math.log(2.0) / 2.0
    assert(math.abs(got.getDouble(1) - expected) < 1e-4,
      s"coef=${got.getDouble(1)} vs $expected")
    assert(math.abs(got.getDouble(2) - math.exp(expected)) < 1e-4)
    assert(got.getLong(6) == 3 && got.getLong(7) == 3)
    assert(!got.isNullAt(3) && !got.isNullAt(5))
    // Cox is invariant to covariate translation (the constant factor
    // cancels in every S1/S0 ratio) — up to quantization of e^{xβ}
    val shifted = Survival.coxPh(
      df.withColumn("x", col("x") - 5.0), "t", col("e"),
      Seq("x" -> col("x"))).head()
    assert(math.abs(shifted.getDouble(1) - got.getDouble(1)) < 1e-3)
    // a constant covariate has a zero Hessian → loud NULLs
    val flat = Survival.coxPh(df.withColumn("x", lit(2.0)), "t",
      col("e"), Seq("x" -> col("x"))).head()
    assert(flat.isNullAt(1) && flat.isNullAt(3))
    val rep = Survival.coxPh(df.repartition(3), "t", col("e"),
      Seq("x" -> col("x"))).head()
    assert(rep.getDouble(1) == got.getDouble(1) &&
      rep.getDouble(3) == got.getDouble(3))
  }

  test("restrictedMean: hand-computed step integral and Klein SE; " +
      "tau truncation; partitioning-invariant") {
    import graft.operators.Survival
    // KM: S(1)=2/3, S(2)=2/3 (censor-only), S(3)=0 (n=d)
    val df = Seq(("g", 1L, true), ("g", 2L, false), ("g", 3L, true))
      .toDF("grp", "t", "e")
    val got = Survival.restrictedMean(df, "grp", "t", col("e"), tau = 4L)
      .head()
    assert(got.getString(0) == "g" && got.getLong(1) == 4L)
    assert(got.getLong(2) == 3 && got.getLong(3) == 2)
    // 1·[0,1) + 0.666667·[1,2) + 0.666667·[2,3) + 0·[3,4)
    assert(got.getDouble(4) == 2.333334, s"rmst=${got.getDouble(4)}")
    // Klein: only t=1 contributes (t=3 has n=d): A₁ = 1.333334,
    // term = A₁²/6 → se = √0.29629659 ≈ 0.544331
    assert(math.abs(got.getDouble(5) - 0.544331) < 1e-6)
    // τ = 2 truncates inside the second interval: 1 + 0.666667
    val t2 = Survival.restrictedMean(df, "grp", "t", col("e"), tau = 2L)
      .head()
    assert(t2.getDouble(4) == 1.666667)
    val rep = Survival.restrictedMean(df.repartition(3), "grp", "t",
      col("e"), tau = 4L).head()
    assert(rep.getDouble(4) == got.getDouble(4) &&
      rep.getDouble(5) == got.getDouble(5))
  }

  test("poissonFit: saturated binary-feature closed form " +
      "(coef = ln 3); hand deviances; collinear refuses; " +
      "partitioning-invariant") {
    // x=0: y ∈ {1,3} (mean 2); x=1: y ∈ {4,8} (mean 6) → intercept
    // ln 2, coef ln 3; saturated-group deviance hand-summed
    val df = Seq((1L, 0.0), (3L, 0.0), (4L, 1.0), (8L, 1.0))
      .toDF("y", "x")
    val rows = Regression.poissonFit(df, col("y"),
      Seq("x" -> col("x"))).collect()
    assert(rows.length == 2)
    val (ic, cf) = (rows(0), rows(1))
    assert(ic.getString(0) == "intercept" && cf.getString(0) == "x")
    assert(math.abs(ic.getDouble(1) - math.log(2.0)) < 1e-4)
    assert(math.abs(cf.getDouble(1) - math.log(3.0)) < 1e-4)
    assert(math.abs(cf.getDouble(2) - 3.0) < 1e-3)
    assert(!cf.isNullAt(3) && !cf.isNullAt(5))
    val dev = 2.0 * ((1.0 * math.log(0.5) + 1.0) +
      (3.0 * math.log(1.5) - 1.0) +
      (4.0 * math.log(4.0 / 6.0) + 2.0) +
      (8.0 * math.log(8.0 / 6.0) - 2.0))
    assert(math.abs(cf.getDouble(7) - dev) < 1e-3,
      s"deviance=${cf.getDouble(7)} vs $dev")
    val dev0 = 2.0 * ((math.log(0.25) + 3.0) +
      (3.0 * math.log(0.75) + 1.0) + 0.0 +
      (8.0 * math.log(2.0) - 4.0))
    assert(math.abs(cf.getDouble(8) - dev0) < 1e-3)
    // constant feature duplicates the intercept → singular → NULLs
    val flat = Regression.poissonFit(df.withColumn("x", lit(1.0)),
      col("y"), Seq("x" -> col("x"))).collect()
    assert(flat.forall(_.isNullAt(1)))
    val rep = Regression.poissonFit(df.repartition(3), col("y"),
      Seq("x" -> col("x"))).collect()
    assert(rep(1).getDouble(1) == cf.getDouble(1))
  }

  test("vif: hand-computed two-feature VIF (175/6); exact " +
      "collinearity refuses; constant feature refuses") {
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 5.0))
      .toDF("a", "b")
    val got = Regression.vif(df,
      Seq("a" -> col("a"), "b" -> col("b"))).collect()
    assert(got.length == 2)
    // r² = 2.640625/2.734375 → VIF = 29.1666…, equal on both rows
    assert(math.abs(got(0).getDouble(1) - 175.0 / 6.0) < 1e-3)
    // symmetric 2-feature VIFs agree to inversion round-off
    assert(math.abs(got(0).getDouble(1) - got(1).getDouble(1)) < 1e-9)
    assert(math.abs(got(0).getDouble(2) -
      (1.0 - 6.0 / 175.0)) < 1e-4)
    val coll = Regression.vif(df.withColumn("b", lit(6.0) - col("a")),
      Seq("a" -> col("a"), "b" -> col("b"))).collect()
    assert(coll.forall(_.isNullAt(1)))
    val const = Regression.vif(df.withColumn("b", lit(2.0)),
      Seq("a" -> col("a"), "b" -> col("b"))).collect()
    assert(const.forall(_.isNullAt(1)))
  }

  test("breuschPagan: zero residuals refuse (SST=0); growing error " +
      "variance flags; partitioning-invariant") {
    val exact = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0))
      .toDF("y", "x")
    val g0 = Regression.breuschPagan(exact, col("y"),
      Seq("x" -> col("x"))).head()
    assert(g0.getLong(0) == 4 && g0.isNullAt(2) && g0.isNullAt(4))
    // residual magnitude grows with x → u = e² correlates with x
    val rows = (1 to 8).map { i =>
      val e = 0.2 * i * (if (i % 2 == 0) 1.0 else -1.0)
      (i.toDouble + e, i.toDouble)
    }
    val het = rows.toDF("y", "x")
    val g1 = Regression.breuschPagan(het, col("y"),
      Seq("x" -> col("x"))).head()
    assert(g1.getLong(0) == 8 && !g1.isNullAt(2))
    assert(g1.getDouble(2) > 0.0 && g1.getLong(3) == 1)
    assert(g1.getDouble(4) > 0.0 && g1.getDouble(4) < 1.0)
    val rep = Regression.breuschPagan(het.repartition(5), col("y"),
      Seq("x" -> col("x"))).head()
    assert(rep.getDouble(2) == g1.getDouble(2))
  }

  test("durbinWatson: hand DW = 2.5 on trend-orthogonal residuals; " +
      "exact-line fit refuses; partitioning-invariant") {
    // y = t + e, e = (1,−1,0,0,−1,1): Σe = 0, Σe·t = 0 → OLS is
    // exactly slope 1 / intercept 0; DW = 10/4 = 2.5, ρ = −0.25
    val e = Seq(1.0, -1.0, 0.0, 0.0, -1.0, 1.0)
    val rows = e.zipWithIndex.map { case (ei, i) =>
      ("s", java.sql.Timestamp.valueOf(s"2024-01-0${i + 1} 00:00:00"),
        i.toDouble + ei) }
    val df = rows.toDF("series", "ts", "v")
    val got = TimeSeries.durbinWatson(df, "series", "ts", col("v"))
      .head()
    assert(got.getLong(1) == 6)
    assert(got.getDouble(2) == 2.5, s"dw=${got.getDouble(2)}")
    assert(got.getDouble(3) == -0.25)
    val line = rows.map { case (s, t, _) => (s, t, 7.0) }
      .zipWithIndex.map { case ((s, t, _), i) => (s, t, i.toDouble) }
      .toDF("series", "ts", "v")
    val g0 = TimeSeries.durbinWatson(line, "series", "ts", col("v"))
      .head()
    assert(g0.isNullAt(2) && g0.isNullAt(3))
    val re = TimeSeries.durbinWatson(df.repartition(5), "series", "ts",
      col("v")).head()
    assert(re.getDouble(2) == got.getDouble(2))
  }

  test("aipwAte: exact-arm-models fixture recovers ATE = 2 with the " +
      "hand influence variance; degenerate zero-variance SE refuses; " +
      "partitioning-invariant") {
    // y = 1 + x + 2·t + e, e = ±0.5 orthogonal to (1, x) per arm,
    // e = 0.5 constant propensity → ψ ∈ {1, 3}, mean 2, var 1
    def arm(t: Boolean) = Seq(
      (1.0, 0.5), (2.0, -0.5), (3.0, -0.5), (4.0, 0.5)).map {
      case (x, e) => (t, 1.0 + x + (if (t) 2.0 else 0.0) + e, 0.5, x) }
    val df = (arm(true) ++ arm(false)).toDF("t", "y", "e", "x")
    val got = Experiment.aipwAte(df, col("t"), col("y"), col("e"),
      Seq("x" -> col("x"))).head()
    assert(got.getLong(0) == 4 && got.getLong(1) == 4)
    assert(math.abs(got.getDouble(3) - 2.0) < 1e-6,
      s"ate=${got.getDouble(3)}")
    assert(math.abs(got.getDouble(4) - math.sqrt(1.0 / 8.0)) < 1e-3)
    assert(got.getDouble(6) < 0.001) // p small at z ≈ 5.66
    // residual-free arms → ψ constant → zero variance → SE refuses
    val clean = df.withColumn("y",
      lit(1.0) + col("x") + when(col("t"), 2.0).otherwise(0.0))
    val g0 = Experiment.aipwAte(clean, col("t"), col("y"), col("e"),
      Seq("x" -> col("x"))).head()
    assert(math.abs(g0.getDouble(3) - 2.0) < 1e-6 && g0.isNullAt(4))
    val rep = Experiment.aipwAte(df.repartition(5), col("t"), col("y"),
      col("e"), Seq("x" -> col("x"))).head()
    assert(rep.getDouble(3) == got.getDouble(3) &&
      rep.getDouble(4) == got.getDouble(4))
  }
}
