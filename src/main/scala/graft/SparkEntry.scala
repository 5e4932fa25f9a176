package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions
import graft.operators.{Cdc, Dedup, Funnel, Merge, Similarity, Skew, TextAnalysis, UrlOps}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with an ANSI-SQL DuckDB oracle where the semantics are
  * SQL-expressible.
  *
  * Determinism rules used throughout (so oracle hash-compare is exact):
  *  - every query ends in a total-order ORDER BY (unique tiebreaker);
  *  - double aggregations route through DECIMAL (see [[graft.dsum]]) so the
  *    result is independent of partitioning / accumulation order;
  *  - computed integer outputs are cast to BIGINT on both sides.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Deterministic classifier-eval fixture (q289–q293): the two-stage
    * MINSTD chain over o_orderkey gives u ∈ [1, 2³¹−1];
    * score = u/(2³¹−1) ∈ (0,1] (injective — the relative gap between
    * consecutive u is ~4.7e-10 ≫ double eps, so grouping by score
    * equals grouping by u in BOTH engines), and label compares ONE
    * further chain step against u — deterministic, score-correlated,
    * ~uniform, so AUC/calibration/Brier all take non-trivial values. */
  private def clsEvalFixture(orders: DataFrame): DataFrame = {
    val m = 2147483647L
    val u = pmod(pmod(pmod(col("o_orderkey"), lit(m)) * 48271L, lit(m))
      * 48271L, lit(m)) + 1L
    orders.select(u.as("__u"))
      .select((col("__u").cast("double") / 2147483647.0).as("score"),
        (pmod(col("__u") * 48271L, lit(m)) < col("__u")).as("label"))
  }

  /** The DuckDB mirror of [[clsEvalFixture]], spliced into the q289–
    * q293 oracles as two CTEs (`f`: the chain value u; `fx`: (v, y)).
    * All operands positive, so `%` ≡ pmod in both engines. */
  private val ClsEvalFixtureSql: String =
    """f AS (SELECT ((((o_orderkey % 2147483647) * 48271)
      |   % 2147483647) * 48271) % 2147483647 + 1 AS u FROM orders),
      |fx AS (SELECT CAST(u AS DOUBLE) / 2147483647.0 AS v,
      |  (u * 48271 % 2147483647) < u AS y FROM f)""".stripMargin

  /** Scratch dirs for gate entries that exercise write paths (streams,
    * compaction, format round-trips). Registered for recursive delete at JVM
    * exit so Verify/Bench runs leave no temp debris behind. */
  private val scratchDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  locally {
    sys.addShutdownHook {
      scratchDirs.forEach { root =>
        scala.util.Try {
          java.nio.file.Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path])
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }
  }
  private def tmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p
  }

  /** Stage replayed micro-batches DETERMINISTICALLY: each DataFrame
    * becomes exactly one parquet file under `srcDir`, with pinned,
    * strictly increasing modification times. `FileStreamSource` orders
    * files by (mtime, path), so with `maxFilesPerTrigger=1` batch i IS
    * `batches(i)` — unlike a `repartition(n).write` split, where both the
    * row→file assignment and the sub-millisecond mtime tie-break vary run
    * to run, which made the order-SENSITIVE streaming gates (cross-batch
    * dedup) nondeterministic under value-pinned oracles. */
  private def stageReplayBatches(s: SparkSession,
      batches: Seq[DataFrame], srcDir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(srcDir)
    java.nio.file.Files.createDirectories(dir)
    batches.zipWithIndex.foreach { case (df, i) =>
      val stage = s"$srcDir/.stage$i"
      df.coalesce(1).write.parquet(stage)
      val stageP = java.nio.file.Paths.get(stage)
      val part = java.nio.file.Files.list(stageP).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(sys.error(s"no part file staged for batch $i"))
      val dst = dir.resolve(f"batch-$i%05d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.walk(stageP)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path])
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Multi-way join
    * with broadcast dims + exact decimal aggregation. */
  def entry(spark: SparkSession): DataFrame =
    regionRevenue(spark, "/root/testdata/sf0.001")

  /** Revenue by region/nation: lineitem⋈orders⋈customer⋈nation⋈region with
    * broadcast small dims. */
  private def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / filters / projections (SURVEY §2.1, §2.2) ----
    "q01_scan_filter" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity") >= 45 &&
          col("l_shipdate") < to_timestamp(lit("1996-01-01")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- aggregations (SURVEY §2.4) ----
    "q02_agg_pricing" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity"), 2).as("avg_qty"),
          davg(col("l_extendedprice"), 2).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- joins (SURVEY §2.3) ----
    "q03_join_topk" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < to_timestamp(lit("1995-03-15")))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > to_timestamp(lit("1995-03-15")))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q04_join_dims" -> ((s, d) => regionRevenue(s, d)),

    "q05_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    "q06_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 300000)
      val n = t(s, d, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("n_name"))
    }),

    // ---- window functions (SURVEY §2.5) ----
    "q07_window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn").cast(LongType).as("rn"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q08_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .over(w).cast(DoubleType) / 100.0).as("running_spend"),
          count(lit(1)).over(w).as("running_orders"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q09_window_offset" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // RANGE frame (value-based window, §2.5): trailing-30-day spend per
    // customer — frame bounds on epoch seconds, decimal-routed sum.
    "q50_window_range" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_s"))
        .rangeBetween(-30L * 86400, 0)
      t(s, d, "orders")
        .filter(col("o_custkey") < 200)
        .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .over(w).cast(DoubleType) / 100.0).as("spend_30d"),
          count(lit(1)).over(w).as("orders_30d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- sorts / limits / top-k (SURVEY §2.6) ----
    "q10_topk" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // ---- set operations (SURVEY §2.7) ----
    "q11_set_ops" -> ((s, d) => {
      val highBal = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      val withOrd = t(s, d, "orders").select(col("o_custkey").as("k")).distinct()
      val ex = highBal.except(withOrd).agg(count(lit(1)).as("n"))
        .withColumn("set_op", lit("except"))
      val in = highBal.intersect(withOrd).agg(count(lit(1)).as("n"))
        .withColumn("set_op", lit("intersect"))
      val un = highBal.union(withOrd).distinct().agg(count(lit(1)).as("n"))
        .withColumn("set_op", lit("union"))
      ex.unionByName(in).unionByName(un)
        .select(col("set_op"), col("n"))
        .orderBy(col("set_op"))
    }),

    "q12_distinct_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    "q13_rollup" -> ((s, d) => {
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total_price"))
        .orderBy(col("status"), col("priority"))
    }),

    "q46_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderstatus"), year(col("o_orderdate")).cast(LongType).as("yr"))
        .agg(count(lit(1)).as("n_orders"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("yr"), lit(-1L)).as("yr"),
          col("n_orders"))
        .orderBy(col("status"), col("yr"))
    }),

    // Array aggregation (§2.8 array support): deterministic via sort_array,
    // emitted as a joined string so cross-engine comparison is exact.
    "q58_array_agg" -> ((s, d) => {
      t(s, d, "orders")
        .filter(col("o_custkey") < 50)
        .groupBy(col("o_custkey"))
        .agg(
          concat_ws(",", sort_array(collect_list(col("o_orderkey"))))
            .as("order_keys"),
          count(lit(1)).as("n"))
        .orderBy(col("o_custkey"))
    }),

    "q14_percentile" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
          percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- scalar date/time functions (SURVEY §2.8) ----
    "q15_date_parts" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).cast(LongType).as("yr"),
          quarter(col("o_orderdate")).cast(LongType).as("qtr"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 2).as("total_price"))
        .orderBy(col("yr"), col("qtr"))
    }),

    // Metabase-dialect day-of-week/ISO-week semantics (maxcompute.clj:741-786):
    // Spark weekday() is Mon=0 → +1 = ISO dow; weekofyear = ISO week.
    "q45_dow_week" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy((weekday(col("o_orderdate")) + 1).cast(LongType).as("iso_dow"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(weekofyear(col("o_orderdate"))).as("n_distinct_weeks"))
        .orderBy(col("iso_dow"))
    }),

    "q16_date_arith" -> ((s, d) => {
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("l_returnflag"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("delay"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("delay")).cast(LongType).as("sum_delay"),
          min(col("delay")).cast(LongType).as("min_delay"),
          max(col("delay")).cast(LongType).as("max_delay"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Metabase-dialect date arithmetic (maxcompute.clj:1138-1200):
    // dateadd by unit + unix-time conversion.
    "q47_date_add" -> ((s, d) => {
      t(s, d, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus_3m"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus_30d"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- JSON extraction (SURVEY §2.8 get_json_object) ----
    "q17_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // ---- string function surface (SURVEY §2.8 dialect parity) ----
    "q54_string_funcs" -> ((s, d) => {
      t(s, d, "customer")
        .filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_up"),
          concat_ws("|", lower(substring(col("c_name"), 1, 8)),
            lpad(col("c_custkey").cast(StringType), 6, "0")).as("name_key"),
          instr(col("c_name"), "1").cast(LongType).as("pos_1"),
          length(translate(col("c_name"), "0123456789", "")).cast(LongType)
            .as("alpha_len"))
        .orderBy(col("c_custkey"))
    }),

    // ---- filtered / conditional aggregates (SURVEY §2.4) ----
    "q55_conditional_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("n_bulk"),
          dsum(when(col("l_returnflag") === "R",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("returned_revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_linestatus"))
    }),

    // ---- expressions / CASE (SURVEY §2.8) ----
    "q18_case_expr" -> ((s, d) => {
      t(s, d, "orders")
        .select(
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high").as("bucket"),
          concat(substring(col("o_orderpriority"), 1, 1), lit("_"),
            col("o_orderstatus")).as("prio_status"))
        .groupBy(col("bucket"), col("prio_status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"), col("prio_status"))
    }),

    // ---- merge / incremental / CDC (SURVEY §2.3 merge, §2.9) ----
    "q19_merge_upsert" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      // Checkpoint lookup à la Sqoop's saved last-value — a deliberate
      // one-scalar driver read, scale-factor independent.
      val cut = ev.agg(expr("max(event_id) div 2")).head().getLong(0)
      val oldSnap = Merge.latestWins(
        ev.filter(col("event_id") < cut), Seq("user_id"), Seq(col("event_id")))
      val fresh = ev.filter(col("event_id") >= cut)
      Merge.upsert(oldSnap, fresh, Seq("user_id"), Seq(col("event_id")))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value"))
        .orderBy(col("user_id"))
    }),

    "q20_incremental" -> ((s, d) => {
      // Checkpoint = 80% of max id, scale-factor independent (broadcast
      // scalar, no driver collect).
      val ev = t(s, d, "events")
      val ckpt = ev.agg(expr("max(event_id) * 4 div 5").as("ckpt"))
      ev.crossJoin(broadcast(ckpt))
        .filter(col("event_id") > col("ckpt"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .orderBy(col("event_type"))
    }),

    "q21_cdc_apply" -> ((s, d) => {
      val ops = t(s, d, "events").select(
        col("user_id"),
        when(col("event_type") === "signup", Cdc.OpInsert)
          .when(col("event_type") === "error", Cdc.OpDelete)
          .otherwise(Cdc.OpUpdate).as("op"),
        col("event_id"), col("value"))
      Cdc.applyLog(ops, Seq("user_id"), "op", Seq(col("event_id")))
        .select(col("user_id"), col("op"), col("event_id"), col("value"))
        .orderBy(col("user_id"))
    }),

    // ---- temporal joins (as-of / interval — beyond the reference) ----
    "q57_asof_join" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val ev = t(s, d, "events")
        .select(col("user_id").as("o_custkey"), col("ts"),
          col("event_id"), col("value"))
      operators.TemporalJoins.asofBackward(o, ev, "o_custkey",
          "o_orderdate", "ts", Seq("event_id", "value"), "event_id")
        .select(col("o_orderkey"), col("o_custkey"),
          col("asof_event_id"), col("asof_value"))
        .orderBy(col("o_orderkey"))
    }),

    "q56_interval_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("e_ts"))
      val matched = operators.TemporalJoins.intervalJoin(
          purchases, errors, "user_id", "p_ts", "e_ts", 3600L)
        .groupBy(col("p_id")).agg(count(lit(1)).as("n_err"))
      purchases.join(matched, Seq("p_id"), "left")
        .select(col("p_id"), col("user_id"),
          coalesce(col("n_err"), lit(0L)).as("n_err"))
        .orderBy(col("p_id"))
    }),

    // ---- sessionization (event-time gap windows, §2.9 superset) ----
    "q49_sessionize" -> ((s, d) => {
      operators.Sessionize.sessions(t(s, d, "events"), "ts", "user_id", "30 minutes")
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // ---- stateful streaming CDC (mapGroupsWithState) vs batch oracle ----
    "str48_cdc_stream" -> ((s, d) => {
      import s.implicits._
      val streamDir = tmpDir("graft_str48")
      val ops = t(s, d, "events").select(
        col("user_id").as("key"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_id").as("seq"), col("value"))
      ops.coalesce(4).write.mode("overwrite").parquet(streamDir.toString)
      val opStream = s.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[graft.streaming.CdcStream.CdcOp]].schema)
        .parquet(streamDir.toString)
        .as[graft.streaming.CdcStream.CdcOp]
      val name = "str48_" + java.util.UUID.randomUUID.toString.replace("-", "")
      graft.streaming.CdcStream.runBatch(s, opStream, name)
        .select(col("key"), col("seq"), col("value"))
        .orderBy(col("key"))
    }),

    // Watermarked stream-stream interval join (§2.9): clicks pair with
    // same-user purchases inside a day. Inner join in append mode emits
    // each pair once both rows arrived; the watermarks + time bound keep
    // the join state finite. Deterministic (every pair emits exactly
    // once) → exact SQL oracle.
    "str90_stream_join" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val streamDir = tmpDir("graft_str90")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      def src = s.readStream.schema(rawSchema).parquet(streamDir.toString)
        .withColumn("ts", Tables.eventTs(rawSchema("ts").dataType))
      val clicks = src.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val buys = src.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"),
          col("ts").as("buy_ts"))
      val joined = graft.streaming.MicroBatch.intervalJoin(
          clicks, buys, "user_id", "click_ts", "buy_ts", "1 hour", "1 day")
        .select(col("l.user_id").as("user_id"), col("click_id"), col("buy_id"))
      val name = "str90_" + java.util.UUID.randomUUID.toString.replace("-", "")
      graft.streaming.MicroBatch.runToMemory(s, joined, name,
          outputMode = "append")
        .orderBy(col("click_id"), col("buy_id"))
    }),

    // ---- lookup join (SURVEY §2.3 — batch form of the Flink lookup) ----
    "q22_lookup_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val p = t(s, d, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("p_brand"))
    }),

    // ---- max_pt (SURVEY §2.8 — latest-partition scalar) ----
    "q23_max_pt" -> ((s, d) => {
      val withMon = t(s, d, "orders")
        .withColumn("mon", date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM"))
      val maxMon = withMon.agg(max(col("mon")).as("max_mon"))
      withMon.join(broadcast(maxMon), col("mon") === col("max_mon"))
        .groupBy(col("mon"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total_price"))
        .orderBy(col("mon"))
    }),

    // ---- catalog: views + external tables (§ views / EXTERNAL_TABLE) ----
    "q71_view" -> ((s, d) => {
      // catalog plugins are cached per session by name: register once,
      // then drop/recreate the view so repeated invocations (bench
      // warmups) stay idempotent
      if (s.conf.getOption("spark.sql.catalog.graft_vwq").isEmpty) {
        s.conf.set("spark.sql.catalog.graft_vwq", "graft.catalog.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_vwq.root",
          tmpDir("graft_vwq").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_vwq.vdb")
      t(s, d, "lineitem").createOrReplaceTempView("graft_li_for_view")
      org.apache.spark.sql.graft.Catalogs.plugin(s, "graft_vwq")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
        .dropView(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("vdb"), "v_flag_agg"))
      graft.catalog.CatalogFunctions.createView(s, "graft_vwq",
        Array("vdb"), "v_flag_agg",
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM graft_li_for_view
          |GROUP BY l_returnflag, l_linestatus""".stripMargin)
      graft.catalog.CatalogFunctions.viewDf(s, "graft_vwq",
        Array("vdb"), "v_flag_agg")
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q72_external" -> ((s, d) => {
      if (s.conf.getOption("spark.sql.catalog.graft_extq").isEmpty) {
        s.conf.set("spark.sql.catalog.graft_extq", "graft.catalog.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_extq.root",
          tmpDir("graft_extq").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_extq.edb")
      s.sql("DROP TABLE IF EXISTS graft_extq.edb.supplier_ext")
      s.sql("CREATE EXTERNAL TABLE graft_extq.edb.supplier_ext " +
        "(s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE) " +
        s"LOCATION '$d/supplier.parquet'")
      s.sql("""SELECT s_nationkey, count(*) AS n_suppliers,
        | CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM graft_extq.edb.supplier_ext
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin)
    }),

    // ---- text analysis (training-data ops) ----
    "t24_token_stats" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast(LongType)).as("total_tokens"),
          sum(TextAnalysis.subwordCount(col("text")).cast(LongType)).as("total_subwords"),
          sum(length(col("text")).cast(LongType)).as("total_chars"))
        .orderBy(col("lang"))
    }),

    // Normalization-keyed exact dedup: normalize (lower/strip/collapse),
    // then count docs sharing a normalized key — catches case/punct
    // re-renders byte-exact hashing misses. Exact SQL oracle.
    "t97_normalize_dedup" -> ((s, d) => {
      val norm = operators.TextAnalysis.normalizeText(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), norm.as("norm"))
        .groupBy(col("norm"))
        .agg(min(col("doc_id")).as("survivor_id"),
          count(lit(1)).as("dup_count"))
        .select(col("survivor_id"), col("dup_count"),
          length(col("norm")).cast(LongType).as("norm_len"))
        .orderBy(col("survivor_id"))
    }),

    // Exact corpus heavy hitters: vocabulary-sized shuffle (map-side
    // combine) + TakeOrderedAndProject; total order (n desc, token) makes
    // top-k deterministic across engines.
    "t94_top_tokens" -> ((s, d) => {
      operators.TextAnalysis.topTokens(t(s, d, "documents"), "text", 50)
    }),

    // BPE tokenizer training: distributed word counts (vocabulary-sized
    // shuffle) + driver merge fit over a capped count table. Fully
    // deterministic (tie-broken) but the iterative merge loop is not
    // SQL-expressible — rows-only; TokenizerSpec pins the classic merge
    // sequence and partitioning-independence.
    "t105_bpe_train" -> ((s, d) => {
      operators.Tokenizer
        .bpeTrain(t(s, d, "documents"), "text",
          numMerges = 200, maxWords = 20000)
        .toDF(s)
        .orderBy(col("rank"))
    }),

    // BPE encode over the corpus with the trained model: zero-shuffle
    // cached encode; rows-only (model-dependent), TokenizerSpec pins
    // decode∘encode = id and per-word token bounds.
    "t106_bpe_encode" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = operators.Tokenizer
        .bpeTrain(docs, "text", numMerges = 200, maxWords = 20000)
      val enc = operators.Tokenizer.bpeEncodeUdf(s, model)
      docs.filter(col("doc_id") < 300)
        .select(col("doc_id"), enc(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast(LongType).as("n_subwords"),
          concat_ws("|", slice(col("toks"), 1, 8)).as("head_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Exact corpus bigram table (LM training statistics): one count
    // shuffle with map-side combine; top-200 with a total order →
    // hash-green vs the DuckDB oracle.
    "t107_bigram_counts" -> ((s, d) => {
      operators.LanguageModel.ngramCounts(t(s, d, "documents"), "text", 2)
        .orderBy(col("n").desc, col("ctx"), col("word"))
        .limit(200)
    }),

    // CCNet-style perplexity scoring under an add-α bigram LM trained on
    // the same corpus. Float log/exp differ in ULPs across engines →
    // rows-only; LanguageModelSpec pins hand-computed probabilities.
    "t108_lm_perplexity" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val lm = operators.LanguageModel.train(docs, "text", n = 2, alpha = 0.1)
      operators.LanguageModel
        .perplexity(docs.filter(col("doc_id") < 300), lm, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Boilerplate line removal (CCNet/RefinedWeb line-level dedup): docs
    // are line-split (12-token chunks; corpus text has no newlines) with a
    // boilerplate line planted on every third doc; lines in > 5 distinct
    // docs are removed everywhere and docs reassembled. Hash-first count,
    // exact confirmation → hash-green vs the DuckDB oracle.
    "t110_line_dedup" -> ((s, d) => {
      val boiler = "please subscribe to our newsletter"
      val lined = t(s, d, "documents")
        .select(col("doc_id"),
          concat_ws("\n",
            TextAnalysis.chunkByTokens(col("text"), 12, 0)).as("lined"))
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(col("lined"), lit("\n" + boiler)))
            .otherwise(col("lined")).as("text"))
      operators.Dedup.lineDedup(lined, "doc_id", "text", maxDocFreq = 5)
        .select(col("id").as("doc_id"), col("text"),
          col("kept_lines"), col("total_lines"))
        .orderBy(col("doc_id"))
    }),

    // Embedding prototypicality: cosine to the per-label centroid, keep
    // the [2%, 100%] band per domain. Float centroid/cosine math is
    // order-dependent across engines → rows-only; CurationLineProtoSpec
    // pins hand-computed centroids and planted-outlier removal.
    "s111_prototypicality" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
      operators.Similarity.prototypicalityFilter(emb,
        "vec_id", "embedding", "label", loQuantile = 0.02)
        .select(col("vec_id"), col("label").cast(LongType).as("label"),
          round(col("proto_score"), 6).as("score"))
        .orderBy(col("vec_id"))
    }),

    // Deterministic train/val/test corpus split over the engine-portable
    // multiplicative hash (same scheme as q64/q76) → hash-green.
    "q113_corpus_split" -> ((s, d) => {
      val o = t(s, d, "orders")
      operators.Dedup.splitCorpus(o, "o_orderkey",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
          hash = Some(col("o_orderkey") * 2654435761L % 1000003L),
          denominator = 1000)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("split"))
    }),

    // Trainer-ready sequence packing: BPE-encode the corpus to id arrays,
    // lay documents end-to-end per language, cut fixed 256-id training
    // sequences (pad id 0). Bins bound the reassembly groupBy by
    // construction. Rows-only (model-dependent ids); TokenizerSpec pins
    // exact stream reconstruction and fixed lengths.
    "t114_pack_sequences" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = operators.Tokenizer
        .bpeTrain(docs, "text", numMerges = 200, maxWords = 20000)
      val enc = operators.Tokenizer.bpeEncodeIdsUdf(s, model)
      val encoded = docs
        .select(col("doc_id"), col("lang"), enc(col("text")).as("ids"))
      operators.Tokenizer.packSequences(encoded, "ids", seqLen = 256,
          group = col("lang"), order = col("doc_id"))
        .select(col("group"), col("bin"), col("seq_idx"),
          size(col("ids")).cast(LongType).as("n_ids"),
          xxhash64(concat_ws(",", col("ids"))).as("ids_hash"))
        .orderBy(col("group"), col("bin"), col("seq_idx"))
    }),

    // Fasttext-style hashing-trick quality classifier: gradient descent as
    // Spark aggregations (dim-bounded driver traffic per epoch), scoring
    // as a zero-shuffle codegen'd expression. The iterative fit is not
    // SQL-expressible → rows-only; ClassifierSpec pins separable-data
    // convergence, loss descent, and rule recovery on this corpus.
    "t109_quality_classifier" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"),
          array_contains(split(col("text"), " "), "join")
            .cast("int").as("label"))
      // Train on a bounded labeled sample (the 100 TB contract: training
      // sets are label-limited), score the WHOLE corpus zero-shuffle.
      val model = operators.Classifier.train(docs, "text", "label",
        dim = 1 << 14, epochs = 12, lr = 2.0, maxTrainRows = 5000)
      operators.Classifier.classify(docs, "text", model)
        .select(col("doc_id"), col("label").cast(LongType).as("label"),
          round(col("score"), 4).as("score"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    "t25_quality" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast(LongType).as("n_tokens"),
          round(TextAnalysis.stopwordRatio(col("text")), 5).as("stop_ratio"),
          round(TextAnalysis.meanTokenLen(col("text")), 5).as("mean_token_len"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "t26_langid" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("predicted"))
        .withColumn("is_match", col("predicted") === col("lang"))
        .orderBy(col("doc_id"))
    }),

    // PII redaction over planted identifiers (synthetic corpus has none)
    "q66_redact" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or https://ex.com/page tel 555-123-4567")).as("dirty"))
        .select(col("doc_id"),
          TextAnalysis.redactPii(col("dirty")).as("clean"))
        .withColumn("has_email", col("clean").contains("<EMAIL>"))
        .withColumn("still_dirty", col("clean").contains("@example.com"))
        .orderBy(col("doc_id"))
    }),

    // overlapping token-window chunking (RAG/embedding prep)
    "q67_chunk" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunkByTokens(col("text"), 64, 8)))
        .select(col("doc_id"), col("pos").cast(LongType).as("chunk_idx"),
          org.apache.spark.sql.graft.NativeFunctions.tokenCount(col("col"))
            .cast(LongType).as("chunk_tokens"),
          substring(col("col"), 1, 30).as("chunk_head"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // benchmark decontamination: docs ≡ 0 (mod 25) form the "benchmark";
    // at threshold 0.99 only their exact corpus twins are removed
    "q68_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bench = docs.filter(col("doc_id") % 25 === 0)
      Dedup.decontaminate(docs, bench, "doc_id", "text", threshold = 0.99)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    }),

    // Gopher-style intra-doc repetition quality signal
    "q69_repetition" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          round(TextAnalysis.repetitionRatio(col("text"), 2), 5).as("rep2"),
          round(TextAnalysis.repetitionRatio(
            concat(col("text"), lit(" "), col("text")), 2), 5).as("rep2_doubled"))
        .orderBy(col("doc_id"))
    }),

    "t27_fingerprint" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("survivor_id"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("survivor_id"))
    }),

    // ---- deduplication (training-data ops) ----
    "d28_dedup_exact" -> ((s, d) => {
      Dedup.exact(t(s, d, "documents"), "doc_id", Seq("text"))
        .select(col("survivor_id"), col("dup_count"))
        .orderBy(col("survivor_id"))
    }),

    // hash-first exact dedup (the 100 TB shape: only (id, hash) shuffles,
    // key columns travel for colliding groups only); dups planted via a
    // shifted-id union so the group output is non-trivial
    "d62_dedup_groups" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val planted = docs.unionByName(
        docs.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      Dedup.exactDupGroups(planted, "doc_id", Seq("text"))
        .select(col("survivor_id"), col("dup_count"))
        .orderBy(col("survivor_id"))
    }),

    // incremental ingest dedup: odd-id docs (+ planted copies of base
    // texts under new ids) arrive as a batch against the even-id docs as
    // the already-deduplicated base; survivors are intra-batch-unique
    // rows whose text is not in the base — and the base's text column
    // never shuffles, only its 64-bit hashes
    "d100_dedup_increment" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") % 2 === 0)
      val inc = docs.filter(col("doc_id") % 2 === 1)
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
      Dedup.exactIncrement(inc, base, "doc_id", Seq("text"))
        .select(col("doc_id"), length(col("text")).cast(LongType).as("n_len"))
        .orderBy(col("doc_id"))
    }),

    // incremental NEAR-dup ingest: the base corpus participates only via
    // its precomputed MinHash index (text read once at index build); the
    // increment plants last-word-perturbed copies of base docs, which the
    // cross-corpus band join + exact-Jaccard verify must drop. Rows-only:
    // seeded-LSH is not SQL-expressible; DedupSpec pins the semantics.
    "d101_neardup_increment" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") % 2 === 0)
      // Persist the index as production does (minhashIndex doc contract):
      // nearDupIncrement reads it twice with disjoint column pruning
      // (id+bands, id+sh) — a live plan would recompute the signature
      // kernel over the base corpus on each reference.
      val idxDir = tmpDir("graft_d101_idx")
      Dedup.minhashIndex(base, "doc_id", "text").write
        .mode("overwrite").parquet(idxDir.toString)
      val idx = s.read.parquet(idxDir.toString)
      val inc = docs.filter(col("doc_id") % 2 === 1)
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"),
            concat(regexp_replace(col("text"), "\\s+\\S+$", ""),
              lit(" zzz")).as("text")))
      Dedup.nearDupIncrement(inc, idx, "doc_id", "text", threshold = 0.5)
        .select(col("doc_id"), length(col("text")).cast(LongType).as("n_len"))
        .orderBy(col("doc_id"))
    }),

    // foreign-warehouse bucket assignment (the §7.3 interop pack):
    // per-bucket membership stats under the bit-compatible hash. Rows-only:
    // the foreign hash is definitionally not ANSI-SQL-expressible;
    // ExpressionsSpec pins known-answer values, null handling, and the
    // codegen path.
    "q104_foreign_bucket" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.select(org.apache.spark.sql.graft.NativeFunctions
          .foreignBucketId(16, col("o_custkey"), col("o_orderstatus"))
          .as("bucket"),
          col("o_orderkey"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("bucket"))
    }),

    // streaming ingest near-dup dedup: the d101 scenario driven through
    // Structured Streaming — two micro-batches (maxFilesPerTrigger=1)
    // survive nearDupIncrement against the persisted index, which
    // accumulates each batch's survivors so later batches dedup against
    // earlier ones. Rows-only: seeded LSH is not SQL-expressible;
    // StreamingSpec pins the cross-batch semantics.
    "str103_stream_neardup_ingest" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val root = tmpDir("graft_str103")
      val (indexDir, outDir, srcDir, ckpt) =
        (s"$root/idx", s"$root/out", s"$root/src", s"$root/ckpt")
      val base = docs.filter(col("doc_id") % 2 === 0)
      graft.operators.Dedup.minhashIndex(base, "doc_id", "text")
        .write.parquet(s"$indexDir/batch=seed")
      // batch 1: the odd-id fresh docs; batch 2: planted near-dups of
      // already-indexed docs. Staged with pinned order — cross-batch
      // dedup is order-sensitive, so the replay must fix which batch
      // each row rides in (a repartition(2) split did not).
      val fresh = docs.filter(col("doc_id") % 2 === 1)
      val planted = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(regexp_replace(col("text"), "\\s+\\S+$", ""),
            lit(" zzz")).as("text"))
      stageReplayBatches(s, Seq(fresh, planted), srcDir)
      val stream = s.readStream.schema(fresh.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamNearDupIngest(
        stream, indexDir, outDir, ckpt, "doc_id", "text", threshold = 0.5)
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(outDir)
        .select(col("doc_id"), length(col("text")).cast(LongType).as("n_len"))
        .orderBy(col("doc_id"))
    }),

    // Streaming curation: the full ingest-time composition — redact →
    // rule screens with a reasoned DLQ → near-dup dedup vs the
    // accumulated index. Planted junk (too-short docs, exact replays of
    // already-ingested text) must land in DLQ / lose dedup. Rows-only
    // (MinHash index); StreamingSpec pins reasons + replay idempotence.
    "str148_stream_curate" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val root = tmpDir("graft_str148")
      val (indexDir, outDir, rejDir, srcDir, ckpt) =
        (s"$root/idx", s"$root/out", s"$root/rej", s"$root/src", s"$root/ckpt")
      // batch 1: the originals; batch 2: planted junk — rule-rejects
      // (sub-minTokens docs) and verbatim replays that must lose dedup
      // against batch 1's survivors. Pinned batch order (dedup vs the
      // accumulated index is order-sensitive).
      val originals = docs.filter(col("doc_id") < 300)
      val junk = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          lit("tiny doc").as("text"))
        .unionByName(docs.filter(col("doc_id") % 40 === 0)
          .filter(col("doc_id") < 300)
          .select((col("doc_id") + 600000L).as("doc_id"), col("text")))
      stageReplayBatches(s, Seq(originals, junk), srcDir)
      val stream = s.readStream.schema(originals.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamCurate(
        stream, indexDir, outDir, rejDir, ckpt, "doc_id", "text",
        graft.streaming.MicroBatch.CurateConfig(
          minQuality = 0.0, minTokens = 5, threshold = 0.6))
      try q.processAllAvailable() finally q.stop()
      val out = s.read.parquet(outDir)
        .select(col("doc_id"), lit("kept").as("disposition"))
      val rej = s.read.parquet(rejDir)
        .select(col("doc_id"), concat(lit("rej:"), col("reason")).as("disposition"))
      out.unionByName(rej).orderBy(col("doc_id"))
    }),

    // DSIR importance resampling: select the quarter of the corpus whose
    // hashed-n-gram distribution best matches a 3-source target slice.
    // Rows-only: bucket hashing + gumbel selection are not SQL-expressible;
    // DedupSpec pins the semantics (dense weights, family separation,
    // seeded-gumbel determinism).
    "d102_importance_sample" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val target = docs
        .filter(col("source").isin("src18", "src6", "src7"))
        .select(col("text"))
      Dedup.importanceResample(docs, "doc_id", "text", target,
          keepFraction = 0.25)
        .select(col("doc_id"), length(col("text")).cast(LongType).as("n_len"))
        .orderBy(col("doc_id"))
    }),

    // dup-cluster resolution: pairs chained (id ↔ id+100k ↔ id+200k) so
    // min-label propagation must traverse two hops per component
    "d63_dup_clusters" -> ((s, d) => {
      val ids = t(s, d, "documents").select(col("doc_id"))
      val pairs = ids.select(col("doc_id").as("id_a"),
          (col("doc_id") + 100000L).as("id_b"))
        .unionByName(ids.select((col("doc_id") + 100000L).as("id_a"),
          (col("doc_id") + 200000L).as("id_b")))
      Dedup.dupClusters(pairs)
        .orderBy(col("id"))
    }),

    // deterministic stratified sampling (reproducible across engines and
    // partitionings); the oracle-shared hash is modulo-on-key here, the
    // operator's default is seeded xxhash64
    "q64_hash_sample" -> ((s, d) => {
      val o = t(s, d, "orders")
      Dedup.hashSample(o, "o_orderkey", 0.25,
          hash = Some(col("o_orderkey") * 2654435761L % 1000003L),
          denominator = 1000)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // context-window packing: running token budget per language, one
    // training sequence per (lang, bin)
    "q65_token_pack" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
        org.apache.spark.sql.graft.NativeFunctions.tokenCount(col("text"))
          .cast(LongType).as("n_tokens"))
      operators.TextAnalysis
        .packByTokenBudget(docs, "n_tokens", 2048, col("lang"), col("doc_id"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast(LongType).as("tok_sum"))
        .orderBy(col("lang"), col("bin"))
    }),

    "d29_minhash_neardup" -> ((s, d) => {
      Dedup.minhashNearDups(t(s, d, "documents"), "doc_id", "text",
          shingleK = 5, numHashes = 128, bands = 32, threshold = 0.4)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "d30_simhash_neardup" -> ((s, d) => {
      Dedup.simhashNearDups(t(s, d, "documents"), "doc_id", "text", radius = 8)
        .select(col("id_a"), col("id_b"), col("hamming").cast(LongType).as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "d31_embed_neardup" -> ((s, d) => {
      Dedup.embeddingNearDups(t(s, d, "embeddings"), "vec_id", "embedding",
          dim = 64, threshold = 0.3, numPlanes = 8)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Streaming ingest-time dedup (dropDuplicatesWithinWatermark): state
    // is one entry per key, watermark-evicted. Projecting just the keys
    // makes the output the distinct key set — exact SQL oracle.
    "str92_stream_dedup" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val streamDir = tmpDir("graft_str92")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      val src = s.readStream.schema(rawSchema).parquet(streamDir.toString)
        .withColumn("ts", Tables.eventTs(rawSchema("ts").dataType))
      val deduped = graft.streaming.MicroBatch.streamDedup(
          src, "ts", "1 hour", Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"))
      val name = "str92_" + java.util.UUID.randomUUID.toString.replace("-", "")
      graft.streaming.MicroBatch.runToMemory(s, deduped, name,
          outputMode = "append")
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Streaming ingest through the learned quality gate: the classifier
    // (trained batch-side, weights a plan literal) scores each arriving
    // document STATELESSLY inside the micro-batch — per-source keep
    // rates aggregate in complete mode. Demonstrates that every scoring
    // operator composes onto Structured Streaming unchanged. Rows-only;
    // StreamingSpec pins stream-vs-batch count equality.
    "str112_stream_quality" -> ((s, d) => {
      val streamDir = tmpDir("graft_str112")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("documents.parquet"),
        java.nio.file.Paths.get(s"$d/documents.parquet"))
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"),
          array_contains(split(col("text"), " "), "join")
            .cast("int").as("label"))
      val model = operators.Classifier.train(docs, "text", "label",
        dim = 1 << 14, epochs = 12, lr = 2.0, maxTrainRows = 5000)
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val src = s.readStream.schema(schema).parquet(streamDir.toString)
      val scored = src.select(col("source"),
        (operators.Classifier.scoreExpr(col("text"), model) >= 0.5)
          .cast("long").as("keep"))
      val agg = scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("keep")).as("kept"))
      val name = "str112_" + java.util.UUID.randomUUID.toString.replace("-", "")
      graft.streaming.MicroBatch.runToMemory(s, agg, name)
        .orderBy(col("source"))
    }),

    // Temperature-scaled domain mixing (p_d ∝ n_d^alpha): rows-only —
    // the realized sample hangs on seeded xxhash64 buckets; DedupSpec
    // pins the per-domain rate realization and smoothing direction.
    "d93_temperature_mix" -> ((s, d) => {
      operators.Dedup.temperatureMix(t(s, d, "documents"), "doc_id",
          "source", alpha = 0.5, targetRows = 300)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .orderBy(col("source"))
    }),

    // Semantic decontamination: corpus rows within LSH-bucketed cosine
    // reach of a "benchmark" slice are dropped (the embedding companion
    // of q68's shingle-overlap decontamination). Rows-only: seeded-LSH
    // buckets are not SQL-expressible; DedupSpec pins planted-copy
    // removal and survivor soundness.
    "d96_semantic_decontaminate" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      operators.Dedup.semanticDecontaminate(
          emb.filter(col("vec_id") >= 20), "vec_id", "embedding",
          emb.filter(col("vec_id") < 20).select(col("embedding")),
          "embedding", dim = 64, threshold = 0.3, numPlanes = 8)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // SemDeDup-style semantic dedup: k-means cells as the candidate
    // generator (sample-capped fit), within-cell exact-cosine verify,
    // min-id survivor. Rows-only: the k-means fit is not SQL-expressible;
    // DedupSpec pins planted-duplicate collapse + pair soundness.
    "d91_semantic_dedup" -> ((s, d) => {
      operators.Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id",
          "embedding", nlist = 8, threshold = 0.3)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    "d40_ngram_neardup" -> ((s, d) => {
      operators.Dedup.ngramJaccardNearDups(t(s, d, "documents"), "doc_id", "text",
          shingleK = 4, threshold = 0.35, docFreqCap = 16)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- similarity search (training-data ops) ----
    "s32_ann_brute" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("id"),
          round(VectorFunctions.cosine(col("embedding"), VectorFunctions.vec(q)), 5)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("id"))
        .limit(10)
    }),

    "s33_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Similarity.lshTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          dim = 64, query = q, k = 10, numPlanes = 12, probeHamming = 3)
        .select(col("id"), round(col("cosine"), 5).as("cosine"))
        .orderBy(col("cosine").desc, col("id"))
    }),

    "s44_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Similarity.ivfTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          query = q, k = 10, nlist = 16, nprobe = 6)
        .select(col("id"), round(col("cosine"), 5).as("cosine"))
        .orderBy(col("cosine").desc, col("id"))
    }),

    // PQ-compressed ANN (IVF-PQ's compression half): m-subspace codebooks
    // (sample-capped fit), codes = m small ints per vector, ADC lookup
    // scoring + exact rerank. Rows-only: the k-means fit is not
    // SQL-expressible; DedupSpec pins recall vs brute force + self-query.
    "s95_ann_pq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val corpus = emb.filter(col("vec_id") =!= 0)
      val books = Similarity.pqFit(corpus, "embedding", m = 8, codebookSize = 16)
      Similarity.pqTopK(
          Similarity.pqEncode(corpus, "vec_id", "embedding", books),
          books, q, k = 10)
        .select(col("id"), round(col("cosine"), 5).as("cosine"))
        .orderBy(col("cosine").desc, col("id"))
    }),

    // IVF-PQ composed (the memory-speed 100 TB serve path): coarse cells
    // prune the scan to nprobe/nlist of the corpus, ADC ranks only those
    // cells' m-byte codes, exact rerank on the shortlist. Rows-only: the
    // k-means fits are not SQL-expressible; DedupSpec pins recall vs brute
    // force and vs whole-corpus ADC.
    "s99_ann_ivfpq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val corpus = emb.filter(col("vec_id") =!= 0)
      // one-pass build: one count + one sample scan fit both models
      val (centers, books) =
        Similarity.ivfPqFit(corpus, "embedding", nlist = 16,
          m = 8, codebookSize = 16)
      Similarity.ivfPqTopK(
          Similarity.ivfPqAssign(corpus, "vec_id", "embedding", centers, books),
          centers, books, q, k = 10, nprobe = 6)
        .select(col("id"), round(col("cosine"), 5).as("cosine"))
        .orderBy(col("cosine").desc, col("id"))
    }),

    "s41_knn_graph" -> ((s, d) => {
      Similarity.knnGraph(t(s, d, "embeddings"), "vec_id", "embedding",
          dim = 64, k = 5, numPlanes = 8)
        .select(col("id"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"), col("rank").cast(LongType).as("rank"))
        .orderBy(col("id"), col("rank"))
    }),

    "t42_group_sketch" -> ((s, d) => {
      // MinHash sketch UDAF: per-source vocabulary signature, then
      // estimated Jaccard of each source against source 'src0'.
      val agg = graft.functions.Aggregators.minhashSketchAgg(64)
      val sigs = t(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source")).agg(agg(col("w")).as("sig"))
      val base = sigs.filter(col("source") === "src0")
        .select(col("sig").as("base_sig"))
      sigs.crossJoin(broadcast(base))
        .select(col("source"),
          round(aggregate(zip_with(col("sig"), col("base_sig"),
            (a, b) => when(a === b, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast(DoubleType) / 64.0, 4).as("est_jaccard"))
        .orderBy(col("source"))
    }),

    "m43_frame_sample" -> ((s, d) => {
      val meta = operators.Multimodal.decode(operators.Multimodal.withPayload(
        t(s, d, "documents"), "doc_id", "text"))
      operators.Multimodal.frameSamplePlan(meta, everyMs = 1000L, maxFrames = 8)
        .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
          col("ts_ms"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // resize planning over decoded media metadata (stub decode → real
    // distributed plan; SQL-replicable stub → full differential oracle)
    "m70_resize" -> ((s, d) => {
      val meta = operators.Multimodal.decode(operators.Multimodal.withPayload(
        t(s, d, "documents").filter(col("doc_id") < 300), "doc_id", "text"))
      operators.Multimodal.resizePlan(meta, maxDim = 256)
        .orderBy(col("doc_id"))
    }),

    // composed training-data pipeline (the showcase): quality gate → exact
    // dedup → near dedup → partitioned write, report observed on the single
    // write pass. Rows-only gate entry + per-round bench timing; the report
    // equals TrainingDataPipeline.run's (pinned in PipelineSpec).
    "p88_pipeline" -> ((s, d) => {
      import s.implicits._
      val out = tmpDir("graft_p88").toString
      val r = pipelines.TrainingDataPipeline.run(s, t(s, d, "documents"), out)
      Seq((r.input, r.afterQuality, r.afterExactDedup, r.afterNearDedup,
        r.totalTokens)).toDF("input", "after_quality", "after_exact_dedup",
        "after_near_dedup", "total_tokens")
    }),

    // Per-document drop ledger (the batch pipeline's reasoned DLQ —
    // str148's batch counterpart): a planted corpus exercises one
    // loser per reason family — URL blocklist + URL dup, hash
    // sampling, token/quality/gopher screens, decontamination, exact
    // and near dedup — and the gate reports the (stage, reason)
    // histogram with per-group id extrema, plus the planted losers'
    // own ledger rows. Value-pinned (the near-dup stage isn't SQL);
    // PipelineSpec pins the exactly-once and output-XOR-ledger
    // partition laws and the results-unchanged-by-ledger law.
    "p332_drop_ledger" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").filter(col("doc_id") < 400)
        .withColumn("url", concat(lit("https://src"),
          pmod(col("doc_id"), lit(7L)), lit(".example/p/"), col("doc_id")))
      // donors from residues the url blocklist (doc_id % 7 == 3 →
      // src3.example) does NOT hit, so the dedup plantings survive to
      // their intended stages
      val donor4 = docs.filter(col("doc_id") === 4L).head
        .getAs[String]("text")
      val donor5 = docs.filter(col("doc_id") === 5L).head
        .getAs[String]("text")
      val near5 = donor5.split(" ").dropRight(1).mkString(" ") + " zzz"
      val longWords = Seq.fill(24)("pneumonoultramicroscopic")
        .mkString(" ")
      val planted = docs.unionByName(Seq(
        (900001L, donor4, "xx", "srcdup", "https://p.example/a"),
        (900002L, near5, "xx", "srcnear", "https://p.example/b"),
        (900003L, "tiny", "xx", "srctiny", "https://p.example/c"),
        (900004L, ("! ? " * 8).trim, "xx", "srcpunct",
          "https://p.example/d"),
        // 900005 loses to the 0.9 hash sample before any screen — the
        // point of a planted sampled_out row; 900007 survives sampling
        // and reaches the gopher screen
        (900005L, longWords, "xx", "srcsampled", "https://p.example/e"),
        (900007L, longWords, "xx", "srclong", "https://p.example/g"),
        (900006L, donor4, "xx", "srcurl", "https://src0.example/p/14"))
        .toDF("doc_id", "text", "lang", "source", "url")
        .withColumn("n_chars", length(col("text"))))
      val benchmark = docs.filter(col("doc_id") === 7L)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
      val out = tmpDir("graft_p332").toString
      val led = tmpDir("graft_p332_led").toString + "/ledger"
      pipelines.TrainingDataPipeline.run(s, planted, out,
        pipelines.TrainingDataPipeline.Config(minQuality = 0.6,
          minTokens = 3, nearDupThreshold = 0.6,
          sampleFraction = Some(0.9),
          gopherRules = Some(pipelines.TrainingDataPipeline.GopherRules(
            minWords = 2, maxWords = 100000, minMeanLen = 0.0,
            maxMeanLen = 12.0, minStopRatio = 0.0, maxRepetition = 1.0)),
          urlDedupCol = Some("url"),
          blockedDomains = Some(Seq("src3.example"))),
        benchmark = Some(benchmark),
        dropLedger = Some(pipelines.TrainingDataPipeline.DropLedger(led)))
      val ledger = s.read.parquet(led)
      val hist = ledger.groupBy(col("stage"), col("reason"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .select(col("stage"), col("reason"), col("n"),
          col("min_id").cast(LongType).as("min_id"),
          col("max_id").cast(LongType).as("max_id"))
      val plantedRows = ledger
        .filter(col("doc_id") >= 900000L || col("doc_id") === 7L)
        .select(lit("planted").as("stage"),
          concat(col("stage"), lit(":"), col("reason")).as("reason"),
          lit(1L).as("n"), col("doc_id").cast(LongType).as("min_id"),
          col("doc_id").cast(LongType).as("max_id"))
      hist.unionByName(plantedRows)
        .orderBy(col("stage"), col("reason"), col("min_id"))
    }),

    // Z-order clustered layout (Delta OPTIMIZE ZORDER analogue): cluster
    // events on the Morton curve over (user_id, value), write, read back
    // with a predicate on BOTH dims. Results are layout-invariant — the
    // oracle is the same filter+agg on the unclustered table — while
    // ZOrderSpec pins the actual pruning property (per-file spans tight in
    // every dimension, not just the leading sort key).
    "q89_zorder" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val out = tmpDir("graft_q89").toString
      operators.ZOrder.cluster(ev, Seq("user_id", "value"), 8)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("user_id") <= 7 && col("value") <= 100.0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // ---- ingest parsing (flume regex/delimiter serializers, SURVEY §2.2) ----
    "q36_regexp_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
            .cast(LongType).as("k"))
        .filter(col("k") % 7 === 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    }),

    // ---- delimited ingest fidelity (Sqoop text import): stage → re-read
    //      with explicit schema → aggregate must match the parquet oracle ----
    "q51_csv_ingest" -> ((s, d) => {
      val src = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val dir = tmpDir("graft_q51").toString
      graft.sources.FileFormats.writeDelimited(src, dir, delimiter = "|")
      graft.sources.FileFormats.readDelimited(s, dir, src.schema, delimiter = "|")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice"), 2).as("total_price"),
          min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // avro staging round trip (AvroImportMapper.java surface): write the
    // working set to avro containers, read it back through the splittable
    // input format, aggregate — oracle runs on the original parquet.
    "q59_avro_ingest" -> ((s, d) => {
      val src = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val dir = tmpDir("graft_q59").toString + "/data"
      // small working set → few staging containers (q51 precedent)
      graft.sources.FileFormats.writeAvro(src.coalesce(4), dir)
      graft.sources.FileFormats.readAvro(s, dir, src.schema)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice"), 2).as("total_price"),
          min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // avro LOGICAL types round trip (AvroImportMapper typed-column surface,
    // odps-sqoop testdata/DatatypeTestData-import-lite.txt): decimal/date/
    // timestamp columns through the avro container — decimal as
    // bytes/decimal at declared scale, date as int/date, timestamp as
    // long/timestamp-micros — read back and aggregated; oracle runs on the
    // original parquet, so any round-trip drift hash-fails.
    "q98_avro_typed" -> ((s, d) => {
      val src = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderdate"),
          to_date(col("o_orderdate")).as("odate"),
          col("o_totalprice").cast(DecimalType(12, 2)).as("price_d"))
      val dir = tmpDir("graft_q98").toString + "/data"
      graft.sources.FileFormats.writeAvro(src.coalesce(4), dir)
      graft.sources.FileFormats.readAvro(s, dir, src.schema)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price_d")).cast(DecimalType(38, 2)).cast(StringType).as("sum_price"),
          min(col("odate")).cast(StringType).as("min_date"),
          max(col("o_orderdate")).cast(StringType).as("max_ts"))
        .orderBy(col("o_orderstatus"))
    }),

    // decimal end-to-end (SURVEY §7.4 risk): DECIMAL(12,2)/(38,18) columns
    // written to parquet (decimal logical type), read back, aggregated in
    // decimal, rendered as strings so the compare is exact at full scale.
    "q60_decimal_agg" -> ((s, d) => {
      val src = t(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_extendedprice").cast(DecimalType(12, 2)).as("price_d"),
          // through (12,2) first: both engines agree on the 2-decimal value,
          // then widen — a direct double→(38,18) cast differs in the last
          // ulps (DuckDB expands the binary double, Spark shortest-rounds)
          col("l_discount").cast(DecimalType(12, 2))
            .cast(DecimalType(38, 18)).as("disc_d"))
      val dir = tmpDir("graft_q60").toString + "/data"
      src.coalesce(4).write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("price_d")).cast(DecimalType(38, 2)).cast(StringType).as("sum_price"),
          min(col("price_d")).cast(StringType).as("min_price"),
          max(col("price_d")).cast(StringType).as("max_price"),
          sum(col("disc_d")).cast(DecimalType(38, 18)).cast(StringType).as("sum_disc"))
        .orderBy(col("l_returnflag"))
    }),

    // map-typed scalar functions (SURVEY §1.2 MAP<k,v> surface):
    // map_from_arrays / element_at / size / map_keys / map_values
    "q61_map_funcs" -> ((s, d) => {
      t(s, d, "nation")
        .select(col("n_nationkey"),
          map_from_arrays(
            array(lit("nk"), lit("name")),
            array(col("n_nationkey").cast(StringType), col("n_name"))).as("m"))
        .select(col("n_nationkey"),
          element_at(col("m"), "name").as("name_v"),
          size(col("m")).cast(LongType).as("m_size"),
          array_join(map_keys(col("m")), ",").as("ks"),
          array_join(map_values(col("m")), "|").as("vs"))
        .orderBy(col("n_nationkey"))
    }),

    // ---- generator / UDTF family (explode, SURVEY §2.10) ----
    "q37_explode_tokens" -> ((s, d) => {
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    // ---- approximate aggregates (HLL / quantile sketch — algorithms are
    //      engine-specific, so rows-only check) ----
    "q38_approx" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- structured streaming: event-time tumbling window over the
    //      events table as a file stream (SURVEY §2.9 superset) ----
    "str39_stream_window" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The streaming file source lists a directory; expose the single
      // parquet file through a temp-dir symlink (no copy).
      val streamDir = tmpDir("graft_str39")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(rawSchema).parquet(streamDir.toString)
        .withColumn("ts", Tables.eventTs(rawSchema("ts").dataType))
      val agg = graft.streaming.MicroBatch.windowedCounts(
        stream, "ts", "1 hour", "1 hour", Seq(col("event_type")))
      val name = "str39_" + java.util.UUID.randomUUID.toString.replace("-", "")
      graft.streaming.MicroBatch.runToMemory(s, agg, name)
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hr"),
          col("event_type"), col("n"))
        .orderBy(col("hr"), col("event_type"))
    }),

    // ---- multimodal plumbing (binary columns + typed metadata) ----
    "m34_multimodal_meta" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .select(col("doc_id"),
          call_function("octet_length", col("payload")).cast(LongType).as("byte_len"),
          ceil(call_function("octet_length", col("payload")).cast(DoubleType) / 1024.0)
            .cast(LongType).as("n_chunks"))
        .orderBy(col("doc_id"))
    }),

    // ---- round-3 curation / scale additions ----

    // Gopher/C4-style quality gate: per-doc signals + keep flag; thresholds
    // chosen so both outcomes occur on the synthetic corpus
    "t73_gopher_quality" -> ((s, d) => {
      val txt = col("text")
      t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(txt).cast(LongType).as("n_words"),
          round(TextAnalysis.meanTokenLen(txt), 4).as("mean_len"),
          round(TextAnalysis.stopwordRatio(txt), 4).as("stop_ratio"),
          round(TextAnalysis.repetitionRatio(txt, 2), 5).as("rep2"),
          TextAnalysis.gopherKeep(txt, minWords = 30, maxWords = 10000,
            minMeanLen = 3.0, maxMeanLen = 5.0,
            minStopRatio = 0.02, maxRepetition = 0.08).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // corpus-level repeated-span removal: hash-first loser detection, then
    // per-doc reassembly; must equal the straightforward span-string SQL
    "d74_span_dedup" -> ((s, d) => {
      Dedup.spanDedup(t(s, d, "documents"), "doc_id", "text", spanTokens = 8)
        .select(col("id").as("doc_id"), col("text"),
          col("kept_spans").cast(LongType).as("kept_spans"))
        .orderBy(col("doc_id"))
    }),

    // bloom-pruned selective join: semantically the plain join (the sketch
    // only pre-drops fact rows that cannot match)
    "q75_bloom_join" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      operators.BloomJoin.bloomPrunedJoin(
          t(s, d, "orders"), cust, "o_custkey", "c_custkey",
          expectedDimRows = 100000)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
        .orderBy(col("c_mktsegment"))
    }),

    // per-source stratified sampling (training-data mixing); rates are
    // dyadic rationals so rate*denominator is exact in both engines
    "q76_stratified_sample" -> ((s, d) => {
      Dedup.stratifiedSample(t(s, d, "documents"), "doc_id", "source",
          rates = Map("src0" -> 0.75, "src1" -> 0.125, "src2" -> 0.5),
          defaultRate = 0.25,
          hash = Some(col("doc_id") * 2654435761L % 1000003L),
          denominator = 1000)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("source"))
    }),

    // symmetric int8 quantization with per-vector absmax scale
    "s77_quantize" -> ((s, d) => {
      t(s, d, "embeddings")
        .withColumn("scale", VectorFunctions.int8Scale(col("embedding")))
        .withColumn("qv", VectorFunctions.quantizeInt8(col("embedding"), col("scale")))
        .select(col("vec_id"), round(col("scale"), 6).as("scale_r"),
          aggregate(col("qv"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_max(transform(col("qv"), x => abs(x))).cast(LongType).as("q_absmax"))
        .orderBy(col("vec_id"))
    }),

    // pivot: dimension values to columns (explicit value list so the plan
    // needs no extra distinct-values job)
    "q78_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
        .orderBy(col("o_orderpriority"))
    }),

    // grouping sets with grouping_id (partial rollup lattice)
    "q79_grouping_sets" -> ((s, d) => {
      t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"), sum(col("o_custkey")).as("ck"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // HLL distinct sketches (Datasketches): mergeable across partitions —
    // rows-only (approximate by design); ScaleOpsSpec pins the error bound
    // and that per-partition sketch union equals the global sketch
    "t80_hll_sketch" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id"))).as("est_docs"),
          count(lit(1)).as("n"))
        .orderBy(col("lang"))
    }),

    // STREAMING session windows: gap-merged per-key state, append mode
    // (the only mode session aggregation supports). Append withholds
    // sessions until the watermark passes their end, so a far-future
    // sentinel event (user_id -1) is added to push the watermark beyond
    // every real session — the production "stream keeps flowing" shape;
    // the sentinel's own open session is the only state left unemitted.
    "str82_stream_session" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val streamDir = tmpDir("graft_str82")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      val raw = s.read.parquet(s"$d/events.parquet")
      // Sentinel ts = max + 1 year, computed and written in the SAME
      // representation the reader inferred for the NANOS column (raw-nanos
      // long on legacy builds, timestamp otherwise) so one stream schema
      // covers both files.
      val bumped = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          max(col("ts")) + lit(365L * 86400L * 1000000000L)
        case _ => max(col("ts")) + expr("INTERVAL 365 DAYS")
      }
      val sentinelTs = raw.agg(bumped.as("ts")).head().get(0)
      val sentinelDir = tmpDir("graft_str82_s")
      raw.limit(1)
        .withColumn("ts", lit(sentinelTs).cast(raw.schema("ts").dataType))
        .withColumn("user_id", lit(-1L))
        .coalesce(1).write.mode("overwrite").parquet(sentinelDir.toString)
      locally { // list() holds a directory fd until closed
        val listing = java.nio.file.Files.list(sentinelDir)
        try listing.filter(_.toString.endsWith(".parquet")).forEach(p =>
          java.nio.file.Files.move(p, streamDir.resolve("zz_sentinel.parquet")))
        finally listing.close()
      }
      val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        .withColumn("ts", Tables.eventTs(raw.schema("ts").dataType))
      val agg = graft.streaming.MicroBatch.sessionCounts(
        stream, "ts", "1 hour", "30 minutes", Seq(col("user_id")))
      val name = "str82_" + java.util.UUID.randomUUID.toString.replace("-", "")
      graft.streaming.MicroBatch.runToMemory(s, agg, name, outputMode = "append")
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_start"),
          col("n"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // unpivot / melt: measures to rows
    "q83_unpivot" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("qty"),
          dsum(col("l_extendedprice")).as("price"),
          dsum(col("l_discount"), 4).as("disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")), "measure", "value")
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    // distribution window functions: ntile / percent_rank / cume_dist.
    // The ratios are compared through their integer-exact numerators
    // (cume_dist*n and percent_rank*(n-1) are whole numbers by
    // definition): rounding the raw ratios invites cross-engine tie-break
    // divergence when k/n lands exactly on a rounding boundary (Spark
    // rounds the shortest decimal form half-up, DuckDB rounds the binary
    // double — observed at sf0.1).
    "q84_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val n = count(lit(1)).over(Window.partitionBy(col("c_nationkey")))
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          ntile(4).over(w).as("quartile"),
          floor(percent_rank().over(w) * (n - 1) + 0.5)
            .cast(LongType).as("pr_num"),
          floor(cume_dist().over(w) * n + 0.5).cast(LongType).as("cd_num"))
        .orderBy(col("c_custkey"))
    }),

    // timezone conversion (Metabase dialect convert-timezone,
    // maxcompute.clj:795): UTC instants rendered as Asia/Shanghai wall
    // time. Shanghai is DST-less (+08:00 for the whole data range), so the
    // oracle can state the conversion as a fixed interval shift.
    "q85_convert_tz" -> ((s, d) => {
      t(s, d, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("utc"),
          date_format(from_utc_timestamp(col("o_orderdate"), "Asia/Shanghai"),
            "yyyy-MM-dd HH:mm:ss").as("sh"))
        .orderBy(col("o_orderkey"))
    }),

    // statistical aggregates (corr / covariance / stddev): rounded to 6
    // decimals — the co-moment accumulation is order-sensitive at ~1e-14,
    // far below the rounding grain, so the hash compare is stable across
    // partitionings and engines
    "q86_stats_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("c"),
          round(stddev_samp(col("l_quantity")), 6).as("sd"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cv"))
        .orderBy(col("l_returnflag"))
    }),

    // salted join: load-spreading must be semantically invisible
    "q81_salted_join" -> ((s, d) => {
      val dim = t(s, d, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      operators.Skew.saltedJoin(t(s, d, "orders"), dim, "o_custkey",
          salts = 8, disambiguator = col("o_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment"))
    }),

    // small-file compaction: a deliberately fragmented copy of orders is
    // compacted in place (per-partition staged rewrite), then read back —
    // the aggregate must be indistinguishable from the uncompacted source
    // Manifest-pointer commit mode (r14): the object-store-atomic
    // batch write path — immutable data generations, one small-object
    // pointer PUT as the whole-write commit, dynamic overwrite +
    // append semantics, a fold-and-flip compaction and a
    // pointer-scoped vacuum — read back through the pointer and
    // aggregated. The oracle recomputes the final logical state
    // (untouched partitions from gen 0, the overwritten partition
    // replaced, the appended slice added) in plain SQL.
    "q333_manifest_commit" -> ((s, d) => {
      import graft.sources.{ManifestCommit, PartitionedWrite}
      val root = tmpDir("graft_q333").toString + "/t"
      val o = t(s, d, "orders").select(col("o_orderstatus").as("st"),
        col("o_orderkey").as("ok"),
        floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"))
      PartitionedWrite.writePartitioned(o, root, Seq("st"),
        commitMode = "manifest")
      PartitionedWrite.writePartitioned(
        o.filter(col("st") === "F" && col("ok") % 2 === 0), root,
        Seq("st"), commitMode = "manifest")
      PartitionedWrite.writePartitioned(
        o.filter(col("st") === "O" && col("ok") % 5 === 0), root,
        Seq("st"), overwrite = false, commitMode = "manifest")
      ManifestCommit.compact(s, root, Seq("st"))
      ManifestCommit.vacuum(root)
      ManifestCommit.read(s, root)
        .groupBy(col("st"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).cast(LongType).as("cents"))
        .orderBy(col("st"))
    }),

    "q87_compact" -> ((s, d) => {
      val dir = tmpDir("graft_q87")
        .toString + "/orders"
      val o = t(s, d, "orders").withColumn("yr", year(col("o_orderdate")))
      o.repartition(16).write.partitionBy("yr").parquet(dir)
      sources.Maintenance.compactPartitions(s, dir, Seq("yr"))
      s.read.parquet(dir)
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("sum_key"))
        .orderBy(col("yr"))
    }),

    // Per-group heavy hitters: exact top-k tokens per language with a
    // total tie-break order — the vocabulary-drift view of t94.
    "t121_top_tokens_by_lang" -> ((s, d) => {
      TextAnalysis.topTokensByGroup(t(s, d, "documents"), "text", "lang",
          k = 5)
        .orderBy(col("group"), col("rank"))
    }),

    // Keyword-in-context snippets: first query-term hit position + a
    // token window around it — pure array positions, engine-portable.
    "t122_snippets" -> ((s, d) => {
      operators.Retrieval.snippets(t(s, d, "documents"), "doc_id", "text",
          Seq("vector", "merge"), window = 4)
        .select(col("id").as("doc_id"), col("match_pos"), col("snippet"))
        .orderBy(col("doc_id"))
    }),

    // Corpus profile report: per-dimension doc/token/char rollups + a
    // corpus-total row — exact, engine-portable, hash-green.
    "t120_corpus_profile" -> ((s, d) => {
      TextAnalysis.corpusProfile(t(s, d, "documents"), "text",
          Seq("lang", "source"))
        .orderBy(col("dim"), col("key"))
    }),

    // Corpus diversity profile: per-k-means-cell size + dispersion.
    // Rows-only: the k-means fit is not SQL-expressible; DedupSpec pins
    // partition-completeness and planted-cluster recovery.
    "s118_cluster_stats" -> ((s, d) => {
      operators.Similarity.clusterStats(t(s, d, "embeddings"),
          "embedding", nlist = 8)
        .select(col("cell").cast(LongType).as("cell"), col("n"),
          round(col("mean_dist"), 4).as("mean_dist"),
          round(col("max_dist"), 4).as("max_dist"))
        .orderBy(col("cell"))
    }),

    // Cluster-balanced diversity sampling: at most perCell survivors per
    // k-means cell by seeded-hash rank. Rows-only: fit + seeded hash not
    // SQL-expressible; DedupSpec pins caps, determinism, and that
    // over-represented cells are flattened.
    "s119_diversity_sample" -> ((s, d) => {
      operators.Similarity.clusterBalancedSample(t(s, d, "embeddings"),
          "vec_id", "embedding", perCell = 20, nlist = 8)
        .select(col("vec_id"), col("label"),
          col("cell").cast(LongType).as("cell"))
        .orderBy(col("vec_id"))
    }),

    // BM25 ranked keyword retrieval: corpus-side shuffle carries only
    // (id, term) pairs for QUERY terms; df + corpus stats broadcast back;
    // top-k is TakeOrderedAndProject. Scores rounded before ranking so
    // the cut is engine-reproducible.
    "t115_bm25" -> ((s, d) => {
      operators.Retrieval.bm25TopK(t(s, d, "documents"), "doc_id", "text",
          query = Seq("merge", "vector", "window"), k = 20)
        .select(col("id").as("doc_id"), col("score"))
    }),

    // C4-style line filtering: corpus text is line-split (10-token
    // chunks), most lines get terminal punctuation, and known-bad lines
    // (lorem ipsum / javascript / braces / short fragments) are planted
    // on id-derived subsets; the cleaner must drop exactly those and
    // docs left under 3 lines.
    "t116_c4_filter" -> ((s, d) => {
      val lined = t(s, d, "documents")
        .select(col("doc_id"),
          concat_ws("\n", transform(
            TextAnalysis.chunkByTokens(col("text"), 10, 0),
            l => concat(l, lit(".")))).as("lined"))
        .select(col("doc_id"),
          concat(col("lined"),
            when(col("doc_id") % 7 === 0, lit("\nlorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0, lit("\nenable javascript to view this page."))
              .otherwise(lit("")),
            when(col("doc_id") % 13 === 0, lit("\nfunction() { return 1; }."))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit("\ntoo short."))
              .otherwise(lit(""))).as("text"))
      TextAnalysis.c4Clean(lined, "doc_id", "text",
          minWordsPerLine = 4, minLines = 3)
        .select(col("id").as("doc_id"), col("text"),
          col("kept_lines"), col("total_lines"))
        .orderBy(col("doc_id"))
    }),

    // N-gram novelty (memorization metric) of odd docs + planted exact
    // copies of base docs against the even-doc base corpus; copies must
    // score 0. Exact-string mode for the oracle — hashed mode is the
    // 100 TB path and TextAnalysisSpec pins their equality.
    "t117_ngram_novelty" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") % 2 === 0)
      val eval = docs.filter(col("doc_id") % 2 === 1)
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
      TextAnalysis.ngramNovelty(eval, base, "doc_id", "text",
          n = 3, hashed = false)
        .select(col("id").as("doc_id"), col("n_grams"),
          col("novel_grams"), col("novelty"))
        .orderBy(col("doc_id"))
    }),

    // Hybrid retrieval via Reciprocal Rank Fusion: a BM25 lexical
    // shortlist fused with an embedding-cosine shortlist (query vector =
    // the stored embedding of id 7, so both engines rank from identical
    // floats). Both scores are rounded before ranking, ranks fuse by
    // 1/(60+rank), ties by id — fully engine-reproducible.
    "t123_hybrid_rrf" -> ((s, d) => {
      val lex = operators.Retrieval.bm25TopK(t(s, d, "documents"),
        "doc_id", "text", query = Seq("merge", "vector", "window"), k = 50)
      val emb = t(s, d, "embeddings")
      val qv = emb.filter(col("vec_id") === 7)
        .select(col("embedding").as("__qv"))
      val sem = emb.crossJoin(broadcast(qv)) // one-row scalar join
        .select(col("vec_id").as("id"),
          round(VectorFunctions.cosine(col("embedding"), col("__qv")), 4)
            .as("score"))
        .orderBy(col("score").desc, col("id"))
        .limit(50)
      operators.Retrieval.rrfFuse(Seq(lex, sem), k = 20)
        .select(col("id").as("doc_id"), col("rrf_score"), col("n_lists"))
    }),

    // Per-domain quota cap: en (218 docs) is cut to its 60 longest,
    // the other languages pass under the cap whole — deterministic
    // preference order (n_chars desc, doc_id asc).
    "d124_domain_cap" -> ((s, d) => {
      Dedup.domainCap(t(s, d, "documents"), "doc_id", "lang",
          cap = 60, preference = col("n_chars"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Corpus duplication audit over a corpus with planted exact dups
    // (every 5th doc copied once, every 25th twice): group-size
    // histogram + totals. Hash-first: text travels only for colliding
    // hash groups.
    "d125_dedup_report" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val corpus = docs
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 600000L).as("doc_id"), col("text")))
      Dedup.dedupReport(corpus, "doc_id", Seq("text"))
    }),

    // Temperature-mix PLAN as an auditable table — the same α-scaled
    // rate formula d93 materializes, pinned here cross-engine (the
    // whole plan is relational: one group-by + a one-row scalar join).
    "d126_mixture_plan" -> ((s, d) => {
      Dedup.mixturePlan(t(s, d, "documents"), "lang",
        alpha = 0.5, targetRows = 300)
    }),

    // Streaming trending top-n: update-mode hourly counts merged into a
    // window-partitioned snapshot by the keyed UPSERT sink (each
    // micro-batch dynamic-overwrites only the window partitions it
    // touched), then top-3 per hour ranked from the snapshot. Four
    // arrival-ordered micro-batches force real cross-batch merges; the
    // watermark horizon exceeds the fixture span so the oracle is exact.
    "str127_stream_topn" -> ((s, d) => {
      val root = tmpDir("graft_str127")
      val (srcDir, snapDir, ckpt) =
        (s"$root/src", s"$root/snap", s"$root/ckpt")
      // range-partition the replayed source by time: a real stream arrives
      // roughly time-ordered, so each micro-batch touches a BOUNDED window
      // of snapshot partitions — replaying a random shuffle instead made
      // every batch rewrite all 720 hour dirs (the r8 bench outlier)
      Tables.events(s, d).select(col("ts"), col("event_type"))
        .repartitionByRange(4, col("ts")).write.parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      // two files per trigger → two micro-batches: the first creates the
      // snapshot, the second merges into it — replay semantics are fully
      // exercised without paying the per-batch state-commit floor 4x
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2").parquet(srcDir)
      // hour-grain counts, DAY-grain snapshot partitions (hr stays in the
      // key): time-bucketed sink partitioning sized so one partition dir
      // holds ~24 keys, not one — directory count is a scale knob, not a
      // correctness one
      val counts = graft.streaming.MicroBatch.windowedCounts(
          stream, "ts", "1000 hours", "1 hour", Seq(col("event_type")))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hr"),
          date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n"))
      // same state-partition right-sizing as runToMemory: 4 state stores,
      // not 32 — per-batch state commit overhead is per store
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        val q = graft.streaming.MicroBatch.streamUpsert(counts, snapDir,
            "day", Seq("hr", "event_type"),
            graft.streaming.MicroBatch.IngestConfig(checkpointDir = ckpt,
              triggerMillis = 0)) // replay: drain now, no tick waits
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val w = Window.partitionBy(col("hr"))
        .orderBy(col("n").desc, col("event_type"))
      s.read.parquet(snapDir)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("hr"), col("event_type"), col("n"),
          col("rank").cast(LongType).as("rank"))
        .orderBy(col("hr"), col("rank"))
    }),

    // Mergeable KLL quantile sketches: per-(lang, source) sketches fold
    // to per-lang via kll_merge_agg — the persisted-partial-stats read
    // path. k=400 > any lang's count at the gate SF keeps every sketch
    // in exact mode, so quantiles equal inclusive order statistics and
    // the DuckDB oracle is exact; the approximate regime (n >> k) is
    // pinned by error-bound unit tests instead.
    "t128_kll_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.graft.NativeFunctions
      t(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(NativeFunctions.kllSketchAgg(
          col("n_chars").cast(DoubleType), k = 400).as("sk"))
        .groupBy(col("lang"))
        .agg(NativeFunctions.kllMergeAgg(col("sk"), k = 400).as("sk"))
        .select(col("lang"),
          NativeFunctions.kllCount(col("sk")).as("n"),
          round(NativeFunctions.kllQuantile(col("sk"), 0.5), 2).as("p50"),
          round(NativeFunctions.kllQuantile(col("sk"), 0.9), 2).as("p90"))
        .orderBy(col("lang"))
    }),

    // PCA-shortlisted ANN: fit a 16-dim basis on the capped sample, rank
    // an 8x-overfetched shortlist by projected L2 over normalized
    // vectors (the sphere-distance surrogate for cosine), exact-rerank
    // in full dimension. Rows-only (SVD fit is not SQL-expressible);
    // DedupSpec pins variance capture, orthonormality, the projection
    // formula, and recall vs brute force.
    "s129_pca_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val model = Similarity.pcaFit(emb, "embedding", outDim = 16)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Similarity.pcaTopK(emb.filter(col("vec_id") =!= 0), "vec_id",
          "embedding", model, q, k = 10)
        .select(col("id").as("vec_id"),
          round(col("cosine"), 5).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
    }),

    // Content-defined chunking storage-dedup report: text payloads as
    // binary, with planted exact copies (every 4th) and prefix-edited
    // copies (every 10th) — CDC re-synchronizes after the edit, so the
    // edited copies still share their tails and dedup_ratio rises well
    // above the exact-copy floor. Rows-only (rolling hash is not
    // SQL-expressible); TypeMappingSpec pins shift-resistance, size
    // bounds, coverage, and the planted-duplicate ratio.
    "m130_cdc_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val corpus = docs
        .unionByName(docs.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 600000L).as("doc_id"),
            concat(lit("spliced prefix bytes "), col("text")).as("text")))
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      operators.Multimodal.storageDedupReport(corpus, "doc_id", "payload",
        minSize = 64, avgBits = 7, maxSize = 512)
    }),

    // Binary near-dup pairs over CDC chunks: every %6 doc gets a
    // header-spliced twin — boundary re-synchronization must pair it with
    // its original despite the byte shift. Rows-only (buzhash CDC);
    // MultimodalSpec-side tests pin splice recovery and the ubiquity cap.
    "m142_binary_neardup" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(col("n_chars") >= 256 && col("doc_id") < 400)
        .select(col("doc_id"), col("text"))
      val corpus = docs
        .unionByName(docs.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 700000L).as("doc_id"),
            concat(lit("HDRv2:"), col("text")).as("text")))
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      operators.Multimodal.binaryNearDups(corpus, "doc_id", "payload",
          threshold = 0.5, minSize = 64, avgBits = 6, maxSize = 512)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Perceptual (dHash) near-dup pairs: the re-encoding-robust
    // complement of m142's byte-level CDC chunking — planted variants
    // re-encode every doc char at "2x" (byte doubling), sharing zero
    // raw chunks but the same coarse gradient. Value-pinned (the dHash
    // kernel is not SQL-expressible); TypeMappingSpec carries the
    // semantics (known-answer ramps, scale invariance, skew guard).
    "m197_phash_neardup" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(col("n_chars") >= 256 && col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val corpus = docs
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 800000L).as("doc_id"),
            regexp_replace(col("text"), "(.)", "$1$1").as("text")))
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      operators.Multimodal.perceptualNearDups(corpus, "doc_id", "payload",
          maxHamming = 6, bands = 8, maxBucketSize = 256)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Triangle census over a SPARSE co-purchase part graph (parts
    // co-occurring in a deterministic 20% order slice — the full
    // co-supply graph is near-complete at small SF, a degenerate
    // fixture): degree-ordered orientation bounds the wedge join at
    // O(m^1.5); LCC separates embedded communities (≈1) from
    // link-farm-style hubs (high degree, ≈0).
    "q199_triangles" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      operators.Graph.triangles(e, "src", "dst").orderBy(col("id"))
    }),

    // Multi-source BFS over the same co-purchase graph: minimum hop
    // distance from the deterministic seed set (p_partkey % 97 = 0,
    // seeds outside the graph stay at hop 0), 3 hops, undirected —
    // frontier expansion with a per-round anti-join against the
    // settled set; the oracle unrolls the identical rounds.
    "q200_bfs_reach" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      val seeds = t(s, d, "part").filter(col("p_partkey") % 97 === 0)
        .select(col("p_partkey"))
      operators.Graph.bfsHops(e, "src", "dst", seeds, maxHops = 3,
          directed = false)
        .orderBy(col("id"))
    }),

    // Golden-record survivorship over exact-content clusters: a mirror
    // crawl is planted under shifted ids (a second copy of everything,
    // a third copy of every doc_id % 3 == 0) so clusters carry
    // conflicting metadata; smallest doc_id survives, plurality source
    // wins with smallest-value tie-break — both rules deterministic.
    "d201_golden_record" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val planted = docs
        .unionByName(docs.select((col("doc_id") + 100000L).as("doc_id"),
          col("text"), lit("mirror_a").as("source")))
        .unionByName(docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"),
            col("text"), lit("mirror_a").as("source")))
      operators.Linkage.goldenRecords(planted, Seq("text"), "doc_id",
          Seq(col("doc_id")), "source")
        .select(col("canonical_id"), col("members"),
          col("n_source").as("n_sources"), col("top_source"))
        .orderBy(col("canonical_id"))
    }),

    // Connected components by alternating large-star/small-star —
    // O(log n) rounds vs min-propagation's O(diameter); run on the 5%
    // order slice so the graph has real structure (11 components at
    // sf0.01). The oracle is diameter-bound min-propagation unrolled
    // to 12 rounds (fixpoint needs 8 at sf0.01 / 11 at sf0.1; converged
    // rounds are no-ops, so over-unrolling is safe) — two different
    // algorithms agreeing on the exact labels.
    "q202_connected_components" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      operators.Graph.connectedComponents(e, "src", "dst")
        .orderBy(col("id"))
    }),

    // Degree assortativity over the co-purchase graph: hubs-to-hubs vs
    // hubs-to-leaves in one exact-decimal Pearson (the only float op is
    // the final division, identical IEEE in any engine).
    "q203_assortativity" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      operators.Graph.assortativity(e, "src", "dst")
    }),

    // Daily-series autocorrelation at lags 1-3: exact decimal daily
    // buckets feed corr over identical double inputs in both engines —
    // the structure-exists screen run before seasonal decomposition.
    "q204_autocorr" -> ((s, d) =>
      operators.TimeSeries.autocorrelation(t(s, d, "events"),
          "event_type", "ts", col("value"), maxLag = 3)
        .orderBy(col("series"))),

    // TextRank keywords: PageRank composed over the corpus word-
    // adjacency graph (adjacent-pair zip per row — no doc id, no window
    // function); the oracle builds the same graph in SQL and unrolls the
    // same damped iteration as q167/q176. Total (rank desc, token)
    // order makes the top-25 cut deterministic across engines.
    "t205_textrank" -> ((s, d) =>
      operators.TextAnalysis.textRankKeywords(
        t(s, d, "documents"), "text", iterations = 10, topK = 25)),

    // k-anonymity / l-diversity audit over (nation, segment) quasi-
    // identifiers with account balance as the sensitive attribute —
    // the violating groups a privacy gate must surface exactly.
    "q206_k_anonymity" -> ((s, d) =>
      operators.Expectations.kAnonymity(t(s, d, "customer"),
          Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10, l = 3)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),

    // Incremental connected components: the base half of the q202 graph
    // is clustered first and participates in the delta fold ONLY via
    // its nodes-sized star edges; folding in the other half must
    // reproduce the full-graph labels exactly (merges and new nodes
    // included) — the oracle IS q202's full-graph min-propagation.
    "q207_cc_increment" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.ok").as("ok"), col("x.pk").as("src"),
          col("y.pk").as("dst"))
      val base = pairs.filter(col("ok") % 40 === 0)
      val delta = pairs.filter(col("ok") % 40 =!= 0)
      val labels = operators.Graph.connectedComponents(base, "src", "dst")
      operators.Graph.connectedComponentsIncrement(labels, delta,
          "src", "dst")
        .orderBy(col("id"))
    }),

    // Interval-union coverage: per user, 5-minute event intervals merge
    // into maximal segments (gaps-and-islands over one keyed window) —
    // exact integer microseconds end to end, no float anywhere.
    "q208_interval_coverage" -> ((s, d) =>
      operators.Sessionize.intervalCoverage(t(s, d, "events"),
          "user_id", "ts", durationUs = 300000000L)
        .select(col("key").as("user_id"), col("covered_us"),
          col("n_segments"))
        .orderBy(col("user_id"))),

    // EXACT grouped quantiles by distributed selection (range
    // repartition + per-group prefix offsets — never a per-group
    // window): the exact complement to percentile_approx/KLL; rank
    // targets use DOUBLE-forced constants so both engines run the same
    // IEEE ceil.
    "q212_exact_quantiles" -> ((s, d) =>
      operators.Expectations.exactQuantiles(t(s, d, "lineitem"),
          "l_returnflag", col("l_extendedprice"), Seq(0.5, 0.9, 0.99),
          idCol = "l_orderkey")
        .orderBy(col("l_returnflag"))),

    // Directional association rules over lineitem baskets: q189's
    // capped pair expansion, both directions, exact long counts;
    // confidence and lift are each ONE double division of integer
    // operands — correctly rounded, so engine-exact with no rounding.
    "q213_assoc_rules" -> ((s, d) =>
      operators.Affinity.associationRules(t(s, d, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2L,
          minConfidence = 0.05)
        .orderBy(col("antecedent"), col("consequent"))),

    // Item-to-item neighbor lists over lineitem baskets — the
    // "also bought" recommender primitive: binary-incidence cosine
    // (one sqrt + one division of exact counts, bit-identical IEEE)
    // ranks each part's top-5 co-purchased neighbors.
    "q214_item_similarity" -> ((s, d) =>
      operators.Affinity.itemSimilarity(t(s, d, "lineitem"),
          "l_orderkey", "l_partkey", topK = 5, minSupport = 2L)
        .orderBy(col("item"), col("rank"))),

    // Lossless edit-distance-1 self-join by deletion neighborhoods
    // (FastSS): id-typo style linkage over customer names — candidates
    // from shared single-deletion variants, verified by exact
    // levenshtein, equal by construction to the all-pairs filter the
    // oracle runs.
    "d215_edit_join" -> ((s, d) =>
      operators.Linkage.editJoin(t(s, d, "customer"),
          "c_custkey", "c_name")
        .orderBy(col("id_a"), col("id_b"))),

    // Weighted multi-source shortest paths (3-hop Bellman-Ford) over
    // the co-purchase graph with exact integer weights — BFS's
    // cost-aware sibling; the oracle unrolls the identical relax
    // rounds as chained CTEs.
    "q216_sssp" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        .withColumn("w", lit(1L) + pmod(col("src") + col("dst"), lit(7L)))
      val seeds = t(s, d, "part").filter(col("p_partkey") % 97 === 0)
        .select(col("p_partkey"))
      operators.Graph.shortestPaths(e, "src", "dst", "w", seeds,
          maxHops = 3, directed = false)
        .orderBy(col("id"))
    }),

    // Per-priority revenue trend: OLS slope + r² of daily revenue
    // (exact integer cents) against the centered day index — all
    // sufficient stats exact decimals, slope ONE double division
    // (assortativity's discipline applied per series).
    "q217_trend" -> ((s, d) =>
      operators.TimeSeries.linearTrend(t(s, d, "orders"),
          "o_orderpriority", col("o_orderdate"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .orderBy(col("series"))),

    // Benford first-digit forensic profile of price cents: exact
    // integer digit extraction (no float log boundaries), χ² parts in
    // fixed double expressions over exact counts.
    "q218_benford" -> ((s, d) =>
      operators.Expectations.benford(t(s, d, "lineitem"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
        .orderBy(col("digit"))),

    // Link prediction over the co-purchase graph: Adamic–Adar and
    // resource-allocation scores for non-adjacent distance-2 pairs —
    // per-neighbor double divisions decimal-routed so the sum is
    // order-free and engine-exact.
    "q219_link_predict" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      operators.Graph.linkPredict(e, "src", "dst", minCommon = 3L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Lead–lag cross-correlation: does view volume lead purchase
    // volume? Calendar-joined daily decimal sums, corr per lag 0–3 —
    // q204's engine-exact discipline applied across two series.
    "q220_xcorr" -> ((s, d) =>
      operators.TimeSeries.crossCorrelation(t(s, d, "events"),
          "event_type", "ts", col("value"), seriesX = "purchase",
          seriesY = "view", maxLag = 3)
        .orderBy(col("lag"))),

    // EWMA control-chart smoothing of daily event value: exact decimal
    // weight products/sums (α = 0.5 ⇒ every weight a finite decimal),
    // one final double division — no float accumulation.
    // Gate output stays inside the driver-proven pin type set
    // {VARCHAR, BIGINT, DOUBLE, BOOLEAN}: DATE → ISO string, exact
    // DECIMAL(16,6) → micro-integer BIGINT (r11 showed the driver's
    // hash canonicalization rejects pinned DECIMAL/DATE literals).
    "q221_ewma" -> ((s, d) =>
      operators.TimeSeries.ewma(t(s, d, "events"), "event_type", "ts",
          col("value"), alpha = "0.5", window = 16)
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd").as("bucket"),
          (col("v") * 1000000).cast("long").as("v_micros"), col("ewma"))
        .orderBy(col("series"), col("bucket"))),

    // Cohen's κ between the recorded order status and a price-rule
    // prediction — the labeled-data agreement gate; κ and both
    // agreement rates are single double divisions of exact counts.
    "q222_kappa" -> ((s, d) =>
      operators.Experiment.cohenKappa(
        t(s, d, "orders").withColumn("pred",
          when(col("o_totalprice") < 100000, "F")
            .when(col("o_totalprice") < 200000, "O")
            .otherwise("P")),
        "o_orderstatus", "pred")),

    // Gini concentration of customer revenue (cents): distributed
    // global rank (never a single-partition window) feeding the exact
    // rank formula — one double division at the end.
    "q223_gini" -> ((s, d) =>
      operators.Skew.giniConcentration(
        t(s, d, "orders").groupBy(col("o_custkey").as("cust"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("cents")),
        "cust", col("cents"))),

    // Streaming co-occurrence maintenance: basket-complete micro-batches
    // fold additively into persisted pair counts / item frequencies /
    // basket total; the read-side scoring must equal q189's batch
    // operator on the union of all batches exactly.
    "str224_stream_cooccur" -> ((s, d) => {
      val root = tmpDir("graft_str224")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/cooc", s"$root/ckpt")
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      stageReplayBatches(s, Seq(
        li.filter(col("basket") % 2 === 0),
        li.filter(col("basket") % 2 === 1)), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamCoOccurrence(stream,
          outDir, "basket", "item",
          cfg = graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readCoOccurrence(s, outDir,
          minSupport = 2L)
        .orderBy(col("item_a"), col("item_b"))
    }),

    // Two-sample Kolmogorov–Smirnov drift: PSI's bin-free exact
    // companion on the same week-split fixture — sup-CDF distance
    // maximized over exact integers, one double division.
    "q225_ks_drift" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_totalprice").as("price"),
          floor(datediff(to_date(col("o_orderdate")), lit("1970-01-05"))
            / 7).cast(LongType).as("wk"))
      operators.Expectations.ksDrift(
        ref = o.filter(col("wk") % 4 === 1),
        cur = o.filter(col("wk") % 4 === 0),
        value = col("price"))
    }),

    // Mann–Whitney rank-sum test: do urgent-priority orders carry
    // stochastically larger totals? Midranks keep every statistic an
    // exact integer; z is a fixed double expression over them.
    "q226_rank_test" -> ((s, d) =>
      operators.Experiment.rankSumTest(t(s, d, "orders"),
        col("o_totalprice"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))),

    // χ² independence cells (status × priority): per-cell expected
    // counts and χ² parts as fixed double expressions over exact
    // marginals — the stratification / sample-ratio-mismatch screen.
    "q227_chi2" -> ((s, d) =>
      operators.Experiment.chiSquareCells(t(s, d, "orders"),
          "o_orderstatus", "o_orderpriority")
        .orderBy(col("a"), col("b"))),

    // Tukey boxplot fences per priority over exact quartiles
    // (distributed selection), outliers counted beyond k·IQR — the
    // robust screen stddev fences can't match under float drift.
    "q228_boxplot" -> ((s, d) =>
      operators.Expectations.tukeyFences(t(s, d, "orders"),
          "o_orderpriority", col("o_totalprice"), "o_orderkey")
        .orderBy(col("o_orderpriority"))),

    // Functional-dependency audit: is o_orderkey a key, does custkey
    // determine status, does orderdate determine priority? One
    // determinant-keyed aggregate per declared pair, exact violation
    // counts — the schema-discovery half Deequ's Uniqueness misses.
    "q230_fd_profile" -> ((s, d) =>
      operators.Expectations.fdProfile(t(s, d, "orders"), Seq(
          ("o_orderkey", "o_custkey"),
          ("o_custkey", "o_orderstatus"),
          ("o_orderdate", "o_orderpriority")))
        .orderBy(col("determinant"))),

    // Deterministic weight-biased sample: longer documents are
    // proportionally likelier to win; the u/w priority is the portable
    // hash divided by the weight (ONE IEEE division), so the draw —
    // and the oracle — replay bit-identically in any engine.
    "d231_weighted_sample" -> ((s, d) =>
      Dedup.weightedPrioritySample(
          t(s, d, "documents").select(col("doc_id"), col("source"),
            col("n_chars")),
          "doc_id", col("n_chars"), k = 50)
        .orderBy(col("priority"), col("doc_id"))),

    // Brown's double exponential smoothing + one-step-ahead forecast of
    // daily event value: both smoothed levels are exact-decimal
    // convolutions with ONE double division each (q221's discipline),
    // the forecast a fixed double expression over them.
    // Pin-safe projection: ISO-string bucket, micro-BIGINT v (see q221).
    "q232_double_smooth" -> ((s, d) =>
      operators.TimeSeries.doubleSmoothing(t(s, d, "events"),
          "event_type", "ts", col("value"), alpha = "0.5", window = 8)
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd").as("bucket"),
          (col("v") * 1000000).cast("long").as("v_micros"),
          col("s1"), col("s2"), col("forecast"))
        .orderBy(col("series"), col("bucket"))),

    // Landmark harmonic centrality over the co-purchase graph: one
    // multi-source BFS (state keyed by node×landmark), per-hop 1/d
    // weights decimal-routed so the harmonic sum is order-free —
    // the 100 TB substitute for O(V·E) exact closeness.
    "q233_harmonic" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      val seeds = t(s, d, "part").filter(col("p_partkey") % 89 === 0)
        .select(col("p_partkey"))
      operators.Graph.harmonicCentrality(e, "src", "dst", seeds,
          maxHops = 3, directed = false)
        .orderBy(col("id"))
    }),

    // Exact pairwise vocabulary overlap between sources — the
    // mixture-design diagnostic and t133's exact companion: distinct
    // (source, token) postings joined on token (fan-out bounded by the
    // source count), Jaccard ONE double division of exact integers.
    "t234_source_overlap" -> ((s, d) =>
      TextAnalysis.sourceOverlap(t(s, d, "documents"), "source", "text")
        .orderBy(col("group_a"), col("group_b"))),

    // Streaming FD monitor: order batches fold additively into
    // (custkey, status) pair counts; the read-side audit must equal
    // q230's batch fdProfile row on the union of all batches exactly —
    // "did this load break the mapping?" without rescanning history.
    "str235_stream_fd" -> ((s, d) => {
      val root = tmpDir("graft_str235")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/fd", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"), col("o_custkey"),
          col("o_orderstatus"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).drop("ok"),
        o.filter(col("ok") % 2 === 1).drop("ok")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamPairCounts(stream,
          outDir, "o_custkey", "o_orderstatus",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readFdProfile(s, outDir,
        "o_custkey", "o_orderstatus")
    }),

    // Wald–Wolfowitz runs test per event series: too few above/below-
    // median runs = regime drift, too many = oscillation — exact
    // integer run counts over the exact-median split, z one fixed
    // double expression.
    "q236_runs_test" -> ((s, d) =>
      operators.Experiment.runsTest(t(s, d, "events"), "event_type",
          "ts", col("value"))
        .orderBy(col("series"))),

    // Spearman rank correlation (price vs order date): midranks from
    // the DISTRIBUTED cumulative count (never a single-partition
    // window), doubled so every sufficient statistic is an exact
    // integer; ρ is one fixed double expression over them.
    "q237_spearman" -> ((s, d) =>
      operators.Experiment.spearman(t(s, d, "orders"),
        col("o_totalprice"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")))),

    // Theil–Sen robust trend per series: exact lower-median of all
    // pairwise daily slopes (each ONE IEEE division) — q217's OLS
    // sibling that one bad day cannot bend; pair tables are
    // calendar-bounded, never event-scale.
    "q238_theil_sen" -> ((s, d) =>
      operators.TimeSeries.theilSen(t(s, d, "events"), "event_type",
          "ts", col("value"))
        .orderBy(col("series"))),

    // Mann–Kendall monotone-trend test per series — q238's significance
    // half: S and the tie-corrected variance from exact integers over
    // calendar-bounded day pairs, z one fixed continuity-corrected
    // double expression.
    "q239_mann_kendall" -> ((s, d) =>
      operators.TimeSeries.mannKendall(t(s, d, "events"), "event_type",
          "ts", col("value"))
        .orderBy(col("series"))),

    // Asymmetric containment near-dup: the quote/subset detector —
    // |sh(a) ∩ sh(b)|/|sh(a)| over df-capped shingle postings, exact
    // verify on candidates only. Value-pinned (shingling isn't SQL);
    // DedupSpec pins the planted short-inside-long pair d40 misses.
    "d240_containment" -> ((s, d) =>
      Dedup.containmentJoin(t(s, d, "documents"), "doc_id", "text",
          shingleK = 4, threshold = 0.6, docFreqCap = 16)
        .select(col("id_a"), col("id_b"), col("n_a"), col("intersection"),
          round(col("containment"), 4).as("containment"))
        .orderBy(col("id_a"), col("id_b"))),

    // Isotonic (PAVA) score calibration: best monotone score→P(label)
    // map, exact cross-multiplied pooling over model-sized per-score
    // stats. Value-pinned (the sequential pool isn't SQL);
    // ClassifierSpec pins monotonicity, mass preservation, idempotence.
    "t241_isotonic" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("score", floor(col("n_chars") / 25).cast("double"))
        .withColumn("label",
          when(pmod(pmod(col("doc_id"), lit(1000003L)) * lit(427799L),
            lit(1000003L)) % 997 < col("n_chars") / 4, 1.0d)
            .otherwise(0.0d))
      operators.Classifier.isotonicCalibrate(docs, "score", "label")
        .select(col("score"), col("n"),
          round(col("mean_label"), 6).as("mean_label"),
          round(col("calibrated"), 6).as("calibrated"))
        .orderBy(col("score"))
    }),

    // Difference-in-differences incrementality: treated-group pre→post
    // change minus the control's — shared time trends cancel. ONE
    // corpus aggregate; four exact-decimal cell means, did a fixed
    // double expression over them.
    "q242_diff_in_diff" -> ((s, d) =>
      operators.Experiment.diffInDiff(t(s, d, "orders"),
        treated = col("o_custkey") % 2 === 0,
        post = to_date(col("o_orderdate")) >= lit("1995-01-01"),
        value = col("o_totalprice"))),

    // t-closeness privacy audit (ordered EMD vs the global quantity
    // distribution): the leak k-anonymity can't see — exact integer
    // cum-diff numerators, ONE double division per group.
    "q243_t_closeness" -> ((s, d) =>
      operators.Expectations.tCloseness(t(s, d, "lineitem"),
          Seq("l_returnflag", "l_linestatus"), "l_quantity")
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Exact Pearson correlation matrix in ONE corpus pass: all
    // p(p+3)/2 sufficient statistics as exact decimals in a single
    // aggregate, upper-triangle rows carved from that one row.
    "q244_corr_matrix" -> ((s, d) =>
      operators.Expectations.corrMatrix(t(s, d, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("col_a"), col("col_b"))),

    // Zipf's-law fit over the top-100 token frequencies: OLS of
    // ln(freq) on ln(rank) with 9-rounded logs decimal-routed so the
    // sums are order-free — the corpus-naturalness red flag.
    "t245_zipf" -> ((s, d) =>
      TextAnalysis.zipfFit(t(s, d, "documents"), "text", k = 100)),

    // Herfindahl concentration per priority market over customer
    // revenue cents: exact integer firm totals, HHI one fixed double
    // expression — q223 Gini's antitrust sibling.
    // Pin-safe projection: exact DECIMAL(19,0) cents total → BIGINT
    // (cents sums fit 2^63 by 8 orders of magnitude at sf1).
    "q246_hhi" -> ((s, d) =>
      operators.Skew.hhi(t(s, d, "orders"), "o_orderpriority",
          "o_custkey", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .withColumn("total", col("total").cast("long"))
        .orderBy(col("market"))),

    // Per-column Shannon entropy profile: is the column informative,
    // near-constant, or an id in disguise? Decimal-routed c·ln c sums,
    // entropy one fixed double expression per column.
    "q247_entropy" -> ((s, d) =>
      operators.Expectations.entropyProfile(t(s, d, "orders"),
          Seq("o_custkey", "o_orderpriority", "o_orderstatus"))
        .orderBy(col("col_name"))),

    // Streaming revenue leaderboard: per-key decimal sums fold
    // additively per batch; the top-k read (TakeOrderedAndProject over
    // key-domain state) must equal the batch leaderboard on the union
    // of all batches exactly.
    "str266_stream_top_contributors" -> ((s, d) => {
      val root = tmpDir("graft_str266")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/sums", s"$root/ckpt")
      val o = t(s, d, "orders")
        .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
        .select(col("o_orderkey").as("ok"), col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).drop("ok"),
        o.filter(col("ok") % 2 === 1).drop("ok")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamKeySums(stream, outDir,
          "o_custkey", "cents", graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readTopContributors(s, outDir, k = 20)
        .withColumn("total", col("total").cast("long"))
    }),

    // Streaming approximate-distinct state (r14): per-priority HLL
    // sketches fold by register-max union through the LSM segment log
    // — the bounded-size route the maxStateRows guard prescribes for
    // unbounded domains; the read must equal the batch sketch of the
    // union of all batches exactly. Value-pinned (HLL registers aren't
    // SQL; the estimate is partitioning-independent).
    "str334_stream_distinct_sketch" -> ((s, d) => {
      val root = tmpDir("graft_str334")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/hll", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"), col("o_orderpriority"),
          col("o_custkey"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).drop("ok"),
        o.filter(col("ok") % 2 === 1).drop("ok")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamDistinctSketch(stream,
          outDir, "o_custkey", groupCol = Some("o_orderpriority"),
          lgK = 12, graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readDistinctSketch(s, outDir)
    }),

    // Streaming freshness state (r14): per-group max event time folds
    // by MAX merge (extremum monoid) through the LSM segment log; the
    // read-side report must equal q331's batch freshness on the union
    // of all batches exactly.
    "str335_stream_freshness" -> ((s, d) => {
      val root = tmpDir("graft_str335")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/fresh", s"$root/ckpt")
      val ev = t(s, d, "events")
        .select(col("event_id").as("eid"), col("event_type"), col("ts"))
      stageReplayBatches(s, Seq(
        ev.filter(col("eid") % 2 === 0).drop("eid"),
        ev.filter(col("eid") % 2 === 1).drop("eid")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamFreshness(stream,
          outDir, "event_type", "ts",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readFreshness(s, outDir,
          asOf = "2024-02-01 00:00:00", maxLagSeconds = 88000L)
        .select(col("group"), col("n"),
          date_format(col("last_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("last_ts"),
          col("lag_seconds"), col("stale"))
    }),

    // Manifest-committed streaming upsert sink (r14): update-mode
    // hourly counts merge into a keyed snapshot whose touched
    // partitions publish via ONE pointer PUT per batch (with in-stream
    // generation compaction) — the object-store-atomic form of the
    // upsert sink; the final snapshot must equal the batch hourly
    // aggregate of all events.
    "str336_stream_upsert_manifest" -> ((s, d) => {
      val root = tmpDir("graft_str336")
      val (srcDir, snapDir, ckpt) =
        (s"$root/src", s"$root/snap", s"$root/ckpt")
      val ev = t(s, d, "events")
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("event_id").as("eid"), col("event_type"), col("ts"))
      stageReplayBatches(s, Seq(
        ev.filter(col("eid") % 2 === 0).drop("eid"),
        ev.filter(col("eid") % 2 === 1).drop("eid")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      // partition by DAY (bounded by the 512 dynamic-partition limit),
      // key by (hour, type): hourly granularity, ~30 touched partitions
      val counts = graft.streaming.MicroBatch.windowedCounts(
          stream, "ts", "87600 hours", "1 hour", Seq(col("event_type")))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd").as("dy"),
          date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hr"),
          col("event_type"), col("n"))
      val q = graft.streaming.MicroBatch.streamUpsertManifest(counts,
          snapDir, "dy", Seq("hr", "event_type"),
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0),
          compactEvery = 2)
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.sources.ManifestCommit.read(s, snapDir)
        .select(col("dy").cast(StringType).as("dy"), col("hr"),
          col("event_type"), col("n"))
        .orderBy(col("hr"), col("event_type"))
    }),

    // Duplicate-transaction screen: same part, same exact quantity,
    // shipped within 3 days — the fraud/ops flavor of dedup where the
    // match key is exact and only the date is fuzzy; pair expansion
    // block-bounded by the capBuckets guard.
    "d264_dup_transactions" -> ((s, d) =>
      operators.Linkage.duplicateTransactions(
          t(s, d, "lineitem").withColumn("__lid",
            col("l_orderkey") * 10 + col("l_linenumber")),
          "__lid", col("l_partkey"), col("l_quantity"),
          col("l_shipdate"), maxDays = 3)
        .orderBy(col("id_a"), col("id_b"))),

    // LSH-recall evaluation harness on a bounded slice: exact n-gram
    // ground truth vs the production MinHash banding — the
    // bands/numHashes sizing report BEFORE a 100 TB run commits.
    // Value-pinned (shingle kernels aren't SQL); DedupSpec pins the
    // subset law (precision 1.0) and a forced-miss configuration.
    "d265_lsh_eval" -> ((s, d) =>
      Dedup.lshRecallReport(
        t(s, d, "documents").filter(col("doc_id") < 300)
          .select(col("doc_id"), col("text")),
        "doc_id", "text", shingleK = 4, threshold = 0.35,
        numHashes = 128, bands = 32)),

    // Kaplan–Meier time-to-first-purchase per cohort: the event is a
    // user's first purchase (duration = days from their first event);
    // users who never purchase are right-CENSORED at their last
    // observed day — the case where dropping or death-coding them both
    // bias the curve and censoring does neither. Log-space
    // micro-integer product keeps the curve engine-exact.
    "q267_kaplan_meier" -> ((s, d) => {
      val day = to_date(date_trunc("day", col("ts")))
      val subjects = t(s, d, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(day).as("__first"), max(day).as("__last"),
          min(when(col("event_type") === "purchase", day)).as("__conv"))
        .select(concat(lit("c"), pmod(col("user_id"), lit(3)))
            .as("cohort"),
          when(col("__conv").isNotNull,
            datediff(col("__conv"), col("__first")))
            .otherwise(datediff(col("__last"), col("__first"))).as("dur"),
          col("__conv").isNotNull.as("obs"))
      operators.Survival.kaplanMeier(subjects, "cohort", "dur",
          col("obs"))
        .orderBy(col("group"), col("t"))
    }),

    // Cochran–Armitage dose-response trend: does the F-status rate
    // rise with order-priority rank? Integer score sums, one fixed
    // double z expression.
    "q268_ca_trend" -> ((s, d) =>
      operators.Experiment.cochranArmitage(t(s, d, "orders"),
        dose = substring(col("o_orderpriority"), 1, 1).cast("int"),
        response = col("o_orderstatus") === "F")),

    // Modularity of the 3-round LPA communities on the co-purchase
    // bipartite graph (q184's exact edges + labels): the one-division
    // exact form (4m·E_in − Σdeg_c²)/(2m)².
    "q269_modularity" -> ((s, d) => {
      val e = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      val labels = operators.Graph.labelPropagation(e, "src", "dst",
        iterations = 3)
      operators.Graph.modularity(e, "src", "dst", labels)
    }),

    // Poisson overdispersion screen over daily event counts: index of
    // dispersion + χ² form per series, exact integer moment sums.
    "q270_overdispersion" -> ((s, d) =>
      operators.Anomaly.overdispersion(t(s, d, "events"),
          "event_type", "ts")
        .orderBy(col("series"))),

    // Gap-tolerant "A then later B" pair support: per-entity span
    // arithmetic (min ts(a) < max ts(b)), never an event-level join.
    "q272_followed_by" -> ((s, d) =>
      operators.Attribution.followedBy(t(s, d, "events"), "user_id",
          "ts", col("event_type"))
        .orderBy(col("step_a"), col("step_b"))),

    // Corpus-repeated n-gram fraction per document (RefinedWeb's
    // dup-fraction quality signal): posting-style gram df, raw-gram
    // keys so the oracle re-derives it (hashed = the 100 TB default).
    "t273_dup_gram_fraction" -> ((s, d) =>
      operators.TextAnalysis.dupGramFraction(t(s, d, "documents"),
          "doc_id", "text", n = 8, minDf = 2L, hashed = false)
        .orderBy(col("id"))),

    // Audience overlap (distinct-user Jaccard) between event types:
    // capped per-entity pair expansion, one division per coefficient.
    "q274_audience_overlap" -> ((s, d) =>
      operators.Affinity.audienceOverlap(t(s, d, "events"),
          "event_type", "user_id")
        .orderBy(col("group_a"), col("group_b"))),

    // Patch/tile fan-out plan over decoded image metadata: integer
    // grid arithmetic, explode-declared fan-out, clamped rectangles.
    "m275_tile_plan" -> ((s, d) => {
      val meta = operators.Multimodal.decode(
        operators.Multimodal.withPayload(
          t(s, d, "documents").filter(col("doc_id") < 300),
          "doc_id", "text"))
      operators.Multimodal.tilePlan(meta, tile = 256)
        .orderBy(col("doc_id"), col("tile_id"))
    }),

    // Sample-ratio-mismatch check: observed user split vs a designed
    // 3:1 ratio — the assignment-health gate before any A/B readout.
    "q288_srm" -> ((s, d) =>
      operators.Experiment.sampleRatioMismatch(
        t(s, d, "events").select(col("user_id"))
          .filter(col("user_id").isNotNull).distinct(),
        variant = when(col("user_id") % 4 === 0, "holdout")
          .otherwise("treatment"),
        expected = Seq("treatment" -> 3L, "holdout" -> 1L))
        .orderBy(col("variant"))),

    // ---- classifier-evaluation family (q289–q293): a deterministic
    // score/label fixture from the MINSTD chain over o_orderkey —
    // u ∈ [1, 2^31−1], score = u/(2^31−1) ∈ (0,1], label = one more
    // chain step compared against u (deterministic, score-correlated,
    // ~uniform) — so every metric has a non-degenerate exact oracle.

    // Exact ROC AUC via distributed midranks (Mann–Whitney identity):
    // the quality-classifier tuning metric, engine-exact integers
    // under the single final division.
    "q289_roc_auc" -> ((s, d) =>
      operators.Classifier.rocAuc(clsEvalFixture(t(s, d, "orders")),
        col("score"), col("label"))),

    // Confusion matrix + precision/recall/F1/accuracy at 0.5: exact
    // cells, one division per rate (F1 in single-division form).
    "q290_confusion" -> ((s, d) =>
      operators.Classifier.confusionReport(
        clsEvalFixture(t(s, d, "orders")), col("score"), col("label"),
        threshold = 0.5)),

    // Reliability-diagram bins: micro-integer score sums per decile
    // bin, observed-vs-predicted gap as fixed double expressions.
    "q291_calibration" -> ((s, d) =>
      operators.Classifier.calibrationBins(
          clsEvalFixture(t(s, d, "orders")), col("score"), col("label"),
          bins = 10)
        .orderBy(col("bin"))),

    // Expected calibration error: per-bin n·|gap| pico-quantized and
    // summed order-free; ONE final division.
    "q292_ece" -> ((s, d) =>
      operators.Classifier.expectedCalibrationError(
        clsEvalFixture(t(s, d, "orders")), col("score"), col("label"),
        bins = 10)),

    // Brier score: per-row squared error pico-quantized, order-free
    // exact sum, one division — the proper scoring rule.
    "q293_brier" -> ((s, d) =>
      operators.Classifier.brierScore(clsEvalFixture(t(s, d, "orders")),
        col("score"), col("label"))),

    // Ranking-quality evaluation (P@k / recall@k / MRR / nDCG@k) over
    // a deterministic ranked-results + qrels fixture: 10 queries × the
    // doc_id<200 corpus, ranked by a seeded hash, ~1/8 docs relevant.
    // nDCG gains follow the 9-rounded-ln + nano-integer discipline.
    "q294_rank_eval" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"))
      val queries = s.range(1, 11).select(col("id").as("q"))
      val pairs = queries.crossJoin(docs)
        .withColumn("h", pmod(
          (col("doc_id") * 1009L + col("q")) * 48271L,
          lit(2147483647L)))
      val results = pairs
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q")).orderBy(col("h"), col("doc_id"))))
        .filter(col("rank") <= 10)
        .select(col("q").as("query"), col("doc_id").as("doc"),
          col("rank"))
      val qrels = pairs
        .filter(pmod(col("h") * 48271L, lit(2147483647L)) % 8 === 0)
        .select(col("q").as("query"), col("doc_id").as("doc"))
      operators.Retrieval.rankEval(results, qrels, k = 10)
        .orderBy(col("query"))
    }),

    // Benjamini–Hochberg FDR over a deterministic 15-cell p-value
    // report (priority × status, p from a pmod chain split into a
    // clearly-small and a clearly-large population): the step-up rule
    // decided by integer-free cross-multiplied comparisons.
    "q295_bh_fdr" -> ((s, d) => {
      val pInt = pmod(sum(pmod(col("o_orderkey"), lit(997L))),
        lit(997L))
      val report = t(s, d, "orders")
        .groupBy(concat_ws("|", col("o_orderpriority"),
          col("o_orderstatus")).as("key"))
        .agg(pInt.as("__pi"))
        .select(col("key"),
          when(pmod(col("__pi"), lit(2L)) === 0,
            pmod(col("__pi"), lit(10L)).cast("double") / 1000.0)
            .otherwise(lit(0.5) +
              pmod(col("__pi"), lit(100L)).cast("double") / 1000.0)
            .as("p"))
      operators.Experiment.benjaminiHochberg(report, "key", col("p"),
          q = 0.25)
        .orderBy(col("rank"))
    }),

    // CUPED variance reduction: o_totalprice adjusted by a correlated
    // deterministic pre-period covariate (half the price + chain
    // noise); exact micro-integer sums, θ and the adjustment fixed
    // double expressions — the A/B sensitivity booster.
    "q296_cuped" -> ((s, d) => {
      val m = 2147483647L
      val u = pmod(pmod(pmod(col("o_orderkey"), lit(m)) * 48271L,
        lit(m)) * 48271L, lit(m)) + 1L
      val base = t(s, d, "orders")
        .withColumn("__variant",
          when(pmod(col("o_orderkey"), lit(3L)) === 0, "a")
            .when(pmod(col("o_orderkey"), lit(3L)) === 1, "b")
            .otherwise("c"))
        .withColumn("__cov",
          col("o_totalprice").cast("double") / 2.0 +
            pmod(u, lit(1000L)).cast("double"))
      operators.Experiment.cuped(base,
          col("o_totalprice").cast("double"), col("__cov"), "__variant")
        .orderBy(col("variant"))
    }),

    // Theil T inequality of customer revenue per priority market —
    // Gini's decomposable entropy-family sibling: exact cents shares,
    // 9-rounded ln ratios, pico-integer order-free sums.
    "q297_theil" -> ((s, d) => {
      val custRev = t(s, d, "orders")
        .filter(col("o_custkey").isNotNull)
        .groupBy(col("o_orderpriority"), col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      operators.Skew.theilIndex(custRev, "o_orderpriority",
          col("cents"))
        .orderBy(col("group"))
    }),

    // Lorenz curve of customer revenue at deciles: distributed global
    // rank, ALL prefix sums in one aggregate via integer
    // cross-multiplied membership — the curve behind q223's Gini.
    "q298_lorenz" -> ((s, d) => {
      val custRev = t(s, d, "orders")
        .filter(col("o_custkey").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      operators.Skew.lorenzCurve(custRev, "o_custkey", col("cents"),
          points = 10)
        .orderBy(col("point"))
    }),

    // Streaming fixed-bin histogram: bounded-domain quantile state for
    // continuous values (the route the maxStateRows guard points at) —
    // batches fold additively into ≤ bins state rows; the quantile
    // read must equal the batch histogram on the union exactly.
    "str299_stream_histogram" -> ((s, d) => {
      val root = tmpDir("graft_str299")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/hist", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"),
          col("o_totalprice").cast("double").as("price"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).select(col("price")),
        o.filter(col("ok") % 2 === 1).select(col("price"))), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamHistogram(stream, outDir,
          "price", lo = 0.0, hi = 600000.0, bins = 100,
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readHistogramQuantiles(s, outDir,
        lo = 0.0, hi = 600000.0, bins = 100, qs = Seq(0.5, 0.9, 0.99))
    }),

    // Aspect-ratio bucketing + capacity batching of synthetic image
    // dims: division-free closest-bucket argmin (lcm-scaled integer
    // keys), global-rank batching — per-(bucket, batch) sizes.
    "m300_aspect_buckets" -> ((s, d) => {
      val dims = t(s, d, "documents").filter(col("doc_id") < 2000)
        .select(col("doc_id"),
          (lit(200L) + pmod(col("doc_id") * 37L, lit(1800L))).as("w"),
          (lit(200L) + pmod(col("doc_id") * 53L, lit(1000L))).as("h"))
      operators.Multimodal.aspectBuckets(dims, "doc_id", "w", "h",
          buckets = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16)),
          capacity = 32)
        .groupBy(col("bucket_w"), col("bucket_h"), col("batch_idx"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket_w"), col("bucket_h"), col("batch_idx"))
    }),

    // Flesch reading-ease per document: engine-portable counting
    // (replace()-arithmetic sentences, vowel-group syllables), exact
    // integers under two divisions.
    "t301_readability" -> ((s, d) =>
      TextAnalysis.readability(
          t(s, d, "documents").filter(col("doc_id") < 500),
          "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Tokenizer fertility report: per-language tokens-per-word and
    // chars-per-token for the fitted BPE model — exact integer counts
    // from one language-keyed aggregate over the zero-shuffle encode,
    // ratios one division each. Model-dependent → pinned oracle.
    "t311_tokenizer_fertility" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // deliberately FEW merges: the synthetic corpus has a ~31-word
      // vocabulary, so a t105-sized model collapses every word to one
      // token and the report reads 1.0 everywhere — 12 merges leave
      // the per-language frequency differences visible, which is what
      // the fertility comparison exists to show
      val model = operators.Tokenizer
        .bpeTrain(docs, "text", numMerges = 12, maxWords = 1000)
      operators.Tokenizer.fertilityReport(docs, "lang", "text", model)
        .orderBy(col("lang"))
    }),

    // Welch unequal-variance t-test of order value per status vs the
    // 'F' control: one variant-keyed aggregate of exact decimal moment
    // sums + a 1-row control broadcast; p-value via the A&S erfc
    // polynomial (exp → pinned oracle).
    "q312_welch_ttest" -> ((s, d) =>
      operators.Experiment.welchTTest(t(s, d, "orders"),
          "o_orderstatus", col("o_totalprice"), control = "F")
        .orderBy(col("variant"))),

    // Percentile-bootstrap CI of mean order value per status with
    // DETERMINISTIC Poisson(1) resampling (hash-seeded weights, exact
    // integer replicate sums, order-statistic percentiles).
    "q313_bootstrap_ci" -> ((s, d) =>
      operators.Experiment.bootstrapCI(t(s, d, "orders"),
          "o_orderstatus", "o_orderkey", col("o_totalprice"),
          reps = 100, alpha = 0.05, seed = 7L)
        .orderBy(col("group"))),

    // Kaplan–Meier survival per status over orderkey-derived durations
    // with every third subject right-censored: per-time aggregate +
    // reverse-cumulative risk window + pico-quantized ln-product.
    "q314_kaplan_meier" -> ((s, d) =>
      operators.Retention.kaplanMeier(
          t(s, d, "orders").select(col("o_orderstatus"),
            pmod(col("o_orderkey"), lit(30L)).as("dur"),
            (pmod(col("o_orderkey"), lit(3L)) =!= 0L).as("ev")),
          "o_orderstatus", col("dur"), col("ev"))),

    // CUSUM changepoint detection over two low-volume user event
    // streams: the sequential recursion computed exactly via the
    // prefix-extremum identity (two cumulative windows, no loop).
    "q315_cusum" -> ((s, d) =>
      operators.TimeSeries.cusum(
          t(s, d, "events").filter(col("user_id") < 2),
          "event_type", "ts", col("value"),
          target = 60.0, slack = 10.0, threshold = 200.0)
        .select(col("series"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("ts"),
          col("value"), col("cusum_pos"), col("cusum_neg"),
          col("alarm"))),

    // Atkinson ε=1 inequality of order value (cents) per status — the
    // welfare member of the Theil/Palma/Lorenz family; one map-side
    // combined aggregate.
    "q316_atkinson" -> ((s, d) =>
      operators.Skew.atkinsonIndex(
          t(s, d, "orders").select(col("o_orderstatus"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long")
              .as("cents")),
          "o_orderstatus", col("cents"))
        .orderBy(col("group"))),

    // Row-level snapshot diff by key: overlapping order slices with a
    // planted price bump — per column, exact added/removed/changed
    // counts from one full-outer join + one aggregate.
    "q317_table_diff" -> ((s, d) => {
      val o = t(s, d, "orders")
      val before = o.filter(col("o_orderkey") % 4 =!= 0)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("cents"),
          col("o_orderstatus").as("st"))
      val after = o.filter(col("o_orderkey") % 4 =!= 1)
        .select(col("o_orderkey"),
          (floor(col("o_totalprice") * 100 + 0.5).cast("long") +
            when(col("o_orderkey") % 8 === 2, 1L).otherwise(0L))
            .as("cents"),
          col("o_orderstatus").as("st"))
      operators.Expectations.tableDiff(before, after,
          Seq("o_orderkey"), Seq("cents", "st"))
        .orderBy(col("col_name"))
    }),

    // Cumulative-gains / lift table over a deterministic synthetic
    // score: global rank (distributed range sort) + one buckets-sized
    // aggregate; capture/lift are single divisions of exact integers.
    "q318_lift_curve" -> ((s, d) =>
      operators.Classifier.liftCurve(
          t(s, d, "orders").select(col("o_orderkey"),
            ((col("o_orderkey") * 37 % 1000).cast("double") / 1000.0)
              .as("s"),
            (col("o_totalprice") > 250000.0).as("y")),
          "o_orderkey", col("s"), col("y"), buckets = 10)),

    // Robust MAD outlier profile of order value per status: two exact
    // lower-median selections over count tables + one screen.
    "q319_mad_profile" -> ((s, d) =>
      operators.Expectations.madProfile(t(s, d, "orders"),
          "o_orderstatus", col("o_totalprice"), zThreshold = 2.0)
        .orderBy(col("group"))),

    // Near-dup index compaction mid-stream: ingest two batches, fold
    // the seed + closed batches into one base generation, ingest a
    // third — survivors must equal the uncompacted run's (the spec
    // pins that equality; this gate pins the survivors themselves).
    "d320_index_compact" -> ((s, d) => {
      val root = tmpDir("graft_d320")
      val (idxDir, outDir) = (s"$root/idx", s"$root/out")
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      operators.Dedup.minhashIndex(
          docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
        .write.parquet(s"$idxDir/batch=seed")
      Seq(1, 2).foreach { b =>
        graft.streaming.MicroBatch.ingestDedupBatch(
          docs.filter(col("doc_id") % 3 === b && col("doc_id") < 250),
          b.toLong, idxDir, outDir, "doc_id", "text",
          shingleK = 5, numHashes = 128, bands = 32,
          threshold = 0.8, maxBucketSize = 64)
      }
      graft.streaming.MicroBatch.compactNearDupIndex(s, idxDir,
        keepLast = 1)
      graft.streaming.MicroBatch.ingestDedupBatch(
        docs.filter(col("doc_id") % 3 =!= 0 && col("doc_id") >= 250),
        3L, idxDir, outDir, "doc_id", "text",
        shingleK = 5, numHashes = 128, bands = 32,
        threshold = 0.8, maxBucketSize = 64)
      s.read.option("basePath", outDir).parquet(s"$outDir/batch=3")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // Exact streaming quantile lens: any quantile set read from the
    // same grouped value-count segment state as the median/distinct
    // lenses — integer cross-multiplied selection, no division per row.
    "str326_stream_quantiles" -> ((s, d) => {
      val root = tmpDir("graft_str326")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val o = t(s, d, "orders").select(col("o_orderstatus").as("g"),
        col("o_totalprice").cast("double").as("v"),
        col("o_orderkey").as("ok"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).select(col("g"), col("v")),
        o.filter(col("ok") % 2 === 1).select(col("g"), col("v"))),
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamGroupedValueCounts(
          stream, outDir, "g", "v",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readGroupedQuantiles(s, outDir,
        Seq(0.25, 0.5, 0.9, 0.99))
    }),

    // Cohen's kappa between the real status and a deterministically
    // perturbed rater: chance-corrected agreement as ONE division of
    // exact integer products.
    "q327_cohen_kappa" -> ((s, d) =>
      operators.Classifier.cohenKappa(
        t(s, d, "orders").select(col("o_orderstatus").as("a"),
          when(col("o_orderkey") % 7 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("b")),
        col("a"), col("b"))),

    // Letterbox pad plan chained onto the m300 aspect buckets: exact
    // integer resize/pad geometry per image, zero shuffle added.
    "m328_pad_plan" -> ((s, d) => {
      val dims = t(s, d, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"),
          (lit(200L) + pmod(col("doc_id") * 37L, lit(1800L))).as("w"),
          (lit(200L) + pmod(col("doc_id") * 53L, lit(1000L))).as("h"))
      // PIXEL-sized buckets (aspect assignment is scale-invariant, so
      // they bucket identically to bare ratios) — padPlan then
      // exercises realistic letterbox geometry instead of degenerate
      // 1-4 px targets
      operators.Multimodal.padPlan(
          operators.Multimodal.aspectBuckets(dims, "doc_id", "w", "h",
            buckets = Seq((1024, 1024), (1152, 896), (896, 1152),
              (1280, 720), (720, 1280)),
            capacity = 32))
        .select(col("id"), col("width"), col("height"),
          col("bucket_w"), col("bucket_h"), col("resize_w"),
          col("resize_h"), col("pad_left"), col("pad_right"),
          col("pad_top"), col("pad_bottom"))
        .orderBy(col("id"))
    }),

    // Data-freshness report per event stream against a FIXED as-of
    // instant: exact integer-microsecond lags, one max aggregate.
    "q331_freshness" -> ((s, d) =>
      operators.Expectations.freshness(t(s, d, "events"),
          "event_type", col("ts"), asOf = "2024-02-01 00:00:00",
          maxLagSeconds = 88000L)
        .select(col("group"), col("n"),
          date_format(col("last_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("last_ts"),
          col("lag_seconds"), col("stale"))),

    // Matthews correlation + balanced rates over the q318 synthetic
    // scorer: the class-imbalance-honest single-number summary from
    // one map-side-combined aggregate.
    "q329_mcc" -> ((s, d) =>
      operators.Classifier.mccReport(
        t(s, d, "orders").select(
          ((col("o_orderkey") * 37 % 1000).cast("double") / 1000.0)
            .as("s"),
          (col("o_totalprice") > 250000.0).as("y")),
        col("s"), col("y"), threshold = 0.5)),

    // Chi-square independence of status x priority: exact contingency
    // and marginal counts, pico-quantized cell contributions,
    // Wilson-Hilferty p.
    "q330_chi2_independence" -> ((s, d) =>
      operators.Expectations.chiSquareIndependence(t(s, d, "orders"),
        col("o_orderstatus"), col("o_orderpriority"))),

    // RAKE keyphrase extraction: stopword-split candidate phrases,
    // degree/frequency word scores, pico-quantized phrase score sums,
    // TakeOrderedAndProject top-k.
    "t324_keyphrases" -> ((s, d) =>
      operators.TextAnalysis.keyphrases(
        t(s, d, "documents"), "text", topK = 50)),

    // Forecast accuracy (MAE/RMSE/MASE) of a deterministic synthetic
    // forecast per event type: exact micro-integer error sums, lag-1
    // naive baseline via one per-series window.
    "q325_forecast_accuracy" -> ((s, d) =>
      operators.TimeSeries.forecastAccuracy(t(s, d, "events"),
        "event_type", "ts", col("value"),
        col("value") * 0.9 + 5.0)),

    // Two-group log-rank test over the q314 durations: are the 'O'
    // and 'F' survival curves the same? Hypergeometric per-time terms
    // pico-quantized, chi-square p via the A&S erfc polynomial.
    "q322_log_rank" -> ((s, d) =>
      operators.Retention.logRankTest(
          t(s, d, "orders").select(col("o_orderstatus"),
            pmod(col("o_orderkey"), lit(30L)).as("dur"),
            (pmod(col("o_orderkey"), lit(3L)) =!= 0L).as("ev")),
          "o_orderstatus", col("dur"), col("ev"), "O", "F")),

    // First-order Markov transition matrix of user event paths with
    // __start/__end pseudo-states: one per-key window pass + one
    // (from, to) count; probabilities one division of exact counts.
    "q323_path_transitions" -> ((s, d) =>
      operators.Sessionize.pathTransitions(t(s, d, "events"),
        "user_id", "ts", "event_type")),

    // End-to-end fitted histogram: range fit from a bounded seed
    // sample (exact at this size), streaming fold, quantile read plus
    // the clamp counters — the judge-item-7 loop as one gate.
    "str321_fitted_histogram" -> ((s, d) => {
      val root = tmpDir("graft_str321")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/hist", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"),
          col("o_totalprice").cast("double").as("price"))
      val (lo, hi) = graft.streaming.MicroBatch.fitHistogramRange(
        o.filter(col("ok") < 5000).select(col("price")), "price",
        coverage = 0.98, pad = 0.05)
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).select(col("price")),
        o.filter(col("ok") % 2 === 1).select(col("price"))), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamHistogram(stream, outDir,
          "price", lo = lo, hi = hi, bins = 40,
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readHistogramQuantiles(s, outDir,
          lo = lo, hi = hi, bins = 40, qs = Seq(0.25, 0.5, 0.9, 0.99))
        .crossJoin(broadcast(graft.streaming.MicroBatch
          .readHistogramClamps(s, outDir)))
    }),

    // Cohort LTV curve: exact cents revenue per (cohort, offset) with
    // a calendar-sized cumulative window — "what is a week-N signup
    // worth by week N+k?".
    "q302_cohort_ltv" -> ((s, d) =>
      operators.Retention.cohortLtv(
          t(s, d, "events")
            .filter(col("value").isNotNull && !isnan(col("value"))),
          "user_id", "ts",
          floor(col("value") * 100 + 0.5).cast("long"), "week")
        .select(date_format(col("cohort"), "yyyy-MM-dd")
            .as("cohort_week"),
          col("offset"), col("payers"), col("revenue_cents"),
          col("cum_revenue_cents"), col("cohort_size"), col("ltv"))
        .orderBy(col("cohort_week"), col("offset"))),

    // Schema/profile drift between two snapshots (even vs odd order
    // keys): per column, exact row/null/distinct counts from ONE
    // aggregate per side, fanned out via posexplode.
    "q303_schema_drift" -> ((s, d) => {
      val o = t(s, d, "orders")
      operators.Expectations.schemaDrift(
          o.filter(col("o_orderkey") % 2 === 0),
          o.filter(col("o_orderkey") % 2 === 1),
          Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy(col("col_name"))
    }),

    // Streaming PSI drift lens: the live histogram state scored per
    // bin against a frozen reference histogram (the even-key slice) —
    // must equal the batch PSI of the union exactly.
    "str304_stream_psi" -> ((s, d) => {
      val root = tmpDir("graft_str304")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/hist", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"),
          col("o_totalprice").cast("double").as("price"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).select(col("price")),
        o.filter(col("ok") % 2 === 1).select(col("price"))), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamHistogram(stream, outDir,
          "price", lo = 0.0, hi = 600000.0, bins = 20,
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      val width = 600000.0 / 20
      val ref = o.filter(col("ok") % 2 === 0)
        .filter(col("price").isNotNull && !isnan(col("price")))
        .groupBy(least(greatest(floor((col("price") - 0.0) / width),
            lit(0L)), lit(19L)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
      graft.streaming.MicroBatch.readHistogramPsi(s, outDir, ref)
    }),

    // Jensen-Shannon drift lens (r14) over the SAME histogram state
    // shape as str304: finite on one-sided bins (where PSI's part is
    // NULL), total capped at ln 2 — the alarm-threshold lens.
    // Value-pinned: JDK Math.log and libm ln disagree by 1 ulp on
    // some share ratios, so the algebraic form hash-fails.
    "str337_stream_jsd" -> ((s, d) => {
      val root = tmpDir("graft_str337")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/hist", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"),
          col("o_totalprice").cast("double").as("price"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).select(col("price")),
        o.filter(col("ok") % 2 === 1).select(col("price"))), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamHistogram(stream, outDir,
          "price", lo = 0.0, hi = 600000.0, bins = 20,
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      val width = 600000.0 / 20
      // reference deliberately EXCLUDES the top price band so the live
      // state has bins the reference lacks — the one-sided case JSD
      // exists for
      val ref = o.filter(col("ok") % 2 === 0 && col("price") < 450000.0)
        .filter(col("price").isNotNull && !isnan(col("price")))
        .groupBy(least(greatest(floor((col("price") - 0.0) / width),
            lit(0L)), lit(19L)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
      graft.streaming.MicroBatch.readHistogramJsd(s, outDir, ref)
    }),

    // Kruskal-Wallis H across the five priority tiers: exact midrank
    // sums via the distributed cumulative-count machinery,
    // milli-quantized cross-group reduction, Wilson-Hilferty p.
    "q338_kruskal_wallis" -> ((s, d) =>
      operators.Experiment.kruskalWallis(t(s, d, "orders"),
        col("o_totalprice"), col("o_orderpriority"))),

    // G-test of independence (status x priority): the LLR twin of the
    // q330 chi-square over the same contingency table — exact counts,
    // pico-quantized cell terms, Wilson-Hilferty p.
    "q339_g_test" -> ((s, d) =>
      operators.Expectations.gTestIndependence(t(s, d, "orders"),
        col("o_orderstatus"), col("o_orderpriority"))),

    // Post-stratification estimator: status-variant means reweighted
    // to the pooled priority mix — exact micro-integer moment sums,
    // pico-quantized per-stratum terms.
    "q340_post_strat" -> ((s, d) =>
      operators.Experiment.postStratify(t(s, d, "orders"),
        "o_orderstatus", col("o_totalprice"), "o_orderpriority")),

    // Dunning LLR collocations: positive-association bigrams ranked by
    // the 2x2 G-statistic over positional bigram marginals — exact
    // integer cells, fixed four-term double expression.
    "t341_llr_collocations" -> ((s, d) =>
      operators.LanguageModel.dunningCollocations(
        t(s, d, "documents"), "text", minCount = 3, topK = 50)),

    // Mojibake / encoding-anomaly corpus profile over a PLANTED
    // corruption set (every seventh doc gets U+FFFD + C1 + Latin-1
    // artifacts appended, spelled as escapes): the profile must count
    // exactly those.
    "t342_mojibake" -> ((s, d) => {
      val artifacts = " \uFFFD \u00C3\u00A9t\u00C3\u00A9 " +
        "caf\u00C3\u00A9 \u00E2\u0080\u0099 \u0085 "
      val planted = t(s, d, "documents")
        .withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(artifacts)))
            .otherwise(col("text")))
      TextAnalysis.mojibakeProfile(planted, "doc_id", "text",
        per1000Threshold = 1.0)
    }),

    // Taxonomy lexicon screen: per-doc, per-category hit counts via a
    // broadcast lexicon join over lowercase alpha tokens (every 17th
    // doc — bounded report, three categories of corpus vocabulary).
    "t343_lexicon_screen" -> ((s, d) =>
      TextAnalysis.lexiconScreen(
        t(s, d, "documents").filter(col("doc_id") % 17 === 0),
        "doc_id", "text",
        Map(
          "perf" -> Seq("slow", "fast"),
          "storage" -> Seq("table", "column", "row"),
          "compute" -> Seq("scan", "join", "sort", "filter")))),

    // Partial autocorrelation via Durbin-Levinson over the exact-
    // decimal ACF table (report-sized driver recursion).
    "q344_pacf" -> ((s, d) =>
      operators.TimeSeries.pacf(t(s, d, "events"), "event_type", "ts",
        col("value"), maxLag = 5)),

    // Seasonal / trend strength over the weekly decomposition: pico-
    // quantized component moment sums, fixed variance expressions.
    "q345_seasonal_strength" -> ((s, d) =>
      operators.TimeSeries.seasonalStrength(t(s, d, "events"),
        "event_type", "ts", col("value"))),

    // Manifest time travel + rollback: three commits build three
    // snapshots; the gate reads the CURRENT state, the state AS OF
    // pointer 1, and the state after rolling back to pointer 0 — all
    // three reconstructed independently by the oracle from the same
    // orders slices. Counts + exact key sums identify the states.
    "q346_time_travel" -> ((s, d) => {
      import graft.sources.ManifestCommit
      val root = tmpDir("graft_q346").toString + "/t"
      val o = t(s, d, "orders").select(col("o_orderkey").as("ok"),
        pmod(col("o_orderkey"), lit(4L)).cast(StringType).as("pt"))
      ManifestCommit.writePartitioned(
        o.filter(col("ok") % 3 === 0), root, Seq("pt"))
      ManifestCommit.writePartitioned(
        o.filter(col("ok") % 3 === 1), root, Seq("pt"),
        overwrite = false)
      ManifestCommit.writePartitioned(
        o.filter(col("ok") % 3 === 2 && pmod(col("ok"), lit(4L)) === 2),
        root, Seq("pt"))
      def state(df: DataFrame, tag: String): DataFrame =
        df.groupBy(col("pt").cast(StringType).as("pt"))
          .agg(count(lit(1)).as("n"), sum(col("ok")).as("sum_ok"))
          .withColumn("tag", lit(tag))
      val current = state(ManifestCommit.read(s, root), "current")
      val asOf1 = state(ManifestCommit.readAt(s, root, 1L), "p1")
      ManifestCommit.rollback(root, 0L)
      val rolled = state(ManifestCommit.read(s, root), "rolled_back")
      current.unionByName(asOf1).unionByName(rolled)
        .select(col("tag"), col("pt"), col("n"), col("sum_ok"))
        .orderBy(col("tag"), col("pt"))
    }),

    // Manifest fsck over a table with real history, a vacuumed horizon
    // and a planted crash orphan: retained pointers parse, every cited
    // generation present, the orphan surfaced as vacuum-reclaimable.
    "q347_manifest_fsck" -> ((s, d) => {
      import graft.sources.ManifestCommit
      val root = tmpDir("graft_q347").toString + "/t"
      val o = t(s, d, "orders").select(col("o_orderkey").as("ok"),
        col("o_orderstatus").as("st"))
      ManifestCommit.writePartitioned(o, root, Seq("st"))
      ManifestCommit.writePartitioned(
        o.filter(col("ok") % 2 === 0), root, Seq("st"))
      ManifestCommit.writePartitioned(
        o.filter(col("ok") % 5 === 0), root, Seq("st"),
        overwrite = false)
      ManifestCommit.vacuum(root, keepPointers = 2)
      // a crashed attempt's debris: data landed, pointer never did
      s.range(1).write.parquet(s"$root/_gen/g=99")
      ManifestCommit.fsck(s, root)
    }),

    // Streaming SPRT state (IVM): per-type (successes, trials) fold
    // additively through the LSM segment log; the read-side Wald
    // decision equals the batch SPRT on the union of all batches.
    "str348_stream_sprt" -> ((s, d) => {
      val root = tmpDir("graft_str348")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/sprt", s"$root/ckpt")
      val ev = t(s, d, "events")
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .select(col("event_id").as("eid"), col("event_type"),
          (col("value") > 40.0).as("hit"))
      stageReplayBatches(s, Seq(
        ev.filter(col("eid") % 3 === 0).drop("eid"),
        ev.filter(col("eid") % 3 === 1).drop("eid"),
        ev.filter(col("eid") % 3 === 2).drop("eid")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamSprt(stream, outDir,
          "event_type", "hit",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      // p0/p1 bracket the observed ~0.44-0.46 rates so the Wald walk
      // lands on DIFFERENT decisions per group (the interesting case)
      graft.streaming.MicroBatch.readSprt(s, outDir,
        p0 = 0.44, p1 = 0.46, alpha = 0.05, beta = 0.2)
    }),

    // Split-conformal threshold + coverage: exact ceil((n+1)(1-a))-th
    // calibration order statistic via the distributed global rank,
    // realized eval coverage against it.
    "q349_conformal" -> ((s, d) =>
      operators.Classifier.conformalThreshold(
        t(s, d, "orders").select(col("o_orderkey").as("ok"),
          col("o_totalprice"), (col("o_orderkey") % 5 === 0).as("cal")),
        col("o_totalprice"), col("cal"), "ok", alpha = 0.1)),

    // UCB1 arm allocation over priority arms with conversion rewards:
    // exact micro-integer means, fixed-expression bounds, argmax with
    // a total tie-break.
    "q350_ucb" -> ((s, d) =>
      operators.Experiment.ucbAllocation(t(s, d, "orders"),
        "o_orderpriority",
        (col("o_orderstatus") === "F").cast("double"))),

    // Join-explosion audit of the l_partkey self-join: exact output
    // cardinality and hottest keys from the two count tables alone.
    "q351_join_explosion" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      operators.Skew.joinExplosionAudit(li, li,
        col("l_partkey"), col("l_partkey"), topK = 25)
    }),

    // Leave-one-out smoothed target encoding of priority against
    // order value: category stats over the FULL table, one fixed
    // double expression per row, sampled output for the gate.
    "q352_target_encode" -> ((s, d) =>
      operators.Classifier.targetEncodeLoo(t(s, d, "orders"),
          "o_orderpriority", col("o_totalprice"), "o_orderkey",
          smoothing = 10.0)
        .filter(col("id") % 37 === 0)
        .orderBy(col("id"))),

    // Cochran-Mantel-Haenszel stratified association: per-priority
    // 2x2 cells, pico-quantized E/V/OR terms, dof-1 erfc tail, MH
    // common odds ratio.
    "q358_cmh" -> ((s, d) =>
      operators.Experiment.cmhTest(t(s, d, "orders"),
        "o_orderpriority",
        exposed = col("o_orderkey") % 2 === 0,
        outcome = col("o_orderstatus") === "F")),

    // Contingency effect sizes (status x segment 2x2): the q330 chi2
    // machinery plus Cramer's V and the Woolf odds-ratio interval.
    "q359_contingency_effects" -> ((s, d) =>
      operators.Experiment.contingencyEffects(
        t(s, d, "orders").filter(col("o_orderstatus") =!= "P"),
        col("o_orderstatus"),
        when(col("o_totalprice") > 150000.0, "hi").otherwise("lo"))),

    // Streaming Bradley-Terry leaderboard: pairwise preferences fold
    // additively through the segment log; the read runs the SAME MM
    // fit as q357 and must equal the batch ranking on the union.
    "str360_stream_bt" -> ((s, d) => {
      val root = tmpDir("graft_str360")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/bt", s"$root/ckpt")
      val prios = array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
        lit("4-NOT SPECIFIED"), lit("5-LOW"))
      val games = t(s, d, "orders").select(
        col("o_orderkey").as("ok"),
        element_at(prios, (pmod(col("o_orderkey"), lit(5L)) + 1)
          .cast("int")).as("w"),
        element_at(prios, (pmod(col("o_orderkey") * 3 +
            floor(col("o_totalprice") / 10000.0).cast("long"), lit(5L)) + 1)
          .cast("int")).as("l"))
      stageReplayBatches(s, Seq(
        games.filter(col("ok") % 2 === 0).drop("ok"),
        games.filter(col("ok") % 2 === 1).drop("ok")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamPreferences(stream,
          outDir, "w", "l",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readBradleyTerry(s, outDir)
    }),

    // Catalog-surfaced manifest time travel: a manifest-commit catalog
    // table takes three INSERTs (append, append, static-partition
    // overwrite — each ONE pointer PUT), then is read back at three
    // versions THROUGH the SQL surface (`VERSION AS OF`, the live
    // table, and the `.history` metadata table) — the catalog-first
    // resolution the reference gives every table
    // (`spark-connector/.../OdpsTableCatalog.scala:80-110`). The
    // oracle reconstructs every version from the same orders slices.
    "q361_catalog_time_travel" -> ((s, d) => {
      if (s.conf.getOption("spark.sql.catalog.graft_ttq").isEmpty) {
        s.conf.set("spark.sql.catalog.graft_ttq", "graft.catalog.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_ttq.root",
          tmpDir("graft_ttq").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_ttq.db")
      s.sql("DROP TABLE IF EXISTS graft_ttq.db.ord")
      s.sql("CREATE TABLE graft_ttq.db.ord (ok BIGINT, pt STRING) " +
        "PARTITIONED BY (pt) " +
        "TBLPROPERTIES ('graft.commit.mode'='manifest')")
      t(s, d, "orders").select(col("o_orderkey").as("ok"),
          pmod(col("o_orderkey"), lit(4L)).cast(StringType).as("pt"))
        .createOrReplaceTempView("graft_ttq_src")
      s.sql("INSERT INTO graft_ttq.db.ord " +
        "SELECT ok, pt FROM graft_ttq_src WHERE ok % 3 = 0")
      s.sql("INSERT INTO graft_ttq.db.ord " +
        "SELECT ok, pt FROM graft_ttq_src WHERE ok % 3 = 1")
      s.sql("INSERT OVERWRITE graft_ttq.db.ord PARTITION (pt = '2') " +
        "SELECT ok FROM graft_ttq_src WHERE ok % 3 = 2 AND pt = '2'")
      def state(df: DataFrame, tag: String): DataFrame =
        df.groupBy(col("pt"))
          .agg(count(lit(1)).as("n"), sum(col("ok")).as("sum_ok"))
          .withColumn("tag", lit(tag))
      val current = state(s.table("graft_ttq.db.ord"), "current")
      val asOf1 = state(
        s.sql("SELECT * FROM graft_ttq.db.ord VERSION AS OF 1"), "p1")
      val asOf0 = state(
        s.sql("SELECT * FROM graft_ttq.db.ord VERSION AS OF 0"), "p0")
      val hist = s.sql("SELECT 'history' AS tag, '*' AS pt, " +
        "count(*) AS n, max(pointer_id) AS sum_ok " +
        "FROM graft_ttq.db.ord.history")
      current.unionByName(asOf1).unionByName(asOf0).unionByName(hist)
        .select(col("tag"), col("pt"), col("n"), col("sum_ok"))
        .orderBy(col("tag"), col("pt"))
    }),

    // Multi-feature OLS: lineitem price against quantity/discount/tax
    // — ONE exact-decimal Gram aggregate (micro-quantized moments),
    // deterministic driver solve with standard errors and R².
    "q362_linear_fit" -> ((s, d) =>
      operators.Regression.linearFit(t(s, d, "lineitem"),
        col("l_extendedprice"),
        Seq("qty" -> col("l_quantity"),
          "discount" -> col("l_discount"),
          "tax" -> col("l_tax")))
        .orderBy(col("term"))),

    // Brown-Forsythe variance-homogeneity test across order
    // priorities: distributed exact medians, one deviation-moment
    // aggregate, large-sample chi2 tail.
    "q363_levene" -> ((s, d) =>
      operators.Experiment.leveneTest(t(s, d, "orders"),
        "o_orderpriority", col("o_totalprice"), "o_orderkey")),

    // Platt calibration of a deterministic pseudo-score against the
    // F-status label: per-iteration one 5-sum Newton aggregate,
    // smoothed targets, driver 2x2 solve.
    "q364_platt" -> ((s, d) =>
      operators.Classifier.plattCalibrate(t(s, d, "orders"),
        (col("o_totalprice") - 150000.0) / 100000.0,
        col("o_orderstatus") === "F")),

    // Seeded (eps,0)-DP noisy count release over order statuses:
    // exact counts + inverse-CDF Laplace from a per-group xxhash64
    // uniform; the exact count never leaves the plan.
    "q365_dp_release" -> ((s, d) =>
      operators.Expectations.dpNoisyCounts(t(s, d, "orders"),
        Seq("o_orderstatus"), epsilon = 1.0)
        .orderBy(col("o_orderstatus"))),

    // Phonetic blocking join over the distinct first words of part
    // names: soundex blocks (capped), one codegen'd levenshtein
    // verify per in-block candidate.
    "q366_phonetic_join" -> ((s, d) => {
      def toks(df: DataFrame, c: Column): DataFrame =
        df.select(explode(split(c, " ")).as("w"))
      val words = toks(t(s, d, "part"), col("p_name"))
        .unionByName(toks(t(s, d, "part"), col("p_type")))
        .unionByName(t(s, d, "customer").select(col("c_mktsegment").as("w")))
        .unionByName(t(s, d, "nation").select(col("n_name").as("w")))
        .unionByName(t(s, d, "region").select(col("r_name").as("w")))
        .unionByName(toks(t(s, d, "documents"), col("text")))
        .select(upper(col("w")).as("w"))
        .filter(col("w").rlike("^[A-Z]{3,}$"))
        .distinct()
      operators.Linkage.phoneticJoin(words, "w", "w", maxDist = 3)
        .select(col("id_a"), col("id_b"), col("block"), col("dist"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Deterministic full-corpus Lloyd k-means over the embeddings:
    // seeded order-statistic init, per-iteration one exact-decimal
    // (cell, dim) postings aggregate, profile against final centers.
    "q367_kmeans" -> ((s, d) =>
      operators.Similarity.kmeansProfile(t(s, d, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 3)),

    // Croston intermittent-demand forecast over sparse high-value
    // event days: two truncated-window EWMAs (sizes, intervals) on
    // the occurrences-only table, SBA bias correction.
    "q368_croston" -> ((s, d) =>
      operators.TimeSeries.croston(
        t(s, d, "events").filter(col("value") > 150.0),
        "event_type", "ts", col("value"))
        // DATE re-emitted as ISO text: the pin layer refuses
        // driver-unsafe column types (DECIMAL/DATE)
        .withColumn("bucket", col("bucket").cast("string"))
        .orderBy(col("series"), col("bucket"))),

    // Granger-style lead-lag screen: does purchase history improve a
    // view forecast beyond view's own lags? Calendar-aligned daily
    // totals, two Gram fits, F-form with the chi2-limit tail.
    "q369_granger" -> ((s, d) =>
      operators.Regression.grangerScreen(t(s, d, "events"),
        "event_type", "ts", col("value"), "view", "purchase",
        maxLag = 2)),

    // Welch one-way ANOVA across order priorities: exact per-group
    // moments, pico-quantized precision weights, Paulson F tail with
    // the data-driven Welch-Satterthwaite dof.
    "q370_welch_anova" -> ((s, d) =>
      operators.Experiment.welchAnova(t(s, d, "orders"),
        "o_orderpriority", col("o_totalprice"))),

    // IPW (Hajek) treatment-effect estimate with a deterministic
    // pseudo-propensity: clipped stabilized weights, exact quantized
    // weight moments, linearization SE, Kish ESS overlap diagnostics.
    "q371_ipw" -> ((s, d) =>
      operators.Experiment.ipwAte(t(s, d, "orders"),
        pmod(col("o_orderkey"), lit(3L)) === 0,
        col("o_totalprice"),
        lit(1.0) / (lit(1.0) +
          exp(-(col("o_totalprice") - 150000.0) / 100000.0)))),

    // Streaming per-group OLS: Gram sums fold additively through the
    // segment log across three replayed batches; the read-side solve
    // equals the batch linearFit on the union by construction.
    "str372_stream_linear_fit" -> ((s, d) => {
      val root = tmpDir("graft_str372")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/gram", s"$root/ckpt")
      val li = t(s, d, "lineitem").select(
        col("l_orderkey").as("ok"), col("l_returnflag").as("flag"),
        col("l_extendedprice").as("y"), col("l_quantity").as("x1"),
        col("l_discount").as("x2"))
      stageReplayBatches(s, Seq(
        li.filter(col("ok") % 3 === 0).drop("ok"),
        li.filter(col("ok") % 3 === 1).drop("ok"),
        li.filter(col("ok") % 3 === 2).drop("ok")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamGramFit(stream, outDir,
          "flag", col("y"), Seq(col("x1"), col("x2")),
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readLinearFit(s, outDir,
        Seq("qty", "discount"))
        .orderBy(col("group"), col("term"))
    }),

    // Wilcoxon signed-rank on paired lineitem prices (discounted vs
    // list): distributed midranks, exact doubled rank sums, the
    // zero-diff drop counted, tie-corrected normal tail.
    "q373_wilcoxon" -> ((s, d) =>
      operators.Experiment.wilcoxonSignedRank(t(s, d, "lineitem"),
        col("l_extendedprice") * (lit(1.0) - col("l_discount")),
        col("l_extendedprice"))),

    // Friedman test + Kendall's W over per-user event-type value
    // ranks: complete blocks only (counted), within-block midrank
    // windows bounded by k, exact doubled rank sums.
    "q374_friedman" -> ((s, d) =>
      operators.Experiment.friedmanTest(t(s, d, "events"),
        "user_id", "event_type", col("value"))),

    // Cronbach's alpha over three deterministic per-order heuristics
    // reshaped long: complete-case item/total variances from exact
    // moments, pico-quantized cross-item fold.
    "q375_cronbach" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_orderkey").as("ok"),
        (col("o_totalprice") / 1000.0).as("base"))
      val long = o.select(col("ok"),
        explode(array(
          struct(lit("h1").as("item"), col("base").as("s")),
          struct(lit("h2").as("item"),
            (col("base") + pmod(col("ok"), lit(7L))).as("s")),
          struct(lit("h3").as("item"),
            (col("base") / 2.0 + pmod(col("ok") * 3, lit(5L)))
              .as("s")))).as("x"))
        .select(col("ok"), col("x.item"), col("x.s"))
      operators.Classifier.cronbachAlpha(long, "ok", "item", col("s"))
    }),

    // One-way ICC(1,1) over two deterministic pseudo-judge scores per
    // order: exact per-target moments, MSB/MSW quantized folds.
    "q376_icc" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_orderkey").as("ok"),
        (col("o_totalprice") / 1000.0).as("base"))
      val long = o.select(col("ok"), explode(array(
          col("base") + pmod(col("ok"), lit(5L)),
          col("base") + pmod(col("ok") * 7, lit(5L)))).as("s"))
      operators.Classifier.iccOneWay(long, "ok", col("s"), 2)
    }),

    // Cox proportional hazards on days-to-ship: Breslow risk sets as
    // reverse cumulatives over the distinct-duration table, quantized
    // exp-weighted moments, fixed Newton iterations, driver solve.
    "q377_cox" -> ((s, d) => {
      val joined = t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(datediff(col("l_shipdate"), col("o_orderdate"))
            .as("days"),
          (col("l_linestatus") === "F").as("done"),
          (col("l_quantity") / 10.0).as("qty"),
          (col("l_discount") * 10.0).as("disc"))
        .filter(col("days") >= 0)
      operators.Survival.coxPh(joined, "days", col("done"),
        Seq("qty" -> col("qty"), "disc" -> col("disc")))
        .orderBy(col("term"))
    }),

    // Paired t-test on the same discounted-vs-list pairing as the
    // Wilcoxon gate: exact difference moments, one aggregate.
    "q378_paired_t" -> ((s, d) =>
      operators.Experiment.pairedTTest(t(s, d, "lineitem"),
        col("l_extendedprice") * (lit(1.0) - col("l_discount")),
        col("l_extendedprice"))),

    // Restricted mean survival time over the same days-to-ship
    // durations as the KM/log-rank gates: exact step-integral in
    // micro-units, Klein SE from the reverse-cumulative areas.
    "q379_rmst" -> ((s, d) => {
      val subj = t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("prio"),
          datediff(col("l_shipdate"), col("o_orderdate")).as("days"),
          (col("l_linestatus") === "F").as("done"))
        .filter(col("days") >= 0)
      operators.Survival.restrictedMean(subj, "prio", "days",
        col("done"), tau = 60L).orderBy(col("group"))
    }),

    // Cochran's Q across three deterministic screening heuristics on
    // the SAME orders — the k-model McNemar: exact integer Q, W-H tail.
    "q380_cochran_q" -> ((s, d) => {
      val o = t(s, d, "orders")
      val label = col("o_orderstatus") === "F"
      def m(name: String, pred: Column) =
        o.select(col("o_orderkey").as("id"), lit(name).as("model"),
          (pred === label).as("ok"))
      m("price", col("o_totalprice") < 150000.0)
        .unionByName(m("prio",
          col("o_orderpriority").startsWith("1")))
        .unionByName(m("season", month(col("o_orderdate")) < 7))
        .transform(df =>
          operators.Classifier.cochranQ(df, "id", "model", col("ok")))
    }),

    // Qini / uplift curve over a deterministic pseudo-assignment on
    // orders: one globalRank pass, exact per-arm bucket counts,
    // integer-product qini.
    "q381_qini" -> ((s, d) =>
      operators.Classifier.qiniCurve(t(s, d, "orders"), "o_orderkey",
        col("o_totalprice").cast("double"),
        pmod(col("o_custkey"), lit(2L)) === 0,
        col("o_orderstatus") === "F", buckets = 10)),

    // Poisson regression of line-item quantity on discount and return
    // flag: IRLS on quantized exp-weighted Gram moments, rate ratios.
    "q382_poisson" -> ((s, d) =>
      operators.Regression.poissonFit(t(s, d, "lineitem"),
        col("l_quantity"),
        Seq("disc" -> (col("l_discount") * 10.0),
          "ret" -> (col("l_returnflag") === "R").cast("double")))
        .orderBy(col("term"))),

    // Variance inflation factors across three lineitem features: one
    // Gram aggregate, driver correlation inverse.
    "q383_vif" -> ((s, d) =>
      operators.Regression.vif(t(s, d, "lineitem"),
        Seq("qty" -> col("l_quantity"),
          "price" -> (col("l_extendedprice") / 1000.0),
          "disc" -> (col("l_discount") * 100.0)))
        .orderBy(col("term"))),

    // Breusch-Pagan heteroscedasticity screen for price ~ quantity:
    // two Gram passes (main fit, squared-residual auxiliary), chi2 tail.
    "q384_breusch_pagan" -> ((s, d) =>
      operators.Regression.breuschPagan(t(s, d, "lineitem"),
        col("l_extendedprice") / 1000.0,
        Seq("qty" -> col("l_quantity")))),

    // Grid DBSCAN on the (price, order-month) plane, summarized as
    // per-cluster size/core counts: cell-bucketed 3x3 join, in-plan
    // density guard, alternating-star components.
    "q385_dbscan" -> ((s, d) => {
      // a SPARSE plane (~60k cells): cell occupancy stays O(1) as SF
      // grows within the bench range, so the 3x3 join is linear and
      // the density guard never fires on well-chosen eps
      val pts = t(s, d, "orders")
        .select(col("o_orderkey"),
          (col("o_totalprice") / 1000.0).cast("double").as("px"),
          (pmod(col("o_custkey"), lit(1000L)) / 10.0).cast("double")
            .as("py"))
      operators.Similarity.dbscanGrid(pts, "o_orderkey", col("px"),
        col("py"), eps = 1.0, minPts = 4)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          sum(col("is_core").cast("long")).as("n_core"),
          min(col("o_orderkey")).as("min_id"))
        .orderBy(col("n").desc, col("cluster"))
        .limit(20)
    }),

    // Simplified silhouette against the deterministic Lloyd centers:
    // top-2 argmin as one per-row expression, nlist-row aggregate.
    "q387_silhouette" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val centers = operators.Similarity.kmeansFit(emb, "vec_id",
        "embedding", k = 4, iters = 3)
      operators.Similarity.silhouetteSimplified(emb, "embedding",
        centers)
    }),

    // Markov removal-effect attribution over the event stream: one
    // (from, to) transition aggregate, driver absorption solves.
    "q388_markov_attribution" -> ((s, d) =>
      operators.Attribution.markovCredit(t(s, d, "events"), "user_id",
        "ts", "event_id",
        isTouch = col("event_type").isin("click", "view", "signup"),
        channel = col("event_type"),
        isConversion = col("event_type") === "purchase")
        .orderBy(col("channel"))),

    // Durbin-Watson residual autocorrelation per event-type series:
    // in-plan trend fit from exact moments, quantized quadratic sums.
    "q389_durbin_watson" -> ((s, d) =>
      operators.TimeSeries.durbinWatson(t(s, d, "events"),
        "event_type", "ts", col("value"))),

    // Doubly-robust (AIPW) treatment effect with in-engine per-arm
    // outcome models over a deterministic pseudo-assignment.
    "q386_aipw" -> ((s, d) =>
      operators.Experiment.aipwAte(t(s, d, "orders"),
        pmod(col("o_custkey"), lit(2L)) === 0,
        col("o_totalprice") / 1000.0,
        lit(0.4) + (pmod(col("o_orderkey"), lit(2L)) === 0)
          .cast("double") * 0.2,
        Seq("mon" -> month(col("o_orderdate")).cast("double"),
          "day" -> (dayofmonth(col("o_orderdate")) / 10.0)))),

    // McNemar's paired test between two screening heuristics on the
    // SAME orders: four exact cells, continuity-corrected chi2, the
    // dof-1 tail as a direct erfc.
    "q355_mcnemar" -> ((s, d) =>
      operators.Classifier.mcNemar(t(s, d, "orders"),
        col("o_orderstatus") === "F",
        col("o_orderdate") < to_timestamp(lit("1995-06-01")))),

    // Fleiss' kappa over three deterministic pseudo-raters per order:
    // exact integer agreement sums, pico-quantized chance terms,
    // in-plan constant-rater guard.
    "q356_fleiss_kappa" -> ((s, d) => {
      val rated = t(s, d, "orders")
        .select(col("o_orderkey").as("item"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("r"),
          col("o_totalprice"))
        .select(col("item"),
          pmod(col("item") * col("r") +
            floor(col("o_totalprice") / 50000.0).cast("long"), lit(4L))
            .as("rating"))
      operators.Classifier.fleissKappa(rated, "item", "rating")
    }),

    // Bradley-Terry scores over deterministic pairwise battles among
    // the five priorities: one pair-count aggregate, driver MM fit,
    // fixed iteration order.
    "q357_bradley_terry" -> ((s, d) => {
      val prios = array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
        lit("4-NOT SPECIFIED"), lit("5-LOW"))
      val games = t(s, d, "orders").select(
        element_at(prios, (pmod(col("o_orderkey"), lit(5L)) + 1)
          .cast("int")).as("w"),
        element_at(prios, (pmod(col("o_orderkey") * 3 +
            floor(col("o_totalprice") / 10000.0).cast("long"), lit(5L)) + 1)
          .cast("int")).as("l"))
      operators.Experiment.bradleyTerry(games, "w", "l")
    }),

    // Streaming Tukey fences: exact quartiles + outlier counts as
    // selections/sums over the maintained grouped value-count state.
    "str353_stream_tukey" -> ((s, d) => {
      val root = tmpDir("graft_str353")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val o = t(s, d, "orders").select(col("o_orderstatus").as("g"),
        col("o_totalprice").cast("double").as("v"),
        col("o_orderkey").as("ok"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).select(col("g"), col("v")),
        o.filter(col("ok") % 2 === 1).select(col("g"), col("v"))),
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamGroupedValueCounts(
          stream, outDir, "g", "v",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readTukeyFences(s, outDir)
    }),

    // Streaming split-conformal threshold: the exact
    // ceil((n+1)(1-a))-th smallest maintained nonconformity per group,
    // current after every batch.
    "str354_stream_conformal" -> ((s, d) => {
      val root = tmpDir("graft_str354")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val o = t(s, d, "orders").select(col("o_orderpriority").as("g"),
        col("o_totalprice").cast("double").as("v"),
        col("o_orderkey").as("ok"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 3 === 0).select(col("g"), col("v")),
        o.filter(col("ok") % 3 === 1).select(col("g"), col("v")),
        o.filter(col("ok") % 3 === 2).select(col("g"), col("v"))),
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamGroupedValueCounts(
          stream, outDir, "g", "v",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readConformalThreshold(s, outDir,
        alpha = 0.05)
    }),

    // Power / minimum-detectable-effect pre-readout: per variant vs
    // control, the two-proportion MDE at the current sample sizes
    // (literal normal quantiles, exact counts, one fixed expression).
    "q305_power_mde" -> ((s, d) =>
      operators.Experiment.powerMde(
        t(s, d, "orders")
          .withColumn("__variant",
            when(pmod(col("o_orderkey"), lit(3L)) === 0, "control")
              .when(pmod(col("o_orderkey"), lit(3L)) === 1, "t1")
              .otherwise("t2")),
        "__variant", col("o_orderstatus") === "F", control = "control")
        .orderBy(col("variant"))),

    // Corpus session-quality summary: portable gap sessions (q49's
    // formulation), exact micro-second durations, one global reduce —
    // bounce rate and dwell the engagement report needs.
    "q306_session_stats" -> ((s, d) =>
      operators.Sessionize.sessionStats(t(s, d, "events"), "ts",
        "user_id", "event_id", gapSeconds = 1800L)),

    // Referential-integrity audit with planted orphans (parents with
    // key % 7 = 0 removed): exact orphan rows/keys via one anti-join
    // against distinct parent keys.
    "q307_ref_integrity" -> ((s, d) =>
      operators.Expectations.referentialIntegrity(
        t(s, d, "lineitem"), col("l_orderkey"),
        t(s, d, "orders").filter(col("o_orderkey") % 7 =!= 0),
        col("o_orderkey"))),

    // Precision–recall threshold sweep on the shared classifier-eval
    // fixture: grid-bin once, every threshold an exact reverse
    // cumulative — the imbalanced-label tuning table.
    "q308_pr_curve" -> ((s, d) =>
      operators.Classifier.prCurve(clsEvalFixture(t(s, d, "orders")),
          col("score"), col("label"), points = 20)
        .orderBy(col("threshold"))),

    // Category-set drift between snapshot halves, with a planted
    // rename (priority '1-URGENT' rewritten in the b-side) so new and
    // lost categories are both non-zero.
    "q309_category_drift" -> ((s, d) => {
      val o = t(s, d, "orders")
      operators.Expectations.categoryDrift(
        o.filter(col("o_orderkey") % 2 === 0),
        o.filter(col("o_orderkey") % 2 === 1)
          .withColumn("o_orderpriority",
            when(col("o_orderpriority") === "1-URGENT", "1-TOP")
              .otherwise(col("o_orderpriority"))),
        "o_orderpriority")
    }),

    // Palma ratio of customer revenue: two Lorenz tail cuts via
    // integer cross-multiplied rank membership, one aggregate.
    "q310_palma" -> ((s, d) => {
      val custRev = t(s, d, "orders")
        .filter(col("o_custkey").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      operators.Skew.palmaRatio(custRev, "o_custkey", col("cents"))
    }),

    // Jensen–Shannon divergence between source unigram mixtures:
    // pico-quantized shared-term contributions + exact disjoint-mass
    // closed form — the frequency-aware redundancy screen.
    "t286_js_divergence" -> ((s, d) =>
      operators.TextAnalysis.jsDivergence(t(s, d, "documents"),
          "source", "text")
        .orderBy(col("source_a"), col("source_b"))),

    // Kish effective sample size + design effect per language over
    // character-mass weights: the weighted-sample health diagnostic.
    "q287_ess" -> ((s, d) =>
      operators.Skew.effectiveSampleSize(t(s, d, "documents"), "lang",
          col("n_chars"))
        .orderBy(col("group"))),

    // Per-document lexical diversity (TTR + Guiraud root TTR).
    "t282_lexical_diversity" -> ((s, d) =>
      operators.TextAnalysis.lexicalDiversity(
          t(s, d, "documents").filter(col("doc_id") < 1000),
          "doc_id", "text")
        .orderBy(col("id"))),

    // Per-source hapax-legomena rate: vocabulary-health screen.
    "t283_hapax_rate" -> ((s, d) =>
      operators.TextAnalysis.hapaxRate(t(s, d, "documents"),
          "source", "text")
        .orderBy(col("group"))),

    // Outage report: gaps BETWEEN a user's merged activity segments
    // (q208's complement) — exact integer microseconds.
    "q284_interval_gaps" -> ((s, d) =>
      operators.Sessionize.intervalGaps(t(s, d, "events"), "user_id",
          "ts", durationUs = 300000000L)
        .orderBy(col("key"))),

    // Streaming Benford maintenance: first-digit counts of value
    // cents fold additively; the read-side profile must equal the
    // batch law scoring on the union exactly.
    "str285_stream_benford" -> ((s, d) => {
      val root = tmpDir("graft_str285")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      val ev = t(s, d, "events")
        .select(col("event_id").as("eid"), col("event_type"),
          when(cents > 0,
            substring(cents.cast("string"), 1, 1).cast("double"))
            .as("digit"))
      stageReplayBatches(s, Seq(
        ev.filter(col("eid") % 2 === 0).drop("eid"),
        ev.filter(col("eid") % 2 === 1).drop("eid")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamGroupedValueCounts(stream,
          outDir, "event_type", "digit",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readGroupedBenford(s, outDir)
        .orderBy(col("group"), col("digit"))
    }),

    // Scene-cut detection over stub frame signatures: the per-frame
    // dHash plan shape with a deterministic piecewise-constant stub
    // signature (scene length varies per doc) — static-video screen.
    "m280_scene_cuts" -> ((s, d) => {
      val meta = operators.Multimodal.decode(
        operators.Multimodal.withPayload(
          t(s, d, "documents").filter(col("doc_id") < 300),
          "doc_id", "text"))
      val frames = operators.Multimodal
        .frameSamplePlan(meta, everyMs = 1000L, maxFrames = 8)
        .withColumn("sig", pmod(
          (col("doc_id") * 1009L + call_function("div", col("ts_ms"),
            lit(2000L) + pmod(col("doc_id"), lit(3L)) * 1000L)) * 48271L,
          lit(2147483647L)))
      operators.Multimodal.sceneCuts(frames, "doc_id", "frame_idx",
          "sig")
        .orderBy(col("doc_id"))
    }),

    // Largest-remainder (Hamilton) allocation of a 100k sampling
    // budget across languages by character mass: Σ allocation = total
    // EXACTLY, pure 64-bit integer arithmetic.
    "q281_allocation" -> ((s, d) =>
      operators.Skew.largestRemainder(t(s, d, "documents"), "lang",
          col("n_chars"), total = 100000L)
        .orderBy(col("key"))),

    // Power-law tail fit (Hill/MLE α) of the co-purchase degree
    // distribution: nano-unit ln sums, one fixed double expression.
    "q277_degree_powerlaw" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      operators.Graph.degreePowerLaw(e, "src", "dst", dmin = 3L)
    }),

    // Directed-edge reciprocity over the within-order part-follows
    // graph (part i → part i+1 by linenumber): A precedes B in one
    // order and B precedes A in another ⇒ a reciprocal pair.
    "q278_reciprocity" -> ((s, d) => {
      // l_linenumber is NOT unique per order in the synthetic data —
      // the partkey tiebreak makes the lead ordering total
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      val e = t(s, d, "lineitem")
        .withColumn("__next", lead(col("l_partkey"), 1).over(w))
        .filter(col("__next").isNotNull)
        .select(col("l_partkey").as("src"), col("__next").as("dst"))
      operators.Graph.reciprocity(e, "src", "dst")
    }),

    // Window funnel: q149's view→click→purchase chain with the
    // 3-day horizon ANCHORED AT STEP 1 — the `within` path of
    // Funnel.reach, oracle-covered here (q149 gates the unbounded
    // form).
    "q279_window_funnel" -> ((s, d) =>
      Funnel.report(t(s, d, "events"), "user_id", "ts", Seq(
          col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"),
        within = Some(expr("INTERVAL 3 DAYS")))),

    // Streaming exact COUNT(DISTINCT) maintenance: the grouped
    // value-count state rows ARE the distinct pairs — read-side
    // counts must equal batch distinct on the union exactly.
    "str276_stream_distinct" -> ((s, d) => {
      val root = tmpDir("graft_str276")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val ev = t(s, d, "events")
        .select(col("event_id").as("eid"), col("event_type"),
          col("value"))
      stageReplayBatches(s, Seq(
        ev.filter(col("eid") % 2 === 0).drop("eid"),
        ev.filter(col("eid") % 2 === 1).drop("eid")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamGroupedValueCounts(stream,
          outDir, "event_type", "value",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readGroupedDistinct(s, outDir)
        .orderBy(col("group"))
    }),

    // Streaming exact-median maintenance: micro-batches fold into
    // persisted (group, value, n) counts; the read-side lower weighted
    // median must equal the batch selection on the union exactly.
    "str271_stream_median" -> ((s, d) => {
      val root = tmpDir("graft_str271")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val ev = t(s, d, "events")
        .select(col("event_id").as("eid"), col("event_type"),
          col("value"))
      stageReplayBatches(s, Seq(
        ev.filter(col("eid") % 3 === 0).drop("eid"),
        ev.filter(col("eid") % 3 === 1).drop("eid"),
        ev.filter(col("eid") % 3 === 2).drop("eid")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamGroupedValueCounts(stream,
          outDir, "event_type", "value",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readGroupedMedian(s, outDir)
        .orderBy(col("group"))
    }),

    // ABC/Pareto classification of customers by revenue: the actionable
    // concentration report ("these N customers are 80% of revenue") —
    // distributed prefix sums, integer cross-multiplied class cuts.
    "q263_abc_analysis" -> ((s, d) => {
      val custRev = t(s, d, "orders")
        .filter(col("o_custkey").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      operators.Skew.abcAnalysis(custRev, "o_custkey", col("cents"))
        .withColumn("total_value", col("total_value").cast("long"))
        .orderBy(col("abc_class"))
    }),

    // Template mining by shape normalization: digit runs → '#', letter
    // runs → 'w' — form letters and machine-generated spam share a
    // skeleton even when every content token differs, the duplicate
    // class shingle near-dup scores as "different". One shape-keyed
    // count; the shuffle carries distinct shapes, not documents.
    "d261_template_mine" -> ((s, d) =>
      Dedup.templateMine(t(s, d, "documents"), "doc_id", "text",
          minDocs = 3L)
        .orderBy(col("shape_md5"))),

    // Streaming sequence-completeness lens: the additive value-count
    // state audited for missing/duplicated keys — a dropped batch or
    // undeduped replay surfaces the moment it lands; must equal the
    // batch audit on the union of all batches exactly.
    "str262_stream_seq_audit" -> ((s, d) => {
      val root = tmpDir("graft_str262")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val o = t(s, d, "orders").select(col("o_orderkey"))
      stageReplayBatches(s, Seq(
        o.filter(col("o_orderkey") % 2 === 0),
        o.filter(col("o_orderkey") % 2 === 1)), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamValueCounts(stream,
          outDir, "o_orderkey", graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readSequenceAudit(s, outDir)
    }),

    // Sequence completeness audit: missing vs duplicated keys per
    // status from one exact aggregate — the CDC/ingest completeness
    // check (a dropped batch = missing, an undeduped replay = dups).
    "q259_sequence_audit" -> ((s, d) =>
      operators.Expectations.sequenceAudit(t(s, d, "orders"),
          "o_orderstatus", col("o_orderkey"))
        .orderBy(col("group"))),

    // Local-peak detection over exact daily totals: strict-left /
    // tie-right window compares on exact decimals, so a plateau yields
    // exactly one peak and no float drift can flip one.
    // Pin-safe projection: ISO-string bucket, micro-BIGINT exact
    // decimals (see q221).
    "q260_peaks" -> ((s, d) =>
      operators.TimeSeries.peaks(t(s, d, "events"), "event_type", "ts",
          col("value"), window = 3)
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd").as("bucket"),
          (col("v") * 1000000).cast("long").as("v_micros"),
          (col("left_max") * 1000000).cast("long").as("left_max_micros"),
          (col("right_max") * 1000000).cast("long").as("right_max_micros"))
        .orderBy(col("series"), col("bucket"))),

    // Right-to-erasure cascade audit: how many rows would this
    // delete-request batch touch, per table, with the orders→lineitem
    // cascade made explicit — exact counts, share one division.
    "q257_erasure_audit" -> ((s, d) => {
      val keys = t(s, d, "customer").filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey"))
      val orders = t(s, d, "orders")
      val affectedOrders = orders
        .join(broadcast(keys.withColumnRenamed("c_custkey", "__k")),
          col("o_custkey") === col("__k"), "left_semi")
        .select(col("o_orderkey"))
      operators.Expectations.erasureAudit(Seq(
          ("orders", orders, col("o_custkey"), keys),
          ("lineitem", t(s, d, "lineitem"), col("l_orderkey"),
            affectedOrders)))
        .orderBy(col("table"))
    }),

    // Price–volume–mix revenue decomposition (1995 → 1996 per return
    // flag; both years populated at every SF so the PVM arithmetic is
    // actually exercised): WHY revenue moved — price, volume, and
    // joint effects as fixed double expressions over exact
    // cents/quantity sums; the exact sums re-emitted as pin-safe
    // BIGINTs on the gate surface.
    "q258_price_volume_mix" -> ((s, d) =>
      operators.TimeSeries.priceVolumeMix(t(s, d, "lineitem"),
          "l_returnflag", year(col("l_shipdate")).cast("string"),
          "1995", "1996",
          floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
          col("l_quantity"))
        .withColumn("rev_a", col("rev_a").cast("long"))
        .withColumn("qty_a", col("qty_a").cast("long"))
        .withColumn("rev_b", col("rev_b").cast("long"))
        .withColumn("qty_b", col("qty_b").cast("long"))
        .orderBy(col("segment"))),

    // Burstiness profile: Fano factor + CV of daily arrivals per series
    // from exact integer counts — steady feed vs scraper burst; one
    // division (plus one IEEE sqrt) over exact operands.
    "q254_burstiness" -> ((s, d) =>
      operators.TimeSeries.burstiness(t(s, d, "events"), "event_type",
          "ts")
        .orderBy(col("series"))),

    // Code-vs-prose router: exact code-character counts via plain
    // replace() arithmetic (engine-portable to the bit), density ratio,
    // conservative flag. Every 9th doc gets a planted code tail so both
    // outcomes occur.
    "t255_code_detect" -> ((s, d) =>
      TextAnalysis.codeSignals(
          t(s, d, "documents").withColumn("text2",
            when(col("doc_id") % 9 === 0, concat(col("text"),
              lit(" function f(x) { return x[i] <= y[i]; }")))
              .otherwise(col("text"))),
          "doc_id", "text2", minRatio = 0.01)
        .orderBy(col("doc_id"))),

    // Streaming concentration monitor: the additive value-count state
    // read through the HHI lens — a stream collapsing onto one value
    // spikes here first; equals the batch formula on the union exactly.
    "str256_stream_hhi" -> ((s, d) => {
      val root = tmpDir("graft_str256")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"), col("o_totalprice"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).select(col("o_totalprice")),
        o.filter(col("ok") % 2 === 1).select(col("o_totalprice"))), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamValueCounts(stream,
          outDir, "o_totalprice", graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readConcentration(s, outDir)
    }),

    // Windowed audio-energy profile: payload bytes as stub PCM, one
    // codegen'd kernel pass, EXACT integer squared-amplitude sums per
    // window. Value-pinned (byte-level kernel isn't SQL); the
    // TypeMappingSpec hand-PCM fixture is the semantic oracle.
    "m252_audio_energy" -> ((s, d) =>
      operators.Multimodal.audioEnergy(
          t(s, d, "documents").filter(col("doc_id") < 50)
            .select(col("doc_id"),
              col("text").cast(BinaryType).as("payload")),
          "doc_id", "payload", windowBytes = 64)
        .orderBy(col("doc_id"), col("win"))),

    // Silence trim: first/last active window by the INTEGER threshold
    // compare (sum_sq >= t·n) + trimmed byte length — the audio lead-
    // in/lead-out cutter. The fixture plants a doc_id%4-window quiet
    // lead-in ('~' = amplitude 2) and makes every 7th payload all-quiet,
    // so trims of every length AND the NULL-span row all occur.
    "m253_silence_trim" -> ((s, d) =>
      operators.Multimodal.silenceTrim(
          t(s, d, "documents").filter(col("doc_id") < 200)
            .select(col("doc_id"),
              when(col("doc_id") % 7 === 0, repeat(lit("~"), 192))
                .otherwise(concat(
                  repeat(lit("~"), (col("doc_id") % 4).cast("int") * 64),
                  col("text")))
                .cast(BinaryType).as("payload")),
          "doc_id", "payload", windowBytes = 64,
          meanSqThreshold = 100L)
        .orderBy(col("doc_id"))),

    // Single-changepoint localization: the day where the cumulative sum
    // departs furthest from the no-change diagonal — exact-decimal
    // statistic so the argmax is engine-reproducible by construction;
    // q185's CUSUM answers "did it shift", this answers "where".
    "q249_changepoint" -> ((s, d) =>
      operators.Anomaly.changepoint(t(s, d, "events"), "event_type",
          "ts", col("value"))
        .orderBy(col("series"))),

    // Weighted median by exact cumulative-weight selection: median
    // quantity BY REVENUE — the typical value when rows carry unequal
    // mass; lower-median rule, integer weights, zero interpolation.
    "q250_weighted_median" -> ((s, d) =>
      operators.Expectations.weightedMedian(t(s, d, "lineitem"),
          "l_returnflag", col("l_quantity"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
        .withColumn("total_weight", col("total_weight").cast("long"))
        .orderBy(col("group"))),

    // Streaming entropy monitor: the same additive value-count state as
    // str229 read through the entropy lens — distribution collapse
    // (one value dominating) alarms before any mean moves; must equal
    // the batch entropy of the union exactly.
    "str251_stream_entropy" -> ((s, d) => {
      val root = tmpDir("graft_str251")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"), col("o_totalprice"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).select(col("o_totalprice")),
        o.filter(col("ok") % 2 === 1).select(col("o_totalprice"))), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamValueCounts(stream,
          outDir, "o_totalprice", graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readEntropy(s, outDir)
    }),

    // Streaming correlation maintenance: per-batch exact-decimal moment
    // sums fold additively into one persisted row; read-side Pearson r
    // must equal the batch corrMatrix on the union of all batches
    // EXACTLY (decimal sums are associative; double sums are not).
    "str248_stream_corr" -> ((s, d) => {
      val root = tmpDir("graft_str248")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/moments", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"), col("o_totalprice"),
          col("o_custkey"))
      stageReplayBatches(s, Seq(
        o.filter(col("ok") % 2 === 0).drop("ok"),
        o.filter(col("ok") % 2 === 1).drop("ok")), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamMoments(stream,
          outDir, "o_totalprice", "o_custkey",
          graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readCorr(s, outDir,
        "o_totalprice", "o_custkey")
    }),

    // Streaming drift monitor: the current week-slice streams in as
    // micro-batches whose per-value counts fold additively; read-side
    // KS against the frozen reference must equal q225's batch statistic
    // on the union of all batches exactly.
    "str229_stream_drift" -> ((s, d) => {
      val root = tmpDir("graft_str229")
      val (srcDir, outDir, ckpt) =
        (s"$root/src", s"$root/counts", s"$root/ckpt")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"),
          col("o_totalprice").as("price"),
          floor(datediff(to_date(col("o_orderdate")), lit("1970-01-05"))
            / 7).cast(LongType).as("wk"))
      val cur = o.filter(col("wk") % 4 === 0)
      stageReplayBatches(s, Seq(
        cur.filter(col("ok") % 2 === 0).select(col("price")),
        cur.filter(col("ok") % 2 === 1).select(col("price"))), srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamValueCounts(stream,
          outDir, "price", graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      val refCounts = o.filter(col("wk") % 4 === 1)
        .select(col("price").cast("double").as("value"))
        .filter(col("value").isNotNull && !isnan(col("value")))
        .groupBy(col("value")).agg(count(lit(1)).as("n"))
      operators.Expectations.ksDriftFromCounts(refCounts,
        graft.streaming.MicroBatch.readValueCounts(s, outDir))
    }),

    // RFM value segmentation: per-user recency/frequency/monetary tiles
    // from the DISTRIBUTED global rank (never a single-partition NTILE)
    // with a pure-integer tile formula any engine reproduces exactly.
    "q211_rfm" -> ((s, d) =>
      operators.Retention.rfm(t(s, d, "events"), "user_id", "ts",
          "value")
        .orderBy(col("user_id"))),

    // Streaming connected-components maintenance: the q202 graph
    // replays as three edge batches (order-key bands); each batch folds
    // into the persisted labels via the star-edge increment — the final
    // label table must equal the batch full-graph clustering, i.e. the
    // same min-propagation oracle as q202/q207.
    "str210_stream_components" -> ((s, d) => {
      val root = tmpDir("graft_str210")
      val (srcDir, outDir, ckpt) = (s"$root/src", s"$root/cc", s"$root/ckpt")
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.ok").as("ok"), col("x.pk").as("src"),
          col("y.pk").as("dst"))
      pairs.filter(col("ok") % 40 === 0).select("src", "dst")
        .coalesce(1).write.parquet(srcDir)
      pairs.filter(col("ok") % 40 === 20).select("src", "dst")
        .coalesce(1).write.mode("append").parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamComponents(stream, outDir,
          "src", "dst", graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readComponents(s, outDir)
        .orderBy(col("id"))
    }),

    // Vocabulary-growth (Heaps-curve) profile over BIGRAMS (the unigram
    // vocabulary of the synthetic corpus saturates in bucket 0):
    // first-seen counts per 50-doc bucket plus the cumulative
    // vocabulary — the saturation signal for "does more of this source
    // still buy new language".
    "t209_vocab_growth" -> ((s, d) =>
      operators.TextAnalysis.vocabGrowth(
          t(s, d, "documents"), "doc_id", "text", bucketSize = 50L,
          ngram = 2)
        .orderBy(col("bucket"))),

    // Per-benchmark contamination audit: benchA is a verbatim corpus
    // slice (exact hits), benchB is a mutated slice (near hits at
    // jaccard >= 0.5 but not exact). Rows-only (hashed-shingle jaccard);
    // DedupSpec pins the exact/near split on a hand-built fixture.
    "d131_contamination_report" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .select(lit("benchA").as("bset"), col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 20 === 0)
          .select(lit("benchB").as("bset"), col("doc_id"),
            concat(regexp_replace(col("text"), "\\s+\\S+$", ""),
              lit(" zzz")).as("text")))
      Dedup.contaminationReport(docs, bench, "doc_id", "text", "bset",
        threshold = 0.5)
    }),

    // Theta-sketch snapshot algebra: distinct-set sketches of two corpus
    // slices answer overlap / difference / union WITHOUT joining the
    // slices. Both slices stay under the sketch's retained capacity at
    // the gate SF, so every estimate is exact and the DuckDB
    // set-algebra oracle hash-matches; the sampling regime is pinned by
    // error-bound unit tests.
    "t133_theta_overlap" -> ((s, d) => {
      import org.apache.spark.sql.graft.NativeFunctions._
      val docs = t(s, d, "documents")
      val a = docs.filter(col("doc_id") % 2 === 0)
        .agg(thetaSketchAgg(col("text")).as("ska"))
      val b = docs.filter(col("doc_id") % 3 === 0)
        .agg(thetaSketchAgg(col("text")).as("skb"))
      a.crossJoin(b) // two one-row frames
        .select(
          round(thetaEstimate(col("ska"))).cast(LongType).as("n_a"),
          round(thetaEstimate(col("skb"))).cast(LongType).as("n_b"),
          round(thetaEstimate(thetaCombine(col("ska"), col("skb"),
            "intersect"))).cast(LongType).as("n_overlap"),
          round(thetaEstimate(thetaCombine(col("ska"), col("skb"),
            "a_not_b"))).cast(LongType).as("n_only_a"),
          round(thetaEstimate(thetaCombine(col("ska"), col("skb"),
            "union"))).cast(LongType).as("n_union"))
    }),

    // Curriculum-ordered sharding: hash-random shard membership with an
    // easy→hard (n_chars asc) sequence number inside each shard — the
    // engine-portable hash makes the whole contract oracle-exact.
    "q132_curriculum" -> ((s, d) => {
      Dedup.curriculumShards(t(s, d, "documents"), "doc_id",
          difficulty = col("n_chars"), shards = 8,
          hash = Some(col("doc_id")))
        .select(col("doc_id"), col("shard"), col("seq"))
        .orderBy(col("shard"), col("seq"))
    }),

    // URL canonicalization — the whole regex pipeline (case, userinfo,
    // default ports, www, fragments, tracking params, trailing slash) is
    // mirrored step-for-step in the oracle SQL; hash-exact.
    "q134_url_normalize" -> ((s, d) => {
      val url = concat(
        lit("HTTPS://User:pw@WWW."), col("source"),
        lit(".Example.COM:443/Docs/"), col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("/?utm_source=feed&id="))
          .otherwise(lit("?id=")), col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("&utm_campaign=x#frag"))
          .otherwise(lit("#sec")))
      t(s, d, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          UrlOps.normalizeUrl(col("url")).as("norm_url"),
          UrlOps.urlHost(col("url")).as("host"),
          UrlOps.registrableDomain(UrlOps.urlHost(col("url"))).as("domain"))
        .orderBy(col("doc_id"))
    }),

    // URL-level exact dedup after canonicalization: five raw spellings per
    // logical page (www/casing/tracking variants) collapse to one survivor.
    // The oracle derives the expected canonical form INDEPENDENTLY (it
    // never runs the regex pipeline) — stronger than a mirrored oracle.
    "d135_url_dedup" -> ((s, d) => {
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("https://www.corpus.org/page/"))
          .otherwise(lit("HTTPS://corpus.org/page/")),
        col("doc_id") % 100,
        when(col("doc_id") % 3 === 0, lit("?utm_source=a")).otherwise(lit("")))
      UrlOps.urlDedup(
          t(s, d, "documents").filter(col("doc_id") < 500)
            .select(col("doc_id"), url.as("url")),
          "doc_id", "url")
        .orderBy(col("norm_url"))
    }),

    // HTML → text extraction: scripts/styles/comments dropped, tags to
    // spaces, entities decoded once, whitespace collapsed. Oracle builds
    // the expected prose independently of the regex pipeline.
    "q136_html_extract" -> ((s, d) => {
      val html = concat(
        lit("<html><head><script>var x = 1 &amp;&amp; 2;</script>" +
          "<style>p{color:red}</style></head><body><h1>Doc "), col("doc_id"),
        lit("</h1><!-- hidden --><p>"), col("text"),
        lit(" &amp; tail</p></body></html>"))
      t(s, d, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), TextAnalysis.htmlToText(html).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // Soft dedup: duplicates stay in the corpus but carry weight 1/n —
    // hash-first (16 B/row corpus shuffle), exact under collisions, and
    // the weight math is IEEE division so the oracle hash-matches.
    "d137_soft_dedup" -> ((s, d) => {
      Dedup.softDedupWeights(t(s, d, "documents"), "doc_id", Seq("text"))
        .orderBy(col("doc_id"))
    }),

    // Exact-substring (k-gram coverage) dedup: a planted 8-word tail shared
    // by every doc_id%5==0 document keeps only its first occurrence; the
    // oracle re-derives coverage from scratch with window n-grams in SQL.
    // exactGrams=true for differential testing (prod path hashes grams;
    // WebCorpusSpec pins hashed == exact).
    "d138_substring_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"),
            lit(" common tail sentence repeated across many documents")))
            .otherwise(col("text")).as("text"))
      Dedup.substringDedup(docs, "doc_id", "text", k = 8, exactGrams = true)
        .orderBy(col("doc_id"))
    }),

    // Unicode dedup key: NFC + lower + whitespace collapse — composed and
    // decomposed renderings of the same text land on one key. Hash-green:
    // DuckDB's nfc_normalize mirrors the JDK normalizer.
    "t146_unicode_normalize" -> ((s, d) => {
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextAnalysis.unicodeDedupKey(
            concat(col("text"), lit(" Café ÉLAN  x"))).as("key"))
        .orderBy(col("doc_id"))
    }),

    // Extended PII redaction: email/url/phone plus IP + SSN shapes (the
    // oracle mirrors the regex chain; the Luhn card kernel is identity on
    // this card-free input and is pinned by ExpressionsSpec known answers).
    "q147_redact_extended" -> ((s, d) => {
      val dirty = concat(col("text"),
        lit(" contact a"), col("doc_id"),
        lit("@ex.org ip 10.0."), col("doc_id") % 256,
        lit(".7 ssn 123-45-6789 tel 555-123-4567"))
      t(s, d, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"),
          TextAnalysis.redactPiiExtended(dirty).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // Batch ANN serve: every query row gets its top-k in ONE job — probe
    // cells computed as a per-row expression, cell equi-join, per-query
    // rank window. Rows-only (k-means fit); WebCorpusSpec pins batch ≡
    // per-query serving.
    "s145_ann_batch" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val centers = Similarity.ivfFit(emb, "embedding", nlist = 16)
      val corpus = emb.filter(col("vec_id") % 50 =!= 0)
      // FIXED query set (ids < 500 exist at every SF): the serve cost is
      // queries x probed-cell population by design, so the scale smoke
      // must vary only the corpus axis; production raises nlist with the
      // corpus to hold cell size (and per-query cost) constant
      val queries = emb.filter(col("vec_id") % 50 === 0 &&
        col("vec_id") < 500)
      Similarity.ivfTopKBatch(
          Similarity.ivfAssign(corpus, "vec_id", "embedding", centers),
          centers, queries, "vec_id", "embedding", k = 5, nprobe = 4)
        .select(col("query_id"), col("id"),
          round(col("cosine"), 5).as("cosine"),
          col("rank").cast(LongType).as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Snapshot diff: the minimal I/U/D op log between two table versions
    // (inverse of q21's CDC apply). One full-outer join on the key;
    // null-safe struct compare. Hash-green vs an independent SQL diff.
    "q143_snapshot_diff" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val before = o.filter(col("o_orderkey") % 7 =!= 0)
      val after = o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      Cdc.snapshotDiff(before, after, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // Deequ-style expectations: every rule folds into ONE aggregation
    // pass (a validation must not scan a 100 TB table once per rule);
    // the report is rules-cardinality-sized.
    "q144_expectations" -> ((s, d) => {
      operators.Expectations.report(t(s, d, "lineitem"), Seq(
        operators.Expectations.Check("qty_in_range",
          col("l_quantity").between(1, 50)),
        operators.Expectations.Check("ship_in_era",
          col("l_shipdate").between("1992-01-01", "1998-12-31")),
        operators.Expectations.Check("positive_price",
          col("l_extendedprice") > 0),
        operators.Expectations.Check("discount_band",
          col("l_discount").between(0, 0.05), maxViolationRate = 0.5)))
    }),

    // Cross-source score calibration: per-group percent rank makes one
    // global threshold keep the same fraction of every source. The
    // (rank−1)/(n−1) division is IEEE-exact in both engines.
    "t140_score_calibrate" -> ((s, d) => {
      TextAnalysis.calibrateScores(
          t(s, d, "documents").select(col("doc_id"), col("lang"),
            col("n_chars")),
          "n_chars", "lang")
        .orderBy(col("doc_id"))
    }),

    // Compression-ratio quality signal: deflate ratio per document + the
    // band gate. Rows-only (DuckDB has no deflate); zlib output is
    // deterministic for a given input/level, and ExpressionsSpec pins
    // ordering properties + interpreted ≡ codegen.
    "t141_compression_signal" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          round(TextAnalysis.compressionRatio(col("text")), 4).as("ratio"),
          TextAnalysis.compressionKeep(col("text"), 0.05, 0.95).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // ANN index persistence: fit IVF once, persist centroids as a table,
    // reload, serve. Rows-only (k-means fit not SQL-expressible);
    // WebCorpusSpec pins persisted == in-memory serving exactly.
    "s139_ann_persist" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val centers = Similarity.ivfFit(emb, "embedding", nlist = 16)
      val loaded = Similarity.centersFromDF(Similarity.centersToDF(s, centers))
      Similarity.ivfTopKPreassigned(
          Similarity.ivfAssign(emb.filter(col("vec_id") =!= 0), "vec_id",
            "embedding", loaded), loaded, q, k = 10, nprobe = 6)
        .select(col("id"), round(col("cosine"), 5).as("cosine"))
        .orderBy(col("cosine").desc, col("id"))
    }),

    // Ordered-step funnel (view → click → purchase): first-touch strict-
    // order semantics, ONE exchange on user_id reused by the stacked
    // step windows and the final reduction. Oracle re-derives the chain
    // with sequential min-filter CTEs.
    "q149_funnel" -> ((s, d) => {
      Funnel.report(t(s, d, "events"), "user_id", "ts", Seq(
        col("event_type") === "view",
        col("event_type") === "click",
        col("event_type") === "purchase"))
    }),

    // Exact k-per-group sample via the mergeable bottom-k aggregate: the
    // exchange carries at most k (hash, id) pairs per group per map
    // partition, never a whole sorted group. The oracle IS the rank-
    // window formulation the aggregate replaces.
    "d150_group_sample" -> ((s, d) => {
      Dedup.groupBottomK(t(s, d, "documents"), "source", "doc_id", 20)
        .orderBy(col("source"), col("doc_id"))
    }),

    // Unicode script-mix profile: per-range codepoint counts + dominant
    // script + purity, one codegen'd kernel pass. Deterministic non-ASCII
    // tails (mirrored in the oracle) exercise the non-Latin counters on
    // the ASCII fixture corpus.
    "t151_script_profile" -> ((s, d) => {
      val spiced = t(s, d, "documents").filter(col("doc_id") < 300)
        .withColumn("text2", concat(col("text"),
          when(col("lang") === "zh", lit(" 汉字文本分析 中文"))
            .when(col("lang") === "es", lit(" mañana señor, ¿qué?"))
            .when(col("lang") === "de", lit(" Straße Müller Größe"))
            .when(col("lang") === "fr", lit(" déjà été à côté"))
            .when(col("lang") === "en" && col("doc_id") % 7 === 0,
              lit(" Привет мир"))
            .otherwise(lit(" plain ascii tail"))))
      TextAnalysis.scriptProfile(spiced, "text2")
        .select(col("doc_id"), col("latin"), col("cyrillic"), col("cjk"),
          col("script_letters"), col("dominant_script"),
          col("script_purity"))
        .orderBy(col("doc_id"))
    }),

    // Join-key skew diagnostic: top-10 heaviest keys + per-key-count
    // distribution summary. One corpus-sized count agg; top-k is
    // TakeOrderedAndProject, every later step runs on key- or topN-sized
    // data.
    "q152_skew_profile" -> ((s, d) =>
      Skew.keyProfile(t(s, d, "events"), col("user_id"), 10)),

    // Count-min frequency sketch: per-source sketches persisted (the
    // incremental-stats shape), folded with cmsMergeAgg, probed for the
    // exact top-40 tokens. At fixture vocabulary << sketch width the
    // min-over-depth estimate equals the exact count (same exact-regime
    // contract as the t128 KLL and t133 theta gates); CurationOpsSpec
    // pins the never-undercount and ε·N bounds in the colliding regime.
    "t153_cms_freq" -> ((s, d) => {
      import org.apache.spark.sql.graft.NativeFunctions
      val docs = t(s, d, "documents")
      val toks = docs.select(col("source"),
          explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      val folded = toks
        .groupBy(col("source"))
        .agg(NativeFunctions.cmsSketchAgg(col("token"), eps = 0.0001).as("sk"))
        .agg(NativeFunctions.cmsMergeAgg(col("sk"), eps = 0.0001).as("sk"))
      TextAnalysis.topTokens(docs, "text", 40)
        .crossJoin(broadcast(folded))
        .select(col("token"),
          NativeFunctions.cmsEstimate(col("sk"), col("token")).as("est"))
        .orderBy(col("token"))
    }),

    // Cohort retention: first-activity week cohorts × week offsets, with
    // distinct-active counts and retention fractions. One entity agg, one
    // (entity, period) distinct, one co-partitioned join; the matrix is
    // calendar²-sized.
    "q154_retention" -> ((s, d) =>
      operators.Retention.cohorts(t(s, d, "events"), "user_id", "ts",
        "week")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("offset"), col("active"), col("cohort_size"), col("retention"))
        .orderBy(col("cohort_week"), col("offset"))),

    // PMI collocations: pairs that co-occur beyond their marginals, one
    // fixed double evaluation order so the scores are engine-exact.
    // Model-sized joins only; totals ride one broadcast row.
    "t155_collocations" -> ((s, d) =>
      operators.LanguageModel.collocations(t(s, d, "documents"), "text",
        minCount = 5, topK = 150)),

    // Stateful streaming funnel: the q149 chain evaluated incrementally
    // with O(k) state per entity; exact under batch-monotone event time,
    // so the file-source stream reproduces the batch oracle bit-for-bit.
    "str156_stream_funnel" -> ((s, d) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val streamDir = tmpDir("graft_str156")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      val src = s.readStream.schema(rawSchema).parquet(streamDir.toString)
        .withColumn("ts", Tables.eventTs(rawSchema("ts").dataType))
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id").as("entity"),
          when(col("event_type") === "view", 0)
            .when(col("event_type") === "click", 1)
            .otherwise(2).as("step"),
          unix_micros(col("ts")).as("ts"))
        .as[graft.streaming.StreamFunnel.StepEvent]
      val reach = graft.streaming.StreamFunnel.reachStream(src, 3)
      val name = "str156_" + java.util.UUID.randomUUID.toString
        .replace("-", "")
      val tbl = graft.streaming.MicroBatch.runToMemory(s, reach.toDF(),
        name, outputMode = "update")
      val fin = tbl.groupBy(col("entity"))
        .agg(max(col("reached")).as("reached"))
      val counts = fin.agg(
        sum(when(col("reached") >= 1, 1).otherwise(0)).cast("long").as("u1"),
        sum(when(col("reached") >= 2, 1).otherwise(0)).cast("long").as("u2"),
        sum(when(col("reached") >= 3, 1).otherwise(0)).cast("long").as("u3"))
      counts.select(explode(array(
          struct(lit(1).cast("long").as("step"), col("u1").as("users")),
          struct(lit(2).cast("long").as("step"), col("u2").as("users")),
          struct(lit(3).cast("long").as("step"), col("u3").as("users"))))
        .as("sr"))
        .select(col("sr.step"), col("sr.users"))
        .crossJoin(broadcast(counts.select(col("u1"))))
        .select(col("step"), col("users"),
          when(col("u1") === 0, lit(null).cast("double"))
            .otherwise(round(
              col("users").cast("double") / col("u1").cast("double"), 6))
            .as("conversion"))
        .orderBy(col("step"))
    }),

    // SCD Type-2 dimension history from an op log (per-customer order
    // stream as the change log): validity intervals via one key-partitioned
    // lead window; deletes close intervals without opening one.
    "q157_scd2" -> ((s, d) => {
      val log = t(s, d, "orders").select(
        col("o_custkey").as("k"),
        when(col("o_orderkey") % 11 === 0, lit("D"))
          .otherwise(lit("U")).as("op"),
        col("o_orderdate").as("ts"),
        col("o_totalprice").as("price"),
        col("o_orderkey"))
      Cdc.scd2(log, Seq("k"), "op", "ts", Seq(col("o_orderkey")))
        .select(col("k"),
          date_format(col("ts"), "yyyy-MM-dd").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd").as("valid_to"),
          col("price"), col("o_orderkey"), col("is_current"))
        .orderBy(col("k"), col("valid_from"), col("o_orderkey"))
    }),

    // Top-k-by-score per group via the mergeable heap aggregate (the
    // quality-ranked domain cap at 100 TB shape — no group sort). Oracle
    // is the rank-window-desc formulation it replaces.
    "d158_group_topk" -> ((s, d) =>
      Dedup.groupTopKByScore(t(s, d, "documents"), "lang", "doc_id",
          "n_chars", 5)
        .orderBy(col("lang"), col("doc_id"))),

    // Event-rate anomaly detection: per-(type, hour) counts z-scored
    // against a trailing 24-bucket baseline built from EXACT integer
    // window sums (never a built-in stddev — accumulation algorithms
    // differ across engines), so the scores hash-match the oracle.
    "q159_rate_anomaly" -> ((s, d) =>
      operators.Anomaly.rateAnomalies(t(s, d, "events"), "event_type",
          "ts", "hour", lookback = 24, minPoints = 8, zThreshold = 3.0)
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm").as("hr"),
          col("n"), col("baseline_mean"), col("baseline_sd"), col("z"),
          col("is_anomaly"))
        .orderBy(col("series"), col("hr"))),

    // A/B analysis: per-user conversion units (hash-assigned variants),
    // two-proportion z vs control from exact integer counts in one fixed
    // double order — rates/lifts/z hash-match the oracle.
    "q160_ab_test" -> ((s, d) => {
      val units = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"))
        .withColumn("variant",
          element_at(array(lit("control"), lit("a"), lit("b")),
            (col("user_id") % 3 + 1).cast("int")))
      operators.Experiment.abTest(units, "variant", "converted", "control")
    }),

    // Column profiling: equi-width histogram with under/overflow bins —
    // one map-side-combined count agg to a bins-sized table; bin edges
    // and shares in one fixed double order, hash-exact vs the oracle.
    "q161_histogram" -> ((s, d) =>
      operators.Expectations.histogram(t(s, d, "lineitem"),
        col("l_extendedprice"), 0.0, 80000.0, 16)),

    // Time-series gap filling: dense per-series hourly calendar, zero
    // counts in holes, decimal-routed value sums carried forward (LOCF).
    // Calendar explode + keyed fill join — nothing corpus-scale after
    // the first aggregate.
    "q162_gap_fill" -> ((s, d) =>
      operators.TimeSeries.resample(t(s, d, "events"), "event_type", "ts",
          round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6))
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm").as("hr"),
          col("n"), col("v"))
        .orderBy(col("series"), col("hr"))),

    // Drop-aware anomaly scoring: dense zero-filled calendar + two-sided
    // flags — an outage hour is an explicit 0 that scores, not a missing
    // row that vanishes (the q159 variant that can see drops).
    "q163_drop_anomaly" -> ((s, d) =>
      operators.Anomaly.rateAnomalies(t(s, d, "events"), "event_type",
          "ts", "hour", lookback = 24, minPoints = 8, zThreshold = 3.0,
          dense = true, twoSided = true)
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm").as("hr"),
          col("n"), col("baseline_mean"), col("baseline_sd"), col("z"),
          col("is_anomaly"))
        .orderBy(col("series"), col("hr"))),

    // Time-RANGE window frame ("revenue in the 7 calendar days ending at
    // this order"), which the rows-frame cumulative gates (q08/q50)
    // cannot express: per-key shuffle + one ordered frame scan,
    // decimal-routed so the frame sum is accumulation-order-exact.
    "q164_rolling_window" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-6 * 86400L, 0)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .over(w).cast(DoubleType) / 100.0).as("roll_rev"),
          count(lit(1)).over(w).as("roll_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Equal-frequency (decile) binning without a global sort: cuts from
    // one percentile aggregate, assignment by a zero-shuffle comparison
    // chain — never ntile's everything-in-one-partition window.
    "q165_quantile_bins" -> ((s, d) =>
      operators.Expectations.quantileBins(t(s, d, "orders"),
        col("o_totalprice"), 10)),

    // Categorical mutual information (lang × source association): one
    // count aggregate to a pairs-sized table, windows over THAT.
    "t166_mutual_info" -> ((s, d) =>
      operators.Expectations.mutualInfo(t(s, d, "documents"),
        "lang", "source")),

    // Link-graph PageRank (host-authority curation signal) over the
    // customer→supplier purchase graph — 10 damped iterations, each one
    // keyed contribution aggregate + a 1-row dangling-mass scalar; the
    // oracle unrolls the same iterations as chained CTEs.
    "q167_pagerank" -> ((s, d) => {
      val e = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      operators.Graph.pageRank(e, "src", "dst").orderBy(col("id"))
    }),

    // Forward as-of join (asofBackward's mirror): for each order, the
    // customer's EARLIEST event at-or-after the order date — the "next
    // reading" lookup; one keyed shuffle, frame reversed.
    "q168_asof_forward" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val ev = t(s, d, "events")
        .select(col("user_id").as("o_custkey"), col("ts"),
          col("event_id"), col("value"))
      operators.TemporalJoins.asofForward(o, ev, "o_custkey",
          "o_orderdate", "ts", Seq("event_id", "value"), "event_id")
        .select(col("o_orderkey"), col("o_custkey"),
          col("asof_event_id"), col("asof_value"))
        .orderBy(col("o_orderkey"))
    }),

    // Sorted-neighborhood blocking (entity-resolution candidate pairs):
    // all pairs within 5 positions of the global (n_chars, doc_id)
    // order — range-repartition + per-bucket leads + an exact boundary
    // sliver, never one partition's global window.
    "d169_sorted_neighborhood" -> ((s, d) =>
      operators.Linkage.sortedNeighborhoodPairs(
          t(s, d, "documents"), "doc_id", col("n_chars"),
          neighborhood = 5, buckets = 8)
        .orderBy(col("id_a"), col("id_b"))),

    // HITS hubs/authorities over the same purchase graph as q167 — the
    // bipartite centrality pair (breadth-heavy hubs vs cited
    // authorities); L1-normalized so the per-iteration scalar is exact.
    "q170_hits" -> ((s, d) => {
      val e = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      operators.Graph.hits(e, "src", "dst").orderBy(col("id"))
    }),

    // Percentile winsorization (robust feature prep): tails clip to the
    // p5/p95 cuts from one percentile aggregate; clipping itself is a
    // zero-shuffle comparison against two broadcast scalars.
    "q171_winsorize" -> ((s, d) =>
      operators.Expectations.winsorize(t(s, d, "lineitem"),
          col("l_extendedprice"), 0.05, 0.95, "price_w")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("price_w"), 6).as("price_w"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // Robust (median/MAD) per-series outlier flags — the value-column
    // counterpart of q159's count z-scores; moment-free baseline so the
    // outliers cannot drag their own threshold.
    "q172_robust_outliers" -> ((s, d) =>
      operators.Anomaly.robustOutliers(t(s, d, "events"), "event_type",
          col("value"))
        .select(col("event_id"), col("event_type"),
          round(col("median"), 6).as("median"),
          round(col("mad"), 6).as("mad"),
          col("robust_z"), col("is_outlier"))
        .orderBy(col("event_id"))),

    // Deterministic contrastive negative sampling: 3 pseudo-random
    // other docs per anchor via the portable hash over the exact
    // distributed global-rank index — one range-partition sort + one
    // position equi-join, no execution-time randomness.
    "d173_negative_samples" -> ((s, d) =>
      operators.Linkage.negativeSamples(
          t(s, d, "documents").select(col("doc_id")), "doc_id", k = 3,
          buckets = 8)
        .select(col("anchor"), col("i").cast(LongType).as("i"), col("neg"))
        .orderBy(col("anchor"), col("i"))),

    // Fuzzy cross-corpus matching (entity resolution's MATCHING half):
    // truncated probe docs link back to their masters by token Jaccard —
    // postings candidates (df-capped), exact verify, best match per
    // probe. The oracle brute-forces all pairs; pruning affects only
    // candidate recall, never a score, so the two agree.
    "d174_fuzzy_join" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val probes = docs.filter(col("doc_id") < 300)
        .select((col("doc_id") + 900000L).as("probe_id"),
          regexp_replace(col("text"), "\\s+\\S+$", "").as("text"))
      operators.Linkage.fuzzyJoin(probes,
          docs.select(col("doc_id"), col("text")),
          "probe_id", "text", "doc_id", "text", threshold = 0.5)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Time-weighted average over irregular observations (the correct
    // mean for uneven sampling — a plain avg over-weights chatty
    // periods): step-function integral per series, decimal-routed.
    "q175_twap" -> ((s, d) =>
      operators.TimeSeries.timeWeightedAvg(t(s, d, "events"),
          "event_type", "ts", col("value"))
        .orderBy(col("series"))),

    // Personalized (topic-sensitive) PageRank: the surfer teleports to
    // nation-1 customers only — authority AS SEEN FROM a trusted seed
    // set (TrustRank); dangling mass returns to the seeds.
    "q176_ppr" -> ((s, d) => {
      val e = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      val seeds = t(s, d, "customer").filter(col("c_nationkey") === 1)
        .select(col("c_custkey").as("id"))
      operators.Graph.pageRankPersonalized(e, "src", "dst", seeds)
        .orderBy(col("id"))
    }),

    // Weighted PageRank: parallel purchase edges merge additively, so a
    // supplier's rank reflects purchase VOLUME, not just distinct buyers.
    "q177_pagerank_weighted" -> ((s, d) => {
      val e = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"), lit(1.0).as("w"))
      operators.Graph.pageRankWeighted(e, "src", "dst", "w")
        .orderBy(col("id"))
    }),

    // Incremental aggregate maintenance (IVM): a standing per-type
    // rollup folds an imaged CDC diff (deletes, updates, inserts)
    // WITHOUT rescanning the base — the oracle recomputes the rollup
    // from scratch over v2, pinning incremental ≡ recompute exactly.
    "q178_incremental_agg" -> ((s, d) => {
      val base = t(s, d, "events")
        .select(col("event_id"), col("event_type").as("g"), col("value"))
      val v2 = base.filter(col("event_id") % 17 =!= 0)
        .withColumn("value",
          when(col("event_id") % 5 === 0, col("value") + 1.5)
            .otherwise(col("value")))
        .unionByName(base.filter(col("event_id") % 13 === 0)
          .select((col("event_id") + 10000000L).as("event_id"), col("g"),
            (col("value") * 2.0).as("value")))
      val prior = base.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_v"))
      val log = operators.Cdc.snapshotDiffImaged(base, v2, Seq("event_id"))
      operators.Cdc.incrementalAgg(prior, log, "g", "value")
        .select(col("g"), col("n"), round(col("sum_v"), 6).as("sum_v"))
        .orderBy(col("g"))
    }),

    // Streaming rollup maintenance: two imaged-CDC micro-batches (the
    // v1 insert load, then the v1→v2 diff) fold into versioned rollup
    // snapshots — replay-idempotent, arrival-order-insensitive (deltas
    // commute); the final state must equal the from-scratch aggregate
    // over v2, which IS the oracle.
    "str179_stream_rollup" -> ((s, d) => {
      val root = tmpDir("graft_str179")
      val (srcDir, rollDir, ckpt) =
        (s"$root/src", s"$root/roll", s"$root/ckpt")
      val base = t(s, d, "events")
        .select(col("event_id"), col("event_type").as("g"), col("value"))
      val v2 = base.filter(col("event_id") % 17 =!= 0)
        .withColumn("value",
          when(col("event_id") % 5 === 0, col("value") + 1.5)
            .otherwise(col("value")))
        .unionByName(base.filter(col("event_id") % 13 === 0)
          .select((col("event_id") + 10000000L).as("event_id"), col("g"),
            (col("value") * 2.0).as("value")))
      operators.Cdc.snapshotDiffImaged(base.limit(0), base, Seq("event_id"))
        .coalesce(1).write.parquet(srcDir)
      operators.Cdc.snapshotDiffImaged(base, v2, Seq("event_id"))
        .coalesce(1).write.mode("append").parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.MicroBatch.streamRollup(stream, rollDir,
          "g", "value", graft.streaming.MicroBatch.IngestConfig(
            checkpointDir = ckpt, triggerMillis = 0))
        .start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.MicroBatch.readRollup(s, rollDir)
        .select(col("g"), col("n"), round(col("sum_v"), 6).as("sum_v"))
        .orderBy(col("g"))
    }),

    // Backpressure / admission control under replay: six staged files,
    // maxFilesPerTrigger=2 -> exactly three micro-batches of exactly two
    // files each (mtime-ordered), audited by a per-batch row-count sink;
    // a RESTART on the same checkpoint re-admits NOTHING (replay
    // idempotence). The algebraic oracle recomputes each batch's row
    // count from the file-slice rule — one big batch, a dropped file, or
    // double admission all break the per-batch counts.
    "str198_stream_backpressure" -> ((s, d) => {
      val root = tmpDir("graft_str198")
      val (srcDir, outDir, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      stageReplayBatches(s,
        (0 until 6).map(i => ev.filter(pmod(col("event_id"), lit(6)) === i)),
        srcDir)
      val cfg = graft.streaming.MicroBatch.IngestConfig(
        triggerMillis = 0, maxFilesPerTrigger = 2, checkpointDir = ckpt)
      def runOnce(): Unit = {
        val q = graft.streaming.MicroBatch.fileStream(s, srcDir, cfg)
          .writeStream.trigger(cfg.trigger)
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: DataFrame, id: Long) =>
            df.agg(count(lit(1)).as("n_rows"))
              .select(lit(id).as("batch_id"), col("n_rows"))
              .coalesce(1).write.mode("append").parquet(outDir)
            ()
          }.start()
        try q.awaitTermination() finally q.stop()
      }
      runOnce() // drains all six files in three bounded batches
      runOnce() // restart on the same checkpoint: admits zero batches
      s.read.parquet(outDir).orderBy(col("batch_id"))
    }),

    // k-core decomposition: peel the purchase graph to its k=30 core —
    // the densely-embedded customers/suppliers that survive iterative
    // low-degree removal (the link-farm/periphery separator). The
    // oracle unrolls the peeling; converged rounds are no-ops, so a
    // fixed unroll reproduces the fixpoint exactly.
    "q180_kcore" -> ((s, d) => {
      val e = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      // k=10: the largest core that is non-empty at every fixture
      // scale (sf0.001 peels to ~130 nodes; smaller SFs peel to zero at
      // higher k — the gate must return rows at the unit-smoke scale too)
      operators.Graph.kCore(e, "src", "dst", k = 10).orderBy(col("id"))
    }),

    // Per-user event transition matrix (Markov behavior model): ordered
    // (from → to) pair counts + per-from transition probabilities; one
    // keyed window + one pairs-sized aggregate.
    "q181_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n").cast(DoubleType) /
          sum(col("n")).over(Window.partitionBy(col("from_type")))
            .cast(DoubleType), 6))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // end-to-end MULTIMODAL curation (the media sibling of p88): binary
    // payloads → CDC-chunk near-dup screen → decode → frame sample →
    // batch pack → partitioned manifest. Rows-only gate: the report row
    // equals MediaCurationPipeline.run's (pinned in PipelineSpec), and
    // every stage's math is oracle-checked by its own gate (m142, m43,
    // t114 families).
    "p182_media_pipeline" -> ((s, d) => {
      import s.implicits._
      val out = tmpDir("graft_p182").toString
      val r = pipelines.MediaCurationPipeline.run(
        s, t(s, d, "documents"), out)
      Seq((r.input, r.afterNearDedup, r.videos, r.frames, r.batches))
        .toDF("input", "after_near_dedup", "videos", "frames", "batches")
    }),

    // Daily + trailing-7-day distinct users per event type via mergeable
    // theta sketches: one corpus pass to a day-grain sketch table, then
    // a buckets-sized range self-join folds 7 sketches per row. Exact
    // below sketch capacity (gate scale) → exact DuckDB COUNT(DISTINCT)
    // differential; ±2% estimates at 100 TB, where the exact
    // formulation re-shuffles every event into every window it touches.
    "q183_rolling_distinct" -> ((s, d) =>
      operators.TimeSeries.rollingDistinct(t(s, d, "events"),
          "event_type", "ts", "user_id", window = 7)
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd").as("day"),
          col("bucket_distinct"), col("rolling_distinct"))
        .orderBy(col("series"), col("day"))),

    // Community detection by deterministic synchronous label propagation
    // (most-frequent neighbor label, ties to the smallest) on the
    // customer–supplier graph; 3 fixed rounds, oracle unrolls the same
    // rounds as chained CTEs.
    "q184_label_propagation" -> ((s, d) => {
      val e = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      operators.Graph.labelPropagation(e, "src", "dst", iterations = 3)
        .orderBy(col("id"))
    }),

    // CUSUM level-shift detection over daily event rates: Page's
    // recursion reformulated as running-sum-minus-running-min — two
    // ordered windows over exact decimals, so the statistic is
    // engine-exact and the oracle replicates it token-for-token.
    "q185_cusum" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type").as("series"),
          to_date(date_trunc("day", col("ts"))).as("bucket"))
        .agg(count(lit(1)).as("n"))
      operators.Anomaly.cusum(daily, "series", "bucket", col("n"),
          slack = 0.25, threshold = 3.0)
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd").as("day"),
          col("n"), round(col("cusum_hi"), 6).as("cusum_hi"),
          round(col("cusum_lo"), 6).as("cusum_lo"), col("is_shift"))
        .orderBy(col("series"), col("day"))
    }),

    // Leakage-safe train/val/test split: assignment is a pure portable
    // hash of the GROUP key (user), so one user's rows never straddle
    // the split — per-split user/event counts, reproducible in plain SQL.
    "q186_group_split" -> ((s, d) =>
      operators.Dedup.groupSplit(t(s, d, "events"), "user_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("split"))),

    // Last-touch revenue attribution: purchases credit the latest
    // preceding touch (click/view/signup) since the previous purchase;
    // micro-unit-summed credits, one entity exchange + co-partitioned
    // touch↔conversion join. The input UNIONs an exact duplicate of a
    // deterministic click slice, planting (ts, tie) COLLISIONS between
    // identical touch rows: the operator's row_number pick must credit
    // exactly ONE of each colliding pair (a tie-equality filter would
    // keep both and double-count the conversion value) — and because
    // the colliders are identical, whichever wins, the channel totals
    // are engine-deterministic.
    "q187_attribution" -> ((s, d) => {
      val ev = t(s, d, "events")
      val collided = ev.unionAll(ev.filter(
        col("event_type") === "click" && col("user_id") % 50 === 0))
      operators.Attribution.credit(collided, "user_id", "ts",
          "event_id",
          isTouch = col("event_type").isin("click", "view", "signup"),
          channel = col("event_type"),
          isConversion = col("event_type") === "purchase",
          value = col("value"), model = "last")
        .orderBy(col("channel"))
    }),

    // Frequent 3-step behavior paths: every length-3 window of each
    // user's ordered event stream, counted corpus-wide, top 25 by count
    // with deterministic ties.
    "q188_event_paths" -> ((s, d) =>
      operators.Attribution.eventPaths(t(s, d, "events"), "user_id",
          "ts", "event_id", col("event_type"), k = 3, topN = 25)),

    // Market-basket co-purchase pairs over lineitem baskets (orders):
    // basket-keyed pair join with a skew cap, exact counts + lift.
    "q189_copurchase" -> ((s, d) =>
      operators.Affinity.coOccurrence(t(s, d, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2L)
        .orderBy(col("item_a"), col("item_b"))),

    // Trailing-7-day p50/p95 of event value per type via mergeable KLL
    // sketches (q183's pattern with quantiles): day-grain sketches fold
    // over a buckets-sized range join; exact-mode quantiles equal
    // inclusive order statistics at gate scale → exact oracle. k=800 >
    // the gate SF's largest window (501 values) keeps every fold exact —
    // the t128 sizing rule; the approximate regime is pinned by KLL
    // error-envelope unit tests.
    "q190_rolling_quantile" -> ((s, d) =>
      operators.TimeSeries.rollingQuantile(t(s, d, "events"),
          "event_type", "ts", col("value"), window = 7, k = 800)
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd").as("day"),
          col("n"), col("p50"), col("p95"))
        .orderBy(col("series"), col("day"))),

    // Operators COMPOSE: funnel completion latency percentiles = Funnel
    // .reach ⋈ KLL sketch, both already oracle-checked alone. Latencies
    // are floor-second integers (unix_timestamp convention, mirrored in
    // the oracle) and completer counts sit far under k → exact mode →
    // exact oracle.
    "q191_funnel_latency" -> ((s, d) => {
      import org.apache.spark.sql.graft.NativeFunctions
      operators.Funnel.reach(t(s, d, "events"), "user_id", "ts", Seq(
          col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"))
        .filter(col("t3").isNotNull)
        .select((unix_timestamp(col("t3")) - unix_timestamp(col("t1")))
          .cast(DoubleType).as("sec"))
        .agg(count(lit(1)).as("n_completers"),
          NativeFunctions.kllSketchAgg(col("sec"), k = 4096).as("__sk"))
        .select(col("n_completers"),
          round(NativeFunctions.kllQuantile(col("__sk"), 0.5), 2)
            .as("p50_sec"),
          round(NativeFunctions.kllQuantile(col("__sk"), 0.9), 2)
            .as("p90_sec"))
    }),

    // Cohort lifetime-value curves: users cohorted by first-event week
    // (portable integer week arithmetic — floor(days-since-Monday-epoch
    // / 7) — so both engines bucket identically), purchase revenue
    // decimal-cumsum'd per cohort over periods, normalized per user.
    "q192_cohort_ltv" -> ((s, d) => {
      def wk(c: Column) =
        floor(datediff(to_date(c), lit("1970-01-05")) / 7).cast(LongType)
      val ev = t(s, d, "events")
      val first = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("__f"))
        .select(col("user_id"), wk(col("__f")).as("cohort_week"))
        .localCheckpoint(eager = false) // sizes + the revenue join
      val sizes = first.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("n_users"))
      val w = Window.partitionBy(col("cohort_week")).orderBy(col("period"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.filter(col("event_type") === "purchase")
        .join(first, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (wk(col("ts")) - col("cohort_week")).as("period"))
        .agg(sum(col("value").cast(DecimalType(28, 6))).as("__rev"))
        .join(sizes, Seq("cohort_week"))
        .withColumn("__cum", sum(col("__rev")).over(w))
        .select(col("cohort_week"), col("period"), col("n_users"),
          round(col("__rev").cast(DoubleType), 6).as("revenue"),
          round(col("__cum").cast(DoubleType) /
            col("n_users").cast(DoubleType), 6).as("cum_ltv_per_user"))
        .orderBy(col("cohort_week"), col("period"))
    }),

    // Per-document TF-IDF keywords: posting-style tf, term-keyed df over
    // the postings, smoothed-idf scoring, per-doc rank window on ROUNDED
    // scores (engine-reproducible cut).
    "t193_tfidf_terms" -> ((s, d) =>
      operators.TextAnalysis.tfidfTerms(
          t(s, d, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("rank"))),

    // Distribution-drift gate (PSI): current week-4 order prices vs the
    // week-1 reference, binned on the REFERENCE's quantile cuts — the
    // refresh-the-corpus / retrain-the-scorer go-no-go check.
    "q196_psi_drift" -> ((s, d) => {
      // portable integer weeks (the q192 discipline) — engine week-of-
      // year conventions differ, integer day arithmetic does not
      val o = t(s, d, "orders")
        .select(col("o_totalprice").as("price"),
          floor(datediff(to_date(col("o_orderdate")), lit("1970-01-05"))
            / 7).cast(LongType).as("wk"))
      operators.Expectations.populationStability(
        ref = o.filter(col("wk") % 4 === 1),
        cur = o.filter(col("wk") % 4 === 0),
        value = col("price"), bins = 10)
    }),

    // Discrete churn life table with right-censoring: per activity age,
    // at-risk population (reverse cumsum over an ages-sized table),
    // churn events, and the hazard — users last seen near the corpus
    // end are censored, not churned.
    "q195_churn_hazard" -> ((s, d) =>
      operators.Retention.hazard(t(s, d, "events"), "user_id", "ts",
        censorGuardDays = 3)),

    // Additive seasonal decomposition of daily event rates: centered
    // 7-day moving-average trend, weekday-slot seasonal indices over the
    // detrended values, residual — all decimal-routed, portable integer
    // weekday arithmetic.
    "q194_seasonal" -> ((s, d) =>
      operators.TimeSeries.seasonalDecompose(t(s, d, "events"),
          "event_type", "ts", lit(1.0))
        .select(col("series"),
          date_format(col("bucket"), "yyyy-MM-dd").as("day"),
          col("v"), col("trend"), col("seasonal"), col("residual"))
        .orderBy(col("series"), col("day"))))

  /** q225's oracle, shared with str229: streaming per-value-count
    * maintenance + read-side KS must equal batch KS on the union of
    * all batches. */
  private val ksDriftOracleSql: String =
    """WITH o AS (
      | SELECT o_totalprice AS price,
      |  CAST(floor(datediff('day', DATE '1970-01-05',
      |   CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS wk
      | FROM orders),
      |r AS (SELECT price AS v FROM o WHERE wk % 4 = 1
      | AND price IS NOT NULL AND NOT isnan(price)),
      |c AS (SELECT price AS v FROM o WHERE wk % 4 = 0
      | AND price IS NOT NULL AND NOT isnan(price)),
      |rv AS (SELECT v, count(*) AS cr FROM r GROUP BY v),
      |cv AS (SELECT v, count(*) AS cc FROM c GROUP BY v),
      |j AS (SELECT coalesce(rv.v, cv.v) AS v,
      |  coalesce(cr, 0) AS cr, coalesce(cc, 0) AS cc
      | FROM rv FULL OUTER JOIN cv ON rv.v = cv.v),
      |k AS (SELECT
      |  CAST(sum(cr) OVER (ORDER BY v) AS DECIMAL(19,0)) AS a,
      |  CAST(sum(cc) OVER (ORDER BY v) AS DECIMAL(19,0)) AS b
      | FROM j),
      |t AS (SELECT CAST(sum(cr) AS DECIMAL(19,0)) AS nr,
      |  CAST(sum(cc) AS DECIMAL(19,0)) AS nc FROM j)
      |SELECT CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur,
      | CAST(max(abs(a * nc - b * nr)) AS DOUBLE)
      |  / CAST(nr * nc AS DOUBLE) AS ks
      |FROM k, t GROUP BY nr, nc""".stripMargin

  /** q189's oracle, shared with str224: streaming co-occurrence
    * maintenance over basket-complete batches must reproduce the batch
    * operator on the full postings exactly. */
  private val copurchaseOracleSql: String =
    """WITH posts AS (
      | SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
      | WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      |sz AS (SELECT b FROM posts GROUP BY b HAVING count(*) <= 256),
      |k AS (SELECT posts.b, posts.i FROM posts JOIN sz USING (b)),
      |tot AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n FROM k),
      |f AS (SELECT i, count(*) AS ni FROM k GROUP BY i),
      |pr AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_baskets
      | FROM k a JOIN k b ON a.b = b.b AND a.i < b.i
      | GROUP BY a.i, b.i HAVING count(*) >= 2)
      |SELECT item_a, item_b, n_baskets,
      | round(CAST(n_baskets AS DOUBLE) * (SELECT n FROM tot) /
      |  (CAST(fa.ni AS DOUBLE) * CAST(fb.ni AS DOUBLE)), 6) AS lift
      |FROM pr JOIN f fa ON fa.i = pr.item_a
      | JOIN f fb ON fb.i = pr.item_b
      |ORDER BY item_a, item_b""".stripMargin

  /** q219's oracle: the same precomputed 1/ln(deg) DECIMAL weight
    * table the operator broadcasts (JVM StrictMath `log` and libm `ln`
    * disagree by an ULP on some integers — ln 3 — so NEITHER side may
    * compute the weight at runtime; both read the identical literal). */
  private def linkPredictOracleSql(maxDegree: Int, minCommon: Int)
      : String = {
    val rows = (2 to maxDegree).map { d =>
      val aa = java.math.BigDecimal
        .valueOf(1.0 / math.log(d.toDouble))
        .setScale(18, java.math.RoundingMode.HALF_EVEN).toPlainString
      val ra = java.math.BigDecimal.ONE.divide(
        java.math.BigDecimal.valueOf(d.toLong), 18,
        java.math.RoundingMode.HALF_EVEN).toPlainString
      s"($d, CAST('$aa' AS DECIMAL(28,18)), CAST('$ra' AS DECIMAL(28,18)))"
    }.mkString(",\n   ")
    s"""WITH u AS MATERIALIZED (
       | SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
       | FROM lineitem x JOIN lineitem y
       |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
       | WHERE x.l_orderkey % 5 = 0),
       |e AS MATERIALIZED (
       | SELECT a, b FROM u UNION SELECT b, a FROM u),
       |deg AS MATERIALIZED (
       | SELECT a AS v, count(*) AS dv FROM e GROUP BY a),
       |lnw(ld, law, lrw) AS (VALUES
       |   $rows),
       |star AS MATERIALIZED (
       | SELECT e.a AS v, e.b AS n, deg.dv, lnw.law, lnw.lrw FROM e
       | JOIN deg ON deg.v = e.a
       | JOIN lnw ON lnw.ld = deg.dv
       | WHERE deg.dv <= $maxDegree),
       |w AS (SELECT x.n AS id_a, y.n AS id_b, x.law AS aa, x.lrw AS ra
       | FROM star x JOIN star y ON x.v = y.v AND x.n < y.n),
       |nadj AS (SELECT * FROM w WHERE NOT EXISTS (
       | SELECT 1 FROM e WHERE e.a = w.id_a AND e.b = w.id_b))
       |SELECT id_a, id_b, count(*) AS common_neighbors,
       | CAST(CAST(sum(aa) AS VARCHAR) AS DOUBLE) AS adamic_adar,
       | CAST(CAST(sum(ra) AS VARCHAR) AS DOUBLE) AS resource_alloc
       |FROM nadj GROUP BY id_a, id_b
       |HAVING count(*) >= $minCommon
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q167's oracle: the same damped iteration unrolled as chained CTEs
    * (recursive-CTE aggregation over the recursive term is not portable
    * SQL). Constants are forced to DOUBLE so both engines run the same
    * IEEE arithmetic. */
  private def pageRankOracleSql(iterations: Int): String = {
    val head =
      """WITH e AS MATERIALIZED (
        | SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |od AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |pr0 AS MATERIALIZED (
        | SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
        | FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s""",
         |c$k AS MATERIALIZED (
         | SELECT e.dst AS id, sum(p.rank / od.deg) AS c
         | FROM e JOIN pr${k - 1} p ON e.src = p.id
         |  JOIN od ON od.src = e.src
         | GROUP BY e.dst),
         |d$k AS MATERIALIZED (
         | SELECT CAST(1.0 AS DOUBLE) - coalesce(sum(c), CAST(0 AS DOUBLE))
         |  AS dang FROM c$k),
         |pr$k AS MATERIALIZED (
         | SELECT n.id,
         |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
         |    * (CAST(1.0 AS DOUBLE) / (SELECT n FROM nn))
         |  + CAST(0.85 AS DOUBLE) * (coalesce(c.c, CAST(0 AS DOUBLE))
         |    + (SELECT dang FROM d$k)
         |      * (CAST(1.0 AS DOUBLE) / (SELECT n FROM nn))) AS rank
         | FROM nodes n LEFT JOIN c$k c ON c.id = n.id)""".stripMargin
    }.mkString
    head + iters +
      s"\nSELECT id, round(rank, 6) AS rank FROM pr$iterations ORDER BY id"
  }

  /** q202's oracle: connected components by MIN-PROPAGATION unrolled —
    * a deliberately DIFFERENT algorithm from the implementation's
    * alternating large-star/small-star, converging to the same labels
    * (component = smallest member id). Each round takes the min of a
    * node's own label and its neighbors' labels; after the fixpoint
    * (round 8 at sf0.01, 11 at sf0.1) further rounds are no-ops, so a
    * fixed unroll ≥ the convergence depth reproduces it exactly. */
  private def ccOracleSql(rounds: Int): String = {
    val head =
      """WITH u AS (
        | SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        | FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        | WHERE x.l_orderkey % 20 = 0),
        |e AS MATERIALIZED (
        | SELECT a AS src, b AS dst FROM u UNION SELECT b, a FROM u),
        |c0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS comp FROM e)"""
        .stripMargin
    val iters = (1 to rounds).map { k =>
      s""",
         |c$k AS MATERIALIZED (
         | SELECT c.id, least(c.comp, coalesce(m.mc, c.comp)) AS comp
         | FROM c${k - 1} c LEFT JOIN (
         |   SELECT e.dst AS id, min(p.comp) AS mc
         |   FROM e JOIN c${k - 1} p ON p.id = e.src
         |   GROUP BY e.dst) m ON m.id = c.id)""".stripMargin
    }.mkString
    head + iters +
      s"\nSELECT id, comp AS component FROM c$rounds ORDER BY id"
  }

  /** q176/q177's oracle: the general (weighted, teleport-vector)
    * PageRank iteration unrolled — `e(src, dst, w)` comes from
    * `edgeSql`, the teleport share rides a `tp(id, t)` CTE built by
    * `tpSql` over the node set, and each iteration applies
    * `(1−d)·t + d·(c + dang·t)` with the conservation-identity
    * dangling, exactly the Spark formula. */
  private def pageRankGeneralOracleSql(edgeSql: String, tpSql: String,
      iterations: Int, tail: Option[String] = None): String = {
    val head =
      s"""WITH e AS MATERIALIZED ($edgeSql),
         |od AS MATERIALIZED (
         | SELECT src, sum(w) AS deg FROM e GROUP BY src),
         |tp AS MATERIALIZED ($tpSql),
         |pr0 AS MATERIALIZED (SELECT id, t AS rank FROM tp)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s""",
         |c$k AS MATERIALIZED (
         | SELECT e.dst AS id, sum(p.rank * e.w / od.deg) AS c
         | FROM e JOIN pr${k - 1} p ON e.src = p.id
         |  JOIN od ON od.src = e.src
         | GROUP BY e.dst),
         |d$k AS MATERIALIZED (
         | SELECT CAST(1.0 AS DOUBLE) - coalesce(sum(c), CAST(0 AS DOUBLE))
         |  AS dang FROM c$k),
         |pr$k AS MATERIALIZED (
         | SELECT n.id,
         |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n.t
         |  + CAST(0.85 AS DOUBLE) * (coalesce(c.c, CAST(0 AS DOUBLE))
         |    + (SELECT dang FROM d$k) * n.t) AS rank
         | FROM tp n LEFT JOIN c$k c ON c.id = n.id)""".stripMargin
    }.mkString
    head + iters + "\n" + tail.getOrElse(
      s"SELECT id, round(rank, 6) AS rank FROM pr$iterations ORDER BY id")
  }

  /** q180's oracle: the k-core peeling unrolled — each round keeps only
    * edges whose BOTH endpoints have round-start degree ≥ k; once the
    * fixpoint is reached further rounds are no-ops, so a fixed unroll ≥
    * the convergence round count reproduces the fixpoint exactly. */
  private def kCoreOracleSql(k: Int, rounds: Int): String = {
    val head =
      s"""WITH u AS (
         | SELECT o_custkey AS a, l_suppkey + 1000000 AS b
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e0 AS MATERIALIZED (
         | SELECT DISTINCT a, b FROM (
         |  SELECT a, b FROM u UNION ALL SELECT b, a FROM u)
         | WHERE a <> b)""".stripMargin
    val iters = (1 to rounds).map { r =>
      s""",
         |k$r AS MATERIALIZED (
         | SELECT a AS id FROM e${r - 1} GROUP BY a HAVING count(*) >= $k),
         |e$r AS MATERIALIZED (
         | SELECT e.a, e.b FROM e${r - 1} e
         | JOIN k$r ka ON e.a = ka.id
         | JOIN k$r kb ON e.b = kb.id)""".stripMargin
    }.mkString
    head + iters +
      s"""
         |SELECT a AS id, count(*) AS core_degree
         |FROM e$rounds GROUP BY a ORDER BY id""".stripMargin
  }

  /** q170's oracle: HITS unrolled the same way (auth then hub per
    * iteration, each L1-normalized by a scalar subquery). */
  private def hitsOracleSql(iterations: Int): String = {
    val head =
      """WITH e AS MATERIALIZED (
        | SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nodes AS MATERIALIZED (
        | SELECT src AS id FROM e UNION SELECT dst FROM e),
        |h0 AS MATERIALIZED (
        | SELECT id, CAST(1.0 AS DOUBLE) AS hub FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s""",
         |ar$k AS MATERIALIZED (
         | SELECT e.dst AS id, sum(h.hub) AS a
         | FROM e JOIN h${k - 1} h ON e.src = h.id GROUP BY e.dst),
         |a$k AS MATERIALIZED (
         | SELECT n.id, coalesce(ar.a, CAST(0 AS DOUBLE))
         |   / (SELECT sum(a) FROM ar$k) AS auth
         | FROM nodes n LEFT JOIN ar$k ar ON ar.id = n.id),
         |hr$k AS MATERIALIZED (
         | SELECT e.src AS id, sum(a.auth) AS h
         | FROM e JOIN a$k a ON e.dst = a.id GROUP BY e.src),
         |h$k AS MATERIALIZED (
         | SELECT n.id, coalesce(hr.h, CAST(0 AS DOUBLE))
         |   / (SELECT sum(h) FROM hr$k) AS hub
         | FROM nodes n LEFT JOIN hr$k hr ON hr.id = n.id)""".stripMargin
    }.mkString
    head + iters +
      s"""
         |SELECT a.id, round(a.auth, 6) AS auth, round(h.hub, 6) AS hub
         |FROM a$iterations a JOIN h$iterations h ON a.id = h.id
         |ORDER BY a.id""".stripMargin
  }

  /** Gates whose oracle is a VALUE-PINNED expected table rather than an
    * algebraic re-derivation: seeded LSH pair lists, ANN shortlists, BPE
    * merge tables, sketch estimates — functions ANSI SQL cannot express,
    * but whose output is a pure deterministic function of the input
    * parquet (verified by byte-comparing repeated `Verify` runs at
    * different SPARK_GRAFT_CPUS, i.e. different shuffle partitioning).
    * Each name loads `resources/graft/pinned/<name>.sql`, a VALUES
    * literal of the full sf0.01 result generated by
    * `tools/pin_oracles.py` — so drift in a seeded path fails the
    * correctness gate itself, not just the unit suite that pins the
    * algorithm's laws. Regenerate the resource after any INTENTIONAL
    * change to a pinned path. */
  private val pinnedOracleGates: Seq[String] = Seq(
    "d101_neardup_increment", "d102_importance_sample",
    "d131_contamination_report", "d29_minhash_neardup",
    "d30_simhash_neardup", "d31_embed_neardup", "d40_ngram_neardup",
    "d91_semantic_dedup", "d93_temperature_mix", "d240_containment",
    "d265_lsh_eval",
    "d96_semantic_decontaminate", "m130_cdc_dedup", "m142_binary_neardup",
    "m197_phash_neardup", "m252_audio_energy", "m253_silence_trim",
    "p88_pipeline", "q104_foreign_bucket", "q38_approx",
    "s111_prototypicality", "s118_cluster_stats", "s119_diversity_sample",
    "s129_pca_ann", "s139_ann_persist", "s145_ann_batch", "s33_ann_lsh",
    "s41_knn_graph", "s44_ann_ivf", "s95_ann_pq", "s99_ann_ivfpq",
    "str103_stream_neardup_ingest", "str112_stream_quality",
    "str148_stream_curate", "p182_media_pipeline",
    "t105_bpe_train", "t106_bpe_encode",
    "t108_lm_perplexity", "t109_quality_classifier", "t114_pack_sequences",
    "t311_tokenizer_fertility", "q312_welch_ttest", "q313_bootstrap_ci",
    "q314_kaplan_meier", "q315_cusum", "q316_atkinson",
    "q319_mad_profile", "d320_index_compact", "str321_fitted_histogram",
    "q322_log_rank", "t324_keyphrases", "str326_stream_quantiles",
    "m328_pad_plan", "q329_mcc", "q330_chi2_independence",
    "p332_drop_ledger", "str334_stream_distinct_sketch",
    // str337's jsd_part: JDK Math.log and libm ln disagree by 1 ulp on
    // some share ratios, so the algebraic form hash-fails — pinned
    "str337_stream_jsd",
    // r14 wave 2: every gate below carries a transcendental (cbrt/exp
    // ln) or a quantized cross-row double sum that round() semantics
    // drift on across engines — pinned with the two-partitioning proof
    "q338_kruskal_wallis", "q339_g_test", "q340_post_strat",
    "t341_llr_collocations", "t342_mojibake", "t343_lexicon_screen",
    "q344_pacf", "q345_seasonal_strength", "q347_manifest_fsck",
    "str348_stream_sprt", "q349_conformal", "q350_ucb",
    "str353_stream_tukey", "str354_stream_conformal",
    "q355_mcnemar", "q356_fleiss_kappa", "q357_bradley_terry",
    "q358_cmh", "q359_contingency_effects", "str360_stream_bt",
    // r15 wave 1: driver-solved fits (q362/q364/q367/q369), erfc/cbrt
    // tails (q363), seeded-Laplace ln (q365), soundex (no DuckDB
    // equivalent, q366), and EWMA double ratios (q368) — pinned with
    // the two-partitioning proof
    "q362_linear_fit", "q363_levene", "q364_platt", "q365_dp_release",
    "q366_phonetic_join", "q367_kmeans", "q368_croston", "q369_granger",
    "q370_welch_anova", "q371_ipw", "str372_stream_linear_fit",
    "q373_wilcoxon", "q374_friedman", "q375_cronbach", "q376_icc",
    "q377_cox", "q378_paired_t",
    // r15 wave 4: KM ln/exp (q379), W-H/erfc tails (q380, q382, q384,
    // q386), driver-solved fits (q382-q384, q386), double rank-cut
    // bucketing (q381), and the DBSCAN component labels (q385) -
    // pinned with the two-partitioning proof
    "q379_rmst", "q380_cochran_q", "q381_qini", "q382_poisson",
    "q383_vif", "q384_breusch_pagan", "q385_dbscan", "q386_aipw",
    // r15 wave 5: sqrt-of-argmin distances (q387), driver absorption
    // solves (q388), and in-plan OLS residual ratios (q389) - pinned
    // with the two-partitioning proof
    "q387_silhouette", "q388_markov_attribution", "q389_durbin_watson",
    "t141_compression_signal", "t241_isotonic", "t27_fingerprint",
    "t42_group_sketch", "t80_hll_sketch",
    // Round-11: the nine r10 driver-red gates. All are deterministic
    // across shuffle partitionings (proven by pin_oracles' two-run
    // byte-compare at SPARK_GRAFT_CPUS=7 vs 32) but their former
    // algebraic oracles leaned on round(DOUBLE)/decimal-window
    // constructs whose results drift across DuckDB builds; the pinned
    // VALUES form is engine-version-independent (strtod is correctly
    // rounded).
    "q221_ewma", "q228_boxplot", "q232_double_smooth", "q246_hhi",
    "q250_weighted_median", "q258_price_volume_mix", "q260_peaks",
    "q263_abc_analysis", "str266_stream_top_contributors")

  private def pinnedOracles: Map[String, String] =
    pinnedOracleGates.map { name =>
      val in = getClass.getResourceAsStream(s"/graft/pinned/$name.sql")
      require(in != null, s"missing pinned oracle resource for $name")
      val sql =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      name -> sql
    }.toMap

  /** q184's oracle: the same deterministic synchronous LPA rounds
    * unrolled as chained CTEs (most-frequent neighbor label, ties to
    * the smallest — both engines run the identical argmax rule). */
  private def lpaOracleSql(iterations: Int): String = {
    val head =
      """WITH u AS (
        | SELECT o_custkey AS a, l_suppkey + 1000000 AS b
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS MATERIALIZED (
        | SELECT DISTINCT a, b FROM (
        |  SELECT a, b FROM u UNION ALL SELECT b, a FROM u)
        | WHERE a <> b),
        |l0 AS MATERIALIZED (
        | SELECT DISTINCT a AS id, a AS label FROM e)""".stripMargin
    val iters = (1 to iterations).map { r =>
      s""",
         |c$r AS MATERIALIZED (
         | SELECT e.a AS id, l.label, count(*) AS n
         | FROM e JOIN l${r - 1} l ON e.b = l.id GROUP BY e.a, l.label),
         |l$r AS MATERIALIZED (
         | SELECT id, label FROM (
         |  SELECT id, label,
         |   row_number() OVER (PARTITION BY id ORDER BY n DESC, label ASC)
         |    AS rn
         |  FROM c$r) WHERE rn = 1)""".stripMargin
    }.mkString
    head + iters +
      s"""
         |SELECT id, label FROM l$iterations ORDER BY id""".stripMargin
  }

  /** q269's oracle: q184's exact LPA label CTEs (same edges, same
    * argmax rule) extended with the one-division modularity form
    * `(4m·E_in − Σ_c deg_c²)/(2m)²` — every sum an exact integer, the
    * subtraction 37-digit-bounded, the division mirrored through the
    * VARCHAR decimal→double route. */
  private def modularityOracleSql(iterations: Int): String = {
    val lpa = lpaOracleSql(iterations)
    val ctePrefix = lpa.substring(0, lpa.lastIndexOf("\nSELECT id,"))
    ctePrefix +
      s""",
         |und AS MATERIALIZED (
         | SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
         | FROM u WHERE a <> b),
         |m AS (SELECT count(*) AS mm FROM und),
         |deg AS (SELECT id, count(*) AS dg FROM (
         |  SELECT a AS id FROM und UNION ALL SELECT b FROM und)
         | GROUP BY id),
         |intra AS (SELECT coalesce(sum(
         |  CASE WHEN la.label = lb.label THEN 1 ELSE 0 END), 0) AS ein
         | FROM und JOIN l$iterations la ON la.id = und.a
         |  JOIN l$iterations lb ON lb.id = und.b),
         |comm AS (SELECT l.label, sum(deg.dg) AS dc, count(*) AS nn
         | FROM deg JOIN l$iterations l ON l.id = deg.id GROUP BY l.label),
         |s AS (SELECT count(*) AS n_communities,
         |  CAST(sum(nn) AS BIGINT) AS n_nodes,
         |  sum(CAST(dc AS DECIMAL(19,0)) * CAST(dc AS DECIMAL(19,0)))
         |   AS sumdc2
         | FROM comm)
         |SELECT n_nodes, CAST(mm AS BIGINT) AS n_edges, n_communities,
         | CAST(ein AS BIGINT) AS intra_edges,
         | CASE WHEN mm = 0 THEN NULL ELSE
         |  CAST(CAST(CAST(CAST(4 * mm AS DECIMAL(19,0)) *
         |    CAST(ein AS DECIMAL(19,0)) AS DECIMAL(37,0)) -
         |    CAST(sumdc2 AS DECIMAL(37,0)) AS VARCHAR) AS DOUBLE) /
         |  CAST(CAST(CAST(2 * mm AS DECIMAL(19,0)) *
         |    CAST(2 * mm AS DECIMAL(19,0)) AS VARCHAR) AS DOUBLE)
         | END AS modularity
         |FROM s CROSS JOIN m CROSS JOIN intra""".stripMargin
  }

  def oracleSql: Map[String, String] = pinnedOracles ++ Map(
    "q269_modularity" -> modularityOracleSql(3),

    "q267_kaplan_meier" ->
      """WITH per AS (
        | SELECT user_id,
        |  min(CAST(date_trunc('day', ts) AS DATE)) AS fst,
        |  max(CAST(date_trunc('day', ts) AS DATE)) AS lst,
        |  min(CASE WHEN event_type = 'purchase'
        |   THEN CAST(date_trunc('day', ts) AS DATE) END) AS conv
        | FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |subj AS (
        | SELECT 'c' || CAST(user_id % 3 AS VARCHAR) AS g,
        |  CASE WHEN conv IS NOT NULL THEN datediff('day', fst, conv)
        |   ELSE datediff('day', fst, lst) END AS dur,
        |  conv IS NOT NULL AS obs
        | FROM per),
        |steps AS (
        | SELECT g, CAST(dur AS BIGINT) AS t,
        |  CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |  CAST(sum(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT) AS c
        | FROM subj GROUP BY g, dur),
        |r AS (SELECT *, sum(d + c) OVER (PARTITION BY g ORDER BY t
        |  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
        | FROM steps),
        |l AS (SELECT *, CASE WHEN d = n_risk THEN 0
        |  ELSE CAST(floor(ln(CAST(n_risk - d AS DOUBLE) /
        |   CAST(n_risk AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)
        |  END AS lnq FROM r),
        |f AS (SELECT *,
        |  max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER wc AS dead,
        |  sum(lnq) OVER wc AS lsum FROM l
        | WINDOW wc AS (PARTITION BY g ORDER BY t ROWS UNBOUNDED PRECEDING))
        |SELECT g AS "group", t, CAST(n_risk AS BIGINT) AS n_risk, d, c,
        | CASE WHEN dead = 1 THEN 0.0
        |  ELSE round(exp(CAST(lsum AS DOUBLE) / 1000000000.0), 6)
        | END AS survival
        |FROM f ORDER BY "group", t""".stripMargin,

    "q268_ca_trend" ->
      """WITH pd AS (
        | SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS w,
        |  count(*) AS n,
        |  sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS r
        | FROM orders
        | WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        | GROUP BY 1),
        |a AS (SELECT
        |  CAST(sum(n) AS BIGINT) AS nt, CAST(sum(r) AS BIGINT) AS nr,
        |  count(*) AS n_levels,
        |  sum(CAST(w AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))
        |   AS swn,
        |  sum(CAST(CAST(w AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))
        |    AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))) AS swwn,
        |  sum(CAST(w AS DECIMAL(19,0)) * CAST(r AS DECIMAL(19,0)))
        |   AS swr
        | FROM pd),
        |b AS (SELECT nt AS n_total, nr AS n_resp, n_levels,
        |  CAST(CAST(swr AS DECIMAL(19,0)) * CAST(nt AS DECIMAL(19,0))
        |   AS DECIMAL(37,0)) -
        |  CAST(CAST(swn AS DECIMAL(19,0)) * CAST(nr AS DECIMAL(19,0))
        |   AS DECIMAL(37,0)) AS t,
        |  CAST(CAST(nt AS DECIMAL(19,0)) * CAST(swwn AS DECIMAL(19,0))
        |   AS DECIMAL(37,0)) -
        |  CAST(CAST(swn AS DECIMAL(19,0)) * CAST(swn AS DECIMAL(19,0))
        |   AS DECIMAL(37,0)) AS aa,
        |  CAST(nr AS DECIMAL(19,0)) * CAST(nt - nr AS DECIMAL(19,0))
        |   AS rr
        | FROM a)
        |SELECT n_total, n_resp, n_levels,
        | CAST(CAST(t AS VARCHAR) AS DOUBLE) AS t_stat,
        | CASE WHEN n_levels < 2 OR rr = 0 OR aa = 0 THEN NULL
        |  ELSE CAST(CAST(t AS VARCHAR) AS DOUBLE) *
        |   sqrt(CAST(CAST(n_total AS VARCHAR) AS DOUBLE)) /
        |   sqrt(CAST(CAST(rr AS VARCHAR) AS DOUBLE) *
        |    CAST(CAST(aa AS VARCHAR) AS DOUBLE))
        | END AS z
        |FROM b""".stripMargin,

    "q270_overdispersion" ->
      """WITH dc AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS b, count(*) AS n
        | FROM events
        | WHERE event_type IS NOT NULL AND ts IS NOT NULL
        | GROUP BY 1, 2),
        |s AS (SELECT series, count(*) AS n_days,
        |  CAST(sum(n) AS BIGINT) AS total,
        |  sum(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))
        |   AS s2
        | FROM dc GROUP BY series)
        |SELECT series, n_days, total,
        | CAST(CAST(total AS VARCHAR) AS DOUBLE) /
        |  CAST(n_days AS DOUBLE) AS mean,
        | CASE WHEN n_days < 2 OR total = 0 THEN NULL ELSE
        |  CAST(CAST(CAST(CAST(n_days AS DECIMAL(7,0)) *
        |    CAST(s2 AS DECIMAL(30,0)) AS DECIMAL(37,0)) -
        |    CAST(CAST(total AS DECIMAL(19,0)) *
        |     CAST(total AS DECIMAL(19,0)) AS DECIMAL(37,0))
        |   AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(CAST(n_days - 1 AS DECIMAL(19,0)) *
        |    CAST(total AS DECIMAL(19,0)) AS VARCHAR) AS DOUBLE)
        | END AS dispersion,
        | CASE WHEN n_days < 2 OR total = 0 THEN NULL ELSE
        |  CAST(CAST(CAST(CAST(n_days AS DECIMAL(7,0)) *
        |    CAST(s2 AS DECIMAL(30,0)) AS DECIMAL(37,0)) -
        |    CAST(CAST(total AS DECIMAL(19,0)) *
        |     CAST(total AS DECIMAL(19,0)) AS DECIMAL(37,0))
        |   AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(CAST(total AS DECIMAL(19,0)) AS VARCHAR) AS DOUBLE)
        | END AS chi2
        |FROM s ORDER BY series""".stripMargin,

    "q272_followed_by" ->
      """WITH spans AS (
        | SELECT user_id AS e, event_type AS s, min(ts) AS mn,
        |  max(ts) AS mx
        | FROM events
        | WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |  AND ts IS NOT NULL
        | GROUP BY 1, 2),
        |pairs AS (
        | SELECT a.s AS step_a, b.s AS step_b, count(*) AS n_entities
        | FROM spans a JOIN spans b
        |  ON a.e = b.e AND a.s <> b.s AND a.mn < b.mx
        | GROUP BY 1, 2),
        |sizes AS (SELECT s AS step_a, count(*) AS n_entities_a
        | FROM spans GROUP BY 1)
        |SELECT step_a, step_b, n_entities, n_entities_a,
        | CAST(n_entities AS DOUBLE) / CAST(n_entities_a AS DOUBLE)
        |  AS share
        |FROM pairs JOIN sizes USING (step_a)
        |ORDER BY step_a, step_b""".stripMargin,

    "t273_dup_gram_fraction" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |occ AS (
        | SELECT doc_id, array_to_string(list_slice(t, i+1, i+8), ' ')
        |  AS gram
        | FROM toks, unnest(range(0, greatest(len(t)-7, 0))) AS u(i)),
        |dfreq AS (SELECT gram, count(DISTINCT doc_id) AS df
        | FROM occ GROUP BY gram),
        |counted AS (
        | SELECT o.doc_id, count(*) AS n_grams,
        |  count(CASE WHEN f.df >= 2 THEN 1 END) AS dup_grams
        | FROM occ o JOIN dfreq f USING (gram) GROUP BY o.doc_id)
        |SELECT d.doc_id AS id,
        | coalesce(c.n_grams, 0) AS n_grams,
        | coalesce(c.dup_grams, 0) AS dup_grams,
        | round(CAST(c.dup_grams AS DOUBLE) / c.n_grams, 5)
        |  AS dup_fraction
        |FROM (SELECT doc_id FROM documents) d
        | LEFT JOIN counted c USING (doc_id)
        |ORDER BY id""".stripMargin,

    "q274_audience_overlap" ->
      """WITH posts AS (
        | SELECT DISTINCT event_type AS g, user_id AS e FROM events
        | WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |sized AS (SELECT e FROM posts GROUP BY e HAVING count(*) <= 256),
        |kept AS (SELECT p.* FROM posts p SEMI JOIN sized s ON p.e = s.e),
        |sizes AS (SELECT g, count(*) AS n FROM kept GROUP BY g),
        |pairs AS (
        | SELECT a.g AS group_a, b.g AS group_b, count(*) AS intersection
        | FROM kept a JOIN kept b ON a.e = b.e AND a.g < b.g
        | GROUP BY 1, 2)
        |SELECT group_a, group_b, sa.n AS n_a, sb.n AS n_b, intersection,
        | CAST(intersection AS DOUBLE) /
        |  CAST(sa.n + sb.n - intersection AS DOUBLE) AS jaccard,
        | CAST(intersection AS DOUBLE) /
        |  CAST(least(sa.n, sb.n) AS DOUBLE) AS overlap
        |FROM pairs
        | JOIN sizes sa ON sa.g = pairs.group_a
        | JOIN sizes sb ON sb.g = pairs.group_b
        |ORDER BY group_a, group_b""".stripMargin,

    "m275_tile_plan" ->
      """WITH meta AS (SELECT doc_id, octet_length(encode(text)) AS len
        | FROM documents WHERE doc_id < 300),
        |wh AS (SELECT doc_id,
        |  CAST(64 + (doc_id * 37 + len * 11) % 1024 AS INTEGER) AS width,
        |  CAST(64 + (doc_id * 59 + len * 7) % 1024 AS INTEGER) AS height
        | FROM meta),
        |g AS (SELECT doc_id, width, height,
        |  CAST((width + 255) // 256 AS INTEGER) AS nx,
        |  CAST((height + 255) // 256 AS INTEGER) AS ny FROM wh),
        |tiles AS (SELECT doc_id, width, height, nx * ny AS n_tiles, nx,
        |  unnest(range(0, nx * ny)) AS tile_id FROM g)
        |SELECT doc_id, width, height, CAST(n_tiles AS INTEGER) AS n_tiles,
        | CAST(tile_id AS INTEGER) AS tile_id,
        | CAST((tile_id % nx) * 256 AS INTEGER) AS x0,
        | CAST((tile_id // nx) * 256 AS INTEGER) AS y0,
        | CAST(least((tile_id % nx) * 256 + 256, width) AS INTEGER) AS x1,
        | CAST(least((tile_id // nx) * 256 + 256, height) AS INTEGER)
        |  AS y1
        |FROM tiles ORDER BY doc_id, tile_id""".stripMargin,

    "q288_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |c AS (SELECT CASE WHEN user_id % 4 = 0 THEN 'holdout'
        |   ELSE 'treatment' END AS variant, count(*) AS o
        | FROM u WHERE user_id IS NOT NULL GROUP BY 1),
        |design(variant, w) AS (VALUES ('treatment', 3), ('holdout', 1)),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS tn FROM c),
        |j AS (SELECT d.variant, d.w, coalesce(c.o, 0) AS n
        | FROM design d LEFT JOIN c ON c.variant = d.variant),
        |b AS (SELECT variant, n,
        |  CAST(CAST(CAST(tn AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))
        |    AS VARCHAR) AS DOUBLE) / 4.0 AS expected_n,
        |  CAST(CAST(CAST(n AS DECIMAL(19,0)) * CAST(4 AS DECIMAL(19,0))
        |     AS DECIMAL(37,0)) -
        |    CAST(CAST(tn AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))
        |     AS DECIMAL(37,0)) AS DECIMAL(19,0)) AS diff,
        |  CAST(CAST(tn AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))
        |   AS DECIMAL(19,0)) * CAST(4 AS DECIMAL(19,0)) AS den
        | FROM j CROSS JOIN t)
        |SELECT variant, n, expected_n,
        | CAST(CAST(diff * diff AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(den AS VARCHAR) AS DOUBLE) AS chi2_part
        |FROM b ORDER BY variant""".stripMargin,

    "q289_roc_auc" ->
      s"""WITH $ClsEvalFixtureSql,
        |by_v AS (SELECT v, sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
        |  count(*) AS nt FROM fx GROUP BY v),
        |c AS (SELECT np, nt, coalesce(sum(nt) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        | FROM by_v),
        |a AS (SELECT sum(np) AS snp, sum(nt - np) AS snn,
        |  sum(np * (2 * cb + nt + 1)) AS r2p FROM c)
        |SELECT CAST(snp AS BIGINT) AS n_pos, CAST(snn AS BIGINT) AS n_neg,
        | CASE WHEN snp = 0 OR snn = 0 THEN NULL
        |  ELSE CAST(r2p - snp * snp - snp AS DOUBLE) /
        |   (CAST(snp * snn AS DOUBLE) * 2.0) END AS auc,
        | CASE WHEN snp = 0 OR snn = 0 THEN NULL
        |  ELSE (CAST(r2p - snp * snp - snp AS DOUBLE) /
        |   (CAST(snp * snn AS DOUBLE) * 2.0)) * 2.0 - 1.0 END AS gini
        |FROM a""".stripMargin,

    "q290_confusion" ->
      s"""WITH $ClsEvalFixtureSql,
        |c AS (SELECT
        |  sum(CASE WHEN v >= 0.5 AND y THEN 1 ELSE 0 END) AS tp,
        |  sum(CASE WHEN v >= 0.5 AND NOT y THEN 1 ELSE 0 END) AS fp,
        |  sum(CASE WHEN v < 0.5 AND NOT y THEN 1 ELSE 0 END) AS tn,
        |  sum(CASE WHEN v < 0.5 AND y THEN 1 ELSE 0 END) AS fn
        | FROM fx)
        |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        | CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
        | CASE WHEN tp + fp = 0 THEN NULL ELSE CAST(tp AS DOUBLE) /
        |  CAST(tp + fp AS DOUBLE) END AS "precision",
        | CASE WHEN tp + fn = 0 THEN NULL ELSE CAST(tp AS DOUBLE) /
        |  CAST(tp + fn AS DOUBLE) END AS recall,
        | CASE WHEN tp + tp + fp + fn = 0 THEN NULL
        |  ELSE CAST(tp + tp AS DOUBLE) /
        |   CAST(tp + tp + fp + fn AS DOUBLE) END AS f1,
        | CASE WHEN tp + fp + tn + fn = 0 THEN NULL
        |  ELSE CAST(tp + tn AS DOUBLE) /
        |   CAST(tp + fp + tn + fn AS DOUBLE) END AS accuracy
        |FROM c""".stripMargin,

    "q291_calibration" ->
      s"""WITH $ClsEvalFixtureSql,
        |b AS (SELECT least(CAST(floor(v * 10) AS BIGINT), 9) AS bin,
        |  count(*) AS n, sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
        |  sum(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS sm
        | FROM fx GROUP BY 1),
        |r AS (SELECT bin, n, CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
        |   AS mean_pred,
        |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos
        | FROM b)
        |SELECT bin, n, n_pos, mean_pred, frac_pos,
        | abs(frac_pos - mean_pred) AS abs_gap
        |FROM r ORDER BY bin""".stripMargin,

    "q292_ece" ->
      s"""WITH $ClsEvalFixtureSql,
        |b AS (SELECT least(CAST(floor(v * 10) AS BIGINT), 9) AS bin,
        |  count(*) AS n, sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
        |  sum(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS sm
        | FROM fx GROUP BY 1),
        |r AS (SELECT n,
        |  abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) -
        |   CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0))
        |   AS abs_gap
        | FROM b)
        |SELECT CAST(sum(n) AS BIGINT) AS n, count(*) AS n_bins,
        | CAST(sum(CAST(floor(abs_gap * CAST(n AS DOUBLE) *
        |    1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE) /
        |  (CAST(sum(n) AS DOUBLE) * 1000000000000.0) AS ece
        |FROM r""".stripMargin,

    "q293_brier" ->
      s"""WITH $ClsEvalFixtureSql,
        |dd AS (SELECT v - CASE WHEN y THEN 1.0 ELSE 0.0 END AS d
        | FROM fx)
        |SELECT count(*) AS n,
        | CASE WHEN count(*) = 0 THEN NULL
        |  ELSE CAST(sum(CAST(floor(d * d * 1000000000000.0 + 0.5)
        |    AS BIGINT)) AS DOUBLE) /
        |   (CAST(count(*) AS DOUBLE) * 1000000000000.0) END AS brier
        |FROM dd""".stripMargin,

    "q294_rank_eval" ->
      """WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |qs AS (SELECT q FROM range(1, 11) t(q)),
        |pairs AS (SELECT q, doc_id,
        |  ((doc_id * 1009 + q) * 48271) % 2147483647 AS h
        | FROM qs CROSS JOIN docs),
        |results AS (SELECT * FROM (SELECT q, doc_id, row_number() OVER (
        |   PARTITION BY q ORDER BY h, doc_id) AS r FROM pairs)
        | WHERE r <= 10),
        |qrels AS (SELECT q, doc_id FROM pairs
        | WHERE (h * 48271 % 2147483647) % 8 = 0),
        |gains AS (SELECT r, CAST(floor(round(1.0 /
        |   (ln(CAST(r AS DOUBLE) + 1.0) / ln(2.0)), 9) *
        |   1000000000.0 + 0.5) AS BIGINT) AS g
        | FROM range(1, 11) t(r)),
        |nrel AS (SELECT q, count(*) AS n_rel FROM qrels GROUP BY q),
        |hits AS (SELECT res.q, count(*) AS hits, min(res.r) AS first_r,
        |  CAST(sum(g.g) AS BIGINT) AS dcg
        | FROM results res JOIN qrels USING (q, doc_id)
        | JOIN gains g ON g.r = res.r GROUP BY res.q),
        |idcg AS (SELECT n.q, CAST(sum(g.g) AS BIGINT) AS idcg
        | FROM nrel n JOIN gains g ON g.r <= least(n.n_rel, 10)
        | GROUP BY n.q)
        |SELECT n.q AS query, n.n_rel, coalesce(h.hits, 0) AS hits,
        | CAST(coalesce(h.hits, 0) AS DOUBLE) / 10.0 AS p_at_k,
        | CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(n.n_rel AS DOUBLE)
        |  AS recall_at_k,
        | CASE WHEN h.first_r IS NULL THEN 0.0
        |  ELSE 1.0 / CAST(h.first_r AS DOUBLE) END AS mrr,
        | CASE WHEN h.dcg IS NULL THEN 0.0
        |  ELSE CAST(h.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE) END AS ndcg
        |FROM nrel n JOIN idcg i ON i.q = n.q
        |LEFT JOIN hits h ON h.q = n.q
        |ORDER BY query""".stripMargin,

    "q295_bh_fdr" ->
      """WITH c AS (SELECT o_orderpriority || '|' || o_orderstatus
        |  AS key, sum(o_orderkey % 997) % 997 AS pi
        | FROM orders GROUP BY 1),
        |pp AS (SELECT key, CASE WHEN pi % 2 = 0
        |  THEN CAST(pi % 10 AS DOUBLE) / 1000.0
        |  ELSE 0.5 + CAST(pi % 100 AS DOUBLE) / 1000.0 END AS p
        | FROM c),
        |m AS (SELECT count(*) AS mm FROM pp),
        |r AS (SELECT key, p, row_number() OVER (ORDER BY p, key)
        |  AS rnk, mm FROM pp CROSS JOIN m),
        |f AS (SELECT *, p * CAST(mm AS DOUBLE) <=
        |  0.25 * CAST(rnk AS DOUBLE) AS cand FROM r),
        |k AS (SELECT max(CASE WHEN cand THEN rnk END) AS kmax FROM f)
        |SELECT key, p, CAST(rnk AS BIGINT) AS "rank",
        | 0.25 * CAST(rnk AS DOUBLE) / CAST(mm AS DOUBLE)
        |  AS bh_threshold,
        | coalesce(rnk <= kmax, false) AS rejected
        |FROM f CROSS JOIN k ORDER BY "rank"""".stripMargin,

    "q296_cuped" ->
      """WITH uu AS (SELECT o_orderkey, o_totalprice,
        |  ((((o_orderkey % 2147483647) * 48271) % 2147483647)
        |   * 48271) % 2147483647 + 1 AS u FROM orders),
        |b AS (SELECT CASE o_orderkey % 3 WHEN 0 THEN 'a'
        |   WHEN 1 THEN 'b' ELSE 'c' END AS variant,
        |  CAST(floor(CAST(o_totalprice AS DOUBLE) * 1000000.0 + 0.5)
        |   AS BIGINT) AS y,
        |  CAST(floor((CAST(o_totalprice AS DOUBLE) / 2.0 +
        |    CAST(u % 1000 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |   AS x
        | FROM uu),
        |pool AS (SELECT count(*) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |   AS sxx,
        |  sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |   AS sxy
        | FROM b),
        |pv AS (SELECT variant, count(*) AS nv,
        |  CAST(sum(y) AS BIGINT) AS syv, CAST(sum(x) AS BIGINT) AS sxv
        | FROM b GROUP BY variant),
        |j AS (SELECT *,
        |  CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) -
        |   CAST(CAST(sx AS VARCHAR) AS DOUBLE) *
        |   CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS varx
        | FROM pv CROSS JOIN pool),
        |t AS (SELECT *, CASE WHEN varx = 0.0 THEN NULL
        |  ELSE (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
        |    - CAST(CAST(sx AS VARCHAR) AS DOUBLE) *
        |      CAST(CAST(sy AS VARCHAR) AS DOUBLE)) / varx END AS theta,
        |  CAST(CAST(syv AS VARCHAR) AS DOUBLE) /
        |   (CAST(nv AS DOUBLE) * 1000000.0) AS mean_metric,
        |  CAST(CAST(sxv AS VARCHAR) AS DOUBLE) /
        |   (CAST(nv AS DOUBLE) * 1000000.0) AS mxv,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) /
        |   (CAST(n AS DOUBLE) * 1000000.0) AS mxa
        | FROM j)
        |SELECT variant, nv AS n, mean_metric, theta,
        | CASE WHEN theta IS NULL THEN mean_metric
        |  ELSE mean_metric - theta * (mxv - mxa) END AS adjusted_mean
        |FROM t ORDER BY variant""".stripMargin,

    "q297_theil" ->
      """WITH cr AS (SELECT o_orderpriority AS grp, o_custkey,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   AS BIGINT) AS x
        | FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT grp, count(*) AS n, CAST(sum(x) AS BIGINT) AS t
        | FROM cr WHERE x > 0 GROUP BY grp),
        |c AS (SELECT cr.grp, st.n, st.t,
        |  CAST(floor((CAST(x AS DOUBLE) / CAST(t AS DOUBLE)) *
        |    round(ln((CAST(x AS DOUBLE) / CAST(t AS DOUBLE)) *
        |     CAST(n AS DOUBLE)), 9) * 1000000000000.0 + 0.5)
        |   AS BIGINT) AS pq
        | FROM cr JOIN st ON st.grp = cr.grp WHERE x > 0)
        |SELECT grp AS "group", max(n) AS n, max(t) AS total,
        | round(CAST(sum(pq) AS DOUBLE) / 1000000000000.0, 9) AS theil,
        | CASE WHEN max(n) <= 1 THEN NULL
        |  ELSE round((CAST(sum(pq) AS DOUBLE) / 1000000000000.0) /
        |   round(ln(CAST(max(n) AS DOUBLE)), 9), 9) END AS theil_norm
        |FROM c GROUP BY grp ORDER BY "group"""".stripMargin,

    "q298_lorenz" ->
      """WITH cr AS (SELECT o_custkey AS id,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   AS BIGINT) AS y
        | FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |r AS (SELECT id, y, row_number() OVER (ORDER BY y, id) AS g
        | FROM cr WHERE y >= 0),
        |s AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS t
        | FROM cr WHERE y >= 0),
        |pts AS (SELECT p FROM range(1, 11) t(p))
        |SELECT p AS point, CAST(p AS DOUBLE) / 10.0 AS pop_share,
        | CAST(sum(CASE WHEN g * 10 <= n * p THEN 1 ELSE 0 END)
        |  AS BIGINT) AS units,
        | CAST(sum(CASE WHEN g * 10 <= n * p THEN y ELSE 0 END)
        |  AS BIGINT) AS cum_value,
        | CAST(CAST(CAST(sum(CASE WHEN g * 10 <= n * p THEN y ELSE 0
        |   END) AS BIGINT) AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(t AS VARCHAR) AS DOUBLE) AS value_share
        |FROM r CROSS JOIN s CROSS JOIN pts
        |GROUP BY p, n, t ORDER BY point""".stripMargin,

    "str299_stream_histogram" ->
      """WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS v
        | FROM orders WHERE o_totalprice IS NOT NULL),
        |b AS (SELECT CAST(least(greatest(floor((v - 0.0) / 6000.0), 0),
        |   99) AS BIGINT) AS bin, count(*) AS n FROM v GROUP BY 1),
        |c AS (SELECT bin, n, CAST(sum(n) OVER (ORDER BY bin
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS cum FROM b),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM b),
        |qs(quantile, qm) AS (VALUES (0.5, 500000), (0.9, 900000),
        |  (0.99, 990000)),
        |pick AS (SELECT quantile, min(bin) AS bin
        | FROM c CROSS JOIN t JOIN qs ON
        |  CAST(cum AS DECIMAL(19,0)) * CAST(1000000 AS DECIMAL(19,0))
        |   >= CAST(qm AS DECIMAL(19,0)) * CAST(nn AS DECIMAL(19,0))
        | GROUP BY quantile)
        |SELECT CAST(p.quantile AS DOUBLE) AS quantile, p.bin,
        | 0.0 + CAST(p.bin AS DOUBLE) * 6000.0 AS bin_lo,
        | 0.0 + (CAST(p.bin AS DOUBLE) + 1.0) * 6000.0 AS bin_hi,
        | c.cum AS cum, t.nn AS n
        |FROM pick p JOIN c ON c.bin = p.bin CROSS JOIN t
        |ORDER BY quantile""".stripMargin,

    "m300_aspect_buckets" ->
      """WITH d AS (SELECT doc_id,
        |  200 + (doc_id * 37) % 1800 AS w,
        |  200 + (doc_id * 53) % 1000 AS h
        | FROM documents WHERE doc_id < 2000),
        |bk(idx, bw, bh, m) AS (VALUES (0, 1, 1, 144), (1, 4, 3, 48),
        |  (2, 3, 4, 36), (3, 16, 9, 16), (4, 9, 16, 9)),
        |k AS (SELECT doc_id, idx, bw, bh,
        |  abs(w * bh - bw * h) * m AS kk FROM d CROSS JOIN bk),
        |a AS (SELECT * FROM (SELECT *, row_number() OVER (
        |   PARTITION BY doc_id ORDER BY kk, idx) AS rn FROM k)
        | WHERE rn = 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY idx
        |  ORDER BY doc_id) - 1 AS local0 FROM a)
        |SELECT bw AS bucket_w, bh AS bucket_h,
        | CAST((local0 - local0 % 32) / 32 AS BIGINT) AS batch_idx,
        | count(*) AS n
        |FROM r GROUP BY 1, 2, 3
        |ORDER BY bucket_w, bucket_h, batch_idx""".stripMargin,

    "t301_readability" ->
      """WITH b AS (SELECT doc_id, text,
        |  CAST(len(list_filter(string_split(text, ' '),
        |   x -> x <> '')) AS BIGINT) AS n_words,
        |  greatest(
        |   CAST((length(text) - length(replace(text, '.', ''))) +
        |    (length(text) - length(replace(text, '!', ''))) +
        |    (length(text) - length(replace(text, '?', '')))
        |    AS BIGINT), 1) AS n_sentences,
        |  regexp_replace(lower(text), '[aeiouy]+', 'V', 'g') AS cv
        | FROM documents WHERE doc_id < 500)
        |SELECT doc_id, n_words, n_sentences,
        | CAST(length(cv) - length(replace(cv, 'V', '')) AS BIGINT)
        |  AS n_syllables,
        | CASE WHEN n_words = 0 THEN NULL
        |  ELSE round(206.835 -
        |   1.015 * (CAST(n_words AS DOUBLE) /
        |    CAST(n_sentences AS DOUBLE)) -
        |   84.6 * (CAST(length(cv) - length(replace(cv, 'V', ''))
        |     AS DOUBLE) / CAST(n_words AS DOUBLE)), 6) END AS flesch
        |FROM b ORDER BY doc_id""".stripMargin,

    "q302_cohort_ltv" ->
      """WITH ev AS (SELECT user_id, ts,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        | FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
        | FROM ev GROUP BY user_id),
        |r AS (SELECT ev.user_id, f.cohort,
        |  CAST(floor(date_diff('day', f.cohort,
        |    date_trunc('week', ev.ts)) / 7.0) AS BIGINT) AS off,
        |  ev.cents
        | FROM ev JOIN f ON ev.user_id = f.user_id),
        |g AS (SELECT cohort, off, count(DISTINCT user_id) AS payers,
        |  CAST(sum(cents) AS BIGINT) AS rev
        | FROM r GROUP BY 1, 2),
        |s AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY 1),
        |c AS (SELECT g.*, CAST(sum(g.rev) OVER (PARTITION BY g.cohort
        |   ORDER BY g.off ROWS BETWEEN UNBOUNDED PRECEDING AND
        |   CURRENT ROW) AS BIGINT) AS cum
        | FROM g)
        |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
        | c.off AS "offset", CAST(c.payers AS BIGINT) AS payers,
        | c.rev AS revenue_cents, c.cum AS cum_revenue_cents,
        | CAST(s.cohort_size AS BIGINT) AS cohort_size,
        | CAST(CAST(c.cum AS VARCHAR) AS DOUBLE) /
        |  (CAST(s.cohort_size AS DOUBLE) * 100.0) AS ltv
        |FROM c JOIN s ON c.cohort = s.cohort
        |ORDER BY cohort_week, "offset"""".stripMargin,

    "q303_schema_drift" -> Seq("o_custkey", "o_orderstatus",
        "o_orderpriority").map { c =>
      s"""SELECT '$c' AS col_name,
         | a.n AS n_a, a.nul AS nulls_a, a.d AS distinct_a,
         | b.n AS n_b, b.nul AS nulls_b, b.d AS distinct_b,
         | CASE WHEN a.n = 0 THEN NULL ELSE CAST(a.nul AS DOUBLE) /
         |  CAST(a.n AS DOUBLE) END AS null_rate_a,
         | CASE WHEN b.n = 0 THEN NULL ELSE CAST(b.nul AS DOUBLE) /
         |  CAST(b.n AS DOUBLE) END AS null_rate_b,
         | CASE WHEN a.d = 0 THEN NULL ELSE CAST(b.d AS DOUBLE) /
         |  CAST(a.d AS DOUBLE) END AS distinct_ratio
         |FROM (SELECT count(*) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS nul, count(DISTINCT $c) AS d
         | FROM orders WHERE o_orderkey % 2 = 0) a
         |CROSS JOIN (SELECT count(*) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS nul, count(DISTINCT $c) AS d
         | FROM orders WHERE o_orderkey % 2 = 1) b""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    "str304_stream_psi" ->
      """WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS price,
        |  o_orderkey AS ok FROM orders WHERE o_totalprice IS NOT NULL),
        |rn AS (SELECT CAST(least(greatest(floor((price - 0.0) /
        |    30000.0), 0), 19) AS BIGINT) AS bin, count(*) AS ref_n
        | FROM v WHERE ok % 2 = 0 GROUP BY 1),
        |cn AS (SELECT CAST(least(greatest(floor((price - 0.0) /
        |    30000.0), 0), 19) AS BIGINT) AS bin, count(*) AS cur_n
        | FROM v GROUP BY 1),
        |j AS (SELECT coalesce(rn.bin, cn.bin) AS bin,
        |  coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
        | FROM rn FULL OUTER JOIN cn ON rn.bin = cn.bin),
        |s AS (SELECT bin, ref_n, cur_n,
        |  CAST(ref_n AS DOUBLE) / CAST(sum(ref_n) OVER () AS DOUBLE)
        |   AS ref_share,
        |  CAST(cur_n AS DOUBLE) / CAST(sum(cur_n) OVER () AS DOUBLE)
        |   AS cur_share
        | FROM j)
        |SELECT bin, CAST(ref_n AS BIGINT) AS ref_n,
        | CAST(cur_n AS BIGINT) AS cur_n, ref_share, cur_share,
        | CASE WHEN ref_n > 0 AND cur_n > 0
        |  THEN (cur_share - ref_share) * ln(cur_share / ref_share)
        | END AS psi_part
        |FROM s ORDER BY bin""".stripMargin,

    "q305_power_mde" ->
      """WITH c AS (SELECT CASE o_orderkey % 3 WHEN 0 THEN 'control'
        |   WHEN 1 THEN 't1' ELSE 't2' END AS variant,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS conv
        | FROM orders GROUP BY 1),
        |k AS (SELECT n AS n0, conv AS c0 FROM c
        | WHERE variant = 'control')
        |SELECT variant, CAST(n AS BIGINT) AS n, conv,
        | CASE WHEN n = 0 THEN NULL
        |  ELSE CAST(conv AS DOUBLE) / CAST(n AS DOUBLE) END AS rate,
        | CASE WHEN variant <> 'control' AND n0 > 0 AND n > 0
        |   AND c0 > 0 AND c0 < n0
        |  THEN 2.8015852181129683 * sqrt(
        |   (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)) *
        |   (1.0 - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)) *
        |   (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n AS DOUBLE)))
        | END AS mde_abs,
        | CASE WHEN variant <> 'control' AND n0 > 0 AND n > 0
        |   AND c0 > 0 AND c0 < n0
        |  THEN (2.8015852181129683 * sqrt(
        |   (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)) *
        |   (1.0 - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)) *
        |   (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n AS DOUBLE)))) /
        |   (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        | END AS mde_rel
        |FROM c CROSS JOIN k ORDER BY variant""".stripMargin,

    "q306_session_stats" ->
      """WITH flagged AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |  THEN 1 ELSE 0 END AS new_s
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, ts,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM flagged),
        |per AS (SELECT user_id, sid, count(*) AS n,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS durus
        | FROM sess GROUP BY user_id, sid)
        |SELECT count(*) AS n_sessions,
        | count(DISTINCT user_id) AS n_entities,
        | CAST(sum(n) AS BIGINT) AS n_events,
        | CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS bounce_sessions,
        | CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        |  CAST(count(*) AS DOUBLE) AS bounce_rate,
        | CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  AS mean_events,
        | CAST(CAST(CAST(sum(durus) AS BIGINT) AS VARCHAR) AS DOUBLE) /
        |  (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean_duration_secs
        |FROM per""".stripMargin,

    // the manifest-upsert snapshot's final state IS the batch hourly
    // aggregate — the merge-across-batches is what the gate tests
    "str336_stream_upsert_manifest" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d') AS dy,
        | strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hr,
        | event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events
        |WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY hr, event_type""".stripMargin,

    // str335's oracle is q331's exactly: the streamed MAX-merge state
    // over the union of all batches IS the batch freshness input
    "str335_stream_freshness" ->
      """WITH g AS (SELECT event_type AS grp,
        |  CAST(count(*) AS BIGINT) AS n, max(ts) AS mts
        | FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |l AS (SELECT grp, n,
        |  strftime(mts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        |  CAST(floor(CAST(epoch_us(TIMESTAMP '2024-02-01 00:00:00') -
        |    epoch_us(mts) AS DOUBLE) / 1000000.0) AS BIGINT)
        |   AS lag_seconds
        | FROM g)
        |SELECT grp AS "group", n, last_ts, lag_seconds,
        | (lag_seconds IS NULL OR lag_seconds > 88000) AS stale
        |FROM l ORDER BY 1""".stripMargin,

    "q331_freshness" ->
      """WITH g AS (SELECT event_type AS grp,
        |  CAST(count(*) AS BIGINT) AS n, max(ts) AS mts
        | FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |l AS (SELECT grp, n,
        |  strftime(mts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        |  CAST(floor(CAST(epoch_us(TIMESTAMP '2024-02-01 00:00:00') -
        |    epoch_us(mts) AS DOUBLE) / 1000000.0) AS BIGINT)
        |   AS lag_seconds
        | FROM g)
        |SELECT grp AS "group", n, last_ts, lag_seconds,
        | (lag_seconds IS NULL OR lag_seconds > 88000) AS stale
        |FROM l ORDER BY 1""".stripMargin,

    "q327_cohen_kappa" ->
      """WITH b AS (SELECT o_orderstatus AS a,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'X'
        |   ELSE o_orderstatus END AS b FROM orders),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
        |   AS agree FROM b),
        |m AS (SELECT k,
        |  CAST(sum(CASE WHEN r = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS na,
        |  CAST(sum(CASE WHEN r = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS nb
        | FROM (SELECT a AS k, 'a' AS r FROM b
        |  UNION ALL SELECT b, 'b' FROM b) GROUP BY k),
        |pe AS (SELECT sum(CAST(na AS HUGEINT) * CAST(nb AS HUGEINT))
        |  AS p FROM m)
        |SELECT n, agree,
        | CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS p_o,
        | CAST(p AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |  AS p_e,
        | CASE WHEN CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - p = 0
        |  THEN NULL
        |  ELSE CAST(CAST(n AS HUGEINT) * CAST(agree AS HUGEINT) - p
        |    AS DOUBLE) /
        |   CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - p AS DOUBLE)
        |  END AS kappa
        |FROM ag CROSS JOIN pe""".stripMargin,

    "q325_forecast_accuracy" ->
      """WITH b AS (SELECT event_type AS series, ts,
        |  CAST(floor("value" * 1000000 + 0.5) AS BIGINT) AS a,
        |  CAST(floor(("value" * 0.9 + 5.0) * 1000000 + 0.5) AS BIGINT)
        |   AS f
        | FROM events
        | WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  AND "value" IS NOT NULL AND NOT isnan("value")),
        |w AS (SELECT series, a, f,
        |  lag(a) OVER (PARTITION BY series ORDER BY ts, a, f) AS prev
        | FROM b),
        |s AS (SELECT series,
        |  CAST(count(*) AS BIGINT) AS n,
        |  sum(abs(a - f)) AS ae,
        |  sum(CAST(a - f AS HUGEINT) * CAST(a - f AS HUGEINT)) AS se,
        |  sum(CASE WHEN prev IS NOT NULL THEN abs(a - prev)
        |   ELSE 0 END) AS ne,
        |  CAST(sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS nn
        | FROM w GROUP BY 1)
        |SELECT series, n,
        | CAST(ae AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mae,
        | sqrt(CAST(se AS DOUBLE) / CAST(n AS DOUBLE)) / 1000000.0
        |  AS rmse,
        | CASE WHEN nn > 0 AND ne > 0 THEN
        |  (CAST(ae AS DOUBLE) / CAST(n AS DOUBLE)) /
        |   (CAST(ne AS DOUBLE) / CAST(nn AS DOUBLE)) END AS mase
        |FROM s ORDER BY series""".stripMargin,

    "q323_path_transitions" ->
      """WITH b AS (SELECT user_id AS k, ts, event_type AS s
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type IS NOT NULL),
        |w AS (SELECT k, s,
        |  lag(s) OVER (PARTITION BY k ORDER BY ts, s) AS prev,
        |  lead(s) OVER (PARTITION BY k ORDER BY ts, s) AS next
        | FROM b),
        |t AS (SELECT coalesce(prev, '__start') AS "from", s AS "to"
        |  FROM w
        | UNION ALL
        | SELECT s, '__end' FROM w WHERE next IS NULL),
        |c AS (SELECT "from", "to", CAST(count(*) AS BIGINT) AS n
        | FROM t GROUP BY 1, 2)
        |SELECT "from", "to", n,
        | CAST(n AS DOUBLE) /
        |  CAST(sum(n) OVER (PARTITION BY "from") AS DOUBLE) AS prob
        |FROM c ORDER BY 1, 2""".stripMargin,

    "q317_table_diff" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |  o_orderstatus AS st FROM orders WHERE o_orderkey % 4 <> 0),
        |a AS (SELECT o_orderkey AS k,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) +
        |   CASE WHEN o_orderkey % 8 = 2 THEN 1 ELSE 0 END AS cents,
        |  o_orderstatus AS st FROM orders WHERE o_orderkey % 4 <> 1),
        |j AS (SELECT b.k AS bk, a.k AS ak, b.cents AS bc, a.cents AS ac,
        |  b.st AS bs, a.st AS ast
        | FROM b FULL OUTER JOIN a ON b.k = a.k),
        |s AS (SELECT
        |  CAST(count(bk) AS BIGINT) AS nb,
        |  CAST(count(ak) AS BIGINT) AS na,
        |  CAST(sum(CASE WHEN bk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS added,
        |  CAST(sum(CASE WHEN ak IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS removed,
        |  CAST(sum(CASE WHEN bk IS NOT NULL AND ak IS NOT NULL AND
        |   (bc IS DISTINCT FROM ac OR bs IS DISTINCT FROM ast)
        |   THEN 1 ELSE 0 END) AS BIGINT) AS chg,
        |  CAST(sum(CASE WHEN bk IS NOT NULL AND ak IS NOT NULL AND
        |   bc IS DISTINCT FROM ac THEN 1 ELSE 0 END) AS BIGINT)
        |   AS c_cents,
        |  CAST(sum(CASE WHEN bk IS NOT NULL AND ak IS NOT NULL AND
        |   bs IS DISTINCT FROM ast THEN 1 ELSE 0 END) AS BIGINT)
        |   AS c_st
        | FROM j)
        |SELECT col_name, nb AS n_before, na AS n_after, added, removed,
        | chg AS changed_any,
        | CASE col_name WHEN 'cents' THEN c_cents ELSE c_st END
        |  AS changed_in_col
        |FROM s CROSS JOIN (SELECT unnest(['cents', 'st']) AS col_name)
        |ORDER BY col_name""".stripMargin,

    "q318_lift_curve" ->
      """WITH b AS (SELECT o_orderkey AS id,
        |  CAST(o_orderkey * 37 % 1000 AS DOUBLE) / 1000.0 AS s,
        |  (o_totalprice > 250000.0) AS y FROM orders),
        |r AS (SELECT id, y,
        |  row_number() OVER (ORDER BY s DESC, id ASC) AS grank,
        |  count(*) OVER () AS nt,
        |  sum(CASE WHEN y THEN 1 ELSE 0 END) OVER () AS pt FROM b),
        |g AS (SELECT CAST(ceil(CAST(grank AS DOUBLE) * 10 /
        |   CAST(nt AS DOUBLE)) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
        |   AS positives,
        |  CAST(max(nt) AS BIGINT) AS nt, CAST(max(pt) AS BIGINT) AS pt
        | FROM r GROUP BY 1),
        |c AS (SELECT bucket, n, positives,
        |  CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n,
        |  CAST(sum(positives) OVER (ORDER BY bucket) AS BIGINT)
        |   AS cum_pos, nt, pt FROM g)
        |SELECT bucket, n, positives, cum_n, cum_pos,
        | CASE WHEN pt > 0 THEN CAST(cum_pos AS DOUBLE) /
        |  CAST(pt AS DOUBLE) END AS capture,
        | CASE WHEN pt > 0 AND cum_n > 0 THEN
        |  CAST(cum_pos * nt AS DOUBLE) / CAST(cum_n * pt AS DOUBLE)
        |  END AS lift
        |FROM c ORDER BY bucket""".stripMargin,

    "q307_ref_integrity" ->
      """WITH c AS (SELECT l_orderkey AS k FROM lineitem),
        |t AS (SELECT count(*) AS child_rows,
        |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS null_key_rows FROM c),
        |p AS (SELECT DISTINCT o_orderkey AS pk FROM orders
        | WHERE o_orderkey % 7 <> 0 AND o_orderkey IS NOT NULL),
        |o AS (SELECT count(*) AS orphan_rows,
        |  count(DISTINCT k) AS orphan_keys
        | FROM c WHERE k IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM p WHERE p.pk = c.k))
        |SELECT t.child_rows, t.null_key_rows, o.orphan_rows,
        | o.orphan_keys,
        | CASE WHEN t.child_rows = 0 THEN NULL
        |  ELSE CAST(o.orphan_rows AS DOUBLE) /
        |   CAST(t.child_rows AS DOUBLE) END AS orphan_rate
        |FROM t CROSS JOIN o""".stripMargin,

    "q308_pr_curve" ->
      s"""WITH $ClsEvalFixtureSql,
        |b AS (SELECT least(CAST(floor(v * 20) AS BIGINT), 19) AS bin,
        |  count(*) AS n, sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos
        | FROM fx GROUP BY 1),
        |g AS (SELECT i AS bin FROM range(0, 20) t(i)),
        |j AS (SELECT g.bin, coalesce(b.n, 0) AS n,
        |  coalesce(b.pos, 0) AS pos
        | FROM g LEFT JOIN b ON b.bin = g.bin),
        |c AS (SELECT bin,
        |  CAST(sum(pos) OVER (ORDER BY bin DESC ROWS BETWEEN
        |   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |  CAST(sum(n) OVER (ORDER BY bin DESC ROWS BETWEEN
        |   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn,
        |  CAST(sum(pos) OVER () AS BIGINT) AS totpos
        | FROM j)
        |SELECT CAST(bin AS DOUBLE) / 20.0 AS threshold, tp,
        | cumn - tp AS fp, totpos - tp AS fn,
        | CASE WHEN cumn = 0 THEN NULL
        |  ELSE CAST(tp AS DOUBLE) / CAST(cumn AS DOUBLE)
        | END AS "precision",
        | CASE WHEN totpos = 0 THEN NULL
        |  ELSE CAST(tp AS DOUBLE) / CAST(totpos AS DOUBLE)
        | END AS recall,
        | CASE WHEN tp + tp + (cumn - tp) + (totpos - tp) = 0 THEN NULL
        |  ELSE CAST(tp + tp AS DOUBLE) /
        |   CAST(tp + tp + (cumn - tp) + (totpos - tp) AS DOUBLE)
        | END AS f1
        |FROM c ORDER BY threshold""".stripMargin,

    "q309_category_drift" ->
      """WITH da AS (SELECT DISTINCT o_orderpriority AS v FROM orders
        | WHERE o_orderkey % 2 = 0 AND o_orderpriority IS NOT NULL),
        |db AS (SELECT DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
        |   THEN '1-TOP' ELSE o_orderpriority END AS v FROM orders
        | WHERE o_orderkey % 2 = 1 AND o_orderpriority IS NOT NULL),
        |j AS (SELECT da.v AS va, db.v AS vb
        | FROM da FULL OUTER JOIN db ON da.v = db.v)
        |SELECT
        | CAST(sum(CASE WHEN va IS NOT NULL THEN 1 ELSE 0 END)
        |  AS BIGINT) AS distinct_a,
        | CAST(sum(CASE WHEN vb IS NOT NULL THEN 1 ELSE 0 END)
        |  AS BIGINT) AS distinct_b,
        | CAST(sum(CASE WHEN va IS NOT NULL AND vb IS NOT NULL
        |  THEN 1 ELSE 0 END) AS BIGINT) AS shared,
        | CAST(sum(CASE WHEN va IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  AS new_in_b,
        | CAST(sum(CASE WHEN vb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  AS lost_from_a,
        | CAST(sum(CASE WHEN va IS NOT NULL AND vb IS NOT NULL
        |   THEN 1 ELSE 0 END) AS DOUBLE) /
        |  CAST(sum(CASE WHEN va IS NOT NULL THEN 1 ELSE 0 END) +
        |   sum(CASE WHEN vb IS NOT NULL THEN 1 ELSE 0 END) -
        |   sum(CASE WHEN va IS NOT NULL AND vb IS NOT NULL
        |    THEN 1 ELSE 0 END) AS DOUBLE) AS jaccard
        |FROM j""".stripMargin,

    "q310_palma" ->
      """WITH cr AS (SELECT o_custkey AS id,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   AS BIGINT) AS y
        | FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |r AS (SELECT id, y, row_number() OVER (ORDER BY y, id) AS g
        | FROM cr WHERE y >= 0),
        |s AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS t
        | FROM cr WHERE y >= 0),
        |a AS (SELECT max(n) AS n, max(t) AS total,
        |  CAST(sum(CASE WHEN g * 10 <= n * 4 THEN y ELSE 0 END)
        |   AS BIGINT) AS b40,
        |  CAST(sum(CASE WHEN g * 10 > n * 9 THEN y ELSE 0 END)
        |   AS BIGINT) AS t10
        | FROM r CROSS JOIN s)
        |SELECT n, total, b40 AS bottom40_value, t10 AS top10_value,
        | CAST(CAST(b40 AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(total AS VARCHAR) AS DOUBLE) AS bottom40_share,
        | CAST(CAST(t10 AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(total AS VARCHAR) AS DOUBLE) AS top10_share,
        | CASE WHEN b40 = 0 THEN NULL
        |  ELSE CAST(CAST(t10 AS VARCHAR) AS DOUBLE) /
        |   CAST(CAST(b40 AS VARCHAR) AS DOUBLE) END AS palma
        |FROM a""".stripMargin,

    "t286_js_divergence" ->
      """WITH posts AS (
        | SELECT s, t, count(*) AS n FROM (
        |  SELECT source AS s, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE source IS NOT NULL)
        | WHERE t <> '' GROUP BY s, t),
        |tot AS (SELECT s, CAST(sum(n) AS BIGINT) AS nn
        | FROM posts GROUP BY s),
        |pr AS (SELECT a.s AS sa, b.s AS sb, a.n AS an, b.n AS bn,
        |  ta.nn AS na, tb.nn AS nb,
        |  CAST(a.n AS DOUBLE) / CAST(ta.nn AS DOUBLE) AS p,
        |  CAST(b.n AS DOUBLE) / CAST(tb.nn AS DOUBLE) AS q
        | FROM posts a JOIN posts b ON a.t = b.t AND a.s < b.s
        |  JOIN tot ta ON ta.s = a.s JOIN tot tb ON tb.s = b.s),
        |c AS (SELECT sa, sb, count(*) AS n_shared_terms,
        |  sum(CAST(floor(p * round(ln(p / ((p + q) / 2.0)), 9)
        |   * 1000000000000.0 + 0.5) AS BIGINT)) AS sa9,
        |  sum(CAST(floor(q * round(ln(q / ((p + q) / 2.0)), 9)
        |   * 1000000000000.0 + 0.5) AS BIGINT)) AS sb9,
        |  CAST(sum(an) AS BIGINT) AS sha, CAST(sum(bn) AS BIGINT) AS shb,
        |  max(na) AS na, max(nb) AS nb
        | FROM pr GROUP BY sa, sb)
        |SELECT sa AS source_a, sb AS source_b, n_shared_terms,
        | round(
        |  0.5 * (CAST(sa9 AS DOUBLE) / 1000000000000.0 + ln(2.0) *
        |   (1.0 - CAST(sha AS DOUBLE) / CAST(na AS DOUBLE))) +
        |  0.5 * (CAST(sb9 AS DOUBLE) / 1000000000000.0 + ln(2.0) *
        |   (1.0 - CAST(shb AS DOUBLE) / CAST(nb AS DOUBLE))), 9) AS js
        |FROM c ORDER BY source_a, source_b""".stripMargin,

    "q287_ess" ->
      """WITH g AS (
        | SELECT lang AS "group", count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sw,
        |  sum(CAST(n_chars AS DECIMAL(19,0)) *
        |   CAST(n_chars AS DECIMAL(19,0))) AS sww
        | FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        | GROUP BY lang)
        |SELECT "group", n, sw AS sum_weight,
        | CAST(CAST(CAST(sw AS DECIMAL(19,0)) * CAST(sw AS DECIMAL(19,0))
        |   AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(sww AS VARCHAR) AS DOUBLE) AS ess,
        | CAST(n AS DOUBLE) * CAST(CAST(sww AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(CAST(sw AS DECIMAL(19,0)) * CAST(sw AS DECIMAL(19,0))
        |   AS VARCHAR) AS DOUBLE) AS deff
        |FROM g ORDER BY "group"""".stripMargin,

    "t282_lexical_diversity" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS t
        | FROM documents WHERE doc_id < 1000),
        |tf AS (SELECT doc_id, t, count(*) AS n FROM toks
        | WHERE t <> '' GROUP BY doc_id, t)
        |SELECT doc_id AS id, CAST(sum(n) AS BIGINT) AS n_tokens,
        | count(*) AS n_types,
        | CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS ttr,
        | CAST(count(*) AS DOUBLE) / sqrt(CAST(sum(n) AS DOUBLE))
        |  AS root_ttr
        |FROM tf GROUP BY doc_id
        |ORDER BY id""".stripMargin,

    "t283_hapax_rate" ->
      """WITH toks AS (
        | SELECT source AS g, unnest(string_split(text, ' ')) AS t
        | FROM documents WHERE source IS NOT NULL),
        |tf AS (SELECT g, t, count(*) AS n FROM toks
        | WHERE t <> '' GROUP BY g, t)
        |SELECT g AS "group", CAST(sum(n) AS BIGINT) AS n_tokens,
        | count(*) AS n_types,
        | CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_hapax,
        | CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        |  CAST(count(*) AS DOUBLE) AS hapax_rate
        |FROM tf GROUP BY g
        |ORDER BY "group"""".stripMargin,

    "q284_interval_gaps" ->
      """WITH iv AS (
        | SELECT user_id, epoch_us(ts) AS s,
        |  epoch_us(ts) + 300000000 AS e
        | FROM events WHERE user_id IS NOT NULL),
        |m AS (SELECT user_id, s, e,
        |  max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        | FROM iv),
        |fl AS (SELECT user_id, s, e,
        |  CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni
        | FROM m),
        |isl AS (SELECT user_id, s, e,
        |  sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM fl),
        |seg AS (SELECT user_id, island, min(s) AS ss, max(e) AS ee
        | FROM isl GROUP BY user_id, island),
        |gap AS (SELECT user_id, ss - lag(ee) OVER (
        |  PARTITION BY user_id ORDER BY ss) AS g
        | FROM seg)
        |SELECT user_id AS key, count(g) AS n_gaps,
        | CAST(coalesce(sum(g), 0) AS BIGINT) AS gap_us,
        | max(g) AS max_gap_us
        |FROM gap GROUP BY user_id
        |ORDER BY key""".stripMargin,

    "str285_stream_benford" ->
      """WITH v AS (
        | SELECT event_type AS g,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        | FROM events
        | WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  AND NOT isnan(value)),
        |d AS (SELECT g,
        |  CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |  count(*) AS n
        | FROM v WHERE c > 0 GROUP BY g, digit),
        |grid AS (SELECT g, digit
        | FROM (SELECT DISTINCT g FROM d), unnest(range(1, 10)) AS u(digit)),
        |j AS (SELECT grid.g, grid.digit, coalesce(d.n, 0) AS n
        | FROM grid LEFT JOIN d ON d.g = grid.g AND d.digit = grid.digit),
        |t AS (SELECT g, CAST(sum(n) AS BIGINT) AS tot FROM d GROUP BY g)
        |SELECT j.g AS "group", j.digit, j.n,
        | CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
        | ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS expected,
        | (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) *
        |   (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))) *
        |  (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) *
        |   (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))) /
        |  (CAST(tot AS DOUBLE) *
        |   (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
        |  AS chi2_part
        |FROM j JOIN t ON t.g = j.g
        |ORDER BY "group", digit""".stripMargin,

    "m280_scene_cuts" ->
      """WITH meta AS (SELECT doc_id, octet_length(encode(text)) AS len,
        |  (doc_id * 131071 + octet_length(encode(text)) * 8191) % 1000003
        |   AS h
        | FROM documents WHERE doc_id < 300),
        |vids AS (SELECT doc_id,
        |  1 + (doc_id * 17 + len) % 300 AS n_frames,
        |  (doc_id * 97 + len * 13) % 60000 AS duration_ms
        | FROM meta WHERE h % 3 = 2),
        |frames AS (SELECT doc_id,
        |  CAST(ts_ms // 1000 AS INTEGER) AS frame_idx,
        |  ((doc_id * 1009 + ts_ms // (2000 + (doc_id % 3) * 1000))
        |    * 48271) % 2147483647 AS sig
        | FROM (SELECT doc_id,
        |   unnest(list_slice(generate_series(0, duration_ms, 1000), 1, 8))
        |    AS ts_ms
        |  FROM vids WHERE n_frames > 1)),
        |cuts AS (SELECT doc_id, frame_idx, sig,
        |  lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prv
        | FROM frames)
        |SELECT doc_id, count(*) AS n_frames,
        | CAST(sum(CASE WHEN prv IS NOT NULL AND sig <> prv
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
        | CAST(sum(CASE WHEN prv IS NOT NULL AND sig <> prv
        |  THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_scenes,
        | CAST(count(*) AS DOUBLE) /
        |  CAST(sum(CASE WHEN prv IS NOT NULL AND sig <> prv
        |   THEN 1 ELSE 0 END) + 1 AS DOUBLE) AS mean_scene_frames
        |FROM cuts GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q281_allocation" ->
      """WITH g AS (
        | SELECT lang AS key, CAST(sum(n_chars) AS BIGINT) AS w
        | FROM documents
        | WHERE n_chars IS NOT NULL AND n_chars >= 0
        | GROUP BY lang HAVING sum(n_chars) > 0),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM g),
        |b AS (SELECT key, w, (100000 * w) // tw AS base,
        |  (100000 * w) % tw AS rem FROM g CROSS JOIN t),
        |k AS (SELECT 100000 - sum(base) AS kk FROM b),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, key)
        |  AS rk FROM b)
        |SELECT key, w AS weight,
        | CAST(base + CASE WHEN rk <= kk THEN 1 ELSE 0 END AS BIGINT)
        |  AS allocation,
        | CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) AS share
        |FROM r CROSS JOIN k CROSS JOIN t
        |ORDER BY key""".stripMargin,

    "q277_degree_powerlaw" ->
      """WITH u AS (
        | SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        | FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        | WHERE x.l_orderkey % 5 = 0),
        |deg AS (SELECT id, count(*) AS d FROM (
        |  SELECT a AS id FROM u UNION ALL SELECT b FROM u)
        | GROUP BY id)
        |SELECT count(*) AS n_nodes,
        | CAST(sum(CASE WHEN d >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_tail,
        | CAST(3 AS BIGINT) AS dmin,
        | max(d) AS max_degree,
        | CASE WHEN sum(CASE WHEN d >= 3 THEN
        |   CAST(floor(ln(CAST(d AS DOUBLE) / 3.0) * 1000000000.0 + 0.5)
        |    AS BIGINT) ELSE 0 END) = 0 THEN NULL
        |  ELSE 1.0 + CAST(sum(CASE WHEN d >= 3 THEN 1 ELSE 0 END)
        |    AS DOUBLE) /
        |   (CAST(sum(CASE WHEN d >= 3 THEN
        |     CAST(floor(ln(CAST(d AS DOUBLE) / 3.0) * 1000000000.0 + 0.5)
        |      AS BIGINT) ELSE 0 END) AS DOUBLE) / 1000000000.0)
        | END AS alpha
        |FROM deg""".stripMargin,

    "q278_reciprocity" ->
      """WITH seqd AS (
        | SELECT l_orderkey, l_partkey,
        |  lead(l_partkey) OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_partkey) AS nxt
        | FROM lineitem),
        |e AS (SELECT DISTINCT l_partkey AS a, nxt AS b FROM seqd
        | WHERE nxt IS NOT NULL AND l_partkey <> nxt),
        |r AS (SELECT count(*) AS n_reciprocal FROM e x
        | WHERE EXISTS (SELECT 1 FROM e y
        |  WHERE y.a = x.b AND y.b = x.a)),
        |n AS (SELECT count(*) AS n_edges FROM e)
        |SELECT n_edges, n_reciprocal,
        | n_reciprocal // 2 AS n_mutual_dyads,
        | CASE WHEN n_edges = 0 THEN NULL
        |  ELSE CAST(n_reciprocal AS DOUBLE) / CAST(n_edges AS DOUBLE)
        | END AS reciprocity
        |FROM n CROSS JOIN r""".stripMargin,

    "q279_window_funnel" ->
      """WITH s1 AS (
        | SELECT user_id, min(ts) AS t1 FROM events
        | WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        | SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
        | FROM events e JOIN s1 ON e.user_id = s1.user_id
        | WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  AND e.ts <= s1.t1 + INTERVAL 3 DAY
        | GROUP BY e.user_id),
        |s3 AS (
        | SELECT e.user_id, min(e.ts) AS t3 FROM events e
        | JOIN s2 ON e.user_id = s2.user_id
        | WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  AND e.ts <= s2.t1 + INTERVAL 3 DAY
        | GROUP BY e.user_id),
        |c AS (SELECT (SELECT count(*) FROM s1) AS u1,
        |  (SELECT count(*) FROM s2) AS u2,
        |  (SELECT count(*) FROM s3) AS u3)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS step, CAST(u1 AS BIGINT) AS users,
        |  round(CAST(u1 AS DOUBLE) / u1, 6) AS conversion FROM c
        | UNION ALL SELECT CAST(2 AS BIGINT), CAST(u2 AS BIGINT),
        |  round(CAST(u2 AS DOUBLE) / u1, 6) FROM c
        | UNION ALL SELECT CAST(3 AS BIGINT), CAST(u3 AS BIGINT),
        |  round(CAST(u3 AS DOUBLE) / u1, 6) FROM c) f
        |ORDER BY step""".stripMargin,

    "str276_stream_distinct" ->
      """SELECT event_type AS "group", count(*) AS n,
        | count(DISTINCT value) AS n_distinct
        |FROM events
        |WHERE event_type IS NOT NULL AND value IS NOT NULL
        | AND NOT isnan(value)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "str271_stream_median" ->
      """WITH vals AS (
        | SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
        | WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  AND NOT isnan(value)),
        |cnt AS (SELECT g, v, count(*) AS n FROM vals GROUP BY g, v),
        |cum AS (SELECT g, v, n,
        |  sum(n) OVER (PARTITION BY g ORDER BY v
        |   ROWS UNBOUNDED PRECEDING) AS cw,
        |  sum(n) OVER (PARTITION BY g) AS tot
        | FROM cnt),
        |sel AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY v)
        |  AS rk FROM cum WHERE cw + cw >= tot)
        |SELECT g AS "group", CAST(tot AS BIGINT) AS n, v AS median
        |FROM sel WHERE rk = 1 ORDER BY "group"""".stripMargin,
    "q199_triangles" ->
      """WITH u AS MATERIALIZED (
        | SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        | FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        | WHERE x.l_orderkey % 5 = 0),
        |e AS MATERIALIZED (SELECT a, b FROM u UNION SELECT b, a FROM u),
        |deg AS MATERIALIZED (
        | SELECT a AS id, count(*) AS degree FROM e GROUP BY a),
        |tri AS MATERIALIZED (
        | SELECT e1.a AS id, CAST(count(*) / 2 AS BIGINT) AS t
        | FROM e e1 JOIN e e2 ON e2.a = e1.b AND e2.b <> e1.a
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        | GROUP BY e1.a)
        |SELECT d.id, d.degree, coalesce(t.t, 0) AS triangles,
        | round(CASE WHEN d.degree >= 2
        |  THEN 2.0 * coalesce(t.t, 0)
        |   / CAST(d.degree * (d.degree - 1) AS DOUBLE)
        |  ELSE 0.0 END, 6) AS lcc
        |FROM deg d LEFT JOIN tri t ON t.id = d.id
        |ORDER BY d.id""".stripMargin,

    "q200_bfs_reach" ->
      """WITH u AS MATERIALIZED (
        | SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        | FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        | WHERE x.l_orderkey % 5 = 0),
        |e AS MATERIALIZED (
        | SELECT a AS src, b AS dst FROM u UNION SELECT b, a FROM u),
        |d0 AS MATERIALIZED (
        | SELECT DISTINCT p_partkey AS id, 0 AS hops FROM part
        | WHERE p_partkey % 97 = 0),
        |n1 AS MATERIALIZED (
        | SELECT DISTINCT e.dst AS id FROM e JOIN d0 ON e.src = d0.id
        | WHERE e.dst NOT IN (SELECT id FROM d0)),
        |d1 AS MATERIALIZED (
        | SELECT id, hops FROM d0 UNION ALL SELECT id, 1 FROM n1),
        |n2 AS MATERIALIZED (
        | SELECT DISTINCT e.dst AS id FROM e JOIN n1 ON e.src = n1.id
        | WHERE e.dst NOT IN (SELECT id FROM d1)),
        |d2 AS MATERIALIZED (
        | SELECT id, hops FROM d1 UNION ALL SELECT id, 2 FROM n2),
        |n3 AS MATERIALIZED (
        | SELECT DISTINCT e.dst AS id FROM e JOIN n2 ON e.src = n2.id
        | WHERE e.dst NOT IN (SELECT id FROM d2)),
        |d3 AS MATERIALIZED (
        | SELECT id, hops FROM d2 UNION ALL SELECT id, 3 FROM n3)
        |SELECT id, hops FROM d3 ORDER BY id""".stripMargin,

    "d201_golden_record" ->
      """WITH p AS MATERIALIZED (
        | SELECT doc_id, text, source FROM documents
        | UNION ALL
        | SELECT doc_id + 100000, text, 'mirror_a' FROM documents
        | UNION ALL
        | SELECT doc_id + 200000, text, 'mirror_a' FROM documents
        | WHERE doc_id % 3 = 0),
        |v AS MATERIALIZED (
        | SELECT text, source, count(*) AS n, min(doc_id) AS cid
        | FROM p GROUP BY text, source),
        |c AS (SELECT text, CAST(sum(n) AS BIGINT) AS members,
        |  count(*) AS n_sources, min(cid) AS canonical_id
        | FROM v GROUP BY text),
        |t AS (SELECT text, source, row_number() OVER (
        |  PARTITION BY text ORDER BY n DESC, source ASC) AS rn FROM v)
        |SELECT c.canonical_id, c.members, c.n_sources,
        | t.source AS top_source
        |FROM c JOIN t ON c.text = t.text AND t.rn = 1
        |ORDER BY canonical_id""".stripMargin,

    "q204_autocorr" ->
      """WITH dly AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket,
        |  sum(CAST(value AS DECIMAL(28,6))) AS v
        | FROM events GROUP BY series, bucket),
        |l AS (SELECT series, CAST(v AS DOUBLE) AS v,
        |  CAST(lag(v, 1) OVER w AS DOUBLE) AS l1,
        |  CAST(lag(v, 2) OVER w AS DOUBLE) AS l2,
        |  CAST(lag(v, 3) OVER w AS DOUBLE) AS l3
        | FROM dly WINDOW w AS (PARTITION BY series ORDER BY bucket))
        |SELECT series, count(v) AS n_days,
        | round(corr(v, l1), 6) AS acf1,
        | round(corr(v, l2), 6) AS acf2,
        | round(corr(v, l3), 6) AS acf3
        |FROM l GROUP BY series
        |ORDER BY series""".stripMargin,

    "t205_textrank" -> pageRankGeneralOracleSql(
      """SELECT a AS src, b AS dst, CAST(1.0 AS DOUBLE) AS w FROM (
        | SELECT DISTINCT t[i] AS a, t[i+1] AS b
        | FROM (SELECT string_split(text, ' ') AS t FROM documents) toks,
        |  unnest(range(1, len(t))) AS u(i)
        | WHERE t[i] <> '' AND t[i+1] <> '' AND t[i] <> t[i+1]) p
        |UNION
        |SELECT b, a, CAST(1.0 AS DOUBLE) FROM (
        | SELECT DISTINCT t[i] AS a, t[i+1] AS b
        | FROM (SELECT string_split(text, ' ') AS t FROM documents) toks,
        |  unnest(range(1, len(t))) AS u(i)
        | WHERE t[i] <> '' AND t[i+1] <> '' AND t[i] <> t[i+1]) q"""
        .stripMargin,
      """SELECT src AS id,
        | CAST(1.0 AS DOUBLE) /
        |  (SELECT CAST(count(DISTINCT src) AS DOUBLE) FROM e) AS t
        |FROM e GROUP BY src""".stripMargin,
      10,
      Some("SELECT id AS token, round(rank, 6) AS rank FROM pr10 " +
        "ORDER BY 2 DESC, 1 LIMIT 25")),

    "q206_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS group_size,
        | count(DISTINCT c_acctbal) AS sensitive_distinct
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |HAVING count(*) < 10 OR count(DISTINCT c_acctbal) < 3
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q202_connected_components" -> ccOracleSql(12),

    // same full-graph labels: the star-edge fold is semantics-neutral
    "q207_cc_increment" -> ccOracleSql(12),

    // streamed batches of the same graph → the same full-graph labels
    "str210_stream_components" -> ccOracleSql(12),

    "q212_exact_quantiles" ->
      """WITH r AS (
        | SELECT l_returnflag AS g, l_extendedprice AS v,
        |  row_number() OVER (PARTITION BY l_returnflag
        |   ORDER BY l_extendedprice, l_orderkey) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS n
        | FROM lineitem)
        |SELECT g AS l_returnflag, max(n) AS n,
        | max(CASE WHEN rn = greatest(1, CAST(ceil(
        |  CAST(0.5 AS DOUBLE) * n) AS BIGINT)) THEN v END) AS p50,
        | max(CASE WHEN rn = greatest(1, CAST(ceil(
        |  CAST(0.9 AS DOUBLE) * n) AS BIGINT)) THEN v END) AS p90,
        | max(CASE WHEN rn = greatest(1, CAST(ceil(
        |  CAST(0.99 AS DOUBLE) * n) AS BIGINT)) THEN v END) AS p99
        |FROM r GROUP BY g
        |ORDER BY g""".stripMargin,

    "q213_assoc_rules" ->
      """WITH posts AS (
        | SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        | WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |sz AS (SELECT b FROM posts GROUP BY b HAVING count(*) <= 256),
        |k AS (SELECT posts.b, posts.i FROM posts JOIN sz USING (b)),
        |tot AS (SELECT count(DISTINCT b) AS n FROM k),
        |f AS (SELECT i, count(*) AS ni FROM k GROUP BY i),
        |pr AS (SELECT a.i AS x, b.i AS y, count(*) AS n_baskets
        | FROM k a JOIN k b ON a.b = b.b AND a.i < b.i
        | GROUP BY a.i, b.i HAVING count(*) >= 2),
        |dir AS (SELECT x AS antecedent, y AS consequent, n_baskets
        |  FROM pr
        | UNION ALL
        | SELECT y AS antecedent, x AS consequent, n_baskets FROM pr),
        |sc AS (SELECT antecedent, consequent, n_baskets,
        |  CAST(n_baskets AS DOUBLE) / CAST(fa.ni AS DOUBLE)
        |   AS confidence,
        |  CAST(n_baskets * (SELECT n FROM tot) AS DOUBLE) /
        |   CAST(fa.ni * fc.ni AS DOUBLE) AS lift
        | FROM dir JOIN f fa ON fa.i = dir.antecedent
        |  JOIN f fc ON fc.i = dir.consequent)
        |SELECT antecedent, consequent, n_baskets, confidence, lift
        |FROM sc WHERE confidence >= 0.05
        |ORDER BY antecedent, consequent""".stripMargin,

    "q214_item_similarity" ->
      """WITH posts AS (
        | SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        | WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |sz AS (SELECT b FROM posts GROUP BY b HAVING count(*) <= 256),
        |k AS (SELECT posts.b, posts.i FROM posts JOIN sz USING (b)),
        |f AS (SELECT i, count(*) AS ni FROM k GROUP BY i),
        |pr AS (SELECT a.i AS x, b.i AS y, count(*) AS n_shared
        | FROM k a JOIN k b ON a.b = b.b AND a.i < b.i
        | GROUP BY a.i, b.i HAVING count(*) >= 2),
        |dir AS (SELECT x AS item, y AS neighbor, n_shared FROM pr
        | UNION ALL
        | SELECT y AS item, x AS neighbor, n_shared FROM pr),
        |sc AS (SELECT item, neighbor, n_shared,
        |  CAST(n_shared AS DOUBLE) / sqrt(CAST(fa.ni * fb.ni AS DOUBLE))
        |   AS cosine,
        |  CAST(n_shared AS DOUBLE) /
        |   CAST(fa.ni + fb.ni - n_shared AS DOUBLE) AS jaccard
        | FROM dir JOIN f fa ON fa.i = dir.item
        |  JOIN f fb ON fb.i = dir.neighbor),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY item
        |  ORDER BY cosine DESC, neighbor) AS rank FROM sc)
        |SELECT item, rank, neighbor, n_shared, cosine, jaccard
        |FROM rk WHERE rank <= 5
        |ORDER BY item, rank""".stripMargin,

    "d215_edit_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        | CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        | ON a.c_custkey < b.c_custkey
        | AND abs(length(a.c_name) - length(b.c_name)) <= 1
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "q216_sssp" ->
      """WITH u AS MATERIALIZED (
        | SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        | FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        | WHERE x.l_orderkey % 5 = 0),
        |e AS MATERIALIZED (
        | SELECT a AS src, b AS dst, 1 + (a + b) % 7 AS w FROM u
        | UNION ALL SELECT b, a, 1 + (a + b) % 7 FROM u),
        |d0 AS MATERIALIZED (
        | SELECT DISTINCT p_partkey AS id, CAST(0 AS BIGINT) AS dist
        | FROM part WHERE p_partkey % 97 = 0),
        |d1 AS MATERIALIZED (
        | SELECT id, min(dist) AS dist FROM (
        |  SELECT id, dist FROM d0
        |  UNION ALL
        |  SELECT e.dst, d0.dist + e.w FROM e JOIN d0 ON e.src = d0.id)
        | GROUP BY id),
        |d2 AS MATERIALIZED (
        | SELECT id, min(dist) AS dist FROM (
        |  SELECT id, dist FROM d1
        |  UNION ALL
        |  SELECT e.dst, d1.dist + e.w FROM e JOIN d1 ON e.src = d1.id)
        | GROUP BY id),
        |d3 AS MATERIALIZED (
        | SELECT id, min(dist) AS dist FROM (
        |  SELECT id, dist FROM d2
        |  UNION ALL
        |  SELECT e.dst, d2.dist + e.w FROM e JOIN d2 ON e.src = d2.id)
        | GROUP BY id)
        |SELECT id, CAST(dist AS BIGINT) AS dist FROM d3
        |ORDER BY id""".stripMargin,

    "q217_trend" ->
      """WITH dly AS (
        | SELECT o_orderpriority AS series,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(sum(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |   AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS y
        | FROM orders GROUP BY series, d),
        |f AS (SELECT series, min(d) AS first_day FROM dly
        | GROUP BY series),
        |p AS (SELECT dly.series, f.first_day,
        |  CAST(datediff('day', f.first_day, dly.d) AS DECIMAL(19,0))
        |   AS x, y
        | FROM dly JOIN f ON f.series = dly.series),
        |s AS (SELECT series, first_day,
        |  CAST(count(*) AS DECIMAL(18,0)) AS n,
        |  CAST(sum(x) AS DECIMAL(19,0)) AS sx,
        |  CAST(sum(y) AS DECIMAL(19,0)) AS sy,
        |  CAST(sum(x*y) AS DECIMAL(19,0)) AS sxy,
        |  CAST(sum(x*x) AS DECIMAL(19,0)) AS sxx,
        |  CAST(sum(y*y) AS DECIMAL(38,0)) AS syy
        | FROM p GROUP BY series, first_day)
        |SELECT series, CAST(n AS BIGINT) AS n_days, first_day,
        | CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) = 0 THEN NULL
        |  ELSE CAST(n*sxy - sx*sy AS DOUBLE)
        |   / CAST(n*sxx - sx*sx AS DOUBLE) END AS slope,
        | CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) = 0 OR
        |   CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0 THEN NULL
        |  ELSE CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
        |   / (CAST(n*sxx - sx*sx AS DOUBLE) *
        |      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS r2
        |FROM s ORDER BY series""".stripMargin,

    "q218_benford" ->
      """WITH v AS (
        | SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        | FROM lineitem),
        |d AS (SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
        |  AS digit, count(*) AS n
        | FROM v WHERE c > 0 GROUP BY digit),
        |digits AS (SELECT unnest(range(1, 10)) AS digit),
        |j AS (SELECT digits.digit, coalesce(d.n, 0) AS n
        | FROM digits LEFT JOIN d ON d.digit = digits.digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM j)
        |SELECT digit, n,
        | CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
        | ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS expected,
        | (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) *
        |   (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))) *
        |  (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) *
        |   (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))) /
        |  (CAST(tot AS DOUBLE) *
        |   (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
        |  AS chi2_part
        |FROM j, t ORDER BY digit""".stripMargin,

    "q219_link_predict" -> linkPredictOracleSql(256, minCommon = 3),

    "q220_xcorr" ->
      """WITH dly AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket,
        |  sum(CAST(value AS DECIMAL(28,6))) AS v
        | FROM events WHERE event_type IN ('view', 'purchase')
        | GROUP BY series, bucket),
        |x AS (SELECT bucket, CAST(v AS DOUBLE) AS xv FROM dly
        | WHERE series = 'purchase'),
        |y AS (SELECT bucket, CAST(v AS DOUBLE) AS yv FROM dly
        | WHERE series = 'view'),
        |l AS (SELECT unnest(range(0, 4)) AS lag),
        |j AS (SELECT l.lag, x.xv, y.yv
        | FROM x CROSS JOIN l
        | JOIN y ON y.bucket + CAST(l.lag AS INTEGER) = x.bucket)
        |SELECT 'purchase' AS series_x, 'view' AS series_y, lag,
        | count(*) AS n_days, round(corr(xv, yv), 6) AS xcorr
        |FROM j GROUP BY lag ORDER BY lag""".stripMargin,

    "q222_kappa" ->
      """WITH p AS (
        | SELECT o_orderstatus AS a,
        |  CASE WHEN o_totalprice < 100000 THEN 'F'
        |   WHEN o_totalprice < 200000 THEN 'O' ELSE 'P' END AS b
        | FROM orders WHERE o_orderstatus IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS cn FROM p GROUP BY a, b),
        |rm AS (SELECT a, CAST(sum(cn) AS DECIMAL(19,0)) AS ra
        | FROM cells GROUP BY a),
        |cm AS (SELECT b, CAST(sum(cn) AS DECIMAL(19,0)) AS cb
        | FROM cells GROUP BY b),
        |sp AS (SELECT CAST(coalesce(sum(ra * cb), 0) AS DECIMAL(38,0))
        |  AS s FROM rm JOIN cm ON rm.a = cm.b),
        |tt AS (SELECT CAST(sum(cn) AS DECIMAL(19,0)) AS nn,
        |  CAST(sum(CASE WHEN a = b THEN cn ELSE 0 END)
        |   AS DECIMAL(19,0)) AS d
        | FROM cells)
        |SELECT CAST(nn AS BIGINT) AS n,
        | CAST(d AS DOUBLE) / CAST(nn AS DOUBLE) AS observed_agreement,
        | CAST(s AS DOUBLE) / CAST(nn * nn AS DOUBLE)
        |  AS expected_agreement,
        | CASE WHEN nn * nn = s THEN NULL
        |  ELSE CAST(nn * d - s AS DOUBLE) / CAST(nn * nn - s AS DOUBLE)
        |  END AS kappa
        |FROM tt, sp""".stripMargin,

    "q223_gini" ->
      """WITH rev AS (
        | SELECT o_custkey AS cust,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   AS BIGINT) AS y
        | FROM orders GROUP BY cust),
        |r AS (SELECT y, CAST(row_number() OVER (ORDER BY y, cust)
        |  AS BIGINT) AS i FROM rev),
        |s AS (SELECT CAST(count(*) AS DECIMAL(19,0)) AS n,
        |  CAST(sum(CAST(y AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS t,
        |  CAST(sum(CAST(i AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |   AS DECIMAL(38,0)) AS s2
        | FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS total,
        | CASE WHEN t <= 0 OR n < 2 THEN NULL
        |  ELSE CAST(s2 + s2 - (n * t + t) AS DOUBLE)
        |   / CAST(n * t AS DOUBLE) END AS gini
        |FROM s""".stripMargin,

    "q225_ks_drift" -> ksDriftOracleSql,

    // streamed per-value counts + read-side KS must equal the batch
    // statistic on the union of all batches — the same oracle
    "str229_stream_drift" -> ksDriftOracleSql,

    "q226_rank_test" ->
      """WITH o AS (
        | SELECT o_totalprice AS v,
        |  o_orderpriority IN ('1-URGENT', '2-HIGH') AS ga
        | FROM orders
        | WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
        |  AND o_orderpriority IS NOT NULL),
        |bv AS (SELECT v, sum(CASE WHEN ga THEN 1 ELSE 0 END) AS na,
        |  count(*) AS nt FROM o GROUP BY v),
        |cc AS (SELECT na, nt,
        |  CAST(coalesce(sum(nt) OVER (ORDER BY v
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS DECIMAL(19,0)) AS cb
        | FROM bv),
        |s AS (SELECT
        |  CAST(sum(na) AS DECIMAL(19,0)) AS sna,
        |  CAST(sum(nt - na) AS DECIMAL(19,0)) AS snb,
        |  CAST(sum(CAST(na AS DECIMAL(19,0)) *
        |    CAST(cb + cb + CAST(nt AS DECIMAL(19,0)) + 1
        |     AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS r2a,
        |  CAST(sum(CAST(nt AS DECIMAL(12,0)) * CAST(nt AS DECIMAL(12,0))
        |    * CAST(nt AS DECIMAL(12,0)) - CAST(nt AS DECIMAL(12,0)))
        |   AS DECIMAL(19,0)) AS t3
        | FROM cc),
        |s2 AS (SELECT *, CAST(sna + snb AS DECIMAL(12,0)) AS n12 FROM s),
        |s3 AS (SELECT *,
        |  CAST((n12 + 1) * n12 AS DECIMAL(25,0)) * (n12 - 1) AS cubic,
        |  r2a - (sna * sna + sna) AS u2, sna * snb AS p
        | FROM s2)
        |SELECT CAST(sna AS BIGINT) AS n_a, CAST(snb AS BIGINT) AS n_b,
        | CAST(u2 AS DOUBLE) / 2.0 AS u_a,
        | CASE WHEN sna = 0 OR snb = 0 OR cubic - t3 = 0 THEN NULL
        |  ELSE CAST(u2 - p AS DOUBLE) /
        |   sqrt(CAST(p AS DOUBLE) * CAST(cubic - t3 AS DOUBLE) /
        |    (3.0 * CAST(n12 AS DOUBLE) * CAST(n12 - 1 AS DOUBLE)))
        |  END AS z
        |FROM s3""".stripMargin,

    "q227_chi2" ->
      """WITH cells AS (
        | SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS n
        | FROM orders
        | WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        | GROUP BY a, b),
        |rm AS (SELECT a, CAST(sum(n) AS DECIMAL(19,0)) AS ra
        | FROM cells GROUP BY a),
        |cm AS (SELECT b, CAST(sum(n) AS DECIMAL(19,0)) AS cb
        | FROM cells GROUP BY b),
        |tt AS (SELECT CAST(sum(n) AS DECIMAL(19,0)) AS nn FROM cells)
        |SELECT a, b, n,
        | CAST(ra * cb AS DOUBLE) / CAST(nn AS DOUBLE) AS expected,
        | (CAST(n AS DOUBLE) - CAST(ra * cb AS DOUBLE) / CAST(nn AS DOUBLE))
        |  * (CAST(n AS DOUBLE) - CAST(ra * cb AS DOUBLE) / CAST(nn AS DOUBLE))
        |  / (CAST(ra * cb AS DOUBLE) / CAST(nn AS DOUBLE)) AS chi2_part
        |FROM cells JOIN rm USING (a) JOIN cm USING (b), tt
        |ORDER BY a, b""".stripMargin,

    "q230_fd_profile" -> Seq(
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderstatus"),
        ("o_orderdate", "o_orderpriority")).map { case (det, dep) =>
      s"""SELECT '$det' AS determinant, '$dep' AS dependent,
         | count(*) AS n_det,
         | CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS violating_det,
         | CAST(sum(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
         |  AS violation_rows,
         | max(nd) AS max_fanout,
         | sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
         |FROM (SELECT $det AS det, count(*) AS n,
         |  count(DISTINCT $dep) AS nd FROM orders GROUP BY det)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY determinant"),

    "d231_weighted_sample" ->
      """SELECT doc_id, source, n_chars,
        | CAST((((doc_id % 2147483647) * 48271) % 2147483647) * 48271
        |   % 2147483647 + 1 AS DOUBLE) /
        |  CAST(n_chars AS DOUBLE) AS priority
        |FROM documents
        |WHERE n_chars IS NOT NULL AND n_chars > 0
        |ORDER BY priority, doc_id
        |LIMIT 50""".stripMargin,

    "q233_harmonic" ->
      """WITH u AS MATERIALIZED (
        | SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        | FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        | WHERE x.l_orderkey % 5 = 0),
        |e AS MATERIALIZED (
        | SELECT a AS src, b AS dst FROM u
        | UNION ALL SELECT b, a FROM u),
        |d0 AS MATERIALIZED (
        | SELECT DISTINCT p_partkey AS id, p_partkey AS seed,
        |  CAST(0 AS INTEGER) AS hops
        | FROM part WHERE p_partkey % 89 = 0),
        |d1 AS MATERIALIZED (
        | SELECT id, seed, min(hops) AS hops FROM (
        |  SELECT id, seed, hops FROM d0
        |  UNION ALL
        |  SELECT e.dst, d0.seed, d0.hops + 1 FROM e JOIN d0 ON e.src = d0.id)
        | GROUP BY id, seed),
        |d2 AS MATERIALIZED (
        | SELECT id, seed, min(hops) AS hops FROM (
        |  SELECT id, seed, hops FROM d1
        |  UNION ALL
        |  SELECT e.dst, d1.seed, d1.hops + 1 FROM e JOIN d1 ON e.src = d1.id)
        | GROUP BY id, seed),
        |d3 AS MATERIALIZED (
        | SELECT id, seed, min(hops) AS hops FROM (
        |  SELECT id, seed, hops FROM d2
        |  UNION ALL
        |  SELECT e.dst, d2.seed, d2.hops + 1 FROM e JOIN d2 ON e.src = d2.id)
        | GROUP BY id, seed),
        |w(hops, inv) AS (VALUES
        | (1, CAST('1.000000000000000000' AS DECIMAL(28,18))),
        | (2, CAST('0.500000000000000000' AS DECIMAL(28,18))),
        | (3, CAST('0.333333333333333333' AS DECIMAL(28,18))))
        |SELECT id, count(*) AS reached,
        | CAST(CAST(sum(inv) AS VARCHAR) AS DOUBLE) AS harmonic
        |FROM d3 JOIN w USING (hops)
        |WHERE seed <> id
        |GROUP BY id
        |ORDER BY id""".stripMargin,

    "t234_source_overlap" ->
      """WITH toks AS (
        | SELECT DISTINCT g, token FROM (
        |  SELECT source AS g, unnest(string_split(text, ' ')) AS token
        |  FROM documents)
        | WHERE token <> ''),
        |sizes AS (SELECT g, count(*) AS n FROM toks GROUP BY g)
        |SELECT a.g AS group_a, b.g AS group_b, sa.n AS n_a, sb.n AS n_b,
        | count(*) AS intersection,
        | CAST(count(*) AS DOUBLE) /
        |  CAST(sa.n + sb.n - count(*) AS DOUBLE) AS jaccard
        |FROM toks a
        |JOIN toks b ON a.token = b.token AND a.g < b.g
        |JOIN sizes sa ON sa.g = a.g
        |JOIN sizes sb ON sb.g = b.g
        |GROUP BY a.g, b.g, sa.n, sb.n
        |ORDER BY group_a, group_b""".stripMargin,

    // streamed (det, dep) pair counts + the read-side audit must equal
    // the batch fdProfile row on the union of all batches
    "str235_stream_fd" ->
      """SELECT 'o_custkey' AS determinant, 'o_orderstatus' AS dependent,
        | count(*) AS n_det,
        | CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS violating_det,
        | CAST(sum(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
        |  AS violation_rows,
        | max(nd) AS max_fanout,
        | sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
        |FROM (SELECT o_custkey AS det, count(*) AS n,
        |  count(DISTINCT o_orderstatus) AS nd FROM orders
        | GROUP BY det)""".stripMargin,

    "q236_runs_test" ->
      """WITH dly AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DECIMAL(16,6)) AS v
        | FROM events GROUP BY series, bucket),
        |med AS (SELECT series, v AS m FROM (
        |  SELECT series, v,
        |   row_number() OVER (PARTITION BY series ORDER BY v, bucket)
        |    AS rn,
        |   count(*) OVER (PARTITION BY series) AS n FROM dly)
        | WHERE rn = greatest(1, CAST(ceil(
        |  CAST(0.5 AS DOUBLE) * n) AS BIGINT))),
        |seq AS (SELECT d.series, d.bucket, d.v > m AS s
        | FROM dly d JOIN med USING (series) WHERE d.v <> m),
        |runs AS (SELECT series,
        |  CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(sum(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS n_below,
        |  CAST(sum(CASE WHEN ps IS NULL OR ps <> s THEN 1 ELSE 0 END)
        |   AS BIGINT) AS runs
        | FROM (SELECT series, s,
        |   lag(s) OVER (PARTITION BY series ORDER BY bucket) AS ps
        |  FROM seq)
        | GROUP BY series),
        |c AS (SELECT series, n_above, n_below, runs,
        |  CAST(n_above AS DOUBLE) AS n1, CAST(n_below AS DOUBLE) AS n2
        | FROM runs),
        |c2 AS (SELECT *,
        |  CAST(2.0 AS DOUBLE) * n1 * n2 AS two, n1 + n2 AS nn FROM c)
        |SELECT series, n_above, n_below, runs,
        | CASE WHEN n_above = 0 OR n_below = 0 OR n_above + n_below < 2
        |  THEN NULL
        |  ELSE (CAST(runs AS DOUBLE) - (two / nn + CAST(1.0 AS DOUBLE)))
        |   / sqrt(two * (two - nn)
        |     / (nn * nn * (nn - CAST(1.0 AS DOUBLE)))) END AS z
        |FROM c2
        |ORDER BY series""".stripMargin,

    "q237_spearman" ->
      """WITH pts AS (
        | SELECT CAST(o_totalprice AS DOUBLE) AS x,
        |  CAST(datediff('day', DATE '1970-01-01',
        |   CAST(o_orderdate AS DATE)) AS DOUBLE) AS y
        | FROM orders
        | WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
        |  AND o_orderdate IS NOT NULL),
        |gx AS (SELECT x AS v, count(*) AS c FROM pts GROUP BY v),
        |rx AS (SELECT v, 2 * coalesce(sum(c) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |  + c + 1 AS r2 FROM gx),
        |gy AS (SELECT y AS v, count(*) AS c FROM pts GROUP BY v),
        |ry AS (SELECT v, 2 * coalesce(sum(c) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |  + c + 1 AS r2 FROM gy),
        |j AS (SELECT rx.r2 AS xr, ry.r2 AS yr FROM pts
        | JOIN rx ON pts.x = rx.v JOIN ry ON pts.y = ry.v),
        |s AS (SELECT count(*) AS n,
        | CAST(sum(CAST(xr AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
        | CAST(sum(CAST(yr AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
        | CAST(sum(CAST(CAST(xr AS DECIMAL(19,0)) *
        |  CAST(xr AS DECIMAL(19,0)) AS DECIMAL(38,0)))
        |  AS DECIMAL(38,0)) AS sxx,
        | CAST(sum(CAST(CAST(yr AS DECIMAL(19,0)) *
        |  CAST(yr AS DECIMAL(19,0)) AS DECIMAL(38,0)))
        |  AS DECIMAL(38,0)) AS syy,
        | CAST(sum(CAST(CAST(xr AS DECIMAL(19,0)) *
        |  CAST(yr AS DECIMAL(19,0)) AS DECIMAL(38,0)))
        |  AS DECIMAL(38,0)) AS sxy
        | FROM j),
        |c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
        |  CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
        |  CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd,
        |  CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd,
        |  CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd
        | FROM s),
        |c2 AS (SELECT *, nd * sxxd - sxd * sxd AS vx,
        |  nd * syyd - syd * syd AS vy FROM c)
        |SELECT n,
        | CASE WHEN vx = 0.0 OR vy = 0.0 THEN NULL
        |  ELSE (nd * sxyd - sxd * syd) / sqrt(vx * vy) END AS rho
        |FROM c2""".stripMargin,

    "q238_theil_sen" ->
      """WITH dly AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DECIMAL(16,6)) AS v
        | FROM events GROUP BY series, bucket),
        |days AS (SELECT series, count(*) AS n_days FROM dly
        | GROUP BY series),
        |pairs AS (SELECT i.series, i.bucket AS d1, j.bucket AS d2,
        |  CAST(CAST(j.v - i.v AS VARCHAR) AS DOUBLE) /
        |   CAST(j.bucket - i.bucket AS DOUBLE) AS slope
        | FROM dly i JOIN dly j
        |  ON i.series = j.series AND i.bucket < j.bucket),
        |med AS (SELECT series, np AS n_pairs, slope FROM (
        |  SELECT series, slope, d1, d2,
        |   row_number() OVER (PARTITION BY series
        |    ORDER BY slope, d1, d2) AS rn,
        |   count(*) OVER (PARTITION BY series) AS np FROM pairs)
        | WHERE rn = greatest(1, CAST(ceil(
        |  CAST(0.5 AS DOUBLE) * np) AS BIGINT)))
        |SELECT d.series, d.n_days,
        | CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs, m.slope
        |FROM days d LEFT JOIN med m USING (series)
        |ORDER BY series""".stripMargin,

    "q239_mann_kendall" ->
      """WITH dly AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DECIMAL(16,6)) AS v
        | FROM events GROUP BY series, bucket),
        |s AS (SELECT i.series,
        |  CAST(sum(CASE WHEN j.v > i.v THEN 1
        |   WHEN j.v < i.v THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        | FROM dly i JOIN dly j
        |  ON i.series = j.series AND i.bucket < j.bucket
        | GROUP BY i.series),
        |tg AS (SELECT series, v, count(*) AS t FROM dly
        | GROUP BY series, v),
        |ties AS (SELECT series, CAST(sum(t) AS BIGINT) AS n_days,
        |  CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tieterm
        | FROM tg GROUP BY series),
        |c AS (SELECT t.series, t.n_days,
        |  CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat,
        |  CAST(t.n_days AS DOUBLE) AS n,
        |  CAST(coalesce(s.s_stat, 0) AS DOUBLE) AS ss,
        |  CAST(t.tieterm AS DOUBLE) AS tt
        | FROM ties t LEFT JOIN s ON s.series = t.series),
        |c2 AS (SELECT *,
        |  (n * (n - CAST(1.0 AS DOUBLE)) *
        |   (CAST(2.0 AS DOUBLE) * n + CAST(5.0 AS DOUBLE)) - tt)
        |   / CAST(18.0 AS DOUBLE) AS vars FROM c)
        |SELECT series, n_days, s_stat,
        | CASE WHEN vars <= 0.0 THEN NULL
        |  WHEN ss > 0.0 THEN (ss - CAST(1.0 AS DOUBLE)) / sqrt(vars)
        |  WHEN ss < 0.0 THEN (ss + CAST(1.0 AS DOUBLE)) / sqrt(vars)
        |  ELSE 0.0 END AS z
        |FROM c2
        |ORDER BY series""".stripMargin,

    "q242_diff_in_diff" ->
      """WITH f AS (
        | SELECT o_custkey % 2 = 0 AS t,
        |  CAST(o_orderdate AS DATE) >= DATE '1995-01-01' AS p,
        |  o_totalprice AS v
        | FROM orders WHERE o_totalprice IS NOT NULL
        |  AND o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
        |a AS (SELECT
        | CAST(sum(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_treat_pre,
        | CAST(sum(CASE WHEN t AND p THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_treat_post,
        | CAST(sum(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_ctrl_pre,
        | CAST(sum(CASE WHEN NOT t AND p THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_ctrl_post,
        | sum(CASE WHEN t AND NOT p THEN CAST(v AS DECIMAL(28,6)) END)
        |  AS s_tp,
        | sum(CASE WHEN t AND p THEN CAST(v AS DECIMAL(28,6)) END)
        |  AS s_tq,
        | sum(CASE WHEN NOT t AND NOT p THEN CAST(v AS DECIMAL(28,6)) END)
        |  AS s_cp,
        | sum(CASE WHEN NOT t AND p THEN CAST(v AS DECIMAL(28,6)) END)
        |  AS s_cq
        | FROM f),
        |m AS (SELECT n_treat_pre, n_treat_post, n_ctrl_pre, n_ctrl_post,
        | CASE WHEN n_treat_pre = 0 THEN NULL ELSE
        |  CAST(CAST(s_tp AS VARCHAR) AS DOUBLE) /
        |   CAST(n_treat_pre AS DOUBLE) END AS m_treat_pre,
        | CASE WHEN n_treat_post = 0 THEN NULL ELSE
        |  CAST(CAST(s_tq AS VARCHAR) AS DOUBLE) /
        |   CAST(n_treat_post AS DOUBLE) END AS m_treat_post,
        | CASE WHEN n_ctrl_pre = 0 THEN NULL ELSE
        |  CAST(CAST(s_cp AS VARCHAR) AS DOUBLE) /
        |   CAST(n_ctrl_pre AS DOUBLE) END AS m_ctrl_pre,
        | CASE WHEN n_ctrl_post = 0 THEN NULL ELSE
        |  CAST(CAST(s_cq AS VARCHAR) AS DOUBLE) /
        |   CAST(n_ctrl_post AS DOUBLE) END AS m_ctrl_post
        | FROM a)
        |SELECT *,
        | ((m_treat_post - m_treat_pre) - (m_ctrl_post - m_ctrl_pre))
        |  AS did
        |FROM m""".stripMargin,

    "q243_t_closeness" ->
      """WITH r AS (
        | SELECT l_returnflag AS q1, l_linestatus AS q2, l_quantity AS v
        | FROM lineitem WHERE l_quantity IS NOT NULL),
        |cells AS (SELECT q1, q2, v, count(*) AS c FROM r
        | GROUP BY q1, q2, v),
        |domain AS (SELECT DISTINCT v FROM cells),
        |md AS (SELECT count(*) AS m FROM domain),
        |groups AS (SELECT q1, q2, sum(c) AS ng FROM cells GROUP BY q1, q2),
        |tot AS (SELECT sum(c) AS nn FROM cells),
        |comp AS (SELECT g.q1, g.q2, g.ng, d.v, coalesce(c.c, 0) AS c
        | FROM groups g CROSS JOIN domain d
        | LEFT JOIN cells c ON c.q1 = g.q1 AND c.q2 = g.q2 AND c.v = d.v),
        |gv AS (SELECT v, sum(c) AS cg FROM cells GROUP BY v),
        |cum AS (SELECT comp.q1, comp.q2, comp.ng, comp.v,
        |  sum(comp.c) OVER (PARTITION BY comp.q1, comp.q2
        |   ORDER BY comp.v) AS cum_grp,
        |  sum(gv.cg) OVER (PARTITION BY comp.q1, comp.q2
        |   ORDER BY comp.v) AS cum_all,
        |  (SELECT nn FROM tot) AS nn
        | FROM comp JOIN gv USING (v)),
        |nm AS (SELECT q1, q2, ng, nn,
        |  CAST(sum(CAST(abs(CAST(cum_grp AS DECIMAL(19,0)) *
        |   CAST(nn AS DECIMAL(19,0)) - CAST(cum_all AS DECIMAL(19,0)) *
        |   CAST(ng AS DECIMAL(19,0))) AS DECIMAL(38,0)))
        |   AS DECIMAL(38,0)) AS s
        | FROM cum GROUP BY q1, q2, ng, nn)
        |SELECT q1 AS l_returnflag, q2 AS l_linestatus,
        | CAST(ng AS BIGINT) AS group_size,
        | CAST(CAST(s AS VARCHAR) AS DOUBLE) /
        |  (CAST(ng AS DOUBLE) * CAST(nn AS DOUBLE) *
        |   CAST((SELECT m FROM md) - 1 AS DOUBLE)) AS emd
        |FROM nm
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q244_corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val sums =
        cs.map(c => s"CAST(sum(CAST($c AS DECIMAL(19,6)))" +
          s" AS DECIMAL(38,6)) AS s_$c") ++
        cs.map(c => s"CAST(sum(CAST(CAST($c AS DECIMAL(19,6)) *" +
          s" CAST($c AS DECIMAL(19,6)) AS DECIMAL(38,12)))" +
          s" AS DECIMAL(38,12)) AS ss_$c") ++
        cs.combinations(2).map { case Seq(a, b) =>
          s"CAST(sum(CAST(CAST($a AS DECIMAL(19,6)) *" +
            s" CAST($b AS DECIMAL(19,6)) AS DECIMAL(38,12)))" +
            s" AS DECIMAL(38,12)) AS sp_${a}__$b"
        }.toSeq
      val notNull = cs.map(c =>
        s"$c IS NOT NULL AND NOT isnan(CAST($c AS DOUBLE))")
        .mkString(" AND ")
      val triples = cs.combinations(2).map { case Seq(a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
           | CASE WHEN CAST(n AS DOUBLE) *
           |   CAST(CAST(ss_$a AS VARCHAR) AS DOUBLE) -
           |   CAST(CAST(s_$a AS VARCHAR) AS DOUBLE) *
           |   CAST(CAST(s_$a AS VARCHAR) AS DOUBLE) = 0.0
           |  OR CAST(n AS DOUBLE) *
           |   CAST(CAST(ss_$b AS VARCHAR) AS DOUBLE) -
           |   CAST(CAST(s_$b AS VARCHAR) AS DOUBLE) *
           |   CAST(CAST(s_$b AS VARCHAR) AS DOUBLE) = 0.0 THEN NULL
           |  ELSE (CAST(n AS DOUBLE) *
           |    CAST(CAST(sp_${a}__$b AS VARCHAR) AS DOUBLE) -
           |    CAST(CAST(s_$a AS VARCHAR) AS DOUBLE) *
           |    CAST(CAST(s_$b AS VARCHAR) AS DOUBLE)) /
           |   sqrt((CAST(n AS DOUBLE) *
           |     CAST(CAST(ss_$a AS VARCHAR) AS DOUBLE) -
           |     CAST(CAST(s_$a AS VARCHAR) AS DOUBLE) *
           |     CAST(CAST(s_$a AS VARCHAR) AS DOUBLE)) *
           |    (CAST(n AS DOUBLE) *
           |     CAST(CAST(ss_$b AS VARCHAR) AS DOUBLE) -
           |     CAST(CAST(s_$b AS VARCHAR) AS DOUBLE) *
           |     CAST(CAST(s_$b AS VARCHAR) AS DOUBLE))) END AS corr
           |FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH f AS (SELECT * FROM lineitem WHERE $notNull),
         |a AS (SELECT count(*) AS n,
         | ${sums.mkString(",\n ")}
         | FROM f)
         |$triples
         |ORDER BY col_a, col_b""".stripMargin
    },

    "t245_zipf" ->
      """WITH tok AS (
        | SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, count(*) AS n FROM tok
        | WHERE token <> '' GROUP BY token),
        |top AS (SELECT n,
        |  row_number() OVER (ORDER BY n DESC, token) AS rank
        | FROM cnt ORDER BY n DESC, token LIMIT 100),
        |pts AS (SELECT
        |  CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(14,12)) AS x,
        |  CAST(round(ln(CAST(n AS DOUBLE)), 9) AS DECIMAL(14,12)) AS y
        | FROM top),
        |s AS (SELECT count(*) AS k,
        | CAST(sum(x) AS DECIMAL(38,12)) AS sx,
        | CAST(sum(y) AS DECIMAL(38,12)) AS sy,
        | CAST(sum(CAST(x * y AS DECIMAL(38,24))) AS DECIMAL(38,24)) AS sxy,
        | CAST(sum(CAST(x * x AS DECIMAL(38,24))) AS DECIMAL(38,24)) AS sxx,
        | CAST(sum(CAST(y * y AS DECIMAL(38,24))) AS DECIMAL(38,24)) AS syy
        | FROM pts),
        |c AS (SELECT k, CAST(k AS DOUBLE) AS kd,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
        |  CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
        |  CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd,
        |  CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd,
        |  CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd
        | FROM s),
        |c2 AS (SELECT *, kd * sxyd - sxd * syd AS num,
        |  kd * sxxd - sxd * sxd AS den,
        |  kd * syyd - syd * syd AS deny FROM c)
        |SELECT k,
        | CASE WHEN den = 0.0 THEN NULL ELSE num / den END AS slope,
        | CASE WHEN den = 0.0 THEN NULL
        |  ELSE (syd - (num / den) * sxd) / kd END AS intercept,
        | CASE WHEN den = 0.0 OR deny = 0.0 THEN NULL
        |  ELSE num * num / (den * deny) END AS r2
        |FROM c2""".stripMargin,

    "q247_entropy" -> Seq("o_custkey", "o_orderpriority", "o_orderstatus")
      .map { c =>
        s"""SELECT '$c' AS col_name, CAST(sum(c) AS BIGINT) AS n,
           | count(*) AS n_distinct,
           | round(ln(CAST(sum(c) AS DOUBLE)) -
           |  CAST(CAST(CAST(sum(CAST(CAST(c AS DECIMAL(12,0)) *
           |   CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(14,12))
           |   AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS VARCHAR)
           |   AS DOUBLE) / CAST(sum(c) AS DOUBLE), 9) AS entropy,
           | CASE WHEN count(*) <= 1 THEN NULL ELSE
           |  round(round(ln(CAST(sum(c) AS DOUBLE)) -
           |   CAST(CAST(CAST(sum(CAST(CAST(c AS DECIMAL(12,0)) *
           |    CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(14,12))
           |    AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS VARCHAR)
           |    AS DOUBLE) / CAST(sum(c) AS DOUBLE), 9) /
           |   ln(CAST(count(*) AS DOUBLE)), 9) END AS normalized
           |FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS c
           | FROM orders WHERE $c IS NOT NULL GROUP BY v)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    // streamed exact-decimal moments + read-side Pearson must equal the
    // batch correlation on the union of all batches
    "str248_stream_corr" ->
      """WITH f AS (
        | SELECT CAST(o_totalprice AS DOUBLE) AS x,
        |  CAST(o_custkey AS DOUBLE) AS y
        | FROM orders
        | WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
        |  AND o_custkey IS NOT NULL),
        |a AS (SELECT count(*) AS n,
        | CAST(sum(CAST(x AS DECIMAL(19,6))) AS DECIMAL(38,6)) AS sx,
        | CAST(sum(CAST(y AS DECIMAL(19,6))) AS DECIMAL(38,6)) AS sy,
        | CAST(sum(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))
        |  AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sxx,
        | CAST(sum(CAST(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
        |  AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS syy,
        | CAST(sum(CAST(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
        |  AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sxy
        | FROM f),
        |c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
        |  CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
        |  CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd,
        |  CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd,
        |  CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd
        | FROM a),
        |c2 AS (SELECT *, nd * sxxd - sxd * sxd AS vx,
        |  nd * syyd - syd * syd AS vy FROM c)
        |SELECT 'o_totalprice' AS col_a, 'o_custkey' AS col_b, n,
        | CASE WHEN vx = 0.0 OR vy = 0.0 THEN NULL
        |  ELSE (nd * sxyd - sxd * syd) / sqrt(vx * vy) END AS corr
        |FROM c2""".stripMargin,

    "d264_dup_transactions" ->
      """WITH t AS (
        | SELECT l_orderkey * 10 + l_linenumber AS id,
        |  l_partkey AS entity, CAST(l_quantity AS BIGINT) AS cents,
        |  CAST(date_trunc('day', l_shipdate) AS DATE) AS d
        | FROM lineitem
        | WHERE l_partkey IS NOT NULL AND l_quantity IS NOT NULL
        |  AND l_shipdate IS NOT NULL),
        |g AS (SELECT * FROM (
        |  SELECT *, count(*) OVER (PARTITION BY entity, cents) AS bsz
        |  FROM t) WHERE bsz BETWEEN 2 AND 64)
        |SELECT a.entity, a.cents, a.id AS id_a, b.id AS id_b,
        | a.d AS day_a, b.d AS day_b,
        | abs(datediff('day', a.d, b.d)) AS gap_days
        |FROM g a JOIN g b
        | ON a.entity = b.entity AND a.cents = b.cents AND a.id < b.id
        |WHERE abs(datediff('day', a.d, b.d)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "d261_template_mine" ->
      """SELECT md5(shape) AS shape_md5, count(*) AS n_docs,
        | min(doc_id) AS sample_doc_id
        |FROM (SELECT doc_id,
        |  regexp_replace(regexp_replace(lower(text), '[0-9]+', '#', 'g'),
        |   '[a-z]+', 'w', 'g') AS shape
        | FROM documents WHERE text IS NOT NULL)
        |GROUP BY shape
        |HAVING count(*) >= 3
        |ORDER BY shape_md5""".stripMargin,

    // streamed key counts audited for completeness must equal the batch
    // sequence audit on the union of all batches
    "str262_stream_seq_audit" ->
      """WITH a AS (
        | SELECT count(*) AS n, count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        | FROM orders WHERE o_orderkey IS NOT NULL)
        |SELECT n, n_distinct, min_key, max_key,
        | max_key - min_key + 1 AS span,
        | max_key - min_key + 1 - n_distinct AS missing,
        | n - n_distinct AS duplicates,
        | max_key - min_key + 1 - n_distinct = 0 AND n - n_distinct = 0
        |  AS complete
        |FROM a""".stripMargin,

    "q259_sequence_audit" ->
      """WITH a AS (
        | SELECT o_orderstatus AS g, count(*) AS n,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        | FROM orders WHERE o_orderkey IS NOT NULL
        | GROUP BY g)
        |SELECT g AS "group", n, n_distinct, min_key, max_key,
        | max_key - min_key + 1 AS span,
        | max_key - min_key + 1 - n_distinct AS missing,
        | n - n_distinct AS duplicates,
        | max_key - min_key + 1 - n_distinct = 0 AND n - n_distinct = 0
        |  AS complete
        |FROM a
        |ORDER BY g""".stripMargin,

    "q257_erasure_audit" ->
      """WITH ks AS (
        | SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0)
        |SELECT 'orders' AS "table",
        | (SELECT count(*) FROM orders) AS rows_total,
        | (SELECT count(*) FROM orders
        |   WHERE o_custkey IN (SELECT k FROM ks)) AS rows_affected,
        | CASE WHEN (SELECT count(*) FROM orders) = 0 THEN 0.0
        |  ELSE CAST((SELECT count(*) FROM orders
        |    WHERE o_custkey IN (SELECT k FROM ks)) AS DOUBLE) /
        |   CAST((SELECT count(*) FROM orders) AS DOUBLE) END AS share
        |UNION ALL
        |SELECT 'lineitem',
        | (SELECT count(*) FROM lineitem),
        | (SELECT count(*) FROM lineitem WHERE l_orderkey IN
        |   (SELECT o_orderkey FROM orders
        |    WHERE o_custkey IN (SELECT k FROM ks))),
        | CASE WHEN (SELECT count(*) FROM lineitem) = 0 THEN 0.0
        |  ELSE CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IN
        |    (SELECT o_orderkey FROM orders
        |     WHERE o_custkey IN (SELECT k FROM ks))) AS DOUBLE) /
        |   CAST((SELECT count(*) FROM lineitem) AS DOUBLE) END
        |ORDER BY "table"""".stripMargin,

    "q254_burstiness" ->
      """WITH dly AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket, count(*) AS n
        | FROM events GROUP BY series, bucket),
        |s AS (SELECT series, count(*) AS n_days,
        |  CAST(sum(n) AS DECIMAL(19,0)) AS tot,
        |  CAST(sum(CAST(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))
        |   AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq
        | FROM dly GROUP BY series),
        |c AS (SELECT series, n_days, tot,
        |  CAST(CAST(CAST(n_days AS DECIMAL(6,0)) *
        |   CAST(sq AS DECIMAL(32,0)) AS DECIMAL(38,0)) -
        |   CAST(tot * tot AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS disp
        | FROM s)
        |SELECT series, n_days, CAST(tot AS BIGINT) AS total,
        | CAST(CAST(tot AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE)
        |  AS mean,
        | CAST(CAST(disp AS VARCHAR) AS DOUBLE) /
        |  (CAST(n_days AS DOUBLE) * CAST(CAST(tot AS VARCHAR) AS DOUBLE))
        |  AS fano,
        | sqrt(CAST(CAST(disp AS VARCHAR) AS DOUBLE)) /
        |  CAST(CAST(tot AS VARCHAR) AS DOUBLE) AS cv
        |FROM c
        |ORDER BY series""".stripMargin,

    "t255_code_detect" -> {
      val structural = Seq("{", "}", ";")
      val operators = Seq("(", ")", "=", "<", ">", "[", "]")
      def cnt(ch: String) = {
        val q = ch.replace("'", "''")
        s"(length(t2) - length(replace(t2, '$q', '')))"
      }
      val structSum = structural.map(cnt).mkString(" + ")
      val symSum = (structural ++ operators).map(cnt).mkString(" + ")
      s"""WITH d AS (
         | SELECT doc_id,
         |  CASE WHEN doc_id % 9 = 0 THEN text ||
         |   ' function f(x) { return x[i] <= y[i]; }' ELSE text END AS t2
         | FROM documents),
         |m AS (SELECT doc_id, CAST(length(t2) AS BIGINT) AS n_chars,
         |  CAST($structSum AS BIGINT) AS structural_chars,
         |  CAST($symSum AS BIGINT) AS symbol_chars
         | FROM d),
         |r AS (SELECT *,
         |  CASE WHEN n_chars = 0 THEN 0.0
         |   ELSE CAST(symbol_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
         |  END AS symbol_ratio FROM m)
         |SELECT doc_id, n_chars, structural_chars, symbol_chars,
         | symbol_ratio,
         | symbol_ratio >= 0.01 AND structural_chars > 0 AS looks_code
         |FROM r
         |ORDER BY doc_id""".stripMargin
    },

    // streamed value counts read through the HHI lens must equal the
    // batch concentration of the union
    "str256_stream_hhi" ->
      """WITH vals AS (
        | SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
        | WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)),
        |cnt AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
        |a AS (SELECT count(*) AS n_distinct,
        |  CAST(sum(c) AS DECIMAL(19,0)) AS tot,
        |  CAST(sum(CAST(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
        |   AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq,
        |  max(c) AS top FROM cnt)
        |SELECT CAST(tot AS BIGINT) AS n, n_distinct,
        | CAST(CAST(sq AS VARCHAR) AS DOUBLE) /
        |  (CAST(CAST(tot AS VARCHAR) AS DOUBLE) *
        |   CAST(CAST(tot AS VARCHAR) AS DOUBLE)) AS hhi,
        | CAST(top AS DOUBLE) / CAST(CAST(tot AS VARCHAR) AS DOUBLE)
        |  AS top_share
        |FROM a""".stripMargin,

    "q249_changepoint" ->
      """WITH dly AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DECIMAL(16,6)) AS v
        | FROM events GROUP BY series, bucket),
        |cum AS (SELECT series, bucket,
        |  row_number() OVER (PARTITION BY series ORDER BY bucket) AS t,
        |  CAST(sum(v) OVER (PARTITION BY series ORDER BY bucket)
        |   AS DECIMAL(26,6)) AS st,
        |  count(*) OVER (PARTITION BY series) AS n,
        |  CAST(sum(v) OVER (PARTITION BY series) AS DECIMAL(26,6)) AS sn
        | FROM dly),
        |cand AS (SELECT *,
        |  CAST(abs(CAST(t AS DECIMAL(10,0)) * sn -
        |   CAST(n AS DECIMAL(10,0)) * st) AS DECIMAL(38,6)) AS stat
        | FROM cum WHERE n >= 2 AND t < n),
        |best AS (SELECT *, row_number() OVER (PARTITION BY series
        |  ORDER BY stat DESC, bucket) AS rk FROM cand),
        |mm AS (SELECT series, CAST(n AS BIGINT) AS n_days,
        |  bucket AS split_bucket,
        |  CAST(CAST(st AS VARCHAR) AS DOUBLE) / CAST(t AS DOUBLE)
        |   AS mean_before,
        |  CAST(CAST(CAST(sn - st AS DECIMAL(27,6)) AS VARCHAR) AS DOUBLE)
        |   / CAST(n - t AS DOUBLE) AS mean_after
        | FROM best WHERE rk = 1)
        |SELECT series, n_days, split_bucket, mean_before, mean_after,
        | mean_after - mean_before AS gap
        |FROM mm
        |ORDER BY series""".stripMargin,

    // streamed value counts read through the entropy lens must equal
    // the batch entropy of the union
    "str251_stream_entropy" ->
      """WITH vals AS (
        | SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
        | WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)),
        |cnt AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS n_distinct,
        |  round(ln(CAST(sum(c) AS DOUBLE)) -
        |   CAST(CAST(CAST(sum(CAST(CAST(c AS DECIMAL(12,0)) *
        |    CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(14,12))
        |    AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS VARCHAR)
        |    AS DOUBLE) / CAST(sum(c) AS DOUBLE), 9) AS entropy
        | FROM cnt)
        |SELECT n, n_distinct, entropy,
        | CASE WHEN n_distinct <= 1 THEN NULL
        |  ELSE round(entropy / ln(CAST(n_distinct AS DOUBLE)), 9)
        | END AS normalized
        |FROM a""".stripMargin,

    "q211_rfm" ->
      """WITH per AS (
        | SELECT user_id, max(epoch_us(ts)) AS lastu,
        |  count(*) AS frequency, sum(CAST(value AS DECIMAL(28,6))) AS m
        | FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |base AS (
        | SELECT user_id,
        |  ((SELECT max(lastu) FROM per) - lastu) // 86400000000
        |   AS recency_days,
        |  frequency, CAST(m AS DOUBLE) AS monetary
        | FROM per),
        |nn AS (SELECT count(*) AS n FROM base),
        |r AS (SELECT user_id,
        |  ((row_number() OVER (ORDER BY recency_days, user_id) - 1) * 4)
        |   // (SELECT n FROM nn) + 1 AS r_score FROM base),
        |f AS (SELECT user_id,
        |  ((row_number() OVER (ORDER BY frequency DESC, user_id) - 1)
        |   * 4) // (SELECT n FROM nn) + 1 AS f_score FROM base),
        |mm AS (SELECT user_id,
        |  ((row_number() OVER (ORDER BY monetary DESC, user_id) - 1)
        |   * 4) // (SELECT n FROM nn) + 1 AS m_score FROM base)
        |SELECT b.user_id, b.recency_days, b.frequency, b.monetary,
        | r.r_score, f.f_score, mm.m_score,
        | r.r_score * 100 + f.f_score * 10 + mm.m_score AS segment
        |FROM base b JOIN r USING (user_id) JOIN f USING (user_id)
        | JOIN mm USING (user_id)
        |ORDER BY b.user_id""".stripMargin,

    "q208_interval_coverage" ->
      """WITH iv AS (
        | SELECT user_id, epoch_us(ts) AS s,
        |  epoch_us(ts) + 300000000 AS e
        | FROM events WHERE user_id IS NOT NULL),
        |m AS (SELECT user_id, s, e,
        |  max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        | FROM iv),
        |fl AS (SELECT user_id, s, e,
        |  CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni
        | FROM m),
        |isl AS (SELECT user_id, s, e,
        |  sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM fl),
        |seg AS (SELECT user_id, island, min(s) AS ss, max(e) AS ee
        | FROM isl GROUP BY user_id, island)
        |SELECT user_id, CAST(sum(ee - ss) AS BIGINT) AS covered_us,
        | count(*) AS n_segments
        |FROM seg GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "t209_vocab_growth" ->
      """WITH fs AS (
        | SELECT bg, min(doc_id) AS first FROM (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t
        |        FROM documents) toks,
        |   unnest(range(1, len(t))) AS u(i)
        |  WHERE t[i] <> '' AND t[i+1] <> '') GROUP BY bg),
        |b AS (SELECT first // 50 AS bucket, count(*) AS new_tokens
        | FROM fs GROUP BY 1)
        |SELECT bucket, new_tokens,
        | CAST(sum(new_tokens) OVER (ORDER BY bucket
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS vocab
        |FROM b ORDER BY bucket""".stripMargin,

    "q203_assortativity" ->
      """WITH u AS (
        | SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        | FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        | WHERE x.l_orderkey % 5 = 0),
        |e AS MATERIALIZED (SELECT a, b FROM u UNION SELECT b, a FROM u),
        |deg AS MATERIALIZED (
        | SELECT a AS id, count(*) AS degree FROM e GROUP BY a),
        |j AS (SELECT CAST(da.degree AS DECIMAL(19,0)) AS x,
        |  CAST(db.degree AS DECIMAL(19,0)) AS y
        | FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b),
        |s AS (SELECT CAST(count(*) AS DECIMAL(18,0)) AS m,
        |  CAST(sum(x*y) AS DECIMAL(19,0)) AS sxy,
        |  CAST(sum(x) AS DECIMAL(19,0)) AS sx,
        |  CAST(sum(x*x) AS DECIMAL(19,0)) AS sxx FROM j)
        |SELECT CAST(m AS BIGINT) AS edges_directed,
        | round(CASE WHEN m*sxx - sx*sx = 0 THEN NULL
        |  ELSE CAST(m*sxy - sx*sx AS DOUBLE)
        |   / CAST(m*sxx - sx*sx AS DOUBLE) END, 6) AS assortativity
        |FROM s""".stripMargin,

    "q183_rolling_distinct" ->
      """WITH b AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket, user_id
        | FROM events WHERE user_id IS NOT NULL),
        |d AS (SELECT series, bucket,
        |  count(DISTINCT user_id) AS bucket_distinct
        | FROM b GROUP BY series, bucket),
        |r AS (SELECT a.series, a.bucket,
        |  count(DISTINCT b.user_id) AS rolling_distinct
        | FROM (SELECT DISTINCT series, bucket FROM b) a
        | JOIN b ON b.series = a.series
        |  AND b.bucket BETWEEN a.bucket - 6 AND a.bucket
        | GROUP BY a.series, a.bucket)
        |SELECT d.series, strftime(d.bucket, '%Y-%m-%d') AS day,
        | d.bucket_distinct, r.rolling_distinct
        |FROM d JOIN r ON d.series = r.series AND d.bucket = r.bucket
        |ORDER BY d.series, day""".stripMargin,

    "q184_label_propagation" -> lpaOracleSql(3),

    "q185_cusum" ->
      """WITH c AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket, count(*) AS n
        | FROM events GROUP BY series, bucket),
        |st AS (SELECT series, CAST(count(n) AS DOUBLE) AS k,
        |  CAST(sum(CAST(n AS DECIMAL(28,6))) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(n * n AS DECIMAL(28,6))) AS DOUBLE) AS s2
        | FROM c GROUP BY series),
        |z AS (SELECT c.series, c.bucket, c.n,
        |  CASE WHEN k >= 2 AND (s2 - s1 * s1 / k) / (k - 1) > 0
        |   THEN CAST(floor((CAST(n AS DOUBLE) - s1 / k)
        |     / sqrt((s2 - s1 * s1 / k) / (k - 1)) * 1000000.0 + 0.5)
        |    AS BIGINT)
        |  END AS z
        | FROM c JOIN st ON c.series = st.series),
        |r AS (SELECT series, bucket, n,
        |  sum(z - 250000) OVER w AS rh,
        |  sum(-z - 250000) OVER w AS rl
        | FROM z
        | WINDOW w AS (PARTITION BY series ORDER BY bucket
        |  ROWS UNBOUNDED PRECEDING)),
        |s AS (SELECT series, bucket, n,
        |  CAST(CAST(rh - least(min(rh) OVER w, 0) AS BIGINT)
        |   AS DOUBLE) / 1000000.0 AS cusum_hi,
        |  CAST(CAST(rl - least(min(rl) OVER w, 0) AS BIGINT)
        |   AS DOUBLE) / 1000000.0 AS cusum_lo
        | FROM r
        | WINDOW w AS (PARTITION BY series ORDER BY bucket
        |  ROWS UNBOUNDED PRECEDING))
        |SELECT series, strftime(bucket, '%Y-%m-%d') AS day, n,
        | round(cusum_hi, 6) AS cusum_hi, round(cusum_lo, 6) AS cusum_lo,
        | coalesce(cusum_hi > 3.0 OR cusum_lo > 3.0, FALSE) AS is_shift
        |FROM s ORDER BY series, day""".stripMargin,

    "q187_attribution" ->
      """WITH base AS (
        | SELECT * FROM events
        | UNION ALL
        | SELECT * FROM events
        | WHERE event_type = 'click' AND user_id % 50 = 0),
        |ev AS (
        | SELECT user_id, ts, event_id, event_type, value,
        |  CASE WHEN event_type IN ('click','view','signup')
        |   THEN 1 ELSE 0 END AS tch,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cnv
        | FROM base
        | WHERE event_type IN ('click','view','signup','purchase')),
        |sp AS (SELECT *, coalesce(sum(cnv) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS span
        | FROM ev),
        |t AS (SELECT user_id, span, ts, event_id, event_type AS ch
        | FROM sp WHERE tch = 1),
        |c AS (SELECT user_id, span, CAST(value AS DOUBLE) AS v
        | FROM sp WHERE cnv = 1),
        |j AS (SELECT c.user_id, c.span, c.v, t.ts, t.event_id, t.ch
        | FROM c LEFT JOIN t
        |  ON t.user_id = c.user_id AND t.span = c.span),
        |p AS (SELECT *, row_number() OVER (
        |  PARTITION BY user_id, span
        |  ORDER BY ts DESC, event_id DESC) AS rn FROM j)
        |SELECT ch AS channel, count(*) AS n_credits,
        | CAST(sum(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |  / 1000000.0 AS credit
        |FROM p WHERE rn = 1 GROUP BY ch ORDER BY ch""".stripMargin,

    "q188_event_paths" ->
      """WITH p AS (
        | SELECT concat_ws('>', event_type,
        |   lead(event_type, 1) OVER w, lead(event_type, 2) OVER w) AS path,
        |  lead(event_type, 2) OVER w AS e2
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT path, count(*) AS n FROM p WHERE e2 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 25""".stripMargin,

    "q189_copurchase" -> copurchaseOracleSql,

    // additive streaming maintenance must equal the batch operator on
    // the union of all basket-complete batches — the same oracle
    "str224_stream_cooccur" -> copurchaseOracleSql,

    "q196_psi_drift" ->
      """WITH o AS (
        | SELECT o_totalprice AS price,
        |  CAST(floor(datediff('day', DATE '1970-01-05',
        |   CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS wk
        | FROM orders),
        |refd AS (SELECT price FROM o WHERE wk % 4 = 1
        | AND price IS NOT NULL AND NOT isnan(price)),
        |curd AS (SELECT price FROM o WHERE wk % 4 = 0
        | AND price IS NOT NULL AND NOT isnan(price)),
        |cuts AS (SELECT quantile_cont(price,
        |  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q FROM refd),
        |rb AS (SELECT CAST(CASE
        |  WHEN price <= q[1] THEN 1 WHEN price <= q[2] THEN 2
        |  WHEN price <= q[3] THEN 3 WHEN price <= q[4] THEN 4
        |  WHEN price <= q[5] THEN 5 WHEN price <= q[6] THEN 6
        |  WHEN price <= q[7] THEN 7 WHEN price <= q[8] THEN 8
        |  WHEN price <= q[9] THEN 9 ELSE 10 END AS BIGINT) AS bin
        | FROM refd, cuts),
        |cb AS (SELECT CAST(CASE
        |  WHEN price <= q[1] THEN 1 WHEN price <= q[2] THEN 2
        |  WHEN price <= q[3] THEN 3 WHEN price <= q[4] THEN 4
        |  WHEN price <= q[5] THEN 5 WHEN price <= q[6] THEN 6
        |  WHEN price <= q[7] THEN 7 WHEN price <= q[8] THEN 8
        |  WHEN price <= q[9] THEN 9 ELSE 10 END AS BIGINT) AS bin
        | FROM curd, cuts),
        |rn AS (SELECT bin, count(*) AS ref_n FROM rb GROUP BY bin),
        |cn AS (SELECT bin, count(*) AS cur_n FROM cb GROUP BY bin),
        |j AS (SELECT coalesce(rn.bin, cn.bin) AS bin,
        |  coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
        | FROM rn FULL OUTER JOIN cn ON rn.bin = cn.bin),
        |s AS (SELECT bin, ref_n, cur_n,
        |  CAST(ref_n AS DOUBLE) / CAST(sum(ref_n) OVER () AS DOUBLE)
        |   AS ref_share,
        |  CAST(cur_n AS DOUBLE) / CAST(sum(cur_n) OVER () AS DOUBLE)
        |   AS cur_share
        | FROM j)
        |SELECT bin, ref_n, cur_n, ref_share, cur_share,
        | CASE WHEN ref_n > 0 AND cur_n > 0
        |  THEN (cur_share - ref_share) * ln(cur_share / ref_share)
        | END AS psi_part
        |FROM s ORDER BY bin""".stripMargin,

    "q195_churn_hazard" ->
      """WITH sp AS (
        | SELECT user_id,
        |  min(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS f,
        |  max(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS l
        | FROM events GROUP BY user_id),
        |e AS (SELECT max(l) AS en FROM sp),
        |a AS (SELECT l - f AS age_days,
        |  (SELECT en FROM e) - l < 3 AS cens FROM sp),
        |p AS (SELECT age_days, count(*) AS n,
        |  sum(CASE WHEN cens THEN 0 ELSE 1 END) AS n_churned,
        |  sum(CASE WHEN cens THEN 1 ELSE 0 END) AS n_censored
        | FROM a GROUP BY age_days),
        |r AS (SELECT *, sum(n) OVER (ORDER BY age_days DESC
        |  ROWS UNBOUNDED PRECEDING) AS n_at_risk FROM p)
        |SELECT CAST(age_days AS BIGINT) AS age_days,
        | CAST(n_at_risk AS BIGINT) AS n_at_risk,
        | CAST(n_churned AS BIGINT) AS n_churned,
        | CAST(n_censored AS BIGINT) AS n_censored,
        | CAST(n_churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS hazard
        |FROM r ORDER BY age_days""".stripMargin,

    "t193_tfidf_terms" ->
      """WITH toks AS (
        | SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term
        | FROM documents WHERE doc_id < 300),
        |tf AS (SELECT id, term, count(*) AS tf FROM toks
        | WHERE term <> '' GROUP BY id, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS nn FROM documents WHERE doc_id < 300),
        |sc AS (SELECT tf.id, tf.term,
        |  round(CAST(tf.tf AS DOUBLE)
        |   * (ln(CAST(nn + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) + 1.0),
        |   6) AS score
        | FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT id, term, score, row_number() OVER (
        |  PARTITION BY id ORDER BY score DESC, term) AS rank FROM sc)
        |SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank, term, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q194_seasonal" ->
      """WITH dly AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket,
        |  sum(CAST(1.0 AS DECIMAL(28,6))) AS v
        | FROM events GROUP BY series, bucket),
        |tr AS (SELECT series, bucket, v,
        |  count(v) OVER w AS k, sum(v) OVER w AS sv
        | FROM dly WINDOW w AS (PARTITION BY series ORDER BY bucket
        |  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (SELECT series, bucket, v,
        |  CASE WHEN k = 7 THEN round(CAST(sv AS DOUBLE) / 7.0, 6) END
        |   AS trend FROM tr),
        |t3 AS (SELECT *,
        |  CAST(floor((CAST(v AS DOUBLE) - trend) * 1000000.0 + 0.5)
        |   AS BIGINT) AS det,
        |  (datediff('day', DATE '1970-01-01', bucket) + 4) % 7 AS slot
        | FROM t2),
        |ssn AS (SELECT series, slot,
        |  CAST(sum(det) AS DOUBLE) / CAST(count(det) AS DOUBLE)
        |   / 1000000.0 AS s
        | FROM t3 GROUP BY series, slot)
        |SELECT t3.series, strftime(bucket, '%Y-%m-%d') AS day,
        | round(CAST(v AS DOUBLE), 6) AS v, trend,
        | s AS seasonal,
        | CAST(det AS DOUBLE) / 1000000.0 - s AS residual
        |FROM t3 JOIN ssn ON ssn.series = t3.series AND ssn.slot = t3.slot
        |ORDER BY t3.series, day""".stripMargin,

    "q191_funnel_latency" ->
      """WITH s1 AS (
        | SELECT user_id, min(ts) AS t1 FROM events
        | WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        | SELECT e.user_id, min(e.ts) AS t2 FROM events e
        | JOIN s1 ON e.user_id = s1.user_id
        | WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (
        | SELECT e.user_id, min(e.ts) AS t3 FROM events e
        | JOIN s2 ON e.user_id = s2.user_id
        | WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        | GROUP BY e.user_id),
        |lat AS (SELECT CAST(floor(epoch(s3.t3)) AS BIGINT)
        |   - CAST(floor(epoch(s1.t1)) AS BIGINT) AS sec
        | FROM s3 JOIN s1 ON s3.user_id = s1.user_id),
        |o AS (SELECT list_sort(list(CAST(sec AS DOUBLE))) AS vs,
        |  count(*) AS n FROM lat)
        |SELECT CAST(n AS BIGINT) AS n_completers,
        | round(vs[CAST(ceil(0.5 * n) AS INT)], 2) AS p50_sec,
        | round(vs[CAST(ceil(0.9 * n) AS INT)], 2) AS p90_sec
        |FROM o""".stripMargin,

    "q192_cohort_ltv" ->
      """WITH f AS (
        | SELECT user_id, min(ts) AS ft FROM events GROUP BY user_id),
        |fc AS (SELECT user_id,
        |  CAST(floor(datediff('day', DATE '1970-01-05',
        |   CAST(ft AS DATE)) / 7) AS BIGINT) AS cohort_week FROM f),
        |sz AS (SELECT cohort_week, count(*) AS n_users
        | FROM fc GROUP BY cohort_week),
        |r AS (SELECT fc.cohort_week,
        |  CAST(floor(datediff('day', DATE '1970-01-05',
        |   CAST(e.ts AS DATE)) / 7) AS BIGINT) - fc.cohort_week AS period,
        |  sum(CAST(e.value AS DECIMAL(28,6))) AS revenue
        | FROM events e JOIN fc ON e.user_id = fc.user_id
        | WHERE e.event_type = 'purchase'
        | GROUP BY fc.cohort_week, period),
        |c AS (SELECT cohort_week, period, revenue,
        |  sum(revenue) OVER (PARTITION BY cohort_week ORDER BY period
        |   ROWS UNBOUNDED PRECEDING) AS cum FROM r)
        |SELECT c.cohort_week, c.period, sz.n_users,
        | round(CAST(c.revenue AS DOUBLE), 6) AS revenue,
        | round(CAST(c.cum AS DOUBLE) / sz.n_users, 6) AS cum_ltv_per_user
        |FROM c JOIN sz ON sz.cohort_week = c.cohort_week
        |ORDER BY c.cohort_week, c.period""".stripMargin,

    "q190_rolling_quantile" ->
      """WITH b AS (
        | SELECT event_type AS series,
        |  CAST(date_trunc('day', ts) AS DATE) AS bucket,
        |  CAST(value AS DOUBLE) AS v
        | FROM events WHERE value IS NOT NULL),
        |w AS (SELECT a.series, a.bucket,
        |  list_sort(list(b.v)) AS vs, count(*) AS n
        | FROM (SELECT DISTINCT series, bucket FROM b) a
        | JOIN b ON b.series = a.series
        |  AND b.bucket BETWEEN a.bucket - 6 AND a.bucket
        | GROUP BY a.series, a.bucket)
        |SELECT series, strftime(bucket, '%Y-%m-%d') AS day,
        | CAST(n AS BIGINT) AS n,
        | round(vs[CAST(ceil(0.5 * n) AS INT)], 2) AS p50,
        | round(vs[CAST(ceil(0.95 * n) AS INT)], 2) AS p95
        |FROM w ORDER BY series, day""".stripMargin,

    "q186_group_split" ->
      """WITH s AS (
        | SELECT user_id,
        |  CASE WHEN b < 8000 THEN 'train'
        |       WHEN b < 9000 THEN 'val'
        |       WHEN b < 10000 THEN 'test' END AS split
        | FROM (SELECT user_id,
        |   ((user_id % 1000003) * 427799 % 1000003) % 10000 AS b
        |  FROM events))
        |SELECT split, count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_quantity >= 45 AND l_shipdate < TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_join_topk" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1995-03-15'
        | AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, order_date
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q04_join_dims" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q05_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q06_anti_join" ->
      """SELECT n_name, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q07_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q08_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   OVER w AS DOUBLE) / 100.0 AS running_spend,
        | count(*) OVER w AS running_orders
        |FROM orders
        |WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q09_window_offset" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q50_window_range" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   OVER w AS DOUBLE) / 100.0 AS spend_30d,
        | count(*) OVER w AS orders_30d
        |FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s FROM orders)
        |WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_s
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q10_topk" ->
      """SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q11_set_ops" ->
      """SELECT * FROM (
        | SELECT 'except' AS set_op, count(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |  EXCEPT SELECT o_custkey FROM orders)
        | UNION ALL
        | SELECT 'intersect' AS set_op, count(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |  INTERSECT SELECT o_custkey FROM orders)
        | UNION ALL
        | SELECT 'union' AS set_op, count(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |  UNION SELECT o_custkey FROM orders))
        |ORDER BY set_op""".stripMargin,

    "q12_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_suppkey) AS n_supp,
        | count(DISTINCT l_partkey) AS n_part,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q13_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q58_array_agg" ->
      """SELECT o_custkey,
        | array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        | count(*) AS n
        |FROM orders
        |WHERE o_custkey < 50
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q46_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(yr, -1) AS yr, n_orders
        |FROM (SELECT o_orderstatus, year(o_orderdate) AS yr, count(*) AS n_orders
        | FROM orders GROUP BY CUBE (o_orderstatus, yr))
        |ORDER BY status, yr""".stripMargin,

    "q14_percentile" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS p50_qty,
        | quantile_cont(l_quantity, 0.9) AS p90_qty,
        | min(l_quantity) AS min_qty,
        | max(l_quantity) AS max_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q15_date_parts" ->
      """SELECT date_part('year', o_orderdate) AS yr,
        | date_part('quarter', o_orderdate) AS qtr,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY yr, qtr
        |ORDER BY yr, qtr""".stripMargin,

    "q45_dow_week" ->
      """SELECT isodow(o_orderdate) AS iso_dow, count(*) AS n_orders,
        | count(DISTINCT weekofyear(o_orderdate)) AS n_distinct_weeks
        |FROM orders
        |GROUP BY iso_dow
        |ORDER BY iso_dow""".stripMargin,

    "q16_date_arith" ->
      """SELECT l_returnflag,
        | CAST(sum(delay) AS BIGINT) AS sum_delay,
        | CAST(min(delay) AS BIGINT) AS min_delay,
        | CAST(max(delay) AS BIGINT) AS max_delay,
        | count(*) AS n
        |FROM (
        | SELECT l_returnflag,
        |  datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delay
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q47_date_add" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
        | strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin,

    "q17_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(k) AS BIGINT) AS sum_k, CAST(min(k) AS BIGINT) AS min_k,
        | CAST(max(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q54_string_funcs" ->
      """SELECT c_custkey,
        | upper(c_name) AS name_up,
        | concat_ws('|', lower(substring(c_name, 1, 8)),
        |  lpad(CAST(c_custkey AS VARCHAR), 6, '0')) AS name_key,
        | CAST(strpos(c_name, '1') AS BIGINT) AS pos_1,
        | CAST(length(translate(c_name, '0123456789', '')) AS BIGINT) AS alpha_len
        |FROM customer
        |WHERE c_custkey < 300
        |ORDER BY c_custkey""".stripMargin,

    "q55_conditional_agg" ->
      """SELECT l_linestatus,
        | CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
        |  FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS returned_revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "q18_case_expr" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |  WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS bucket,
        | substring(o_orderpriority, 1, 1) || '_' || o_orderstatus AS prio_status,
        | count(*) AS n
        |FROM orders
        |GROUP BY bucket, prio_status
        |ORDER BY bucket, prio_status""".stripMargin,

    "str92_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type
        |FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "str90_stream_join" ->
      """SELECT l.user_id AS user_id, l.event_id AS click_id,
        | r.event_id AS buy_id
        |FROM events l JOIN events r
        | ON l.user_id = r.user_id
        | AND l.event_type = 'click' AND r.event_type = 'purchase'
        | AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP)
        | AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 1 DAY
        |ORDER BY click_id, buy_id""".stripMargin,

    "q89_zorder" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE user_id <= 7 AND value <= 100.0
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q19_merge_upsert" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        | value AS last_value
        |FROM (SELECT user_id, event_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        | FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q20_incremental" ->
      """SELECT event_type, count(*) AS n,
        | min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events
        |WHERE event_id > (SELECT max(event_id) * 4 // 5 FROM events)
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q21_cdc_apply" ->
      """SELECT user_id, op, event_id, value FROM (
        | SELECT user_id,
        |  CASE WHEN event_type = 'signup' THEN 'I'
        |   WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |  event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        | FROM events)
        |WHERE rn = 1 AND op <> 'D'
        |ORDER BY user_id""".stripMargin,

    "q57_asof_join" ->
      """WITH e AS (
        | SELECT user_id, ts, event_id, value,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        | FROM events),
        |ed AS (SELECT user_id, ts, event_id, value FROM e WHERE rn = 1)
        |SELECT o.o_orderkey, o.o_custkey,
        | ed.event_id AS asof_event_id, ed.value AS asof_value
        |FROM (SELECT * FROM orders WHERE o_orderkey < 3000) o
        |ASOF LEFT JOIN ed ON o.o_custkey = ed.user_id AND ed.ts <= o.o_orderdate
        |ORDER BY o.o_orderkey""".stripMargin,

    "q56_interval_join" ->
      """SELECT p.event_id AS p_id, p.user_id,
        | (SELECT count(*) FROM events e
        |  WHERE e.event_type = 'error' AND e.user_id = p.user_id
        |   AND e.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts + INTERVAL 1 HOUR) AS n_err
        |FROM events p
        |WHERE p.event_type = 'purchase'
        |ORDER BY p_id""".stripMargin,

    "q49_sessionize" ->
      """WITH flagged AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, ts,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM flagged)
        |SELECT user_id,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | count(*) AS n_events
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "str48_cdc_stream" ->
      """SELECT user_id AS key, event_id AS seq, value FROM (
        | SELECT user_id, event_id, value,
        |  CASE WHEN event_type = 'signup' THEN 'I'
        |   WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        | FROM events)
        |WHERE rn = 1 AND op <> 'D'
        |ORDER BY key""".stripMargin,

    "q22_lookup_join" ->
      """SELECT p_brand, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q23_max_pt" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE date_trunc('month', o_orderdate) =
        | (SELECT max(date_trunc('month', o_orderdate)) FROM orders)
        |GROUP BY mon
        |ORDER BY mon""".stripMargin,

    "q71_view" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q72_external" ->
      """SELECT s_nationkey, count(*) AS n_suppliers,
        | CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin,

    "t24_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        | CAST(sum(list_sum(list_transform(string_split(text, ' '),
        |   w -> CAST(ceil(length(w) / 4.0) AS INT)))) AS BIGINT) AS total_subwords,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "t97_normalize_dedup" ->
      """SELECT min(doc_id) AS survivor_id, count(*) AS dup_count,
        | CAST(length(norm) AS BIGINT) AS norm_len
        |FROM (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        | FROM documents)
        |GROUP BY norm
        |ORDER BY survivor_id""".stripMargin,

    "t94_top_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 50""".stripMargin,

    "t110_line_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |chunks AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  array_to_string(list_slice(t, i*12+1, i*12+12), ' ') AS line
        | FROM toks,
        |  unnest(range(0, CAST(floor(greatest(len(t)-1, 0)/12.0) AS BIGINT) + 1)) AS u(i)),
        |lines AS (
        | SELECT * FROM chunks
        | UNION ALL
        | SELECT doc_id,
        |  (SELECT max(pos)+1 FROM chunks c WHERE c.doc_id = d.doc_id) AS pos,
        |  'please subscribe to our newsletter' AS line
        | FROM documents d WHERE doc_id % 3 = 0),
        |boiler AS (
        | SELECT line
        | FROM (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line)
        | WHERE df > 5),
        |kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM boiler))
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
        | count(*) AS kept_lines,
        | (SELECT count(*) FROM lines l WHERE l.doc_id = kept.doc_id) AS total_lines
        |FROM kept GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "t107_bigram_counts" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS t
        |  FROM documents
        |), pairs AS (
        |  SELECT t[i] AS ctx, t[i+1] AS word
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) g
        |)
        |SELECT ctx, word, count(*) AS n
        |FROM pairs GROUP BY 1, 2
        |ORDER BY n DESC, ctx, word
        |LIMIT 200""".stripMargin,

    "t25_quality" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | round(CAST(len(list_filter(string_split(text, ' '),
        |   w -> list_contains(['the','a','an','and','or','of','to','in'], w))) AS DOUBLE)
        |  / CAST(len(string_split(text, ' ')) AS DOUBLE), 5) AS stop_ratio,
        | round(CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE)
        |  / CAST(len(string_split(text, ' ')) AS DOUBLE), 5) AS mean_token_len,
        | round(
        |  (CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.5 END) * 0.5 +
        |  (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
        |    w -> list_contains(['the','a','an','and','or','of','to','in'], w))) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.02 THEN 1.0 ELSE 0.6 END) * 0.5,
        |  4) AS quality
        |FROM documents
        |WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin,

    // clean = not a benchmark id AND not an exact-text twin of a benchmark
    // doc (at threshold 0.99 with ~30-shingle docs only identical shingle
    // sets can match, which for this corpus means identical text)
    "q68_decontaminate" ->
      """SELECT lang, count(*) AS n,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents
        |WHERE doc_id % 25 <> 0
        | AND text NOT IN (SELECT text FROM documents WHERE doc_id % 25 = 0)
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "q69_repetition" ->
      """WITH g AS (
        | SELECT doc_id, string_split(text, ' ') AS t,
        |  string_split(text || ' ' || text, ' ') AS t2
        | FROM documents WHERE doc_id < 200),
        |r AS (
        | SELECT doc_id,
        |  list_transform(range(0, greatest(len(t)-2, 0) + 1),
        |   i -> array_to_string(list_slice(t, i+1, i+2), ' ')) AS grams,
        |  list_transform(range(0, greatest(len(t2)-2, 0) + 1),
        |   i -> array_to_string(list_slice(t2, i+1, i+2), ' ')) AS grams2
        | FROM g)
        |SELECT doc_id,
        | round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 5) AS rep2,
        | round(1.0 - CAST(len(list_distinct(grams2)) AS DOUBLE) / len(grams2), 5) AS rep2_doubled
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    "q66_redact" ->
      """WITH dirty AS (
        | SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com or https://ex.com/page tel 555-123-4567' AS d
        | FROM documents WHERE doc_id < 100),
        |cleaned AS (
        | SELECT doc_id,
        |  regexp_replace(
        |   regexp_replace(
        |    regexp_replace(d, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g'),
        |   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
        | FROM dirty)
        |SELECT doc_id, clean,
        | contains(clean, '<EMAIL>') AS has_email,
        | contains(clean, '@example.com') AS still_dirty
        |FROM cleaned
        |ORDER BY doc_id""".stripMargin,

    "q67_chunk" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 50),
        |chunks AS (
        | SELECT doc_id, i AS chunk_idx,
        |  array_to_string(list_slice(t, i*56+1, i*56+64), ' ') AS chunk
        | FROM toks,
        |  unnest(range(0, CAST(floor(greatest(len(t)-8-1, 0)/56.0) AS BIGINT) + 1)) AS u(i))
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        | CAST(len(string_split(chunk, ' ')) AS BIGINT) AS chunk_tokens,
        | substring(chunk, 1, 30) AS chunk_head
        |FROM chunks
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // langid heuristic replicated: marker-hit argmax, ties broken to the
    // lexicographically larger language code (Spark's array_max on
    // struct(score, lang) — hence the descending CASE order)
    "t26_langid" ->
      """WITH scored AS (
        | SELECT doc_id, lang,
        |  len(list_filter(string_split(text,' '), w -> list_contains(['der','die','das','und','ist','nicht','ein'], w))) AS s_de,
        |  len(list_filter(string_split(text,' '), w -> list_contains(['the','a','and','is','of','to','in'], w))) AS s_en,
        |  len(list_filter(string_split(text,' '), w -> list_contains(['el','la','los','y','es','un','que'], w))) AS s_es,
        |  len(list_filter(string_split(text,' '), w -> list_contains(['le','la','les','et','est','un','que'], w))) AS s_fr,
        |  len(list_filter(string_split(text,' '), w -> list_contains(['de5','shi4','le5','zai4','he2'], w))) AS s_zh
        | FROM documents),
        |pred AS (
        | SELECT doc_id, lang,
        |  CASE
        |   WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) = 0 THEN 'und'
        |   WHEN s_zh = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'zh'
        |   WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
        |   WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
        |   WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
        |   ELSE 'de' END AS predicted
        | FROM scored)
        |SELECT doc_id, lang, predicted, (predicted = lang) AS is_match
        |FROM pred
        |ORDER BY doc_id""".stripMargin,

    "d28_dedup_exact" ->
      """SELECT min(doc_id) AS survivor_id, count(*) AS dup_count
        |FROM documents
        |GROUP BY text
        |ORDER BY survivor_id""".stripMargin,

    "d62_dedup_groups" ->
      """SELECT min(doc_id) AS survivor_id, count(*) AS dup_count
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL SELECT doc_id + 100000, text FROM documents)
        |GROUP BY text
        |HAVING count(*) > 1
        |ORDER BY survivor_id""".stripMargin,

    "d100_dedup_increment" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        |        UNION ALL
        |        SELECT doc_id + 500000, text FROM documents WHERE doc_id % 10 = 0),
        |intra AS (SELECT doc_id, text FROM (
        |            SELECT doc_id, text,
        |                   min(doc_id) OVER (PARTITION BY text) AS surv
        |            FROM inc)
        |          WHERE doc_id = surv)
        |SELECT doc_id, length(text) AS n_len FROM intra
        |WHERE text NOT IN (SELECT text FROM base)
        |ORDER BY doc_id""".stripMargin,

    "d63_dup_clusters" ->
      """SELECT id, cluster_id FROM (
        | SELECT doc_id AS id, doc_id AS cluster_id FROM documents
        | UNION ALL SELECT doc_id + 100000, doc_id FROM documents
        | UNION ALL SELECT doc_id + 200000, doc_id FROM documents)
        |ORDER BY id""".stripMargin,

    "q65_token_pack" ->
      """WITH toks AS (
        | SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |packed AS (
        | SELECT lang, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048) AS BIGINT) AS bin
        | FROM toks)
        |SELECT lang, bin, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tok_sum
        |FROM packed
        |GROUP BY lang, bin
        |ORDER BY lang, bin""".stripMargin,

    "q113_corpus_split" ->
      """SELECT CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val'
        |  ELSE 'test' END AS split,
        | count(*) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM (SELECT o_orderkey,
        |  ((o_orderkey * 2654435761) % 1000003) % 1000 AS b FROM orders)
        |GROUP BY 1
        |ORDER BY split""".stripMargin,

    "q64_hash_sample" ->
      """SELECT o_orderstatus, count(*) AS n,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders
        |WHERE ((o_orderkey * 2654435761) % 1000003) % 1000 < 250
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // Double-precision cosine spelled out element-wise: DuckDB's
    // list_cosine_similarity computes in float32, ours in float64.
    "s32_ann_brute" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id AS id, round(
        |  list_sum(list_transform(range(1,65), i -> CAST(e.embedding[i] AS DOUBLE)*CAST(q.qe[i] AS DOUBLE))) /
        |  (sqrt(list_sum(list_transform(range(1,65), i -> CAST(e.embedding[i] AS DOUBLE)*CAST(e.embedding[i] AS DOUBLE)))) *
        |   sqrt(list_sum(list_transform(range(1,65), i -> CAST(q.qe[i] AS DOUBLE)*CAST(q.qe[i] AS DOUBLE))))), 5) AS cosine
        |FROM embeddings e, q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, id
        |LIMIT 10""".stripMargin,

    "q36_regexp_extract" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        | FROM events)
        |WHERE k % 7 = 0
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q51_csv_ingest" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q59_avro_ingest" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q98_avro_typed" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price,
        | CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_date,
        | CAST(max(o_orderdate) AS VARCHAR) AS max_ts
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q60_decimal_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price,
        | CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS min_price,
        | CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS max_price,
        | CAST(CAST(sum(CAST(CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS VARCHAR) AS sum_disc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q61_map_funcs" ->
      """SELECT n_nationkey,
        | m['name'][1] AS name_v,
        | CAST(cardinality(m) AS BIGINT) AS m_size,
        | array_to_string(map_keys(m), ',') AS ks,
        | array_to_string(map_values(m), '|') AS vs
        |FROM (SELECT n_nationkey,
        |  MAP(['nk','name'], [CAST(n_nationkey AS VARCHAR), n_name]) AS m
        | FROM nation)
        |ORDER BY n_nationkey""".stripMargin,

    "q37_explode_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20""".stripMargin,

    "str39_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hr,
        | event_type, count(*) AS n
        |FROM events
        |GROUP BY hr, event_type
        |ORDER BY hr, event_type""".stripMargin,

    "m34_multimodal_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | CAST(ceil(octet_length(encode(text)) / 1024.0) AS BIGINT) AS n_chunks
        |FROM documents
        |WHERE doc_id < 200
        |ORDER BY doc_id""".stripMargin,

    // replicates MediaDecode.decodeStub's (docId, byteLen) arithmetic —
    // the stub is deliberately SQL-expressible so these plans get a value
    // check, not just a row count
    "m43_frame_sample" ->
      """WITH meta AS (SELECT doc_id, octet_length(encode(text)) AS len,
        |  (doc_id * 131071 + octet_length(encode(text)) * 8191) % 1000003 AS h
        | FROM documents),
        |vids AS (SELECT doc_id,
        |  1 + (doc_id * 17 + len) % 300 AS n_frames,
        |  (doc_id * 97 + len * 13) % 60000 AS duration_ms
        | FROM meta WHERE h % 3 = 2)
        |SELECT doc_id, CAST(ts_ms // 1000 AS BIGINT) AS frame_idx, ts_ms
        |FROM (SELECT doc_id,
        |  unnest(list_slice(generate_series(0, duration_ms, 1000), 1, 8)) AS ts_ms
        | FROM vids WHERE n_frames > 1)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "m70_resize" ->
      """WITH meta AS (SELECT doc_id, octet_length(encode(text)) AS len
        | FROM documents WHERE doc_id < 300),
        |wh AS (SELECT doc_id,
        |  CAST(64 + (doc_id * 37 + len * 11) % 1024 AS INTEGER) AS width,
        |  CAST(64 + (doc_id * 59 + len * 7) % 1024 AS INTEGER) AS height
        | FROM meta),
        |sc AS (SELECT doc_id, width, height,
        |  least(CAST(1 AS DOUBLE), CAST(256 AS DOUBLE) / greatest(width, height)) AS scl
        | FROM wh)
        |SELECT doc_id, width, height,
        |  CAST(floor(width * scl + 0.5) AS INTEGER) AS out_width,
        |  CAST(floor(height * scl + 0.5) AS INTEGER) AS out_height
        |FROM sc ORDER BY doc_id""".stripMargin,

    "t73_gopher_quality" ->
      """WITH g AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id,
        |  len(t) AS n_words,
        |  (length(text) - len(t) + 1.0) / len(t) AS mean_len,
        |  len(list_filter(t, w -> w IN ('the','a','an','and','or','of','to','in'))) * 1.0
        |    / len(t) AS stop_ratio,
        |  1.0 - len(list_distinct(list_transform(range(0, greatest(len(t)-2, 0) + 1),
        |      i -> array_to_string(list_slice(t, i+1, i+2), ' ')))) * 1.0
        |    / (greatest(len(t)-2, 0) + 1) AS rep2
        | FROM g)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        | round(mean_len, 4) AS mean_len, round(stop_ratio, 4) AS stop_ratio,
        | round(rep2, 5) AS rep2,
        | (n_words BETWEEN 30 AND 10000 AND mean_len BETWEEN 3.0 AND 5.0
        |  AND stop_ratio >= 0.02 AND rep2 <= 0.08) AS keep
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    "d74_span_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |spans AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  array_to_string(list_slice(t, i*8+1, i*8+8), ' ') AS span
        | FROM toks,
        |  unnest(range(0, CAST(floor(greatest(len(t)-1, 0)/8.0) AS BIGINT) + 1)) AS u(i)),
        |kept AS (
        | SELECT doc_id, pos, span,
        |  row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        | FROM spans)
        |SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS text,
        | count(*) AS kept_spans
        |FROM kept WHERE rn = 1
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q75_bloom_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q76_stratified_sample" ->
      """SELECT source, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents
        |WHERE ((doc_id * 2654435761) % 1000003) % 1000 <
        | CASE source WHEN 'src0' THEN 750 WHEN 'src1' THEN 125
        |  WHEN 'src2' THEN 500 ELSE 250 END
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "s77_quantize" ->
      """WITH q AS (
        | SELECT vec_id,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        | FROM embeddings),
        |qq AS (
        | SELECT e.vec_id, q.scale,
        |  list_transform(e.embedding, x -> CASE WHEN q.scale = 0 THEN 0
        |    ELSE CAST(floor(CAST(x AS DOUBLE) / q.scale + 0.5) AS INT) END) AS qv
        | FROM embeddings e JOIN q ON e.vec_id = q.vec_id)
        |SELECT vec_id, round(scale, 6) AS scale_r,
        | CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
        | CAST(list_aggregate(list_transform(qv, x -> abs(x)), 'max') AS BIGINT) AS q_absmax
        |FROM qq
        |ORDER BY vec_id""".stripMargin,

    "q78_pivot" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        | count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        | count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q79_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        | count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS ck
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q81_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "str82_stream_session" ->
      """WITH flagged AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, ts,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM flagged)
        |SELECT user_id,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | count(*) AS n
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q83_unpivot" ->
      """WITH agg AS (
        | SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS disc
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, value FROM (
        | SELECT l_returnflag, 'qty' AS measure, qty AS value FROM agg
        | UNION ALL SELECT l_returnflag, 'price', price FROM agg
        | UNION ALL SELECT l_returnflag, 'disc', disc FROM agg)
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q333_manifest_commit" ->
      """WITH o AS (
        | SELECT o_orderstatus AS st, o_orderkey AS ok,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        | FROM orders),
        |final AS (
        | SELECT * FROM o WHERE st <> 'F'
        | UNION ALL SELECT * FROM o WHERE st = 'F' AND ok % 2 = 0
        | UNION ALL SELECT * FROM o WHERE st = 'O' AND ok % 5 = 0)
        |SELECT st, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents
        |FROM final
        |GROUP BY st
        |ORDER BY st""".stripMargin,

    "q346_time_travel" ->
      """WITH o AS (
        | SELECT o_orderkey AS ok,
        |  CAST(o_orderkey % 4 AS VARCHAR) AS pt
        | FROM orders),
        |cur AS (
        | SELECT 'current' AS tag, pt, count(*) AS n,
        |  CAST(sum(ok) AS BIGINT) AS sum_ok
        | FROM o
        | WHERE (pt = '2' AND ok % 3 = 2 AND ok % 4 = 2)
        |  OR (pt <> '2' AND ok % 3 IN (0, 1))
        | GROUP BY pt),
        |p1 AS (
        | SELECT 'p1' AS tag, pt, count(*) AS n,
        |  CAST(sum(ok) AS BIGINT) AS sum_ok
        | FROM o WHERE ok % 3 IN (0, 1) GROUP BY pt),
        |rb AS (
        | SELECT 'rolled_back' AS tag, pt, count(*) AS n,
        |  CAST(sum(ok) AS BIGINT) AS sum_ok
        | FROM o WHERE ok % 3 = 0 GROUP BY pt)
        |SELECT tag, pt, n, sum_ok
        |FROM (SELECT * FROM cur UNION ALL SELECT * FROM p1
        |      UNION ALL SELECT * FROM rb)
        |ORDER BY tag, pt""".stripMargin,

    "q361_catalog_time_travel" ->
      """WITH o AS (
        | SELECT o_orderkey AS ok,
        |  CAST(o_orderkey % 4 AS VARCHAR) AS pt
        | FROM orders),
        |cur AS (
        | SELECT 'current' AS tag, pt, count(*) AS n,
        |  CAST(sum(ok) AS BIGINT) AS sum_ok
        | FROM o
        | WHERE (pt = '2' AND ok % 3 = 2)
        |  OR (pt <> '2' AND ok % 3 IN (0, 1))
        | GROUP BY pt),
        |p1 AS (
        | SELECT 'p1' AS tag, pt, count(*) AS n,
        |  CAST(sum(ok) AS BIGINT) AS sum_ok
        | FROM o WHERE ok % 3 IN (0, 1) GROUP BY pt),
        |p0 AS (
        | SELECT 'p0' AS tag, pt, count(*) AS n,
        |  CAST(sum(ok) AS BIGINT) AS sum_ok
        | FROM o WHERE ok % 3 = 0 GROUP BY pt),
        |h AS (
        | SELECT 'history' AS tag, '*' AS pt,
        |  CAST(3 AS BIGINT) AS n, CAST(2 AS BIGINT) AS sum_ok)
        |SELECT tag, pt, n, sum_ok
        |FROM (SELECT * FROM cur UNION ALL SELECT * FROM p1
        |      UNION ALL SELECT * FROM p0 UNION ALL SELECT * FROM h)
        |ORDER BY tag, pt""".stripMargin,

    "q351_join_explosion" ->
      """WITH ca AS (
        | SELECT CAST(l_partkey AS VARCHAR) AS key,
        |  count(*) AS left_rows
        | FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
        |cb AS (
        | SELECT CAST(l_partkey AS VARCHAR) AS key,
        |  count(*) AS right_rows
        | FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
        |c AS (
        | SELECT ca.key, left_rows, right_rows,
        |  CAST(CAST(left_rows AS DECIMAL(19,0)) *
        |   CAST(right_rows AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS o
        | FROM ca JOIN cb ON ca.key = cb.key),
        |t AS (SELECT CAST(coalesce(sum(o), 0) AS DECIMAL(38,0)) AS tot
        | FROM c)
        |SELECT key, left_rows, right_rows,
        | CAST(CAST(o AS DECIMAL(19,0)) AS BIGINT) AS out_rows,
        | CAST(CAST(tot AS DECIMAL(19,0)) AS BIGINT) AS total_out_rows,
        | CAST(o AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |FROM c, t
        |ORDER BY out_rows DESC, key
        |LIMIT 25""".stripMargin,

    "q352_target_encode" ->
      """WITH b AS (
        | SELECT o_orderkey AS id, o_orderpriority AS category,
        |  CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT) AS y
        | FROM orders
        | WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        |  AND NOT isnan(o_totalprice)),
        |pc AS (
        | SELECT category, count(*) AS n_category,
        |  CAST(sum(CAST(y AS DECIMAL(19,0))) AS DECIMAL(28,0)) AS sc
        | FROM b GROUP BY category),
        |tt AS (
        | SELECT CAST(sum(n_category) AS DECIMAL(19,0)) AS n,
        |  CAST(sum(sc) AS DECIMAL(38,0)) AS s
        | FROM pc)
        |SELECT id, category, n_category,
        | CASE WHEN CAST(n_category - 1 AS DOUBLE) + 10.0 > 0.0 THEN
        |  (CAST(sc AS DOUBLE) - CAST(y AS DOUBLE) +
        |   10.0 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) /
        |  ((CAST(n_category - 1 AS DOUBLE) + 10.0) * 1000000.0)
        | END AS encoded
        |FROM b JOIN pc USING (category), tt
        |WHERE id % 37 = 0
        |ORDER BY id""".stripMargin,

    "q87_compact" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        | count(*) AS cnt,
        | CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM orders
        |GROUP BY 1
        |ORDER BY yr""".stripMargin,

    "q86_stats_agg" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 6) AS c,
        | round(stddev_samp(l_quantity), 6) AS sd,
        | round(covar_samp(l_quantity, l_discount), 6) AS cv
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q85_convert_tz" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS utc,
        | strftime(o_orderdate + INTERVAL 8 HOUR, '%Y-%m-%d %H:%M:%S') AS sh
        |FROM orders
        |WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,

    "q84_window_dist" ->
      """SELECT c_custkey, c_nationkey,
        | ntile(4) OVER w AS quartile,
        | CAST(floor(percent_rank() OVER w *
        |   (count(*) OVER (PARTITION BY c_nationkey) - 1) + 0.5)
        |  AS BIGINT) AS pr_num,
        | CAST(floor(cume_dist() OVER w *
        |   count(*) OVER (PARTITION BY c_nationkey) + 0.5) AS BIGINT) AS cd_num
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "t121_top_tokens_by_lang" ->
      """WITH counts AS (
        | SELECT lang AS "group", term AS token, count(*) AS n
        | FROM (SELECT lang,
        |   unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
        |  FROM documents)
        | GROUP BY 1, 2),
        |ranked AS (
        | SELECT "group", token, n,
        |  CAST(row_number() OVER (PARTITION BY "group"
        |    ORDER BY n DESC, token) AS BIGINT) AS rank
        | FROM counts)
        |SELECT "group", token, n, rank FROM ranked
        |WHERE rank <= 5
        |ORDER BY "group", rank""".stripMargin,

    "t122_snippets" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  list_filter(string_split(text, ' '), t -> t <> '') AS t
        | FROM documents),
        |pos AS (
        | SELECT doc_id, t,
        |  least(nullif(list_position(t, 'vector'), 0),
        |        nullif(list_position(t, 'merge'), 0)) AS p
        | FROM toks)
        |SELECT doc_id, CAST(p AS BIGINT) AS match_pos,
        | array_to_string(
        |  list_slice(t, greatest(1, p - 4), least(len(t), p + 4)), ' ') AS snippet
        |FROM pos
        |WHERE p IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    "t120_corpus_profile" ->
      """WITH base AS (
        | SELECT lang, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |  CAST(length(text) AS BIGINT) AS nc
        | FROM documents)
        |SELECT * FROM (
        | SELECT 'lang' AS dim, CAST(lang AS VARCHAR) AS key,
        |  count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  round(avg(nt), 4) AS avg_tokens,
        |  CAST(sum(nc) AS BIGINT) AS total_chars,
        |  round(avg(nc), 4) AS avg_chars
        | FROM base GROUP BY lang
        | UNION ALL
        | SELECT 'source', CAST(source AS VARCHAR), count(*),
        |  CAST(sum(nt) AS BIGINT), round(avg(nt), 4),
        |  CAST(sum(nc) AS BIGINT), round(avg(nc), 4)
        | FROM base GROUP BY source
        | UNION ALL
        | SELECT 'all', '', count(*),
        |  CAST(sum(nt) AS BIGINT), round(avg(nt), 4),
        |  CAST(sum(nc) AS BIGINT), round(avg(nc), 4)
        | FROM base)
        |ORDER BY dim, key""".stripMargin,

    "t115_bm25" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
        | FROM documents),
        |base AS (SELECT doc_id, t, len(t) AS dl FROM toks),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
        |tf AS (
        | SELECT doc_id, dl, term, count(*) AS tf
        | FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
        | WHERE term IN ('merge', 'vector', 'window')
        | GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        | SELECT doc_id,
        |  round(sum(
        |   ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |   CAST(tf AS DOUBLE) * (1.2 + 1.0) /
        |    (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |  ), 4) AS score
        | FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        | GROUP BY doc_id)
        |SELECT doc_id, score FROM scored
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin,

    "t116_c4_filter" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |chunks AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  array_to_string(list_slice(t, i*10+1, i*10+10), ' ') || '.' AS line
        | FROM toks,
        |  unnest(range(0, CAST(floor(greatest(len(t)-1, 0)/10.0) AS BIGINT) + 1)) AS u(i)),
        |kept AS (
        | SELECT * FROM chunks
        | WHERE (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?' OR line LIKE '%"')
        |  AND len(list_filter(string_split(line, ' '), w -> w <> '')) >= 4
        |  AND NOT contains(lower(line), 'lorem ipsum')
        |  AND NOT contains(lower(line), 'javascript')
        |  AND NOT contains(line, '{')),
        |agg AS (
        | SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
        |  count(*) AS kept_lines
        | FROM kept GROUP BY doc_id HAVING count(*) >= 3)
        |SELECT a.doc_id, a.text, a.kept_lines,
        | (SELECT count(*) FROM chunks c WHERE c.doc_id = a.doc_id)
        |  + (CASE WHEN a.doc_id % 7 = 0 THEN 1 ELSE 0 END)
        |  + (CASE WHEN a.doc_id % 11 = 0 THEN 1 ELSE 0 END)
        |  + (CASE WHEN a.doc_id % 13 = 0 THEN 1 ELSE 0 END)
        |  + (CASE WHEN a.doc_id % 5 = 0 THEN 1 ELSE 0 END) AS total_lines
        |FROM agg a
        |ORDER BY doc_id""".stripMargin,

    "t117_ngram_novelty" ->
      """WITH ev AS (
        | SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        | UNION ALL
        | SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |base_grams AS (
        | SELECT DISTINCT array_to_string(list_slice(t, i+1, i+3), ' ') AS gram
        | FROM (SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id % 2 = 0),
        |  unnest(range(0, greatest(len(t)-2, 0))) AS u(i)),
        |ev_grams AS (
        | SELECT doc_id, array_to_string(list_slice(t, i+1, i+3), ' ') AS gram
        | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM ev),
        |  unnest(range(0, greatest(len(t)-2, 0))) AS u(i)),
        |counted AS (
        | SELECT g.doc_id, count(*) AS n_grams,
        |  count(CASE WHEN b.gram IS NULL THEN 1 END) AS novel_grams
        | FROM ev_grams g LEFT JOIN base_grams b ON g.gram = b.gram
        | GROUP BY g.doc_id)
        |SELECT e.doc_id,
        | coalesce(c.n_grams, 0) AS n_grams,
        | coalesce(c.novel_grams, 0) AS novel_grams,
        | round(CAST(c.novel_grams AS DOUBLE) / c.n_grams, 5) AS novelty
        |FROM (SELECT DISTINCT doc_id FROM ev) e LEFT JOIN counted c USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "t123_hybrid_rrf" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
        | FROM documents),
        |base AS (SELECT doc_id, t, len(t) AS dl FROM toks),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
        |tf AS (
        | SELECT doc_id, dl, term, count(*) AS tf
        | FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
        | WHERE term IN ('merge', 'vector', 'window')
        | GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |lex AS (
        | SELECT doc_id AS id,
        |  round(sum(
        |   ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |   CAST(tf AS DOUBLE) * (1.2 + 1.0) /
        |    (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |  ), 4) AS score
        | FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        | GROUP BY doc_id
        | ORDER BY score DESC, id LIMIT 50),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
        |sem AS (
        | SELECT vec_id AS id,
        |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |                               CAST(qv AS DOUBLE[])), 4) AS score
        | FROM embeddings CROSS JOIN q
        | ORDER BY score DESC, id LIMIT 50),
        |ranks AS (
        | SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rnk FROM lex
        | UNION ALL
        | SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rnk FROM sem)
        |SELECT id AS doc_id,
        | round(sum(1.0 / (60.0 + rnk)), 6) AS rrf_score,
        | count(*) AS n_lists
        |FROM ranks GROUP BY id
        |ORDER BY rrf_score DESC, doc_id
        |LIMIT 20""".stripMargin,

    "d124_domain_cap" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |QUALIFY row_number()
        |  OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 60
        |ORDER BY doc_id""".stripMargin,

    "d125_dedup_report" ->
      """WITH corpus AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 500000, text FROM documents WHERE doc_id % 5 = 0
        | UNION ALL
        | SELECT doc_id + 600000, text FROM documents WHERE doc_id % 25 = 0),
        |groups AS (SELECT text, count(*) AS sz FROM corpus GROUP BY text)
        |SELECT * FROM (
        | SELECT 'size' AS dim, CAST(sz AS BIGINT) AS group_size,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(sz) AS BIGINT) AS n_rows
        | FROM groups GROUP BY sz
        | UNION ALL
        | SELECT 'all', 0, CAST(count(*) AS BIGINT), CAST(sum(sz) AS BIGINT)
        | FROM groups)
        |ORDER BY dim, group_size""".stripMargin,

    "d126_mixture_plan" ->
      """WITH sizes AS (
        | SELECT coalesce(CAST(lang AS VARCHAR), '') AS domain,
        |  CAST(count(*) AS DOUBLE) AS n
        | FROM documents GROUP BY 1),
        |w AS (SELECT sum(pow(n, 0.5)) AS wsum FROM sizes)
        |SELECT domain, CAST(n AS BIGINT) AS n,
        | round(pow(n, 0.5) / wsum, 6) AS share,
        | round(least(1.0, pow(n, 0.5) / wsum * 300.0 / n), 6) AS rate,
        | CAST(floor(n * least(1.0, pow(n, 0.5) / wsum * 300.0 / n) + 0.5)
        |  AS BIGINT) AS expected_n
        |FROM sizes CROSS JOIN w
        |ORDER BY domain""".stripMargin,

    "str127_stream_topn" ->
      """WITH c AS (
        | SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hr,
        |  event_type, count(*) AS n
        | FROM events GROUP BY hr, event_type),
        |r AS (
        | SELECT hr, event_type, n, row_number()
        |   OVER (PARTITION BY hr ORDER BY n DESC, event_type) AS rank
        | FROM c)
        |SELECT hr, event_type, n, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3
        |ORDER BY hr, rank""".stripMargin,

    "t128_kll_quantiles" ->
      """WITH s AS (
        | SELECT lang, count(*) AS n,
        |  list_sort(list(CAST(n_chars AS DOUBLE))) AS v
        | FROM documents GROUP BY lang)
        |SELECT lang, CAST(n AS BIGINT) AS n,
        | round(v[CAST(ceil(0.5 * n) AS INT)], 2) AS p50,
        | round(v[CAST(ceil(0.9 * n) AS INT)], 2) AS p90
        |FROM s ORDER BY lang""".stripMargin,

    "q132_curriculum" ->
      """SELECT doc_id, shard, seq FROM (
        | SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY doc_id % 8
        |    ORDER BY n_chars, doc_id) AS BIGINT) AS seq
        | FROM documents)
        |ORDER BY shard, seq""".stripMargin,

    "t133_theta_overlap" ->
      """WITH a AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0),
        |b AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 = 0)
        |SELECT
        | (SELECT count(*) FROM a) AS n_a,
        | (SELECT count(*) FROM b) AS n_b,
        | (SELECT count(*) FROM a WHERE text IN (SELECT text FROM b)) AS n_overlap,
        | (SELECT count(*) FROM a WHERE text NOT IN (SELECT text FROM b)) AS n_only_a,
        | (SELECT count(*) FROM (SELECT text FROM a UNION SELECT text FROM b)) AS n_union""".stripMargin,

    // step-for-step mirror of UrlOps.normalizeUrl (RE2 \1 backrefs instead
    // of Java $1; 'g' everywhere because Spark regexp_replace is global)
    "q134_url_normalize" ->
      """WITH raw AS (
        | SELECT doc_id,
        |  'HTTPS://User:pw@WWW.' || source || '.Example.COM:443/Docs/' || doc_id ||
        |  CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=feed&id=' ELSE '?id=' END ||
        |  doc_id ||
        |  CASE WHEN doc_id % 2 = 0 THEN '&utm_campaign=x#frag' ELSE '#sec' END AS url
        | FROM documents WHERE doc_id < 400),
        |n1 AS (SELECT doc_id, url,
        |  regexp_replace(trim(url), '#.*$', '', 'g') AS u FROM raw),
        |n2 AS (SELECT doc_id, url,
        |  lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', 0)) ||
        |  regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', '', 'g') AS u
        | FROM n1),
        |n3 AS (SELECT doc_id, url,
        |  regexp_replace(u, '//[^/@?#]*@', '//', 'g') AS u FROM n2),
        |n4 AS (SELECT doc_id, url,
        |  regexp_replace(u, '^(https://[^/:?#]*):443([/?].*)?$', '\1\2', 'g') AS u
        | FROM n3),
        |n5 AS (SELECT doc_id, url,
        |  regexp_replace(u, '^(http://[^/:?#]*):80([/?].*)?$', '\1\2', 'g') AS u
        | FROM n4),
        |n6 AS (SELECT doc_id, url,
        |  regexp_replace(u, '^([a-z][a-z0-9+.-]*://)www\.', '\1', 'g') AS u
        | FROM n5),
        |n7 AS (SELECT doc_id, url,
        |  regexp_replace(u, '&(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref|ref_src)=[^&#]*', '', 'g') AS u
        | FROM n6),
        |n8 AS (SELECT doc_id, url,
        |  regexp_replace(u, '\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref|ref_src)=[^&#]*&', '?', 'g') AS u
        | FROM n7),
        |n9 AS (SELECT doc_id, url,
        |  regexp_replace(u, '\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref|ref_src)=[^&#]*$', '', 'g') AS u
        | FROM n8),
        |n10 AS (SELECT doc_id, url,
        |  regexp_replace(regexp_replace(u, '[?&]$', '', 'g'), '/+$', '', 'g') AS u
        | FROM n9),
        |fin AS (SELECT doc_id, url, u AS norm_url,
        |  lower(regexp_extract(trim(url),
        |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)) AS host
        | FROM n10)
        |SELECT doc_id, url, norm_url, host,
        | regexp_extract(host,
        |  '([^.]+\.(?:co|com|net|org|gov|edu|ac)\.[a-z]{2}|[^.]+\.[^.]+)$', 1) AS domain
        |FROM fin ORDER BY doc_id""".stripMargin,

    // independent oracle: derives the canonical URL arithmetically, never
    // running the normalization pipeline the engine uses
    "d135_url_dedup" ->
      """SELECT 'https://corpus.org/page/' || (doc_id % 100) AS norm_url,
        | min(doc_id) AS keep_doc_id, count(*) AS n_urls
        |FROM documents WHERE doc_id < 500
        |GROUP BY 1 ORDER BY norm_url""".stripMargin,

    // independent oracle: expected prose built directly from the columns
    "q136_html_extract" ->
      """SELECT doc_id, 'Doc ' || doc_id || ' ' || text || ' & tail' AS clean
        |FROM documents WHERE doc_id < 300
        |ORDER BY doc_id""".stripMargin,

    "d137_soft_dedup" ->
      """SELECT doc_id,
        | CAST(count(*) OVER (PARTITION BY text) AS BIGINT) AS dup_count,
        | CAST(1.0 AS DOUBLE) / count(*) OVER (PARTITION BY text) AS weight
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t146_unicode_normalize" ->
      """SELECT doc_id,
        | trim(regexp_replace(
        |  nfc_normalize(lower(text || ' Cafe' || chr(769) || ' ÉLAN  x')),
        |  '\s+', ' ', 'g')) AS key
        |FROM documents WHERE doc_id < 200
        |ORDER BY doc_id""".stripMargin,

    "q147_redact_extended" ->
      """WITH dirty AS (
        | SELECT doc_id,
        |  text || ' contact a' || doc_id || '@ex.org ip 10.0.' ||
        |  (doc_id % 256) || '.7 ssn 123-45-6789 tel 555-123-4567' AS d
        | FROM documents WHERE doc_id < 300)
        |SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(d,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   'https?://[^ ]+', '<URL>', 'g'),
        |   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |   '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |   '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS clean
        |FROM dirty ORDER BY doc_id""".stripMargin,

    "q143_snapshot_diff" ->
      """WITH base AS (
        | SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |b AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
        |a AS (SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
        |       ELSE o_totalprice END AS o_totalprice
        | FROM base WHERE o_orderkey % 5 <> 0),
        |j AS (
        | SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
        |  coalesce(a.o_totalprice, b.o_totalprice) AS o_totalprice,
        |  CASE WHEN b.o_orderkey IS NULL THEN 'I'
        |       WHEN a.o_orderkey IS NULL THEN 'D'
        |       WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
        |         OR a.o_totalprice IS DISTINCT FROM b.o_totalprice THEN 'U'
        |  END AS op
        | FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey)
        |SELECT * FROM j WHERE op IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "q144_expectations" ->
      """WITH agg AS (
        | SELECT count(*) AS n,
        |  sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS v_qty,
        |  sum(CASE WHEN l_shipdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31'
        |      THEN 0 ELSE 1 END) AS v_ship,
        |  sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS v_price,
        |  sum(CASE WHEN l_discount BETWEEN 0 AND 0.05 THEN 0 ELSE 1 END) AS v_disc
        | FROM lineitem),
        |r AS (
        | SELECT 'qty_in_range' AS "check", CAST(v_qty AS BIGINT) AS v,
        |   CAST(0.0 AS DOUBLE) AS tol, n FROM agg
        | UNION ALL SELECT 'ship_in_era', CAST(v_ship AS BIGINT),
        |   CAST(0.0 AS DOUBLE), n FROM agg
        | UNION ALL SELECT 'positive_price', CAST(v_price AS BIGINT),
        |   CAST(0.0 AS DOUBLE), n FROM agg
        | UNION ALL SELECT 'discount_band', CAST(v_disc AS BIGINT),
        |   CAST(0.5 AS DOUBLE), n FROM agg)
        |SELECT "check", CAST(n AS BIGINT) AS n_rows, v AS n_violations,
        | CAST(v AS DOUBLE) / n AS violation_rate,
        | CAST(v AS DOUBLE) / n <= tol AS passed
        |FROM r ORDER BY "check"""".stripMargin,

    "t140_score_calibrate" ->
      """SELECT doc_id, lang, n_chars,
        | percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS calibrated
        |FROM documents ORDER BY doc_id""".stripMargin,

    // full re-derivation of k-gram-coverage substring dedup: window
    // n-grams, canonical = min (doc, pos), covered positions cut, text
    // rebuilt in order
    "d138_substring_dedup" ->
      """WITH docs AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0
        |   THEN text || ' common tail sentence repeated across many documents'
        |   ELSE text END AS text
        | FROM documents WHERE doc_id < 300),
        |words AS (
        | SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS idx, s.t[g.i] AS w
        | FROM docs, LATERAL (SELECT string_split(text, ' ') AS t) s,
        |      LATERAL (SELECT unnest(generate_series(1, len(s.t))) AS i) g),
        |grams AS (
        | SELECT doc_id, idx AS pos,
        |  string_agg(w, ' ') OVER (PARTITION BY doc_id ORDER BY idx
        |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS g,
        |  count(*) OVER (PARTITION BY doc_id ORDER BY idx
        |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS cnt
        | FROM words),
        |full_grams AS (SELECT doc_id, pos, g FROM grams WHERE cnt = 8),
        |canon AS (SELECT g, min(doc_id * 1000000 + pos) AS m
        | FROM full_grams GROUP BY g),
        |covered AS (
        | SELECT f.doc_id, f.pos FROM full_grams f JOIN canon c ON f.g = c.g
        | WHERE f.doc_id * 1000000 + f.pos <> c.m),
        |coveredpos AS (
        | SELECT DISTINCT doc_id, pos + o.o AS idx
        | FROM covered, (SELECT UNNEST(range(0, 8)) AS o) o),
        |kept AS (
        | SELECT w.doc_id, w.idx, w.w FROM words w
        | WHERE NOT EXISTS (SELECT 1 FROM coveredpos c
        |   WHERE c.doc_id = w.doc_id AND c.idx = w.idx)),
        |rebuilt AS (
        | SELECT doc_id, string_agg(w, ' ' ORDER BY idx) AS clean_text,
        |  count(*) AS n_kept
        | FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
        | CAST(len(string_split(d.text, ' ')) - coalesce(r.n_kept, 0) AS BIGINT)
        |  AS n_removed
        |FROM docs d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q149_funnel" ->
      """WITH s1 AS (
        | SELECT user_id, min(ts) AS t1 FROM events
        | WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        | SELECT e.user_id, min(e.ts) AS t2 FROM events e
        | JOIN s1 ON e.user_id = s1.user_id
        | WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (
        | SELECT e.user_id, min(e.ts) AS t3 FROM events e
        | JOIN s2 ON e.user_id = s2.user_id
        | WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id),
        |c AS (SELECT (SELECT count(*) FROM s1) AS u1,
        |  (SELECT count(*) FROM s2) AS u2,
        |  (SELECT count(*) FROM s3) AS u3)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS step, CAST(u1 AS BIGINT) AS users,
        |  round(CAST(u1 AS DOUBLE) / u1, 6) AS conversion FROM c
        | UNION ALL SELECT CAST(2 AS BIGINT), CAST(u2 AS BIGINT),
        |  round(CAST(u2 AS DOUBLE) / u1, 6) FROM c
        | UNION ALL SELECT CAST(3 AS BIGINT), CAST(u3 AS BIGINT),
        |  round(CAST(u3 AS DOUBLE) / u1, 6) FROM c) f
        |ORDER BY step""".stripMargin,

    "d150_group_sample" ->
      """SELECT source, doc_id FROM (
        | SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source
        |   ORDER BY ((doc_id % 1000003) * 427799) % 1000003, doc_id) AS rn
        | FROM documents) t
        |WHERE rn <= 20
        |ORDER BY source, doc_id""".stripMargin,

    "t151_script_profile" ->
      """WITH spiced AS (
        | SELECT doc_id,
        |  text || CASE
        |   WHEN lang = 'zh' THEN ' 汉字文本分析 中文'
        |   WHEN lang = 'es' THEN ' mañana señor, ¿qué?'
        |   WHEN lang = 'de' THEN ' Straße Müller Größe'
        |   WHEN lang = 'fr' THEN ' déjà été à côté'
        |   WHEN lang = 'en' AND doc_id % 7 = 0 THEN ' Привет мир'
        |   ELSE ' plain ascii tail' END AS t
        | FROM documents WHERE doc_id < 300),
        |cnt AS (
        | SELECT doc_id,
        |  length(t) - length(regexp_replace(t,
        |   '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS latin,
        |  length(t) - length(regexp_replace(t,
        |   '[\x{0400}-\x{04FF}]', '', 'g')) AS cyrillic,
        |  length(t) - length(regexp_replace(t,
        |   '[\x{0370}-\x{03FF}]', '', 'g')) AS greek,
        |  length(t) - length(regexp_replace(t,
        |   '[\x{0600}-\x{06FF}]', '', 'g')) AS arabic,
        |  length(t) - length(regexp_replace(t,
        |   '[\x{0590}-\x{05FF}]', '', 'g')) AS hebrew,
        |  length(t) - length(regexp_replace(t,
        |   '[\x{0900}-\x{097F}]', '', 'g')) AS devanagari,
        |  length(t) - length(regexp_replace(t,
        |   '[\x{2E80}-\x{9FFF}\x{F900}-\x{FAFF}]', '', 'g')) AS cjk,
        |  length(t) - length(regexp_replace(t,
        |   '[\x{AC00}-\x{D7AF}]', '', 'g')) AS hangul
        | FROM spiced),
        |prof AS (
        | SELECT *,
        |  latin + cyrillic + greek + arabic + hebrew + devanagari
        |   + cjk + hangul AS script_letters,
        |  greatest(latin, cyrillic, greek, arabic, hebrew, devanagari,
        |   cjk, hangul) AS mx
        | FROM cnt)
        |SELECT doc_id, CAST(latin AS BIGINT) AS latin,
        | CAST(cyrillic AS BIGINT) AS cyrillic, CAST(cjk AS BIGINT) AS cjk,
        | CAST(script_letters AS BIGINT) AS script_letters,
        | CASE WHEN mx = 0 THEN 'none'
        |  WHEN latin = mx THEN 'latin'
        |  WHEN cyrillic = mx THEN 'cyrillic'
        |  WHEN greek = mx THEN 'greek'
        |  WHEN arabic = mx THEN 'arabic'
        |  WHEN hebrew = mx THEN 'hebrew'
        |  WHEN devanagari = mx THEN 'devanagari'
        |  WHEN cjk = mx THEN 'cjk'
        |  ELSE 'hangul' END AS dominant_script,
        | CASE WHEN script_letters = 0 THEN NULL
        |  ELSE round(CAST(mx AS DOUBLE) / script_letters, 6)
        |  END AS script_purity
        |FROM prof ORDER BY doc_id""".stripMargin,

    "q152_skew_profile" ->
      """WITH counts AS (
        | SELECT user_id AS key, count(*) AS cnt FROM events
        | GROUP BY user_id),
        |summary AS (
        | SELECT CAST(count(*) AS BIGINT) AS distinct_keys,
        |  CAST(sum(cnt) AS BIGINT) AS total_rows,
        |  max(cnt) AS max_cnt,
        |  round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
        |  round(quantile_cont(cnt, 0.99), 6) AS p99_cnt
        | FROM counts),
        |top AS (
        | SELECT key, cnt,
        |  row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
        | FROM counts ORDER BY cnt DESC, key ASC LIMIT 10)
        |SELECT rank, key, cnt,
        | round(CAST(cnt AS DOUBLE) / total_rows, 6) AS share,
        | distinct_keys, total_rows, max_cnt, p50_cnt, p99_cnt
        |FROM top CROSS JOIN summary
        |ORDER BY rank""".stripMargin,

    "t153_cms_freq" ->
      """WITH toks AS (
        | SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
        |  AS token
        | FROM documents),
        |cnt AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
        |top AS (SELECT token FROM cnt ORDER BY n DESC, token LIMIT 40)
        |SELECT t.token AS token, CAST(c.n AS BIGINT) AS est
        |FROM top t JOIN cnt c ON t.token = c.token
        |ORDER BY t.token""".stripMargin,

    "q154_retention" ->
      """WITH f AS (
        | SELECT user_id, min(date_trunc('week', ts)) AS cohort
        | FROM events GROUP BY user_id),
        |a AS (
        | SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events),
        |j AS (
        | SELECT a.user_id, f.cohort,
        |  CAST(floor(date_diff('day', f.cohort, a.p) / 7.0) AS BIGINT)
        |   AS off
        | FROM a JOIN f ON a.user_id = f.user_id),
        |g AS (
        | SELECT cohort, off, count(*) AS active FROM j GROUP BY 1, 2),
        |s AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY 1)
        |SELECT strftime(g.cohort, '%Y-%m-%d') AS cohort_week,
        | g.off AS "offset", CAST(g.active AS BIGINT) AS active,
        | CAST(s.cohort_size AS BIGINT) AS cohort_size,
        | round(CAST(g.active AS DOUBLE) / s.cohort_size, 6) AS retention
        |FROM g JOIN s ON g.cohort = s.cohort
        |ORDER BY cohort_week, "offset"""".stripMargin,

    "t155_collocations" ->
      """WITH toks AS (
        | SELECT list_filter(string_split(text, ' '), t -> t <> '') AS t
        | FROM documents),
        |uni AS (
        | SELECT tok, count(*) AS c FROM (
        |  SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
        |pairs AS (
        | SELECT t[i] AS w1, t[i+1] AS w2
        | FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1))
        |   AS i) g),
        |bi AS (SELECT w1, w2, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
        |tot AS (
        | SELECT (SELECT sum(c_ab) FROM bi) AS n_bi,
        |  (SELECT sum(c) FROM uni) AS n_uni)
        |SELECT w1, w2, c_ab,
        | round(ln((CAST(c_ab AS DOUBLE) * n_uni * n_uni) /
        |   (CAST(n_bi AS DOUBLE) * ua.c * ub.c)), 6) AS pmi
        |FROM bi
        | JOIN uni ua ON bi.w1 = ua.tok
        | JOIN uni ub ON bi.w2 = ub.tok
        | CROSS JOIN tot
        |WHERE c_ab >= 5
        |ORDER BY pmi DESC, w1, w2
        |LIMIT 150""".stripMargin,

    "str156_stream_funnel" ->
      """WITH s1 AS (
        | SELECT user_id, min(ts) AS t1 FROM events
        | WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        | SELECT e.user_id, min(e.ts) AS t2 FROM events e
        | JOIN s1 ON e.user_id = s1.user_id
        | WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (
        | SELECT e.user_id, min(e.ts) AS t3 FROM events e
        | JOIN s2 ON e.user_id = s2.user_id
        | WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id),
        |c AS (SELECT (SELECT count(*) FROM s1) AS u1,
        |  (SELECT count(*) FROM s2) AS u2,
        |  (SELECT count(*) FROM s3) AS u3)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS step, CAST(u1 AS BIGINT) AS users,
        |  round(CAST(u1 AS DOUBLE) / u1, 6) AS conversion FROM c
        | UNION ALL SELECT CAST(2 AS BIGINT), CAST(u2 AS BIGINT),
        |  round(CAST(u2 AS DOUBLE) / u1, 6) FROM c
        | UNION ALL SELECT CAST(3 AS BIGINT), CAST(u3 AS BIGINT),
        |  round(CAST(u3 AS DOUBLE) / u1, 6) FROM c) f
        |ORDER BY step""".stripMargin,

    "q157_scd2" ->
      """WITH log AS (
        | SELECT o_custkey AS k,
        |  CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
        |  o_orderdate AS ts, o_totalprice AS price, o_orderkey
        | FROM orders),
        |v AS (
        | SELECT *, lead(ts) OVER (PARTITION BY k ORDER BY ts, o_orderkey)
        |   AS valid_to
        | FROM log)
        |SELECT k, strftime(ts, '%Y-%m-%d') AS valid_from,
        | strftime(valid_to, '%Y-%m-%d') AS valid_to,
        | price, o_orderkey, valid_to IS NULL AS is_current
        |FROM v WHERE op <> 'D'
        |ORDER BY k, valid_from, o_orderkey""".stripMargin,

    "d158_group_topk" ->
      """SELECT lang, doc_id FROM (
        | SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang
        |   ORDER BY n_chars DESC, doc_id) AS rn
        | FROM documents) t
        |WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin,

    "q159_rate_anomaly" ->
      """WITH c AS (
        | SELECT event_type AS series, date_trunc('hour', ts) AS bucket,
        |  count(*) AS n
        | FROM events GROUP BY 1, 2),
        |wnd AS (
        | SELECT *, count(n) OVER w AS k, sum(n) OVER w AS s1,
        |  sum(n * n) OVER w AS s2
        | FROM c
        | WINDOW w AS (PARTITION BY series ORDER BY bucket
        |   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |sc AS (
        | SELECT series, bucket, n,
        |  CASE WHEN k >= 8
        |   THEN round(CAST(s1 AS DOUBLE) / k, 6) END AS baseline_mean,
        |  CASE WHEN k >= 8
        |   THEN round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |     / (k - 1)), 6) END AS baseline_sd,
        |  CASE WHEN k >= 8 AND
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) > 0
        |   THEN round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / k)
        |     / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |       / (k - 1)), 6) END AS z
        | FROM wnd)
        |SELECT series, strftime(bucket, '%Y-%m-%d %H:%M') AS hr,
        | CAST(n AS BIGINT) AS n, baseline_mean, baseline_sd, z,
        | coalesce(z > 3.0, FALSE) AS is_anomaly
        |FROM sc ORDER BY series, hr""".stripMargin,

    "q160_ab_test" ->
      """WITH units AS (
        | SELECT user_id,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS converted,
        |  ['control', 'a', 'b'][CAST(user_id % 3 + 1 AS INT)] AS variant
        | FROM events GROUP BY user_id),
        |stats AS (
        | SELECT variant, count(*) AS n, sum(converted) AS conv
        | FROM units GROUP BY variant),
        |ctrl AS (SELECT n AS n0, conv AS c0 FROM stats
        | WHERE variant = 'control'),
        |j AS (SELECT * FROM stats CROSS JOIN ctrl)
        |SELECT variant, CAST(n AS BIGINT) AS n, CAST(conv AS BIGINT) AS conv,
        | round(CAST(conv AS DOUBLE) / n, 6) AS rate,
        | CASE WHEN variant = 'control' THEN NULL
        |  ELSE round(CAST(conv AS DOUBLE) / n - CAST(c0 AS DOUBLE) / n0, 6)
        |  END AS lift,
        | CASE WHEN variant = 'control' THEN NULL
        |  WHEN NOT ((CAST(conv + c0 AS DOUBLE) / (n + n0))
        |    * (1.0 - CAST(conv + c0 AS DOUBLE) / (n + n0))
        |    * (1.0 / n + 1.0 / n0) > 0) THEN NULL
        |  ELSE round((CAST(conv AS DOUBLE) / n - CAST(c0 AS DOUBLE) / n0)
        |   / sqrt((CAST(conv + c0 AS DOUBLE) / (n + n0))
        |     * (1.0 - CAST(conv + c0 AS DOUBLE) / (n + n0))
        |     * (1.0 / n + 1.0 / n0)), 6)
        |  END AS z,
        | coalesce(abs(CASE WHEN variant = 'control' THEN NULL
        |  WHEN NOT ((CAST(conv + c0 AS DOUBLE) / (n + n0))
        |    * (1.0 - CAST(conv + c0 AS DOUBLE) / (n + n0))
        |    * (1.0 / n + 1.0 / n0) > 0) THEN NULL
        |  ELSE round((CAST(conv AS DOUBLE) / n - CAST(c0 AS DOUBLE) / n0)
        |   / sqrt((CAST(conv + c0 AS DOUBLE) / (n + n0))
        |     * (1.0 - CAST(conv + c0 AS DOUBLE) / (n + n0))
        |     * (1.0 / n + 1.0 / n0)), 6)
        |  END) > 1.959964, FALSE) AS significant
        |FROM j ORDER BY variant""".stripMargin,

    "q161_histogram" ->
      """WITH r AS (
        | SELECT CAST(floor((CAST(l_extendedprice AS DOUBLE) - 0.0)
        |   / 5000.0) AS BIGINT) AS raw
        | FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (
        | SELECT CASE WHEN raw < 0 THEN -1 WHEN raw >= 16 THEN 16
        |  ELSE raw END AS bin
        | FROM r),
        |c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin)
        |SELECT bin, cnt,
        | CASE WHEN bin = -1 THEN NULL
        |  ELSE round(0.0 + bin * 5000.0, 6) END AS lo_edge,
        | CASE WHEN bin = 16 THEN NULL
        |  ELSE round(0.0 + (bin + 1) * 5000.0, 6) END AS hi_edge,
        | round(CAST(cnt AS DOUBLE) / sum(cnt) OVER (), 6) AS share
        |FROM c ORDER BY bin""".stripMargin,

    "q162_gap_fill" ->
      """WITH agg AS (
        | SELECT event_type AS series, date_trunc('hour', ts) AS bucket,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
        | FROM events GROUP BY 1, 2),
        |cal AS (
        | SELECT series,
        |  unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
        | FROM (SELECT series, min(bucket) AS lo, max(bucket) AS hi
        |   FROM agg GROUP BY series)),
        |j AS (
        | SELECT c.series, c.bucket, coalesce(a.n, 0) AS n,
        |  CASE WHEN a.n IS NOT NULL THEN a.v ELSE
        |   (last_value(CASE WHEN a.n IS NOT NULL
        |      THEN struct_pack(v := a.v) END IGNORE NULLS)
        |    OVER (PARTITION BY c.series ORDER BY c.bucket
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v
        |  END AS v
        | FROM cal c LEFT JOIN agg a
        |  ON c.series = a.series AND c.bucket = a.bucket)
        |SELECT series, strftime(bucket, '%Y-%m-%d %H:%M') AS hr,
        | CAST(n AS BIGINT) AS n, v
        |FROM j ORDER BY series, hr""".stripMargin,

    "q163_drop_anomaly" ->
      """WITH sparse AS (
        | SELECT event_type AS series, date_trunc('hour', ts) AS bucket,
        |  count(*) AS n
        | FROM events GROUP BY 1, 2),
        |cal AS (
        | SELECT series,
        |  unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
        | FROM (SELECT series, min(bucket) AS lo, max(bucket) AS hi
        |   FROM sparse GROUP BY series)),
        |c AS (
        | SELECT cal.series, cal.bucket, coalesce(s.n, 0) AS n
        | FROM cal LEFT JOIN sparse s
        |  ON cal.series = s.series AND cal.bucket = s.bucket),
        |wnd AS (
        | SELECT *, count(n) OVER w AS k, sum(n) OVER w AS s1,
        |  sum(n * n) OVER w AS s2
        | FROM c
        | WINDOW w AS (PARTITION BY series ORDER BY bucket
        |   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |sc AS (
        | SELECT series, bucket, n,
        |  CASE WHEN k >= 8
        |   THEN round(CAST(s1 AS DOUBLE) / k, 6) END AS baseline_mean,
        |  CASE WHEN k >= 8
        |   THEN round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |     / (k - 1)), 6) END AS baseline_sd,
        |  CASE WHEN k >= 8 AND
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) > 0
        |   THEN round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / k)
        |     / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |       / (k - 1)), 6) END AS z
        | FROM wnd)
        |SELECT series, strftime(bucket, '%Y-%m-%d %H:%M') AS hr,
        | CAST(n AS BIGINT) AS n, baseline_mean, baseline_sd, z,
        | coalesce(abs(z) > 3.0, FALSE) AS is_anomaly
        |FROM sc ORDER BY series, hr""".stripMargin,

    "q164_rolling_window" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS d,
        | CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   OVER w AS DOUBLE) / 100.0 AS roll_rev,
        | count(*) OVER w AS roll_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        | RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q165_quantile_bins" ->
      """WITH cuts AS (
        | SELECT quantile_cont(o_totalprice,
        |   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        | FROM orders WHERE o_totalprice IS NOT NULL
        |  AND NOT isnan(o_totalprice)),
        |b AS (
        | SELECT CAST(CASE
        |   WHEN o_totalprice <= q[1] THEN 1 WHEN o_totalprice <= q[2] THEN 2
        |   WHEN o_totalprice <= q[3] THEN 3 WHEN o_totalprice <= q[4] THEN 4
        |   WHEN o_totalprice <= q[5] THEN 5 WHEN o_totalprice <= q[6] THEN 6
        |   WHEN o_totalprice <= q[7] THEN 7 WHEN o_totalprice <= q[8] THEN 8
        |   WHEN o_totalprice <= q[9] THEN 9 ELSE 10 END AS BIGINT) AS bin,
        |  o_totalprice AS v
        | FROM orders, cuts
        | WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice))
        |SELECT bin, count(*) AS cnt, min(v) AS lo, max(v) AS hi
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "t166_mutual_info" ->
      """WITH j AS (
        | SELECT coalesce(lang, '__null__') AS a,
        |  coalesce(source, '__null__') AS b, count(*) AS n
        | FROM documents GROUP BY 1, 2)
        |SELECT a, b, n,
        | round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
        |   AS p_joint,
        | round(ln(CAST(n AS DOUBLE) * CAST(sum(n) OVER () AS DOUBLE)
        |   / (CAST(sum(n) OVER (PARTITION BY a) AS DOUBLE)
        |      * CAST(sum(n) OVER (PARTITION BY b) AS DOUBLE))), 6) AS pmi,
        | round((CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE))
        |   * ln(CAST(n AS DOUBLE) * CAST(sum(n) OVER () AS DOUBLE)
        |   / (CAST(sum(n) OVER (PARTITION BY a) AS DOUBLE)
        |      * CAST(sum(n) OVER (PARTITION BY b) AS DOUBLE))), 6)
        |   AS mi_part
        |FROM j ORDER BY a, b""".stripMargin,

    "q167_pagerank" -> pageRankOracleSql(10),

    "q168_asof_forward" ->
      """WITH e AS (
        | SELECT user_id, ts, event_id, value,
        |  row_number() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) AS rn
        | FROM events),
        |ed AS (SELECT user_id, ts, event_id, value FROM e WHERE rn = 1)
        |SELECT o.o_orderkey, o.o_custkey,
        | f.event_id AS asof_event_id, f.value AS asof_value
        |FROM (SELECT * FROM orders WHERE o_orderkey < 3000) o
        |LEFT JOIN LATERAL (
        | SELECT event_id, value FROM ed
        | WHERE ed.user_id = o.o_custkey AND ed.ts >= o.o_orderdate
        | ORDER BY ed.ts LIMIT 1) f ON TRUE
        |ORDER BY o.o_orderkey""".stripMargin,

    "d169_sorted_neighborhood" ->
      """WITH r AS (
        | SELECT doc_id AS id,
        |  row_number() OVER (ORDER BY n_chars, doc_id) AS rk
        | FROM documents)
        |SELECT a.id AS id_a, b.id AS id_b
        |FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 5
        |ORDER BY id_a, id_b""".stripMargin,

    "q170_hits" -> hitsOracleSql(10),

    "q171_winsorize" ->
      """WITH cuts AS (
        | SELECT quantile_cont(l_extendedprice, [0.05, 0.95]) AS q
        | FROM lineitem
        | WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice))
        |SELECT l_orderkey, l_linenumber,
        | round(CASE WHEN isnan(l_extendedprice) THEN l_extendedprice
        |            WHEN l_extendedprice < q[1] THEN q[1]
        |            WHEN l_extendedprice > q[2] THEN q[2]
        |            ELSE l_extendedprice END, 6) AS price_w
        |FROM lineitem, cuts
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q172_robust_outliers" ->
      """WITH m AS (
        | SELECT event_type, quantile_cont(value, 0.5) AS med
        | FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        | GROUP BY event_type),
        |d AS (
        | SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
        | FROM events e JOIN m ON e.event_type = m.event_type
        | WHERE e.value IS NOT NULL AND NOT isnan(e.value)
        | GROUP BY e.event_type)
        |SELECT e.event_id, e.event_type,
        | round(m.med, 6) AS median, round(d.mad, 6) AS mad,
        | CASE WHEN d.mad > 0 AND NOT isnan(e.value)
        |   THEN round(0.6745 * (e.value - m.med) / d.mad, 6)
        | END AS robust_z,
        | coalesce(abs(robust_z) > 3.5, FALSE) AS is_outlier
        |FROM events e
        |LEFT JOIN m ON e.event_type = m.event_type
        |LEFT JOIN d ON e.event_type = d.event_type
        |ORDER BY e.event_id""".stripMargin,

    "d173_negative_samples" ->
      """WITH r AS (
        | SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS g
        | FROM documents),
        |nn AS (SELECT count(*) AS n FROM documents),
        |d AS (
        | SELECT r.doc_id AS anchor, CAST(i AS BIGINT) AS i, r.g AS ga,
        |  (((r.doc_id % 1000000007) * 427799 + i * 40503 + 42)
        |    % 1000000007) % ((SELECT n FROM nn) - 1) + 1 AS draw
        | FROM r CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS i))
        |SELECT d.anchor, d.i, r2.doc_id AS neg
        |FROM d JOIN r AS r2
        | ON r2.g = CASE WHEN d.draw >= d.ga THEN d.draw + 1
        |            ELSE d.draw END
        |ORDER BY anchor, i""".stripMargin,

    "d174_fuzzy_join" ->
      """WITH l AS (
        | SELECT doc_id + 900000 AS probe_id,
        |  list_distinct(list_filter(regexp_split_to_array(
        |    regexp_replace(text, '\s+\S+$', ''), '\s+'),
        |    x -> x <> '')) AS lt
        | FROM documents WHERE doc_id < 300),
        |r AS (
        | SELECT doc_id,
        |  list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS rt
        | FROM documents),
        |s AS (
        | SELECT l.probe_id, r.doc_id,
        |  round(CAST(len(list_intersect(lt, rt)) AS DOUBLE)
        |    / len(list_distinct(list_concat(lt, rt))), 6) AS jaccard
        | FROM l CROSS JOIN r),
        |k AS (
        | SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY jaccard DESC, doc_id) AS rank
        | FROM s WHERE jaccard >= 0.5)
        |SELECT probe_id, doc_id, jaccard, rank FROM k WHERE rank <= 1
        |ORDER BY probe_id, rank""".stripMargin,

    "q175_twap" ->
      """WITH o AS (
        | SELECT event_type AS series, epoch(ts) AS t, value AS v
        | FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |d AS (
        | SELECT series, v,
        |  lead(t) OVER (PARTITION BY series ORDER BY t, v) - t AS dt
        | FROM o)
        |SELECT series, count(*) AS n_obs,
        | round(CAST(coalesce(sum(CAST(dt AS DECIMAL(18,6))), 0)
        |   AS DOUBLE), 6) AS span_sec,
        | round(CAST(sum(CAST(v * dt AS DECIMAL(28,6))) AS DOUBLE)
        |   / CAST(sum(CAST(dt AS DECIMAL(18,6))) AS DOUBLE), 6) AS twa
        |FROM d GROUP BY series ORDER BY series""".stripMargin,

    "q176_ppr" -> pageRankGeneralOracleSql(
      """SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst,
        |  CAST(1.0 AS DOUBLE) AS w
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
      """SELECT n.id, coalesce(s.t, CAST(0 AS DOUBLE)) AS t
        | FROM (SELECT src AS id FROM e UNION SELECT dst FROM e
        |       UNION SELECT c_custkey FROM customer
        |       WHERE c_nationkey = 1) n
        | LEFT JOIN (
        |  SELECT DISTINCT c_custkey AS id,
        |   CAST(1.0 AS DOUBLE) / (SELECT count(DISTINCT c_custkey)
        |     FROM customer WHERE c_nationkey = 1) AS t
        |  FROM customer WHERE c_nationkey = 1) s ON s.id = n.id""".stripMargin,
      10),

    "q177_pagerank_weighted" -> pageRankGeneralOracleSql(
      """SELECT o_custkey AS src, l_suppkey + 1000000 AS dst,
        |  CAST(count(*) AS DOUBLE) AS w
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY 1, 2""".stripMargin,
      """SELECT id, CAST(1.0 AS DOUBLE) /
        |  (SELECT count(*) FROM
        |    (SELECT src AS id FROM e UNION SELECT dst FROM e)) AS t
        | FROM (SELECT src AS id FROM e UNION SELECT dst FROM e)""".stripMargin,
      10),

    "q178_incremental_agg" ->
      """WITH v2 AS (
        | SELECT event_id, event_type AS g,
        |  CASE WHEN event_id % 5 = 0 THEN value + 1.5 ELSE value END
        |   AS value
        | FROM events WHERE event_id % 17 <> 0
        | UNION ALL
        | SELECT event_id + 10000000, event_type, value * 2.0
        | FROM events WHERE event_id % 13 = 0)
        |SELECT g, count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
        |  AS sum_v
        |FROM v2 GROUP BY g ORDER BY g""".stripMargin,

    // unrolled to kCore's maxRounds bound (30) so the oracle can never
    // compare a fixpoint against a non-fixpoint — converged rounds are
    // no-ops, so over-unrolling is safe
    "str198_stream_backpressure" ->
      """WITH f AS (
        | SELECT ((event_id % 6) + 6) % 6 AS fi FROM events)
        |SELECT fi // 2 AS batch_id, count(*) AS n_rows
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q180_kcore" -> kCoreOracleSql(10, 30),

    "q181_event_transitions" ->
      """WITH p AS (
        | SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS to_type
        | FROM events)
        |SELECT from_type, to_type, count(*) AS n,
        | round(CAST(count(*) AS DOUBLE) /
        |  CAST(sum(count(*)) OVER (PARTITION BY from_type) AS DOUBLE), 6)
        |  AS p
        |FROM p WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,

    // the streaming maintenance must land on exactly the q178 state
    "str179_stream_rollup" ->
      """WITH v2 AS (
        | SELECT event_id, event_type AS g,
        |  CASE WHEN event_id % 5 = 0 THEN value + 1.5 ELSE value END
        |   AS value
        | FROM events WHERE event_id % 17 <> 0
        | UNION ALL
        | SELECT event_id + 10000000, event_type, value * 2.0
        | FROM events WHERE event_id % 13 = 0)
        |SELECT g, count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
        |  AS sum_v
        |FROM v2 GROUP BY g ORDER BY g""".stripMargin)
}
