package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ZOrderKernels
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.operators.ZOrder

class ZOrderSpec extends SparkTestBase {

  // ---- kernel unit checks -------------------------------------------------

  test("interleave matches a bit-by-bit reference") {
    def ref(ids: Seq[Int], bits: Int): Long = {
      var out = 0L
      for (i <- (bits - 1) to 0 by -1; id <- ids)
        out = (out << 1) | ((id >> i) & 1L)
      out
    }
    val cases = Seq(
      (Seq(0, 0), 4), (Seq(15, 15), 4), (Seq(5, 10), 4),
      (Seq(1, 2, 3), 8), (Seq(255), 8), (Seq(170, 85), 8))
    cases.foreach { case (ids, bits) =>
      assert(ZOrderKernels.interleave(
        ArrayData.toArrayData(ids.toArray), bits) === ref(ids, bits),
        s"ids=$ids bits=$bits")
    }
    // two dims, 2 bits: (3, 0) -> 1010b = 10; (0, 3) -> 0101b = 5
    assert(ZOrderKernels.interleave(ArrayData.toArrayData(Array(3, 0)), 2) === 10L)
    assert(ZOrderKernels.interleave(ArrayData.toArrayData(Array(0, 3)), 2) === 5L)
  }

  test("interleave refuses dims*bits > 63 instead of silently overflowing") {
    val e = intercept[IllegalArgumentException](
      ZOrderKernels.interleave(ArrayData.toArrayData(Array(1, 2, 3)), 32))
    assert(e.getMessage.contains("96"))
  }

  test("rangeBucket is the number of boundaries <= x; NaN goes last") {
    val bs = Array(10.0, 20.0, 30.0)
    assert(ZOrderKernels.rangeBucket(5.0, bs) === 0)
    assert(ZOrderKernels.rangeBucket(10.0, bs) === 1) // tie goes right
    assert(ZOrderKernels.rangeBucket(25.0, bs) === 2)
    assert(ZOrderKernels.rangeBucket(99.0, bs) === 3)
    assert(ZOrderKernels.rangeBucket(Double.NaN, bs) === 3)
    assert(ZOrderKernels.rangeBucket(1.0, Array.empty[Double]) === 0)
  }

  test("key expression is codegen'd and curve-orders a grid") {
    import spark.implicits._
    // spark.range (not a local relation) so the projection isn't
    // constant-folded away and the codegen assertion sees a real plan
    val grid = spark.range(256)
      .select((col("id") % 16).cast("int").as("x"),
        (col("id") / 16).cast("int").as("y"))
    val bounds = Map[String, ZOrder.DimCuts](
      "x" -> ZOrder.NumericCuts((1 until 16).map(_.toDouble - 0.5).toArray),
      "y" -> ZOrder.NumericCuts((1 until 16).map(_.toDouble - 0.5).toArray))
    val keyed = grid.withColumn("zk", ZOrder.key(bounds, Seq("x", "y"), 4))
    // stays inside whole-stage codegen (no CodegenFallback kernels) —
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(keyed.queryExecution.executedPlan.toString.contains("*(1) Project"))
    val rows = keyed.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // distinct keys for distinct grid cells, full 8-bit range
    assert(rows.values.toSet.size === 256)
    assert(rows.values.min === 0L && rows.values.max === 255L)
    // Morton property: (x,y) and (x+1,y) in the same 2x2 block differ less
    // in key than points far apart in y
    assert(math.abs(rows((0, 0)) - rows((1, 1))) < math.abs(rows((0, 0)) - rows((0, 8))))
  }

  test("nulls take bucket 0") {
    import spark.implicits._
    val df = Seq[(java.lang.Integer, java.lang.Integer)]((null, 5), (3, 5))
      .toDF("x", "y")
    val bounds = Map[String, ZOrder.DimCuts](
      "x" -> ZOrder.NumericCuts(Array(2.0)),
      "y" -> ZOrder.NumericCuts(Array(2.0)))
    val keys = df.withColumn("zk", ZOrder.key(bounds, Seq("x", "y"), 1))
      .orderBy("zk").select("zk").as[Long].collect()
    // null x -> bucket 0 -> key 01b = 1; x=3 -> bucket 1 -> key 11b = 3
    assert(keys.toSeq === Seq(1L, 3L))
  }

  test("stringRangeBucket is the number of boundaries <= v in binary order") {
    import org.apache.spark.unsafe.types.UTF8String
    val bs = Array("d", "k", "r").map(UTF8String.fromString)
    def bucket(s: String) = ZOrderKernels.stringRangeBucket(UTF8String.fromString(s), bs)
    assert(bucket("a") === 0)
    assert(bucket("d") === 1) // tie goes right
    assert(bucket("mmm") === 2)
    assert(bucket("zebra") === 3)
    assert(ZOrderKernels.stringRangeBucket(
      UTF8String.fromString("x"), Array.empty[UTF8String]) === 0)
  }

  test("string dim fit: dictionary-rank cuts are frequency-balanced and ordered") {
    import spark.implicits._
    // skewed categorical: "hot" is half the rows — it must span buckets
    // alone rather than crowd the others out
    val vals = Seq.fill(500)("hot") ++
      (0 until 500).map(i => f"v${i % 50}%03d")
    val df = vals.toDF("s").withColumn("x", lit(1.0))
    val cuts = ZOrder.fitBoundaries(df, Seq("s", "x"), bits = 2)("s")
      .asInstanceOf[ZOrder.StringCuts].bounds
    assert(cuts.nonEmpty && cuts.length <= 3)
    assert(cuts.toSeq === cuts.sorted.toSeq)
    // keys: distinct values map order-preservingly onto bucket ids
    val keyed = df.withColumn("zk",
      ZOrder.key(ZOrder.fitBoundaries(df, Seq("s", "x"), 2), Seq("s", "x"), 2))
    val byVal = keyed.groupBy("s").agg(min("zk").as("k")).orderBy("s")
      .select("k").as[Long].collect()
    assert(byVal.toSeq === byVal.sorted.toSeq, "bucket ids must preserve string order")
  }

  test("sparse-lane spread survives a large dictionary at high bits (no int overflow)") {
    import spark.implicits._
    // 50k cuts at bits=16: raw id * 2^bits ≈ 3.3e9 > Int.MaxValue — the
    // spread must go through long arithmetic or ANSI mode errors out
    val cuts = ZOrder.StringCuts((1 to 50000).map(i => f"v$i%06d").toArray)
    val bounds = Map[String, ZOrder.DimCuts](
      "s" -> cuts, "x" -> ZOrder.NumericCuts(Array(0.5)))
    val df = Seq(("zzzzzz", 1.0), ("a", 0.0)).toDF("s", "x")
    val ks = df.withColumn("zk", ZOrder.key(bounds, Seq("s", "x"), 16))
      .orderBy("s").select("zk").as[Long].collect()
    assert(ks.length == 2 && ks(0) < ks(1), s"order broken: ${ks.toSeq}")
  }

  test("z-order on (numeric, string) prunes files on both dimensions") {
    import spark.implicits._
    val n = 20000
    // categorical dim with 64 levels, independent of the numeric dim
    val df = (0 until n)
      .map(i => (((i * 2654435761L) % n).toDouble, f"cat${(i * 40503L) % 64}%02d"))
      .toDF("a", "c")
    val files = 16

    def spans(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = laid
        .withColumn("f", spark_partition_id())
        .groupBy("f")
        // string span proxy: distinct categories per file / all categories
        .agg((max("a") - min("a")).as("sa"),
          countDistinct(col("c")).as("sc"))
        .agg(avg("sa").as("ma"), avg("sc").as("mc"))
        .head()
      (s.getDouble(0) / n, s.getDouble(1) / 64.0)
    }

    val (la, lc) = spans(
      df.repartitionByRange(files, col("a")).sortWithinPartitions("a"))
    val (za, zc) = spans(ZOrder.cluster(df, Seq("a", "c"), files, bits = 4))

    assert(la < 0.10, s"linear tight on a, got $la")
    assert(lc > 0.90, s"linear spans ~all categories, got $lc")
    // a `c = 'cat07'` predicate reads only files whose category set holds
    // it: mean distinct-category fraction IS the expected read fraction
    assert(za < 0.50, s"z-order should prune on a, got $za")
    assert(zc < 0.50, s"z-order should prune on c, got $zc")
    assert(zc < lc / 2, s"z-order must beat linear on c: $zc vs $lc")
    assert(ZOrder.cluster(df, Seq("a", "c"), files, bits = 4).count() === n)
  }

  // ---- the point: multi-dimensional file skipping -------------------------

  test("z-order files are prunable on BOTH dimensions; linear sort only on one") {
    import spark.implicits._
    // two independent uniform dims — worst case for a linear sort
    val n = 20000
    val df = (0 until n)
      .map(i => (((i * 2654435761L) % n).toDouble, ((i * 40503L) % n).toDouble))
      .toDF("a", "b")
    val files = 16

    // per-output-file [min,max] span of each dim, normalized by full range;
    // a predicate `dim = v` skips a file iff v is outside its span, so the
    // mean span IS the expected fraction of files a point lookup must read
    def meanSpans(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = laid
        .withColumn("f", spark_partition_id())
        .groupBy("f")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa").as("ma"), avg("sb").as("mb"))
        .head()
      (spans.getDouble(0) / n, spans.getDouble(1) / n)
    }

    val (la, lb) = meanSpans(
      df.repartitionByRange(files, col("a")).sortWithinPartitions("a"))
    val (za, zb) = meanSpans(ZOrder.cluster(df, Seq("a", "b"), files))

    // linear: perfect on a (~1/16), useless on b (~full range)
    assert(la < 0.10, s"linear sort should be tight on a, got $la")
    assert(lb > 0.90, s"linear sort spans ~all of b, got $lb")
    // z-order: BOTH dims tight — an aligned 1/16 curve span covers 1/4 of
    // each dim; sampled range boundaries straddle block edges, so allow
    // up to 2x the aligned span
    assert(za < 0.50, s"z-order should prune on a, got $za")
    assert(zb < 0.50, s"z-order should prune on b, got $zb")
    assert(zb < lb / 2, s"z-order must beat linear on b: $zb vs $lb")
    // and the layout did not lose or duplicate rows
    assert(ZOrder.cluster(df, Seq("a", "b"), files).count() === n)
  }

  // ---- maintenance-level rewrite (OPTIMIZE ... ZORDER BY analogue) ------

  test("zorderRewrite accepts a string dimension end to end (on-disk files tight)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zrw_str").toString
    val n = 20000
    val df = (0 until n)
      .map(i => (((i * 2654435761L) % n).toDouble, f"cat${(i * 40503L) % 64}%02d"))
      .toDF("a", "c")
    df.repartitionByRange(12, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
      .agg(count(lit(1)), sum("a"), countDistinct("c")).head()
    val bytes = {
      val p = new org.apache.hadoop.fs.Path(dir)
      graft.sources.Fs.of(p).listStatus(p).filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }
    val rels = graft.sources.Maintenance.zorderRewrite(
      spark, dir, Nil, Seq("a", "c"), targetFileBytes = bytes / 16)
    assert(rels === Seq(""))
    assert(spark.read.parquet(dir)
      .agg(count(lit(1)), sum("a"), countDistinct("c")).head() === before)
    // per on-disk file: categories per file / 64 is the expected fraction
    // of files a `c = '...'` point predicate must read
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("a") - min("a")).as("sa"), countDistinct("c").as("sc"))
      .agg(avg("sa"), avg("sc")).head()
    assert(spans.getDouble(0) / n < 0.5, s"numeric dim span ${spans.getDouble(0) / n}")
    assert(spans.getDouble(1) / 64.0 < 0.5, s"string dim span ${spans.getDouble(1) / 64.0}")
  }

  test("zorderRewrite re-lays an unpartitioned table on the curve in place") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zrw").toString
    val n = 20000
    val df = (0 until n)
      .map(i => (((i * 2654435761L) % n).toDouble, ((i * 40503L) % n).toDouble))
      .toDF("a", "b")
    df.repartitionByRange(12, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
      .agg(count(lit(1)), sum("a"), sum("b")).head()
    val bytes = {
      val p = new org.apache.hadoop.fs.Path(dir)
      graft.sources.Fs.of(p).listStatus(p).filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }

    val rels = graft.sources.Maintenance.zorderRewrite(
      spark, dir, Nil, Seq("a", "b"), targetFileBytes = bytes / 16)
    assert(rels === Seq(""))
    assert(spark.read.parquet(dir)
      .agg(count(lit(1)), sum("a"), sum("b")).head() === before)

    // per actual on-disk file, both dims' normalized spans must be tight —
    // the b dim was full-range per file under the old a-sorted layout.
    // 16 files = 2 curve bits per dim -> aligned span 0.25; sampled range
    // cuts straddle curve blocks, so allow up to ~2x the aligned span
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .agg(avg("sa"), avg("sb")).head()
    assert(spans.getDouble(0) / n < 0.65, s"a span ${spans.getDouble(0) / n}")
    assert(spans.getDouble(1) / n < 0.65, s"b span ${spans.getDouble(1) / n}")
  }

  test("zorderRewrite clusters within partitions, partition dirs intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zrwp").toString + "/t"
    val o = Tables.orders(spark, sf).withColumn("yr", year(col("o_orderdate")))
    o.repartition(4).write.partitionBy("yr").parquet(dir)
    def checksum() = spark.read.parquet(dir).groupBy("yr")
      .agg(count(lit(1)).as("c"), sum("o_orderkey").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val before = checksum()

    val rels = graft.sources.Maintenance.zorderRewrite(
      spark, dir, Seq("yr"), Seq("o_custkey", "o_totalprice"))
    assert(rels.nonEmpty && rels.forall(_.startsWith("yr=")))
    assert(checksum() === before)
    // partition pruning still the coarse filter: dirs survive
    assert(before.map(_._1).forall(y =>
      graft.sources.Fs.isDir(new org.apache.hadoop.fs.Path(s"$dir/yr=$y"))))
  }

  test("catalog zorderTable rewrites managed data and validates columns") {
    import graft.catalog.CatalogFunctions
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_z").toString
    spark.conf.set("spark.sql.catalog.graft_z", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_z.root", wh)
    spark.sql("CREATE NAMESPACE graft_z.db")
    spark.sql("CREATE TABLE graft_z.db.t (a BIGINT, b BIGINT, dt STRING) " +
      "PARTITIONED BY (dt)")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO graft_z.db.t VALUES ($i, ${10 - i}, 'x'), " +
        s"(${i + 5}, ${5 - i}, 'y')"))

    val rels = CatalogFunctions.zorderTable(
      spark, "graft_z", Array("db"), "t", Seq("a", "b"))
    assert(rels.toSet === Set("dt=x", "dt=y"))
    assert(spark.sql("SELECT count(*), sum(a), sum(b) FROM graft_z.db.t")
      .head().toSeq === Seq(6L, 27L, 33L))

    val e1 = intercept[Exception](CatalogFunctions.zorderTable(
      spark, "graft_z", Array("db"), "t", Seq("nope")))
    assert(e1.getMessage.contains("not a column"))
    val e2 = intercept[Exception](CatalogFunctions.zorderTable(
      spark, "graft_z", Array("db"), "t", Seq("dt")))
    assert(e2.getMessage.contains("partition"))
  }

  test("zorderRewrite discards its rewrite when a writer races it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zrace").toString
    (0 until 1000).map(i => (i.toDouble, (999 - i).toDouble)).toDF("a", "b")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val appended = Seq((5000.0, 5000.0)).toDF("a", "b")
    graft.sources.Maintenance.onPartitionedPlan = () =>
      appended.coalesce(1).write.mode("append").parquet(dir)
    try {
      val rels = graft.sources.Maintenance.zorderRewrite(
        spark, dir, Nil, Seq("a", "b"))
      assert(rels.isEmpty, "stale rewrite must be discarded")
    } finally graft.sources.Maintenance.onPartitionedPlan = () => ()
    spark.catalog.refreshByPath(dir)
    // the concurrent append survived, nothing lost or duplicated
    assert(spark.read.parquet(dir).count() === 1001)
    assert(spark.read.parquet(dir).filter(col("a") === 5000.0).count() === 1)
  }

  test("skewed dimension degrades gracefully (dedup'd boundaries, no crash)") {
    import spark.implicits._
    val df = (0 until 2000)
      .map(i => (if (i % 2 == 0) 7.0 else i.toDouble, i.toDouble))
      .toDF("a", "b")
    val out = ZOrder.cluster(df, Seq("a", "b"), 4, bits = 4)
    assert(out.count() === 2000)
  }
}
