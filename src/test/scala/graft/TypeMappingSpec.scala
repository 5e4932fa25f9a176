package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TypeMapping
import graft.operators.Multimodal

class TypeMappingSpec extends SparkTestBase {
  import spark.implicits._

  test("scalar type mapping matches the reference table") {
    assert(TypeMapping.toSparkType("BIGINT") == LongType)
    assert(TypeMapping.toSparkType("datetime") == TimestampType)
    assert(TypeMapping.toSparkType("DECIMAL") == DecimalType(38, 18))
    assert(TypeMapping.toSparkType("decimal(10,2)") == DecimalType(10, 2))
    // legacy (54,18) remap → capped at max precision
    assert(TypeMapping.toSparkType("decimal(54,18)") == DecimalType(38, 18))
    assert(TypeMapping.toSparkType("char(10)") == StringType)
    assert(TypeMapping.toSparkType("varchar(20)") == StringType)
  }

  test("over-limit decimal caps precision AND scale instead of crashing") {
    assert(TypeMapping.toSparkType("decimal(54,18)") == DecimalType(38, 18))
    // scale above the capped precision must cap too — DecimalType(38, 40)
    // throws in the constructor
    assert(TypeMapping.toSparkType("decimal(54,40)") == DecimalType(38, 38))
  }

  test("timestamp_ntz and json map like the Trino connector") {
    assert(TypeMapping.toSparkType("timestamp_ntz") == TimestampNTZType)
    assert(TypeMapping.toExternalType(TimestampNTZType) == "TIMESTAMP_NTZ")
    // JSON surfaces as StringType with the external type preserved in
    // field metadata (StringType alone would erase it)
    assert(TypeMapping.toSparkType("json") == StringType)
    val f = TypeMapping.jsonField("payload")
    assert(f.dataType == StringType)
    assert(TypeMapping.externalTypeOf(f) == "JSON")
    assert(TypeMapping.externalTypeOf(StructField("x", LongType)) == "BIGINT")
  }

  test("nested type mapping round-trips") {
    val t = "ARRAY<DECIMAL(10,2)>"
    assert(TypeMapping.toSparkType(t) == ArrayType(DecimalType(10, 2)))
    assert(TypeMapping.toSparkType("MAP<STRING,ARRAY<INT>>") ==
      MapType(StringType, ArrayType(IntegerType)))
    val st = TypeMapping.toSparkType("STRUCT<a:INT,b:MAP<STRING,BIGINT>>")
    assert(st == StructType(Seq(
      StructField("a", IntegerType),
      StructField("b", MapType(StringType, LongType)))))
    // inverse
    assert(TypeMapping.toExternalType(TypeMapping.toSparkType(t)) == t)
  }

  test("char read trim and varchar write guard") {
    val df = Seq(("abc   ", "tooLongValue")).toDF("c", "v")
    assert(df.select(TypeMapping.charReadValue($"c")).head().getString(0) == "abc")
    assert(df.select(TypeMapping.varcharWriteValue($"v", 20)).head()
      .getString(0) == "tooLongValue")
    assert(df.select(TypeMapping.varcharWriteValue($"v", 4, truncate = true))
      .head().getString(0) == "tooL")
    intercept[Exception] {
      df.select(TypeMapping.varcharWriteValue($"v", 4)).collect()
    }
  }

  test("migration risk report flags lossy conversions") {
    val risks = TypeMapping.migrationRisks(Seq(
      "a" -> "BIGINT", "b" -> "varchar(10)", "c" -> "decimal(54,18)",
      "d" -> "datetime"))
    assert(risks(0)._3.isEmpty)
    assert(risks(1)._3.exists(_.contains("length constraint")))
    assert(risks(2)._3.exists(_.contains("precision capped")))
    assert(risks(3)._3.exists(_.contains("millisecond")))
    assert(risks(2)._2 == DecimalType(38, 18))
  }

  test("multimodal decode is deterministic and partition-parallel") {
    val payloads = Multimodal.withPayload(
      Tables.documents(spark, sf).limit(100), "doc_id", "text")
    val meta = Multimodal.decode(payloads.repartition(8))
    val rows = meta.collect()
    assert(rows.length == 100)
    assert(rows.forall(m => m.byteLen > 0 && m.width >= 64 && m.height >= 64))
    // determinism across runs / partitionings
    val again = Multimodal.decode(payloads.repartition(3)).collect()
    assert(rows.sortBy(_.docId).toSeq == again.sortBy(_.docId).toSeq)
  }

  test("frame sampling fans out video rows only") {
    val meta = Multimodal.decode(Multimodal.withPayload(
      Tables.documents(spark, sf).limit(200), "doc_id", "text"))
    val frames = Multimodal.frameSamplePlan(meta, everyMs = 1000L, maxFrames = 5)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getLong(1) <= 5))
    val videos = meta.filter(col("nFrames") > 1).count()
    assert(perDoc.length == videos)
  }

  test("resize plan preserves aspect ratio bound") {
    val meta = Multimodal.decode(Multimodal.withPayload(
      Tables.documents(spark, sf).limit(50), "doc_id", "text"))
    val out = Multimodal.resizePlan(meta, maxDim = 256).collect()
    assert(out.forall(r => r.getInt(3) <= 256 && r.getInt(4) <= 256))
  }

  // deterministic pseudo-random payload for the CDC tests
  private def cdcBytes(n: Int, seed: Long = 7L): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256).toByte)
  }

  private def chunksOf(payloads: Seq[(Long, Array[Byte])],
      minSize: Int = 64, avgBits: Int = 6, maxSize: Int = 512) = {
    val df = payloads.toDF("id", "payload")
    Multimodal.cdcPostings(df, "id", "payload", minSize, avgBits, maxSize)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).toSeq).toMap
  }

  test("cdc chunks: sizes bounded, offsets contiguous, bytes fully covered") {
    val data = cdcBytes(5000)
    val got = chunksOf(Seq((1L, data)))(1L)
    // contiguous cover: offsets chain and lengths sum to the payload
    var expectOff = 0
    got.foreach { case (_, _, off, len) =>
      assert(off == expectOff); expectOff += len
    }
    assert(expectOff == data.length)
    // every chunk but the tail respects [minSize, maxSize]
    got.dropRight(1).foreach { case (_, _, _, len) =>
      assert(len >= 64 && len <= 512, s"len=$len")
    }
    assert(got.last._4 <= 512 && got.length > 3)
    // deterministic across re-evaluation
    assert(chunksOf(Seq((1L, data)))(1L) == got)
  }

  test("cdc chunks re-synchronize after a prefix splice (shift resistance)") {
    val base = cdcBytes(6000)
    val spliced = cdcBytes(97, seed = 99L) ++ base // insert 97 bytes at front
    val got = chunksOf(Seq((1L, base), (2L, spliced)))
    val h1 = got(1L).map(_._2).toSet
    val h2 = got(2L).map(_._2).toSet
    // all but the first chunk(s) around the edit must re-appear verbatim
    val shared = h1.intersect(h2).size
    assert(shared >= h1.size - 2, s"shared $shared of ${h1.size}")
    // fixed-size chunking would share nothing: check offsets actually moved
    val off1 = got(1L).map(_._3).toSet
    val off2 = got(2L).map(_._3).toSet
    assert(off1 != off2)
  }

  test("binaryNearDups: splice-shifted payload pairs with its original") {
    val base = cdcBytes(6000, seed = 11L)
    val header = cdcBytes(100, seed = 12L)
    val spliced = header ++ base // every boundary shifted by 100 bytes
    val unrelated = cdcBytes(6000, seed = 13L)
    val df = Seq((1L, base), (2L, spliced), (3L, unrelated))
      .toDF("id", "payload")
    val got = Multimodal.binaryNearDups(df, "id", "payload",
        threshold = 0.5, minSize = 64, avgBits = 6, maxSize = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // CDC re-synchronizes after the splice: (1,2) pair; unrelated stays out
    assert(got === Set((1L, 2L)))
  }

  test("binaryNearDups: ubiquitous chunks alone cannot create pairs") {
    // payloads share ONLY a common header chunk (the container-magic
    // pattern); with the ubiquity cap at 2 the header is discarded and
    // nothing pairs — without the cap every payload pair would share it
    val header = cdcBytes(600, seed = 20L)
    val df = (1L to 4L).map(i =>
        (i, header ++ cdcBytes(1200, seed = 30L + i)))
      .toDF("id", "payload")
    val got = Multimodal.binaryNearDups(df, "id", "payload",
      threshold = 0.1, minSize = 64, avgBits = 6, maxSize = 512,
      maxChunkDocs = 2)
    assert(got.isEmpty)
  }

  test("dhash64: known answers (monotone ramps), and 2x byte-scaling " +
      "is hash-invariant (the box resample absorbs it)") {
    import org.apache.spark.sql.graft.{NativeFunctions, PerceptualKernels}
    // strictly increasing byte ramp -> every adjacent grid compare is <
    // -> all 64 bits set; decreasing ramp -> none
    val up = Array.tabulate(720)(i => (i * 255 / 719).toByte)
    val down = up.reverse
    assert(PerceptualKernels.dhash64(up) == -1L)
    assert(PerceptualKernels.dhash64(down) == 0L)
    // duplicating every byte is a 2x "upscale": identical box means
    val doubled = up.flatMap(b => Array(b, b))
    assert(PerceptualKernels.dhash64(doubled) == -1L)
    // the expression path equals the kernel
    val viaExpr = Seq((1L, up)).toDF("id", "payload")
      .select(NativeFunctions.dhash64(col("payload"))).head().getLong(0)
    assert(viaExpr == -1L)
  }

  test("perceptualNearDups: a byte-rescaled payload pairs with its " +
      "original while an unrelated payload stays out; CDC chunking " +
      "misses the same pair") {
    val base = cdcBytes(6000, seed = 41L)
    // "re-encode at 2x": every byte doubled — zero shared raw chunks
    // with base, but the SAME coarse gradient
    val rescaled = base.flatMap(b => Array(b, b))
    val unrelated = cdcBytes(6000, seed = 42L)
    val df = Seq((1L, base), (2L, rescaled), (3L, unrelated))
      .toDF("id", "payload")
    val got = Multimodal.perceptualNearDups(df, "id", "payload",
        maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)), s"got $got")
    // byte-level CDC near-dup CANNOT see this pair (no shared bytes)
    val cdc = Multimodal.binaryNearDups(df, "id", "payload",
        threshold = 0.1, minSize = 64, avgBits = 6, maxSize = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cdc.contains((1L, 2L)),
      "byte-CDC seeing a rescaled payload would make dHash redundant")
  }

  test("perceptualNearDups: degenerate identical-hash buckets are " +
      "capped (skew guard), and maxHamming >= bands is rejected") {
    val blob = cdcBytes(2000, seed = 50L)
    val df = (1L to 6L).map(i => (i, blob)).toDF("id", "payload")
    // 6 identical hashes: every band bucket holds 6 > cap 4 -> dropped
    assert(Multimodal.perceptualNearDups(df, "id", "payload",
      maxHamming = 3, maxBucketSize = 4).isEmpty)
    // raising the cap admits all 15 pairs at hamming 0
    assert(Multimodal.perceptualNearDups(df, "id", "payload",
      maxHamming = 3, maxBucketSize = 8).count() == 15L)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.perceptualNearDups(df, "id", "payload",
        maxHamming = 8, bands = 8)
    }
    assert(ex.getMessage.contains("pigeonhole"))
  }

  test("storageDedupReport: planted duplicate payload doubles total over distinct") {
    val a = cdcBytes(4096); val b = cdcBytes(4096, seed = 21L)
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("id", "payload")
    val r = Multimodal.storageDedupReport(df, "id", "payload",
      minSize = 64, avgBits = 6, maxSize = 512).head()
    assert(r.getAs[Long]("n_payloads") == 3L)
    assert(r.getAs[Long]("total_bytes") == 3L * 4096)
    // payloads 1 and 2 are identical: their chunk sets dedup fully
    assert(r.getAs[Long]("distinct_bytes") == 2L * 4096)
    assert(r.getAs[Double]("dedup_ratio") == 1.5)
    // null payloads: no chunks, still counted as payloads
    val withNull = Seq((1L, a), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val rn = Multimodal.storageDedupReport(withNull, "id", "payload").head()
    assert(rn.getAs[Long]("n_payloads") == 2L)
    assert(rn.getAs[Long]("total_bytes") == 4096L)
  }

  test("audioEnergy: exact per-window squared-amplitude sums; partial " +
      "last window keeps its true byte count") {
    import spark.implicits._
    // window 4: silent, a ±10 swing, and a 1-byte silent tail
    val b = Array[Byte](128.toByte, 128.toByte, 128.toByte, 128.toByte,
      138.toByte, 118.toByte, 128.toByte, 128.toByte, 128.toByte)
    val got = Multimodal.audioEnergy(Seq((7L, b)).toDF("id", "payload"),
        "id", "payload", windowBytes = 4)
      .orderBy("win").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq === Seq((0, 4, 0L), (1, 4, 200L), (2, 1, 0L)))
  }

  test("silenceTrim: integer threshold picks the active span; " +
      "all-silent payloads keep their row with NULL span") {
    import spark.implicits._
    val loud = Array[Byte](128.toByte, 128.toByte, 128.toByte, 128.toByte,
      138.toByte, 118.toByte, 128.toByte, 128.toByte, 128.toByte)
    val silent = Array.fill[Byte](6)(128.toByte)
    val got = Multimodal.silenceTrim(
        Seq((1L, loud), (2L, silent)).toDF("id", "payload"),
        "id", "payload", windowBytes = 4, meanSqThreshold = 10L)
      .orderBy("doc_id").collect()
    val l = got(0)
    // only window 1 clears 10·n = 40: span = that single window, and
    // its trimmed length is the window's own 4 bytes
    assert((l.getLong(1), l.getLong(2), l.getLong(3), l.getLong(4),
      l.getLong(5)) === ((3L, 1L, 1L, 1L, 4L)))
    val s = got(1)
    assert(s.getLong(2) === 0L && s.isNullAt(3) && s.isNullAt(5))
  }

  test("tilePlan: 300x100 at tile 128 → 3x1 grid with the last tile " +
      "clamped; a tile-aligned image gets unclamped full tiles") {
    import spark.implicits._
    val meta = Seq(
      Multimodal.MediaMeta(1L, 10, "img", 300, 100, 1, 0L),
      Multimodal.MediaMeta(2L, 10, "img", 256, 128, 1, 0L)).toDS()
    val got = Multimodal.tilePlan(meta, tile = 128)
      .orderBy("doc_id", "tile_id").collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4), r.getInt(5),
        r.getInt(6), r.getInt(7), r.getInt(8)))
    assert(got.toSeq === Seq(
      (1L, 3, 0, 0, 0, 128, 100),   // y clamped to height 100
      (1L, 3, 1, 128, 0, 256, 100),
      (1L, 3, 2, 256, 0, 300, 100), // x clamped to width 300
      (2L, 2, 0, 0, 0, 128, 128),
      (2L, 2, 1, 128, 0, 256, 128)))
  }

  test("sceneCuts: piecewise signatures count boundaries; a static " +
      "signature run is one scene; frame order, not input order") {
    import spark.implicits._
    val frames = Seq(
      // doc 1: sigs 7,7,9,9,7 → cuts at idx 2 and 4 → 3 scenes
      (1L, 0, 7L), (1L, 1, 7L), (1L, 2, 9L), (1L, 3, 9L), (1L, 4, 7L),
      // doc 2: static
      (2L, 0, 5L), (2L, 1, 5L), (2L, 2, 5L))
      .toDF("doc_id", "frame_idx", "sig")
    val got = Multimodal.sceneCuts(frames.repartition(4), "doc_id",
        "frame_idx", "sig")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, 5L, 2L, 3L, 5.0 / 3.0), (2L, 3L, 0L, 1L, 3.0)))
  }

  test("aspectBuckets: division-free closest-ratio assignment, ties to " +
      "the earlier bucket, capacity batching is rank-exact") {
    import spark.implicits._
    val buckets = Seq((1, 1), (4, 3), (16, 9))
    // 800x600 -> exactly 4:3; 1920x1080 -> exactly 16:9; 500x500 -> 1:1;
    // 750x600 (5:4 = 1.25) is 1/12 from 4:3 but 1/4 from 1:1 -> 4:3
    // (700x600 would be an EXACT tie: |7/6-1| = |7/6-4/3| = 1/6)
    val dims = Seq((1L, 800L, 600L), (2L, 1920L, 1080L),
      (3L, 500L, 500L), (4L, 750L, 600L)).toDF("id", "w", "h")
    val got = graft.operators.Multimodal.aspectBuckets(dims, "id", "w",
        "h", buckets, capacity = 32)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4)))
    assert(got.toSeq === Seq((1L, 4, 3), (2L, 16, 9), (3L, 1, 1),
      (4L, 4, 3)))
    // exact tie: r = 25/24 is the midpoint of 4/3 and 3/4 (distance
    // 7/24 to each; keys |2500*3-4*2400|*4 = |2500*4-3*2400|*3 = 8400)
    // -> the earlier bucket index wins
    val tie = graft.operators.Multimodal.aspectBuckets(
        Seq((9L, 2500L, 2400L)).toDF("id", "w", "h"),
        "id", "w", "h", Seq((4, 3), (3, 4)), capacity = 8)
      .head()
    assert(tie.getInt(3) === 4 && tie.getInt(4) === 3)
    // capacity batching: 70 same-bucket images at capacity 32 ->
    // batches of 32/32/6, numbered by ascending id
    val many = (1L to 70L).map(i => (i, 100L, 100L)).toDF("id", "w", "h")
    val batched = graft.operators.Multimodal.aspectBuckets(many, "id",
        "w", "h", Seq((1, 1)), capacity = 32)
      .groupBy("batch_idx").count().orderBy("batch_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(batched.toSeq === Seq((0L, 32L), (1L, 32L), (2L, 6L)))
    // partitioning invariance
    val re = graft.operators.Multimodal.aspectBuckets(
        many.repartition(7), "id", "w", "h", Seq((1, 1)), capacity = 32)
      .groupBy("batch_idx").count().orderBy("batch_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(re.toSeq === batched.toSeq)
  }

  test("padPlan: integer letterbox geometry — binding side exact, " +
      "centered pads, odd pixel goes right/bottom") {
    import spark.implicits._
    val df = Seq(
      (1L, 800L, 450L, 400, 300),  // width binds: 400x225, pad top/bot
      (2L, 100L, 300L, 400, 300),  // height binds: 100x300, pad l/r
      (3L, 400L, 300L, 400, 300))  // exact fit: zero pads
      .toDF("id", "width", "height", "bucket_w", "bucket_h")
    val got = graft.operators.Multimodal.padPlan(df)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)))
    assert(got.toSeq === Seq(
      (1L, 400L, 225L, 0L, 0L, 37L, 38L),
      (2L, 100L, 300L, 150L, 150L, 0L, 0L),
      (3L, 400L, 300L, 0L, 0L, 0L, 0L)))
  }
}
