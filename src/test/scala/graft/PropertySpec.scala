package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TypeMapping
import graft.sources.JdbcImport

/** Property tests for the pure translation layers — the SURVEY §5 strategy
  * (ScalaCheck where the reference has pure functions: type codecs, split
  * algebra, partition templates). Uses ScalaCheck generators with a fixed
  * seed and an explicit sampling loop (no scalatest-plus bridge available
  * offline). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("jdbc split predicates partition the range exactly") {
    val gen = for {
      lo <- Gen.chooseNum(-100000L, 100000L)
      span <- Gen.chooseNum(0L, 500000L)
      n <- Gen.chooseNum(1, 64)
    } yield (lo, lo + span, n)
    samples(gen).foreach { case (lo, hi, n) =>
      val preds = JdbcImport.splitPredicates("x", lo, hi, n)
      assert(preds.nonEmpty && preds.size <= n)
      val Range1 = """x >= (-?\d+) AND x < (-?\d+)""".r
      val Range2 = """x >= (-?\d+) AND x <= (-?\d+)""".r
      val ranges = preds.map {
        case Range1(a, b) => (a.toLong, b.toLong)     // [a, b)
        case Range2(a, b) => (a.toLong, b.toLong + 1) // [a, b]
      }
      assert(ranges.head._1 == lo, s"($lo,$hi,$n)")
      assert(ranges.last._2 == hi + 1, s"($lo,$hi,$n)")
      ranges.sliding(2).foreach {
        case Seq((_, e), (s, _)) => assert(e == s, s"($lo,$hi,$n)")
        case _ =>
      }
    }
  }

  test("scalar type mapping round-trips through external names") {
    import org.apache.spark.sql.types._
    val scalars = Gen.oneOf[DataType](ByteType, ShortType, IntegerType,
      LongType, FloatType, DoubleType, BooleanType, StringType, BinaryType,
      DateType, TimestampType, DecimalType(38, 18), DecimalType(10, 2))
    samples(scalars).foreach { dt =>
      assert(TypeMapping.toSparkType(TypeMapping.toExternalType(dt)) == dt)
    }
  }

  test("nested type mapping round-trips") {
    import org.apache.spark.sql.types._
    val leaf = Gen.oneOf[DataType](IntegerType, StringType, DoubleType,
      DecimalType(12, 3))
    def nested(depth: Int): Gen[DataType] =
      if (depth == 0) leaf
      else Gen.oneOf(
        leaf,
        nested(depth - 1).map(ArrayType(_)),
        Gen.zip(leaf, nested(depth - 1)).map { case (k, v) => MapType(k, v) },
        Gen.zip(nested(depth - 1), nested(depth - 1)).map { case (a, b) =>
          StructType(Seq(StructField("f1", a), StructField("f2", b)))
        })
    samples(nested(3)).foreach { dt =>
      assert(TypeMapping.toSparkType(TypeMapping.toExternalType(dt)) == dt)
    }
  }

  test("partition template resolution never throws on literal segments") {
    samples(Gen.listOfN(3, Gen.alphaLowerStr.suchThat(_.nonEmpty)), 50)
      .foreach { parts =>
        val tpl = s"${parts(0)}_%{c1}_${parts(1)}_%{c2}_${parts(2)}"
        graft.sources.PartitionedWrite.resolveTemplate(tpl)
      }
  }

  test("bpe: encodeWord concatenation always reconstructs the word") {
    import graft.operators.Tokenizer
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val corpus = Gen.nonEmptyListOf(
      word.flatMap(w => Gen.chooseNum(1L, 20L).map(w -> _)))
    val merges = Gen.chooseNum(0, 40)
    val gen = for { c <- corpus; m <- merges; probe <- word } yield (c, m, probe)
    samples(gen, 100).foreach { case (counts, m, probe) =>
      val model = Tokenizer.bpeTrainFromCounts(counts, m)
      // lossless: symbols concatenate back to word + end marker, for
      // training words and arbitrary probes alike
      (probe +: counts.map(_._1)).foreach { w =>
        val enc = Tokenizer.encodeWord(w, model.ranks)
        assert(enc.mkString == w + Tokenizer.EndOfWord,
          s"lossy encode of '$w' with $m merges over $counts")
        assert(enc.forall(_.nonEmpty))
      }
    }
  }

  test("bpe: more merges never increases a training word's token count") {
    import graft.operators.Tokenizer
    val gen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
        .flatMap(w => Gen.chooseNum(1L, 9L).map(w -> _)))
    samples(gen, 60).foreach { counts =>
      val full = Tokenizer.bpeTrainFromCounts(counts, 60)
      (0 to 60 by 10).foldLeft(Int.MaxValue) { (prevTotal, m) =>
        val model = Tokenizer.BpeModel(full.merges.take(m))
        val total = counts.map { case (w, _) =>
          Tokenizer.encodeWord(w, model.ranks).length }.sum
        assert(total <= prevTotal,
          s"token total rose from $prevTotal to $total at $m merges")
        total
      }
    }
  }

  test("splitCorpus bucket bounds cover [0, denominator) for any weights") {
    import graft.operators.Dedup
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(1, 1000))
      .suchThat(_.size <= 8)
    samples(gen, 100).foreach { ws =>
      val splits = ws.zipWithIndex.map { case (w, i) => (s"s$i", w.toDouble) }
      // bounds math mirrored from splitCorpus: last bound open-ended
      val total = splits.map(_._2).sum
      val bounds = splits.scanLeft(0.0) {
        case (acc, (_, w)) => acc + w / total * 65536 }.tail
      assert(bounds.last >= 65536 - 1e-6,
        s"tail range must reach the denominator: $bounds")
      assert(bounds == bounds.sorted, "ranges must be monotonic")
    }
  }

  test("sortableDoubleBits is a total-order embedding matching Spark sort") {
    import org.apache.spark.sql.graft.SortKernels.sortableBits
    val specials = Seq(Double.NegativeInfinity, -Double.MaxValue,
      -1.0, -Double.MinPositiveValue, -0.0, 0.0,
      Double.MinPositiveValue, 1.0, Double.MaxValue,
      Double.PositiveInfinity, Double.NaN)
    val gen = Gen.oneOf(
      Gen.chooseNum(-1e300, 1e300),
      Gen.chooseNum(-1.0, 1.0),
      Gen.oneOf(specials))
    val xs = samples(gen, 500) ++ specials
    // java.lang.Double.compare is exactly Spark's sort order for doubles
    // (NaN greatest, -0.0 < 0.0 is NOT distinguished by compare — it
    // orders -0.0 < 0.0, and so does the bit embedding)
    for (a <- xs; b <- xs.take(40)) {
      assert(java.lang.Long.compare(sortableBits(a), sortableBits(b)).signum ===
        java.lang.Double.compare(a, b).signum,
        s"order must be preserved for ($a, $b)")
    }
  }

  test("bottom-k group sample: aggregate equals sorted-take-k for random " +
      "data, any k, any partitioning") {
    // law behind d150/d158: the mergeable heap is a pure function of the
    // input SET — exercised through the public column API on a local df
    val spark = SparkTestBase.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    (0 until 8).foreach { trial =>
      val n = 1 + rnd.nextInt(300)
      val k = 1 + rnd.nextInt(12)
      val parts = 1 + rnd.nextInt(7)
      val rows = (0 until n).map { i =>
        (s"g${rnd.nextInt(4)}", rnd.nextInt(50).toLong, i.toLong)
      }
      val df = rows.toDF("g", "key", "id").repartition(parts)
      val got = df.groupBy($"g")
        .agg(org.apache.spark.sql.graft.NativeFunctions
          .bottomKIdsAgg($"key", $"id", k).as("ids"))
        .collect().map(r => r.getString(0) ->
          r.getSeq[Long](1).toList).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).sorted.take(k).map(_._2).toList
      }
      assert(got === want, s"trial $trial n=$n k=$k parts=$parts")
    }
  }
}
