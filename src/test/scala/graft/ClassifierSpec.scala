package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("hash buckets are stable, in range, and count repeats") {
    val df = Seq((1L, "a b a  c")).toDF("id", "text")
    val b = df.select(Classifier.hashBuckets($"text", 64).as("b"))
      .head().getSeq[Int](0)
    assert(b.length == 4, "empty tokens dropped, repeats kept")
    assert(b.forall(x => x >= 0 && x < 64))
    assert(b(0) == b(2), "same token hashes to the same bucket")
  }

  test("learns a linearly separable vocabulary split") {
    // positives speak {good great fine}, negatives {bad awful poor}
    val pos = Seq("good great", "great fine good", "fine fine good",
      "good good great fine")
    val neg = Seq("bad awful", "awful poor bad", "poor poor bad",
      "bad bad awful poor")
    val df = (pos.map((_, 1)) ++ neg.map((_, 0))).zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("id", "text", "label")
    val model = Classifier.train(df, "text", "label",
      dim = 256, epochs = 60, lr = 1.0)
    val out = Classifier.classify(df, "text", model)
      .select($"label", $"keep").collect()
    assert(out.forall(r => r.getBoolean(1) == (r.getInt(0) == 1)),
      "separable data must classify perfectly")
    // held-out text using the same vocabulary
    val held = Seq((100L, "great great fine"), (101L, "poor awful awful"))
      .toDF("id", "text")
    val scores = Classifier.classify(held, "text", model)
      .select($"id", $"score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(100L) > 0.5 && scores(101L) < 0.5)
  }

  test("training loss decreases across epochs") {
    def loss(df: org.apache.spark.sql.DataFrame,
        m: Classifier.LinearModel): Double =
      Classifier.classify(df, "text", m)
        .select(when($"label" === 1, -log($"score"))
          .otherwise(-log(lit(1.0) - $"score")).as("l"))
        .agg(avg($"l")).head().getDouble(0)
    val df = Seq((1L, "x y", 1), (2L, "x z", 1), (3L, "u v", 0),
      (4L, "u w", 0)).toDF("id", "text", "label")
    val m5 = Classifier.train(df, "text", "label", dim = 64, epochs = 5)
    val m40 = Classifier.train(df, "text", "label", dim = 64, epochs = 40)
    assert(loss(df, m40) < loss(df, m5), "more epochs → lower training loss")
  }

  test("recovers a token-presence rule on the real corpus") {
    // The synthetic corpus shares one vocabulary across langs/sources, so
    // no metadata column is text-learnable; plant a ground truth the model
    // can rediscover: label = document mentions "join". A bag-of-words
    // linear model must recover it almost exactly (modulo rare hash
    // collisions at dim 2^14).
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text",
        array_contains(split($"text", " "), "join").cast("int").as("label"))
    val model = Classifier.train(docs, "text", "label",
      dim = 1 << 14, epochs = 40, lr = 2.0)
    val acc = Classifier.classify(docs, "text", model)
      .select(($"keep" === ($"label" === 1)).cast("int").as("ok"))
      .agg(avg($"ok")).head().getDouble(0)
    val baseRate = docs.agg(avg($"label")).head().getDouble(0)
    val majority = math.max(baseRate, 1 - baseRate)
    assert(acc > math.max(majority, 0.9),
      s"accuracy $acc must beat majority class $majority")
  }

  test("fused scoring kernel is bit-identical to the HOF formulation") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .unionByName(Seq((990001L, ""), (990002L, "  doubled  spaces "))
        .toDF("doc_id", "text"))
    val model = Classifier.LinearModel(
      Array.tabulate(1 << 10)(i => (i % 7 - 3) * 0.01), -0.2, 1 << 10)
    val both = docs.select(
      Classifier.scoreExpr($"text", model).as("fused"),
      Classifier.scoreExprHof($"text", model).as("hof"))
    assert(both.filter($"fused" =!= $"hof").head(1).isEmpty,
      "fused kernel must match the HOF spec bit for bit")
    // the kernel stays inside generated code (no interpreted fallback)
    locally {
      import org.apache.spark.sql.execution.debug._
      val probe = docs.select(Classifier.scoreExpr($"text", model).as("s"))
      val code = probe.queryExecution.debug.codegenToSeq().map(_._2).mkString
      assert(code.contains("hashedBagSigmoid"), "scorer fell back")
    }
  }

  test("model round-trips through its DataFrame form") {
    val df = Seq((1L, "x y", 1), (2L, "u v", 0)).toDF("id", "text", "label")
    val m = Classifier.train(df, "text", "label", dim = 32, epochs = 10)
    val back = Classifier.LinearModel.fromDF(m.toDF(spark))
    assert(back.bias == m.bias)
    assert(back.dim == m.dim, "dim row makes the round-trip exact")
    assert(back.weights.toSeq == m.weights.toSeq)
    val s1 = Classifier.classify(df, "text", m).select($"score")
      .as[Double].collect().toSeq
    val s2 = Classifier.classify(df, "text", back)
      .select($"score").as[Double].collect().toSeq
    assert(s1 == s2)
  }

  test("fromDF survives a table filtered to non-zero weights") {
    val df = Seq((1L, "x y", 1), (2L, "u v", 0)).toDF("id", "text", "label")
    val m = Classifier.train(df, "text", "label", dim = 64, epochs = 10)
    // a realistic persisted form: zero rows dropped to save space
    val sparse = m.toDF(spark).filter($"weight" =!= 0.0 || $"bucket" < 0)
    val back = Classifier.LinearModel.fromDF(sparse)
    assert(back.dim == m.dim && back.bias == m.bias)
    assert(back.weights.toSeq == m.weights.toSeq,
      "absent buckets load as 0.0 at the declared dim")
  }

  test("fromDF fails loudly on empty and ambiguous tables") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("bucket", IntegerType),
      StructField("weight", DoubleType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    intercept[IllegalArgumentException] {
      Classifier.LinearModel.fromDF(empty)
    }
    // legacy (no dim row) AND sparse: the true dim is unknowable — refuse
    val ambiguous = Seq((0, 0.5), (7, 0.25), (-1, 0.1)).toDF("bucket", "weight")
    intercept[IllegalArgumentException] {
      Classifier.LinearModel.fromDF(ambiguous)
    }
    // bucket outside the declared dim: corrupt table — refuse
    val corrupt = Seq((0, 0.5), (99, 0.25), (-1, 0.1), (-2, 16.0))
      .toDF("bucket", "weight")
    intercept[IllegalArgumentException] {
      Classifier.LinearModel.fromDF(corrupt)
    }
  }

  test("capped training still learns (deterministic sample)") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", ($"lang" === "en").cast("int").as("label"))
    val m1 = Classifier.train(docs, "text", "label",
      dim = 1 << 12, epochs = 10, maxTrainRows = 200)
    val m2 = Classifier.train(docs, "text", "label",
      dim = 1 << 12, epochs = 10, maxTrainRows = 200)
    assert(m1.weights.toSeq == m2.weights.toSeq && m1.bias == m2.bias,
      "hash-capped training is deterministic")
  }

  test("isotonicCalibrate: PAVA pools the violating block, stays " +
      "monotone, preserves label mass, and is idempotent on monotone " +
      "input") {
    import spark.implicits._
    // scores 1..4 with empirical means 0, 1, 0, 1: PAVA pools
    // scores 2 and 3 into a 0.5 block
    val rows = Seq((1.0, 0.0), (1.0, 0.0), (2.0, 1.0), (2.0, 1.0),
      (3.0, 0.0), (3.0, 0.0), (4.0, 1.0), (4.0, 1.0))
    val got = Classifier.isotonicCalibrate(rows.toDF("score", "label"),
        "score", "label")
      .orderBy("score").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq((1.0, 2L, 0.0, 0.0), (2.0, 2L, 1.0, 0.5),
      (3.0, 2L, 0.0, 0.5), (4.0, 2L, 1.0, 1.0)))
    // monotone + mass-preserving by construction of the expectation
    val cal = got.map(_._4)
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b })
    assert(got.map(t => t._2 * t._4).sum === rows.map(_._2).sum)
    // idempotence: already-monotone means calibrate to themselves
    val mono = Seq((1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (3.0, 1.0))
    val m = Classifier.isotonicCalibrate(mono.toDF("score", "label"),
        "score", "label")
      .orderBy("score").collect()
    m.foreach(r => assert(r.getDouble(3) === r.getDouble(2)))
    // partitioning-invariant replay
    val re = Classifier.isotonicCalibrate(
        rows.toDF("score", "label").repartition(7), "score", "label")
      .orderBy("score").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(re.toSeq === got.toSeq)
  }

  test("rocAuc: separable scores give AUC 1; ties add half-pairs; " +
      "partitioning-invariant") {
    val sep = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("s", "y")
    val g1 = Classifier.rocAuc(sep, $"s", $"y").head()
    assert((g1.getLong(0), g1.getLong(1), g1.getDouble(2),
      g1.getDouble(3)) === ((2L, 2L, 1.0, 1.0)))
    // pos {2,3} vs neg {1,2}: U = 1 + 0.5 + 1 + 1 = 3.5 -> AUC 0.875
    val tied = Seq((1.0, false), (2.0, false), (2.0, true), (3.0, true))
      .toDF("s", "y")
    val g2 = Classifier.rocAuc(tied, $"s", $"y").head()
    assert(g2.getDouble(2) === 0.875 && g2.getDouble(3) === 0.75)
    val re = Classifier.rocAuc(tied.repartition(7), $"s", $"y").head()
    assert(re.getDouble(2) === 0.875)
    // single-class input: AUC undefined, not a crash
    val one = Classifier.rocAuc(
      Seq((1.0, true), (2.0, true)).toDF("s", "y"), $"s", $"y").head()
    assert(one.isNullAt(2) && one.isNullAt(3))
  }

  test("confusionReport: exact cells and single-division rates") {
    // at 0.5: tp=2 fp=1 tn=2 fn=1
    val df = Seq((0.9, true), (0.8, true), (0.7, false), (0.2, true),
      (0.1, false), (0.3, false)).toDF("s", "y")
    val r = Classifier.confusionReport(df, $"s", $"y", 0.5).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 2L, 1L)))
    assert(r.getDouble(4) === 2.0 / 3.0)   // precision
    assert(r.getDouble(5) === 2.0 / 3.0)   // recall
    assert(r.getDouble(6) === 4.0 / 6.0)   // f1 = 2tp/(2tp+fp+fn)
    assert(r.getDouble(7) === 4.0 / 6.0)   // accuracy
  }

  test("calibrationBins: decile binning, micro-exact mean_pred, " +
      "score 1.0 clamps into the last bin") {
    val df = Seq((0.05, false), (0.95, true), (0.95, false), (1.0, true))
      .toDF("s", "y")
    val bins = Classifier.calibrationBins(df, $"s", $"y", bins = 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getLong(0)).toSeq === Seq(0L, 9L))
    val b9 = bins(1)
    assert(b9.getLong(1) === 3L && b9.getLong(2) === 2L)
    assert(b9.getDouble(3) === 2900000.0 / 3000000.0) // mean_pred
    assert(b9.getDouble(4) === 2.0 / 3.0)             // frac_pos
  }

  test("expectedCalibrationError equals the bin-recomputed quantized " +
      "sum; zero for a perfectly calibrated constant bin") {
    val df = Seq((0.05, false), (0.95, true), (0.95, false), (1.0, true))
      .toDF("s", "y")
    val bins = Classifier.calibrationBins(df, $"s", $"y", bins = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(5)))
    val want = bins.map { case (n, gap) =>
      math.floor(gap * n.toDouble * 1e12 + 0.5).toLong }.sum /
      (bins.map(_._1).sum.toDouble * 1e12)
    val got = Classifier
      .expectedCalibrationError(df, $"s", $"y", bins = 10).head()
    assert(got.getDouble(2) === want)
    // two rows at score 0.5, one positive: frac = mean_pred = 0.5
    val cal = Seq((0.5, true), (0.5, false)).toDF("s", "y")
    assert(Classifier.expectedCalibrationError(cal, $"s", $"y", 10)
      .head().getDouble(2) === 0.0)
  }

  test("brierScore: 0 for perfect, 0.25 for coin-flip 0.5 scores") {
    val perfect = Seq((1.0, true), (0.0, false)).toDF("s", "y")
    assert(Classifier.brierScore(perfect, $"s", $"y")
      .head().getDouble(1) === 0.0)
    val half = Seq((0.5, true), (0.5, false), (0.5, true))
      .toDF("s", "y")
    assert(Classifier.brierScore(half, $"s", $"y")
      .head().getDouble(1) === 0.25)
  }

  test("prCurve: thresholds are the grid edges, reverse-cumulative " +
      "exact counts, empty bins still get a row") {
    // scores: .05(neg) .55(pos) .55(neg) .95(pos) with points = 2:
    // bin 0 = {.05}, bin 1 = {.55, .55, .95}
    val df = Seq((0.05, false), (0.55, true), (0.55, false),
      (0.95, true)).toDF("s", "y")
    val got = Classifier.prCurve(df, $"s", $"y", points = 2)
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(5)))
    // t=0.0: everything predicted positive -> tp 2 fp 2 fn 0, rec 1
    // t=0.5: bin >= 1 -> tp 2 fp 1 fn 0, recall 1
    assert(got.toSeq === Seq((0.0, 2L, 2L, 0L, 1.0),
      (0.5, 2L, 1L, 0L, 1.0)))
    // all-negative grid bin keeps precision NULL when no positives
    // are predicted: scores below every nonzero threshold
    val low = Seq((0.01, true)).toDF("s", "y")
    val rows = Classifier.prCurve(low, $"s", $"y", points = 4)
      .orderBy("threshold").collect()
    assert(rows.length === 4)
    assert(rows(3).isNullAt(4))    // no predicted positives at 0.75
    assert(rows(3).getDouble(6) === 0.0) // f1 = 0 (fn > 0)
  }

  test("out-of-domain scores clamp into edge bins (prCurve keeps the " +
      "rows, calibrationBins emits no negative bin)") {
    // a score of -0.3 behaves exactly like 0.0; 1.7 like 1.0
    val oob = Seq((-0.3, false), (0.55, true), (1.7, true))
      .toDF("s", "y")
    val pr = Classifier.prCurve(oob, $"s", $"y", points = 2)
      .orderBy("threshold").collect()
    // t=0.0: all 3 predicted positive (the -0.3 row is NOT dropped)
    assert(pr(0).getLong(1) === 2L && pr(0).getLong(2) === 1L)
    // t=0.5: bin>=1 = {0.55, 1.7} -> tp 2 fp 0
    assert(pr(1).getLong(1) === 2L && pr(1).getLong(2) === 0L)
    // recall denominator includes every positive
    assert(pr(1).getDouble(5) === 1.0)
    val cal = Classifier.calibrationBins(oob, $"s", $"y", bins = 10)
      .orderBy("bin").collect()
    assert(cal.map(_.getLong(0)).toSeq === Seq(0L, 5L, 9L))
    assert(cal.forall(_.getLong(0) >= 0L))
  }

  test("mccReport: hand confusion cells — MCC, balanced accuracy and " +
      "Youden's J exact; zero marginal gives NULL MCC") {
    val rows = Seq((0.9, true), (0.8, true), (0.7, true), (0.6, true),
      (0.55, false), (0.4, false), (0.3, false), (0.2, false),
      (0.1, true), (0.05, true)).toDF("s", "y")
    val got = Classifier.mccReport(rows, $"s", $"y").head()
    // tp=4 fp=1 tn=3 fn=2: MCC = 10/sqrt(600)
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) === ((4L, 1L, 3L, 2L)))
    assert(math.abs(got.getDouble(5) - 10.0 / math.sqrt(600.0)) < 1e-15)
    assert(math.abs(got.getDouble(6) - (4.0 / 6 + 3.0 / 4) / 2) < 1e-15)
    assert(math.abs(got.getDouble(7) - (4.0 / 6 + 3.0 / 4 - 1)) < 1e-15)
    // all-positive labels: tn+fp margin = 0 -> MCC NULL
    val onesided = Classifier.mccReport(
      Seq((0.9, true), (0.1, true)).toDF("s", "y"), $"s", $"y").head()
    assert(onesided.isNullAt(5))
  }

  test("cohenKappa: textbook 2x2 agreement; perfect agreement gives " +
      "1; constant identical raters give NULL") {
    val rows = Seq.fill(20)(("yes", "yes")) ++
      Seq.fill(10)(("no", "no")) ++ Seq.fill(15)(("yes", "no")) ++
      Seq.fill(5)(("no", "yes"))
    val got = Classifier.cohenKappa(rows.toDF("a", "b"), $"a", $"b")
      .head()
    // p_o = .6; marginals A(35,15) B(25,25) -> p_e = .5 -> kappa = .2
    assert(got.getLong(0) === 50L && got.getLong(1) === 30L)
    assert(got.getDouble(2) === 0.6 && got.getDouble(3) === 0.5)
    assert(math.abs(got.getDouble(4) - 0.2) < 1e-15)
    val perfect = Classifier.cohenKappa(
      Seq(("x", "x"), ("y", "y")).toDF("a", "b"), $"a", $"b").head()
    assert(perfect.getDouble(4) === 1.0)
    // both raters constant and identical: denominator 0 -> NULL
    val const = Classifier.cohenKappa(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), $"a", $"b").head()
    assert(const.isNullAt(4))
    val re = Classifier.cohenKappa(rows.toDF("a", "b")
      .repartition(7), $"a", $"b").head()
    assert(re.toSeq === got.toSeq)
  }

  test("liftCurve: hand decile table — capture and lift exact, ties " +
      "broken by id, partitioning-invariant") {
    val rows = Seq((1L, 0.95, true), (2L, 0.90, true), (3L, 0.80, true),
      (4L, 0.70, false), (5L, 0.60, false), (6L, 0.50, false),
      (7L, 0.40, false), (8L, 0.30, false), (9L, 0.20, false),
      (10L, 0.10, true)).toDF("id", "s", "y")
    val got = Classifier.liftCurve(rows, "id", $"s", $"y", buckets = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // buckets of 2 by descending score; 4 positives of 10 total
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 2L, 0.50, 2.5),
      (2L, 2L, 1L, 3L, 0.75, 1.875),
      (3L, 2L, 0L, 3L, 0.75, 1.25),
      (4L, 2L, 0L, 3L, 0.75, 0.9375),
      (5L, 2L, 1L, 4L, 1.00, 1.0)))
    val re = Classifier.liftCurve(rows.repartition(7), "id", $"s",
        $"y", buckets = 5)
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(re.toSeq === got.map(t => (t._1, t._4)).toSeq)
  }

  test("mcNemar: textbook discordant cells with and without the " +
      "continuity correction; no-disagreement case yields NULL") {
    // b = 10 (A only), c = 4 (B only), 6 both right, 5 both wrong
    val rows = Seq.fill(6)((true, true)) ++ Seq.fill(5)((false, false)) ++
      Seq.fill(10)((true, false)) ++ Seq.fill(4)((false, true))
    val df = rows.toDF("a", "b")
    val got = Classifier.mcNemar(df, $"a", $"b").head
    assert(got.getLong(0) === 25L && got.getLong(1) === 6L &&
      got.getLong(2) === 5L && got.getLong(3) === 10L &&
      got.getLong(4) === 4L)
    // continuity: (|10−4|−1)²/14 = 25/14
    assert(math.abs(got.getDouble(5) - 25.0 / 14.0) < 1e-12)
    assert(got.getDouble(6) > 0.0 && got.getDouble(6) < 1.0)
    val raw = Classifier.mcNemar(df, $"a", $"b", continuity = false).head
    assert(math.abs(raw.getDouble(5) - 36.0 / 14.0) < 1e-12)
    // the dof-1 tail equals erfc(√χ²/√2): spot vs a known value —
    // χ² = 36/14 ≈ 2.571 → p ≈ 0.1088 (A&S poly, |ε| < 1.5e-7)
    assert(math.abs(raw.getDouble(6) - 0.1088) < 1e-3)
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Classifier.mcNemar(agree, $"a", $"b").head.isNullAt(5))
  }

  test("fleissKappa: the Wikipedia worked example reproduces kappa " +
      "0.210; varying rater counts raise in-plan") {
    // Fleiss 1971 / Wikipedia 14-subject, 14-rater example is big;
    // use the standard small check instead: 2 raters reduce Fleiss to
    // Cohen-like agreement. 4 items, 2 raters, categories x/y:
    // items: (x,x), (x,y), (y,x), (y,y) → P̄ = (2·1+2·0)/4... hand:
    // per item Σn_ic²: {4, 2, 2, 4} wait n=2: (x,x): 2²=4 → P_i =
    // (4−2)/(2·1)=1; (x,y): 1+1=2 → 0. P̄ = 0.5. marginals: x: 4/8,
    // y: 4/8 → P̄e = 0.5 → κ = 0.
    val df = Seq((1, "x"), (1, "x"), (2, "x"), (2, "y"),
      (3, "y"), (3, "x"), (4, "y"), (4, "y")).toDF("item", "rating")
    val got = Classifier.fleissKappa(df, "item", "rating").head
    assert(got.getLong(0) === 4L && got.getLong(1) === 2L)
    assert(got.getDouble(2) === 0.5 && got.getDouble(3) === 0.5)
    assert(got.getDouble(4) === 0.0)
    // perfect agreement: κ = 1 (P̄ = 1, P̄e < 1)
    val perfect = Seq((1, "x"), (1, "x"), (2, "y"), (2, "y"))
      .toDF("item", "rating")
    assert(Classifier.fleissKappa(perfect, "item", "rating")
      .head.getDouble(4) === 1.0)
    // one category only: P̄e = 1 → NULL
    val mono = Seq((1, "x"), (1, "x"), (2, "x"), (2, "x"))
      .toDF("item", "rating")
    assert(Classifier.fleissKappa(mono, "item", "rating")
      .head.isNullAt(4))
    // ragged rater counts refuse loudly
    val ragged = Seq((1, "x"), (1, "x"), (2, "x")).toDF("item", "rating")
    val e = intercept[Exception] {
      Classifier.fleissKappa(ragged, "item", "rating").collect()
    }
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + " | " + chain(x.getCause)
    assert(chain(e).contains("constant rater count"))
  }

  test("conformalThreshold: exact ceil((n+1)(1-a)) order statistic; " +
      "uncertifiable alpha yields NULL; coverage is the eval fraction") {
    // 9 calibration rows 1..9, alpha=0.1: rank = ceil(10·0.9) = 9 → 9.0
    val cal = (1 to 9).map(i => (i.toLong, i.toDouble, true))
    val ev = Seq((101L, 5.0, false), (102L, 9.5, false),
      (103L, 2.0, false), (104L, 12.0, false))
    val df = (cal ++ ev).toDF("id", "v", "c")
    val got = Classifier.conformalThreshold(
      df, $"v", $"c", "id", alpha = 0.1).head
    assert(got.getLong(0) === 9L && got.getLong(1) === 4L)
    assert(got.getLong(2) === 9L && got.getDouble(3) === 9.0)
    assert(got.getDouble(4) === 0.5) // 5.0, 2.0 covered; 9.5, 12 not
    assert(got.getDouble(5) === 0.9)
    // alpha too strict for 9 rows: rank 10 > 9 → NULL, no silent clamp
    val strict = Classifier.conformalThreshold(
      df, $"v", $"c", "id", alpha = 0.01).head
    assert(strict.getLong(2) === 10L && strict.isNullAt(3) &&
      strict.isNullAt(4))
    // partitioning-invariance (distributed rank, not a lucky sort)
    val re = Classifier.conformalThreshold(
      df.repartition(7), $"v", $"c", "id", alpha = 0.1).head
    assert(re.toSeq === got.toSeq)
  }

  test("targetEncodeLoo: hand smoothed leave-one-out values; " +
      "singleton category with zero smoothing gets NULL") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 3.0), (3L, "b", 10.0))
      .toDF("id", "cat", "y")
    // enc = (S_c − y + m·S/N)/((n_c−1+m)·1e6) in exact micro units
    val got = Classifier.targetEncodeLoo(
        df, "cat", $"y", "id", smoothing = 1.0)
      .orderBy("id").collect()
    val prior = 14.0 * 1e6 / 3.0
    assert(math.abs(got(0).getDouble(3) -
      (3.0e6 + prior) / (1.0 + 1.0) / 1e6) < 1e-12)
    assert(math.abs(got(1).getDouble(3) -
      (1.0e6 + prior) / (1.0 + 1.0) / 1e6) < 1e-12)
    assert(math.abs(got(2).getDouble(3) -
      (0.0 + prior) / (0.0 + 1.0) / 1e6) < 1e-12)
    assert(got.map(_.getLong(2)).toSeq === Seq(2L, 2L, 1L))
    // singleton + m=0: no leak-free estimate exists
    val bare = Classifier.targetEncodeLoo(
        df, "cat", $"y", "id", smoothing = 0.0)
      .filter($"id" === 3L).head
    assert(bare.isNullAt(3))
    val re = Classifier.targetEncodeLoo(
        df.repartition(5), "cat", $"y", "id", smoothing = 1.0)
      .orderBy("id").collect()
    assert(re.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("plattCalibrate: the two-point fixture fits the smoothed " +
      "frequencies exactly (a = ln 2.5, b = 0); one-class input " +
      "refuses with NULLs; partitioning-invariant") {
    // 5 rows at s = −1 (1 pos) and 5 at s = +1 (4 pos): two free
    // parameters interpolate the two smoothed means 2/7 and 5/7, so
    // σ(a+b) = 5/7 and σ(−a+b) = 2/7 ⇒ a = ln(5/2), b = 0
    val rows = (0 until 5).map(i => (-1.0, i == 0)) ++
      (0 until 5).map(i => (1.0, i != 0))
    val df = rows.toDF("s", "y")
    val got = Classifier.plattCalibrate(df, $"s", $"y").head()
    assert(got.getLong(0) == 5 && got.getLong(1) == 5)
    assert(math.abs(got.getDouble(2) - math.log(2.5)) < 1e-6,
      s"a = ${got.getDouble(2)}")
    assert(math.abs(got.getDouble(3)) < 1e-6, s"b = ${got.getDouble(3)}")
    assert(got.getDouble(4) > 0.0 && got.getDouble(4) < 1.0)
    val oneClass = Classifier.plattCalibrate(
      df.filter($"y"), $"s", $"y").head()
    assert(oneClass.isNullAt(2) && oneClass.isNullAt(3))
    val re = Classifier.plattCalibrate(df.repartition(7), $"s", $"y")
      .head()
    assert(re.getDouble(2) == got.getDouble(2) &&
      re.getDouble(3) == got.getDouble(3) &&
      re.getDouble(4) == got.getDouble(4))
  }

  test("cronbachAlpha: duplicated items give alpha = 1; incomplete " +
      "respondents are excluded and counted; partitioning-invariant") {
    // two identical items → totals have exactly double the item
    // variance structure → α = 2·(1 − (v+v)/(4v)) = 1
    val rows = (1 to 4).flatMap(r => Seq(
      (s"r$r", "i1", r.toDouble), (s"r$r", "i2", r.toDouble)))
    val df = rows.toDF("resp", "item", "s")
    val got = Classifier.cronbachAlpha(df, "resp", "item", $"s").head()
    assert(got.getLong(0) == 2 && got.getLong(1) == 4 &&
      got.getLong(2) == 0)
    assert(math.abs(got.getDouble(3) - 1.0) < 1e-6,
      s"alpha=${got.getDouble(3)}")
    // item variance of {1,2,3,4} = 5/3 each; total var = 20/3
    assert(math.abs(got.getDouble(4) - 10.0 / 3.0) < 1e-3)
    assert(math.abs(got.getDouble(5) - 20.0 / 3.0) < 1e-3)
    val withBad = df.unionByName(
      Seq(("r9", "i1", 2.0)).toDF("resp", "item", "s"))
    val g2 = Classifier.cronbachAlpha(withBad, "resp", "item", $"s")
      .head()
    assert(g2.getLong(1) == 4 && g2.getLong(2) == 1)
    assert(g2.getDouble(3) == got.getDouble(3))
    val rep = Classifier.cronbachAlpha(df.repartition(5), "resp",
      "item", $"s").head()
    assert(rep.getDouble(3) == got.getDouble(3))
  }

  test("iccOneWay: zero within-variance gives ICC = 1; identical " +
      "targets with internal spread give ICC = −1; unbalanced " +
      "targets are excluded; partitioning-invariant") {
    val perfect = Seq(("t1", 1.0), ("t1", 1.0), ("t2", 5.0),
      ("t2", 5.0), ("t3", 9.0), ("t3", 9.0)).toDF("t", "s")
    val got = Classifier.iccOneWay(perfect, "t", $"s", 2).head()
    assert(got.getLong(0) == 2 && got.getLong(1) == 3 &&
      got.getLong(2) == 0)
    assert(math.abs(got.getDouble(5) - 1.0) < 1e-6)
    assert(got.getDouble(4) == 0.0, "MSW = 0 at perfect agreement")
    val pure = Seq(("t1", 1.0), ("t1", 2.0), ("t2", 1.0), ("t2", 2.0))
      .toDF("t", "s")
    val g2 = Classifier.iccOneWay(pure, "t", $"s", 2).head()
    assert(math.abs(g2.getDouble(5) + 1.0) < 1e-6,
      s"icc=${g2.getDouble(5)}")
    val withBad = perfect.unionByName(Seq(("t9", 3.0)).toDF("t", "s"))
    val g3 = Classifier.iccOneWay(withBad, "t", $"s", 2).head()
    assert(g3.getLong(1) == 3 && g3.getLong(2) == 1)
    assert(g3.getDouble(5) == got.getDouble(5))
    val rep = Classifier.iccOneWay(perfect.repartition(5), "t", $"s", 2)
      .head()
    assert(rep.getDouble(5) == got.getDouble(5))
  }

  test("cochranQ: hand-computed 3-model Q; k=2 equals uncorrected " +
      "McNemar; incomplete examples excluded; no-discordance refuses; " +
      "partitioning-invariant") {
    // T = (3,2,1), R = (3,1,2,0) → Q = 2[3·14 − 36]/(18 − 14) = 3
    val rows = Seq(
      (1L, "a", 1), (1L, "b", 1), (1L, "c", 1),
      (2L, "a", 1), (2L, "b", 0), (2L, "c", 0),
      (3L, "a", 1), (3L, "b", 1), (3L, "c", 0),
      (4L, "a", 0), (4L, "b", 0), (4L, "c", 0),
      (5L, "a", 1)) // incomplete — excluded, counted
    val df = rows.toDF("id", "model", "ok")
    val got = Classifier.cochranQ(df, "id", "model", $"ok" === 1).head()
    assert(got.getLong(0) == 3 && got.getLong(1) == 4 &&
      got.getLong(2) == 1)
    assert(math.abs(got.getDouble(3) - 3.0) < 1e-9)
    assert(got.getLong(4) == 2)
    // χ²₂ tail at 3 is e^{−3/2} ≈ 0.2231 (W–H lands near it)
    assert(got.getDouble(5) > 0.19 && got.getDouble(5) < 0.26)
    // k = 2: Q must equal the UNcorrected McNemar χ² on the same pairs
    val two = Seq(
      (1L, "a", 1), (1L, "b", 0), (2L, "a", 0), (2L, "b", 1),
      (3L, "a", 1), (3L, "b", 0), (4L, "a", 1), (4L, "b", 1),
      (5L, "a", 0), (5L, "b", 0)).toDF("id", "model", "ok")
    val q2 = Classifier.cochranQ(two, "id", "model", $"ok" === 1).head()
    val wide = Seq((true, false), (false, true), (true, false),
      (true, true), (false, false)).toDF("a", "b")
    val mc = Classifier.mcNemar(wide, $"a", $"b", continuity = false)
      .head()
    assert(math.abs(q2.getDouble(3) - mc.getDouble(5)) < 1e-9)
    assert(math.abs(q2.getDouble(5) - mc.getDouble(6)) < 1e-9)
    // every complete example identical → zero denominator → refuse
    val flat = Seq((1L, "a", 1), (1L, "b", 1), (2L, "a", 1),
      (2L, "b", 1)).toDF("id", "model", "ok")
    val g3 = Classifier.cochranQ(flat, "id", "model", $"ok" === 1).head()
    assert(g3.isNullAt(3) && g3.isNullAt(5))
    val rep = Classifier.cochranQ(df.repartition(7), "id", "model",
      $"ok" === 1).head()
    assert(rep.getDouble(3) == got.getDouble(3) &&
      rep.getDouble(5) == got.getDouble(5))
  }

  test("qiniCurve: hand-computed two-bucket uplift and qini; " +
      "partitioning-invariant") {
    val df = Seq(
      (1L, 0.9, true, true), (2L, 0.8, false, false),
      (3L, 0.7, true, true), (4L, 0.6, false, false),
      (5L, 0.5, true, false), (6L, 0.4, false, true),
      (7L, 0.3, true, false), (8L, 0.2, false, false))
      .toDF("id", "s", "t", "y")
    val got = Classifier.qiniCurve(df, "id", $"s", $"t", $"y",
      buckets = 2).collect()
    assert(got.length == 2)
    val b1 = got(0)
    assert(b1.getLong(1) == 2 && b1.getLong(2) == 2 &&
      b1.getLong(3) == 2 && b1.getLong(4) == 0)
    assert(math.abs(b1.getDouble(9) - 1.0) < 1e-9) // 2/2 − 0/2
    assert(math.abs(b1.getDouble(10) - 2.0) < 1e-9) // 2 − 0·(2/2)
    val b2 = got(1)
    assert(b2.getLong(5) == 4 && b2.getLong(6) == 4 &&
      b2.getLong(7) == 2 && b2.getLong(8) == 1)
    assert(math.abs(b2.getDouble(9) - 0.25) < 1e-9) // 0.5 − 0.25
    assert(math.abs(b2.getDouble(10) - 1.0) < 1e-9) // 2 − 1·(4/4)
    val rep = Classifier.qiniCurve(df.repartition(5), "id", $"s", $"t",
      $"y", buckets = 2).collect()
    assert(rep.map(_.getDouble(10)).toSeq ==
      got.map(_.getDouble(10)).toSeq)
  }
}
