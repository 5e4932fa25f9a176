package graft

import org.apache.spark.sql.functions._

import graft.operators.LanguageModel

class LanguageModelSpec extends SparkTestBase {
  import spark.implicits._

  test("ngrams builds sliding windows, short docs yield empty") {
    val df = Seq((1L, "a b c d"), (2L, "x"), (3L, "")).toDF("id", "text")
    val out = df.select($"id",
      LanguageModel.ngrams(
        filter(split($"text", " "), t => t =!= ""), 2).as("g"))
      .select($"id", size($"g").as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 0, 3L -> 0))
    val tri = df.filter($"id" === 1).select(
      LanguageModel.ngrams(split($"text", " "), 3).as("g"))
      .select(explode($"g").as("g"))
      .select(concat_ws("_", $"g.g0", $"g.g1", $"g.g2")).as[String]
      .collect().toSeq
    assert(tri == Seq("a_b_c", "b_c_d"))
  }

  test("bigram model matches hand-computed add-alpha probabilities") {
    // corpus: "a b" x3, "a c" x1 → c(a,b)=3, c(a,c)=1, c(a)=4, V=2
    val ref = Seq("a b", "a b", "a b", "a c").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val lm = LanguageModel.train(ref, "text", n = 2, alpha = 0.5)
    assert(lm.vocabSize == 2)
    val probs = lm.grams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val denom = 4.0 + 0.5 * 2
    assert(math.abs(probs(("a", "b")) - math.log(3.5 / denom)) < 1e-12)
    assert(math.abs(probs(("a", "c")) - math.log(1.5 / denom)) < 1e-12)
    val unseen = lm.contexts.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(unseen("a") - math.log(0.5 / denom)) < 1e-12)

    // doc "a b a d": grams (a,b) seen, (b,a) unseen ctx → log(1/V),
    // (a,d) unseen word after seen ctx → unseen_logp(a)
    val doc = Seq((9L, "a b a d")).toDF("id", "text")
    val scored = LanguageModel.perplexity(doc, lm, "id", "text").head()
    val expectAvg = (math.log(3.5 / denom) + math.log(1.0 / 2) +
      math.log(0.5 / denom)) / 3.0
    assert(scored.getLong(1) == 3)
    assert(math.abs(scored.getDouble(2) - expectAvg) < 1e-12)
    assert(math.abs(scored.getDouble(3) - math.exp(-expectAvg)) < 1e-12)
  }

  test("trigram model scores with two-word contexts") {
    // corpus "a b c" x2, "a b d" x1: c(ab,c)=2, c(ab,d)=1, c(ab)=3, V=2
    val ref = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("id", "text")
    val lm = LanguageModel.train(ref, "text", n = 3, alpha = 0.5)
    assert(lm.vocabSize == 2)
    val probs = lm.grams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val denom = 3.0 + 0.5 * 2
    assert(math.abs(probs(("a b", "c")) - math.log(2.5 / denom)) < 1e-12)
    assert(math.abs(probs(("a b", "d")) - math.log(1.5 / denom)) < 1e-12)
    val scored = LanguageModel.perplexity(
      Seq((9L, "a b c")).toDF("id", "text"), lm, "id", "text").head()
    assert(scored.getLong(1) == 1)
    assert(math.abs(scored.getDouble(2) - math.log(2.5 / denom)) < 1e-12)
  }

  test("unscoreable documents score null perplexity but keep their row") {
    val ref = Seq((1L, "a b c")).toDF("id", "text")
    val lm = LanguageModel.train(ref, "text", n = 2)
    val target = Seq((1L, "a b"), (2L, "solo"), (3L, "")).toDF("id", "text")
    val out = LanguageModel.perplexity(target, lm, "id", "text")
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("in-domain text scores lower perplexity than scrambled text") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val lm = LanguageModel.train(docs, "text", n = 2, alpha = 0.1)
    // Scramble: reverse each document's token order — same unigrams,
    // destroyed bigram structure.
    val scrambled = docs.select($"doc_id",
      concat_ws(" ", reverse(split($"text", " "))).as("text"))
    val real = LanguageModel.perplexity(docs, lm, "doc_id", "text")
      .agg(avg("avg_logp")).head().getDouble(0)
    val fake = LanguageModel.perplexity(scrambled, lm, "doc_id", "text")
      .agg(avg("avg_logp")).head().getDouble(0)
    assert(real > fake,
      s"training-domain avg logp ($real) must beat scrambled ($fake)")
  }

  test("stupid backoff scores unseen contexts by discounted unigram") {
    // corpus "a b" x3, "a c" x1: unigram counts a=4, b=3, c=1, N=8, V=3
    // (unigram table counts every gram position's words... here ctx words
    // 'a' appear as unigram? unigrams derive from the n-gram table's WORD
    // column: b=3, c=1, N=4, V=2)
    val ref = Seq("a b", "a b", "a b", "a c").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val lam = 0.4
    val lm = LanguageModel.train(ref, "text", n = 2, alpha = 0.5,
      backoff = Some(lam))
    // doc "x b": one bigram (x,b) with unseen ctx 'x' and seen word 'b'
    // → log λ + log((3+0.5)/(4+0.5·2))
    val doc = Seq((9L, "x b")).toDF("id", "text")
    val got = LanguageModel.perplexity(doc, lm, "id", "text")
      .head().getDouble(2)
    val want = math.log(lam) + math.log(3.5 / 5.0)
    assert(math.abs(got - want) < 1e-12)
    // unseen ctx AND unseen word still falls to uniform 1/V
    val doc2 = Seq((9L, "x q")).toDF("id", "text")
    val got2 = LanguageModel.perplexity(doc2, lm, "id", "text")
      .head().getDouble(2)
    assert(math.abs(got2 - math.log(1.0 / 2)) < 1e-12)
  }

  test("perplexityFilter preserves input columns and adds perplexity") {
    val ref = Seq((1L, "a b c")).toDF("id", "text")
    val target = Seq((1L, "a b", "s1"), (2L, "solo", "s2"))
      .toDF("id", "text", "source")
    val out = LanguageModel.perplexityFilter(target, ref, "id", "text",
      keepQuantile = 1.0)
    assert(out.columns.toSeq == Seq("id", "text", "source", "perplexity"))
    assert(out.count() == 2)
  }

  test("perplexityFilter degrades gracefully with zero scoreable docs") {
    val ref = Seq((1L, "a b c")).toDF("id", "text")
    // every target doc is shorter than n=2 tokens → no n-grams, NULL cut
    val target = Seq((1L, "solo"), (2L, "")).toDF("id", "text")
    val kept = LanguageModel.perplexityFilter(target, ref, "id", "text")
    assert(kept.count() == 2, "keepUnscoreable=true keeps everything")
    val dropped = LanguageModel.perplexityFilter(target, ref, "id", "text",
      keepUnscoreable = false)
    assert(dropped.count() == 0, "keepUnscoreable=false drops everything")
  }

  test("perplexityFilter keeps the fluent tail and the short docs") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val target = docs.unionByName(
      Seq((900001L, "zq xv qj"), (900002L, "a")).toDF("doc_id", "text"))
    val kept = LanguageModel.perplexityFilter(target, docs,
      "doc_id", "text", keepQuantile = 0.5)
    val keptIds = kept.select($"doc_id").as[Long].collect().toSet
    val total = target.count()
    assert(keptIds.size < total, "filter must drop something")
    assert(keptIds.contains(900002L), "unscoreable short doc kept by default")
    assert(!keptIds.contains(900001L),
      "gibberish with unseen contexts should land in the dropped tail")
  }

  test("collocations: hand-computed PMI, minCount gate, total order") {
    // one doc: x y x y x y x y x y -> unigrams x:5 y:5 (N_uni = 10),
    // bigrams "x y":5 "y x":4 (N_bi = 9)
    val df = Seq((1L, "x y x y x y x y x y")).toDF("id", "text")
    val all = LanguageModel.collocations(df, "text", minCount = 1, topK = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // pmi(x,y) = ln(5 * 10^2 / (9 * 5 * 5)) = ln(20/9); pmi(y,x) = ln(16/9)
    assert(all.toSeq === Seq(
      ("x", "y", 5L, BigDecimal(math.log(20.0 / 9))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("y", "x", 4L, BigDecimal(math.log(16.0 / 9))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // minCount suppresses the rare pair but totals stay corpus-wide:
    // the surviving score is unchanged
    val cut = LanguageModel.collocations(df, "text", minCount = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    assert(cut.toSeq === Seq(("x", "y", all(0)._4)))
  }

  test("dunningCollocations: hand 2x2 LLR over positional marginals; " +
      "repulsion pairs dropped; partitioning-invariant") {
    // bigrams of "a b a b c d": (a,b)x2 (b,a)x1 (b,c)x1 (c,d)x1, N = 5
    val df = Seq((1L, "a b a b c d")).toDF("id", "text")
    val got = LanguageModel.dunningCollocations(df, "text")
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // (a,b): k11=2 r1=2 c1=2 -> k12=k21=0, k22=3;
    // llr = 2·(2·ln(2·5/(2·2)) + 3·ln(3·5/(3·3)))
    val llrAB = BigDecimal(2.0 * (2.0 * math.log(10.0 / 4) +
        3.0 * math.log(15.0 / 9)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.exists(t => t._1 == "a" && t._2 == "b" &&
      t._3 == 2L && t._4 === llrAB))
    // (b,a): k11=1, r1(b·)=2, c1(·a)=1 -> k11·N = 5 > r·c = 2: kept;
    // every returned pair must satisfy the positive-association gate
    assert(got.nonEmpty)
    // ranked by llr desc with (w1, w2) tie-break
    assert(got.map(_._4).toSeq === got.map(_._4).sorted(
      Ordering[Double].reverse))
    val re = LanguageModel.dunningCollocations(df.repartition(5), "text")
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(re.toSeq === got.toSeq)
  }
}
