package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token packing: bins split at capacity, oversized doc gets its own bin") {
    val docs = Seq(
      ("g", 1L, 60L),   // cum 60   -> bin 0
      ("g", 2L, 50L),   // cum 110  -> bin floor(60/100)=0
      ("g", 3L, 30L),   // cum 140  -> bin floor(110/100)=1
      ("g", 4L, 250L),  // cum 390  -> bin floor(140/100)=1 (oversized, own overflow)
      ("g", 5L, 10L)    // cum 400  -> bin floor(390/100)=3
    ).toDF("grp", "doc_id", "n_tokens")
    val got = TextAnalysis.packByTokenBudget(docs, "n_tokens", 100,
        $"grp", $"doc_id")
      .orderBy("doc_id").collect().map(_.getLong(3)).toSeq
    assert(got == Seq(0L, 0L, 1L, 1L, 3L), got.toString)
  }

  test("topTokens: exact counts, total tie-break order, top-k plan") {
    val docs = Seq((1L, "a b b c c c"), (2L, "c a a x")).toDF("doc_id", "text")
    val got = TextAnalysis.topTokens(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // c:4, a:3, b:2, x:1 -> top 3; a before b would only matter on ties
    assert(got == Seq(("c", 4L), ("a", 3L), ("b", 2L)))
    // ties break by token ascending (deterministic across engines)
    val tied = Seq((1L, "z y z y")).toDF("doc_id", "text")
    val t2 = TextAnalysis.topTokens(tied, "text", 1).collect().head.getString(0)
    assert(t2 == "y")
    // per-partition top-k, not a global sort
    val plan = TextAnalysis.topTokens(Tables.documents(spark, sf), "text", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(300))
  }

  test("packing preserves every document exactly once per group") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang",
      TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
    val packed = TextAnalysis.packByTokenBudget(docs, "n_tokens", 2048,
      $"lang", $"doc_id")
    assert(packed.count() == docs.count())
    // each bin except a group's last holds <= capacity + one overflow doc
    val binTotals = packed.groupBy($"lang", $"bin")
      .agg(sum($"n_tokens").as("t"), max($"n_tokens").as("mx"))
    assert(binTotals.filter($"t" - $"mx" >= 2048).isEmpty)
  }

  test("c4Clean: drops bad lines, keeps good ones, counts both") {
    val doc = Seq(
      "this is a perfectly fine sentence.",
      "another good long enough line!",
      "a third acceptable closing line?",
      "too short.",                          // < 5 words
      "lorem ipsum dolor sit amet friend.",  // blocklist phrase
      "please enable JavaScript to continue here.", // blocklist (case-insensitive)
      "var f = function() { return 1; } ok.",       // curly brace
      "no terminal punctuation on this one"         // bad ending
    ).mkString("\n")
    val got = TextAnalysis.c4Clean(Seq((1L, doc)).toDF("doc_id", "text"),
        "doc_id", "text").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("kept_lines") == 3L)
    assert(r.getAs[Long]("total_lines") == 8L)
    assert(r.getAs[String]("text") ==
      "this is a perfectly fine sentence.\nanother good long enough line!\n" +
        "a third acceptable closing line?")
  }

  test("c4Clean: documents left under minLines are dropped entirely") {
    val docs = Seq(
      (1L, "one good surviving line here.\nsecond good surviving line here."),
      (2L, "first fine line of three kept.\nsecond fine line of three kept.\n" +
        "third fine line of three kept.")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4Clean(docs, "doc_id", "text", minLines = 3)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("c4KeepLine: quote ending counts as terminal punctuation") {
    val df = Seq(
      ("he said \"this is properly quoted text\"", true),
      ("ends with comma instead of period,", false)
    ).toDF("line", "expected")
    val got = df.select(TextAnalysis.c4KeepLine($"line").as("keep"),
      $"expected").collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }

  test("topTokensByGroup: exact per-group counts, tie-break, cap") {
    val docs = Seq(
      ("en", "a b b c c c"), ("en", "c a"),
      ("de", "z y z y x")
    ).toDF("lang", "text")
    val got = TextAnalysis.topTokensByGroup(docs, "text", "lang", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // en: c:4, a:2 (b:2 loses the tie to a alphabetically)
    // de: y:2, z:2 (tie -> y first)
    assert(got == Set(("en", "c", 4L, 1L), ("en", "a", 2L, 2L),
      ("de", "y", 2L, 1L), ("de", "z", 2L, 2L)), got.toString)
  }

  test("corpusProfile: per-dim rows sum to the corpus-total row") {
    val docs = Tables.documents(spark, sf)
    val prof = TextAnalysis.corpusProfile(docs, "text", Seq("lang", "source"))
      .collect()
    val all = prof.filter(_.getString(0) == "all")
    assert(all.length == 1)
    assert(all.head.getAs[Long]("n_docs") == docs.count())
    for (dim <- Seq("lang", "source")) {
      val rows = prof.filter(_.getString(0) == dim)
      assert(rows.map(_.getAs[Long]("n_docs")).sum ==
        all.head.getAs[Long]("n_docs"), s"$dim docs")
      assert(rows.map(_.getAs[Long]("total_tokens")).sum ==
        all.head.getAs[Long]("total_tokens"), s"$dim tokens")
    }
  }

  test("c4Clean rejects passthrough columns that collide with its output") {
    val df = Seq((1L, "a fine enough line here.", 7L))
      .toDF("doc_id", "text", "id")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.c4Clean(df, "doc_id", "text")
    }
    assert(e.getMessage.contains("id"))
  }

  test("ngramNovelty: copies score 0, unseen text 1, partial overlap between") {
    val base = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b c d e f"),  // exact copy -> 0
      (11L, "x y z w q"),    // disjoint   -> 1
      (12L, "a b c z z z")   // 1 of 4 trigrams seen ("a b c") -> 0.75
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(eval, base, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(10L) == 0.0)
    assert(got(11L) == 1.0)
    assert(got(12L) == 0.75)
  }

  test("ngramNovelty: hashed and exact modes agree; short docs score null") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 2 === 0)
    val eval = docs.filter($"doc_id" % 2 === 1)
      .unionByName(Seq((999999L, "a b")).toDF("doc_id", "text")) // < n tokens
    val exact = TextAnalysis.ngramNovelty(eval, base, "doc_id", "text",
      n = 3, hashed = false)
    val hashed = TextAnalysis.ngramNovelty(eval, base, "doc_id", "text",
      n = 3, hashed = true)
    assert(exact.exceptAll(hashed).isEmpty && hashed.exceptAll(exact).isEmpty)
    val short = hashed.filter($"id" === 999999L).collect().head
    assert(short.getLong(1) == 0L && short.isNullAt(3))
  }

  test("scriptProfile: dominance, tie goes to the first class, purity, none") {
    val df = Seq(
      (1L, "hello \u043c\u0438\u0440"),                    // latin 5, cyr 3
      (2L, "\u043c\u0438\u0440\u043c\u0438\u0440 hi"),  // cyr 6, latin 2
      (3L, "123 ... !"),                                      // nothing classified
      (4L, "ab \u044f\u0431"))                              // 2-2 tie
      .toDF("id", "t")
    val got = TextAnalysis.scriptProfile(df, "t")
      .select("id", "latin", "cyrillic", "script_letters",
        "dominant_script", "script_purity")
      .orderBy("id").collect()
    assert(got(0).getString(4) === "latin")
    assert(got(0).getLong(1) === 5L && got(0).getLong(2) === 3L)
    assert(got(0).getDouble(5) === 0.625)
    assert(got(1).getString(4) === "cyrillic")
    assert(got(2).getString(4) === "none" && got(2).isNullAt(5))
    assert(got(2).getLong(3) === 0L)
    assert(got(3).getString(4) === "latin",
      "ties break by the fixed class order, latin first")
  }

  test("scriptProfile refuses inputs that already carry its output names " +
      "— appending must never silently replace caller data") {
    val clash = Seq((1L, "hi", 42L)).toDF("id", "t", "latin")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.scriptProfile(clash, "t")
    }
    assert(e.getMessage.contains("latin"))
    val clash2 = Seq((1L, "hi", 0.5)).toDF("id", "t", "script_purity")
    intercept[IllegalArgumentException] {
      TextAnalysis.scriptProfile(clash2, "t")
    }
  }

  test("tfidfTerms: rare discriminative terms outrank ubiquitous ones; " +
      "smoothed idf keeps all-stopword docs scoreable") {
    val docs = Seq(
      (1L, "the the the zebra zebra quantum"),
      (2L, "the the apple apple apple zebra"),
      (3L, "the banana banana"),
      (4L, "the the the") // stopword-only: must still yield keywords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq)
      .toMap
    // doc1: zebra (tf 2, df 2) beats "the" (tf 3, df 4: idf floor 1.0
    // vs ln(5/3)+1) and quantum (tf 1, unique)
    assert(got(1L).head == "zebra", s"${got(1L)}")
    assert(got(1L).contains("quantum") || got(1L).contains("the"))
    // doc3: banana dominates
    assert(got(3L).head == "banana", s"${got(3L)}")
    // doc4 has only "the" — still present with one keyword
    assert(got(4L) == Seq("the"), s"${got(4L)}")
    // determinism across partitioning
    val again = TextAnalysis.tfidfTerms(docs.repartition(5), "doc_id",
        "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSet
    val first = TextAnalysis.tfidfTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSet
    assert(again == first)
  }

  test("textRankKeywords: the adjacency hub outranks its leaves, leaf " +
      "ties break by token, and the result is partitioning-invariant") {
    // word graph from adjacency: a↔b (twice, collapses) and a↔c — a
    // star centered on "a"; b and c are symmetric leaves
    val docs = Seq("a b a c", "b a").toDF("text")
    val got = TextAnalysis.textRankKeywords(docs, "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === Seq("a", "b", "c"))
    assert(got(0)._2 > got(1)._2 && got(1)._2 === got(2)._2)
    val re = TextAnalysis.textRankKeywords(docs.repartition(5), "text",
      topK = 3).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(re.toSeq === got.toSeq)
  }

  test("vocabGrowth: first-seen counts per id bucket with a cumulative " +
      "vocabulary, unigrams and bigrams") {
    val docs = Seq((0L, "a b"), (50L, "b c"), (150L, "d"),
      (250L, "a d e")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", 100L)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 3L, 3L), (1L, 1L, 4L), (2L, 1L, 5L)))
    // bigrams: "a b"@0, "b c"@50 → bucket 0: 2; "a d","d e"@250 → b2: 2
    val bg = TextAnalysis.vocabGrowth(docs, "doc_id", "text", 100L,
        ngram = 2)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bg.toSeq === Seq((0L, 2L, 2L), (2L, 2L, 4L)))
  }

  test("sourceOverlap: hand-computed pairwise vocabulary Jaccard; " +
      "duplicate tokens collapse; disjoint pairs are absent") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "a a b", "s1"), // s1 vocab {a,b,c}
      (3L, "b c d", "s2"),                      // s2 vocab {b,c,d}
      (4L, "x y", "s3"))                        // s3 vocab {x,y}
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceOverlap(docs, "source", "text")
      .orderBy("group_a", "group_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // only (s1, s2) share tokens: |{b,c}| = 2, union 4 → jaccard 0.5
    assert(got.toSeq === Seq(("s1", "s2", 3L, 3L, 2L, 0.5)))
  }

  test("codeSignals: exact symbol counts route code from prose; empty " +
      "text is safe; the structural guard blocks operator-only prose") {
    val docs = Seq(
      (1L, "plain english prose with no symbols at all"),
      (2L, "if (x <= y) { return z[i]; }"),
      (3L, "a = b and c = d but never braces"), // operators, no structure
      (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.codeSignals(docs, "doc_id", "text",
        minRatio = 0.05)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getBoolean(5)))
    // doc2: structural {, }, ; = 3; plus ( ) < = [ ] → 9 symbols total
    assert(got(0) === ((1L, 0L, 0L, false)))
    assert(got(1) === ((2L, 3L, 9L, true)))
    assert(got(2)._2 === 0L && !got(2)._4, "no braces/semicolons => prose")
    assert(got(3) === ((4L, 0L, 0L, false)))
  }

  test("zipfFit: a near-Zipf corpus fits slope ~ -1 with high r2; " +
      "partitioning-invariant to the bit") {
    // token wi appears floor(60/i) times, i = 1..10 — frequencies on
    // (almost) the f = C/rank curve
    val words = (1 to 10).flatMap(i => Seq.fill(60 / i)(s"w$i"))
    val docs = words.grouped(7).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(docs, "text", k = 10).head
    assert(got.getLong(0) === 10L)
    assert(got.getDouble(1) > -1.2 && got.getDouble(1) < -0.8,
      s"slope ${got.getDouble(1)}")
    assert(got.getDouble(3) > 0.95, s"r2 ${got.getDouble(3)}")
    val again = TextAnalysis.zipfFit(docs.repartition(5), "text", k = 10)
      .head
    assert(again.getDouble(1) === got.getDouble(1) &&
      again.getDouble(3) === got.getDouble(3))
  }

  test("dupGramFraction: a shared 8-gram lights up in both documents; " +
      "unique text scores 0; hashed and raw keys agree") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, shared + " one two"),
      (2L, "x " + shared),
      (3L, "p q r s t u v w x y"))
      .toDF("doc_id", "text")
    def run(hashed: Boolean) =
      graft.operators.TextAnalysis.dupGramFraction(docs, "doc_id",
          "text", n = 8, hashed = hashed)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
    val got = run(hashed = false)
    // doc1: 3 grams, 1 shared → 1/3; doc2: 2 grams, 1 shared → 0.5;
    // doc3: 3 grams, none repeated → 0
    assert(got.toSeq === Seq(
      (1L, 3L, 1L, 0.33333), (2L, 2L, 1L, 0.5), (3L, 3L, 0L, 0.0)))
    assert(run(hashed = true).toSeq === got.toSeq,
      "xxhash64 keys must not change any count")
  }

  test("lexicalDiversity and hapaxRate: hand counts — a word loop " +
      "collapses TTR; hapax are group-local singletons") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b a b a"),        // 9 tokens, 2 types
      (2L, "v w x y")).toDF("doc_id", "text") // 4 tokens, 4 types
    val ld = graft.operators.TextAnalysis
      .lexicalDiversity(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(ld(0) === ((1L, 9L, 2L, 2.0 / 9.0, 2.0 / 3.0)))
    assert(ld(1) === ((2L, 4L, 4L, 1.0, 2.0)))
    val hx = graft.operators.TextAnalysis.hapaxRate(
        Seq(("s1", "a a b c"), ("s1", "c d"), ("s2", "a"))
          .toDF("source", "text"),
        "source", "text")
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // s1: tokens a,a,b,c,c,d → types {a,b,c,d}, hapax {b,d} → 0.5;
    // s2's lone 'a' is a hapax IN s2 even though s1 repeats 'a'
    assert(hx(0) === (("s1", 6L, 4L, 2L, 0.5)))
    assert(hx(1) === (("s2", 1L, 1L, 1L, 1.0)))
  }

  test("jsDivergence: identical mixtures score 0; disjoint vocabularies " +
      "score ln 2; an intermediate pair lands strictly between") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "a b c"), ("s2", "a b c"),     // identical
      ("s3", "x y z"),                      // disjoint from s1/s2
      ("s4", "a b z")).toDF("source", "text") // partial overlap
    val got = graft.operators.TextAnalysis
      .jsDivergence(docs, "source", "text")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
      .toMap
    val ln2 = math.log(2.0)
    assert(got(("s1", "s2")) === 0.0)
    // fully disjoint pairs share no terms, so they don't appear in the
    // shared-term join at all — absence IS the ln2 verdict; present
    // pairs with partial overlap land strictly inside (0, ln2)
    assert(!got.contains(("s1", "s3")))
    val mid = got(("s1", "s4"))
    assert(mid > 0.0 && mid < ln2, s"expected 0 < js < ln2, got $mid")
  }

  test("readability: hand-counted words/sentences/vowel-group " +
      "syllables and the Flesch formula; zero-word doc is NULL") {
    val docs = Seq(
      (1L, "the cat sat. it ran fast! did it win?"),
      (2L, "")).toDF("id", "txt")
    val got = TextAnalysis.readability(docs, "id", "txt")
      .orderBy("doc_id").collect()
    val r1 = got(0)
    // words: 9 non-empty tokens; sentences: . ! ? = 3
    assert(r1.getLong(1) === 9L && r1.getLong(2) === 3L)
    // vowel groups: the(1) cat(1) sat.(1) it(1) ran(1) fast!(1)
    // did(1) it(1) win?(1) = 9
    assert(r1.getLong(3) === 9L)
    val want = BigDecimal(206.835 - 1.015 * (9.0 / 3.0) -
      84.6 * (9.0 / 9.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getDouble(4) === want)
    assert(got(1).getLong(1) === 0L && got(1).isNullAt(4))
    // 'y' counts as a vowel: "rhythm my" -> groups y, y = 2
    val y = TextAnalysis.readability(
      Seq((1L, "rhythm my")).toDF("id", "txt"), "id", "txt").head()
    assert(y.getLong(3) === 2L)
  }

  test("keyphrases: RAKE degree/frequency hand case — stopwords split " +
      "phrases, multiplicity weights word stats, ties break on phrase") {
    val df = Seq(
      (1L, "deep learning of the deep learning"),
      (2L, "learning rate and deep learning")).toDF("id", "txt")
    val got = TextAnalysis.keyphrases(df, "txt", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2), r.getDouble(3)))
    // phrases: "deep learning" ×3, "learning rate" ×1
    // deep: deg 6 freq 3 → 2; learning: deg 8 freq 4 → 2; rate: 2/1 → 2
    // both phrases score 4.0 → tie breaks on phrase text
    assert(got.toSeq === Seq(
      ("deep learning", 3L, 2, 4.0), ("learning rate", 1L, 2, 4.0)))
    val re = TextAnalysis.keyphrases(df.repartition(5), "txt", 10)
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(re.toSeq === got.map(t => (t._1, t._4)).toSeq)
  }

  test("mojibakeSignals: counts U+FFFD, C1 controls, and Latin-1 " +
      "digraphs exactly; clean text scores zero; profile rolls up") {
    val corrupt = "caf\u00C3\u00A9 x \uFFFD y " + // 1 digraph + 1 repl
      "\u00E2\u0080\u0099 z \u0085 " // 1 digraph (C1 inside) + bare NEL
    val df = Seq((1L, corrupt), (2L, "a clean plain sentence"))
      .toDF("id", "txt")
    val got = TextAnalysis.mojibakeSignals(df, "id", "txt")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(2) === 1L) // replacement_chars
    // C1 controls: U+0080 and U+0099 inside the curly-quote digraph,
    // plus the bare NEL U+0085
    assert(got(0).getLong(3) === 3L)
    assert(got(0).getLong(4) === 2L) // digraphs
    assert(got(0).getDouble(5) > 0.0)
    assert(got(1).getLong(2) === 0L && got(1).getLong(3) === 0L &&
      got(1).getLong(4) === 0L && got(1).getDouble(5) === 0.0)
    val prof = TextAnalysis.mojibakeProfile(df, "id", "txt",
      per1000Threshold = 1.0).head
    assert(prof.getLong(0) === 2L && prof.getLong(1) === 1L &&
      prof.getLong(2) === 1L && prof.getLong(3) === 3L &&
      prof.getLong(4) === 2L && prof.getDouble(5) === 0.5)
  }

  test("lexiconScreen: per-doc category hits over lowercase alpha " +
      "tokens; zero-hit pairs absent; malformed lexicon refused") {
    val df = Seq(
      (1L, "Fast cars go fast; slow cars do not."),
      (2L, "nothing relevant here")).toDF("id", "txt")
    val got = TextAnalysis.lexiconScreen(df, "id", "txt",
        Map("speed" -> Seq("fast", "slow"), "vehicle" -> Seq("cars")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // doc 1: tokens = 8 alpha runs; speed hits fast,fast,slow = 3 over
    // 2 distinct terms; vehicle hits cars,cars = 2 over 1
    assert(got.toSeq === Seq(
      (1L, "speed", 3L, 2L, 8L, 3.0 / 8.0),
      (1L, "vehicle", 2L, 1L, 8L, 2.0 / 8.0)))
    intercept[IllegalArgumentException] {
      TextAnalysis.lexiconScreen(df, "id", "txt",
        Map("bad" -> Seq("Two Words")))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.lexiconScreen(df, "id", "txt", Map.empty)
    }
  }
}
