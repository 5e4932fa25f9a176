package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis, UrlOps}

/** Web-corpus front-door operators: URL canonicalization/dedup/domain
  * filtering, HTML text extraction, soft (down-weighting) dedup, and
  * exact-substring (k-gram coverage) dedup — plus ANN index-model
  * persistence round trips. */
class WebCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private def norm1(u: String): String =
    Seq(u).toDF("u").select(UrlOps.normalizeUrl(col("u"))).head().getString(0)

  // ---- URL normalization --------------------------------------------------

  test("normalizeUrl: case, userinfo, default port, www, fragment") {
    assert(norm1("HTTPS://User:pw@WWW.Sub.Example.COM:443/Path/7#frag") ===
      "https://sub.example.com/Path/7")
    // path/query case is preserved, only scheme://host is lowered
    assert(norm1("HTTP://EXAMPLE.com:80/KeepCase?Q=V") ===
      "http://example.com/KeepCase?Q=V")
    // non-default port survives
    assert(norm1("https://example.com:8443/a") === "https://example.com:8443/a")
    // bare host: default port stripped even with no path; trailing slash trimmed
    assert(norm1("https://example.com:443") === "https://example.com")
    assert(norm1("http://example.com:80/") === "http://example.com")
  }

  test("normalizeUrl: tracking params removed wherever they sit") {
    assert(norm1("https://e.com/p?utm_source=n&id=1") === "https://e.com/p?id=1")
    assert(norm1("https://e.com/p?id=1&utm_source=n") === "https://e.com/p?id=1")
    assert(norm1("https://e.com/p?a=1&fbclid=x&b=2") === "https://e.com/p?a=1&b=2")
    // all-tracking query collapses away entirely
    assert(norm1("https://e.com/p?utm_a=1&utm_b=2&gclid=z") === "https://e.com/p")
    // non-tracking params whose names merely CONTAIN a tracking name stay
    assert(norm1("https://e.com/p?pref=1&xref=2") ===
      "https://e.com/p?pref=1&xref=2")
  }

  test("normalizeUrl: non-URL strings pass through mostly unchanged") {
    assert(norm1("not a url") === "not a url")
    assert(norm1("  padded  ") === "padded")
  }

  test("normalizeUrl is idempotent over generated URL shapes") {
    val rnd = new scala.util.Random(7)
    def pick[A](xs: Seq[A]) = xs(rnd.nextInt(xs.size))
    val urls = (1 to 300).map { i =>
      val scheme = pick(Seq("http", "HTTP", "https", "HTTPS"))
      val user = pick(Seq("", "u:p@", "User@"))
      val www = pick(Seq("", "www.", "WWW."))
      val host = pick(Seq("ex.com", "a.b.Example.ORG", "news.co.uk"))
      val port = pick(Seq("", ":443", ":80", ":8443"))
      val path = pick(Seq("", "/", "/P/x", s"/d/$i/"))
      val q = pick(Seq("", "?id=1", "?utm_source=a", "?id=1&utm_b=2&z=3",
        "?utm_a=1&utm_b=2", "?a=1&ref=x"))
      val frag = pick(Seq("", "#f", "#Sec/2"))
      s"$scheme://$user$www$host$port$path$q$frag"
    } :+ "not a url" :+ "" :+ "ftp://weird.example/Z?utm_x=1"
    val df = urls.toDF("u")
      .select(UrlOps.normalizeUrl(col("u")).as("n1"))
      .select(col("n1"), UrlOps.normalizeUrl(col("n1")).as("n2"))
    val bad = df.filter(!(col("n1") <=> col("n2"))).collect()
    assert(bad.isEmpty,
      bad.take(5).map(r => s"'${r.getString(0)}' -> '${r.getString(1)}'")
        .mkString("; "))
  }

  test("softDedupWeights conserves mass: sum(weight) == distinct keys") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = Dedup.softDedupWeights(docs, "doc_id", Seq("text"))
      .agg(sum("weight")).head().getDouble(0)
    val distinct = docs.select("text").distinct().count()
    assert(math.abs(total - distinct) < 1e-6, s"$total vs $distinct")
  }

  test("compressionRatio stays in a sane band on fixture text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mm = docs.select(TextAnalysis.compressionRatio(col("text")).as("r"))
      .agg(min("r"), max("r")).head()
    assert(mm.getDouble(0) > 0.0 && mm.getDouble(1) <= 1.2,
      s"${mm.getDouble(0)}..${mm.getDouble(1)}")
  }

  test("urlHost and registrableDomain") {
    val got = Seq(
      "https://User@WWW.News.Example.CO.UK:443/x",
      "http://a.b.example.com/y",
      "https://example.com",
      "plain text").toDF("u")
      .select(UrlOps.urlHost(col("u")).as("h"))
      .withColumn("d", UrlOps.registrableDomain(col("h")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got(0) === ("www.news.example.co.uk", "example.co.uk"))
    assert(got(1) === ("a.b.example.com", "example.com"))
    assert(got(2) === ("example.com", "example.com"))
    assert(got(3) === ("", ""))
  }

  test("urlDedup collapses normalization-equivalent URLs to min id") {
    val df = Seq(
      (1L, "https://WWW.e.com/p?utm_source=a"),
      (2L, "https://e.com/p"),
      (3L, "https://e.com/p#other"),
      (4L, "https://e.com/q")).toDF("id", "url")
    val out = UrlOps.urlDedup(df, "id", "url")
      .orderBy("norm_url").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("https://e.com/p", 1L, 3L), ("https://e.com/q", 4L, 1L)))
  }

  test("domainFilter deny drops listed domains; allow keeps only them") {
    val df = Seq(
      (1L, "https://spam.example.com/x"),
      (2L, "https://good.org/y"),
      (3L, "https://sub.good.org/z")).toDF("id", "url")
    val block = Seq("example.com").toDF("domain")
    assert(UrlOps.domainFilter(df, "url", block, "domain", "deny")
      .select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    val allow = Seq("good.org").toDF("domain")
    assert(UrlOps.domainFilter(df, "url", allow, "domain", "allow")
      .select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    assert(df.columns.toSet ===
      UrlOps.domainFilter(df, "url", block, "domain").columns.toSet)
  }

  test("domainCounts census is deterministic") {
    val df = Seq(
      (1L, "https://www.e.com/b"), (2L, "https://e.com/a"),
      (3L, "https://other.net/x")).toDF("id", "url")
    val got = UrlOps.domainCounts(df, "url").orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("e.com", 2L, "https://e.com/a"), ("other.net", 1L, "https://other.net/x")))
  }

  // ---- HTML extraction ----------------------------------------------------

  private def html1(h: String): String =
    Seq(h).toDF("h").select(TextAnalysis.htmlToText(col("h"))).head().getString(0)

  test("htmlToText strips script/style/comments and tags, keeps prose") {
    val h = """<html><head><title>T</title>
      |<script type="text/javascript">var x = "<p>not text</p>";</script>
      |<style>p { color: red; }</style></head>
      |<body><h1>Heading</h1><!-- hidden --><p>Hello <b>world</b>.</p></body></html>"""
      .stripMargin
    assert(html1(h) === "T Heading Hello world .")
  }

  test("htmlToText decodes entities exactly once") {
    assert(html1("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end") ===
      """a & b <tag> "q" 's' end""")
    // &amp;lt; is the LITERAL text "&lt;" — must not double-decode to "<"
    assert(html1("show &amp;lt; here") === "show &lt; here")
  }

  test("htmlToText degrades gracefully on malformed markup") {
    assert(html1("<p>unclosed <b>bold") === "unclosed bold")
    assert(html1("no markup at all") === "no markup at all")
    assert(html1("") === "")
  }

  // ---- soft dedup ---------------------------------------------------------

  test("softDedupWeights: 1/n weights, unique rows weigh 1, mass sums to 1") {
    val df = Seq(
      (1L, "aaa"), (2L, "aaa"), (3L, "aaa"),
      (4L, "bbb"), (5L, "bbb"),
      (6L, "unique")).toDF("id", "text")
    val out = Dedup.softDedupWeights(df, "id", Seq("text"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, 3L, 1.0 / 3), (2L, 3L, 1.0 / 3), (3L, 3L, 1.0 / 3),
      (4L, 2L, 0.5), (5L, 2L, 0.5), (6L, 1L, 1.0)))
    // each duplicate group contributes total weight 1.0 at beta = 1
    val mass = out.map(_._3).sum
    assert(math.abs(mass - 3.0) < 1e-12)
  }

  test("softDedupWeights: beta < 1 interpolates toward keep-everything") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x")).toDF("id", "t")
    val w = Dedup.softDedupWeights(df, "id", Seq("t"), beta = 0.5)
      .select("weight").as[Double].collect()
    assert(w.forall(v => math.abs(v - 0.5) < 1e-12)) // 4^-0.5
  }

  // ---- exact-substring dedup ---------------------------------------------

  private val substrDocs = Seq(
    (0L, "a b c d e f g h i j"),             // canonical source of "a..h"
    (1L, "x x a b c d e f g h z"),           // cross-doc duplicated span
    (2L, "p q r s t u v w p q r s t u v w"), // within-doc repetition
    (3L, "m n"),                              // shorter than k: untouched
    (4L, "a b c d e f g h i j")              // full copy of doc 0
  ).toDF("doc_id", "text")

  test("substringDedup keeps first occurrence, cuts the rest") {
    val out = Dedup.substringDedup(substrDocs, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (0L, "a b c d e f g h i j", 0L),
      (1L, "x x z", 8L),
      (2L, "p q r s t u v w", 8L),
      (3L, "m n", 0L),
      (4L, "", 10L)))
  }

  test("substringDedup: hashed grams agree with exact-string grams") {
    val a = Dedup.substringDedup(substrDocs, "doc_id", "text", k = 8,
      exactGrams = false).orderBy("doc_id").collect().toSeq
    val b = Dedup.substringDedup(substrDocs, "doc_id", "text", k = 8,
      exactGrams = true).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("substringDedup on real fixture text is idempotent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val once = Dedup.substringDedup(docs, "doc_id", "text", k = 8)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = Dedup.substringDedup(once, "doc_id", "text", k = 8)
    // empty-string docs from full coverage re-enter as single empty words;
    // compare only the text outcome
    val t1 = once.orderBy("doc_id").as[(Long, String)].collect().toSeq
    val t2 = twice.select(col("doc_id"), col("clean_text"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(t1 === t2)
  }

  // ---- score calibration --------------------------------------------------

  test("calibrateScores: per-group percent rank, ties share, singleton is 0") {
    val df = Seq(
      ("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 30.0),
      ("b", 5.0)).toDF("src", "score")
    val got = TextAnalysis.calibrateScores(df, "score", "src")
      .orderBy("src", "score").select("calibrated").as[Double].collect()
    assert(got.toSeq === Seq(0.0, 1.0 / 3, 1.0 / 3, 1.0, 0.0))
  }

  test("calibrateScoresApprox tracks exact calibration within bucket width") {
    // tie-free scores so the comparison isolates bucketing error
    val df = (1 to 200).map(i => (if (i % 2 == 0) "a" else "b", i * 1.0 + i * i * 1e-4))
      .toDF("src", "score")
    val exact = TextAnalysis.calibrateScores(df, "score", "src", "e")
    val buckets = 50
    val both = TextAnalysis.calibrateScoresApprox(exact, "score", "src", "a",
        buckets = buckets)
      .select(abs(col("a") - col("e")).as("d")).as[Double].collect()
    // CDF-vs-percent-rank convention differs by <= 1/n; sketch is exact at
    // this size, so total deviation is bounded by bucket width + 1/n
    assert(both.max <= 1.0 / buckets + 1.0 / 99 + 1e-9,
      s"max deviation ${both.max}")
  }

  test("calibratedKeep never drops a whole tie plateau") {
    // two-value plateau: 5 low + 20 high per group — percent_rank would
    // rank the high plateau at 5/24 and drop EVERYTHING at frac 0.5;
    // cume_dist keeps the top plateau and cuts the bottom one
    val df = (1 to 25).map(i => ("s", if (i <= 5) 0.8 else 1.0))
      .toDF("src", "score")
    val kept = TextAnalysis.calibratedKeep(df, "score", "src", 0.5)
    assert(kept.count() === 20)
    // fully-tied group: everything survives (at-least-fraction)
    val tied = (1 to 10).map(_ => ("t", 1.0)).toDF("src", "score")
    assert(TextAnalysis.calibratedKeep(tied, "score", "src", 0.3).count() === 10)
  }

  test("calibratedKeep keeps the same fraction of every group") {
    val df = (1 to 100).flatMap(i => Seq(("big", i * 1.0), ("big", i + 0.5)))
      .zipWithIndex.map { case ((g, v), ix) => (g, v + ix * 1e-9) } ++
      (1 to 40).map(i => ("small", i * 7.0))
    val in = df.toDF("src", "score")
    val kept = TextAnalysis.calibratedKeep(in, "score", "src", 0.25)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // at-least-fraction semantics, tie-free data → exact-ish per group
    assert(kept("big") >= 50 && kept("big") <= 52)
    assert(kept("small") >= 10 && kept("small") <= 11)
  }

  // ---- ANN model persistence ---------------------------------------------

  test("IVF centers round-trip through a DataFrame") {
    val centers = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0))
    val got = Similarity.centersFromDF(Similarity.centersToDF(spark, centers))
    assert(got === centers)
    // a filtered table fails loudly instead of silently serving fewer cells
    val truncated = Similarity.centersToDF(spark, centers)
      .filter(col("cell_id") =!= 1)
    intercept[IllegalArgumentException](Similarity.centersFromDF(truncated))
    // even TRAILING truncation — invisible to id-contiguity checks — is
    // caught by the declared row count
    val trailing = Similarity.centersToDF(spark, centers)
      .filter(col("cell_id") =!= 2)
    intercept[IllegalArgumentException](Similarity.centersFromDF(trailing))
  }

  test("PQ codebooks round-trip through a DataFrame") {
    val books = Seq(
      Seq(Seq(0.0, 1.0), Seq(2.0, 3.0)),
      Seq(Seq(4.0, 5.0), Seq(6.0, 7.0)))
    val got = Similarity.pqFromDF(Similarity.pqToDF(spark, books))
    assert(got === books)
    val broken = Similarity.pqToDF(spark, books).filter(col("code") =!= 1)
    intercept[IllegalArgumentException](Similarity.pqFromDF(broken))
  }

  test("PCA model round-trips through a DataFrame") {
    val m = Similarity.PcaModel(
      components = Seq(Seq(0.6, 0.8), Seq(-0.8, 0.6)),
      mean = Seq(0.5, -0.25),
      explainedVariance = Seq(0.7, 0.3))
    val got = Similarity.pcaFromDF(Similarity.pcaToDF(spark, m))
    assert(got === m)
    val noMean = Similarity.pcaToDF(spark, m).filter(col("kind") =!= "mean")
    intercept[IllegalArgumentException](Similarity.pcaFromDF(noMean))
    val noTail = Similarity.pcaToDF(spark, m)
      .filter(!(col("kind") === "component" && col("idx") === 1))
    intercept[IllegalArgumentException](Similarity.pcaFromDF(noTail))
  }

  test("batch ANN serve equals per-query serving for every query") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val centers = Similarity.ivfFit(emb, "embedding", nlist = 4)
    val corpus = emb.filter(col("vec_id") >= 10)
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", centers)
    val queries = emb.filter(col("vec_id") < 3)
    val batch = Similarity.ivfTopKBatch(assigned, centers, queries,
        "vec_id", "embedding", k = 5, nprobe = 2)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(r =>
        (r.getLong(1), r.getDouble(2))).toSeq).toMap
    queries.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val q = qr.getSeq[Float](1).map(_.toDouble).toList
      val single = Similarity.ivfTopKPreassigned(assigned, centers, q,
          k = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) === single, s"query $qid diverged")
    }
  }

  test("persisted IVF model serves identical top-k to the in-memory fit") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val centers = Similarity.ivfFit(emb, "embedding", nlist = 4)
    val loaded = Similarity.centersFromDF(Similarity.centersToDF(spark, centers))
    assert(loaded === centers)
    val q = emb.select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toList
    def serve(cs: Seq[Seq[Double]]) = Similarity.ivfTopKPreassigned(
      Similarity.ivfAssign(emb, "vec_id", "embedding", cs), cs,
      q, k = 5, nprobe = 2).collect().toSeq
    assert(serve(centers) === serve(loaded))
  }

  test("IVF index append: incrementally assigned batches serve exactly " +
      "like a one-shot assignment of the union") {
    // the incremental-maintenance contract: cell assignment is a pure
    // function of (vector, centers), so appending a new batch assigned
    // with the SAME frozen centers is indistinguishable from rebuilding —
    // no refit, no re-assignment of the base, union the postings and go
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val centers = Similarity.ivfFit(emb, "embedding", nlist = 4)
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val increment = emb.filter(col("vec_id") % 3 === 0)
    val incremental = Similarity
      .ivfAssign(base, "vec_id", "embedding", centers)
      .unionByName(Similarity
        .ivfAssign(increment, "vec_id", "embedding", centers))
    val oneShot = Similarity.ivfAssign(emb, "vec_id", "embedding", centers)
    val q = emb.select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toList
    def serve(assigned: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKPreassigned(assigned, centers, q, k = 8, nprobe = 2)
        .collect().toSeq
    assert(serve(incremental) === serve(oneShot))
    // and the assignments themselves are identical row sets
    assert(incremental.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(incremental).isEmpty)
  }
}
