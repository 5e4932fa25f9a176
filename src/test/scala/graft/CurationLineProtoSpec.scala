package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

class CurationLineProtoSpec extends SparkTestBase {
  import spark.implicits._

  test("lineDedup removes the planted boilerplate everywhere") {
    val boiler = "please subscribe to our newsletter"
    val docs = Tables.documents(spark, sf)
      .select($"doc_id",
        when($"doc_id" % 3 === 0,
          concat(regexp_replace($"text", " agg ", "\nagg\n"),
            lit("\n" + boiler)))
          .otherwise(regexp_replace($"text", " agg ", "\nagg\n")).as("text"))
    val out = Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 5)
    assert(out.filter($"text".contains(boiler)).head(1).isEmpty,
      "boilerplate line must vanish from every document")
    // the split token "agg" became a line in most documents — the
    // operator must classify it as boilerplate too (whole-line match:
    // consecutive " agg agg " legitimately yields unique lines that
    // merely START with "agg ")
    assert(out.filter(
      array_contains(split($"text", "\n"), "agg")).head(1).isEmpty)
    // non-boilerplate content survives with order intact
    val sample = out.filter($"id" === 1).head()
    val orig = docs.filter($"doc_id" === 1).head().getString(1)
    val expected = orig.split("\n").filter(l => l != boiler && l != "agg")
    assert(sample.getString(1).split("\n").toSeq == expected.toSeq)
    assert(sample.getLong(2) <= sample.getLong(3))
  }

  test("lineDedup keeps rare lines, drops all-boilerplate docs") {
    val docs = Seq(
      (1L, "unique one\ncommon line"),
      (2L, "unique two\ncommon line"),
      (3L, "unique three\ncommon line"),
      (4L, "common line"),
      (5L, "another rare\nalso rare")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 3)
    val m = out.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // "common line" df=4 > 3 → removed; doc 4 had nothing else → dropped
    assert(!m.contains(4L))
    assert(m(1L) == (("unique one", 1L, 2L)))
    assert(m(5L) == (("another rare\nalso rare", 2L, 2L)))
  }

  test("lineDedup at threshold boundary keeps df == maxDocFreq lines") {
    val docs = Seq(
      (1L, "x\nshared"), (2L, "y\nshared")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 2)
    assert(out.count() == 2)
    assert(out.filter($"text".contains("shared")).count() == 2,
      "df == maxDocFreq is NOT boilerplate (strictly-greater threshold)")
  }

  test("repeated line within ONE doc does not count as boilerplate") {
    val docs = Seq(
      (1L, "rep\nrep\nrep\nrep\nrep\nother"),
      (2L, "something\nelse")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 2)
    // df(rep) = 1 distinct doc → kept, all five copies
    val r1 = out.filter($"id" === 1).head()
    assert(r1.getString(1) == "rep\nrep\nrep\nrep\nrep\nother")
  }

  test("lineDedup is idempotent") {
    // removal only lowers doc frequencies, so a second pass is a no-op
    val docs = Seq(
      (1L, "u1\ncommon"), (2L, "u2\ncommon"), (3L, "u3\ncommon"),
      (4L, "u4\nrare")).toDF("doc_id", "text")
    val once = Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 2)
      .select($"id".as("doc_id"), $"text")
    val twice = Dedup.lineDedup(once, "doc_id", "text", maxDocFreq = 2)
      .select($"id".as("doc_id"), $"text")
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("splitCorpus: disjoint, covering, partitioning-stable, ~weighted") {
    val docs = Tables.documents(spark, sf).select($"doc_id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val s1 = Dedup.splitCorpus(docs, "doc_id", splits)
    // every row exactly one split; totals cover the corpus
    assert(s1.count() == docs.count())
    val byName = s1.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet == Set("train", "val", "test"), byName.toString)
    val n = docs.count().toDouble
    assert(byName("train") / n > 0.7 && byName("train") / n < 0.9)
    // identical assignment at a different partitioning
    val s2 = Dedup.splitCorpus(docs.repartition(7), "doc_id", splits)
    assert(s1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      s2.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    // weights that do not sum to 1 normalize
    val s3 = Dedup.splitCorpus(docs, "doc_id", Seq(("a", 2.0), ("b", 2.0)))
    val b3 = s3.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(b3("a") - b3("b")) < n * 0.2, b3.toString)
  }

  test("decontaminateSplits drops the train twin, keeps the holdout doc") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val split = Dedup.splitCorpus(docs, "doc_id",
      Seq(("train", 0.9), ("val", 0.1)))
    // plant: a train-split doc that verbatim-copies a val-split doc
    val valDonor = split.filter($"split" === "val")
      .select($"text").head().getString(0)
    val planted = split.unionByName(
      Seq((990001L, valDonor, "train")).toDF("doc_id", "text", "split"))
    val out = Dedup.decontaminateSplits(planted, "doc_id", "text")
    assert(out.filter($"doc_id" === 990001L).head(1).isEmpty,
      "train-side twin of a holdout doc must be dropped")
    val valN = planted.filter($"split" === "val").count()
    assert(out.filter($"split" === "val").count() == valN,
      "holdout side must be untouched")
    assert(out.count() < planted.count())
  }

  test("prototypicality: centroid math matches hand computation") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), "a"),
      (2L, Seq(0.0f, 1.0f), "a"),
      (3L, Seq(3.0f, 4.0f), "b")).toDF("vec_id", "embedding", "label")
    val out = Similarity.prototypicality(df, "vec_id", "embedding", "label")
      .select($"vec_id", $"proto_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // domain a centroid = (0.5, 0.5): cos to both members = 1/sqrt(2)
    assert(math.abs(out(1L) - 1.0 / math.sqrt(2)) < 1e-6)
    assert(math.abs(out(2L) - 1.0 / math.sqrt(2)) < 1e-6)
    // singleton domain: cos to itself = 1
    assert(math.abs(out(3L) - 1.0) < 1e-6)
  }

  test("prototypicalityFilter trims the planted outlier, keeps the band") {
    val emb = Tables.embeddings(spark, sf)
    // plant the WORST possible outlier inside label 0: the negated domain
    // centroid scores cosine ≈ −1, below any natural member
    val centroid = emb.filter($"label" === 0)
      .select(posexplode($"embedding"))
      .groupBy($"pos").agg(avg($"col").as("m"))
      .orderBy($"pos").collect().map(r => -r.getDouble(1).toFloat).toSeq
    val outlier = Seq((990001L, centroid, 0))
      .toDF("vec_id", "embedding", "label")
    val planted = emb.select($"vec_id", $"embedding", $"label")
      .unionByName(outlier)
    val kept = Similarity.prototypicalityFilter(planted,
      "vec_id", "embedding", "label", loQuantile = 0.02)
    assert(kept.filter($"vec_id" === 990001L).head(1).isEmpty,
      "negated vector must fall below the low-quantile cut of its domain")
    val total = planted.count()
    val keptN = kept.count()
    assert(keptN > total * 0.9, s"band keeps the bulk ($keptN of $total)")
    assert(kept.columns.contains("proto_score"))
  }
}
