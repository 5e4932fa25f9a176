package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Linkage

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  /** The single-global-window formulation the operator must equal. */
  private def bruteforce(df: org.apache.spark.sql.DataFrame,
      idCol: String, key: org.apache.spark.sql.Column,
      w: Int): Set[(Long, Long)] = {
    val r = df.select(col(idCol).cast("long").as("id"),
        row_number().over(Window.orderBy(key, col(idCol))).as("rk"))
    r.as("a").join(r.as("b"),
        col("b.rk") > col("a.rk") && col("b.rk") <= col("a.rk") + w)
      .select(col("a.id"), col("b.id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  test("sortedNeighborhoodPairs equals the global-window formulation " +
      "on real documents, at any bucket count") {
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
    val want = bruteforce(docs, "doc_id", col("n_chars"), 4)
    for (buckets <- Seq(1, 3, 16)) {
      val got = Linkage.sortedNeighborhoodPairs(docs, "doc_id",
          col("n_chars"), neighborhood = 4, buckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"buckets=$buckets")
    }
  }

  test("sortedNeighborhoodPairs: buckets smaller than the neighborhood " +
      "still recover every cross-boundary pair") {
    // 10 rows over 16 buckets -> most buckets hold 0 or 1 rows, so pairs
    // span several buckets; the boundary sliver must chain them
    val tiny = (1 to 10).map(i => (i.toLong, i * 10)).toDF("id", "k")
    val want = bruteforce(tiny, "id", col("k"), 3)
    val got = Linkage.sortedNeighborhoodPairs(tiny, "id", col("k"),
        neighborhood = 3, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want.size === 3 * 10 - (1 + 2 + 3)) // 24 sliding pairs
  }

  test("fuzzyJoin: truncated probes link to their masters, unrelated " +
      "text stays unmatched, rank breaks score ties by id") {
    val ref = Seq(
      (1L, "acme global logistics incorporated"),
      (2L, "zenith marine insurance group"),
      (3L, "acme global logistics"))
      .toDF("id", "name")
    val probes = Seq(
      (10L, "acme global logistics incorporated llc"), // ~1,3
      (20L, "completely different words entirely"))
      .toDF("pid", "name")
    val got = Linkage.fuzzyJoin(probes, ref, "pid", "name", "id", "name",
        threshold = 0.4, topPerLeft = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    // probe 10 vs 1: |∩|=4, |∪|=5 -> 0.8; vs 3: 3/5 -> 0.6
    assert(got.toSeq === Seq((10L, 1L, 0.8, 1L), (10L, 3L, 0.6, 2L)))
  }

  test("fuzzyJoin: the token-df cap prunes candidates, never scores — " +
      "a match reached through a rare token keeps its exact jaccard") {
    // 'common' appears in every ref row; with maxTokenDf = 1 only the
    // rare tokens generate candidates, but the verified score still
    // counts 'common' in the intersection
    val ref = Seq((1L, "common alpha beta"), (2L, "common gamma delta"),
      (3L, "common epsilon zeta")).toDF("id", "t")
    val probes = Seq((9L, "common alpha beta")).toDF("pid", "t")
    val got = Linkage.fuzzyJoin(probes, ref, "pid", "t", "id", "t",
        threshold = 0.5, maxTokenDf = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 1.0)),
      "exact jaccard must include the pruned token")
  }

  test("globalRank equals the single-window row_number at any bucket " +
      "count, including ties broken by id") {
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
    val want = docs.select(col("doc_id"),
        row_number().over(Window.orderBy(col("n_chars"), col("doc_id")))
          .cast("long").as("grank"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (buckets <- Seq(1, 7, 32)) {
      val got = Linkage.globalRank(docs, "doc_id", col("n_chars"), buckets)
        .select("doc_id", "grank")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"buckets=$buckets")
    }
  }

  test("negativeSamples: exactly k others per anchor, never itself, " +
      "deterministic and partitioning-invariant") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val neg = Linkage.negativeSamples(docs, "doc_id", k = 4)
    val rows = neg.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = docs.count()
    assert(rows.length === n * 4, "every anchor draws exactly k")
    assert(rows.forall { case (a, _, b) => a != b },
      "an anchor must never draw itself")
    val ids = docs.collect().map(_.getLong(0)).toSet
    assert(rows.forall { case (_, _, b) => ids.contains(b) })
    val again = Linkage.negativeSamples(docs.repartition(13), "doc_id",
        k = 4).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSet === again.toSet,
      "samples are a function of the corpus, not its layout")
  }

  test("sortedNeighborhoodPairs: duplicate sort keys break ties by id " +
      "and near-duplicate records land in one neighborhood") {
    val df = Seq((5L, 100), (6L, 100), (7L, 100), (1L, 999))
      .toDF("id", "len")
    val got = Linkage.sortedNeighborhoodPairs(df, "id", col("len"),
        neighborhood = 2, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // order: 5,6,7 (len 100, id ties), then 1 (len 999)
    assert(got === Set((5L, 6L), (5L, 7L), (6L, 7L), (6L, 1L), (7L, 1L)))
  }

  test("goldenRecords: min-key winner, plurality vote, deterministic " +
      "tie-break, singleton clusters pass through") {
    val df = Seq(
      (1L, "A", "s2"), (2L, "A", "s1"), (3L, "A", "s1"), // plurality s1
      (10L, "B", "s9"), (11L, "B", "s0"),                // tie → asc s0
      (20L, "C", "s5")                                   // singleton
    ).toDF("doc_id", "key", "source")
    val got = Linkage.goldenRecords(df, Seq("key"), "doc_id",
        Seq(col("doc_id")), "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(1), r.getLong(2), r.getString(4))))
      .toMap
    assert(got === Map(
      "A" -> ((1L, 3L, 2L, "s1")),
      "B" -> ((10L, 2L, 2L, "s0")),
      "C" -> ((20L, 1L, 1L, "s5"))))
  }

  test("goldenRecords: a trust-ordered winner key picks the " +
      "highest-score row, id as the total-order tail") {
    val df = Seq(
      (30L, "D", "x", 1.0), (31L, "D", "x", 5.0), (32L, "D", "x", 5.0))
      .toDF("doc_id", "key", "source", "trust")
    val got = Linkage.goldenRecords(df, Seq("key"), "doc_id",
        Seq(-col("trust"), col("doc_id")), "source")
      .select("canonical_id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(31L)) // max trust, then smallest id
  }

  test("editJoin: substitution/insert/delete/dup pairs kept with exact " +
      "distance; shared-variant distance-2 pairs are verified away") {
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "abcd"), (4L, "abc"),
      (5L, "ab"), (6L, "ba"), (7L, "xyz")).toDF("id", "s")
    val got = Linkage.editJoin(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // (5,6) "ab"/"ba" share deletion variants "a" and "b" but sit at
    // distance 2 — the candidate the exact verify must kill
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 0L),
      (1L, 5L, 1L), (2L, 3L, 1L), (2L, 4L, 1L), (2L, 5L, 1L),
      (3L, 4L, 1L), (4L, 5L, 1L)))
    val re = Linkage.editJoin(df.repartition(5), "id", "s")
      .collect().length
    assert(re === 9)
  }

  test("goldenRecords is partitioning-invariant") {
    val df = (0L until 300L).map(i =>
      (i, s"k${i % 37}", s"s${i % 5}")).toDF("doc_id", "key", "source")
    val a = Linkage.goldenRecords(df, Seq("key"), "doc_id",
      Seq(col("doc_id")), "source").orderBy("key").collect().toSeq
    val b = Linkage.goldenRecords(df.repartition(13), Seq("key"),
      "doc_id", Seq(col("doc_id")), "source").orderBy("key")
      .collect().toSeq
    assert(a === b)
  }

  test("duplicateTransactions: same entity+amount within the window " +
      "pairs up; date-distant, amount-different, and oversized groups " +
      "do not") {
    val rows = Seq(
      (1L, "acct1", 1000L, "2024-01-01"), // pairs with 2 (gap 1)
      (2L, "acct1", 1000L, "2024-01-02"),
      (3L, "acct1", 1000L, "2024-01-09"), // too far from both
      (4L, "acct1", 2000L, "2024-01-01"), // different amount
      (5L, "acct2", 1000L, "2024-01-01")) ++ // different entity
      // an oversized degenerate group (cap 4): must be dropped whole
      (10L to 15L).map(i => (i, "bulk", 1L, "2024-01-01"))
    val df = rows.toDF("id", "acct", "cents", "ds")
      .withColumn("ts", to_timestamp(col("ds")))
    val got = Linkage.duplicateTransactions(df, "id", col("acct"),
        col("cents"), col("ts"), maxDays = 2, maxGroup = 4)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(6)))
    assert(got.toSeq === Seq((1L, 2L, 1L)))
  }

  test("phoneticJoin: sound-alike blocks pair and verify by edit " +
      "distance; maxDist tightens; the audit reports skipped blocks") {
    val df = Seq(("1", "Smith"), ("2", "Smyth"), ("3", "Robert"),
      ("4", "Rupert"), ("5", "Banana")).toDF("id", "name")
    val got = Linkage.phoneticJoin(df, "id", "name", maxDist = 3)
      .orderBy("id_a").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    assert(got.toSeq === Seq(("1", "2", 1L), ("3", "4", 2L)))
    val tight = Linkage.phoneticJoin(df, "id", "name", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(tight.toSeq === Seq(("1", "2")))
    // oversized block dropped by the cap, visible in the audit
    val many = (1 to 20).map(i => (s"x$i", "Smith")) ++
      Seq(("a", "Robert"), ("b", "Rupert"))
    val capped = Linkage.phoneticJoin(many.toDF("id", "name"), "id",
      "name", maxDist = 3, maxBlock = 10).collect()
    assert(capped.forall(r => r.getString(4) != "S530"),
      "the oversized Smith block must be skipped")
    val audit = Linkage.phoneticBlockAudit(many.toDF("id", "name"),
        "id", "name", maxBlock = 10)
      .filter(col("oversized")).collect()
    assert(audit.length == 1 && audit(0).getLong(1) == 20)
  }
}
