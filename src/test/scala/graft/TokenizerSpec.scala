package graft

import org.apache.spark.sql.functions._

import graft.operators.Tokenizer
import graft.operators.Tokenizer.{BpeModel, EndOfWord}

class TokenizerSpec extends SparkTestBase {
  import spark.implicits._

  // Sennrich et al. 2016's worked example corpus.
  private val sennrich: Seq[(String, Long)] =
    Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("bpe training reproduces the classic merge sequence") {
    val m = Tokenizer.bpeTrainFromCounts(sennrich, 5).merges
    // Pair counts: (e,s)=9 from newest+widest, then (es,t)=9, (est,</w>)=9
    // — ties at 9 broken lexicographically by left symbol: "e" < "es" <
    // "est". Then l-o (7), lo-w (7).
    assert(m(0) == ("e", "s"))
    assert(m(1) == ("es", "t"))
    assert(m(2) == ("est", EndOfWord))
    assert(m(3) == ("l", "o"))
    assert(m(4) == ("lo", "w"))
  }

  test("frequent training words collapse to a single token") {
    val model = Tokenizer.bpeTrainFromCounts(sennrich, 50)
    // With enough merges every training word becomes one symbol.
    sennrich.foreach { case (w, _) =>
      assert(Tokenizer.encodeWord(w, model.ranks) == Vector(w + EndOfWord))
    }
  }

  test("oov words fall back to learned subwords, unseen chars to singles") {
    val model = Tokenizer.bpeTrainFromCounts(sennrich, 3) // es, est, est</w>
    val enc = Tokenizer.encodeWord("zest", model.ranks)
    // 'z' was never seen; "est"+</w> was merged at rank 2.
    assert(enc == Vector("z", "est" + EndOfWord))
  }

  test("merge loop is incremental-consistent: retrain equals rebuilt counts") {
    // The incremental pair-count maintenance must match a from-scratch
    // recount at every prefix: train k+j merges in one run and compare
    // the first k against an independent k-merge run.
    val big = Seq("aaab" -> 4L, "abab" -> 3L, "bbba" -> 2L, "aabb" -> 5L)
    val full = Tokenizer.bpeTrainFromCounts(big, 8).merges
    (1 to 8).foreach { k =>
      val part = Tokenizer.bpeTrainFromCounts(big, k).merges
      assert(full.take(part.length) == part, s"divergence at prefix $k")
    }
  }

  test("distributed train on documents is deterministic and usable") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val m1 = Tokenizer.bpeTrain(docs, "text", numMerges = 60, maxWords = 2000)
    val m2 = Tokenizer.bpeTrain(docs.repartition(7), "text",
      numMerges = 60, maxWords = 2000)
    assert(m1.merges == m2.merges, "model must not depend on partitioning")
    assert(m1.merges.length == 60)

    val enc = docs.limit(50)
      .select($"doc_id", Tokenizer.bpeEncodeUdf(spark, m1)($"text").as("toks"))
    val rows = enc.collect()
    assert(rows.forall(_.getSeq[String](1).nonEmpty))
    // Subword count never exceeds character count + word count (each
    // symbol carries ≥1 char or is an end-of-word marker).
    val joined = docs.limit(50)
      .select($"doc_id", $"text",
        Tokenizer.bpeEncodeUdf(spark, m1)($"text").as("toks"))
      .select($"doc_id",
        size(split($"text", " ")).as("words"), size($"toks").as("n"))
      .collect()
    joined.foreach(r => assert(r.getInt(2) >= r.getInt(1),
      "at least one token per word"))
  }

  test("decode inverts encode on single-spaced text") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").limit(30)
    val model = Tokenizer.bpeTrain(docs, "text", numMerges = 40, maxWords = 500)
    val back = docs
      .select($"doc_id", $"text",
        Tokenizer.bpeDecode(
          Tokenizer.bpeEncodeUdf(spark, model)($"text")).as("rt"))
      .withColumn("orig_norm",
        trim(regexp_replace($"text", " +", " ")))
      .filter($"rt" =!= $"orig_norm")
    assert(back.count() == 0, "decode(encode(x)) must equal x")
  }

  test("id vocabulary is deterministic, unk=0, ids cover the encode output") {
    // fully-merged model: every training word is one vocab symbol (a
    // partially-trained model legitimately maps never-merged chars to unk)
    val model = Tokenizer.bpeTrainFromCounts(sennrich, 50)
    val vocab = Tokenizer.vocabulary(model)
    assert(vocab.head == ("<unk>", 0))
    assert(vocab.map(_._2) == vocab.indices.toVector, "dense ids")
    assert(vocab.map(_._1).distinct.size == vocab.size, "no dup tokens")
    val ids = vocab.toMap
    sennrich.foreach { case (w, _) =>
      Tokenizer.encodeWord(w, model.ranks).foreach(s =>
        assert(ids.contains(s), s"symbol $s missing from vocabulary"))
    }
    // distributed id encode: OOV char maps to 0, known words to known ids
    val df = Seq((1L, "newest zzz")).toDF("id", "text")
    val enc = df.select(
      Tokenizer.bpeEncodeIdsUdf(spark, model)($"text").as("ids"))
      .head().getSeq[Int](0)
    assert(enc.nonEmpty)
    assert(enc.contains(0), "unseen char 'z' must hit the unk id")
    assert(enc.exists(_ > 0), "known subwords must hit real ids")
  }

  test("model round-trips through its DataFrame form") {
    val model = Tokenizer.bpeTrainFromCounts(sennrich, 10)
    val back = BpeModel.fromDF(model.toDF(spark))
    assert(back.merges == model.merges)
    assert(Tokenizer.encodeWord("newest", back.ranks) ==
      Tokenizer.encodeWord("newest", model.ranks))
  }

  test("packSequences: fixed lengths, order preserved, nothing lost") {
    val docs = Seq(
      (1L, "g", Seq(1, 2, 3)),
      (2L, "g", Seq(4, 5, 6, 7, 8)),   // straddles a seq boundary
      (3L, "g", Seq(9)),
      (4L, "h", Seq(10, 11))).toDF("doc_id", "grp", "ids")
    val out = Tokenizer.packSequences(docs, "ids", seqLen = 4,
      group = $"grp", order = $"doc_id", seqsPerBin = 16, padId = Some(0))
    val rows = out.orderBy($"group", $"bin", $"seq_idx").collect()
    // every sequence exactly seqLen after padding
    assert(rows.forall(_.getSeq[Int](3).length == 4))
    // group g: ids laid end-to-end in doc order then cut: [1,2,3,4],
    // [5,6,7,8], [9,0,0,0]
    val g = rows.filter(_.getString(0) == "g").map(_.getSeq[Int](3).toList)
    assert(g.toList == List(List(1, 2, 3, 4), List(5, 6, 7, 8),
      List(9, 0, 0, 0)))
    val h = rows.filter(_.getString(0) == "h").map(_.getSeq[Int](3).toList)
    assert(h.toList == List(List(10, 11, 0, 0)))
    // unpadded variant reconstructs the exact token stream
    val ragged = Tokenizer.packSequences(docs, "ids", seqLen = 4,
      group = $"grp", order = $"doc_id", padId = None)
      .filter($"group" === "g").orderBy($"bin", $"seq_idx")
      .collect().flatMap(_.getSeq[Int](3)).toList
    assert(ragged == (1 to 9).toList)
  }

  test("packSequences bins bound the reassembly group size") {
    val docs = Tables.documents(spark, sf).limit(200)
      .select($"doc_id", lit("all").as("grp"),
        transform(split($"text", " "),
          t => (pmod(xxhash64(t), lit(1000L)) + 1).cast("int")).as("ids"))
    val seqLen = 128
    val out = Tokenizer.packSequences(docs, "ids", seqLen,
      group = $"grp", order = $"doc_id", seqsPerBin = 4, padId = Some(0))
    assert(out.count() > 0)
    assert(out.filter(size($"ids") =!= seqLen).count() == 0)
    // ids are 1..1000, pad is 0 → non-pad count must match exactly
    val inTokens = docs.agg(sum(size($"ids"))).head().getLong(0)
    val outTokens = out
      .agg(sum(size(filter($"ids", x => x =!= 0)))).head().getLong(0)
    assert(outTokens == inTokens, "no id lost or duplicated")
  }

  test("two models in one JVM never share encode-cache entries") {
    val m1 = Tokenizer.bpeTrainFromCounts(sennrich, 50)
    val m2 = Tokenizer.bpeTrainFromCounts(
      Seq("new" -> 5L, "est" -> 5L), 50)
    val df = Seq((1L, "newest")).toDF("id", "text")
    // encode under m1 first (populates the word cache), then m2 — a
    // cache keyed only by word would leak m1's single-token encoding
    val e1 = df.select(Tokenizer.bpeEncodeUdf(spark, m1)($"text"))
      .head().getSeq[String](0)
    val e2 = df.select(Tokenizer.bpeEncodeUdf(spark, m2)($"text"))
      .head().getSeq[String](0)
    assert(e1 == Seq("newest" + EndOfWord))
    assert(e2 != e1, "m2 never merged the full word — must re-encode")
  }

  test("fertilityReport: planted two-language corpus — the merged " +
      "language hits fertility 1.0, the unmerged one stays at " +
      "chars-per-word; counts are exact integers") {
    // model learns only "lo", "low", "low</w>" (3 merges over a corpus
    // where low dominates): language 'aa' is pure "low" → 1 token/word;
    // language 'bb' is "zq" words the model never merges → 3 tokens/word
    // (z, q, </w>)
    val model = Tokenizer.bpeTrainFromCounts(Seq("low" -> 100L), 3)
    val df = Seq(
      ("aa", "low low low"), // 3 words, 9 chars, 3 tokens
      ("aa", "low"),         // 1 word, 3 chars, 1 token
      ("bb", "zq zq"),       // 2 words, 4 chars, 6 tokens
      ("bb", null),          // excluded
      (null, "low")          // excluded
    ).toDF("lang", "text")
    val got = Tokenizer.fertilityReport(df, "lang", "text", model)
      .orderBy("lang").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ===
      Seq(("aa", 2L, 4L, 12L, 4L), ("bb", 1L, 2L, 4L, 6L)))
    assert(got(0).getDouble(5) === 1.0)       // aa fertility
    assert(got(0).getDouble(6) === 3.0)       // aa chars/token
    assert(got(1).getDouble(5) === 3.0)       // bb fertility
    assert(got(1).getDouble(6) === 4.0 / 6.0) // bb chars/token
    // partitioning-invariance: exact sums, one division
    val re = Tokenizer.fertilityReport(df.repartition(7), "lang",
      "text", model).orderBy("lang").collect()
    assert(re.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }
}
