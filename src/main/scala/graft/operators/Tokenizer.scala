package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding (BPE) tokenizer training and encoding for corpus-scale
  * pipelines (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — the public algorithm every production
  * tokenizer trainer implements).
  *
  * The 100 TB split follows the same shape as the IVF/PQ fits in
  * [[Similarity]]: the CORPUS-scale work — counting word frequencies over
  * every document — is a distributed `explode → groupBy` with map-side
  * combine whose shuffle is vocabulary-sized (Zipf), and the MODEL-scale
  * work — the iterative merge loop — runs on the driver over a
  * `maxWords`-capped word-count table (exactly how reference-grade BPE
  * trainers operate: they fit on a word-count table, not on raw text).
  * Encoding is embarrassingly parallel: zero shuffle, one pass per
  * document, with a per-executor word→tokens memo table that converts the
  * Zipf distribution into a near-perfect cache hit rate.
  *
  * Mirrors the text→typed-column ingest role of the reference's serializers
  * (`flume-plugin/.../DelimitedTextSerializer.java:63-92`) at the subword
  * level, re-expressed as corpus statistics + a learned model instead of a
  * fixed delimiter table.
  */
object Tokenizer {

  /** End-of-word marker appended as a trailing symbol to every word (the
    * original Sennrich formulation). Assumes the marker string does not
    * itself occur as a token in the corpus. */
  val EndOfWord = "</w>"

  /** A learned BPE model: `merges(i)` is the pair merged at rank `i`
    * (lower rank = earlier merge = higher priority at encode time). */
  final case class BpeModel(merges: Vector[(String, String)]) {
    /** pair → rank lookup used by the encoder. */
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

    /** Persistable form: one row per merge, `(rank, left, right, merged)`,
      * ordered by rank. */
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      merges.zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r, l + r) }
        .toDF("rank", "left", "right", "merged")
    }
  }

  object BpeModel {
    /** Rebuild a model from its persisted `toDF` form. The collect is
      * model-sized (numMerges rows) by construction. */
    def fromDF(df: DataFrame): BpeModel = BpeModel(
      df.select(col("rank"), col("left"), col("right"))
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toVector)
  }

  private def initialSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Fit `numMerges` BPE merges from a word-frequency table (driver-side;
    * the table is `maxWords`-capped by the distributed caller).
    *
    * Deterministic: the best pair each round is chosen by
    * (count desc, left asc, right asc), so equal corpora produce identical
    * models on any partitioning or host.
    */
  def bpeTrainFromCounts(wordCounts: Seq[(String, Long)],
      numMerges: Int): BpeModel = {
    val words = wordCounts.map { case (w, _) => initialSymbols(w) }.toArray
    val counts = wordCounts.map(_._2).toArray

    // pair → total count, and pair → set of word indexes containing it —
    // both maintained incrementally so each merge touches only the words
    // that actually contain the merged pair.
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def pairsOf(syms: Vector[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))

    def bumpCounts(idx: Int, syms: Vector[String], sign: Long): Unit =
      pairsOf(syms).foreach { p =>
        val nv = pairCounts.getOrElse(p, 0L) + sign * counts(idx)
        if (nv == 0L) pairCounts.remove(p) else pairCounts.update(p, nv)
      }

    words.indices.foreach { idx =>
      bumpCounts(idx, words(idx), 1L)
      pairsOf(words(idx)).foreach(
        pairWords.getOrElseUpdate(_, mutable.Set.empty) += idx)
    }

    val merges = Vector.newBuilder[(String, String)]
    var rank = 0
    while (rank < numMerges && pairCounts.nonEmpty) {
      val best = pairCounts.iterator.reduce { (a, b) =>
        val cmp = java.lang.Long.compare(b._2, a._2)
        if (cmp != 0) { if (cmp < 0) a else b }
        else {
          val c1 = a._1._1.compareTo(b._1._1)
          val c2 = if (c1 != 0) c1 else a._1._2.compareTo(b._1._2)
          if (c2 <= 0) a else b
        }
      }._1
      merges += best
      val affected = pairWords.getOrElse(best, mutable.Set.empty).toArray
      affected.foreach { idx =>
        val old = words(idx)
        bumpCounts(idx, old, -1L) // retract old adjacencies
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < old.length) {
          if (i < old.length - 1 && (old(i), old(i + 1)) == best) {
            out += old(i) + old(i + 1); i += 2
          } else { out += old(i); i += 1 }
        }
        val now = out.result()
        words(idx) = now
        bumpCounts(idx, now, 1L)
        // membership delta: pairs lost by the rewrite drop this word;
        // pairs gained pick it up
        val oldPairs = pairsOf(old).toSet
        val newPairs = pairsOf(now).toSet
        (oldPairs -- newPairs).foreach(pairWords.get(_).foreach(_ -= idx))
        (newPairs -- oldPairs).foreach(
          pairWords.getOrElseUpdate(_, mutable.Set.empty) += idx)
      }
      pairCounts.remove(best)
      pairWords.remove(best)
      rank += 1
    }
    BpeModel(merges.result())
  }

  /** Distributed BPE training: corpus word counts via one vocabulary-sized
    * shuffle ([[TextAnalysis.tokenFrequencies]]), capped to the
    * `maxWords` most frequent words with a deterministic tie-break
    * (count desc, token asc — plans as TakeOrderedAndProject, so the
    * driver receives exactly `maxWords` rows regardless of corpus size),
    * then the driver-side merge fit. At 100 TB only the cap changes, not
    * the shape: the collect stays `maxWords`-bounded by contract. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 100000): BpeModel = {
    val wc = TextAnalysis.tokenFrequencies(df, textCol)
      .orderBy(col("n").desc, col("token"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    bpeTrainFromCounts(wc, numMerges)
  }

  /** Greedy BPE encode of one word: repeatedly merge the adjacent pair
    * with the lowest (earliest-learned) rank until none applies. */
  def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = initialSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) bestRank = r
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              ranks.get((syms(j), syms(j + 1))).contains(bestRank)) {
            out += syms(j) + syms(j + 1); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  // Executor-side word→tokens memo, keyed by (model identity, word) so two
  // models in one JVM never cross-pollinate. Zipf makes the hit rate on a
  // real corpus ~99%; the size guard bounds executor memory on adversarial
  // vocabularies by dropping the whole table (correctness is unaffected —
  // it is a pure cache).
  private val MaxCachedWords = 1 << 20
  private lazy val wordCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, String), Array[String]]()

  // Guaranteed-unique id per UDF build (hashCode could collide across two
  // distinct models in one JVM and silently cross-serve encodings). The id
  // is minted on the driver when the UDF is built and rides the closure.
  private val modelIdGen = new java.util.concurrent.atomic.AtomicLong(0L)

  private def cachedEncode(modelId: Long, word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    val key = (modelId, word)
    val hit = wordCache.get(key)
    if (hit != null) hit
    else {
      val enc = encodeWord(word, ranks).toArray
      if (wordCache.size >= MaxCachedWords) wordCache.clear()
      wordCache.put(key, enc)
      enc
    }
  }

  /** Distributed encoder: `bpeEncodeUdf(spark, model)(col)` maps a text
    * column to its array-of-subword-tokens column. Zero shuffle — each
    * task encodes its split independently against the broadcast rank
    * table. A UDF rather than an expression because greedy merge
    * resolution is genuinely imperative (data-dependent loop over a
    * mutable symbol list) — no `functions._` composition expresses it;
    * the per-word memo recovers the cost: each DISTINCT word is encoded
    * once per executor, occurrence-level work is a hash lookup. */
  def bpeEncodeUdf(spark: SparkSession, model: BpeModel): UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(model.ranks)
    val modelId = modelIdGen.incrementAndGet()
    udf { text: String =>
      if (text == null) null
      else {
        val ranks = bc.value
        text.split(' ').iterator.filter(_.nonEmpty)
          .flatMap(w => cachedEncode(modelId, w, ranks))
          .toArray
      }
    }
  }

  /** Inverse of encode for single-space corpora: concatenate subwords and
    * turn each end-of-word marker back into a separator. Pure expression,
    * zero shuffle. */
  def bpeDecode(tokens: Column): Column =
    trim(regexp_replace(concat_ws("", tokens), EndOfWord, " "))

  /** Deterministic id vocabulary of a model: id 0 is reserved for
    * unknown/OOV symbols, then base symbols (merge constituents that are
    * not themselves merge outputs) sorted, then merged symbols in
    * merge-rank order. Fully determined by the merge list, so equal
    * models yield identical ids on any host. */
  def vocabulary(model: BpeModel): Vector[(String, Int)] = {
    val merged = model.merges.map { case (l, r) => l + r }
    val base = model.merges
      .flatMap { case (l, r) => Seq(l, r) }
      .filterNot(merged.toSet)
      .distinct.sorted
    (("<unk>" +: base) ++ merged).zipWithIndex
  }

  /** Vocabulary as a persistable DataFrame (token, id). */
  def vocabularyDF(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    vocabulary(model).toDF("token", "id")
  }

  /** Pack encoded documents into fixed-length training sequences — the
    * final "concat and chunk" step of pretraining data prep: documents
    * (as id arrays) are laid end-to-end in a deterministic order within
    * each group, cut every `seqLen` ids, and the trailing partial
    * sequence of each bin padded with `padId` (pass None to keep it
    * ragged).
    *
    * Distribution: documents are first assigned to capacity-bounded BINS
    * by a running token-offset window (the [[TextAnalysis.packByTokenBudget]]
    * contract — one window shuffle per group); each bin then flattens its
    * documents and slices sequences independently — a bin is
    * `seqsPerBin·seqLen` ids by construction, so the per-bin reassembly
    * groupBy is bounded regardless of corpus size, and sequences never
    * cross bins (no global concatenation, no driver). Token order inside
    * a bin is the given document order; no ids are dropped or reordered.
    * Returns (group, bin, seq_idx, ids). */
  def packSequences(df: DataFrame, idsCol: String, seqLen: Int,
      group: Column, order: Column, seqsPerBin: Int = 64,
      padId: Option[Int] = Some(0)): DataFrame = {
    require(seqLen > 0 && seqsPerBin > 0, "positive seqLen / seqsPerBin")
    val binned = TextAnalysis.packByTokenBudget(
      df.withColumn("__n", size(col(idsCol)))
        .withColumn("__grp", group).withColumn("__ord", order),
      "__n", seqLen * seqsPerBin, col("__grp"), col("__ord"))
    val flat = binned.groupBy(col("__grp"), col("bin"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__ord"), col(idsCol)))),
        x => x.getField(idsCol))).as("__flat"))
    val nSeq = ceil(size(col("__flat")).cast("double") / seqLen).cast("int")
    val sliced = flat.select(col("__grp"), col("bin"),
      posexplode(transform(sequence(lit(0), greatest(nSeq, lit(1)) - 1),
        i => slice(col("__flat"), i * seqLen + 1, lit(seqLen)))))
      .withColumnsRenamed(Map("pos" -> "seq_idx", "col" -> "ids"))
      .filter(size(col("ids")) > 0)
    val padded = padId.fold(sliced)(p => sliced.withColumn("ids",
      concat(col("ids"),
        array_repeat(lit(p), lit(seqLen) - size(col("ids"))))))
    padded.select(col("__grp").as("group"), col("bin"),
      col("seq_idx").cast("long").as("seq_idx"), col("ids"))
  }

  /** Distributed encode straight to trainer-ready id arrays: same
    * zero-shuffle cached word encode as [[bpeEncodeUdf]], then a
    * broadcast token→id lookup (OOV symbols — single characters never
    * seen in any merge — map to id 0). */
  def bpeEncodeIdsUdf(spark: SparkSession,
      model: BpeModel): UserDefinedFunction = {
    val bcRanks = spark.sparkContext.broadcast(model.ranks)
    val bcVocab = spark.sparkContext.broadcast(vocabulary(model).toMap)
    val modelId = modelIdGen.incrementAndGet()
    udf { text: String =>
      if (text == null) null
      else {
        val ranks = bcRanks.value
        val ids = bcVocab.value
        text.split(' ').iterator.filter(_.nonEmpty)
          .flatMap(w => cachedEncode(modelId, w, ranks))
          .map(ids.getOrElse(_, 0))
          .toArray
      }
    }
  }

  /** Per-language fertility / compression report for a FITTED BPE
    * model — the sizing table a pretraining team builds before
    * committing a vocabulary (the multilingual-fertility comparison of
    * the public tokenizer literature): tokens-per-word ("fertility")
    * and chars-per-token (compression rate) per language, from exact
    * integer counts.
    *
    * Shape: the encode is the [[bpeEncodeUdf]] zero-shuffle cached
    * path; everything else is ONE language-keyed aggregate (map-side
    * combined) — no joins, no second pass. Word and char counts mirror
    * the encoder's own segmentation exactly (split on single space,
    * empty symbols dropped; chars count the characters the encoder
    * consumed, not the separating whitespace), so the ratios are
    * properties of the MODEL, not of spacing. Each ratio is ONE double
    * division, NULL on an empty denominator. NULL text/lang rows are
    * excluded. Returns (lang, n_docs, n_words, n_chars, n_tokens,
    * tokens_per_word, chars_per_token) — deterministic, pinnable. */
  def fertilityReport(df: DataFrame, langCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val enc = bpeEncodeUdf(df.sparkSession, model)
    val words = filter(split(col(textCol), " "), w => length(w) > 0)
    df.filter(col(langCol).isNotNull && col(textCol).isNotNull)
      .select(col(langCol).as("lang"),
        size(words).cast("long").as("__w"),
        coalesce(aggregate(words, lit(0L),
          (acc, w) => acc + length(w).cast("long")), lit(0L)).as("__c"),
        size(enc(col(textCol))).cast("long").as("__t"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("n_words"),
        sum(col("__c")).as("n_chars"),
        sum(col("__t")).as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_chars"),
        col("n_tokens"),
        when(col("n_words") > 0, col("n_tokens").cast("double") /
          col("n_words").cast("double")).as("tokens_per_word"),
        when(col("n_tokens") > 0, col("n_chars").cast("double") /
          col("n_tokens").cast("double")).as("chars_per_token"))
  }
}
