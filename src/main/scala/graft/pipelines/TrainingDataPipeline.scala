package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.PartitionedWrite

/** End-to-end training-data curation: the composition a 100 TB pretraining
  * pipeline actually runs, built entirely from this library's operators —
  * ingest → language-ID → quality filter → optional deterministic sample →
  * exact dedup → MinHash near-dup removal (cluster-canonical survivors via
  * connected components) → tokenize/stats → partitioned shard write.
  *
  * Every stage is a DataFrame transform (Catalyst-optimized end to end:
  * the quality filter's expressions push into the same stage as language
  * scoring; only the dedups shuffle). Survivor selection is deterministic
  * (min doc_id) so shards are reproducible run-over-run.
  */
object TrainingDataPipeline {

  final case class Config(
      minQuality: Double = 0.7,
      minTokens: Int = 10,
      nearDupThreshold: Double = 0.8,
      shingleK: Int = 5,
      outputPartitionCol: String = "lang",
      /** Deterministic corpus downsample applied before dedup (None = all);
        * hash-bucket sampling, so the same documents survive at any
        * partitioning — reproducible ablation runs. */
      sampleFraction: Option[Double] = None,
      /** Also apply the Gopher-style rule gate ([[TextAnalysis.gopherKeep]])
        * on top of the composite quality score, with these thresholds —
        * the knobs a curation run sweeps (e.g. raise maxMeanLen for
        * code-heavy corpora). */
      gopherRules: Option[GopherRules] = None,
      /** Replace emails/URLs/phone numbers with placeholder tokens before
        * anything downstream sees the text. */
      redactPii: Boolean = false,
      /** Per-source mixing rates (strata column, rates, default rate):
        * deterministic hash sampling per stratum, applied with the
        * corpus downsample before dedup. */
      mixingRates: Option[(String, Map[String, Double], Double)] = None,
      /** Temperature-scaled mixing (domain column, alpha, target rows):
        * derives the per-domain rates from the `p ∝ n^alpha` smoothing
        * rule instead of hand-set `mixingRates`
        * ([[Dedup.temperatureMix]]); mutually exclusive with it. */
      temperatureMixing: Option[(String, Double, Long)] = None,
      /** With `temperatureMixing`: budget by this per-row weight column
        * instead of row counts — set to "n_tokens" (computed by
        * [[annotate]]) for the token-budgeted mix pretraining recipes
        * specify. */
      temperatureMixWeightCol: Option[String] = None,
      /** Corpus-level repeated-span removal after near-dup dedup: spans of
        * this many tokens that occurred earlier in the corpus are dropped
        * and documents rewritten ([[Dedup.spanDedup]]). */
      spanDedupTokens: Option[Int] = None,
      /** Boilerplate line removal ([[Dedup.lineDedup]]): newline-delimited
        * lines occurring in more than this many distinct documents are
        * removed everywhere; runs with the corpus rewrites (after near-dup
        * dedup, before span dedup) so the matching stages upstream see the
        * original text. Docs reduced to nothing are dropped. */
      lineDedupDocFreq: Option[Long] = None,
      /** C4-recipe rule-based line cleaning ([[TextAnalysis.c4Clean]]):
        * (minWordsPerLine, minLines). Runs FIRST — before redaction and
        * every signal — because it models raw web-text cleanup (terminal
        * punctuation, short fragments, boilerplate markers); documents
        * left under minLines are dropped, and `Report.input` counts the
        * documents that SURVIVE this screen. Unlike `lineDedupDocFreq`
        * (corpus-frequency lines, needs a shuffle) this is a zero-shuffle
        * per-row rule. */
      c4LineFilter: Option[(Int, Int)] = None,
      /** Treat ingest `text` as raw HTML and extract visible prose
        * ([[TextAnalysis.htmlToText]]) before every other stage —
        * zero-shuffle, so it fuses into the same scan stage as C4
        * cleaning and annotation. */
      htmlExtract: Boolean = false,
      /** URL hygiene (column holding each doc's URL): canonicalize and
        * keep one min-id survivor per normalized URL — the cheapest dedup
        * rung, BEFORE any text signal is computed (RefinedWeb runs it
        * first for the same reason: the dup decision reads a ~100 B key,
        * not the document). */
      urlDedupCol: Option[String] = None,
      /** Domain blocklist over the same URL column: drop documents whose
        * registrable domain is listed (broadcast
        * [[graft.operators.UrlOps.domainFilter]]). */
      blockedDomains: Option[Seq[String]] = None,
      /** Per-source calibrated quality gate: AFTER the global score
        * screens, keep the top fraction of each group by calibrated
        * quality ([[TextAnalysis.calibratedKeep]]) — one global knob that
        * prunes every source equally instead of whichever source's score
        * distribution sits lowest. (groupCol, keepFraction). */
      calibratedQuality: Option[(String, Double)] = None,
      /** Compression-ratio band gate ([[TextAnalysis.compressionKeep]]):
        * (minRatio, maxRatio) — drops degenerate repetition below the
        * band and incompressible noise above it; fuses into the same
        * per-row stage as the other quality screens. */
      compressionBand: Option[(Double, Double)] = None,
      /** Exact-substring (k-gram coverage) rewrite
        * ([[Dedup.substringDedup]]) — the strongest corpus-rewrite rung,
        * after span dedup; spans duplicated anywhere keep only their
        * first occurrence. Documents cut to nothing are dropped. */
      substringDedupK: Option[Int] = None)

  /** Trainer-ready sequence emission ([[run]]'s `sequenceOutput`): the
    * surviving documents are BPE-encoded with the supplied pre-trained
    * model and packed into fixed-length id sequences
    * ([[graft.operators.Tokenizer.packSequences]]) written to `dir`
    * partitioned by the pipeline's output-partition column. Train the
    * model beforehand (on a sample, like every fit in this library).
    * The default `padId` 0 is the vocabulary's reserved `<unk>` id —
    * fine when the trainer masks trailing pad, GPT-2-style; pass a
    * dedicated id if pad must be distinguishable from OOV. */
  final case class SequencePack(
      model: graft.operators.Tokenizer.BpeModel,
      dir: String,
      seqLen: Int = 2048,
      seqsPerBin: Int = 64,
      padId: Int = 0)

  /** Rule-gate thresholds for [[TextAnalysis.gopherKeep]]. */
  final case class GopherRules(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopRatio: Double = 0.02, maxRepetition: Double = 0.5)

  /** Stage counts observed on the single write pass. `afterExactDedup`
    * includes decontamination losses when a benchmark is supplied (they
    * land between the quality and exact-dedup observations), and
    * `afterNearDedup` is the FINAL document count — after span dedup when
    * `spanDedupTokens` is set (span dedup can delete fully-duplicate
    * documents). */
  final case class Report(
      input: Long, afterQuality: Long, afterExactDedup: Long,
      afterNearDedup: Long, totalTokens: Long,
      /** Fixed-length training sequences written (0 unless `sequenceOutput`
        * was requested). */
      sequences: Long = 0L)

  /** Annotate: (optional PII redaction,) language, quality, token count —
    * one codegen'd pass; redaction rewrites `text` before any signal
    * reads it. */
  def annotate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val src = if (cfg.redactPii)
      docs.withColumn("text", TextAnalysis.redactPii(col("text")))
    else docs
    src.select(col("doc_id"), col("text"), col("source"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      org.apache.spark.sql.graft.NativeFunctions.tokenCount(col("text"))
        .cast(LongType).as("n_tokens"))
  }

  /** Quality gate: per-row predicate, fully pushed into the scan stage;
    * with `gopherRules` the rule-based screen runs in the same stage. */
  def qualityFilter(annotated: DataFrame, cfg: Config): DataFrame = {
    val base = annotated.filter(col("quality") >= cfg.minQuality &&
      col("n_tokens") >= cfg.minTokens)
    val ruled = cfg.gopherRules.fold(base)(g => base.filter(
      TextAnalysis.gopherKeep(
        col("text"), g.minWords, g.maxWords, g.minMeanLen, g.maxMeanLen,
        g.minStopRatio, g.maxRepetition)))
    cfg.compressionBand.fold(ruled) { case (lo, hi) =>
      ruled.filter(TextAnalysis.compressionKeep(col("text"), lo, hi)) }
  }

  /** Exact dedup: keep the min-id survivor per identical text. Hash-first
    * ([[Dedup.exactLosers]]): the corpus-wide shuffle carries only
    * (xxhash64, partial count) with map-side combine — document text never
    * crosses the wire except for the tiny colliding-hash candidate sliver,
    * and the final anti-join broadcasts the loser ids so the corpus spine
    * itself does not shuffle at all. */
  def dropExactDups(df: DataFrame): DataFrame =
    df.join(Dedup.exactLosers(df, "doc_id", Seq("text")),
      Seq("doc_id"), "left_anti")

  /** Near-dup removal with CLUSTER-canonical survivors: MinHash pairs →
    * connected components ([[Dedup.dupClusters]]) → keep only each
    * cluster's min id. Cluster resolution matters for chains: with pairs
    * (1,2),(2,3) but no (1,3), pairwise loser-dropping would discard 3
    * even though its only near-dup (2) is also dropped; clustering keeps
    * exactly one representative per component. */
  def dropNearDups(df: DataFrame, cfg: Config): DataFrame = {
    val pairs = Dedup.minhashNearDups(df, "doc_id", "text",
      shingleK = cfg.shingleK, threshold = cfg.nearDupThreshold)
    val losers = Dedup.dupClusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    df.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Run the full pipeline; write shards partitioned by language.
    *
    * All five Report numbers come from `observe()` metrics riding plans the
    * pipeline executes anyway — the near-dup stage's eager edge
    * materialization fires the input/quality/exact-dedup observations, and
    * the shard write fires the output ones. No stage is `persist()`ed and
    * no extra counting job runs: at 100 TB the old persist-then-count
    * report cost 4× corpus-scale cache pressure plus five scheduled scans;
    * this costs one accumulator per stage. (The same stage subtree can
    * appear in several plan branches — candidate hash set, loser anti-join
    * — but every instance observes the stage's full row set, so the
    * recorded metric is the stage count regardless of which branch
    * reported it.) */
  /** Optional benchmark-decontamination input for [[run]]: documents whose
    * shingle overlap with any of these reaches the threshold are dropped
    * between the quality gate and dedup.
    *
    * Optional DSIR selection input (`dsirTarget`): a (target corpus with a
    * `text` column, keep fraction) pair — after the quality gate, only the
    * share of the corpus whose hashed-n-gram distribution best matches the
    * target survives ([[Dedup.importanceResample]]). The target sees the
    * same PII redaction as the corpus (a redaction-shifted distribution
    * would skew the likelihood ratios). Its losses land between the
    * `afterQuality` and `afterExactDedup` observations, like
    * decontamination's. */
  /** Optional CCNet-style perplexity gate (`perplexityRef`): an LM is
    * trained on the supplied trusted reference corpus and only the target
    * documents at or below the given perplexity quantile survive
    * ([[graft.operators.LanguageModel.perplexityFilter]]); unscoreable
    * (sub-n-gram) docs are kept. The reference sees the same PII
    * redaction as the corpus. Optional learned quality gate
    * (`qualityModel`): a pre-trained hashing-trick classifier
    * ([[graft.operators.Classifier]]) scores every document zero-shuffle
    * and rows below the threshold are dropped — train it on a labeled
    * sample beforehand. Both stages' losses land between the
    * `afterQuality` and `afterExactDedup` observations, like
    * decontamination's. */
  def run(spark: SparkSession, docs: DataFrame, outDir: String,
      cfg: Config = Config(), benchmark: Option[DataFrame] = None,
      dsirTarget: Option[(DataFrame, Double)] = None,
      perplexityRef: Option[(DataFrame, Double)] = None,
      qualityModel: Option[(graft.operators.Classifier.LinearModel, Double)] = None,
      sequenceOutput: Option[SequencePack] = None): Report = {
    import org.apache.spark.sql.Observation
    val (obsIn, obsQ, obsE, obsD) =
      (Observation(), Observation(), Observation(), Observation())
    // URL hygiene first: blocklist + URL-level dedup read only the URL
    // column — no text signal is paid for a page that loses here
    val urlScreened = cfg.urlDedupCol.map { u =>
      val blocked = cfg.blockedDomains.filter(_.nonEmpty).map { doms =>
        import spark.implicits._
        graft.operators.UrlOps.domainFilter(docs, u,
          doms.toDF("domain"), "domain", "deny")
      }.getOrElse(docs)
      val keep = graft.operators.UrlOps.urlDedup(blocked, "doc_id", u)
        .select(col("keep_doc_id").as("doc_id"))
      blocked.join(keep, Seq("doc_id"), "left_semi")
    }.getOrElse {
      require(cfg.blockedDomains.isEmpty,
        "blockedDomains needs urlDedupCol to name the URL column")
      docs
    }
    val extracted =
      if (cfg.htmlExtract)
        urlScreened.withColumn("text", TextAnalysis.htmlToText(col("text")))
      else urlScreened
    val pre = cfg.c4LineFilter.map { case (minWords, minLines) =>
      TextAnalysis.c4Clean(extracted, "doc_id", "text", minWords, minLines)
        .withColumnRenamed("id", "doc_id")
        .drop("kept_lines", "total_lines")
    }.getOrElse(extracted)
    val annotated = annotate(pre, cfg).observe(obsIn, count(lit(1)).as("n"))
    val sampled = cfg.sampleFraction
      .map(f => Dedup.hashSample(annotated, "doc_id", f))
      .getOrElse(annotated)
    require(cfg.mixingRates.isEmpty || cfg.temperatureMixing.isEmpty,
      "set mixingRates (hand-set) or temperatureMixing (derived), not both")
    val mixed = cfg.mixingRates
      .map { case (strata, rates, dflt) =>
        Dedup.stratifiedSample(sampled, "doc_id", strata, rates, dflt) }
      .orElse(cfg.temperatureMixing.map { case (domain, alpha, target) =>
        Dedup.temperatureMix(sampled, "doc_id", domain, alpha, target,
          cfg.temperatureMixWeightCol) })
      .getOrElse(sampled)
    val qualityGated = qualityFilter(mixed, cfg)
    // the calibrated gate is part of the quality stage: afterQuality
    // reports what survives BOTH the global screens and the per-source cut
    val quality = cfg.calibratedQuality
      .map { case (group, frac) =>
        TextAnalysis.calibratedKeep(qualityGated, "quality", group, frac) }
      .getOrElse(qualityGated)
      .observe(obsQ, count(lit(1)).as("n"))
    val selected = dsirTarget
      .map { case (t0, frac) =>
        val tgt = if (cfg.redactPii)
          t0.withColumn("text", TextAnalysis.redactPii(col("text")))
        else t0
        Dedup.importanceResample(quality, "doc_id", "text",
          tgt.select("text"), frac).drop("score")
      }
      .getOrElse(quality)
    // the LM reference must see the same redaction as the corpus — a
    // model trained on raw emails/URLs would score redacted text as
    // out-of-domain
    val fluent = perplexityRef
      .map { case (r0, quantile) =>
        val ref = if (cfg.redactPii)
          r0.withColumn("text", TextAnalysis.redactPii(col("text")))
        else r0
        graft.operators.LanguageModel.perplexityFilter(
          selected, ref, "doc_id", "text", keepQuantile = quantile)
          .drop("perplexity")
      }
      .getOrElse(selected)
    val gated = qualityModel
      .map { case (model, threshold) =>
        graft.operators.Classifier.classify(fluent, "text", model, threshold)
          .filter(col("keep")).drop("score", "keep")
      }
      .getOrElse(fluent)
    // the benchmark must see the same redaction as the corpus, or a
    // PII-bearing benchmark doc would no longer exact-hash-match its
    // verbatim corpus twin
    val clean = benchmark
      .map { b0 =>
        val b = if (cfg.redactPii)
          b0.withColumn("text", TextAnalysis.redactPii(col("text")))
        else b0
        Dedup.decontaminate(gated, b, "doc_id", "text", cfg.shingleK)
      }
      .getOrElse(gated)
    val exact = dropExactDups(clean)
      .observe(obsE, count(lit(1)).as("n"))
    val nearDeduped = dropNearDups(exact, cfg)
    // corpus rewrites: boilerplate lines first (line-granular), then
    // repeated spans; token totals recomputed after each rewrite
    val lineDeduped = cfg.lineDedupDocFreq
      .map { f =>
        Dedup.lineDedup(nearDeduped, "doc_id", "text", f,
            carryCols = Seq("source", "lang", "quality"))
          .withColumnRenamed("id", "doc_id")
          .withColumn("n_tokens",
            org.apache.spark.sql.graft.NativeFunctions.tokenCount(col("text"))
              .cast(LongType))
          .drop("kept_lines", "total_lines")
      }
      .getOrElse(nearDeduped)
    val spanDeduped = cfg.spanDedupTokens
      .map { k =>
        Dedup.spanDedup(lineDeduped, "doc_id", "text", k,
            carryCols = Seq("source", "lang", "quality"))
          .withColumnRenamed("id", "doc_id")
          .withColumn("n_tokens",
            org.apache.spark.sql.graft.NativeFunctions.tokenCount(col("text"))
              .cast(LongType))
          .drop("kept_spans")
      }
      .getOrElse(lineDeduped)
    // strongest rewrite rung last: spans duplicated ANYWHERE keep only
    // their first occurrence; docs cut to nothing drop out
    val deduped = cfg.substringDedupK
      .map { k =>
        Dedup.substringDedup(spanDeduped, "doc_id", "text", k,
            carryCols = Seq("source", "lang", "quality"))
          .filter(col("clean_text") =!= "")
          .withColumnRenamed("clean_text", "text")
          .withColumn("n_tokens",
            org.apache.spark.sql.graft.NativeFunctions.tokenCount(col("text"))
              .cast(LongType))
          .drop("n_removed")
      }
      .getOrElse(spanDeduped)
      .observe(obsD,
        count(lit(1)).as("n"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("tok"))

    PartitionedWrite.writePartitioned(
      deduped, outDir, Seq(cfg.outputPartitionCol))

    // Sequence emission reads BACK the just-written shards — referencing
    // the live `deduped` plan again would re-run the entire curation
    // pipeline (dedup shuffles included) for the encode pass.
    val nSeq = sequenceOutput.fold(0L) { sp =>
      val survivors = spark.read.parquet(outDir)
      val enc = graft.operators.Tokenizer.bpeEncodeIdsUdf(spark, sp.model)
      val encoded = survivors.select(col("doc_id"),
        col(cfg.outputPartitionCol), enc(col("text")).as("ids"))
      val packed = graft.operators.Tokenizer.packSequences(
        encoded, "ids", sp.seqLen,
        group = col(cfg.outputPartitionCol), order = col("doc_id"),
        seqsPerBin = sp.seqsPerBin, padId = Some(sp.padId))
      val obsS = Observation()
      PartitionedWrite.writePartitioned(
        packed.withColumnRenamed("group", cfg.outputPartitionCol)
          .observe(obsS, count(lit(1)).as("n")),
        sp.dir, Seq(cfg.outputPartitionCol))
      obsS.get("n").asInstanceOf[Long]
    }

    Report(
      input = obsIn.get("n").asInstanceOf[Long],
      afterQuality = obsQ.get("n").asInstanceOf[Long],
      afterExactDedup = obsE.get("n").asInstanceOf[Long],
      afterNearDedup = obsD.get("n").asInstanceOf[Long],
      totalTokens = obsD.get("tok").asInstanceOf[Long],
      sequences = nSeq)
  }
}
