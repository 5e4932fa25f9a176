package graft.sources

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Object-store-atomic commit mode for the batch write path — the
  * manifest-pointer shape the SCALE.md commit matrix prescribes where
  * directory rename degrades to copy (S3-class stores): data files land
  * ONCE at an immutable generation path and are never renamed; the
  * COMMIT is one small-object PUT of a pointer file holding the full
  * partition→generation map; readers resolve ONLY through the latest
  * pointer, never by listing data paths. The same protocol family as
  * the streaming LSM segment log (`MicroBatch.foldSegments`) and the
  * `Checkpoints` generation marks, applied to table writes — and the
  * plain-parquet expression of what table formats' commit logs do.
  *
  * Layout under the table root:
  *  - `_gen/g=<n>/<col=value dirs>/part-*.parquet` — immutable data
  *    generations (Spark writes into a FRESH `g=<n>` dir, so its own
  *    task-commit renames never touch published data);
  *  - `_pointer/p<n>.txt` — the commit points: header line, then one
  *    `partitionRelPath TAB gen TAB gen...` line per live partition
  *    (tabs cannot appear in partition dirs — Spark's path escaping
  *    percent-encodes control characters). Highest `n` wins.
  *
  * Semantics vs [[PartitionedWrite.writePartitioned]]: identical
  * dynamic-partition behavior (overwrite replaces a partition's
  * generation list, append adds to it; `truncateSpec` drops all /
  * a subtree of existing partitions first) — but the swap-window
  * non-atomicity across partitions is GONE: one PUT publishes every
  * touched partition simultaneously, and a crash before the PUT leaves
  * only an unreferenced generation ([[vacuum]] reclaims it). Reference
  * semantics anchor: the staged-session atomic commit of
  * `OdpsBatchWrite.scala:42-95`, strengthened from per-partition to
  * whole-write atomicity.
  *
  * Concurrency contract: optimistic, CAS-style. A writer (1) CLAIMS an
  * exclusive generation id with one create-no-overwrite of
  * `_gen/g=<n>/_claim` — two racers can never write into the same
  * generation dir; (2) lands its data there; (3) commits by
  * create-no-overwrite of the next pointer file. A lost pointer race
  * re-resolves the latest pointer and, when the concurrent commit
  * touched NONE of this writer's partitions, REBASES its
  * partition→generation updates onto it and retries (bounded);
  * overlapping writes fail loudly — last-write-wins clobbering is
  * never silent. Readers are lock-free and always see a complete
  * pointer. [[vacuum]] keeps the single-maintenance-owner rule as
  * `Maintenance` (an unreferenced generation may be a live writer's
  * in-flight claim — `minUnreferencedAgeMs` is the grace knob).
  */
object ManifestCommit {

  private val PointerRe = "p(\\d+)\\.txt".r
  private val Header = "graft-pointer v1"

  private def genDir(path: String, gen: Long) = s"$path/_gen/g=$gen"

  /** Test seam: invoked at commit-protocol step boundaries
    * ("generation-written" after data lands, before the pointer CAS)
    * so crash-injection and concurrent-writer tests can interleave.
    * Production no-op. */
  private[graft] var onCommitStep: String => Unit = _ => ()

  /** True when `path` carries at least one committed manifest pointer —
    * the routing predicate [[Maintenance]] uses to send rewrites
    * through the pointer commit instead of rename swaps. */
  def isManifestTable(path: String): Boolean = pointerIds(path).nonEmpty

  private final class PointerClaimLost(val id: Long, cause: Throwable)
    extends Exception(s"pointer p$id.txt already committed", cause)

  /** First candidate id for a fresh generation claim: one `_gen`
    * listing, max on-disk id + 1 — crash debris and live concurrent
    * claims are never reused, only skipped past. */
  private def nextGenStart(path: String): Long = {
    val genRoot = new HPath(s"$path/_gen")
    val onDisk = if (!Fs.exists(genRoot)) Seq.empty[Long]
      else Fs.listDirs(genRoot).map(_.getName).filter(_.startsWith("g="))
        .map(_.stripPrefix("g=").toLong)
    (onDisk :+ -1L).max + 1
  }

  /** Atomically claim an exclusive generation id: the FIRST id ≥ `from`
    * whose dir does not exist and whose `_claim` file this writer
    * creates (create-no-overwrite = the atomic arbiter; maps onto a
    * conditional PUT on object stores). The claimed dir is OURS — no
    * concurrent writer can land data in it, so the
    * append-into-stale-debris double-row hazard of id reuse cannot
    * occur. Crash after a claim leaves an unreferenced generation;
    * [[vacuum]] reclaims it. */
  private[graft] def claimGeneration(path: String, from: Long): Long = {
    var g = math.max(from, 0L)
    while (true) {
      val dir = new HPath(genDir(path, g))
      if (!Fs.exists(dir)) {
        Fs.mkdirs(dir)
        val claim = new HPath(dir, "_claim")
        try {
          Fs.of(claim).create(claim, false).close()
          return g
        } catch { case _: java.io.IOException => /* lost the race */ }
      }
      g += 1
    }
    -1L // unreachable
  }

  /** The CAS pointer commit: resolve the latest pointer, verify no
    * concurrent commit since `base` touched a partition this write
    * `touches`, apply `update` to the latest map, and claim the next
    * pointer id with one create-no-overwrite. A lost claim (another
    * writer committed first) re-resolves and retries up to
    * `maxRetries` times — non-overlapping writers each get a clean
    * re-based commit; overlapping ones fail loudly instead of
    * clobbering. Returns the committed pointer id. */
  private def casCommit(path: String, base: Map[String, Seq[Long]],
      touches: String => Boolean,
      update: Map[String, Seq[Long]] => Map[String, Seq[Long]],
      maxRetries: Int): Long = {
    var attempt = 0
    while (true) {
      val latest = latestPointer(path)
      val latestMap = latest.map(_._2).getOrElse(Map.empty[String, Seq[Long]])
      if (latestMap != base) {
        val changed = (latestMap.keySet ++ base.keySet)
          .filter(rel => latestMap.get(rel) != base.get(rel))
        val overlap = changed.filter(touches)
        if (overlap.nonEmpty) throw new IllegalStateException(
          s"concurrent overlapping write under $path: partition(s) " +
            s"${overlap.toSeq.sorted.take(5).mkString(", ")} changed " +
            "since this write planned against pointer state — refusing " +
            "to clobber; re-run against the current table state")
      }
      val id = latest.map(_._1 + 1L).getOrElse(0L)
      try {
        writePointer(path, id, update(latestMap))
        return id
      } catch {
        case lost: PointerClaimLost =>
          attempt += 1
          if (attempt > maxRetries) throw new IllegalStateException(
            s"pointer commit under $path lost $attempt CAS races " +
              s"(maxRetries=$maxRetries) — contention too high for " +
              "optimistic commit; coordinate writers externally", lost)
      }
    }
    -1L // unreachable
  }

  /** All committed pointer ids under `path`, ascending (vacuumed ones
    * are gone — retention bounds how far back time travel reaches). */
  def pointerIds(path: String): Seq[Long] = {
    val pDir = new HPath(s"$path/_pointer")
    if (!Fs.exists(pDir)) return Seq.empty
    Fs.of(pDir).listStatus(pDir).toSeq.map(_.getPath.getName)
      .collect { case PointerRe(id) => id.toLong }.sorted
  }

  private def parsePointer(path: String, id: Long)
      : Map[String, Seq[Long]] = {
    val lines = Fs.readString(new HPath(s"$path/_pointer", s"p$id.txt"))
      .split('\n').toSeq.filter(_.nonEmpty)
    require(lines.headOption.contains(Header),
      s"malformed pointer $path/_pointer/p$id.txt")
    lines.tail.map { ln =>
      val parts = ln.split('\t').toSeq
      parts.head -> parts.tail.map(_.toLong)
    }.toMap
  }

  /** The committed (partitionRel → generation list) map of pointer
    * `id`; None if that pointer never existed or was vacuumed. */
  def pointerAt(path: String, id: Long): Option[Map[String, Seq[Long]]] =
    if (pointerIds(path).contains(id)) Some(parsePointer(path, id))
    else None

  /** `TIMESTAMP AS OF`: the newest retained pointer whose pointer-file
    * modification time is at or before `millis` — pointer files are
    * written once and never touched, so mtime IS the commit time. None
    * when every retained pointer postdates `millis` (the earlier
    * pointers may also have been vacuumed; either way the snapshot the
    * caller asked for is not retained). */
  def pointerAsOfTime(path: String, millis: Long): Option[Long] = {
    val pDir = new HPath(s"$path/_pointer")
    if (!Fs.exists(pDir)) return None
    Fs.of(pDir).listStatus(pDir).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case PointerRe(id) if st.getModificationTime <= millis =>
            Some(id.toLong)
          case _ => None
        }
      }.maxOption
  }

  /** Latest committed (gen, partitionRel → generation list) under
    * `path`; None before the first commit. */
  def latestPointer(path: String): Option[(Long, Map[String, Seq[Long]])] = {
    val ids = pointerIds(path)
    if (ids.isEmpty) None
    else Some(ids.max -> parsePointer(path, ids.max))
  }

  private def writePointer(path: String, id: Long,
      map: Map[String, Seq[Long]]): Unit = {
    Fs.mkdirs(new HPath(s"$path/_pointer"))
    val body = (Header +: map.toSeq.sortBy(_._1).map { case (rel, gens) =>
      (rel +: gens.map(_.toString)).mkString("\t")
    }).mkString("\n")
    // no-overwrite CREATE = the atomic claim on pointer id `id` (the
    // Checkpoints generation-mark discipline; maps onto a conditional
    // PUT on object stores): two writers racing the same table NEVER
    // silently clobber — the loser gets [[PointerClaimLost]], which
    // [[casCommit]] turns into a re-based retry or a loud refusal
    val p = new HPath(s"$path/_pointer/p$id.txt")
    val out =
      try Fs.of(p).create(p, false)
      catch {
        case e: java.io.IOException => throw new PointerClaimLost(id, e)
      }
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Relative partition leaf paths of an (unpublished) generation dir —
    * its own listing, which is not a reader protocol. */
  private def stagedRels(dest: String, depth: Int): Seq[String] = {
    def leaves(p: HPath, d: Int): Seq[HPath] =
      if (d == depth) Seq(p)
      else Fs.listDirs(p).filter(_.getName.contains("="))
        .flatMap(leaves(_, d + 1))
    val destQ = Fs.of(new HPath(dest)).makeQualified(new HPath(dest))
    leaves(destQ, 0)
      .map(_.toString.stripPrefix(destQ.toString).stripPrefix("/"))
  }

  /** [[PartitionedWrite.writePartitioned]] with the manifest-pointer
    * commit: claim an exclusive immutable generation, land the
    * (clustered) data there, then flip the pointer with one small PUT
    * ([[casCommit]] — a non-overlapping concurrent commit is rebased
    * over, an overlapping one refuses). Returns the touched partition
    * rel-paths, like the rename-based writer. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil,
      overwrite: Boolean = true,
      limit: Int = PartitionedWrite.DefaultDynamicPartitionLimit,
      truncateSpec: Option[Seq[(String, String)]] = None,
      preClustered: Boolean = false,
      maxCommitRetries: Int = 5): Seq[String] = {
    require(partitionCols.nonEmpty,
      "manifest commit needs at least one partition column")
    val base = latestPointer(path).map(_._2).getOrElse(Map.empty[String, Seq[Long]])
    val gen = claimGeneration(path, nextGenStart(path))
    val dest = genDir(path, gen)
    (if (preClustered) df
     else PartitionedWrite.clusterForWrite(df, partitionCols, sortCols))
      .write.mode("append")
      .partitionBy(partitionCols: _*)
      .parquet(dest)
    val staged = stagedRels(dest, partitionCols.length)
    require(staged.size <= limit,
      s"dynamic partition count ${staged.size} exceeds limit $limit " +
        s"(cols=${partitionCols.mkString(",")})")
    onCommitStep("generation-written")
    val truncatePrefix: Option[String] = truncateSpec.map {
      case Nil => ""
      case spec => spec.map { case (c, v) =>
        PartitionedWrite.partSegment(c, v) }.mkString("/")
    }
    def inTruncateScope(rel: String): Boolean = truncatePrefix.exists(p =>
      p.isEmpty || rel == p || rel.startsWith(p + "/"))
    def applyTo(m0: Map[String, Seq[Long]]): Map[String, Seq[Long]] = {
      val m1 = if (truncatePrefix.isEmpty) m0
        else m0.filterNot { case (rel, _) => inTruncateScope(rel) }
      staged.foldLeft(m1) { (m, rel) =>
        if (overwrite) m.updated(rel, Seq(gen))
        else m.updated(rel, m.getOrElse(rel, Seq.empty) :+ gen)
      }
    }
    val stagedSet = staged.toSet
    casCommit(path, base,
      rel => stagedSet.contains(rel) || inTruncateScope(rel),
      applyTo, maxCommitRetries)
    staged
  }

  /** The current table state: every live (partition, generation) pair
    * of the latest pointer, read with per-generation basePaths so the
    * partition columns materialize exactly as a directory reader would
    * see them. One read per referenced generation — generations stay
    * few because [[compact]] folds them. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (_, map) = latestPointer(path).getOrElse(
      throw new IllegalStateException(
        s"no committed manifest-pointer state under $path"))
    readMap(spark, path, map)
  }

  private def readMap(spark: SparkSession, path: String,
      map: Map[String, Seq[Long]]): DataFrame = {
    val byGen = map.toSeq
      .flatMap { case (rel, gens) => gens.map(g => g -> rel) }
      .groupBy(_._1)
    require(byGen.nonEmpty, s"pointer under $path lists no partitions")
    byGen.toSeq.sortBy(_._1).map { case (g, rels) =>
      spark.read.option("basePath", genDir(path, g))
        .parquet(rels.map { case (_, rel) => s"${genDir(path, g)}/$rel" }
          .distinct: _*)
    }.reduce(_ unionByName _)
  }

  /** TIME TRAVEL: the table exactly as pointer `pointerId` committed
    * it — immutable generations make every retained pointer a free,
    * consistent snapshot (the plain-parquet form of table-format
    * `VERSION AS OF`). Fails loudly when the pointer was vacuumed or
    * any generation it cites is gone ([[vacuum]]'s `keepPointers` is
    * the time-travel retention knob). */
  def readAt(spark: SparkSession, path: String, pointerId: Long)
      : DataFrame = {
    val map = pointerAt(path, pointerId).getOrElse(
      throw new IllegalStateException(
        s"pointer p$pointerId.txt does not exist under $path/_pointer " +
        "— never committed, or vacuumed past the retention window"))
    val missing = map.values.flatten.toSeq.distinct.sorted
      .filterNot(g => Fs.exists(new HPath(genDir(path, g))))
    require(missing.isEmpty,
      s"pointer p$pointerId cites vacuumed generation(s) " +
      s"${missing.map("g=" + _).mkString(", ")} under $path — raise " +
      "vacuum keepPointers to retain deeper time travel")
    readMap(spark, path, map)
  }

  /** The commit history: one row per retained pointer —
    * (pointer_id, partitions, generations, is_latest), ascending.
    * Pointer-file metadata only; no data is read. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val ids = pointerIds(path)
    val latest = if (ids.isEmpty) -1L else ids.max
    ids.map { id =>
      val map = parsePointer(path, id)
      (id, map.size.toLong,
        map.values.flatten.toSeq.distinct.size.toLong, id == latest)
    }.toDF("pointer_id", "partitions", "generations", "is_latest")
  }

  /** ROLLBACK: re-commit the partition map of retained pointer
    * `toPointerId` as the NEW latest pointer — one small PUT, zero
    * data movement (the cited generations are immutable and still on
    * disk; verified before the claim, so a rollback past the vacuum
    * horizon fails instead of publishing dangling references).
    * Returns the new pointer id. */
  def rollback(path: String, toPointerId: Long): Long = {
    val map = pointerAt(path, toPointerId).getOrElse(
      throw new IllegalStateException(
        s"cannot roll back to pointer p$toPointerId under $path — " +
        "never committed, or vacuumed past the retention window"))
    val missing = map.values.flatten.toSeq.distinct.sorted
      .filterNot(g => Fs.exists(new HPath(genDir(path, g))))
    require(missing.isEmpty,
      s"rollback target p$toPointerId cites vacuumed generation(s) " +
      s"${missing.map("g=" + _).mkString(", ")} under $path")
    val next = latestPointer(path).get._1 + 1L
    // deliberately NOT CAS-retried: a rollback that raced another commit
    // would silently erase it — the operator must re-decide against the
    // new latest state
    try writePointer(path, next, map)
    catch {
      case lost: PointerClaimLost => throw new IllegalStateException(
        s"rollback lost a commit race under $path (pointer p$next " +
          "appeared) — re-examine the new latest state before rolling " +
          "back", lost)
    }
    next
  }

  /** Manifest fsck — the consistency audit a maintenance owner runs
    * before trusting vacuum/rollback on a table: one row per finding,
    * (check, subject, ok, detail), deterministic relative names only.
    * Checks: every retained pointer parses; every generation a
    * retained pointer cites exists on disk (`ok = false` = dangling —
    * a reader WILL fail); every on-disk generation is cited by some
    * retained pointer (unreferenced = healthy crash debris; vacuum
    * reclaims it). */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val ids = pointerIds(path)
    val pointers = ids.map { id =>
      val parsed = scala.util.Try(parsePointer(path, id))
      (id, parsed)
    }
    val pointerRows = pointers.map { case (id, parsed) =>
      ("pointer", s"p$id", parsed.isSuccess,
        parsed.fold(e => e.getMessage.take(80),
          m => s"${m.size} partitions"))
    }
    val cited = pointers.flatMap(_._2.toOption).flatMap(_.values.flatten)
      .distinct.sorted
    val citedRows = cited.map { g =>
      val ok = Fs.exists(new HPath(genDir(path, g)))
      ("generation", s"g=$g", ok,
        if (ok) "cited, present" else "DANGLING: cited but missing")
    }
    val genRoot = new HPath(s"$path/_gen")
    val onDisk = if (!Fs.exists(genRoot)) Seq.empty[Long]
      else Fs.listDirs(genRoot).map(_.getName)
        .filter(_.startsWith("g=")).map(_.stripPrefix("g=").toLong).sorted
    val orphanRows = onDisk.filterNot(cited.contains).map { g =>
      ("orphan_generation", s"g=$g", true,
        "unreferenced by any retained pointer (vacuum reclaims)")
    }
    (pointerRows ++ citedRows ++ orphanRows)
      .toDF("check", "subject", "ok", "detail")
      .orderBy(col("check"), col("subject"))
  }

  /** `max_pt` for a manifest-pointer table: the latest partition VALUE
    * of the leading `partitionCol` among live pointer entries —
    * resolved from the pointer map alone (no Spark job, no directory
    * listing): the manifested sibling of
    * [[PartitionedWrite.maxPtListing]] / `CatalogFunctions.maxPt`. */
  def maxPt(path: String, partitionCol: String): Option[String] = {
    val prefix = s"$partitionCol="
    latestPointer(path).map { case (_, map) =>
      map.keys.toSeq.map(_.split('/').head)
        .filter(_.startsWith(prefix))
        .map(seg => org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.unescapePathName(seg.stripPrefix(prefix)))
    }.filter(_.nonEmpty).map(_.max)
  }

  /** Fold every live generation into ONE new generation and flip the
    * pointer — compaction with zero data movement at retire time (the
    * old file set is retired by the pointer flip alone; [[vacuum]]
    * reclaims it later). A whole-table rewrite conflicts with ANY
    * concurrent commit, so the CAS refuses instead of rebasing.
    * Returns the new generation id. */
  def compact(spark: SparkSession, path: String,
      partitionCols: Seq[String]): Long = {
    val base = latestPointer(path).map(_._2).getOrElse(
      throw new IllegalStateException(
        s"no committed manifest-pointer state under $path"))
    val data = readMap(spark, path, base)
    val gen = claimGeneration(path, nextGenStart(path))
    val dest = genDir(path, gen)
    data.repartition(partitionCols.map(col): _*)
      .write.mode("append").partitionBy(partitionCols: _*).parquet(dest)
    val rels = stagedRels(dest, partitionCols.length)
    onCommitStep("generation-written")
    casCommit(path, base, _ => true,
      _ => rels.map(_ -> Seq(gen)).toMap, maxRetries = 0)
    gen
  }

  private def relFiles(path: String, rel: String, gens: Seq[Long]) =
    gens.flatMap { g =>
      val dir = new HPath(s"${genDir(path, g)}/$rel")
      if (!Fs.exists(dir)) Seq.empty
      else Fs.of(dir).listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    }

  /** Fragmented live partitions of the latest pointer — the manifest
    * sibling of [[Maintenance.compactionCandidates]]: a partition whose
    * file count (across every generation it cites) exceeds what one
    * well-sized write would produce. Pointer resolution + per-partition
    * listings, no data read, no Spark job. */
  def compactionCandidates(path: String, targetFileBytes: Long)
      : Seq[Maintenance.CompactionPlan] = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val map = latestPointer(path).map(_._2).getOrElse(
      return Seq.empty)
    map.toSeq.sortBy(_._1).flatMap { case (rel, gens) =>
      val fs = relFiles(path, rel, gens)
      val bytes = fs.map(_.getLen).sum
      val target = math.max(1L,
        (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      if (fs.size > target)
        Some(Maintenance.CompactionPlan(rel, fs.size, bytes, target))
      else None
    }
  }

  /** Rewrite ONLY the fragmented partitions of a manifest-pointer table
    * into one fresh generation and flip the pointer — the
    * `Maintenance.compactPartitions` contract (cost proportional to the
    * fragmentation, not the table; hash-bucketed deterministic file
    * counts) under the pointer commit instead of per-partition rename
    * swaps: readers never cross a visibility window, a crash before
    * the PUT leaves the old pointer serving, and a concurrent commit
    * that touched NONE of the fragmented partitions is rebased over
    * (one that did touch them refuses — the next maintenance run
    * recompacts). Returns the rewritten partition rel-paths. */
  def compactFragmented(spark: SparkSession, path: String,
      partitionCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxCommitRetries: Int = 5): Seq[String] = {
    require(partitionCols.nonEmpty,
      "manifest tables always have partition columns")
    val base = latestPointer(path).map(_._2).getOrElse(
      throw new IllegalStateException(
        s"no committed manifest-pointer state under $path"))
    val plans = compactionCandidates(path, targetFileBytes)
    if (plans.isEmpty) return Seq.empty
    val gen = claimGeneration(path, nextGenStart(path))
    val dest = genDir(path, gen)
    // one read branch per DISTINCT target file count (few in practice),
    // each bucketing rows with a constant modulus — the rename-mode
    // branch layout, reading per cited generation with basePath so the
    // partition columns materialize
    val branches = plans.groupBy(_.targetFiles).toSeq.map { case (n, ps) =>
      val rels = ps.map(_.rel).toSet
      val perGen = base.toSeq
        .filter { case (rel, _) => rels.contains(rel) }
        .flatMap { case (rel, gens) => gens.map(g => g -> rel) }
        .groupBy(_._1).toSeq.sortBy(_._1)
      val df = perGen.map { case (g, grels) =>
        spark.read.option("basePath", genDir(path, g))
          .parquet(grels.map { case (_, rel) =>
            s"${genDir(path, g)}/$rel" }.distinct: _*)
      }.reduce(_ unionByName _)
      df.withColumn("__graft_bucket",
        pmod(xxhash64(df.columns.map(col): _*), lit(n.toLong)).cast("int"))
    }
    branches.reduce(_ unionByName _)
      .repartition((partitionCols :+ "__graft_bucket").map(col): _*)
      .drop("__graft_bucket")
      .write.mode("append").partitionBy(partitionCols: _*).parquet(dest)
    val staged = stagedRels(dest, partitionCols.length)
    onCommitStep("generation-written")
    val stagedSet = staged.toSet
    casCommit(path, base, stagedSet.contains,
      m => staged.foldLeft(m)((mm, rel) => mm.updated(rel, Seq(gen))),
      maxCommitRetries)
    staged
  }

  /** Z-order layout rewrite of a manifest-pointer table — the
    * `Maintenance.zorderRewrite` contract (curve-clustered files within
    * each partition, min/max skipping on every clustering dimension)
    * committed by generation write + ONE pointer flip: a layout change
    * rewrites every partition, so any concurrent commit conflicts and
    * the CAS refuses rather than rebasing. Returns the rewritten
    * partition rel-paths. */
  def zorderRewrite(spark: SparkSession, path: String,
      partitionCols: Seq[String], zorderCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024,
      bits: Int = 8): Seq[String] = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(partitionCols.nonEmpty,
      "manifest tables always have partition columns")
    val base = latestPointer(path).map(_._2).getOrElse(
      throw new IllegalStateException(
        s"no committed manifest-pointer state under $path"))
    val totalTarget = base.toSeq.map { case (rel, gens) =>
      val bytes = relFiles(path, rel, gens).map(_.getLen).sum
      math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    }.sum
    val df = readMap(spark, path, base)
    val zk = graft.operators.ZOrder.key(
      graft.operators.ZOrder.fitBoundaries(df, zorderCols, bits),
      zorderCols, bits)
    val gen = claimGeneration(path, nextGenStart(path))
    val dest = genDir(path, gen)
    // one range exchange on (partition cols, curve key) — the rename
    // writer's layout, landing in the fresh generation
    val orderCols = partitionCols.map(col) :+ col("__graft_zkey")
    df.withColumn("__graft_zkey", zk)
      .repartitionByRange(totalTarget, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .drop("__graft_zkey")
      .write.mode("append").partitionBy(partitionCols: _*).parquet(dest)
    val staged = stagedRels(dest, partitionCols.length)
    onCommitStep("generation-written")
    casCommit(path, base, _ => true,
      _ => staged.map(_ -> Seq(gen)).toMap, maxRetries = 0)
    staged
  }

  /** Reclaim everything the retained pointers do not reference: the
    * newest `keepPointers` pointer files survive (reader-in-flight
    * grace — a reader that just resolved one of them still finds every
    * generation it cites), older pointers are deleted, and any
    * generation referenced by NO surviving pointer goes with them.
    * Single-maintenance-owner, like every vacuum in this library; when
    * writers may be IN FLIGHT during vacuum, set `minUnreferencedAgeMs`
    * so their claimed-but-uncommitted generations get a grace window
    * (an unreferenced dir younger than it is skipped — the
    * [[Maintenance.SwapRecoveryMinAgeMs]] stance; the default 0 keeps
    * the strict single-owner semantics where nothing is in flight).
    * Returns the deleted generation dirs. */
  def vacuum(path: String, keepPointers: Int = 1,
      minUnreferencedAgeMs: Long = 0L): Seq[String] = {
    require(keepPointers >= 1, s"keepPointers must be >= 1, got $keepPointers")
    val pDir = new HPath(s"$path/_pointer")
    if (!Fs.exists(pDir)) return Seq.empty
    val ids = Fs.of(pDir).listStatus(pDir).toSeq.map(_.getPath.getName)
      .collect { case PointerRe(id) => id.toLong }.sorted
    if (ids.isEmpty) return Seq.empty
    val keep = ids.takeRight(keepPointers).toSet
    val live = keep.toSeq.flatMap { id =>
      Fs.readString(new HPath(pDir, s"p$id.txt")).split('\n').toSeq
        .filter(_.nonEmpty).drop(1)
        .flatMap(_.split('\t').toSeq.tail.map(_.toLong))
    }.toSet
    val genRoot = new HPath(s"$path/_gen")
    val cutoff = System.currentTimeMillis() - minUnreferencedAgeMs
    val deleted = if (!Fs.exists(genRoot)) Seq.empty else {
      Fs.of(genRoot).listStatus(genRoot).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("g=") &&
          !live.contains(s.getPath.getName.stripPrefix("g=").toLong) &&
          s.getModificationTime <= cutoff)
        .map { s => Fs.deleteRetried(s.getPath); s.getPath.toString }
    }
    ids.filterNot(keep.contains).foreach(id =>
      Fs.deleteRetried(new HPath(pDir, s"p$id.txt")))
    deleted
  }
}
