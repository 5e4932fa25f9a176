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
  * Concurrency contract: single writer per table (the reference's
  * session model); readers are lock-free and always see a complete
  * pointer. [[vacuum]] needs the same single-maintenance-owner rule as
  * `Maintenance`.
  */
object ManifestCommit {

  private val PointerRe = "p(\\d+)\\.txt".r
  private val Header = "graft-pointer v1"

  private def genDir(path: String, gen: Long) = s"$path/_gen/g=$gen"

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

  /** Latest committed (gen, partitionRel → generation list) under
    * `path`; None before the first commit. */
  def latestPointer(path: String): Option[(Long, Map[String, Seq[Long]])] = {
    val ids = pointerIds(path)
    if (ids.isEmpty) None
    else Some(ids.max -> parsePointer(path, ids.max))
  }

  private def writePointer(path: String, gen: Long,
      map: Map[String, Seq[Long]]): Unit = {
    Fs.mkdirs(new HPath(s"$path/_pointer"))
    val body = (Header +: map.toSeq.sortBy(_._1).map { case (rel, gens) =>
      (rel +: gens.map(_.toString)).mkString("\t")
    }).mkString("\n")
    // no-overwrite CREATE = the atomic claim on generation `gen` (the
    // Checkpoints generation-mark discipline; maps onto a conditional
    // PUT on object stores): two writers racing the same table fail
    // LOUDLY on the second commit instead of silently clobbering the
    // first one's pointer
    val p = new HPath(s"$path/_pointer/p$gen.txt")
    val out =
      try Fs.of(p).create(p, false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"concurrent writer detected: pointer p$gen.txt already " +
            s"committed under $path/_pointer — manifest-pointer tables " +
            "are single-writer (re-resolve the latest pointer and retry)",
            e)
      }
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** [[PartitionedWrite.writePartitioned]] with the manifest-pointer
    * commit: write the (clustered) data into the next immutable
    * generation, then flip the pointer with one small PUT. Returns the
    * touched partition rel-paths, like the rename-based writer. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil,
      overwrite: Boolean = true,
      limit: Int = PartitionedWrite.DefaultDynamicPartitionLimit,
      truncateSpec: Option[Seq[(String, String)]] = None,
      preClustered: Boolean = false): Seq[String] = {
    require(partitionCols.nonEmpty,
      "manifest commit needs at least one partition column")
    val prior = latestPointer(path)
    val gen = prior.map(_._1 + 1L).getOrElse(0L)
    val dest = genDir(path, gen)
    // a dir at the NEXT generation id can only be a crashed attempt's
    // orphan (a committed write would have advanced the pointer) —
    // clear it, or the append below would double its rows on retry
    if (Fs.exists(new HPath(dest))) Fs.deleteRetried(new HPath(dest))
    (if (preClustered) df
     else PartitionedWrite.clusterForWrite(df, partitionCols, sortCols))
      .write.mode("append")
      .partitionBy(partitionCols: _*)
      .parquet(dest)
    // staged partitions from the fresh generation's own listing (the
    // generation is unpublished — listing it is not a reader protocol)
    def leaves(p: HPath, depth: Int): Seq[HPath] =
      if (depth == partitionCols.length) Seq(p)
      else Fs.listDirs(p).filter(_.getName.contains("="))
        .flatMap(leaves(_, depth + 1))
    val destQ = Fs.of(new HPath(dest)).makeQualified(new HPath(dest))
    val staged = leaves(destQ, 0)
      .map(_.toString.stripPrefix(destQ.toString).stripPrefix("/"))
    require(staged.size <= limit,
      s"dynamic partition count ${staged.size} exceeds limit $limit " +
        s"(cols=${partitionCols.mkString(",")})")
    val base0 = prior.map(_._2).getOrElse(Map.empty)
    val base = truncateSpec match {
      case None => base0
      case Some(Nil) => Map.empty[String, Seq[Long]]
      case Some(spec) =>
        val prefix = spec.map { case (c, v) =>
          PartitionedWrite.partSegment(c, v) }.mkString("/")
        base0.filterNot { case (rel, _) =>
          rel == prefix || rel.startsWith(prefix + "/") }
    }
    val next = staged.foldLeft(base) { (m, rel) =>
      if (overwrite) m.updated(rel, Seq(gen))
      else m.updated(rel, m.getOrElse(rel, Seq.empty) :+ gen)
    }
    writePointer(path, gen, next) // the commit point
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
    writePointer(path, next, map)
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
    * reclaims it later). The manifest-pointer form of
    * `Maintenance.compactPartitions`, without its adopt/retire
    * visibility window. Returns the new generation id. */
  def compact(spark: SparkSession, path: String,
      partitionCols: Seq[String]): Long = {
    val data = read(spark, path)
    val gen = latestPointer(path).get._1 + 1L
    val dest = genDir(path, gen)
    // crashed-attempt orphan at the next id: clear before the append
    if (Fs.exists(new HPath(dest))) Fs.deleteRetried(new HPath(dest))
    data.repartition(partitionCols.map(col): _*)
      .write.mode("append").partitionBy(partitionCols: _*).parquet(dest)
    def leaves(p: HPath, depth: Int): Seq[HPath] =
      if (depth == partitionCols.length) Seq(p)
      else Fs.listDirs(p).filter(_.getName.contains("="))
        .flatMap(leaves(_, depth + 1))
    val destQ = Fs.of(new HPath(dest)).makeQualified(new HPath(dest))
    val rels = leaves(destQ, 0)
      .map(_.toString.stripPrefix(destQ.toString).stripPrefix("/"))
    writePointer(path, gen, rels.map(_ -> Seq(gen)).toMap)
    gen
  }

  /** Reclaim everything the retained pointers do not reference: the
    * newest `keepPointers` pointer files survive (reader-in-flight
    * grace — a reader that just resolved one of them still finds every
    * generation it cites), older pointers are deleted, and any
    * generation referenced by NO surviving pointer goes with them.
    * Single-maintenance-owner, like every vacuum in this library.
    * Returns the deleted generation dirs. */
  def vacuum(path: String, keepPointers: Int = 1): Seq[String] = {
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
    val deleted = if (!Fs.exists(genRoot)) Seq.empty else {
      Fs.listDirs(genRoot)
        .filter(p => p.getName.startsWith("g=") &&
          !live.contains(p.getName.stripPrefix("g=").toLong))
        .map { p => Fs.deleteRetried(p); p.toString }
    }
    ids.filterNot(keep.contains).foreach(id =>
      Fs.deleteRetried(new HPath(pDir, s"p$id.txt")))
    deleted
  }
}
