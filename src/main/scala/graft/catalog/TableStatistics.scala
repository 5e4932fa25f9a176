package graft.catalog

import org.apache.hadoop.fs.{FileStatus, Path => HPath}

import graft.sources.Fs

/** Per-partition row/byte statistics persisted next to the table data
  * (`_graft_stats.json`) and refreshed at every write commit — the
  * ANALYZE-at-commit path the reference gets from its meta service and
  * feeds into join planning (`PruneHiveTablePartitions.scala:62-108`
  * prunes partition sizes; `OdpsScan.scala:267-279` scales scan estimates).
  *
  * The refresh is INCREMENTAL: partitions whose (bytes, file count) match
  * the stored entry keep their recorded row count; only new or changed
  * partitions have their parquet footers re-read (footers carry exact row
  * counts — one small ranged read per file, no data scan). At 100 TB a
  * typical commit touches a handful of partitions, so the refresh cost is
  * proportional to the write, not the table.
  */
object TableStatistics {

  final case class PartStat(rows: Long, bytes: Long, files: Int)
  final case class TableStats(rows: Long, bytes: Long,
      parts: Map[String, PartStat])

  def statsFile(dir: HPath): HPath = new HPath(dir, "_graft_stats.json")

  /** Cached read ([[MetaCache.stats]], TTL'd): scan planning consults the
    * stats per query, and the uncached form is a LIST+GET per table per
    * query on an object store. Stats writes through this process
    * invalidate ([[write]]); foreign writers become visible within the
    * TTL — acceptable for advisory planner stats. */
  def read(dir: HPath): Option[TableStats] =
    MetaCache.stats.get(statsFile(dir).toString)(readUncached(dir))

  private def readUncached(dir: HPath): Option[TableStats] = {
    val f = statsFile(dir)
    // existence check + read are not atomic against a concurrent commit's
    // renameOverwrite (delete-then-rename on object stores has a brief
    // missing-file window) — a vanished file degrades to None (planner
    // falls back to size estimates), never to a failed query
    if (!Fs.exists(f)) None
    else scala.util.Try(Fs.readString(f)).toOption.flatMap { json =>
      val entry =
        "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\\{\"rows\":(\\d+),\"bytes\":(\\d+),\"files\":(\\d+)\\}".r
      val parts = entry.findAllMatchIn(json).map { m =>
        m.group(1) -> PartStat(m.group(2).toLong, m.group(3).toLong, m.group(4).toInt)
      }.toMap
      val top = "\"rows\":(\\d+),\"bytes\":(\\d+),\"parts\"".r
      top.findFirstMatchIn(json).map(m =>
        TableStats(m.group(1).toLong, m.group(2).toLong, parts))
    }
  }

  /** Scope of a commit's stats refresh: the partition rel-paths the write
    * landed in, plus (for overwrite truncations) the rel-path prefix whose
    * stored entries must be dropped ("" = whole table). */
  final case class Touched(rels: Seq[String], removedPrefix: Option[String] = None)

  private def write(dir: HPath, ts: TableStats): Unit = {
    // partition keys are path-escaped (ExternalCatalogUtils), so they never
    // contain raw quotes or backslashes — safe to embed directly
    val parts = ts.parts.toSeq.sortBy(_._1).map { case (k, p) =>
      s""""$k":{"rows":${p.rows},"bytes":${p.bytes},"files":${p.files}}"""
    }.mkString("{", ",", "}")
    // tmp + rename: a planning query reading concurrently must never see a
    // truncated/half-written stats file; UUID tmp name so two concurrent
    // commits can't clobber each other's staging file
    val tmp = new HPath(dir,
      s"._graft_stats.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Fs.writeString(tmp,
      s"""{"rows":${ts.rows},"bytes":${ts.bytes},"parts":$parts}""")
    Fs.renameOverwrite(tmp, statsFile(dir))
    MetaCache.stats.invalidate(statsFile(dir).toString)
  }

  private def fileRows(p: HPath): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, Fs.conf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Footer reads fan out over a small thread pool — a bulk initial load
    * (or analyzeTable over a large external dataset) is one ranged read
    * per file, and on object stores the serial form would put O(files)
    * round-trip latency inside the commit path. */
  private def fileRowsAll(paths: Seq[HPath]): Map[HPath, Long] = {
    if (paths.isEmpty) Map.empty
    else if (paths.size == 1) Map(paths.head -> fileRows(paths.head))
    else {
      import scala.jdk.CollectionConverters._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, paths.size))
      try {
        val tasks: Seq[java.util.concurrent.Callable[(HPath, Long)]] =
          paths.map(p => () => p -> fileRows(p))
        pool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
      } finally pool.shutdown()
    }
  }

  private def dataFiles(p: HPath): Seq[FileStatus] =
    Fs.of(p).listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Recompute the table's stats from the committed layout under `dir`,
    * reusing stored row counts for unchanged partitions, and persist the
    * result. `statsDir` overrides where the stats FILE lives — external
    * tables keep their data directory pristine and home the stats next to
    * the catalog metadata instead.
    *
    * `touched` scopes the refresh to the partitions a commit actually
    * wrote (plus a truncated prefix whose stored entries are dropped):
    * only those directories are listed and footer-read, the rest of the
    * stored stats carry over — at 100k partitions a full walk per commit
    * would put O(table) FS round-trips inside every write. Without
    * `touched` (explicit ANALYZE, unpartitioned tables) the full walk
    * runs and also reconciles partitions changed by external writers. */
  def refresh(dir: HPath, partitionCols: Seq[String],
      statsDir: Option[HPath] = None,
      touched: Option[Touched] = None): TableStats = {
    val home = statsDir.getOrElse(dir)
    val old = read(home).map(_.parts).getOrElse(Map.empty)
    def walk(p: HPath, depth: Int, rel: String): Seq[(String, HPath)] =
      if (depth == partitionCols.length) Seq(rel -> p)
      else if (!Fs.isDir(p)) Seq.empty
      else Fs.listDirs(p)
        .filter(_.getName.startsWith(partitionCols(depth) + "="))
        .flatMap(d => walk(d, depth + 1,
          if (rel.isEmpty) d.getName else s"$rel/${d.getName}"))
    val (base, listed) = touched match {
      case Some(t) if partitionCols.nonEmpty =>
        val pruned = t.removedPrefix match {
          case Some("") => Map.empty[String, PartStat]
          // segment-aligned: truncating dt=1 must not drop dt=19's stats —
          // a raw startsWith here silently erased sibling partitions from
          // the totals until the next full ANALYZE
          case Some(prefix) =>
            old.filterNot { case (r, _) =>
              r == prefix || r.startsWith(prefix + "/") }
          case None => old
        }
        val rels = t.rels.distinct
        val dirs = rels.map(rel =>
          rel -> rel.split('/').foldLeft(dir)(new HPath(_, _)))
        (pruned -- rels,
          dirs.filter(d => Fs.isDir(d._2)).map { case (rel, p) => (rel, dataFiles(p)) })
      case _ =>
        (Map.empty[String, PartStat],
          walk(dir, 0, "").map { case (rel, p) => (rel, dataFiles(p)) })
    }
    val changed = listed.filter { case (rel, fs) =>
      !old.get(rel).exists(ps =>
        ps.bytes == fs.map(_.getLen).sum && ps.files == fs.size)
    }
    val rowsByFile = fileRowsAll(changed.flatMap(_._2.map(_.getPath)))
    val parts = base ++ listed.map { case (rel, fs) =>
      val bytes = fs.map(_.getLen).sum
      val stat = old.get(rel) match {
        case Some(ps) if ps.bytes == bytes && ps.files == fs.size => ps
        case _ => PartStat(fs.map(f => rowsByFile(f.getPath)).sum, bytes, fs.size)
      }
      rel -> stat
    }.toMap
    val ts = TableStats(parts.values.map(_.rows).sum,
      parts.values.map(_.bytes).sum, parts)
    write(home, ts)
    ts
  }
}
