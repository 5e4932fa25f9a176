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

  def read(dir: HPath): Option[TableStats] = {
    val f = statsFile(dir)
    if (!Fs.exists(f)) None
    else {
      val json = Fs.readString(f)
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

  private def write(dir: HPath, ts: TableStats): Unit = {
    // partition keys are path-escaped (ExternalCatalogUtils), so they never
    // contain raw quotes or backslashes — safe to embed directly
    val parts = ts.parts.toSeq.sortBy(_._1).map { case (k, p) =>
      s""""$k":{"rows":${p.rows},"bytes":${p.bytes},"files":${p.files}}"""
    }.mkString("{", ",", "}")
    Fs.writeString(statsFile(dir),
      s"""{"rows":${ts.rows},"bytes":${ts.bytes},"parts":$parts}""")
  }

  private def fileRows(p: HPath): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, Fs.conf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  private def dataFiles(p: HPath): Seq[FileStatus] =
    Fs.of(p).listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Recompute the table's stats from the committed layout, reusing stored
    * row counts for unchanged partitions, and persist the result. */
  def refresh(dir: HPath, partitionCols: Seq[String]): TableStats = {
    val old = read(dir).map(_.parts).getOrElse(Map.empty)
    def walk(p: HPath, depth: Int, rel: String): Seq[(String, HPath)] =
      if (depth == partitionCols.length) Seq(rel -> p)
      else if (!Fs.isDir(p)) Seq.empty
      else Fs.listDirs(p)
        .filter(_.getName.startsWith(partitionCols(depth) + "="))
        .flatMap(d => walk(d, depth + 1,
          if (rel.isEmpty) d.getName else s"$rel/${d.getName}"))
    val parts = walk(dir, 0, "").map { case (rel, p) =>
      val fs = dataFiles(p)
      val bytes = fs.map(_.getLen).sum
      val stat = old.get(rel) match {
        case Some(ps) if ps.bytes == bytes && ps.files == fs.size => ps
        case _ => PartStat(fs.map(f => fileRows(f.getPath)).sum, bytes, fs.size)
      }
      rel -> stat
    }.toMap
    val ts = TableStats(parts.values.map(_.rows).sum,
      parts.values.map(_.bytes).sum, parts)
    write(dir, ts)
    ts
  }
}
