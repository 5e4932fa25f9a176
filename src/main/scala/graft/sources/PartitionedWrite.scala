package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-aware bulk writes — the reference's write path re-expressed
  * over Spark's built-in `partitionBy` + dynamic partition overwrite
  * (`FileCommitProtocol` gives the atomic job commit that
  * `OdpsBatchWrite.commit` implements by hand,
  * `spark-connector/.../OdpsBatchWrite.scala:42-95`).
  */
object PartitionedWrite {

  /** Reference default: at most 512 dynamic partitions per write
    * (`OdpsOptions.scala:112`). */
  val DefaultDynamicPartitionLimit = 512

  /** Resolve a Sqoop-style `%{column}` partition-value template
    * (`odps-sqoop/.../OdpsUploadProcessor.java:182-231`) into a Column. */
  def resolveTemplate(template: String): Column = {
    val pat = "%\\{([^}]+)\\}".r
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- pat.findAllMatchIn(template)) {
      if (m.start > last) parts += lit(template.substring(last, m.start))
      parts += col(m.group(1)).cast("string")
      last = m.end
    }
    if (last < template.length) parts += lit(template.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** Enforce the dynamic-partition explosion guard before a write: counts
    * distinct partition tuples with one cheap agg and fails with a clear
    * error over the limit (`SQLQuerySuite.scala:233-249` behavior). */
  def checkDynamicPartitionLimit(df: DataFrame, partitionCols: Seq[String],
      limit: Int = DefaultDynamicPartitionLimit): Long = {
    val n = df.select(partitionCols.map(col): _*).distinct().count()
    require(n <= limit,
      s"dynamic partition count $n exceeds limit $limit " +
        s"(cols=${partitionCols.mkString(",")})")
    n
  }

  /** Cluster rows for write: repartition on the partition columns, then
    * sort within partitions by (partitionCols ++ sortCols) — the
    * write-side repartition+local-sort the reference injects via its
    * optimizer rule (`OdpsExtensions.scala:89-149`). One file per
    * partition-and-task instead of one per task×partition. */
  def clusterForWrite(df: DataFrame, partitionCols: Seq[String],
      sortCols: Seq[String] = Nil): DataFrame =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)

  /** Dynamic-partition overwrite write: only partitions present in `df` are
    * replaced (the reference's overwrite-session semantics; Spark's
    * `partitionOverwriteMode=dynamic` built-in). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String] = Nil, overwrite: Boolean = true,
      limit: Int = DefaultDynamicPartitionLimit): Unit = {
    checkDynamicPartitionLimit(df, partitionCols, limit)
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      clusterForWrite(df, partitionCols, sortCols)
        .write
        .mode(if (overwrite) "overwrite" else "append")
        .partitionBy(partitionCols: _*)
        .parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Static-partition overwrite with the reference's empty-result edge
    * semantics (`OdpsBatchWrite.scala:54-89`): overwriting a partition with
    * an EMPTY result must still truncate it (and create the partition dir
    * if absent) — Spark's dynamic overwrite would silently leave old data
    * in place because no partition value ever materializes. `spec` is the
    * ordered static partition assignment col→value. */
  def overwriteStaticPartition(df: DataFrame, path: String,
      spec: Seq[(String, String)]): Unit = {
    val partDir = spec.foldLeft(java.nio.file.Paths.get(path)) {
      case (p, (c, v)) => p.resolve(s"$c=$v")
    }
    // truncate-or-create first — commits even when df is empty
    if (java.nio.file.Files.exists(partDir)) {
      def rm(x: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(x)) {
          val it = java.nio.file.Files.list(x).iterator()
          while (it.hasNext) rm(it.next())
        }
        java.nio.file.Files.deleteIfExists(x)
      }
      rm(partDir)
    }
    java.nio.file.Files.createDirectories(partDir)
    val dataCols = df.columns.filterNot(spec.map(_._1).contains)
    df.select(dataCols.map(col): _*)
      .write.mode("append").parquet(partDir.toString)
  }

  /** Latest partition value of a partitioned parquet table — `max_pt`
    * (`spark-connector/common/.../udf/MaxPtUDF.java:30-41`), resolved from
    * the file index (partition listing), not by scanning data. */
  def maxPt(df: DataFrame, partitionCol: String): String = {
    val row = df.select(col(partitionCol).cast("string")).distinct()
      .agg(max(col(partitionCol))).head()
    if (row.isNullAt(0)) null else row.getString(0)
  }
}
