package org.apache.spark.sql.graft

import java.util.OptionalLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.Statistics
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Scan builder for catalog tables that carries table-level statistics
  * (collected at write commit — `graft.catalog.TableStatistics`) into the
  * planner. Subclasses the stock parquet builder/scan so EVERYTHING else —
  * pushdown, column pruning, aggregate pushdown, vectorized read, explain
  * metadata — is inherited behavior; only `estimateStatistics` changes.
  * Lives in this package for the same `private[sql]` reason as
  * `expressions.scala`.
  *
  * `stats` is a thunk: the stats file is read when the scan is BUILT (plan
  * time), so a stale Table object never pins stale numbers. */
class GraftScanBuilder(sparkSession: SparkSession,
    fileIndex: PartitioningAwareFileIndex, schema: StructType,
    dataSchema: StructType, options: CaseInsensitiveStringMap,
    stats: () => Option[(Long, Long)])
  extends ParquetScanBuilder(sparkSession, fileIndex, schema, dataSchema, options) {

  override def build(): ParquetScan = new GraftStatsScan(super.build(), stats())
}

/** A `ParquetScan` whose statistics are fed by catalog-collected row/byte
  * counts, PRUNE-AWARE like the reference's planner
  * (`PruneHiveTablePartitions.scala:62-108`): the stored row count is
  * scaled by the fraction of file bytes surviving the pushed partition
  * filters, and the size estimate uses the READ schema's row width — the
  * reference's read-schema scaling (`OdpsScan.scala:267-279`). A filtered
  * dimension loaded through the catalog therefore reports its pruned, not
  * total, size to join selection. */
class GraftStatsScan(p: ParquetScan, tableStats: Option[(Long, Long)])
  extends ParquetScan(p.sparkSession, p.hadoopConf, p.fileIndex,
    p.dataSchema, p.readDataSchema, p.readPartitionSchema, p.pushedFilters,
    p.options, p.pushedAggregate, p.partitionFilters, p.dataFilters,
    p.pushedVariantExtractions) {

  override def estimateStatistics(): Statistics = tableStats match {
    case Some((totalRows, totalBytes)) if totalRows > 0 && totalBytes > 0 =>
      val prunedBytes = fileIndex.listFiles(partitionFilters, dataFilters)
        .flatMap(_.files).map(_.getLen).sum
      val frac = math.min(1.0, prunedBytes.toDouble / totalBytes)
      val rows = math.ceil(totalRows * frac).toLong
      val width = math.max(1,
        (readDataSchema.fields ++ readPartitionSchema.fields)
          .map(_.dataType.defaultSize).sum) + 8 // + row object overhead
      new Statistics {
        override def sizeInBytes(): OptionalLong =
          OptionalLong.of(math.max(1L, rows * width))
        override def numRows(): OptionalLong = OptionalLong.of(rows)
      }
    case _ => super.estimateStatistics()
  }
}
