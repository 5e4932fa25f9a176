package org.apache.spark.sql.graft

import java.util.OptionalLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal}
import org.apache.spark.sql.connector.expressions.{FieldReference, NamedReference}
import org.apache.spark.sql.connector.read.{Statistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.sources.{EqualTo => FEqualTo, Filter, In => FIn}
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
    p.pushedVariantExtractions) with SupportsRuntimeFiltering {

  // ---- dynamic partition pruning for catalog (DSv2) scans ----
  // Spark's stock FileScan never implements SupportsRuntimeFiltering, so a
  // catalog fact table would scan EVERY partition in a fact⋈filtered-dim
  // join — the V1 read path gets DPP, the V2 one silently doesn't. The
  // reference hand-implements exactly this (`OdpsTableScanExec.scala:
  // 125-167` collects dim keys and prunes fact partitions at runtime).
  // Here: declare the partition columns filterable; at runtime translate
  // the arriving IN/= filters into catalyst predicates and rebuild a
  // pruned copy of the scan — BatchScanExec calls filter() and then
  // re-plans input partitions, which we serve from the pruned copy.

  @volatile private var prunedScan: ParquetScan = null

  override def filterAttributes(): Array[NamedReference] =
    readPartitionSchema.fieldNames.map(FieldReference(_))

  override def filter(filters: Array[Filter]): Unit = {
    def attr(name: String): Option[AttributeReference] =
      readPartitionSchema.fields.find(_.name.equalsIgnoreCase(name))
        .map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    val runtimeFilters: Seq[Expression] = filters.toSeq.flatMap {
      case FIn(a, values) => attr(a).map(ar =>
        org.apache.spark.sql.catalyst.expressions.In(ar,
          values.toSeq.map(v => Literal.create(v, ar.dataType))))
      case FEqualTo(a, v) => attr(a).map(ar =>
        org.apache.spark.sql.catalyst.expressions.EqualTo(ar,
          Literal.create(v, ar.dataType)))
      case _ => None // unsupported shapes just skip pruning (safe)
    }
    if (runtimeFilters.nonEmpty)
      prunedScan = p.copy(partitionFilters = p.partitionFilters ++ runtimeFilters)
  }

  override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] =
    if (prunedScan != null) prunedScan.planInputPartitions()
    else super.planInputPartitions()

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
