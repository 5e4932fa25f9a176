package graft.catalog

import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Catalog table backed by a partitioned-parquet directory.
  *
  * Read/write delegate to Spark's `ParquetTable` (built-in DSv2), so the
  * physical plan is stock `FileSourceScanExec`/`FileBatchWrite` with
  * partition pruning, pushdown and vectorization — the reference's whole
  * custom scan stack (`OdpsScan.scala`) collapses into this delegation.
  * On top, this class implements `SupportsPartitionManagement`: partitions
  * are `col=value` directories, created/dropped/listed as catalog objects
  * (`OdpsTableCatalog.scala:402-425`, `OdpsTable.scala:103-135`).
  */
object GraftTable {
  val BucketColsKey = "graft.bucket.cols"
  val BucketCountKey = "graft.bucket.count"
  // range clustering: cols value is "col [ASC|DESC], col2 [ASC|DESC], ..."
  val RangeColsKey = "graft.range.cols"
  val RangeCountKey = "graft.range.count"

  /** Parse a range-cluster column spec into ((col, isDescending))*. */
  def parseRangeCols(spec: String): Seq[(String, Boolean)] =
    spec.split(",").toSeq.map { tok =>
      val parts = tok.trim.split("\\s+")
      require(parts.length <= 2 &&
        (parts.length == 1 || parts(1).equalsIgnoreCase("ASC") ||
          parts(1).equalsIgnoreCase("DESC")),
        s"bad range-cluster column spec: '$tok' (want 'col [ASC|DESC]')")
      (parts(0), parts.length > 1 && parts(1).equalsIgnoreCase("DESC"))
    }
}

class GraftTable(ident: Identifier, dir: HPath, meta: TableMeta,
    spark: SparkSession, statsDir: Option[HPath] = None)
  extends Table with SupportsRead with SupportsWrite with SupportsPartitionManagement {

  /** Where the stats file lives: the data dir for managed tables, the
    * warehouse metadata dir for external ones (whose data directory the
    * catalog must never write into). */
  private val statsHome: HPath = statsDir.getOrElse(dir)
  def statsLocation: String = statsHome.toString

  private lazy val delegate = ParquetTable(
    ident.toString, spark,
    new CaseInsensitiveStringMap(Map("path" -> dir.toString).asJava),
    Seq(dir.toString), Some(meta.schema), classOf[ParquetFileFormat])

  /** Table directory (for the strategy-planned write path). */
  def location: String = dir.toString
  /** Ordered partition column names. */
  def partitionColumnNames: Seq[String] = meta.partitionCols

  override def name(): String = ident.toString
  override def schema(): StructType = meta.schema
  override def partitioning(): Array[Transform] =
    meta.partitionCols.map(Expressions.identity).toArray
  override def properties(): java.util.Map[String, String] =
    meta.properties.asJava

  override def capabilities(): java.util.Set[TableCapability] = {
    // External tables are read-only through the catalog — the reference
    // rejects writes to EXTERNAL_TABLE (`OdpsWriteBuilder.scala:124-128`);
    // omitting the write capabilities makes analysis reject INSERTs with a
    // clean "does not support append" error.
    if (meta.isExternal) return Set(TableCapability.BATCH_READ).asJava
    // Partitioned tables route writes through the V1 fallback into the
    // staged partitioned writer (real col=value layout) — except dynamic
    // overwrite, which Spark has no V1 fallback exec for and which
    // GraftStrategies plans onto the same writer directly.
    // Unpartitioned/bucketed tables stay on DSv2.
    (if (meta.partitionCols.nonEmpty)
      Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER, TableCapability.OVERWRITE_DYNAMIC)
    else
      Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.OVERWRITE_DYNAMIC)).asJava
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(options) match {
      // same parquet builder, plus commit-collected stats for the planner
      case pb: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder =>
        new org.apache.spark.sql.graft.GraftScanBuilder(
          pb.sparkSession, pb.fileIndex, pb.schema, pb.dataSchema, pb.options,
          () => TableStatistics.read(statsHome).map(ts => (ts.rows, ts.bytes)))
      case other => other
    }

  /** Stats are advisory: the data is already committed when this runs, so
    * a refresh failure (transient FS error, concurrent file removal
    * between listing and footer read) must never surface as a failed
    * write job — Spark would report failure for landed data and a retry
    * would duplicate rows. `touched` scopes the refresh to the committed
    * partitions (see [[TableStatistics.refresh]]). */
  private def refreshStats(touched: Option[TableStatistics.Touched] = None): Unit =
    try TableStatistics.refresh(dir, meta.partitionCols, statsDir, touched)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[graft] stats refresh for ${name()} failed (stats may be stale " +
            s"until the next commit or ANALYZE): $e")
    }

  /** Wrap a DSv2 write so a successful commit refreshes the stats file —
    * the write-commit half of the stats-fed planning loop. */
  private def withStatsRefresh(d: org.apache.spark.sql.connector.write.Write)
      : org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def description(): String = d.description()
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new org.apache.spark.sql.connector.write.BatchWrite {
          private val b = d.toBatch
          override def createBatchWriterFactory(
              info: org.apache.spark.sql.connector.write.PhysicalWriteInfo) =
            b.createBatchWriterFactory(info)
          override def useCommitCoordinator(): Boolean = b.useCommitCoordinator()
          override def onDataWriterCommit(
              m: org.apache.spark.sql.connector.write.WriterCommitMessage): Unit =
            b.onDataWriterCommit(m)
          override def commit(
              msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
            b.commit(msgs)
            refreshStats()
          }
          override def abort(
              msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
            b.abort(msgs)
        }
      override def toStreaming = d.toStreaming
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // belt-and-braces behind the capabilities() gate above
    if (meta.isExternal)
      throw new UnsupportedOperationException(
        s"${name()} is an external table — writes through the catalog are " +
          "rejected; write to its location with an explicit job instead")
    // Partitioned tables write through the V1 fallback into the staged
    // partitioned writer, so rows land in col=value directories and reads
    // get real partition pruning (the DSv2 file write would lay the files
    // flat). Dynamic INSERT OVERWRITE maps to the staged dynamic-partition
    // overwrite — `OdpsBatchWrite`'s overwrite-session semantics.
    if (meta.partitionCols.nonEmpty) {
      import org.apache.spark.sql.connector.write.{SupportsDynamicOverwrite, SupportsOverwrite, V1Write, WriteBuilder => WB}
      import org.apache.spark.sql.sources.{AlwaysTrue, EqualNullSafe => FEqNs, EqualTo => FEq, Filter}
      return new WB with SupportsOverwrite with SupportsDynamicOverwrite {
        // None = plain append; Some(Nil) = full-table overwrite (static
        // INSERT OVERWRITE); Some(spec) = static partition-subtree
        // overwrite; DYNAMIC = replace only staged partitions (session
        // partitionOverwriteMode=dynamic at plan time)
        private var truncateSpec: Option[Seq[(String, String)]] = None
        private var dynamic = false
        // satisfies V2Writes; the actual dynamic plan comes from
        // GraftStrategies → GraftDynamicOverwriteExec
        override def overwriteDynamicPartitions(): WB = { dynamic = true; this }
        override def overwrite(filters: Array[Filter]): WB = {
          val dynamicMode = SparkSession.active.conf
            .get("spark.sql.sources.partitionOverwriteMode", "static")
            .equalsIgnoreCase("dynamic")
          filters match {
            case Array(_: AlwaysTrue) | Array() if dynamicMode =>
              dynamic = true
            case Array(_: AlwaysTrue) | Array() =>
              truncateSpec = Some(Nil)
            case fs =>
              val eqs = fs.map {
                case FEq(attr, v) => attr -> String.valueOf(v)
                case FEqNs(attr, v) => attr -> String.valueOf(v)
                case other => sys.error(s"unsupported overwrite filter $other " +
                  "(static partition specs only)")
              }.toMap
              // partition spec must be a leading prefix of the partition cols
              val prefix = meta.partitionCols.takeWhile(eqs.contains)
              require(prefix.size == eqs.size,
                s"overwrite spec $eqs must be a leading prefix of " +
                  s"partition columns ${meta.partitionCols.mkString(",")}")
              truncateSpec = Some(prefix.map(c => c -> eqs(c)))
          }
          this
        }
        override def build(): org.apache.spark.sql.connector.write.Write = new V1Write {
          override def toInsertableRelation: org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame, ow: Boolean): Unit = {
                val spec = truncateSpec.orElse(
                  if (ow && !dynamic) Some(Nil) else None)
                val written = graft.sources.PartitionedWrite.writePartitioned(
                  data, dir.toString, meta.partitionCols,
                  overwrite = dynamic || truncateSpec.isDefined || ow,
                  truncateSpec = spec)
                refreshStats(Some(TableStatistics.Touched(written,
                  removedPrefix = spec.map(_.map { case (c, v) =>
                    graft.sources.PartitionedWrite.partSegment(c, v)
                  }.mkString("/")))))
              }
            }
        }
      }
    }
    val inner = delegate.newWriteBuilder(info)
    rangeSpec match {
      case Some((orders, n)) =>
        // Range-clustered write: ordered distribution = one global sort,
        // which range-partitions the data AND sorts within partitions in
        // the declared per-column ASC/DESC — `Distributions.ordered` like
        // the reference's range cluster spec (`OdpsWriteBuilder.scala:70-116`).
        return new WriteBuilder {
          override def build(): org.apache.spark.sql.connector.write.Write =
            new org.apache.spark.sql.connector.write.Write
              with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
          private val d = inner.build()
          import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
          import org.apache.spark.sql.connector.expressions.{Expressions => E, SortDirection, SortOrder}
          private val sortOrders: Array[SortOrder] = orders.map { case (c, desc) =>
            E.sort(E.column(c),
              if (desc) SortDirection.DESCENDING else SortDirection.ASCENDING)
          }.toArray
          override def requiredDistribution(): Distribution =
            Distributions.ordered(sortOrders)
          override def requiredNumPartitions(): Int = n
          override def requiredOrdering(): Array[SortOrder] = sortOrders
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            withStatsRefresh(d).toBatch
          override def toStreaming = d.toStreaming
          override def description(): String = d.description()
          }
        }
      case None =>
    }
    bucketSpec match {
      case None => new WriteBuilder {
        override def build(): org.apache.spark.sql.connector.write.Write =
          withStatsRefresh(inner.build())
      }
      case Some((cols, n)) =>
        // Declarative write distribution/ordering for clustered tables —
        // the DSv2 hook the reference uses for range-clustered writes
        // (`OdpsWriteBuilder.scala:70-116`): Spark injects the
        // repartition+local-sort, no custom exchange needed.
        new WriteBuilder {
          override def build(): org.apache.spark.sql.connector.write.Write =
            new org.apache.spark.sql.connector.write.Write
              with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
          private val d = inner.build()
          import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
          import org.apache.spark.sql.connector.expressions.{Expressions => E, SortDirection, SortOrder}
          override def requiredDistribution(): Distribution =
            Distributions.clustered(cols.map(c => E.column(c): org.apache.spark.sql.connector.expressions.Expression).toArray)
          override def requiredNumPartitions(): Int = n
          override def requiredOrdering(): Array[SortOrder] =
            cols.map(c => E.sort(E.column(c), SortDirection.ASCENDING)).toArray
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            withStatsRefresh(d).toBatch
          override def toStreaming = d.toStreaming
          override def description(): String = d.description()
          }
        }
    }
  }

  /** (bucketCols, numBuckets) when this table is hash-clustered. */
  private def bucketSpec: Option[(Seq[String], Int)] =
    for {
      cols <- meta.properties.get(GraftTable.BucketColsKey)
      n <- meta.properties.get(GraftTable.BucketCountKey)
    } yield (cols.split(",").toSeq, n.toInt)

  /** ((col, isDescending)*, numPartitions) when this table is
    * RANGE-clustered — the reference's `range` cluster type with
    * per-column ASC/DESC sort (`OdpsTable.scala:46-79`). */
  private def rangeSpec: Option[(Seq[(String, Boolean)], Int)] =
    for {
      cols <- meta.properties.get(GraftTable.RangeColsKey)
      n <- meta.properties.get(GraftTable.RangeCountKey)
    } yield (GraftTable.parseRangeCols(cols), n.toInt)

  // ---- partition management (col=value directories) ----

  override def partitionSchema(): StructType = meta.partitionSchema

  private def partitionDir(identRow: InternalRow): HPath = {
    val ps = partitionSchema()
    (0 until ps.length).foldLeft(dir) { (p, i) =>
      val v = identRow.get(i, ps(i).dataType)
      new HPath(p, graft.sources.PartitionedWrite.partSegment(
        ps(i).name, String.valueOf(v)))
    }
  }

  /** Partition ADD/DROP mutate the data directory, so external tables
    * refuse them like any other write (`OdpsWriteBuilder.scala:124-128`
    * semantics) — DROP PARTITION on an external location would recursively
    * delete data the catalog does not own. */
  private def requireManagedForPartitionDdl(op: String): Unit =
    if (meta.isExternal)
      throw new UnsupportedOperationException(
        s"${name()} is an external table — $op would modify the external " +
          "location; manage partition directories with an explicit job instead")

  override def createPartition(id: InternalRow,
      properties: java.util.Map[String, String]): Unit = {
    requireManagedForPartitionDdl("ADD PARTITION")
    val p = partitionDir(id)
    if (graft.sources.Fs.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.PartitionsAlreadyExistException(
        name(), id, partitionSchema())
    graft.sources.Fs.mkdirs(p)
  }

  override def dropPartition(id: InternalRow): Boolean = {
    requireManagedForPartitionDdl("DROP PARTITION")
    graft.sources.Fs.delete(partitionDir(id))
  }

  override def replacePartitionMetadata(id: InternalRow,
      properties: java.util.Map[String, String]): Unit = ()

  override def loadPartitionMetadata(id: InternalRow): java.util.Map[String, String] =
    Collections.emptyMap()

  /** Lists partition identifier rows by scanning the directory tree; `names`
    * + `id` form a prefix filter (Spark's contract for SHOW PARTITIONS /
    * partition pruning of the listing). */
  override def listPartitionIdentifiers(names: Array[String],
      id: InternalRow): Array[InternalRow] = {
    val ps = partitionSchema()
    def walk(p: HPath, depth: Int, acc: Seq[String]): Seq[Seq[String]] = {
      if (depth == ps.length) Seq(acc)
      else if (!graft.sources.Fs.isDir(p)) Seq.empty
      else graft.sources.Fs.listDirs(p)
        .filter(_.getName.startsWith(ps(depth).name + "="))
        .flatMap(d => walk(d, depth + 1,
          acc :+ org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(d.getName.substring(ps(depth).name.length + 1))))
    }
    val all = walk(dir, 0, Seq.empty).map { values =>
      InternalRow.fromSeq(values.zipWithIndex.map { case (v, i) =>
        castPartitionValue(v, ps(i).dataType)
      })
    }
    val filtered = all.filter { row =>
      names.zipWithIndex.forall { case (n, i) =>
        val fieldIdx = ps.fieldIndex(n)
        row.get(fieldIdx, ps(fieldIdx).dataType) == id.get(i, ps(fieldIdx).dataType)
      }
    }
    filtered.toArray
  }

  private def castPartitionValue(s: String, dt: org.apache.spark.sql.types.DataType): Any =
    dt match {
      case org.apache.spark.sql.types.StringType => UTF8String.fromString(s)
      case org.apache.spark.sql.types.IntegerType => s.toInt
      case org.apache.spark.sql.types.LongType => s.toLong
      case other => sys.error(s"unsupported partition column type $other")
    }
}
