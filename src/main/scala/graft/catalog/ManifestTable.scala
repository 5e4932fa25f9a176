package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{Cast, GenericInternalRow, Literal}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex, PartitionPath, PartitionSpec}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{Fs, ManifestCommit}

/** Catalog table whose storage is a [[graft.sources.ManifestCommit]]
  * manifest-pointer layout: immutable `_gen/g=N` generations plus one
  * `_pointer/pN.txt` whose PUT is the commit. The catalog surface this
  * class adds over the library calls:
  *
  *   - `SELECT ... FROM cat.ns.t` reads the LATEST pointer — the scan's
  *     file list comes from the pointer map, never from directory
  *     listing, so uncommitted/retired generations are invisible
  *     (the catalog-first resolution the reference gives every table,
  *     `spark-connector/.../OdpsTableCatalog.scala:80-110`);
  *   - `SELECT ... FROM cat.ns.t VERSION AS OF p` time-travels to
  *     retained pointer `p` ([[GraftCatalog.loadTable(ident,version)]]);
  *   - `SELECT ... FROM cat.ns.t TIMESTAMP AS OF ts` resolves the last
  *     pointer committed at-or-before `ts` by pointer-file mtime;
  *   - `SELECT ... FROM cat.ns.t.history` lists retained pointers
  *     (pointer-file metadata only — a [[LocalScan]], no data read);
  *   - `INSERT INTO` / `INSERT OVERWRITE [PARTITION (...)]` commit via
  *     [[ManifestCommit.writePartitioned]]: generation write + ONE
  *     pointer PUT, atomic on object stores.
  *
  * A pinned snapshot (`pointerId` defined) is immutable: it advertises
  * no write capability and its scan verifies every cited generation
  * still exists (vacuumed history fails loudly, like
  * [[ManifestCommit.readAt]]).
  *
  * The scan itself is the SAME pruned/pushdown/vectorized parquet path
  * as [[GraftTable]] ([[org.apache.spark.sql.graft.GraftScanBuilder]]):
  * the pointer map becomes an explicit `PartitionSpec` (one
  * `PartitionPath` per live (partition, generation) pair), so Catalyst
  * partition-prunes version-pinned reads exactly like current ones. */
class GraftManifestTable(ident: Identifier, dir: HPath, meta: TableMeta,
    spark: SparkSession, pointerId: Option[Long] = None,
    asOfTimestampMicros: Option[Long] = None)
  extends Table with SupportsRead with SupportsWrite {

  import GraftManifestTable._

  override def name(): String = ident.toString +
    pointerId.map(p => s" VERSION AS OF $p").getOrElse("")
  /** Table directory (the manifest root holding `_gen` + `_pointer`). */
  def location: String = dir.toString
  override def schema(): StructType = meta.schema
  override def partitioning(): Array[Transform] =
    meta.partitionCols.map(Expressions.identity).toArray
  override def properties(): java.util.Map[String, String] =
    (meta.properties + (CommitModeKey -> "manifest")).asJava

  override def capabilities(): java.util.Set[TableCapability] = {
    // pinned snapshots and external manifest locations are read-only;
    // a live managed manifest table takes the same INSERT surface as
    // GraftTable's partitioned path (V1 staged writer → here, the
    // generation+pointer commit)
    if (pointerId.isDefined || asOfTimestampMicros.isDefined || meta.isExternal)
      java.util.Collections.singleton(TableCapability.BATCH_READ)
    else
      Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER,
        TableCapability.OVERWRITE_DYNAMIC).asJava
  }

  private def resolvedPointer: (Long, Map[String, Seq[Long]]) = {
    val path = dir.toString
    (pointerId, asOfTimestampMicros) match {
      case (Some(p), _) =>
        val map = ManifestCommit.pointerAt(path, p).getOrElse(
          throw new IllegalStateException(
            s"${ident} has no retained pointer p$p — never committed, " +
              "or vacuumed past the retention window"))
        (p, map)
      case (None, Some(micros)) =>
        val p = ManifestCommit.pointerAsOfTime(path, micros / 1000L)
          .getOrElse(throw new IllegalStateException(
            s"$ident has no pointer committed at or before " +
              s"timestamp ${micros / 1000L} ms"))
        (p, ManifestCommit.pointerAt(path, p).get)
      case (None, None) =>
        ManifestCommit.latestPointer(path).getOrElse(
          (-1L, Map.empty[String, Seq[Long]]))
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val (resolvedId, map) = resolvedPointer
    val partSchema = meta.partitionSchema
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    val leaves: Seq[PartitionPath] = map.toSeq.sortBy(_._1).flatMap {
      case (rel, gens) =>
        val row = partitionRow(rel, partSchema, zone)
        gens.map { g =>
          val leaf = new HPath(s"$dir/_gen/g=$g/$rel")
          // a time-travel read across a vacuumed horizon must fail, not
          // silently return the partitions that survived
          if (pointerId.isDefined || asOfTimestampMicros.isDefined)
            require(Fs.exists(leaf),
              s"pointer p$resolvedId of $ident cites vacuumed generation " +
                s"g=$g — raise vacuum keepPointers for deeper time travel")
          PartitionPath(row, Fs.of(leaf).makeQualified(leaf))
        }
    }
    val fileIndex = new InMemoryFileIndex(spark,
      leaves.map(_.path), Map.empty[String, String], Some(meta.dataSchema),
      FileStatusCache.getOrCreate(spark),
      userSpecifiedPartitionSpec = Some(PartitionSpec(partSchema, leaves)))
    new org.apache.spark.sql.graft.GraftScanBuilder(
      spark, fileIndex, meta.schema, meta.dataSchema,
      new CaseInsensitiveStringMap(Map("path" -> dir.toString).asJava),
      () => None)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (pointerId.isDefined || asOfTimestampMicros.isDefined)
      throw new UnsupportedOperationException(
        s"${name()} is an immutable snapshot — write to the live table")
    if (meta.isExternal)
      throw new UnsupportedOperationException(
        s"${name()} is an external table — writes through the catalog " +
          "are rejected; commit to its location with ManifestCommit")
    import org.apache.spark.sql.connector.write.{SupportsDynamicOverwrite, SupportsOverwrite, V1Write, WriteBuilder => WB}
    import org.apache.spark.sql.sources.{AlwaysTrue, EqualNullSafe => FEqNs, EqualTo => FEq}
    new WB with SupportsOverwrite with SupportsDynamicOverwrite {
      // None+!dynamic = append; Some(Nil) = full truncate (static INSERT
      // OVERWRITE); Some(spec) = partition-prefix truncate; dynamic =
      // replace exactly the staged partitions — the same four modes as
      // GraftTable's staged writer, mapped onto one pointer commit each
      private var truncateSpec: Option[Seq[(String, String)]] = None
      private var dynamic = false
      override def overwriteDynamicPartitions(): WB = { dynamic = true; this }
      override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter]): WB = {
        val dynamicMode = SparkSession.active.conf
          .get("spark.sql.sources.partitionOverwriteMode", "static")
          .equalsIgnoreCase("dynamic")
        filters match {
          case Array(_: AlwaysTrue) | Array() if dynamicMode => dynamic = true
          case Array(_: AlwaysTrue) | Array() => truncateSpec = Some(Nil)
          case fs =>
            val eqs = fs.map {
              case FEq(attr, v) => attr -> String.valueOf(v)
              case FEqNs(attr, v) => attr -> String.valueOf(v)
              case other => sys.error(s"unsupported overwrite filter $other " +
                "(static partition specs only)")
            }.toMap
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
              ManifestCommit.writePartitioned(
                data, dir.toString, meta.partitionCols,
                overwrite = dynamic || truncateSpec.isDefined || ow,
                truncateSpec = spec)
            }
          }
      }
    }
  }
}

object GraftManifestTable {
  /** Table property selecting the manifest-pointer commit protocol
    * (`'graft.commit.mode' = 'manifest'` at CREATE TABLE). */
  val CommitModeKey = "graft.commit.mode"

  /** `col=value/...` rel path → typed partition-values row, the same
    * unescape + cast Spark's own partition discovery applies. */
  private[catalog] def partitionRow(rel: String, partSchema: StructType,
      zone: String): InternalRow = {
    val segs = rel.split("/").toSeq
    require(segs.length == partSchema.length,
      s"partition path '$rel' does not match declared partition columns " +
        partSchema.fieldNames.mkString(","))
    val values = segs.zip(partSchema.fields).map { case (seg, f) =>
      val eq = seg.indexOf('=')
      require(eq > 0 && seg.take(eq) == f.name,
        s"partition path segment '$seg' does not bind column ${f.name}")
      val raw = ExternalCatalogUtils.unescapePathName(seg.drop(eq + 1))
      if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
      else Cast(Literal(UTF8String.fromString(raw), StringType),
        f.dataType, Option(zone)).eval(null)
    }
    new GenericInternalRow(values.toArray)
  }
}

/** `cat.ns.t.history` — the commit log of a manifest-pointer table as a
  * read-only metadata table: one row per retained pointer, from
  * pointer-file metadata only (a [[LocalScan]]; planning never touches
  * data files). Columns: pointer_id, committed_at (pointer-file mtime),
  * partitions, generations, is_latest. */
class GraftManifestHistoryTable(ident: Identifier, dir: HPath)
  extends Table with SupportsRead {

  override def name(): String = ident.toString
  override def schema(): StructType = GraftManifestHistoryTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = GraftManifestHistoryTable.Schema
        override def rows(): Array[InternalRow] = {
          val path = dir.toString
          val ids = ManifestCommit.pointerIds(path).sorted
          val latest = if (ids.isEmpty) -1L else ids.max
          ids.map { id =>
            val map = ManifestCommit.pointerAt(path, id).getOrElse(Map.empty)
            val p = new HPath(s"$path/_pointer/p$id.txt")
            val mtimeMicros =
              Fs.of(p).getFileStatus(p).getModificationTime * 1000L
            new GenericInternalRow(Array[Any](id, mtimeMicros,
              map.size.toLong,
              map.values.flatten.toSeq.distinct.size.toLong,
              id == latest)): InternalRow
          }.toArray
        }
        override def description(): String = s"GraftManifestHistory ${ident}"
      }
    }
}

object GraftManifestHistoryTable {
  val Schema: StructType = new StructType()
    .add("pointer_id", LongType, nullable = false)
    .add("committed_at", TimestampType, nullable = false)
    .add("partitions", LongType, nullable = false)
    .add("generations", LongType, nullable = false)
    .add("is_latest", BooleanType, nullable = false)
}
