package graft.catalog

import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Fs

/** A Spark `TableCatalog` over a filesystem metastore: namespaces are
  * directories, tables are directories of partitioned parquet plus a
  * `_graft_meta.json` holding the catalog-owned schema (data + partition
  * columns split, like `OdpsTable`'s dataSchema/partitionSchema —
  * `spark-connector/.../OdpsTable.scala:81-97`). Scan and write delegate to
  * Spark's built-in Parquet DSv2, so partition pruning, filter pushdown and
  * vectorized read are the stock Catalyst paths (SURVEY §3.1 "our engine"
  * note) — the catalog contributes metadata semantics only:
  * create/alter/drop/rename, namespace listing
  * (`OdpsTableCatalog.scala:457-509`), and explicit partition management
  * (`OdpsTableCatalog.scala:402-425`).
  *
  * All file operations go through the Hadoop `FileSystem` API ([[Fs]]), so
  * `root` may live on local disk, HDFS, or an object store.
  *
  * Register with:
  * {{{
  *   spark.sql.catalog.graft      = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.root = /path/to/warehouse
  * }}}
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: HPath = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = new HPath(Option(options.get("root"))
      .getOrElse(sys.error(s"catalog $name needs option 'root'")))
    Fs.mkdirs(root)
  }

  override def name(): String = catalogName

  private def nsPath(ns: Array[String]): HPath =
    ns.foldLeft(root)(new HPath(_, _))
  private def tablePath(ident: Identifier): HPath =
    new HPath(nsPath(ident.namespace()), ident.name())
  private def metaFile(dir: HPath): HPath = new HPath(dir, "_graft_meta.json")

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] =
    Fs.listDirs(root).map(p => Array(p.getName)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    Fs.isDir(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    Fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!Fs.isDir(p)) false
    else {
      if (!cascade && !Fs.isEmptyDir(p))
        sys.error(s"namespace ${namespace.mkString(".")} is not empty")
      Fs.delete(p)
      true
    }
  }

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Fs.listDirs(nsPath(namespace))
      .filter(p => Fs.exists(metaFile(p)))
      .map(p => Identifier.of(namespace, p.getName)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    Fs.exists(metaFile(tablePath(ident)))

  override def loadTable(ident: Identifier): Table = {
    val dir = tablePath(ident)
    if (!Fs.exists(metaFile(dir))) throw new NoSuchTableException(ident)
    val meta = TableMeta.read(metaFile(dir))
    // initialize() may have run without an active session; every query
    // path goes through loadTable, so (re-)install the write strategy here
    graft.plans.GraftStrategies.install(SparkSession.active)
    new GraftTable(ident, dir, meta, SparkSession.active)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (!namespaceExists(ident.namespace())) throw new NoSuchNamespaceException(ident.namespace())
    var bucketProps = Map.empty[String, String]
    val partitionCols = partitions.flatMap { t =>
      t.name() match {
        case "identity" => Some(t.references()(0).fieldNames().mkString("."))
        case "bucket" =>
          // bucket(n, cols...) → hash-clustered table (OdpsBucketSpec hash
          // variant, `OdpsTable.scala:46-79`); recorded as properties, the
          // write path enforces distribution+ordering.
          val n = t.arguments().collectFirst {
            case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
              lit.value().toString.toInt
          }.getOrElse(sys.error("bucket transform needs a bucket count"))
          val cols = t.references().map(_.fieldNames().mkString("."))
          bucketProps = Map(
            GraftTable.BucketColsKey -> cols.mkString(","),
            GraftTable.BucketCountKey -> n.toString)
          None
        case other => sys.error(s"unsupported partition transform: $other " +
          "(identity and bucket only, like the reference's partition/cluster specs)")
      }
    }
    val dir = tablePath(ident)
    Fs.mkdirs(dir)
    TableMeta(schema, partitionCols.toSeq, properties.asScala.toMap ++ bucketProps)
      .write(metaFile(dir))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tablePath(ident)
    if (!Fs.exists(metaFile(dir))) throw new NoSuchTableException(ident)
    var meta = TableMeta.read(metaFile(dir))
    changes.foreach {
      case p: TableChange.SetProperty =>
        meta = meta.copy(properties = meta.properties + (p.property() -> p.value()))
      case p: TableChange.RemoveProperty =>
        meta = meta.copy(properties = meta.properties - p.property())
      case a: TableChange.AddColumn =>
        val f = StructField(a.fieldNames().mkString("."), a.dataType(), a.isNullable)
        meta = meta.copy(schema = StructType(meta.schema.fields :+ f))
      case r: TableChange.RenameColumn =>
        val from = r.fieldNames().mkString(".")
        require(!meta.partitionCols.contains(from),
          s"cannot rename partition column $from")
        // metadata-only rename over existing parquet (resolved by name)
        // would silently read the renamed column as NULL — require rewrite
        require(!hasDataFiles(dir),
          s"RENAME COLUMN requires a table rewrite on non-empty tables")
        meta = meta.copy(schema = StructType(meta.schema.fields.map(f =>
          if (f.name == from) f.copy(name = r.newName()) else f)))
      case d: TableChange.DeleteColumn =>
        val name = d.fieldNames().mkString(".")
        require(!meta.partitionCols.contains(name),
          s"cannot drop partition column $name")
        require(meta.schema.fieldNames.contains(name), s"no such column $name")
        // dropping then re-adding over existing files would resurrect data
        require(!hasDataFiles(dir),
          s"DROP COLUMN requires a table rewrite on non-empty tables")
        meta = meta.copy(schema =
          StructType(meta.schema.fields.filterNot(_.name == name)))
      case c => throw new UnsupportedOperationException(s"alterTable: $c")
    }
    meta.write(metaFile(dir))
    loadTable(ident)
  }

  /** Any data under the table dir: partition dirs or bare parquet files. */
  private def hasDataFiles(dir: HPath): Boolean =
    Fs.of(dir).listStatus(dir).exists(s =>
      (s.isFile && s.getPath.getName.endsWith(".parquet")) ||
        (s.isDirectory && s.getPath.getName.contains("=")))

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tablePath(ident)
    if (!Fs.exists(metaFile(dir))) false
    else { Fs.delete(dir); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    // Hadoop rename reports failure as false, not an exception
    if (!Fs.rename(tablePath(oldIdent), tablePath(newIdent)))
      sys.error(s"rename failed: ${tablePath(oldIdent)} -> ${tablePath(newIdent)} " +
        "(does the target namespace exist?)")
  }
}

/** Catalog-aware scalar helpers. */
object CatalogFunctions {

  /** `max_pt(table)` — the latest partition value of a partitioned catalog
    * table, resolved from the PARTITION LISTING (no data scan), exactly the
    * reference's MaxPtUDF
    * (`spark-connector/common/src/main/java/org/apache/spark/sql/odps/udf/MaxPtUDF.java:30-41`). */
  def maxPt(spark: SparkSession, catalogName: String, namespace: Array[String],
      table: String): Option[String] = {
    val cat = org.apache.spark.sql.graft.Catalogs.plugin(spark, catalogName)
      .asInstanceOf[TableCatalog]
    cat.loadTable(Identifier.of(namespace, table)) match {
      case pm: SupportsPartitionManagement =>
        val ps = pm.partitionSchema()
        require(ps.nonEmpty, s"$table is not partitioned")
        val vals = pm.listPartitionIdentifiers(Array.empty, InternalRow.empty)
          .map(r => r.get(0, ps(0).dataType).toString)
        if (vals.isEmpty) None else Some(vals.max)
      case _ => sys.error(s"$table does not support partition management")
    }
  }
}

/** Catalog-owned table metadata: full schema + ordered partition columns —
  * the dataSchema/partitionSchema split is derived (`OdpsTable.scala:97`
  * builds full = data ++ partition; we store full and the partition names).
  * Hand-rolled JSON via Spark's DataType json codec (no extra deps). */
final case class TableMeta(schema: StructType, partitionCols: Seq[String],
    properties: Map[String, String]) {

  def dataSchema: StructType =
    StructType(schema.filterNot(f => partitionCols.contains(f.name)))
  def partitionSchema: StructType =
    StructType(partitionCols.map(c => schema(c)))

  def write(file: HPath): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val props = properties.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val json =
      s"""{"schemaJson": ${q(schema.json)},
         | "partitionCols": [${partitionCols.map(q).mkString(",")}],
         | "properties": $props}""".stripMargin
    Fs.writeString(file, json)
  }
}

object TableMeta {
  def read(file: HPath): TableMeta = {
    val json = Fs.readString(file)
    // Minimal JSON extraction (we wrote it; fields are in fixed order).
    def field(name: String): String = {
      val i = json.indexOf("\"" + name + "\"")
      require(i >= 0, s"missing $name in $file")
      json.substring(i)
    }
    def str(tail: String): String = {
      val sb = new StringBuilder
      var i = tail.indexOf(':')
      while (tail(i) != '"') i += 1
      i += 1
      while (tail(i) != '"') {
        if (tail(i) == '\\') { sb.append(tail(i + 1)); i += 2 }
        else { sb.append(tail(i)); i += 1 }
      }
      sb.toString
    }
    val schema = DataType.fromJson(str(field("schemaJson"))).asInstanceOf[StructType]
    val colsRaw = field("partitionCols")
    val cols = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(colsRaw.substring(colsRaw.indexOf('['), colsRaw.indexOf(']') + 1))
      .map(_.group(1)).toSeq
    val propsRaw = field("properties")
    val propsBody = propsRaw.substring(propsRaw.indexOf('{'), propsRaw.lastIndexOf('}') + 1)
    val props = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(propsBody).map(m => m.group(1) -> m.group(2)).toMap
    TableMeta(schema, cols, props)
  }
}
