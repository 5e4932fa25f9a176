package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical external↔Spark type mapping — the reference's type system
  * (`spark-connector/common/.../OdpsUtils.scala:248-286`, SURVEY §1.2)
  * re-expressed as a pure, unit-testable module:
  *
  *  - DECIMAL without precision → DecimalType(38,18)
  *    (`OdpsUtils.scala:212-213,257`)
  *  - legacy DECIMAL(54,18) → (38,18) remap on read (`OdpsUtils.scala:55-62`)
  *  - CHAR(n)/VARCHAR(n) → StringType, char right-trimmed on read
  *    (`OdpsUtils.scala:67-70`), varchar length-checked on write
  *    (`OdpsUtils.scala:144-151`)
  *  - DATETIME → millisecond timestamps, TIMESTAMP → microsecond
  *    (`OdpsScan.scala:130-132`); both surface as TimestampType with the
  *    precision recorded in metadata
  */
object TypeMapping {

  val DefaultDecimal: DecimalType = DecimalType(38, 18)

  /** Metadata key carrying the external type name through StructField. */
  val ExternalTypeKey = "graft.external.type"

  private val DecimalRe = "(?i)decimal\\s*\\((\\d+)\\s*,\\s*(\\d+)\\)".r
  private val CharRe = "(?i)(char|varchar)\\s*\\((\\d+)\\)".r
  private val ArrayRe = "(?i)array\\s*<(.+)>".r
  private val MapRe = "(?i)map\\s*<(.+)>".r
  private val StructRe = "(?i)struct\\s*<(.+)>".r

  /** External type name → Spark DataType (the §1.2 table). */
  def toSparkType(external: String): DataType = external.trim match {
    case t if t.equalsIgnoreCase("tinyint") => ByteType
    case t if t.equalsIgnoreCase("smallint") => ShortType
    case t if t.equalsIgnoreCase("int") => IntegerType
    case t if t.equalsIgnoreCase("bigint") => LongType
    case t if t.equalsIgnoreCase("float") => FloatType
    case t if t.equalsIgnoreCase("double") => DoubleType
    case t if t.equalsIgnoreCase("boolean") => BooleanType
    case t if t.equalsIgnoreCase("string") => StringType
    case t if t.equalsIgnoreCase("binary") => BinaryType
    case t if t.equalsIgnoreCase("date") => DateType
    case t if t.equalsIgnoreCase("datetime") => TimestampType // milli precision
    case t if t.equalsIgnoreCase("timestamp") => TimestampType // micro precision
    case t if t.equalsIgnoreCase("timestamp_ntz") => TimestampNTZType
    case t if t.equalsIgnoreCase("json") => StringType // external flag via jsonField
    case t if t.equalsIgnoreCase("decimal") => DefaultDecimal
    case DecimalRe(p, s) =>
      val (pi, si) = (p.toInt, s.toInt)
      // legacy (54,18) remap; cap at Spark's max precision — and cap the
      // scale alongside (scale > capped precision crashes the constructor)
      val cp = math.min(pi, DecimalType.MAX_PRECISION)
      DecimalType(cp, math.min(si, cp))
    case CharRe(_, _) => StringType
    case ArrayRe(inner) => ArrayType(toSparkType(inner))
    case MapRe(inner) =>
      val (k, v) = splitTopLevel(inner)
      MapType(toSparkType(k), toSparkType(v))
    case StructRe(inner) =>
      StructType(splitFields(inner).map { case (n, t) => StructField(n, toSparkType(t)) })
    case other => sys.error(s"unsupported external type: $other")
  }

  /** Spark DataType → canonical external type name (inverse direction). */
  def toExternalType(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case StringType => "STRING"
    case BinaryType => "BINARY"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case TimestampNTZType => "TIMESTAMP_NTZ"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case a: ArrayType => s"ARRAY<${toExternalType(a.elementType)}>"
    case m: MapType => s"MAP<${toExternalType(m.keyType)},${toExternalType(m.valueType)}>"
    case s: StructType =>
      s.fields.map(f => s"${f.name}:${toExternalType(f.dataType)}")
        .mkString("STRUCT<", ",", ">")
    case other => sys.error(s"unsupported spark type: $other")
  }

  /** Migration risk report for an external schema — the Hive→MaxCompute
    * type transformer's "risk" annotations
    * (`odps-data-carrier/meta-processor/.../HiveTypeTransformer.java:79-187`)
    * as data: for each column, the mapped Spark type plus a lossiness
    * warning where the conversion narrows semantics. */
  def migrationRisks(columns: Seq[(String, String)]): Seq[(String, DataType, Option[String])] =
    columns.map { case (name, ext) =>
      val dt = toSparkType(ext)
      val risk = ext.trim.toLowerCase match {
        case t if t.startsWith("char") || t.startsWith("varchar") =>
          Some(s"$ext → STRING: length constraint enforced only on write (varcharWriteValue)")
        case DecimalRe(p, _) if p.toInt > DecimalType.MAX_PRECISION =>
          Some(s"$ext → ${toExternalType(dt)}: precision capped at ${DecimalType.MAX_PRECISION}")
        case "datetime" =>
          Some("DATETIME → TIMESTAMP: millisecond precision widened to microsecond")
        case _ => None
      }
      (name, dt, risk)
    }

  /** JSON external type surfaces as StringType tagged in field metadata —
    * the Trino connector's JSON↔varchar mapping
    * (`trino-connector/.../TypeConvertUtils.java:97-110`); the tag is what
    * lets a schema round-trip preserve JSON-ness that StringType alone
    * would erase. */
  def jsonField(name: String, nullable: Boolean = true): StructField =
    StructField(name, StringType, nullable,
      new MetadataBuilder().putString(ExternalTypeKey, "JSON").build())

  /** External type of a field: the metadata tag when present (JSON,
    * DATETIME precision markers), else derived from the Spark type. */
  def externalTypeOf(f: StructField): String =
    if (f.metadata.contains(ExternalTypeKey)) f.metadata.getString(ExternalTypeKey)
    else toExternalType(f.dataType)

  /** CHAR(n) read semantics: right-trim padding (`OdpsUtils.scala:67-70`). */
  def charReadValue(c: Column): Column = rtrim(c)

  /** VARCHAR(n) write guard: fail the row if over-length (strict), or
    * truncate (lenient) — `OdpsUtils.scala:144-151`. */
  def varcharWriteValue(c: Column, n: Int, truncate: Boolean = false): Column =
    if (truncate) substring(c, 1, n)
    else when(length(c) <= n, c)
      .otherwise(raise_error(concat(lit(s"varchar($n) overflow: "), c)))

  // -- helpers for nested type-name parsing (top-level comma split) --

  // Depth counts both <> (nested types) and () (decimal precision) — a
  // comma inside DECIMAL(p,s) is not a field separator.
  private def splitTopLevel(s: String): (String, String) = {
    var depth = 0
    s.zipWithIndex.foreach { case (ch, i) =>
      ch match {
        case '<' | '(' => depth += 1
        case '>' | ')' => depth -= 1
        case ',' if depth == 0 => return (s.substring(0, i), s.substring(i + 1))
        case _ =>
      }
    }
    sys.error(s"expected top-level comma in: $s")
  }

  private def splitFields(s: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var depth = 0
    var start = 0
    def push(part: String): Unit = {
      val i = part.indexOf(':')
      require(i > 0, s"expected name:type in struct field: $part")
      out += ((part.substring(0, i).trim, part.substring(i + 1).trim))
    }
    s.zipWithIndex.foreach { case (ch, i) =>
      ch match {
        case '<' | '(' => depth += 1
        case '>' | ')' => depth -= 1
        case ',' if depth == 0 => push(s.substring(start, i)); start = i + 1
        case _ =>
      }
    }
    push(s.substring(start))
    out.toSeq
  }
}
