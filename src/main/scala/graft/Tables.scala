package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's catalog-owned fixed schemas (no inference):
  * `spark-connector/.../OdpsTableCatalog.scala:523-531` loads schemas from
  * table meta; here the parquet footer is the meta. Each table is one
  * parquet file per scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Conversion from whatever this Spark build inferred for the
    * TIMESTAMP(NANOS) `ts` column to a microsecond `TimestampType`,
    * keyed on the INFERRED type rather than a conf: parquet NANOS
    * inference has changed across Spark minor releases, so the three
    * observed representations are all accepted —
    *  - `LongType` raw nanos (the `spark.sql.legacy.parquet.nanosAsLong`
    *    path): integer-divide to micros (`div`, not `/` — double division
    *    would lose precision above 2^53);
    *  - `TimestampNTZType` (native NANOS inference, micros-truncated):
    *    cast reinterprets the wall-clock in the session zone (UTC
    *    everywhere here), preserving the instant;
    *  - `TimestampType`: already converted.
    * The generator emits µs-precision values, so every path is lossless. */
  def eventTs(inferred: DataType, tsCol: String = "ts"): Column =
    inferred match {
      case LongType => expr(s"timestamp_micros(`$tsCol` div 1000)")
      case TimestampNTZType => col(tsCol).cast(TimestampType)
      case TimestampType => col(tsCol)
      case other =>
        // Fail fast: this function exists BECAUSE the inference drifted
        // once — a fourth representation must surface loudly, not flow
        // downstream as silently-wrong event times.
        throw new IllegalArgumentException(
          s"unrecognized inferred type for TIMESTAMP(NANOS) column " +
            s"`$tsCol`: $other — extend Tables.eventTs for this build")
    }

  /** `events.ts` is parquet TIMESTAMP(NANOS); normalize to a microsecond
    * `TimestampType` whatever the reader inferred (see [[eventTs]]). The
    * legacy conf is still set for older builds where NANOS is otherwise
    * unreadable; newer builds ignore it and infer TIMESTAMP_NTZ. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.withColumn("ts", eventTs(raw.schema("ts").dataType))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
