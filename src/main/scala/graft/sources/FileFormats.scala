package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format ingest/egest — the Sqoop mapper formats
  * (`odps-sqoop/src/java/org/apache/sqoop/mapreduce/{AvroImportMapper,
  * ParquetImportMapper,RawKeyTextOutputFormat}.java`) and the Flume text
  * serializers (flume-plugin serializer package) on Spark's built-in
  * sources. The per-record Java parse loops become declarative read
  * options / column expressions (codegen'd).
  */
object FileFormats {

  /** Sqoop-style delimited text import: explicit schema (catalog-owned, no
    * inference in production paths), custom delimiter, null substitute and
    * per-column date format — `OdpsRecordBuilder.java:43-87` semantics. */
  def readDelimited(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", nullValue: String = "null",
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", delimiter)
      .option("nullValue", nullValue)
      .option("timestampFormat", timestampFormat)
      .option("mode", "PERMISSIVE") // dirty rows → nulls, pipeline continues
      .csv(path)

  def writeDelimited(df: DataFrame, path: String, delimiter: String = ",",
      nullValue: String = "null"): Unit =
    df.write.mode("overwrite")
      .option("sep", delimiter)
      .option("nullValue", nullValue)
      .csv(path)

  /** JSON-lines ingest with fixed schema (JsonTextSerializer semantics:
    * named fields onto catalog columns). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Raw text lines + a parse expression — the Flume regex/delimiter
    * serializer shape: one string column in, typed columns out. */
  def readTextParsed(spark: SparkSession, path: String,
      parse: Column => Seq[Column]): DataFrame = {
    val lines = spark.read.text(path)
    lines.select(parse(col("value")): _*)
  }

  /** Delimited-line parser for [[readTextParsed]]: positional fields by
    * split (DelimitedTextSerializer.java:63-92). */
  def delimitedParser(delimiter: String, names: Seq[String]): Column => Seq[Column] =
    line => names.zipWithIndex.map { case (n, i) =>
      split(line, java.util.regex.Pattern.quote(delimiter)).getItem(i).as(n)
    }
}
