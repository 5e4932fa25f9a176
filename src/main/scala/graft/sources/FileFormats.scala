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

  // ---- SequenceFile / raw-key text (RawKeyTextOutputFormat.java,
  //      Sqoop --as-sequencefile surface) ----

  /** Keyed SequenceFile egest: (key, value) Text pairs, one container per
    * task, block-compressed-capable and splittable on re-read. */
  def writeKeyedSequenceFile(df: DataFrame, path: String,
      keyCol: String, valueCol: String): Unit = {
    import org.apache.hadoop.io.Text
    import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat
    val ki = df.schema.fieldIndex(keyCol)
    val vi = df.schema.fieldIndex(valueCol)
    df.rdd.mapPartitions(_.map { r =>
        // Text has no null notion and String.valueOf(null) writes the
        // literal string "null" — indistinguishable from real data on
        // re-read. Refuse instead; callers coalesce/filter first.
        require(!r.isNullAt(ki) && !r.isNullAt(vi),
          s"SequenceFile cannot represent NULL $keyCol/$valueCol — " +
            "coalesce or filter null rows before export")
        (new Text(String.valueOf(r.get(ki))), new Text(String.valueOf(r.get(vi))))
      })
      .saveAsNewAPIHadoopFile(path, classOf[Text], classOf[Text],
        classOf[SequenceFileOutputFormat[Text, Text]])
  }

  /** Keyed SequenceFile ingest → (key string, value string) DataFrame;
    * splits parallelize across the container blocks. */
  def readKeyedSequenceFile(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.Text
    import org.apache.hadoop.mapreduce.lib.input.SequenceFileInputFormat
    import org.apache.spark.sql.Row
    val rows = spark.sparkContext.newAPIHadoopFile(
        path, classOf[SequenceFileInputFormat[Text, Text]],
        classOf[Text], classOf[Text])
      // copy out of the reader's reused Writable buffers before advancing
      .map { case (k, v) => Row(k.toString, v.toString) }
    spark.createDataFrame(rows, StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType, nullable = false))))
  }

  /** RawKeyTextOutputFormat semantics (`RawKeyTextOutputFormat.java`: key
    * bytes + newline, value ignored): one string column out through the
    * codegen'd text writer. */
  def writeRawKeyText(df: DataFrame, path: String, keyCol: String): Unit =
    df.select(col(keyCol).cast("string").as("value"))
      .write.mode("overwrite").text(path)

  // ---- Avro container files (AvroImportMapper.java / AvroExportMapper) ----
  //
  // Implemented over the Hadoop AvroKey{Input,Output}Format from avro-mapred
  // (the exact machinery Sqoop's Avro mappers drive): reads are SPLITTABLE
  // on the container sync markers, so a 100 TB avro directory parallelizes
  // like parquet; writes stream one container file per task with no
  // driver-side materialization. Supported types: the Sqoop import surface —
  // boolean/int/long/float/double/string plus the typed columns Sqoop maps
  // through Avro logical types (decimal → bytes/decimal, date → int/date,
  // timestamp → long/timestamp-micros, and bytes for raw payloads;
  // `AvroImportMapper.java`, `testdata/DatatypeTestData-import-lite.txt`) —
  // nullable via union(null, T).

  /** Spark schema → Avro record schema JSON (computed on the driver, shipped
    * as a string — avro Schema itself is not serializable). */
  private[sources] def avroSchemaJson(schema: StructType, name: String): String = {
    import org.apache.spark.sql.types._
    def base(dt: DataType): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType | ShortType | ByteType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case d: DecimalType =>
        s"""{"type": "bytes", "logicalType": "decimal", "precision": ${d.precision}, "scale": ${d.scale}}"""
      case DateType => """{"type": "int", "logicalType": "date"}"""
      case TimestampType => """{"type": "long", "logicalType": "timestamp-micros"}"""
      case TimestampNTZType => """{"type": "long", "logicalType": "local-timestamp-micros"}"""
      case other => sys.error(s"avro egest: unsupported type $other " +
        "(Sqoop avro surface is primitive and logical-typed scalar columns)")
    }
    val fields = schema.fields.map { f =>
      // a null default is only legal on union-with-null types — Avro 1.12
      // validates defaults at parse time
      if (f.nullable)
        s"""{"name": "${f.name}", "type": ["null", ${base(f.dataType)}], "default": null}"""
      else
        s"""{"name": "${f.name}", "type": ${base(f.dataType)}}"""
    }.mkString(",")
    s"""{"type": "record", "name": "$name", "fields": [$fields]}"""
  }

  /** Per-field Spark-value → Avro-datum converter (serializable: built from
    * the DataType inside the task). Logical types follow the Avro spec:
    * decimal = two's-complement unscaled bytes at the DECLARED scale, date =
    * epoch days int, timestamp-micros = epoch micros long. */
  private def sparkToAvro(dt: org.apache.spark.sql.types.DataType): Any => Any = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType => v => v.asInstanceOf[Byte].toInt
      case ShortType => v => v.asInstanceOf[Short].toInt
      case BinaryType => v => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case d: DecimalType => v => {
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
        java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      }
      case DateType => {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case d: java.time.LocalDate => d.toEpochDay.toInt // java8API mode
      }
      case TimestampType => {
        case t: java.sql.Timestamp =>
          val i = t.toInstant
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        case t: java.time.Instant =>
          t.getEpochSecond * 1000000L + t.getNano / 1000L
      }
      case TimestampNTZType => v => {
        val t = v.asInstanceOf[java.time.LocalDateTime]
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
      }
      case _ => identity
    }
  }

  /** Per-field Avro-datum → Spark-value converter (inverse of
    * [[sparkToAvro]]); copies out of the reader's reused buffers. */
  private def avroToSpark(dt: org.apache.spark.sql.types.DataType): Any => Any = {
    import org.apache.spark.sql.types._
    def bytesOf(v: Any): Array[Byte] = {
      val buf = v.asInstanceOf[java.nio.ByteBuffer]
      val out = new Array[Byte](buf.remaining())
      buf.duplicate().get(out)
      out
    }
    dt match {
      case ByteType => v => v.asInstanceOf[java.lang.Integer].byteValue()
      case ShortType => v => v.asInstanceOf[java.lang.Integer].shortValue()
      case StringType => v => v.toString // Utf8 → String
      case BinaryType => v => bytesOf(v)
      case d: DecimalType => v =>
        new java.math.BigDecimal(new java.math.BigInteger(bytesOf(v)), d.scale)
      case DateType => v =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].longValue()))
      case TimestampType => v => {
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
      }
      case TimestampNTZType => v => {
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      }
      case _ => identity
    }
  }

  def writeAvro(df: DataFrame, path: String): Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericRecord}
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyOutputFormat}
    import org.apache.hadoop.io.NullWritable
    import org.apache.hadoop.mapreduce.Job

    val schema = df.schema
    val json = avroSchemaJson(schema, "graft_record")
    val job = Job.getInstance(Fs.conf())
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(json))
    val n = schema.length
    val fieldTypes = schema.fields.map(_.dataType)
    df.rdd.mapPartitions { rows =>
      val avro = new Schema.Parser().parse(json)
      val convert = fieldTypes.map(sparkToAvro)
      rows.map { r =>
        val rec: GenericRecord = new GenericData.Record(avro)
        var i = 0
        while (i < n) {
          rec.put(i, if (r.isNullAt(i)) null else convert(i)(r.get(i)))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Avro → Spark schema from a container's embedded writer schema — the
    * Sqoop export path's contract (`AvroExportMapper` reads the writer
    * schema; the user never re-declares it). Supports the [[writeAvro]]
    * surface: records of primitives, bytes, and decimal/date/
    * timestamp-micros/local-timestamp-micros logical types, nullable via
    * union(null, T). Narrow ints (byte/short) widen to int on write and
    * stay int when inferred. */
  private[sources] def avroToStructType(schema: org.apache.avro.Schema): StructType = {
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    def dataType(s: ASchema): DataType = s.getType match {
      case ASchema.Type.BOOLEAN => BooleanType
      case ASchema.Type.INT => s.getLogicalType match {
        case _: LogicalTypes.Date => DateType
        case _ => IntegerType
      }
      case ASchema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros => TimestampType
        case _: LogicalTypes.LocalTimestampMicros => TimestampNTZType
        case _ => LongType
      }
      case ASchema.Type.FLOAT => FloatType
      case ASchema.Type.DOUBLE => DoubleType
      case ASchema.Type.STRING => StringType
      case ASchema.Type.BYTES => s.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
      case other => sys.error(s"avro ingest: unsupported type $other")
    }
    require(schema.getType == ASchema.Type.RECORD,
      s"avro ingest expects a record schema, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      f.schema().getType match {
        case ASchema.Type.UNION =>
          val nonNull = f.schema().getTypes.asScala
            .filter(_.getType != ASchema.Type.NULL)
          require(nonNull.size == 1,
            s"avro ingest: field ${f.name} is a non-nullable union")
          StructField(f.name, dataType(nonNull.head), nullable = true)
        case _ => StructField(f.name, dataType(f.schema()), nullable = false)
      }
    })
  }

  /** Read an Avro container directory inferring the Spark schema from the
    * first container's embedded writer schema (one footer-sized driver
    * read; the data scan stays splittable and distributed). */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    import org.apache.avro.file.DataFileStream
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = Fs.of(p)
    val first = fs.listStatus(p).filter(_.isFile)
      .map(_.getPath).find(_.getName.endsWith(".avro"))
      .getOrElse(sys.error(s"no .avro container files under $path"))
    val in = fs.open(first)
    val writerSchema =
      try {
        val stream = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        try stream.getSchema finally stream.close()
      } finally in.close()
    readAvro(spark, path, avroToStructType(writerSchema))
  }

  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.avro.generic.GenericRecord
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat}
    import org.apache.hadoop.io.NullWritable
    import org.apache.hadoop.mapreduce.Job
    import org.apache.spark.sql.Row

    val job = Job.getInstance(Fs.conf())
    AvroJob.setInputKeySchema(job,
      new org.apache.avro.Schema.Parser().parse(avroSchemaJson(schema, "graft_record")))
    val n = schema.length
    val fieldTypes = schema.fields.map(_.dataType)
    val rows = spark.sparkContext.newAPIHadoopFile(
        path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        job.getConfiguration)
      // convert before the iterator advances — the record reader reuses the
      // underlying datum object (Utf8/ByteBuffer buffers included)
      .mapPartitions { it =>
        val convert = fieldTypes.map(avroToSpark)
        it.map { case (k, _) =>
          val rec = k.datum()
          Row.fromSeq((0 until n).map { i =>
            rec.get(i) match {
              case null => null
              case v => convert(i)(v)
            }
          })
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
