package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC bulk import/export with Sqoop's semantics, on Spark's JDBC source.
  *
  * The reference forks Apache Sqoop: parallel ranged SELECTs driven by a
  * boundary query over a split column
  * (`odps-sqoop/src/java/org/apache/sqoop/mapreduce/DataDrivenImportJob.java:282-299`),
  * free-form queries with a `$CONDITIONS` placeholder each mapper fills with
  * its range (`tool/ImportTool.java:222,411-413`), and incremental
  * append/lastmodified modes with a saved last-value
  * (`SqoopOptions.java:322-329`). Spark's `read.jdbc` implements the same
  * ranged-split execution; this module maps the Sqoop surface onto it and
  * keeps the split planning explicit and testable.
  */
object JdbcImport {

  /** Sqoop-shaped import config. Exactly one of `table` / `query` is set;
    * `query` must contain `$CONDITIONS` (validated). */
  final case class ImportConfig(
      url: String,
      table: String = "",
      query: String = "",
      splitBy: String = "",
      numMappers: Int = 4,
      boundaryQuery: String = "",
      incremental: Option[Incremental] = None,
      properties: Properties = new Properties(),
      /** Chunks of read-ahead per mapper (0 = off): overlaps the JDBC
        * fetch with downstream work via [[AsyncPrefetch]] — the
        * reference's opt-in prefetch queue (`OdpsOptions.scala:102-106`). */
      prefetchChunks: Int = 0)

  sealed trait Incremental { def checkCol: String; def lastValue: String }
  /** New-rows-only: `checkCol > lastValue`. */
  final case class Append(checkCol: String, lastValue: String) extends Incremental
  /** Changed-rows: `checkCol > lastValue`, caller merges with [[graft.operators.Merge.upsert]]. */
  final case class LastModified(checkCol: String, lastValue: String) extends Incremental

  /** The per-mapper `$CONDITIONS` range predicates for a numeric split
    * column — Sqoop's DataDrivenDBInputFormat split algebra: closed-open
    * ranges, last range closed. Exposed for tests and for predicate-mode
    * reads. */
  def splitPredicates(splitBy: String, lo: Long, hi: Long, n: Int): Seq[String] = {
    require(n > 0 && hi >= lo)
    // BigInt range math: (hi - lo + 1) overflows Long for hash-valued
    // split columns spanning most of the long range, which silently
    // shrank the step to 1 and imported almost nothing
    val span = BigInt(hi) - BigInt(lo) + 1
    val step = ((span + n - 1) / n).max(1)
    (0 until n).flatMap { i =>
      val a = BigInt(lo) + i * step
      if (a > hi) None
      else {
        val b = (a + step - 1).min(BigInt(hi))
        Some(
          if (b == BigInt(hi)) s"$splitBy >= $a AND $splitBy <= $b"
          else s"$splitBy >= $a AND $splitBy < ${b + 1}")
      }
    }
  }

  private def incrementalClause(cfg: ImportConfig): Option[String] =
    cfg.incremental.map(i => s"${i.checkCol} > ${i.lastValue}")

  /** Run the boundary query (min/max of the split column) — one driver-side
    * scalar read, exactly Sqoop's planning step. None when no rows match. */
  def boundaries(spark: SparkSession, cfg: ImportConfig): Option[(Long, Long)] = {
    val bq =
      if (cfg.boundaryQuery.nonEmpty) cfg.boundaryQuery
      else {
        val src =
          if (cfg.table.nonEmpty) cfg.table
          else s"(${cfg.query.replace("$CONDITIONS", "1=1")}) graft_bq"
        val inc = incrementalClause(cfg).map(c => s" WHERE $c").getOrElse("")
        s"SELECT MIN(${cfg.splitBy}) AS graft_lo, MAX(${cfg.splitBy}) AS graft_hi FROM $src$inc"
      }
    val row = spark.read.jdbc(cfg.url, s"($bq) graft_bounds", cfg.properties).head()
    // NULL min/max = no matching rows (empty table, or an incremental
    // import with nothing new — a ROUTINE state between runs), not an NPE
    (Option(row.getAs[Number](0)), Option(row.getAs[Number](1))) match {
      case (Some(l), Some(h)) => Some((l.longValue(), h.longValue()))
      case _ => None
    }
  }

  /** Parallel import: boundary query → numMappers ranged SELECTs, one Spark
    * partition per range (each executor opens its own connection — the
    * mapper→RDBMS boundary from SURVEY §3.3). */
  def importTable(spark: SparkSession, cfg: ImportConfig): DataFrame = {
    require(cfg.table.nonEmpty ^ cfg.query.nonEmpty, "exactly one of table/query")
    require(cfg.query.isEmpty || cfg.query.contains("$CONDITIONS"),
      "free-form query must contain $CONDITIONS")
    val imported = if (cfg.splitBy.isEmpty) {
      // single-mapper path (Sqoop -m 1): no split column needed
      val src = if (cfg.table.nonEmpty) cfg.table
        else s"(${cfg.query.replace("$CONDITIONS", "1=1")}) graft_q"
      val df = spark.read.jdbc(cfg.url, src, cfg.properties)
      incrementalClause(cfg).map(df.filter).getOrElse(df)
    } else boundaries(spark, cfg) match {
      case Some((lo, hi)) =>
        val inc = incrementalClause(cfg)
        val preds = splitPredicates(cfg.splitBy, lo, hi, cfg.numMappers)
          .map(p => inc.map(c => s"$p AND $c").getOrElse(p))
        val src = if (cfg.table.nonEmpty) cfg.table
          else s"(${cfg.query.replace("$CONDITIONS", "1=1")}) graft_q"
        spark.read.jdbc(cfg.url, src, preds.toArray, cfg.properties)
      case None =>
        // nothing to import: one-mapper read of the (empty) matching set
        // keeps the schema and the downstream contract
        val src = if (cfg.table.nonEmpty) cfg.table
          else s"(${cfg.query.replace("$CONDITIONS", "1=1")}) graft_q"
        val df = spark.read.jdbc(cfg.url, src, cfg.properties)
        incrementalClause(cfg).map(df.filter).getOrElse(df.limit(0))
    }
    if (cfg.prefetchChunks > 0)
      AsyncPrefetch.rows(imported, queueChunks = cfg.prefetchChunks)
    else imported
  }

  /** Batched export (ODPS→RDBMS direction, `JdbcExportJob`): plain append
    * through Spark's JDBC writer (batched prepared statements). */
  def exportTable(df: DataFrame, url: String, table: String,
      properties: Properties = new Properties(),
      batchSize: Int = 1000): Unit =
    df.write
      .mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(url, table, properties)

  /** Conservative SQL identifier check for names interpolated into DDL/DML
    * text (table and staging-table names arrive as config strings, not bind
    * parameters — JDBC cannot parameterize identifiers). Optionally
    * schema-qualified; anything else (quotes, spaces, semicolons) is
    * rejected before it reaches a statement. */
  private[graft] def validIdentifier(name: String): Boolean =
    name.matches("""[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?""")

  private def requireIdentifier(name: String, what: String): Unit =
    require(validIdentifier(name),
      s"$what '$name' is not a plain (optionally schema-qualified) SQL identifier")

  /** Staged export (Sqoop `--staging-table`,
    * `odps-sqoop/.../ExportJobBase.java:347-410`): the distributed write
    * lands in a staging table; only after EVERY task has committed does a
    * single transactional `INSERT INTO target (cols) SELECT cols` migrate
    * the rows and clear the staging table — a failed or partial export job
    * leaves the target untouched (the staging table may hold partial rows,
    * which the next run's `clearStaging` wipes, mirroring
    * `--clear-staging-table`). The target-side migration is one DB
    * transaction, so its atomicity is the database's, not Spark's — which
    * also makes it safe to retry on transient connection errors
    * ([[Retry.withBackoff]]): a failed attempt rolled back.
    *
    * The migration names the DataFrame's columns explicitly on both sides,
    * so a staging table whose column order differs from the target still
    * lands every value in the right column — `SELECT *` would pair columns
    * by position. The names are validated as plain identifiers and
    * interpolated UNQUOTED: the database then case-folds them exactly as it
    * folded the tables' unquoted DDL names (quoting would pin the
    * DataFrame's case and miss e.g. Derby's uppercase-folded columns).
    *
    * The staging table must have a SINGLE owner per run: Sqoop's contract
    * (`ExportJobBase`) and ours — two concurrent exports sharing one
    * staging table would interleave rows and `clearStaging` each other;
    * give each job its own staging table. */
  def exportStaged(df: DataFrame, url: String, table: String,
      stagingTable: String, clearStaging: Boolean = true,
      properties: Properties = new Properties(),
      batchSize: Int = 1000): Unit = {
    requireIdentifier(table, "target table")
    requireIdentifier(stagingTable, "staging table")
    df.schema.fieldNames.foreach(requireIdentifier(_, "export column"))
    val cols = df.schema.fieldNames.mkString(", ")
    def withConn[A](f: java.sql.Connection => A): A = {
      val conn = java.sql.DriverManager.getConnection(url, properties)
      try f(conn) finally conn.close()
    }
    if (clearStaging)
      Retry.withBackoff(s"clear staging $stagingTable") {
        withConn(_.createStatement().executeUpdate(s"DELETE FROM $stagingTable"))
      }
    exportTable(df, url, stagingTable, properties, batchSize)
    Retry.withBackoff(s"staged-export migrate $stagingTable -> $table") {
      withConn { conn =>
        conn.setAutoCommit(false)
        try {
          val st = conn.createStatement()
          st.executeUpdate(
            s"INSERT INTO $table ($cols) SELECT $cols FROM $stagingTable")
          st.executeUpdate(s"DELETE FROM $stagingTable")
          conn.commit()
        } catch { case e: Throwable => conn.rollback(); throw e }
      }
    }
  }

  /** Upsert export (`JdbcUpsertExportJob`): per-partition prepared-statement
    * loop with a caller-supplied dialect SQL (MERGE/ON CONFLICT/ON
    * DUPLICATE KEY — vendor-specific, exactly like Sqoop's per-manager
    * upsert statements). `setParams` binds one row.
    *
    * Upserts are idempotent by construction, so a transient failure
    * replays only the CURRENT uncommitted batch on a fresh connection
    * ([[Retry.withBackoff]]) — earlier batches are already committed, and
    * a lost-ack commit merely upserts the same rows again. Memory is
    * O(batchSize) per task, never O(partition): the executor buffers one
    * batch for replay, the partition itself streams. */
  def exportUpsert(df: DataFrame, url: String, upsertSql: String,
      properties: Properties = new Properties(),
      batchSize: Int = 1000)(
      setParams: (java.sql.PreparedStatement, org.apache.spark.sql.Row) => Unit): Unit = {
    val props = new Properties()
    props.putAll(properties)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        var conn: java.sql.Connection = null
        var ps: java.sql.PreparedStatement = null
        def ensureConn(): Unit = if (conn == null) {
          conn = java.sql.DriverManager.getConnection(url, props)
          conn.setAutoCommit(false)
          ps = conn.prepareStatement(upsertSql)
        }
        def dropConn(): Unit = {
          if (conn != null) scala.util.Try(conn.close())
          conn = null; ps = null
        }
        val batch = new scala.collection.mutable.ArrayBuffer[
          org.apache.spark.sql.Row](batchSize)
        def flush(): Unit = if (batch.nonEmpty) {
          Retry.withBackoff("upsert-export batch") {
            try {
              ensureConn()
              batch.foreach { r => setParams(ps, r); ps.addBatch() }
              ps.executeBatch()
              conn.commit()
            } catch { case e: Throwable =>
              dropConn() // uncommitted batch rolls back; retry re-binds it
              throw e
            }
          }
          batch.clear()
        }
        try {
          rows.foreach { r =>
            batch += r
            if (batch.size >= batchSize) flush()
          }
          flush()
        } finally dropConn()
      }
    }
  }
}
