package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) tables — the reference's bucket spec
  * (`OdpsBucketSpec(hash, n, cols, sortCols)`, `OdpsTable.scala:46-79`) on
  * Spark's native bucketing, which is the idiomatic path SURVEY §2.3/§4
  * recommends over porting the foreign bucket hash: two tables bucketed
  * (and sorted) the same way join with zero shuffle exchanges
  * (`partitioning.scala:77-141` compatibility logic ≙ Spark's
  * HashShuffleSpec — built-in).
  */
object BucketedTables {

  final case class BucketSpec(numBuckets: Int, bucketCols: Seq[String],
      sortCols: Seq[String] = Nil)

  /** Persist `df` as a bucketed table (metastore-registered — bucketing
    * metadata lives in the catalog, exactly like the reference's table
    * meta). */
  def save(df: DataFrame, table: String, path: String, spec: BucketSpec,
      overwrite: Boolean = true): Unit = {
    var w = df.write
      .mode(if (overwrite) "overwrite" else "error")
      .option("path", path)
      .bucketBy(spec.numBuckets, spec.bucketCols.head, spec.bucketCols.tail: _*)
    if (spec.sortCols.nonEmpty)
      w = w.sortBy(spec.sortCols.head, spec.sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Join two co-bucketed tables; with matching bucket specs the planner
    * emits no shuffle (assert via `PlansSpec`-style checks). */
  def coBucketedJoin(spark: SparkSession, left: String, right: String,
      joinCol: (String, String), joinType: String = "inner"): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(joinCol._1) === r(joinCol._2), joinType)
  }
}
