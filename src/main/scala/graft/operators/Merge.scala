package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch upsert / incremental-load operators.
  *
  * Re-expresses the reference's Sqoop semantics Spark-first:
  *  - MergeJob "new dataset wins over old on the merge key"
  *    (`odps-sqoop/src/java/org/apache/sqoop/mapreduce/MergeJob.java:51-66`,
  *    `MergeReducer.java`) → union + row_number window, one shuffle on the
  *    merge key instead of a full MR job.
  *  - `--incremental append/lastmodified` with a saved last-value
  *    (`odps-sqoop/src/java/org/apache/sqoop/SqoopOptions.java:322-329`) →
  *    a pushed-down range predicate, so the parquet/JDBC scan itself skips
  *    old data.
  */
object Merge {

  /** Latest-record-wins per key: deterministic because `orderCols` must form
    * a total order within key (callers append a unique id tiebreaker). */
  def latestWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Sqoop-style merge: rows from `newDf` replace same-key rows in `oldDf`
    * UNCONDITIONALLY (MergeJob's contract — the new dataset wins even if
    * an old row orders higher on `orderCols`, e.g. a backfill correction
    * with a lower version). `orderCols` only break ties WITHIN each side.
    * Schemas must match by name. */
  def upsert(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column]): DataFrame =
    latestWins(
      oldDf.withColumn("__gen", lit(0)).unionByName(newDf.withColumn("__gen", lit(1))),
      keyCols, col("__gen") +: orderCols).drop("__gen")

  /** Incremental append: only rows strictly after the checkpoint. The
    * predicate is pushed to the scan (verify `PushedFilters` in explain). */
  def incrementalAppend(df: DataFrame, checkCol: String, lastValue: Column): DataFrame =
    df.filter(col(checkCol) > lastValue)

  /** Incremental lastmodified: rows modified after the checkpoint, deduped
    * to the latest version per key (Sqoop's lastmodified + merge-key mode). */
  def incrementalLastModified(df: DataFrame, keyCols: Seq[String],
      modifiedCol: String, lastValue: Column, tieBreak: Seq[Column]): DataFrame =
    latestWins(df.filter(col(modifiedCol) > lastValue),
      keyCols, col(modifiedCol) +: tieBreak)
}
