package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference lacks (SURVEY §2.3 notes "no theta/range/
  * as-of joins") and Spark has no built-in operator for — implemented as
  * compositions of built-ins per the preference order (compose before
  * custom plan): one keyed shuffle each, no O(n²) comparisons.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, the single latest right row
    * with `rightTs <= leftTs` on the same key (inclusive). The classic
    * union-and-carry-forward formulation: tag both sides, sort within key
    * by (ts, side), run `last(right_payload, ignoreNulls)` over the
    * running frame — ONE shuffle on the key, no range explosion.
    *
    * Right rows are pre-deduplicated to one per (key, ts) (latest by
    * `rightTieBreak`) so the match is well-defined under ties — the same
    * contract DuckDB's ASOF JOIN has.
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      rightPayload: Seq[String], rightTieBreak: String): DataFrame = {

    // the tie-break column must survive the projection even when it is
    // not part of the payload, or latestWins cannot resolve it
    val rightDedup = Merge.latestWins(
      right.select(
        (key +: rightTs +: rightTieBreak +: rightPayload).distinct.map(col): _*),
      Seq(key, rightTs), Seq(col(rightTieBreak)))

    val payloadStruct = struct(rightPayload.map(col): _*)
    val r = rightDedup.select(
      col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), payloadStruct.as("__r"))
    val leftCols = left.columns
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), lit(null).cast(r.schema("__r").dataType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))

    // right rows sort before left at equal ts → inclusive (<=) semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r.withColumn("__l",
        lit(null).cast(l.schema("__l").dataType)))
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
  }

  /** Forward as-of join — [[asofBackward]]'s mirror: for each left row,
    * the single EARLIEST right row with `rightTs >= leftTs` on the same
    * key (inclusive; "the next reading at or after this order"). Same
    * union-and-carry formulation with the frame reversed: `first(...,
    * ignoreNulls)` over the FOLLOWING frame — still one keyed shuffle.
    * Right rows pre-dedup to one per (key, ts) by `rightTieBreak`
    * (latest wins, matching [[asofBackward]]). Payload columns come back
    * as `asof_<name>`, NULL when no right row follows. */
  def asofForward(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      rightPayload: Seq[String], rightTieBreak: String): DataFrame = {

    val rightDedup = Merge.latestWins(
      right.select(
        (key +: rightTs +: rightTieBreak +: rightPayload).distinct.map(col): _*),
      Seq(key, rightTs), Seq(col(rightTieBreak)))

    val payloadStruct = struct(rightPayload.map(col): _*)
    val r = rightDedup.select(
      col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), payloadStruct.as("__r"))
    val leftCols = left.columns
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), lit(null).cast(r.schema("__r").dataType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))

    // left rows sort BEFORE right at equal ts (side 1 desc? no — order
    // right side with __side ascending puts right first; forward wants
    // the right row at equal ts to be visible in the following frame,
    // so right rows must sort at-or-after left: order by (ts, -side).
    // Evaluated as a RUNNING frame over the exactly-reversed order —
    // Spark recomputes a (currentRow → unboundedFollowing) frame from
    // scratch per row, O(rows²) per key; the reversed prefix frame is
    // incremental, and `last(..., ignoreNulls)` over it is the same
    // "first non-null at-or-after" row.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r.withColumn("__l",
        lit(null).cast(l.schema("__l").dataType)))
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
  }

  /** Keyed interval join: pairs (l, r) with equal `key` and
    * `|leftTs - rightTs| <= toleranceSec`. Time is bucketed at tolerance
    * width; the left side joins buckets {b-1, b, b+1} — an equi-join on
    * (key, bucket) followed by the exact filter, so the shuffle is keyed
    * and skew-bounded instead of a theta-join.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, toleranceSec: Long): DataFrame = {

    // non-key column names shared by both sides (including the common
    // leftTs == rightTs case) would be AMBIGUOUS_REFERENCE after the
    // join — the right side's get a `_r` suffix, like SQL aliases would
    val shared = (right.columns.toSet - key).intersect(left.columns.toSet)
    val r2 = shared.foldLeft(right)((df, c) => df.withColumnRenamed(c, c + "_r"))
    val rTs = if (shared.contains(rightTs)) rightTs + "_r" else rightTs

    // double-precision epoch seconds: µs-precision timestamps stay exact
    // (epoch µs < 2^53), unlike a long cast which truncates sub-second
    val lSec = col(leftTs).cast("double")
    val rSec = col(rTs).cast("double")
    val lb = left.withColumn("__b_exact", floor(lSec / toleranceSec))
    val lExpl = lb.withColumn("__b",
      explode(array(col("__b_exact") - 1, col("__b_exact"), col("__b_exact") + 1)))
      .drop("__b_exact")
    val rb = r2.withColumn("__b", floor(rSec / toleranceSec))

    lExpl.join(rb, Seq(key, "__b"))
      .filter(abs(lSec - rSec) <= toleranceSec.toDouble)
      .drop("__b")
  }
}
