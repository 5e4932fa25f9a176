package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream — "of the users who
  * did A, how many then did B, then C?" (the classic product-analytics
  * companion to [[Sessionize]]; the reference's event collectors feed
  * exactly this kind of downstream query, e.g. the log-service ingest in
  * `aliyun-log-flume/.../LogSource.java` whose events land in an
  * analytics store).
  *
  * Semantics (first-touch, strict order): step 1's timestamp is the
  * earliest event matching step 1; step i's timestamp is the earliest
  * event matching step i that happens STRICTLY AFTER step i−1's chosen
  * timestamp. An event at exactly the same timestamp as the previous
  * step does not advance the funnel (same-instant order is unknowable),
  * and an optional `within` horizon requires every later step to land
  * within that interval of step 1 — both conventions pinned by
  * `FunnelSpec` and mirrored 1:1 in the q149 oracle.
  *
  * Scale shape: ONE hash exchange on the entity key, then k stacked
  * Window passes over the same partitioning (Catalyst reuses the
  * exchange — no per-step shuffle, no joins back to the event table)
  * and a final partial-aggregated reduction to one row per entity that
  * rides the same partitioning. State per entity is k timestamps,
  * independent of event count. At 100 TB this is the plan a sessionize
  * would cost, regardless of funnel depth.
  */
object Funnel {

  /** Per-entity funnel reach: one row per entity that performed step 1,
    * with columns `t1..tk` — the first-touch timestamp of each step
    * reached (NULL once the chain breaks). `within` (e.g.
    * `expr("INTERVAL 7 DAYS")`) bounds the whole funnel relative to t1. */
  def reach(events: DataFrame, entity: String, ts: String,
      steps: Seq[Column], within: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(entity))
    var cur = events
    steps.zipWithIndex.foreach { case (pred, i) =>
      val stepTs = if (i == 0) {
        min(when(pred, col(ts))).over(w)
      } else {
        // strictly after the previous step's chosen time, and (optionally)
        // inside the horizon anchored at t1
        val horizon = within match {
          case Some(iv) => col(ts) <= col("t1") + iv
          case None     => lit(true)
        }
        min(when(pred && col(ts) > col(s"t$i") && horizon, col(ts))).over(w)
      }
      cur = cur.withColumn(s"t${i + 1}", stepTs)
    }
    // every row of an entity carries identical t1..tk after the windows;
    // the groupBy below is partial-aggregated and reuses the exchange
    cur.groupBy(col(entity))
      .agg(min(col("t1")).as("t1"),
        (2 to steps.length).map(i => min(col(s"t$i")).as(s"t$i")): _*)
      .where(col("t1").isNotNull)
  }

  /** Funnel conversion report: (step, users, conversion) — entities
    * reaching each step and the fraction of step-1 entities still present
    * (rounded to 6 places, IEEE double division on exact counts, so the
    * numbers are engine-reproducible). */
  def report(events: DataFrame, entity: String, ts: String,
      steps: Seq[Column], within: Option[Column] = None): DataFrame = {
    val r = reach(events, entity, ts, steps, within)
    val counts = r.agg(
      count(col("t1")).as("u1"),
      (2 to steps.length).map(i => count(col(s"t$i")).as(s"u$i")): _*)
    // one select over the single aggregate row builds every output row —
    // the funnel pipeline executes ONCE (a cross join back to the counts
    // would re-run the whole reach plan for the second consumer)
    counts.select(explode(array(
      (1 to steps.length).map(i =>
        struct(lit(i).cast("long").as("step"), col(s"u$i").as("users"),
          // no step-1 entities → conversion is undefined, not NaN
          when(col("u1") === 0, lit(null).cast("double"))
            .otherwise(round(
              col(s"u$i").cast("double") / col("u1").cast("double"), 6))
            .as("conversion"))): _*))
      .as("s"))
      .select(col("s.step"), col("s.users"), col("s.conversion"))
      .orderBy("step")
  }
}
