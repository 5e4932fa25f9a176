package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the companion question to [[Funnel]]:
  * "of the entities whose FIRST activity fell in period P, how many were
  * still active k periods later?" (event-collector downstream analytics,
  * same family as the reference's log-service ingest consumers).
  *
  * Scale shape: one aggregate on the entity key for first-activity
  * periods (map-side combined), one DISTINCT on (entity, period) —
  * active periods per entity, bounded by the calendar, not the event
  * count — then an equi-join of two entity-keyed tables that hash-
  * partition together, and a final cohort×offset aggregate whose output
  * is calendar²-sized. No window over raw events, no driver state.
  */
object Retention {

  /** Retention matrix: (cohort, offset, active, cohort_size, retention).
    * `cohort` = the entity's first-activity period (`date_trunc(period)`),
    * `offset` = whole periods since the cohort period, `active` = distinct
    * cohort members with any event in that period, `retention` =
    * active / cohort_size rounded to 6 places (offset 0 is 1.0 by
    * construction). `period` is a `date_trunc` unit: "week", "month",
    * "day". */
  def cohorts(events: DataFrame, entity: String, ts: String,
      period: String = "week"): DataFrame = {
    val perDay = Map("day" -> 1L, "week" -> 7L)
    require(perDay.contains(period) || period == "month",
      s"period must be day/week/month, got $period")
    // entity-keyed, consumed twice (the activity join and the cohort
    // sizes) — truncate lineage so the corpus-wide first-activity agg
    // runs once (lazy: materializes on first use)
    val firsts = events
      .groupBy(col(entity))
      .agg(min(date_trunc(period, col(ts))).as("cohort"))
      .localCheckpoint(eager = false)
    val active = events
      .select(col(entity), date_trunc(period, col(ts)).as("p"))
      .distinct()
    val offset = period match {
      case "month" =>
        // month lengths vary — count month boundaries, not days
        (months_between(col("p"), col("cohort"))).cast("long")
      case p =>
        floor(datediff(col("p"), col("cohort")) / lit(perDay(p).toDouble))
          .cast("long")
    }
    val joined = active.join(firsts, entity)
      .select(col(entity), col("cohort"), offset.as("offset"))
    val grid = joined.groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("active")) // (entity, period) already distinct
    val sizes = firsts.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    grid.join(broadcast(sizes), "cohort") // calendar-sized build side
      .select(col("cohort"), col("offset"), col("active"),
        col("cohort_size"),
        round(col("active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
      .orderBy(col("cohort"), col("offset"))
  }
}
