package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style conversion attribution and path mining over an event
  * stream — the revenue-credit companion of [[Funnel]] (same
  * product-analytics consumer the reference's event collectors feed;
  * see `Funnel`'s provenance note).
  *
  * Scale shape, both operators: ONE hash exchange on the entity key,
  * window passes that reuse it, and aggregates that are map-side
  * combinable. Attribution's touch↔conversion pairing is a
  * co-partitioned self-join on (entity, span) — spans are bounded by
  * conversions per entity, so no reducer ever sees more than one
  * entity's touch window. Nothing event-scale reaches the driver.
  */
object Attribution {

  /** Credit conversion value to preceding touch channels. Span
    * semantics: events are ordered per entity by (ts, tie); each
    * conversion closes a span that began after the previous conversion,
    * and only touches INSIDE that span (strictly before the conversion
    * in the ordering) are candidates. Models:
    *  - "first": the span's earliest touch gets the full value;
    *  - "last": the span's latest touch gets the full value;
    *  - "linear": every touch in the span gets `value/n` (6-decimal
    *    quantized).
    * Conversions with NO preceding touch in their span credit the
    * channel NULL (kept — unattributed revenue is a real number the
    * report must show, not drop). Credited values are quantized to
    * micro-units via `floor(v·10⁶ + 0.5)` — exact IEEE, no engine-build
    * round()/double→DECIMAL tie dependence — and summed as
    * DECIMAL(28,0) (headroom ~10²⁷ micro-units, so a channel total can
    * exceed the ~9.2·10¹⁸ Long bound without wrap), so the totals are
    * engine-exact under any partitioning; the reported credit is ONE
    * correctly-rounded division by 10⁶. Returns (channel, n_credits, credit) — `n_credits`
    * counts credit rows: conversions for first/last, conversion–touch
    * pairs for linear. */
  def credit(events: DataFrame, entity: String, ts: String, tie: String,
      isTouch: Column, channel: Column, isConversion: Column,
      value: Column, model: String = "last"): DataFrame = {
    require(Set("first", "last", "linear")(model), s"unknown model $model")
    val wPrev = Window.partitionBy(col(entity))
      .orderBy(col(ts), col(tie))
      .rowsBetween(Window.unboundedPreceding, -1)
    // span id = conversions strictly before this event: a conversion's
    // own span id is its index, and exactly the touches since the
    // previous conversion share it
    val base = events
      .filter(isTouch || isConversion)
      .withColumn("__span", coalesce(
        sum(isConversion.cast("long")).over(wPrev), lit(0L)))
    val touches = base.filter(isTouch).select(col(entity).as("__e"),
      col("__span"), col(ts).as("__tts"), col(tie).as("__ttie"),
      channel.as("__ch"))
    val convs = base.filter(isConversion).select(col(entity).as("__e"),
      col("__span"), value.cast("double").as("__v"))
    val joined = convs.join(touches, Seq("__e", "__span"), "left")
    val wSpan = Window.partitionBy(col("__e"), col("__span"))
    val picked = model match {
      case "linear" =>
        // an unattributed conversion (no touches in span: the left join's
        // single null-channel row, __n = 0) keeps its FULL value — never
        // divide by the empty touch count
        joined.withColumn("__n", count(col("__ch")).over(wSpan))
          .withColumn("__credit",
            when(col("__n") === 0,
              floor(col("__v") * lit(1000000.0) + lit(0.5)))
              .otherwise(floor(col("__v") / col("__n") * lit(1000000.0)
                + lit(0.5)))
              .cast("long"))
      case m =>
        // row_number (not a min/max-struct equality filter) so a (ts,
        // tie) collision between two touches still credits EXACTLY one
        // row — a tie filter would keep every collider and double-count
        // the conversion's value. The unattributed conversion (left
        // join's single all-null touch row) is its span's only row, so
        // rn = 1 keeps it.
        val ord = if (m == "first") Seq(col("__tts").asc, col("__ttie").asc)
                  else Seq(col("__tts").desc, col("__ttie").desc)
        joined.withColumn("__rn", row_number().over(wSpan.orderBy(ord: _*)))
          .filter(col("__rn") === 1)
          .withColumn("__credit",
            floor(col("__v") * lit(1000000.0) + lit(0.5)).cast("long"))
    }
    picked
      .groupBy(col("__ch").as("channel"))
      .agg(count(lit(1)).as("n_credits"),
        (sum(col("__credit").cast("decimal(28,0)"))
          .cast("string").cast("double") / 1000000.0).as("credit"))
  }

  /** Temporal-containment pair support — "for users who do A, how many
    * go on to do B?": for every ordered step pair (a, b), the number of
    * entities with an a-event STRICTLY before some b-event, alongside
    * the a-audience size and their ratio. [[eventPaths]] counts
    * CONTIGUOUS k-step windows; this is the gap-tolerant companion (an
    * intervening click does not break "signup → purchase"), i.e.
    * length-2 sequential-pattern support with unlimited gap.
    *
    * The containment test collapses to span arithmetic: an entity has
    * a-before-b iff `min ts(a) < max ts(b)` — so the corpus reduces to
    * one (entity, step) min/max aggregate (map-side combinable) and a
    * per-entity self-join bounded by the entity's DISTINCT step count
    * (step cardinality, not event count — never quadratic in events).
    * `share` is ONE double division of exact counts. */
  def followedBy(events: DataFrame, entity: String, ts: String,
      step: Column): DataFrame = {
    val spans = events
      .filter(step.isNotNull && col(entity).isNotNull &&
        col(ts).isNotNull)
      .groupBy(col(entity).as("__e"), step.as("__s"))
      .agg(min(col(ts)).as("__mn"), max(col(ts)).as("__mx"))
      .localCheckpoint(eager = false) // pair join + audience sizes
    val pairs = spans.as("a")
      .join(spans.as("b"),
        col("a.__e") === col("b.__e") && col("a.__s") =!= col("b.__s") &&
          col("a.__mn") < col("b.__mx"))
      .groupBy(col("a.__s").as("step_a"), col("b.__s").as("step_b"))
      .agg(count(lit(1)).as("n_entities")) // (entity, step) rows unique
    val sizes = spans.groupBy(col("__s").as("step_a"))
      .agg(count(lit(1)).as("n_entities_a"))
    pairs.join(sizes, Seq("step_a"))
      .select(col("step_a"), col("step_b"), col("n_entities"),
        col("n_entities_a"),
        (col("n_entities").cast("double") /
          col("n_entities_a").cast("double")).as("share"))
  }

  /** Frequent k-step event paths — "what do entities DO, in order?":
    * every length-`k` window of each entity's ordered event stream
    * becomes a `a>b>c` path string, counted corpus-wide; returns the
    * `topN` paths by count (ties broken by path string, so the cut is
    * deterministic). One entity exchange + k−1 stacked leads over it +
    * a map-side-combined count + TakeOrdered — the same plan family as
    * [[Funnel.reach]], with output bounded by topN. */
  def eventPaths(events: DataFrame, entity: String, ts: String,
      tie: String, step: Column, k: Int, topN: Int): DataFrame = {
    require(k >= 2, s"paths need k >= 2, got $k")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), col(tie))
    val steps = (0 until k).map {
      case 0 => step
      case i => lead(step, i).over(w)
    }
    events
      .withColumn("__path", concat_ws(">", steps: _*))
      .withColumn("__last", steps.last) // materialized: a window expr
      .filter(col("__last").isNotNull)  // cannot sit in a filter directly
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topN)
  }
}
