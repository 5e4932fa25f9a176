package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment analysis — the decision layer over [[Funnel]] /
  * [[Retention]]: per-variant conversion rates with a two-proportion
  * z-test against a control (the standard pooled-variance form).
  *
  * Engine-reproducibility: all inputs are EXACT integer counts; every
  * double expression below has one fixed evaluation order mirrored
  * token-for-token in the q160 oracle, and rounding happens once at the
  * output — so rates, lifts, and z-scores hash-match across engines
  * (same discipline as [[Anomaly]]).
  *
  * Scale: one map-side-combined count aggregate over the unit table
  * (output is variant-cardinality-sized — variants are few by
  * definition), the control row broadcasts onto it, and everything else
  * is per-row arithmetic on a tiny table.
  */
object Experiment {

  /** Per-variant report: (variant, n, conv, rate, lift, z, significant).
    * `df` is one row per EXPERIMENT UNIT (user, session, ...) with its
    * variant label and a boolean conversion flag — aggregate events to
    * units first (e.g. via [[Funnel.reach]]) so units, not events, are
    * the sample. The control row carries NULL lift/z and `significant`
    * false; a variant with degenerate pooled variance (0% or 100%
    * everywhere) gets NULL z rather than ±∞. `zCrit` defaults to the
    * two-sided 5% critical value. */
  /** Cohen's κ between two categorical labelings of the same rows —
    * the inter-annotator (or model-vs-gold) agreement statistic every
    * labeled-training-data pipeline gates on: observed agreement
    * corrected for the agreement two independent raters would reach by
    * chance from their own label marginals. κ = 1 perfect, 0 chance,
    * < 0 worse than chance. Rows where either label is NULL are
    * excluded (count them upstream — missingness is its own metric).
    *
    * Numerics: with Σd = matching rows and S = Σ_k row_k·col_k (the
    * marginal product over categories), κ = (n·Σd − S)/(n² − S) —
    * numerator and denominator are EXACT integers carried in
    * DECIMAL(19/38,0), so κ, `observed_agreement` (Σd/n) and
    * `expected_agreement` (S/n²) are each ONE double division of exact
    * operands: engine-bit-identical, no rounding. κ is NULL when
    * n² = S (both raters constant — chance agreement is total).
    *
    * Scale: one (labelA, labelB) count aggregate (map-side combinable
    * to |A|·|B| partials), then category-sized marginal joins. */
  def cohenKappa(df: DataFrame, labelACol: String, labelBCol: String)
      : DataFrame = {
    val d19 = "decimal(19,0)"
    val cells = df
      .filter(col(labelACol).isNotNull && col(labelBCol).isNotNull)
      .groupBy(col(labelACol).as("__a"), col(labelBCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rowM = cells.groupBy(col("__a"))
      .agg(sum(col("__n")).cast(d19).as("__ra"))
    val colM = cells.groupBy(col("__b"))
      .agg(sum(col("__n")).cast(d19).as("__cb"))
    // S = Σ_k row_k·col_k over the SHARED category axis (a category
    // one rater never uses has marginal 0 on that side — inner join)
    val s = rowM.join(colM, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ra") * col("__cb")), lit(0))
        .cast("decimal(38,0)").as("__s"))
    val agg = cells.agg(
      sum(col("__n")).cast(d19).as("__nn"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
        .cast(d19).as("__d"))
    agg.crossJoin(broadcast(s))
      .select(col("__nn").cast("bigint").as("n"),
        (col("__d").cast("double") / col("__nn").cast("double"))
          .as("observed_agreement"),
        (col("__s").cast("double") /
          (col("__nn") * col("__nn")).cast("double"))
          .as("expected_agreement"),
        when(col("__nn") * col("__nn") === col("__s"),
            lit(null).cast("double"))
          .otherwise((col("__nn") * col("__d") - col("__s")).cast("double") /
            (col("__nn") * col("__nn") - col("__s")).cast("double"))
          .as("kappa"))
  }

  def abTest(df: DataFrame, variantCol: String, convertedCol: String,
      control: String, zCrit: Double = 1.959964): DataFrame = {
    val stats = df
      .groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col(convertedCol).cast("long")).as("conv"))
      .localCheckpoint(eager = false) // two consumers below
    val ctrl = stats.filter(col("variant") === control)
      .select(col("n").as("n0"), col("conv").as("c0"))
    require(!ctrl.isEmpty, s"control variant '$control' not present")
    val joined = stats.crossJoin(broadcast(ctrl))
    val rate = col("conv").cast("double") / col("n")
    val rate0 = col("c0").cast("double") / col("n0")
    val pool = (col("conv") + col("c0")).cast("double") /
      (col("n") + col("n0"))
    val se2 = pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n") + lit(1.0) / col("n0"))
    val isCtrl = col("variant") === control
    joined.select(
      col("variant"), col("n"), col("conv"),
      round(rate, 6).as("rate"),
      when(isCtrl, lit(null).cast("double"))
        .otherwise(round(rate - rate0, 6)).as("lift"),
      when(isCtrl || !(se2 > 0), lit(null).cast("double"))
        .otherwise(round((rate - rate0) / sqrt(se2), 6)).as("z"))
      .withColumn("significant", coalesce(abs(col("z")) > zCrit, lit(false)))
      .orderBy(col("variant"))
  }
}
