package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeFunctions

/** Z-order (Morton-curve) clustering: lay rows out so that files are tight
  * in EVERY clustering dimension at once, making parquet min/max skipping
  * effective for predicates on any of them.
  *
  * A linear sort by `(a, b)` gives perfect file-level pruning on `a` and
  * none on `b` — every file spans the full `b` range. Interleaving the
  * bits of per-dimension rank buckets (the Delta `OPTIMIZE ZORDER BY` /
  * Iceberg `zorder` strategy, built here from public descriptions) gives
  * each of the k dimensions ~1/k of the key's high bits, so a filter on
  * any single dimension still skips ~`(1 - 1/2^(bits/k))` of the files.
  *
  * Rank buckets (quantiles), not raw value bits: raw bit-interleaving is
  * distribution-sensitive (clustered values share their high bits and the
  * curve degenerates), while quantile ranks are uniform by construction —
  * robust to skew with no tuning.
  *
  * Scale shape (100 TB lens):
  *  - fit = one column-pruned pass computing `approx_percentile` sketches
  *    (tree-aggregated, driver receives only `2^bits` cut points per
  *    dimension) — a small constant factor on top of the rewrite that
  *    necessarily reads everything anyway;
  *  - key = pure codegen'd expressions per row ([[RangeBucketId]] binary
  *    search + [[InterleaveBits]]), no shuffle;
  *  - layout = one `repartitionByRange` on the key (sampled range
  *    boundaries, AQE-sized) + in-partition sort — the same single
  *    exchange a plain sorted write costs.
  */
object ZOrder {

  /** Max bucket-id bits per dimension; `dims * bits` must fit a long, and
    * `1 << bits` must fit an int (the per-dimension bucket-count
    * arithmetic) — 20 bits = 1M buckets/dim, far past useful. */
  private def bitsFor(dims: Int, bits: Int): Int = {
    require(dims >= 1, "zorder needs at least one column")
    require(bits >= 1 && bits <= 20,
      s"bits per dimension must be in [1, 20], got $bits")
    require(dims * bits <= 63,
      s"$dims dims at $bits bits = ${dims * bits} key bits; must be <= 63")
    bits
  }

  /** Fitted cut points for one clustering dimension. */
  sealed trait DimCuts extends Serializable
  /** Quantile cut points on a double-castable dimension. */
  final case class NumericCuts(bounds: Array[Double]) extends DimCuts
  /** Dictionary-rank cut points on a string dimension, in UTF8 binary
    * order (the order Spark sorts strings by). */
  final case class StringCuts(bounds: Array[String]) extends DimCuts

  /** Per-dimension cut points (`<= 2^bits - 1` of them). Double-castable
    * dimensions (numeric/date/timestamp) fit in ONE shared
    * `approx_percentile` pass — the driver receives only cut points. A
    * string dimension fits by dictionary rank: per-value counts (map-side
    * combined), cumulative-frequency bucketing over the sorted dictionary,
    * and the driver again receives only the cut values. The dictionary
    * window runs on a single partition — dictionary-sized by definition,
    * which is what a CATEGORICAL clustering dimension is; a string column
    * with corpus-scale cardinality should be clustered via a numeric
    * surrogate instead. */
  def fitBoundaries(df: DataFrame, cols: Seq[String], bits: Int = 8)
      : Map[String, DimCuts] = {
    val b = bitsFor(cols.size, bits)
    val buckets = 1 << b
    val (strCols, numCols) = cols.partition(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType)

    val numeric: Map[String, DimCuts] = if (numCols.isEmpty) Map.empty else {
      val probs = (1 until buckets).map(_.toDouble / buckets).toArray
      val err = 1.0 / (4.0 * buckets)
      // one pass for all numeric dimensions: approx_percentile sketches
      // aggregate map-side; the driver sees only the cut points
      val aggs = numCols.map { c =>
        percentile_approx(col(c).cast("double"), lit(probs),
          lit(math.ceil(1.0 / err).toInt)).as(c)
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      numCols.zipWithIndex.map { case (c, i) =>
        val qs = Option(row.getSeq[Double](i)).getOrElse(Seq.empty)
        // dedup ties (heavy hitters collapse adjacent quantiles); fewer
        // effective buckets on a skewed dimension is correct behavior
        c -> (NumericCuts(qs.distinct.sorted.toArray): DimCuts)
      }.toMap
    }

    val strings: Map[String, DimCuts] = strCols.map { c =>
      import org.apache.spark.sql.expressions.Window
      val counts = df.select(col(c).as("v")).filter(col("v").isNotNull)
        .groupBy("v").agg(count(lit(1)).as("n"))
      val cum = sum("n").over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
      val tot = sum("n").over(Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
      // value's bucket = floor(cumulative-count-before * buckets / total);
      // cut for bucket k>0 = its smallest value. Heavy hitters span
      // several buckets, leaving some cut-less — fewer effective cuts on
      // a skewed dimension, same behavior as the numeric fit.
      val cuts = counts
        .select(col("v"),
          (((cum - col("n")) * buckets) / tot).cast("int").as("bk"))
        .filter(col("bk") > 0)
        .groupBy("bk").agg(min("v").as("cut"))
        .orderBy("bk")
        .collect().map(_.getString(1))
      c -> (StringCuts(cuts.distinct): DimCuts)
    }.toMap

    numeric ++ strings
  }

  /** The Z-order key column for `cols` given fitted per-dimension cut
    * points: bucket each dimension by binary search (double or UTF8
    * binary order per the fit), interleave the bucket bits. Nulls take
    * bucket 0 (sort first, like NULLS FIRST). */
  def key(boundaries: Map[String, DimCuts], cols: Seq[String],
      bits: Int = 8): Column = {
    val b = bitsFor(cols.size, bits)
    val buckets = 1 << b
    val ids = cols.map { c =>
      val (bucket, nCuts) = boundaries(c) match {
        case NumericCuts(bounds) => (NativeFunctions.rangeBucketId(
          col(c).cast("double"), bounds.toIndexedSeq), bounds.length)
        case StringCuts(bounds) => (NativeFunctions.stringRangeBucketId(
          col(c), bounds.toIndexedSeq), bounds.length)
      }
      // A dimension with fewer effective buckets than 2^bits (small
      // dictionary, tie-collapsed quantiles) must still occupy the HIGH
      // bits of its lane: raw ids 0..m-1 leave the top bits constant zero
      // and the interleave degenerates toward a linear sort on the other
      // dimensions. Spread order-preservingly: id -> id * 2^bits / m.
      val m = nCuts + 1
      // long arithmetic: id * 2^bits can pass Int.MaxValue for a large
      // dictionary at high bits, and ANSI mode makes that a runtime error
      val spread =
        if (m >= buckets) bucket
        else floor(bucket.cast("long") * lit(buckets.toLong) / lit(m.toLong))
          .cast("int")
      coalesce(spread, lit(0))
    }
    NativeFunctions.interleaveBits(array(ids: _*), b)
  }

  /** Cluster `df` on the Morton curve over `cols` into `numPartitions`
    * output partitions (→ files, one per partition on write): fit, key,
    * range-repartition by key, sort within partitions by key. */
  def cluster(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 8): DataFrame = {
    val zk = key(fitBoundaries(df, cols, bits), cols, bits)
    df.withColumn("__graft_zkey", zk)
      .repartitionByRange(numPartitions, col("__graft_zkey"))
      .sortWithinPartitions("__graft_zkey")
      .drop("__graft_zkey")
  }
}
