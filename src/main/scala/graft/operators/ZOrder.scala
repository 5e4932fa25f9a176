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

  /** Max bucket-id bits per dimension; `dims * bits` must fit a long. */
  private def bitsFor(dims: Int, bits: Int): Int = {
    require(dims >= 1, "zorder needs at least one column")
    require(dims * bits <= 63,
      s"$dims dims at $bits bits = ${dims * bits} key bits; must be <= 63")
    bits
  }

  /** Per-dimension quantile cut points (`2^bits - 1` of them) from one
    * column-pruned aggregate pass. Numeric/date/timestamp columns only
    * (anything castable to double with order preserved). */
  def fitBoundaries(df: DataFrame, cols: Seq[String], bits: Int = 8)
      : Map[String, Array[Double]] = {
    val b = bitsFor(cols.size, bits)
    val buckets = 1 << b
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val err = 1.0 / (4.0 * buckets)
    // one pass for all dimensions: approx_percentile sketches aggregate
    // map-side; the driver sees only the cut points
    val aggs = cols.map { c =>
      percentile_approx(col(c).cast("double"), lit(probs),
        lit(math.ceil(1.0 / err).toInt)).as(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val qs = Option(row.getSeq[Double](i)).getOrElse(Seq.empty)
      // dedup ties (heavy hitters collapse adjacent quantiles); fewer
      // effective buckets on a skewed dimension is correct behavior
      c -> qs.distinct.sorted.toArray
    }.toMap
  }

  /** The Z-order key column for `cols` given fitted per-dimension cut
    * points: bucket each dimension by binary search, interleave the
    * bucket bits. Nulls take bucket 0 (sort first, like NULLS FIRST). */
  def key(boundaries: Map[String, Array[Double]], cols: Seq[String],
      bits: Int = 8): Column = {
    val b = bitsFor(cols.size, bits)
    val ids = cols.map { c =>
      val bucket = NativeFunctions.rangeBucketId(
        col(c).cast("double"), boundaries(c).toIndexedSeq)
      coalesce(bucket, lit(0))
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
