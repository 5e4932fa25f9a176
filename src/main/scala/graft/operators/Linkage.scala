package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-linkage / entity-resolution blocking: candidate-pair
  * generation without the O(n²) cross join. The reference stops at
  * moving records (its Sqoop/OGG lineage); matching them is left to the
  * warehouse — this is that operator, Spark-first.
  */
object Linkage {

  /** Sorted-neighborhood blocking (Hernández & Stolfo): order the
    * corpus by a blocking key and emit every pair within `neighborhood`
    * positions — the classic "similar records sort near each other"
    * candidate generator (by name, by length, by normalized address …).
    * Returns (id_a, id_b) with `id_a` the earlier row in the global
    * (sortKey, id) order; downstream verifies pairs with a real
    * similarity (the same compose-then-verify shape as the LSH dedup
    * family).
    *
    * SEMANTICS: pairs (a, b) with `0 < grank(b) − grank(a) <=
    * neighborhood` where grank is the row's rank in the global
    * (sortKey, id) order — exactly the single-window formulation, which
    * is also the oracle.
    *
    * 100 TB shape: the global sort is a RANGE REPARTITION (Spark's
    * distributed sort primitive), never one partition's window. Within
    * a bucket, neighbors come from `neighborhood` stacked `lead`s over
    * one per-bucket window. Pairs that CROSS bucket boundaries are
    * recovered exactly from a boundary sliver — each bucket's first and
    * last `neighborhood` rows (≤ 2·n·buckets rows, broadcastable) with
    * their global ranks reconstructed from per-bucket counts (a
    * buckets-sized aggregate) — so the result is invariant to where the
    * range partitioner happens to cut, including empty and
    * smaller-than-neighborhood buckets. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      sortKey: Column, neighborhood: Int, buckets: Int = 64): DataFrame = {
    require(neighborhood >= 1,
      s"neighborhood must be >= 1, got $neighborhood")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val idT = df.schema(idCol).dataType
    val ranged = df
      .select(col(idCol).as("__id"), sortKey.as("__key"))
      .repartitionByRange(buckets, col("__key"), col("__id"))
      .withColumn("__b", spark_partition_id())
      .localCheckpoint(eager = false) // bucket ids must not re-randomize
    val wB = Window.partitionBy(col("__b"))
      .orderBy(col("__key"), col("__id"))
    val ranked = ranged.withColumn("__r", row_number().over(wB))

    // within-bucket pairs: `neighborhood` stacked leads, one window pass
    val leads = (1 to neighborhood).map(i => lead(col("__id"), i).over(wB))
    val intra = ranged
      .withColumn("__nb", array(leads: _*))
      .select(col("__id").as("id_a"),
        explode(col("__nb")).as("id_b"))
      .filter(col("id_b").isNotNull)

    // per-bucket counts -> global-rank offsets (buckets-sized)
    val offsets = ranged.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // boundary sliver: first/last `neighborhood` rows of every bucket,
    // with exact global ranks; tiny by construction
    val sliver = ranked.join(offsets, "__b")
      .filter(col("__r") <= neighborhood ||
        col("__r") > col("__n") - neighborhood)
      .select(col("__b"), col("__id"), (col("__off") + col("__r")).as("__g"))
      .localCheckpoint(eager = false)
    val cross = sliver.as("a").join(sliver.as("b"),
        col("b.__g") > col("a.__g") &&
          col("b.__g") <= col("a.__g") + neighborhood &&
          col("a.__b") =!= col("b.__b"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))

    intra.unionByName(cross)
      .select(col("id_a").cast(idT), col("id_b").cast(idT))
  }
}
