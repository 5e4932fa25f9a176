package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — "what is bought (clicked, read,
  * co-edited) together?": item pairs sharing a basket, with support and
  * lift. The recommendation-feature companion of [[Retrieval]]'s
  * content-based ranking.
  *
  * Scale shape: baskets are distincted to (basket, item) postings, the
  * pair expansion is a basket-keyed self-join (co-partitioned — one
  * exchange feeds both sides), and a `maxBasketSize` cap bounds the
  * quadratic blow-up the same way `capBuckets` guards the LSH family: a
  * degenerate mega-basket (a crawler's session, a warehouse account)
  * would otherwise emit |basket|² pairs of zero discriminative value.
  * Counts are exact integers; `lift` is one fixed double formula over
  * them, so results are engine-exact. */
object Affinity {

  /** Item-pair co-occurrence counts with support/lift:
    * (item_a, item_b, n_baskets, lift), item_a < item_b, pairs below
    * `minSupport` baskets dropped. `lift = (n_ab · N) / (n_a · n_b)`
    * where N is the total basket count — > 1 means the pair co-occurs
    * more than independence predicts. Baskets larger than
    * `maxBasketSize` are excluded whole (skew guard, documented
    * coverage cut — log the drop rate at scale). */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketSize: Int = 256): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val posts = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sized = posts.groupBy(col("__b"))
      .agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
      .select(col("__b"))
    val kept = posts.join(sized, Seq("__b"), "left_semi")
      .localCheckpoint(eager = false) // three consumers below
    // total basket count as a broadcast one-row scalar join — never a
    // driver-side action in the operator body
    val total = kept.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__n"))
    val itemFreq = kept.groupBy(col("__i"))
      .agg(count(lit(1)).as("__ni"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
    pairs
      .join(itemFreq.select(col("__i").as("item_a"), col("__ni").as("__na")),
        Seq("item_a"))
      .join(itemFreq.select(col("__i").as("item_b"), col("__ni").as("__nb")),
        Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        round(col("n_baskets").cast("double") * col("__n").cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double")), 6)
          .as("lift"))
  }
}
