package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface — the idiomatic replacement for the reference's Hive
  * UDAF bridge (`spark-connector/hive/.../hiveUDFs.scala:300-543`, a
  * `TypedImperativeAggregate` with explicit partial/merge state). Spark's
  * `Aggregator[IN, BUF, OUT]` gives the same partial-aggregation contract
  * (zero/reduce/merge/finish ≙ init/iterate/terminatePartial/merge/
  * terminate) with Encoder-managed state instead of hand-serialized
  * buffers.
  */
object Aggregators {

  /** MinHash set-sketch aggregate: reduces a group's string column to a
    * k-long signature (elementwise-min merge — associative and
    * commutative, so map-side partial aggregation applies). Signatures of
    * two groups estimate their set Jaccard: fraction of equal slots. */
  class MinHashSketch(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(buf: Array[Long], v: String): Array[Long] = {
      // skip nulls: hashing a null UTF8String returns the bare seed, which
      // would inject the SAME phantom element into every null-bearing
      // group and inflate their pairwise Jaccard estimates
      if (v == null) return buf
      val base = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(org.apache.spark.unsafe.types.UTF8String.fromString(v),
          org.apache.spark.sql.types.StringType, 42L)
      var i = 0
      while (i < k) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(base, org.apache.spark.sql.types.LongType, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Estimated Jaccard similarity between two equal-length MinHash
    * signatures produced by [[MinHashSketch]]. */
  def estimatedJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    if (a.isEmpty) 0.0
    else a.indices.count(i => a(i) == b(i)).toDouble / a.length
  }

  /** Column form: `minhashSketchAgg(16)(col)` in a groupBy().agg(...). */
  def minhashSketchAgg(k: Int): Column => Column = {
    val fn = udaf(new MinHashSketch(k), Encoders.STRING)
    c => fn(c)
  }
}
