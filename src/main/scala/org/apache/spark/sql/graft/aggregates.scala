package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Apache DataSketches KLL — Karnin, Lang &
  * Liberty 2016, the public streaming-quantiles algorithm) as first-class
  * aggregate state.
  *
  * What this adds over `approx_percentile`: the sketch itself is the
  * OUTPUT (a binary column), so per-partition / per-day / per-source
  * distribution summaries can be PERSISTED next to the data and merged
  * later — cross-snapshot corpus statistics without rescanning 100 TB.
  * `percentile_approx` answers one query; a stored KLL sketch answers
  * every future rank/quantile query over any union of slices, via
  * [[KllMergeAgg]] (same shape as the reference's incremental-stats
  * pattern: partial state persisted per load, folded at read).
  *
  * Implemented as a [[TypedImperativeAggregate]] — the sketch object
  * lives on the heap across `update` calls and serializes ONLY at
  * shuffle boundaries (an `Aggregator`-over-bytes would pay
  * serialize/deserialize per input row). Map-side partials apply: the
  * exchange carries one ~KB sketch per group per partition, never values.
  */
private[sql] case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Fold PERSISTED KLL sketches (binary column of [[KllSketchAgg]] /
  * [[KllMergeAgg]] output) into one — the read-side of incremental
  * distribution stats: per-load sketches merge associatively, so a
  * year of daily summaries folds without touching the data they
  * summarize. Null inputs (e.g. an empty load's missing row) are
  * skipped. The result sketch adopts the smallest k seen (DataSketches
  * merge semantics — accuracy degrades to the coarsest input, never
  * breaks). */
private[sql] case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile at `rank` ∈ [0,1] from a serialized KLL sketch. Operates on
  * aggregate OUTPUT rows (one per group), so interpreted eval is fine —
  * the per-value hot path is the sketch update inside the aggregate,
  * not this accessor. NULL for a null/empty sketch (an empty group has
  * no quantiles — surfacing NULL beats inventing a number). */
private[sql] case class KllQuantile(child: Expression, rank: Double)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(rank >= 0.0 && rank <= 1.0, s"rank must be in [0,1], got $rank")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override protected def nullSafeEval(bytes: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(rank)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantile =
    copy(child = newChild)
}

/** Number of values a serialized KLL sketch has absorbed (exact — KLL
  * tracks n precisely even when compacted). NULL sketch → NULL. */
private[sql] case class KllCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_count"

  override protected def nullSafeEval(bytes: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getN

  override protected def withNewChildInternal(newChild: Expression): KllCount =
    copy(child = newChild)
}
