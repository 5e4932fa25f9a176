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

/** Theta distinct-value sketch aggregate (DataSketches theta — the
  * SET-OPERATION sketch family): absorbs a string column into a compact
  * serialized sketch whose ESTIMATES COMPOSE UNDER union / intersection
  * / difference. That composition is what HLL cannot do and what makes
  * theta the corpus-snapshot planning tool: sketch snapshot A and
  * snapshot B independently (one pass each, KBs of state), then answer
  * "how many distinct documents overlap?" or "how many are new in B?"
  * WITHOUT ever joining the corpora — [[ThetaCombine]] does the set
  * algebra on the sketches alone. Exact below the sketch's retained-set
  * capacity (default 4096), bounded relative error above. */
private[sql] case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
  with ExpectsInputTypes with UnaryLike[Expression] {
  import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Fold PERSISTED theta sketches (binary) into one — the cross-snapshot
  * read path, mirroring [[KllMergeAgg]]. Null inputs skipped. */
private[sql] case class ThetaUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
  with ExpectsInputTypes with UnaryLike[Expression] {
  import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Set algebra on two serialized theta sketches: `union`, `intersect`,
  * or `a_not_b` → the combined sketch (binary), composable further.
  * Runs on aggregate-output rows (one per group/snapshot), so
  * interpreted eval is fine. NULL if either side is NULL. */
private[sql] case class ThetaCombine(left: Expression, right: Expression,
    op: String)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ExpectsInputTypes with CodegenFallback {
  import org.apache.datasketches.theta.{SetOperation, Sketches}

  require(Set("union", "intersect", "a_not_b")(op), s"unknown theta op $op")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"theta_$op"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = Sketches.wrapSketch(Memory.wrap(l.asInstanceOf[Array[Byte]]))
    val b = Sketches.wrapSketch(Memory.wrap(r.asInstanceOf[Array[Byte]]))
    (op match {
      case "union" =>
        val u = SetOperation.builder().buildUnion(); u.union(a); u.union(b)
        u.getResult
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(a); i.intersect(b); i.getResult
      case "a_not_b" =>
        SetOperation.builder().buildANotB().aNotB(a, b)
    }).toByteArray
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Distinct-count estimate of a serialized theta sketch (exact while the
  * sketch never exceeded its retained capacity). */
private[sql] case class ThetaEstimate(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  import org.apache.datasketches.theta.Sketches

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override protected def nullSafeEval(bytes: Any): Any =
    Sketches.wrapSketch(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
      .getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
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
