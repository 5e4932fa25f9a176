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
  * skipped. A persisted sketch whose k differs from the declared k is
  * REFUSED, loudly: DataSketches would happily merge it, silently
  * degrading every quantile to the smallest k in the fold — a year of
  * k=400 dailies poisoned by one k=200 stray, detectable only by the
  * answers drifting. Cross-version/cross-k folds must be explicit:
  * either re-sketch the raw data or declare the coarser k. */
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
    if (v != null) {
      val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      require(sk.getK == k,
        s"kll_merge_agg(k=$k) refuses a sketch serialized with k=${sk.getK}: " +
          "a mixed-k fold silently degrades every quantile to the smallest k " +
          "in the fold; re-sketch the raw data or declare k=" + sk.getK)
      buf.merge(sk)
    }
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

/** Exact deterministic k-per-group sample as MERGEABLE AGGREGATE STATE —
  * "give me exactly k documents from every source/domain/cluster of a
  * 100 TB corpus" without the rank-window formulation's full sort of
  * every group.
  *
  * The sample is BOTTOM-K BY A CALLER-SUPPLIED SORT KEY (canonically a
  * portable hash of the row id, which makes the sample uniform,
  * deterministic, and reproducible in any engine): the aggregate keeps
  * the k smallest (key, id) pairs per group in a bounded binary heap.
  * `update` is O(log k) against O(1)-sized state, partials combine
  * map-side, and `merge` is heap-union — so the exchange carries at
  * most k pairs per group per map partition instead of every row, and
  * nothing ever sorts a whole group. Equivalent by construction to
  * `row_number() OVER (PARTITION BY g ORDER BY key, id) <= k` (the
  * oracle formulation, pinned by DataOpsSpec), which is exactly what
  * makes it gate-checkable while being the plan you'd actually run.
  *
  * Bottom-k-by-hash is the classic mergeable uniform-sample trick (the
  * KMV / bottom-k sketch family, e.g. Cohen & Kaplan, "Summarizing data
  * using bottom-k sketches", PODC 2007) applied to row SELECTION rather
  * than cardinality estimation.
  *
  * Ties: ordering is lexicographic on (key, id), so duplicate keys are
  * broken by id and the result is a deterministic function of the input
  * SET. Null key or id rows are skipped. Output is `array<bigint>` of
  * the selected ids, ascending by (key, id).
  */
private[sql] object BottomKBuffer {
  /** Bounded max-heap of (key, id) pairs — head is the LARGEST retained
    * pair, so a better (smaller) candidate replaces it in O(log k). */
  final class Heap(val k: Int) {
    val q = new java.util.PriorityQueue[(Long, Long)](
      math.max(1, k),
      new java.util.Comparator[(Long, Long)] {
        // reverse lexicographic → max-heap
        override def compare(a: (Long, Long), b: (Long, Long)): Int = {
          val c = java.lang.Long.compare(b._1, a._1)
          if (c != 0) c else java.lang.Long.compare(b._2, a._2)
        }
      })
    def offer(key: Long, id: Long): Unit = {
      if (q.size < k) { q.add((key, id)); () }
      else {
        val worst = q.peek()
        if (key < worst._1 || (key == worst._1 && id < worst._2)) {
          q.poll(); q.add((key, id)); ()
        }
      }
    }
    def mergeFrom(other: Heap): Unit = {
      val it = other.q.iterator()
      while (it.hasNext) { val p = it.next(); offer(p._1, p._2) }
    }
    /** ids ascending by (key, id). */
    def sortedIds: Array[Long] = {
      val arr = q.toArray(new Array[(Long, Long)](q.size))
      java.util.Arrays.sort(arr, new java.util.Comparator[(Long, Long)] {
        override def compare(a: (Long, Long), b: (Long, Long)): Int = {
          val c = java.lang.Long.compare(a._1, b._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      })
      arr.map(_._2)
    }
  }
}

private[sql] case class BottomKIdsAgg(
    key: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer.Heap]
  with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0 && k <= 1000000, s"bottom-k k must be in [1, 1e6], got $k")

  override def left: Expression = key
  override def right: Expression = id
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_ids_agg"

  override def createAggregationBuffer(): BottomKBuffer.Heap =
    new BottomKBuffer.Heap(k)

  override def update(buf: BottomKBuffer.Heap, input: InternalRow): BottomKBuffer.Heap = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      buf.offer(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKBuffer.Heap, other: BottomKBuffer.Heap): BottomKBuffer.Heap = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: BottomKBuffer.Heap): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.sortedIds)

  override def serialize(buf: BottomKBuffer.Heap): Array[Byte] = {
    val ids = buf.q.toArray(new Array[(Long, Long)](buf.q.size))
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * ids.length)
    bb.putInt(ids.length)
    ids.foreach { p => bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new BottomKBuffer.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKIdsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKIdsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKIdsAgg =
    copy(key = newLeft, id = newRight)
}

/** Mergeable count-min frequency sketch (Cormode & Muthukrishnan 2005)
  * over a string column — the FREQUENCY member of the persisted-sketch
  * family (KLL = quantiles, theta/HLL = distinct, MinHash = similarity,
  * CMS = per-item counts): a fixed-size table answering "how often did
  * THIS token/URL/key occur?" for any item, including items chosen
  * AFTER the scan. Estimates overcount only (never under), by at most
  * ε·N with the configured confidence. Backed by Spark's own
  * `org.apache.spark.util.sketch.CountMinSketch` (the `df.stat`
  * implementation), so the binary format matches what Spark users
  * already persist.
  *
  * Merge is cell-wise addition — commutative and associative — so the
  * serialized result is BIT-DETERMINISTIC for a given (input multiset,
  * eps, confidence, seed), regardless of partitioning or merge order:
  * per-slice sketches persisted daily fold into exact sums of their
  * count tables. Null inputs are skipped. Use [[CmsEstimate]] to probe.
  */
private[sql] case class CmsSketchAgg(
    child: Expression,
    eps: Double,
    confidence: Double,
    seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.util.sketch.CountMinSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(eps > 0 && eps < 1, s"eps must be in (0,1), got $eps")
  require(confidence > 0 && confidence < 1,
    s"confidence must be in (0,1), got $confidence")

  private type Cms = org.apache.spark.util.sketch.CountMinSketch

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch_agg"

  override def createAggregationBuffer(): Cms =
    org.apache.spark.util.sketch.CountMinSketch.create(eps, confidence, seed)

  override def update(buf: Cms, input: InternalRow): Cms = {
    val v = child.eval(input)
    // hash the UTF-8 bytes (matches CountMinSketch.addString's own
    // String→bytes path) without materializing a java String per row
    if (v != null)
      buf.addBinary(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .getBytes)
    buf
  }

  override def merge(buf: Cms, other: Cms): Cms = {
    buf.mergeInPlace(other)
    buf
  }

  private def toBytes(s: Cms): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    s.writeTo(bos)
    bos.toByteArray
  }

  override def eval(buf: Cms): Any = toBytes(buf)
  override def serialize(buf: Cms): Array[Byte] = toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Cms =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

/** Point-frequency estimate of `item` from a serialized [[CmsSketchAgg]]
  * sketch. Runs on aggregate-output rows or probe tables (sketch-sized,
  * not corpus-sized), so interpreted eval with a per-partition-cached
  * deserialize would be overkill — probes re-read the sketch; keep probe
  * tables small or join the sketch in once. NULL if either side NULL. */
private[sql] case class CmsEstimate(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sk.asInstanceOf[Array[Byte]]))
      .estimateCount(item.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .getBytes)

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Fold PERSISTED CMS sketches (binary [[CmsSketchAgg]] output) into one —
  * read-side of incremental frequency stats: per-day/per-slice sketches
  * merge by cell-wise addition into exactly the sketch a single pass
  * would have built (same (eps, confidence, seed) required — Spark's
  * `mergeInPlace` rejects incompatible shapes loudly). Null inputs
  * skipped. */
private[sql] case class CmsMergeAgg(
    child: Expression,
    eps: Double,
    confidence: Double,
    seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.util.sketch.CountMinSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  private type Cms = org.apache.spark.util.sketch.CountMinSketch

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_merge_agg"

  override def createAggregationBuffer(): Cms =
    org.apache.spark.util.sketch.CountMinSketch.create(eps, confidence, seed)

  override def update(buf: Cms, input: InternalRow): Cms = {
    val v = child.eval(input)
    if (v != null) {
      val other = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      // fail loudly with the declared geometry: mergeInPlace's own
      // IncompatibleMergeException names neither the aggregate nor the
      // expected (eps, confidence, seed), which is what the caller must
      // fix — a CMS fold only composes cell-for-cell on one geometry
      try buf.mergeInPlace(other)
      catch {
        case e: org.apache.spark.util.sketch.IncompatibleMergeException =>
          throw new IllegalArgumentException(
            s"cms_merge_agg(eps=$eps, confidence=$confidence, seed=$seed) " +
              s"refuses a sketch with different geometry (got depth=" +
              s"${other.depth} width=${other.width}): CMS only folds " +
              "cell-for-cell on one (eps, confidence, seed); re-sketch the " +
              "raw data or declare the matching parameters", e)
      }
    }
    buf
  }

  override def merge(buf: Cms, other: Cms): Cms = {
    buf.mergeInPlace(other)
    buf
  }

  private def toBytes(s: Cms): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    s.writeTo(bos)
    bos.toByteArray
  }

  override def eval(buf: Cms): Any = toBytes(buf)
  override def serialize(buf: Cms): Array[Byte] = toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Cms =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}
