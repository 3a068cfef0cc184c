package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/**
 * Mergeable quantile-sketch state (DataSketches KLL — the library Spark
 * itself bundles for its HLL surface), closing the gap `Sketches.scala`
 * documents: Spark's `approx_percentile`/`percentile_approx` expose only
 * FINAL quantile values, never the sketch state, so incremental corpus
 * stats had to rescan raw increments for percentiles while distinct
 * counts merged in fixed space (`hll_sketch_agg`/`hll_union_agg`).
 *
 * These three expressions give quantiles the same shape:
 *  - [[KllSketchAgg]] — aggregate raw doubles into a binary KLL sketch
 *    (`toByteArray` state, kilobytes at k=200), the `hll_sketch_agg`
 *    analog;
 *  - [[KllMergeAgg]] — union binary sketch rows (the merged guarantee
 *    follows the SMALLEST k involved — DataSketches adopts the
 *    worst-accuracy input's k, so union increments built at mixed k
 *    degrade to the coarsest), the `hll_union_agg` analog;
 *  - [[KllQuantileOf]] — extract a quantile estimate from a binary
 *    sketch, the `hll_sketch_estimate` analog.
 *
 * KLL compaction is randomized (level selection flips an unseeded random
 * bit), so unlike the HLL rows the merged state is NOT byte-deterministic
 * — merge ≡ one-pass holds in the ERROR-BOUND sense, not bytewise: both
 * orderings carry the same ≤ ~1.65% (k=200, 99% conf.) normalized rank
 * error. The spec asserts exactly that, and the `sketch_quantile_merge`
 * query is rows-only by design.
 *
 * TypedImperativeAggregate is the Catalyst-native form for opaque mutable
 * state: partial aggregation and map-side combine work (serialize/merge
 * per exchange), which a UDAF over collected arrays would lose.
 */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of binary KLL sketch rows — the quantile `hll_union_agg`. The
  * buffer starts at `k` and KLL merge adopts the tightest accuracy
  * consistent with the inputs' ks. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary (KLL sketch) argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile estimate from a binary KLL sketch at normalized rank `right`
  * (inclusive criteria — DataSketches' default). Null for an empty
  * sketch. Evaluated once per GROUP row (O(#groups)), so CodegenFallback
  * is fine — this is not a per-datum hot path (contrast PqAdcDistance). */
case class KllQuantileOf(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, double), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sketchBytes: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(rank.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object KllExpressions {
  /** Default sketch size: ≤ ~1.65% normalized rank error at 99%
    * confidence, a few KB serialized — the DataSketches default. */
  val DefaultK = 200

  def kllAgg(value: Column, k: Int = DefaultK): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(value.cast("double")), k)
      .toAggregateExpression())

  def kllUnion(sketch: Column, k: Int = DefaultK): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(sketch), k)
      .toAggregateExpression())

  def kllQuantile(sketch: Column, rank: Double): Column =
    Bridge.column(KllQuantileOf(Bridge.expression(sketch),
      Literal(rank, DoubleType)))
}
