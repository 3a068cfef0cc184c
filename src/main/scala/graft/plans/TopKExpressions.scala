package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/**
 * Bounded top-k-per-key WITHOUT sorting the input: a mergeable k-element
 * heap per group, the aggregate form of `ORDER BY ... LIMIT k` inside
 * each key.
 *
 * Why this exists: Spark's native plan for "top k rows per key" is
 * `row_number() OVER (PARTITION BY key ORDER BY ...)` + `rn <= k`, which
 * the optimizer improves to `Sort → WindowGroupLimit(Partial) → Exchange
 * → Sort → WindowGroupLimit(Final)` — the shuffle is already bounded at
 * ≤ k rows per (key × partition), but each input partition still pays a
 * FULL sort on (key, ordering...) just to feed the partial limit (the
 * r12 plan audit of `window_top_parts`: the local sort is the dominant
 * cost, ~10× DuckDB's bounded-heap implementation of the same window).
 * This aggregate replaces that sort with O(n log k) heap maintenance and
 * keeps the same ≤ k-rows-per-key-per-partition shuffle bound — partial
 * aggregation and map-side combine work because the k-heap is a
 * mergeable state, exactly like the KLL/HLL sketch aggregates.
 *
 * Semantics: keeps the k SMALLEST struct values under Spark's struct
 * ordering (lexicographic over fields), emitted as an array<struct>
 * sorted ascending. Descending fields are encoded by NEGATING them in
 * the struct (exact for doubles and in-range longs) — a per-field
 * direction flag can't exist here because one heap has one total order.
 * Ties: struct ordering is total when the struct includes a unique
 * tiebreak field (give it one — same contract the window form needs for
 * a deterministic row_number).
 *
 * Null structs are ignored (SQL aggregate convention); null FIELDS order
 * per Spark's struct ordering (nulls first ascending).
 */
case class StructTopK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"struct_topk needs k > 0: $k")

  override def prettyName: String = "struct_topk"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.nonEmpty =>
      // orderability must be checked HERE (native sort/agg convention):
      // a map-typed field would otherwise pass analysis and throw from
      // getInterpretedOrdering mid-task instead
      if (RowOrdering.isOrderable(s)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an orderable struct; ${s.sql} is not " +
          "(map fields are unorderable)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a non-empty struct argument, got ${other.sql}")
  }

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val ord: Ordering[InternalRow] = {
    val o = TypeUtils.getInterpretedOrdering(child.dataType)
    (a: InternalRow, b: InternalRow) => o.compare(a, b)
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    // MAX-heap of the k smallest: peek() is the current worst candidate
    new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)

  override def update(buffer: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buffer.size < k) {
        buffer.add(row.copy()) // eval may reuse its backing buffer
      } else if (ord.compare(row, buffer.peek()) < 0) {
        buffer.poll()
        buffer.add(row.copy())
      }
    }
    buffer
  }

  override def merge(buffer: java.util.PriorityQueue[InternalRow],
      other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) {
      val row = it.next()
      if (buffer.size < k) buffer.add(row)
      else if (ord.compare(row, buffer.peek()) < 0) {
        buffer.poll()
        buffer.add(row)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = buffer.toArray(new Array[InternalRow](buffer.size))
    java.util.Arrays.sort(arr, ord)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  // shuffle form: 4-byte count, then length-prefixed single-field
  // UnsafeRows wrapping each struct (the projection owns the struct's
  // variable-length encoding)
  @transient private lazy val wrapProj =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(buffer: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    while (it.hasNext) {
      holder.update(0, it.next())
      val u = wrapProj(holder)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val pq = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val u = new UnsafeRow(1)
      u.pointTo(buf, len)
      pq.add(u.getStruct(0, structType.length).copy())
      i += 1
    }
    pq
  }

  override def withNewMutableAggBufferOffset(n: Int): StructTopK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StructTopK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): StructTopK =
    copy(child = newChild)
}

object TopKExpressions {
  /** k smallest struct values per group as a sorted array<struct> —
    * `ORDER BY struct LIMIT k` per key with heap maintenance instead of
    * a sort (negate fields for descending order). */
  def topKStructs(s: Column, k: Int): Column =
    Bridge.column(StructTopK(Bridge.expression(s), k).toAggregateExpression())
}
