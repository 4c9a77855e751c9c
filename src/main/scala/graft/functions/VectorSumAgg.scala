package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `vec_sum(array<long>) -> array<long>` — element-wise sum of long
  * arrays (per-dimension stats, sketch tallies). Partial aggregation
  * (map-side combine) works as usual because long-vector addition is
  * associative and commutative — exactly reproducible on any cluster
  * layout.
  *
  * Measured tradeoff (sf0.1 simhash tally, local[32]): a
  * TypedImperativeAggregate runs in ObjectHashAggregateExec, which
  * excludes the WHOLE stage — including any expensive upstream
  * projection fused into it — from whole-stage codegen; with an
  * explode+md5 projection upstream that cost 12× vs 64 codegen'd
  * `sum(CASE)` columns. Use vec_sum when the input array is cheap to
  * produce or already materialized (e.g. post-shuffle), or when N is
  * too large for N parallel sum columns to be practical (N ≳ 10³,
  * e.g. dense embedding-centroid accumulation).
  *
  * Null elements are not expected (inputs are computed arrays); a null
  * input row is ignored. Arrays must share a length — the first row
  * fixes it.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  // Input contract: child must be array<bigint> (callers cast); declared
  // input types are omitted because AbstractDataType is private[sql].
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum requires array<bigint>, got ${other.simpleString}")
    }
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buffer.length == 0) new Array[Long](n) else buffer
      require(b.length == n, s"vec_sum: ragged input ($n vs ${b.length})")
      var i = 0
      while (i < n) { b(i) += arr.getLong(i); i += 1 }
      b
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.length == 0) b2
    else if (b2.length == 0) b1
    else {
      // update() enforces equal lengths within a partition; two partitions
      // that each fixed a different length must fail here too, not
      // silently truncate b2 (or index past it).
      require(b1.length == b2.length,
        s"vec_sum: ragged buffers (${b1.length} vs ${b2.length})")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorSumAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[VectorSumAgg].getName, "vec_sum")
}
