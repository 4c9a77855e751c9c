package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared buffer plumbing for the KMV sketch-column aggregates. */
sealed trait KmvSketchLike extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  def k: Int

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  protected def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  /** The sketch VALUE: the ≤ k smallest distinct hashes, ascending. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) out.add(bb.getLong)
    out
  }
}

/** `kmv_sketch(string_col, k) -> array<bigint>` — the KMV sketch as a
  * STORABLE VALUE (the ≤ k smallest distinct 52-bit md5-prefix hashes,
  * ascending) instead of a finished estimate. This is the
  * re-aggregatable form: materialize one sketch per partition/day/
  * source as a tiny array column, then combine later periods or groups
  * with [[KmvMergeAgg]] WITHOUT rescanning the data — the 100 TB
  * pattern for incremental distinct counts (a 100-TB day is scanned
  * once; every later rollup works on k longs per group).
  *
  * The hash and min-k semantics are exactly KmvDistinctAgg's, so
  * estimates derived from these sketches (the plain-column arithmetic
  * in operators/Sketches.kmvEstimate) equal `kmv_distinct` run
  * directly — which is what the qa_sketch_reagg gate proves, and why a
  * DuckDB oracle can state the merged estimate.
  */
case class KmvSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvSketchLike with UnaryLike[Expression] {

  require(k >= 2, "kmv_sketch: k must be >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_sketch requires a string column (cast first), got ${other.simpleString}")
    }

  override def prettyName: String = "kmv_sketch"

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      insert(buf, KmvDistinctAgg.hash52(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvSketchAgg].getName, "kmv_sketch")
}

/** `kmv_merge(sketch_col, k) -> array<bigint>` — combine stored KMV
  * sketches (arrays from [[KmvSketchAgg]]) into the sketch of the UNION
  * of their underlying sets. Min-k union is associative and
  * commutative, so the merged sketch is exactly what kmv_sketch would
  * have produced over the concatenated raw data — re-aggregation is
  * lossless by construction (gate-proven in qa_sketch_reagg).
  */
case class KmvMergeAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvSketchLike with UnaryLike[Expression] {

  require(k >= 2, "kmv_merge: k must be >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_merge requires array<bigint> sketches, got ${other.simpleString}")
    }

  override def prettyName: String = "kmv_merge"

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val ad = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < ad.numElements()) { insert(buf, ad.getLong(i)); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

object KmvMergeAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvMergeAgg].getName, "kmv_merge")
}
