package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared plumbing for the bottom-k-by-hash ROW-sample sketches — the
  * quantile member of the engine's re-aggregatable sketch family
  * (distinct counts → KMV, membership → Bloom, quantiles → this): keep
  * the (hash, value) pairs with the k smallest 52-bit md5-prefix hashes
  * of the row KEY. Because min-k by a content hash is associative and
  * commutative, the union of per-group sketches is EXACTLY the sketch
  * of the concatenated data (lossless re-aggregation, the KMV
  * argument), and because the hash is content-derived the sample — and
  * any quantile read off it — is deterministic across engines, runs
  * and partitionings, where a reservoir/RNG sample reproduces nowhere.
  *
  * Determinism under key reuse: if the same key arrives with different
  * values the sketch keeps the MINIMUM value for that hash, so update
  * order cannot leak partition order into the result (with unique row
  * keys — the documented contract — this never fires).
  */
sealed trait SampleSketchLike
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]] {
  def k: Int

  override def dataType: DataType = SampleSketchAgg.sketchType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  protected def insert(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                       h: Long, v: Double): Unit = {
    val existing = buf.get(h)
    if (existing != null) {
      if (v < existing) { buf.put(h, v); () }
    } else if (buf.size < k) { buf.put(h, v); () }
    else if (h < buf.lastKey()) {
      buf.put(h, v)
      buf.remove(buf.lastKey())
      ()
    }
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Double],
                     b2: java.util.TreeMap[java.lang.Long, java.lang.Double])
      : java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); insert(b1, e.getKey, e.getValue) }
    b1
  }

  /** The sketch VALUE: ≤ k (h, v) structs ascending by h. */
  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey.longValue(), e.getValue.doubleValue()))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 16)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putDouble(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val out = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) out.put(bb.getLong, bb.getDouble)
    out
  }
}

/** `sample_sketch(key_string, value_double, k) -> array<struct<h,v>>` —
  * build the bottom-k row sample from raw rows. Key must identify the
  * row (e.g. its primary key); the hash is [[KmvDistinctAgg.hash52]],
  * so a DuckDB oracle can replay the selection as
  * `ORDER BY substr(md5(key), 1, 13)`.
  */
case class SampleSketchAgg(
    left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SampleSketchLike with BinaryLike[Expression] {

  require(k >= 2, "sample_sketch: k must be >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sample_sketch requires (string key, double value), got $other")
    }

  override def prettyName: String = "sample_sketch"

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val kv = left.eval(input)
    val vv = right.eval(input)
    if (kv != null && vv != null) {
      insert(buf,
        KmvDistinctAgg.hash52(
          kv.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes),
        vv.asInstanceOf[Double])
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SampleSketchAgg =
    copy(left = newLeft, right = newRight)
}

object SampleSketchAgg {
  val sketchType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SampleSketchAgg].getName, "sample_sketch")
}

/** `sample_merge(sketch_col, k) -> array<struct<h,v>>` — combine stored
  * row-sample sketches into the sketch of the concatenated raw data
  * (lossless by min-k associativity; gate-proven in
  * agg_quantile_sketch).
  *
  * CONTRACT: merge-k must be ≤ the k the input sketches were BUILT
  * with. Min-k associativity only holds downward: bottom-k' of a union
  * of bottom-k sets equals bottom-k' of the raw union iff k' ≤ k. A
  * LARGER merge-k cannot recover rows the build already discarded — it
  * would yield a sketch that is not the bottom-k of the concatenated
  * data, and the kmv-style "size < k ⇒ exact" assumption would then
  * undercount silently. (The k is not recoverable from the sketch
  * value itself — a sketch of size s < k is indistinguishable from one
  * built with k = s — so this is a caller contract, not a runtime
  * check. All engine call sites pass the build-k verbatim.)
  */
case class SampleMergeAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SampleSketchLike
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(k >= 2, "sample_merge: k must be >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
          if s.length == 2 && s(0).dataType == LongType && s(1).dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sample_merge requires array<struct<h bigint, v double>> sketches, got ${other.simpleString}")
    }

  override def prettyName: String = "sample_merge"

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) {
      val ad = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < ad.numElements()) {
        val row = ad.getStruct(i, 2)
        insert(buf, row.getLong(0), row.getDouble(1))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SampleMergeAgg =
    copy(child = newChild)
}

object SampleMergeAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SampleMergeAgg].getName, "sample_merge")
}
