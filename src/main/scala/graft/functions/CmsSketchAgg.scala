package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `cms_sketch(key_string, d, w) -> array<bigint>` — a Count-Min sketch
  * (Cormode & Muthukrishnan 2005) as a STORABLE VALUE: d hash rows × w
  * counters flattened row-major into one d·w long array. Point
  * frequency estimate = min over rows r of `counter[r·w + h_r(key)]`
  * — always ≥ the true count, within εN with probability 1−δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * The frequency member of the engine's re-aggregatable sketch family
  * (distinct → KMV, membership → Bloom, quantiles → bottom-k sample):
  * counter arrays add element-wise, so the stored per-group sketches
  * merge losslessly with the existing `vec_sum` aggregate — no new
  * merge function needed, and merged == direct by associativity of
  * integer vector addition.
  *
  * Portability: row r's hash is hash52 of the string "r|key" (the
  * md5-prefix scheme every sketch here uses), mod w — a DuckDB oracle
  * replays it with md5/substr/Horner, and because bucket indices for
  * LITERAL probe keys are plan-time constants, the engine-side point
  * query is pure `element_at`/`least` column arithmetic.
  */
case class CmsSketchAgg(
    child: Expression, d: Int, w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(d >= 1 && d <= 16, s"cms_sketch: d in [1,16], got $d")
  require(w >= 2, s"cms_sketch: w must be >= 2, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_sketch requires a string column (cast first), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var r = 0
      while (r < d) {
        val h = KmvDistinctAgg.hash52(CmsSketchAgg.rowKeyBytes(r, key))
        buf(r * w + (h % w).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CmsSketchAgg {
  /** UTF-8 bytes of "r|key" — the per-row hash input, shared by the
    * aggregate, the plan-time probe-index computation, and (as
    * md5(CAST(r AS VARCHAR) || '|' || key)) the DuckDB oracle.
    */
  def rowKeyBytes(r: Int, key: String): Array[Byte] =
    (r.toString + "|" + key).getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Plan-time bucket index of a literal probe key in row r. */
  def bucket(r: Int, key: String, w: Int): Int =
    (KmvDistinctAgg.hash52(rowKeyBytes(r, key)) % w).toInt

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CmsSketchAgg].getName, "cms_sketch")
}
