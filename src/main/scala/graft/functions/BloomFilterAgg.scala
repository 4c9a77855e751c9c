package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `bloom_agg(string_col, m_bits) -> array<bigint>` — build a Bloom
  * filter bitmap (m_bits bits as m_bits/64 longs) over a string key
  * column, with 4 bit positions per key derived from md5: position i =
  * (big-endian 32-bit chunk i of the digest) mod m_bits — exactly the
  * arithmetic `conv(substring(md5(key), 1+8i, 8), 16, 10) % m_bits`
  * states in SQL, so the membership-test expression
  * (operators.BloomPrune.mightContain) and any cross-engine replay
  * address the same bits.
  *
  * Why not `df.stat.bloomFilter` / the AQE runtime filter: this one is
  * (a) deterministic and engine-portable (md5, no seeded murmur), (b) a
  * proper AGGREGATE — partial bitmaps OR-merge associatively and
  * commutatively, so partial aggregation is exact under any
  * partitioning and the buffer is a constant m_bits/8 bytes, and (c)
  * usable where the optimizer's own runtime filter does not reach
  * (pinned/bucketed plans, manual pipelines).
  *
  * Nulls are skipped (a null key never joins in the exact semi-join
  * that follows, so pruning it early is semantics-preserving).
  */
case class BloomFilterAgg(
    child: Expression, mBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(mBits >= 64 && mBits % 64 == 0,
    s"bloom_agg: m_bits must be a positive multiple of 64, got $mBits")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_agg requires a string column (cast first), got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      BloomFilterAgg.insert(buf, mBits,
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

object BloomFilterAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomFilterAgg].getName, "bloom_agg")

  val NumHashes = 4

  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Bit positions for a key: the 4 big-endian 32-bit chunks of
    * md5(bytes), each mod mBits — equal to
    * `conv(substring(md5hex, 1+8i, 8), 16, 10) % mBits`.
    */
  def positions(bytes: Array[Byte], mBits: Int): Array[Int] = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Int](NumHashes)
    var i = 0
    while (i < NumHashes) {
      var chunk = 0L
      var b = 0
      while (b < 4) { chunk = (chunk << 8) | (d(i * 4 + b) & 0xffL); b += 1 }
      out(i) = (chunk % mBits).toInt
      i += 1
    }
    out
  }

  def insert(buf: Array[Long], mBits: Int, bytes: Array[Byte]): Unit = {
    val ps = positions(bytes, mBits)
    var i = 0
    while (i < ps.length) {
      buf(ps(i) / 64) |= (1L << (ps(i) % 64))
      i += 1
    }
  }

  def mightContain(buf: Array[Long], mBits: Int, bytes: Array[Byte]): Boolean = {
    val ps = positions(bytes, mBits)
    var i = 0
    while (i < ps.length) {
      if (((buf(ps(i) / 64) >>> (ps(i) % 64)) & 1L) == 0L) return false
      i += 1
    }
    true
  }
}
