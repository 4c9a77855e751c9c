package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** `kmv_distinct(string_col, k) -> double` — distinct-count estimate via
  * a K-Minimum-Values sketch (Bar-Yossef et al. 2002): keep the k
  * smallest DISTINCT hash values; if fewer than k were seen the count is
  * exact, otherwise estimate (k-1)/u_k with u_k the k-th smallest hash
  * as a fraction of the hash space.
  *
  * Why this instead of `approx_count_distinct`: HLL estimates are
  * engine-specific (rows-only gate), while KMV is ENGINE-PORTABLE —
  * the hash is the first 13 hex chars of md5 (52 bits, exact in a
  * double; dedup happens on the same prefix in both engines), u_k =
  * v/2^52 is an exact power-of-two divide, and (k-1)/u_k is one IEEE
  * divide — so a DuckDB oracle states the identical estimate and the
  * 100 TB profiling default becomes hash-gated. Same scale shape as
  * HLL: constant-size (≤ k longs) buffers, associative min-k merge, so
  * partial aggregation is exact under any partitioning.
  *
  * Nulls are skipped (cardinality of present values). Runs in
  * ObjectHashAggregate like vec_sum — fine for profiling's global
  * (group-less) aggregate; the codegen-exclusion caveat in
  * VectorSumAgg's scaladoc applies if used under a hot groupBy.
  */
case class KmvDistinctAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv_distinct: k must be >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_distinct requires a string column (cast first), got ${other.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      insert(buf, KmvDistinctAgg.hash52(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes))
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else {
      // u_k = v / 2^52 is exact (v < 2^52, power-of-two divide), so the
      // estimate is ONE IEEE division — the oracle replays it verbatim
      val uK = buf.last().toDouble / KmvDistinctAgg.HashSpace
      (k - 1).toDouble / uK
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

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctAgg =
    copy(child = newChild)
}

object KmvDistinctAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvDistinctAgg].getName, "kmv_distinct")

  /** 2^52 = 16^13 — the hash space of a 13-hex-char prefix. */
  val HashSpace: Double = 4503599627370496.0

  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 13 hex chars of md5(bytes) as a long (52 bits — exact in a
    * double). Equals the oracle's digit-Horner fold over
    * substr(md5(x), 1, 13).
    */
  def hash52(bytes: Array[Byte]): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(bytes)
    // 13 hex digits = 6 bytes + the high nibble of byte 6
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(6) & 0xf0L) >> 4)
  }
}
