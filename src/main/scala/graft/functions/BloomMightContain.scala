package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** `bloom_might_contain(key) -> boolean` with the bitmap and m_bits
  * baked in at plan time — the native membership test for
  * [[BloomFilterAgg]] bitmaps: one MD5 over the key's UTF-8 bytes, 4
  * positions from the digest's big-endian 32-bit chunks, 4 bit probes
  * on a primitive long[].
  *
  * Exists because the pure-column form (`conv(substring(md5(key),
  * 1+8i, 8), 16, 10)` per probe) pays four hex-string round-trips per
  * row — measured 2.9 s for the filter alone on sf0.1's 600k-row
  * lineitem (vs 0.6 s for a single md5 baseline), which made the
  * "pruned" semi-join 7× slower than the plain join it was meant to
  * beat. The SQL-stated arithmetic remains the spec-level reference:
  * the parity test proves both paths address identical bits (the
  * aggregate's byte arithmetic == the conv form == this expression).
  */
case class BloomMightContain(child: Expression, words: IndexedSeq[Long], mBits: Int)
  extends UnaryExpression {

  require(mBits >= 64 && mBits % 64 == 0 && words.length == mBits / 64,
    s"bloom_might_contain: bitmap length ${words.length} != $mBits/64")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a string key (cast first), got $other")
    }

  @transient private lazy val buf: Array[Long] = words.toArray

  override protected def nullSafeEval(key: Any): Any =
    BloomFilterAgg.mightContain(buf, mBits,
      key.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBitmap", buf, "long[]")
    nullSafeCodeGen(ctx, ev, k => {
      s"""
         |${ev.value} = graft.functions.BloomFilterAgg.mightContain($ref, $mBits, $k.getBytes());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomMightContain].getName, "bloom_might_contain")
}
