package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `pq_adc_score(packed bigint, lut array<double>, q_norm double) ->
  * double` with the reconstruction-norm table and ksub baked in at plan
  * time: the complete PQ asymmetric-distance cosine
  * `Σ_j lut[j·ksub+code_j] / (q_norm · sqrt(Σ_j n2[j·ksub+code_j]))`
  * as ONE native call.
  *
  * Exists because the composed form (two `pq_adc_sum` calls + sqrt/div
  * columns) still paid per-row overhead the exact scan does not: a
  * second function dispatch, a JoinedRow array re-access, and — the
  * expensive one — the norm table as a `typedLit` GenericArrayData
  * whose getDouble unboxes a java.lang.Double per lookup (8/row ×
  * 1.2M rows at sf0.1). Here the norm table is a plain `double[]`
  * reference (addReferenceObj), so the hot loop is primitive reads
  * only.
  *
  * Bit-parity contract (HOF form / DuckDB twin state the same math):
  * both sums fold j-ascending from exact 0.0; the final op order is
  * dot / (q_norm * sqrt(n2)) — identical to the composed form
  * (spec-asserted bitwise against pq_adc_sum composition).
  */
case class PqAdcScore(first: Expression, second: Expression, third: Expression,
                      n2: IndexedSeq[Double], ksub: Int)
  extends TernaryExpression {

  require(ksub > 0 && ksub <= 16, s"pq_adc_score: ksub must be in 1..16, got $ksub")
  require(n2.nonEmpty && n2.length % ksub == 0,
    s"pq_adc_score: n2 length ${n2.length} not a multiple of ksub=$ksub")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score requires (bigint, array<double>, double), got $other")
    }

  @transient private lazy val n2Arr: Array[Double] = n2.toArray

  override protected def nullSafeEval(packed: Any, lut: Any, qnorm: Any): Any =
    PqAdcScore.compute(packed.asInstanceOf[Long], lut.asInstanceOf[ArrayData],
      qnorm.asInstanceOf[Double], n2Arr, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n2Ref = ctx.addReferenceObj("pqAdcScoreN2", n2Arr, "double[]")
    nullSafeCodeGen(ctx, ev, (p, l, q) => {
      s"""
         |${ev.value} = graft.functions.PqAdcScore.compute($p, $l, $q, $n2Ref, $ksub);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdcScore =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqAdcScore {
  val info: ExpressionInfo = new ExpressionInfo(classOf[PqAdcScore].getName, "pq_adc_score")

  /** Shared by interpreted eval and generated code. The j-ascending
    * accumulation order (exact 0.0 inits) and the final
    * dot / (q_norm * sqrt(n2)) op order are the bit-parity contract —
    * do not reorder.
    */
  def compute(packed: Long, lut: ArrayData, qnorm: Double,
              n2: Array[Double], ksub: Int): Double = {
    val m = n2.length / ksub
    var dot = 0.0
    var nn = 0.0
    var j = 0
    while (j < m) {
      val code = ((packed >>> (4 * j)) & 15L).toInt
      require(code < ksub,
        s"pq_adc_score: code $code out of range for subspace $j (ksub=$ksub)")
      val idx = j * ksub + code
      dot += lut.getDouble(idx)
      nn += n2(idx)
      j += 1
    }
    dot / (qnorm * math.sqrt(nn))
  }
}
