package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `pq_adc_sum(packed bigint, table array<double>, ksub) -> double` —
  * the PQ asymmetric-distance accumulation: for each subspace j
  * (m = table.length / ksub), extract the 4-bit code
  * `(packed >> 4j) & 15` and sum `table[j·ksub + code]` in j order.
  *
  * Replaces the composed-HOF form in Similarity.pqTopK
  * (`aggregate(sequence(0, m-1), 0.0, (acc, j) -> acc +
  * element_at(element_at(table, j+1), code+1))`): higher-order
  * functions run interpreted with per-step boxing, and the ADC fold is
  * the per-(corpus × query) hot loop — measured 1.87 s vs the exact
  * native-cosine scan's 0.52 s at sf0.1, i.e. the lookup table was
  * losing to the 64-dim arithmetic it exists to avoid (the same lesson
  * as PLANS.md #6/#9/#11). The table is FLAT (row-major m×ksub) so the
  * hot loop reads primitives directly — the first native cut used
  * array<array<double>> and paid one nested-ArrayData view allocation
  * per subspace per row (~16 allocs/row × 1.2M rows), which kept it at
  * ~2× the exact scan.
  *
  * Bit-compatibility contract (the HOF form and the DuckDB oracle state
  * the same math): acc starts at exact 0.0 and adds lookups in ascending
  * j — identical FP op order, so results are bit-equal (spec-asserted).
  * Null packed or null table → null.
  */
case class PqAdcSum(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression {

  require(ksub > 0 && ksub <= 16, s"pq_adc_sum: ksub must be in 1..16, got $ksub")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_sum requires (bigint, array<double>), got $other")
    }

  override protected def nullSafeEval(packed: Any, table: Any): Any =
    PqAdcSum.compute(packed.asInstanceOf[Long], table.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, t) => {
      s"""
         |${ev.value} = graft.functions.PqAdcSum.compute($p, $t, $ksub);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcSum =
    copy(left = newLeft, right = newRight)
}

object PqAdcSum {
  val info: ExpressionInfo = new ExpressionInfo(classOf[PqAdcSum].getName, "pq_adc_sum")

  /** Shared by interpreted eval and generated code. The j-ascending
    * accumulation order with exact 0.0 init is the bit-parity contract —
    * do not reorder.
    */
  def compute(packed: Long, table: ArrayData, ksub: Int): Double = {
    val len = table.numElements()
    val m = len / ksub
    var acc = 0.0
    var j = 0
    while (j < m) {
      val code = ((packed >>> (4 * j)) & 15L).toInt
      require(code < ksub,
        s"pq_adc_sum: code $code out of range for subspace $j (ksub=$ksub)")
      acc += table.getDouble(j * ksub + code)
      j += 1
    }
    acc
  }
}
