package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `quantize_i8d(array<float|double>) -> array<double>` — the int8
  * scalar-quantization CODES of a vector (`round(x / scale)`,
  * `scale = max|x|/127`, zero vectors take scale 1), returned as a
  * primitive double array ready for integer-exact cosine scoring.
  *
  * Native fused form of the composed-HOF pipeline in
  * `Similarity.quantizeInt8` + the cast-to-double view: the HOF chain
  * is the right SEMANTIC spec (and stays as the oracle-shaped
  * reference, bit-parity spec-asserted), but it evaluates interpreted
  * — and worse, projection collapse inlines the per-row `scale` CASE
  * into the per-element lambda, evaluating it D times per row with a
  * boxed allocation each (the PLANS.md lesson-11 pattern, fourth
  * instance). Here: one two-pass primitive loop per row, whole-stage
  * codegen, `UnsafeArrayData` output with no boxing.
  *
  * Rounding contract: `java.math.BigDecimal.valueOf(v).setScale(0,
  * HALF_UP)` — exactly Spark's `round()` on doubles, which the DuckDB
  * oracle's `round()` matches on this data (gate-proven before the
  * native form landed).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_i8d"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_i8d requires a float/double array, got ${other.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = isFloat
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      val av = math.abs(v)
      if (av > m) m = av
      i += 1
    }
    val scale = if (m == 0.0) 1.0 else m / 127.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      val q = v / scale
      // Non-finite guard, mirroring Spark's RoundBase: BigDecimal.valueOf
      // throws NumberFormatException on NaN/Infinity (one bad embedding
      // element would crash the whole query); round() passes them through.
      out(i) =
        if (java.lang.Double.isFinite(q))
          java.math.BigDecimal.valueOf(q)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        else q
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = (arr: String, i: String) =>
      if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val av = ctx.freshName("av")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = ${getter(a, i)};
         |  final double $av = java.lang.Math.abs($v);
         |  if ($av > $m) $m = $av;
         |}
         |final double $scale = ($m == 0.0) ? 1.0 : ($m / 127.0);
         |final double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = ${getter(a, i)} / $scale;
         |  $out[$i] = java.lang.Double.isFinite($v)
         |    ? java.math.BigDecimal.valueOf($v)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
         |    : $v;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[QuantizeInt8].getName, "quantize_i8d")
}
