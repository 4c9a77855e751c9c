package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hyperplane_bands(array<float|double>, bands, rowsPerBand) ->
  * array<string>` — native Catalyst expression computing all banded
  * hyperplane-LSH keys in ONE traversal of the vector: the HOF form
  * evaluates `bands × rowsPerBand` independent `aggregate(zip_with(...))`
  * folds, re-walking the array (and re-boxing every element through
  * lambda variables) once per bit — 24 traversals for the 8×3 ANN
  * signature.
  *
  * Bit-compatibility contract (the DuckDB oracle mirrors the HOF form):
  * each projection j is the independent left fold
  * `Σ_i v[i] * (((i*31 + j*17) mod 61) - 30)` in array-index order with
  * i 1-based; fusing the j-loops into one i-loop does not reorder any
  * individual fold, so every projection — and therefore every sign bit —
  * is bit-identical to the HOF/oracle form. Band key b =
  * `"<b>|" + bits[b*rowsPerBand, (b+1)*rowsPerBand)`. Null OR EMPTY
  * array → null — an empty vector has no signature, and a null key
  * array explodes to zero rows, so such rows cleanly drop out of
  * banding (the HOF form's all-'0' keys on empties are an artifact of
  * `sequence(1, 0)` descending + null-padded zip_with, and the DuckDB
  * oracle's init-less `list_reduce` errors on them outright — no
  * engine has meaningful empty-vector behavior to preserve). Array
  * elements are assumed non-null (embeddings), like cosine_sim.
  */
case class HyperplaneBands(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression {

  require(bands > 0 && rowsPerBand > 0, "hyperplane_bands: positive bands/rows")
  require(bands * rowsPerBand <= 61,
    "hyperplane_bands: the mod-61 family has only 61 distinct hyperplanes")

  private def nBits: Int = bands * rowsPerBand

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // null input OR empty array
  override def prettyName: String = "hyperplane_bands"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bands requires a float/double array, got $other")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val proj = new Array[Double](nBits)
    val f = isFloat // hoisted: a dataType match per element would dominate the loop
    var i = 0
    while (i < n) {
      val x = if (f) arr.getFloat(i).toDouble else arr.getDouble(i)
      var j = 0
      while (j < nBits) {
        proj(j) += x * ((((i + 1) * 31 + j * 17) % 61) - 30)
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(4 + rowsPerBand)
      sb.append(b).append('|')
      var j = b * rowsPerBand
      while (j < (b + 1) * rowsPerBand) {
        sb.append(if (proj(j) >= 0) '1' else '0')
        j += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      val proj = ctx.freshName("proj")
      val out = ctx.freshName("out")
      val sb = ctx.freshName("sb")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $proj = new double[$nBits];
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = (double) $a.$getter($i);
         |    for (int $j = 0; $j < $nBits; $j++) {
         |      $proj[$j] += $x * (((($i + 1) * 31 + $j * 17) % 61) - 30);
         |    }
         |  }
         |  final UTF8String[] $out = new UTF8String[$bands];
         |  for (int $b = 0; $b < $bands; $b++) {
         |    final java.lang.StringBuilder $sb = new java.lang.StringBuilder(4 + $rowsPerBand);
         |    $sb.append($b).append('|');
         |    for (int $j = $b * $rowsPerBand; $j < ($b + 1) * $rowsPerBand; $j++) {
         |      $sb.append($proj[$j] >= 0 ? '1' : '0');
         |    }
         |    $out[$b] = UTF8String.fromString($sb.toString());
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBands {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HyperplaneBands].getName, "hyperplane_bands")
}
