package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `pq_lut(array<double> q, codebooks) -> array<double>` — the
  * per-query PQ lookup table, FLAT row-major m×ksub: entry [j·ksub+c]
  * is the dot product of the query's j-th subvector with codeword c of
  * subspace j, every dot a left fold in array-index order. Flat so the
  * ADC hot loop (pq_adc_sum) indexes primitives with zero per-row
  * nested-view allocation. The m×ksub×dsub codebook matrix is
  * baked in at plan time (the registry builder folds the literal, like
  * nearest_centroid).
  *
  * Exists for plan size, not arithmetic speed: the composed-HOF table
  * (m·ksub independent `aggregate(zip_with(slice(...), lit-array))`
  * folds) is ~8,000 Catalyst expression nodes at m=8/ksub=16 — the
  * optimizer and codegen walk all of them every query, which dominated
  * sim_pq_topk's wall time (1.6 s of a 1.6 s query at sf0.1; the
  * per-row arithmetic is microseconds on 200 query rows).
  *
  * Bit-compatibility: each [j][c] is `Σ q[j·dsub+i]·cb[i]` folded
  * i-ascending from exact 0.0 — identical op order to the HOF form and
  * the DuckDB twin's comprehension fold (spec-asserted). Null q → null.
  */
case class PqLut(child: Expression, codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
  extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty, "pq_lut: empty codebook")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_lut requires array<double> (cast first), got $other")
    }

  // flat [m][ksub][dsub] copy for the hot loop / codegen reference
  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(q: Any): Any =
    PqLut.compute(q.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pqLutCodebooks", matrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, qv => {
      s"""
         |${ev.value} = graft.functions.PqLut.compute($qv, $m);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  val info: ExpressionInfo = new ExpressionInfo(classOf[PqLut].getName, "pq_lut")

  /** Shared by interpreted eval and generated code. Fold order (i
    * ascending, exact 0.0 init per entry) is the bit-parity contract.
    * Positions past the query's length fold over min(len) — lengths are
    * equal in practice (codebooks come from the corpus itself), same
    * convention as NearestCentroid.compute.
    */
  def compute(q: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val ksub = if (m > 0) codebooks(0).length else 0
    val out = new Array[Double](m * ksub)
    var j = 0
    var off = 0
    while (j < m) {
      val cb = codebooks(j)
      var c = 0
      while (c < ksub) {
        val cw = cb(c)
        var acc = 0.0
        var i = 0
        val lim = math.min(cw.length, math.max(0, q.numElements() - off))
        while (i < lim) {
          acc += q.getDouble(off + i) * cw(i)
          i += 1
        }
        out(j * ksub + c) = acc
        c += 1
      }
      off += cb.headOption.map(_.length).getOrElse(0)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
