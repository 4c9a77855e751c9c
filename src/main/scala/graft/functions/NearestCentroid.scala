package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** `nearest_centroid(array<double> v, array<array<double>> centroids) ->
  * struct<d2: double, cid: int>` — argmin squared-L2 over a centroid
  * matrix (cid = row index), fused into one native loop.
  *
  * Replaces the composed-HOF form in KMeans (a transform over a centroid
  * array literal, each element an `aggregate(zip_with(...))` fold, then
  * a strict-< fold over the scored structs): higher-order functions run
  * interpreted with per-element boxing, so the k×dim work per row
  * dominated KMeans.fit (measured ~4.7 s for 3 Lloyd iterations over
  * sf0.1's 55k vectors; the arithmetic itself is microseconds).
  *
  * Bit-compatibility contract (the DuckDB oracle and the HOF form state
  * the same math): d2 is the left fold `Σ (x_i − y_i)²` in array-index
  * order with exact 0.0 init, and the argmin keeps the FIRST minimum in
  * cid order (strict `<`), matching both the HOF strict-< fold and the
  * oracle's `ORDER BY d2, cid` rn=1. Null input → null; the centroid
  * matrix is baked in at plan time (the registry builder folds the
  * literal).
  */
case class NearestCentroid(child: Expression, centroids: IndexedSeq[IndexedSeq[Double]])
  extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid: empty centroid matrix")

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires array<double> (cast first), got $other")
    }

  // flat row-major copy for the hot loop (and a plain field for codegen
  // reference passing)
  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("nearestCentroidMatrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.NearestCentroid.compute($a, $m);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NearestCentroid].getName, "nearest_centroid")

  /** Shared by interpreted eval and generated code. The d2 accumulation
    * order (index 0..dim-1, acc += diff*diff) and the strict-< first-min
    * rule are the bit-parity contract — do not reorder.
    */
  def compute(v: ArrayData, matrix: Array[Array[Double]]): InternalRow = {
    val n = v.numElements()
    var bestD2 = 0.0
    var bestCid = -1
    var c = 0
    while (c < matrix.length) {
      val ctr = matrix(c)
      var acc = 0.0
      var i = 0
      // zip_with semantics: fold over min(len) positions (equal lengths
      // in practice — KMeans centroids come from the corpus itself)
      val lim = math.min(n, ctr.length)
      while (i < lim) {
        val d = v.getDouble(i) - ctr(i)
        acc += d * d
        i += 1
      }
      if (bestCid < 0 || acc < bestD2) { bestD2 = acc; bestCid = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD2, bestCid))
  }
}
