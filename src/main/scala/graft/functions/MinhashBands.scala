package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_bands(array<string> shingles, k, bands) -> array<string>` of
  * length k + bands: slots [0, k) are the MinHash signature, slots
  * [k, k+bands) the LSH band keys — the whole signature+banding stage of
  * the minhash dedup as ONE native expression, one pass over the shingle
  * array per document.
  *
  * Replaces the explode+groupBy shape (one row per (shingle, digest
  * quarter), map-side min combine, then a second projection for band
  * keys): same md5 count, but no generated rows, no aggregation hash
  * table, no UTF8String churn per shingle-slot — the mins live in 8-byte
  * stack buffers. The groupBy shuffle it removes was small (doc → 16
  * digests); the win is the per-shingle row machinery.
  *
  * Bit-compatibility contract (TextFunctions.minhashSignature/lshBands
  * and the DuckDB oracle mirror this exactly):
  *   slot i = min over shingles of substr(md5_hex((i/4) + ":" + shingle),
  *            (i%4)*8 + 1, 8)   — 4 slots per digest, lexicographic min
  *   band b = md5_hex(b + "|" + slot[b*r] + "|" + ... + "|" + slot[(b+1)*r - 1]),
  *            r = k / bands
  * Null or EMPTY input → null: a doc with no shingles has no signature;
  * the explode+groupBy form drops such docs before the aggregate
  * (explode of an empty array emits no row), and a null key array
  * explodes to zero rows — identical exclusion semantics.
  */
case class MinhashBands(child: Expression, k: Int, bands: Int)
  extends UnaryExpression {

  require(k > 0 && k % 4 == 0, "minhash_bands: k must be a positive multiple of 4")
  require(bands > 0 && k % bands == 0, "minhash_bands: bands must divide k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // null input OR empty shingle array
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires an array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    MinhashBands.compute(v.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("mbOut")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $out =
         |  graft.functions.MinhashBands.compute($a, $k, $bands);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object MinhashBands {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinhashBands].getName, "minhash_bands")

  private val localMd = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private val Hex = "0123456789abcdef".getBytes

  private def hex(digest: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](digest.length * 2)
    var i = 0
    while (i < digest.length) {
      out(i * 2) = Hex((digest(i) >> 4) & 15)
      out(i * 2 + 1) = Hex(digest(i) & 15)
      i += 1
    }
    out
  }

  /** Shared by interpreted eval and generated code. Returns null for an
    * empty shingle array (see class doc).
    */
  def compute(arr: ArrayData, k: Int, bands: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val nq = k / 4
    val rowsPerBand = k / bands
    val md = localMd.get()
    val prefixes = Array.tabulate(nq)(q => (q.toString + ":").getBytes)
    // current minimum per slot as 8 ascii-hex bytes; null = unset
    val mins = new Array[Array[Byte]](k)
    var s = 0
    while (s < n) {
      val sh = arr.getUTF8String(s).getBytes
      var q = 0
      while (q < nq) {
        md.reset()
        md.update(prefixes(q))
        md.update(sh)
        val h = hex(md.digest())
        var r = 0
        while (r < 4) {
          val slot = q * 4 + r
          val off = r * 8
          val cur = mins(slot)
          var replace = cur == null
          if (!replace) {
            // lexicographic compare of 8 ascii-hex bytes
            var c = 0
            var done = false
            while (c < 8 && !done) {
              val d = (h(off + c) & 0xff) - (cur(c) & 0xff)
              if (d != 0) { replace = d < 0; done = true }
              c += 1
            }
          }
          if (replace) {
            val copy = new Array[Byte](8)
            System.arraycopy(h, off, copy, 0, 8)
            mins(slot) = copy
          }
          r += 1
        }
        q += 1
      }
      s += 1
    }
    val out = new Array[Any](k + bands)
    var i = 0
    while (i < k) {
      out(i) = UTF8String.fromBytes(mins(i))
      i += 1
    }
    var b = 0
    while (b < bands) {
      md.reset()
      md.update((b.toString + "|").getBytes)
      var j = b * rowsPerBand
      while (j < (b + 1) * rowsPerBand) {
        md.update(mins(j))
        if (j < (b + 1) * rowsPerBand - 1) md.update('|'.toByte)
        j += 1
      }
      out(k + b) = UTF8String.fromBytes(hex(md.digest()))
      b += 1
    }
    new GenericArrayData(out)
  }
}
