package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned semi-join: build a deterministic Bloom bitmap over the
  * SMALL side's keys (functions.BloomFilterAgg — one aggregate with
  * constant-size OR-merged partial buffers), pull the m/64 longs to the
  * driver (same footprint class as the k-means centroid pulls), and
  * pre-filter the BIG side with a pure-column membership test before
  * the exact semi-join.
  *
  * Exactness by construction: the Bloom test has false positives but NO
  * false negatives, and the exact semi-join that follows removes every
  * false positive — so the result equals the plain semi-join for ANY
  * bitmap content, which is precisely what the oracle gate states (the
  * DuckDB twin is the plain EXISTS semi-join; j7's hash match proves
  * the pruned plan changes nothing).
  *
  * Scale shape (100 TB): the big side's non-matching rows are dropped
  * AT THE SCAN STAGE (the membership test is a scalar filter on md5
  * arithmetic — no join, no shuffle), so only probable matches pay the
  * semi-join shuffle. This is the manual, engine-portable sibling of
  * Spark's AQE runtime bloom filter (spark.sql.optimizer.runtime.
  * bloomFilter.*), for plans the optimizer's injected filter does not
  * reach — pinned/bucketed layouts, multi-stage manual pipelines — and
  * it is deterministic (md5-derived positions, no seeded murmur), so
  * results are reproducible across engines and cluster layouts.
  */
object BloomPrune {

  /** Membership test as ONE native expression (functions.
    * BloomMightContain): digest bytes → 4 positions → 4 bit probes on
    * a baked-in primitive long[]. The composed-column form below is
    * the SQL-stated reference; it paid four hex-string round-trips
    * (md5 → substring → conv) per row — measured 2.9 s for the filter
    * alone on sf0.1 lineitem, which inverted the whole point of
    * pruning (PLANS.md #13).
    */
  def mightContain(key: Column, words: Seq[Long], mBits: Int): Column =
    call_function("bloom_might_contain", key,
      typedLit(words.toIndexedSeq), lit(mBits))

  /** The pure-column reference form (the arithmetic the scaladocs and
    * parity spec state): for each of the 4 md5-derived positions —
    * `conv(substring(md5(key), 1+8i, 8), 16, 10) % mBits`, the same
    * as BloomFilterAgg.insert — test the bit in the bitmap literal.
    * Arithmetic shift is fine: `(w >> s) & 1` equals the logical-shift
    * test for s in 0..63.
    */
  private[graft] def mightContainSql(key: Column, words: Seq[Long], mBits: Int): Column = {
    require(words.length == mBits / 64, s"bitmap length ${words.length} != $mBits/64")
    val hex = md5(key.cast("binary"))
    (0 until graft.functions.BloomFilterAgg.NumHashes).map { i =>
      val pos = conv(substring(hex, 1 + 8 * i, 8), 16, 10).cast("long") % mBits
      // pos < mBits « 2^53, so the double divide inside floor is exact
      val word = element_at(typedLit(words), floor(pos / lit(64)).cast("int") + 1)
      (call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L))
    }.reduce(_ && _)
  }

  /** Semi-join `big` to `small` on big(bigKey) = small(smallKey),
    * Bloom-pruning the big side first. `small` must be aggregable to a
    * bitmap (any size — the bitmap is constant-size; its density, not
    * the key count, sets the false-positive rate: size mBits ≈ 10–15
    * bits per expected distinct key for ~1% FP).
    */
  def semiJoin(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String,
               mBits: Int = 1 << 16): DataFrame = {
    val words = small
      .agg(call_function("bloom_agg",
        col(smallKey).cast("string"), lit(mBits)).as("bm"))
      .head().getSeq[Long](0)
    big
      .filter(mightContain(col(bigKey).cast("string"), words, mBits))
      .join(small.select(col(smallKey)).distinct(),
        col(bigKey) === col(smallKey), "left_semi")
  }
}
