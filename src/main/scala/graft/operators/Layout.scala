package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning: a Z-order (Morton)
  * key interleaves the bits of two clustering columns so that rows
  * close in BOTH dimensions land close on the one-dimensional sort
  * order. Range-partitioning + sorting by that key gives every output
  * file a tight bounding box in both dimensions at once — a box
  * predicate (`part BETWEEN .. AND supp BETWEEN ..`) then prunes most
  * files on parquet min/max stats, where a linear (a, then b) sort
  * only ever prunes on the leading column. This is the engine-portable
  * form of Delta/Iceberg `OPTIMIZE ZORDER BY`; at 100 TB, layout is
  * the difference between scanning 100 TB and scanning the ~1% of
  * files whose boxes intersect the query.
  *
  * The key is pure codegen'd bit arithmetic (shift/and/or per bit —
  * no UDF, no allocation), and deterministic, so a DuckDB oracle can
  * state the identical interleave with `>> & <<`.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integral columns: a's bit i lands at position 2i+1, b's at 2i.
    * 21 bits/dim by default (42-bit keys — ~2M distinct values per
    * dimension; raise toward 31 for wider domains, 2·bits ≤ 62).
    *
    * FAILS LOUDLY (raise_error) on a negative input or one ≥ 2^bits:
    * two's-complement interleaving of a negative produces a
    * non-monotone key (useless bounding boxes), and silent truncation
    * of a too-wide value aliases distant rows into the same key range
    * — both corrupt the layout invisibly, so they must not pass.
    */
  def zorderKey(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"zorderKey: bits in [1,31], got $bits")
    val av = a.cast("long")
    val bv = b.cast("long")
    val max = lit(1L << bits)
    val key = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(av, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(bv, i).bitwiseAND(lit(1L)), 2 * i))
    }
    when(av < 0 || av >= max || bv < 0 || bv >= max,
      raise_error(concat(
        lit(s"zorder_key: inputs must be in [0, 2^$bits); got ("),
        av.cast("string"), lit(", "), bv.cast("string"), lit(")"))))
      .otherwise(key)
  }

  /** Cluster `df` for (a, b) box queries: range-partition on the
    * Z-key (RangePartitioner samples the key distribution, so output
    * files are balanced even under skew), then sort within partitions
    * so parquet row-group stats are tight too.
    */
  def zorderLayout(df: DataFrame, numPartitions: Int, a: Column, b: Column,
                   bits: Int = 21): DataFrame = {
    val keyed = df.withColumn("__zkey", zorderKey(a, b, bits))
    keyed.repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}
