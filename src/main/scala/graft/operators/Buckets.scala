package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded LSH-bucket candidate generation — the shared shape of the
  * sketch dedups (minhash bands, simhash blocks, n-gram postings).
  *
  * `groupBy(bucket).agg(collect_list(member))` expands pairs inside each
  * bucket task; a degenerate bucket value (short/empty docs collapsing to
  * one band or block) would otherwise collect an unbounded member list
  * into ONE aggregation buffer and then expand |B|² pairs in one task —
  * a straggler/OOM at 100 TB. Buckets larger than `cap` carry no
  * similarity signal (they are stop-bucket noise, like a ubiquitous
  * 3-gram) and are dropped from candidate generation; a true near-dup
  * pair still collides in its other, non-degenerate buckets, so recall
  * is lost only for pairs whose EVERY shared bucket is degenerate.
  * Oracles must apply the identical count-based cap.
  */
object Buckets {

  /** Default cap, shared with the n-gram posting cap. */
  val DefaultCap = 500

  /** (bucket, members) with 2..cap members per bucket; singleton buckets
    * yield no pairs and are pruned with the same filter.
    */
  def boundedMembers(df: DataFrame, bucket: Column, member: Column,
                     cap: Int = DefaultCap): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(collect_list(member).as("members"))
      .filter(size(col("members")) > 1 && size(col("members")) <= cap)
}
