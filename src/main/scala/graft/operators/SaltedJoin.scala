package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling equi-join escape hatch: replicate-and-salt.
  *
  * AQE's skew-join splitting handles most hot keys, but only at
  * sort-merge-join shuffle boundaries it can see; when a skewed join
  * must run off a pre-partitioned/bucketed layout, or the optimizer is
  * pinned out of SMJ, the manual form is: the large (skewed) side gets
  * `salt = partition_id mod n` (no row-content hash needed — any
  * assignment works), the smaller-but-not-broadcastable side is
  * replicated ×n carrying every salt, and the join key becomes
  * (key, salt) — a hot key's rows spread over n reducers.
  *
  * Exactness: every left row holds exactly ONE salt and the right side
  * carries ALL salts, so each (left row, right row) pair meets exactly
  * once — the result is row-identical to the plain join for `inner` and
  * `left` joins. Right/full outer are rejected: an unmatched RIGHT row
  * appears once per replica. Cost: right side ×n rows across the wire —
  * pay it only when a key histogram (LatestPerKey.adaptive's trigger
  * shape) says the skew is real.
  */
object SaltedJoin {

  def apply(left: DataFrame, right: DataFrame, keys: Seq[String], numSalts: Int,
            joinType: String = "inner"): DataFrame = {
    require(numSalts > 0, "SaltedJoin: numSalts must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"SaltedJoin: only inner/left joins are exact under replication, got $joinType")
    val salt = "__graft_jsalt"
    val l = left.withColumn(salt, pmod(spark_partition_id(), lit(numSalts)))
    val r = right.withColumn(salt, explode(sequence(lit(0), lit(numSalts - 1))))
    l.join(r, keys :+ salt, joinType).drop(salt)
  }
}
