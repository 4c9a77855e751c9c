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

  /** Closed-loop skew routing for joins — the join-side sibling of
    * [[graft.operators.LatestPerKey.adaptive]], connecting the
    * `qa_key_skew` histogram shape to the salted escape hatch: a
    * seeded key sample of the LEFT (large) side measures the heaviest
    * key's share; at `hotKeyShare` or above the join routes through
    * the replicate-and-salt form, below it the stock join plans (the
    * ×numSalts replication of the right side is pure cost when no key
    * is hot). Opt-in because the histogram is an eager job at plan
    * time — the shape AQE cannot provide off pre-partitioned/bucketed
    * layouts or pinned non-SMJ plans.
    *
    * The OUTPUT is identical on both routes (the [[apply]] exactness
    * contract: each pair meets exactly once under any salt
    * assignment), so the sampled histogram influences only the
    * physical plan, never the result — sampling nondeterminism cannot
    * leak into query output, keeping the oracle contract.
    */
  def adaptive(left: DataFrame, right: DataFrame, keys: Seq[String],
               joinType: String = "inner", hotKeyShare: Double = 0.25,
               numSalts: Int = 16, sampleFraction: Double = 0.05): DataFrame = {
    require(hotKeyShare > 0 && hotKeyShare <= 1, "adaptive: hotKeyShare in (0, 1]")
    val stats = left.select(keys.map(col): _*)
      .sample(withReplacement = false, sampleFraction, seed = 42L)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__max"), sum(col("__n")).as("__tot"))
      .head()
    val isHot = !stats.isNullAt(0) && stats.getLong(1) > 0 &&
      stats.getLong(0).toDouble / stats.getLong(1).toDouble >= hotKeyShare
    if (isHot) apply(left, right, keys, numSalts, joinType)
    else left.join(right, keys, joinType)
  }
}
