package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic "latest/best row per key" operator — the reference's single
  * window pattern `ROW_NUMBER() OVER (PARTITION BY k ORDER BY …) = 1`
  * (SURVEY.md §2.5 W1–W5, F6; reference `01_staging_layer.sql:124-127` etc.).
  *
  * Scale notes (100 TB):
  *  - Catalyst ≥3.3 rewrites the `row_number = 1` filter into
  *    `WindowGroupLimit` — a per-partition top-1 pass *before* the shuffle,
  *    so only one candidate row per key per input partition crosses the
  *    network (map-side-combine for window dedup).
  *  - All downstream consumers (joins, further windows on the same key)
  *    reuse the `hashpartitioning(key)` exchange (`ReuseExchange`).
  *  - Callers MUST pass a total order: append a tie-breaker column (e.g. a
  *    source sequence id) or the surviving row is engine-dependent
  *    (SURVEY.md §7.4 item 1).
  */
object LatestPerKey {

  def apply(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "latestPerKey needs an explicit ordering")
    val rn = "__graft_rn"
    df.withColumn(rn, row_number().over(Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Top-k per key generalization (k=1 is the reference's case). */
  def topK(df: DataFrame, k: Int, partitionCols: Seq[Column], orderCols: Seq[Column]): DataFrame = {
    val rn = "__graft_rn"
    df.withColumn(rn, row_number().over(Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Top-k keeping the 1-based rank as `rankCol`. */
  def topKRanked(df: DataFrame, k: Int, partitionCols: Seq[Column], orderCols: Seq[Column],
                 rankCol: String = "rank"): DataFrame =
    df.withColumn(rankCol,
        row_number().over(Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)))
      .filter(col(rankCol) <= k)

  /** Skewed-key escape hatch: two-phase salted top-k.
    *
    * `WindowGroupLimit` already bounds what crosses the wire (top-k per
    * input partition), but the final per-key group still lands in ONE
    * reducer task — a hot key (50% of a 100 TB table) is a straggler AQE
    * will not split (its skew handling covers joins, not windows). Salting
    * splits the hot key over `numSalts` reducers: phase 1 takes top-k per
    * (key, salt), phase 2 reduces the ≤ numSalts×k survivors per key.
    *
    * Because callers pass a TOTAL order (the LatestPerKey contract),
    * top-k is an associative tournament: the union of per-salt top-k
    * contains the global top-k, so the result is identical to the
    * unsalted form for ANY assignment of rows to salts — the salt can be
    * (and is) the physical partition id, costing no hash of row content.
    * Opt in when a key histogram says so; the default plan stays the
    * single-window form, which is cheaper for unskewed keys.
    */
  def salted(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
             numSalts: Int, k: Int = 1): DataFrame = {
    require(numSalts > 0, "salted: numSalts must be positive")
    val saltCol = "__graft_salt"
    val phase1 = topK(
      df.withColumn(saltCol, pmod(spark_partition_id(), lit(numSalts))),
      k, partitionCols :+ col(saltCol), orderCols)
      .drop(saltCol)
    topK(phase1, k, partitionCols, orderCols)
  }

  /** Auto-trigger for [[salted]]: measures the heaviest key's share of a
    * seeded key sample (one cheap count-per-key aggregation — map-side
    * combined, only distinct sampled keys shuffle) and routes through
    * the salted two-phase form when that share reaches `hotKeyShare`;
    * otherwise plans the stock single-window form, which is cheaper for
    * unskewed keys. Opt-in because the histogram costs an eager job at
    * plan time — the shape AQE cannot provide for windows (its skew
    * handling splits join partitions, not window groups).
    *
    * The OUTPUT is identical on both routes — [[salted]] ≡ unsalted for
    * any salt assignment because top-k under the caller's total order is
    * an associative tournament — so the sampled histogram influences
    * only the physical plan, never the result (sampling nondeterminism
    * cannot leak into query output, keeping the oracle contract).
    */
  def adaptive(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
               k: Int = 1, hotKeyShare: Double = 0.25, numSalts: Int = 16,
               sampleFraction: Double = 0.05): DataFrame = {
    require(hotKeyShare > 0 && hotKeyShare <= 1, "adaptive: hotKeyShare in (0, 1]")
    // alias the keys before sampling: grouping by the original Column
    // objects would re-resolve their source columns against the projected
    // frame and fail for expression-valued keys (e.g. md5(col("text")))
    // that topK/salted accept
    val keyNames = partitionCols.indices.map(i => s"__graft_k$i")
    val stats = df.select(partitionCols.zip(keyNames).map { case (c, n) => c.as(n) }: _*)
      .sample(withReplacement = false, sampleFraction, seed = 42L)
      .groupBy(keyNames.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__max"), sum(col("__n")).as("__tot"))
      .head()
    val isHot = !stats.isNullAt(0) && stats.getLong(1) > 0 &&
      stats.getLong(0).toDouble / stats.getLong(1).toDouble >= hotKeyShare
    if (isHot) salted(df, partitionCols, orderCols, numSalts, k)
    else topK(df, k, partitionCols, orderCols)
  }
}
