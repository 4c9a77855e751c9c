package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for expensive per-row stages (r16,
  * guide §2.5 "input skew: one huge unsplittable file … repartition
  * immediately after the read").
  *
  * The bench corpora ship each table as ONE small parquet file with one
  * row group, so every scan plans ONE input split — and a narrow chain
  * of expensive per-row work behind it (PNG render + codec decode,
  * minhash/shingle HOFs, per-name edit distances) runs on ONE core of
  * a 32-core box until the first exchange (measured: the whole 2.8 s
  * multimodal feature pipeline in a single task). Lowering
  * `spark.sql.files.maxPartitionBytes` cannot help: a split must
  * contain a row group.
  *
  * [[widen]] repartitions ONLY when the planned scan parallelism is
  * below the cluster's (`defaultParallelism`) — at production scale,
  * where the table is thousands of files/row groups, the condition is
  * false and NO shuffle is added; at bench scale it trades one tiny
  * round-robin shuffle of the source rows for full-width execution of
  * the expensive stage. Row sets are preserved exactly (round-robin
  * placement; every downstream operator here is order-insensitive and
  * the engine's results are partitioning-invariant by contract —
  * `determinism_check.py` runs Verify at two widths).
  */
object FanOut {

  def widen(df: DataFrame): DataFrame = {
    // a streaming frame cannot be planned eagerly (df.rdd throws) and
    // its micro-batch parallelism is the trigger's business — pass it
    // through untouched
    if (df.isStreaming) df
    else if (df.queryExecution.sparkPlan.find {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
        case _ => false
      }.isDefined) {
      // an upstream shuffle already redistributes to full width — and,
      // critically, probing df.rdd on a plan WITH exchanges makes AQE
      // MATERIALIZE those stages (real jobs, re-run again by the
      // actual query since stage reuse does not cross executions);
      // measured: +0.26 s on sim_quantized_topk's pre-repartitioned
      // codes before this guard (r16)
      df
    } else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      // planned partitions of the physical scan — exchange-free plan,
      // so the RDD is built statically and no job is run
      val cur = df.rdd.getNumPartitions
      if (cur >= par) df else df.repartition(par)
    }
  }
}
