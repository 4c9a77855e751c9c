package graft

import org.apache.spark.sql.functions._
import graft.staging.StagingLayer

/** Batch-incremental staging must be a fold: chaining any number of
  * increments over any split of the activity log equals the one-shot
  * batch view (top-1 per key under a total order is associative).
  */
class IncrementalStagingSpec extends SparkSpec {

  test("three chained increments equal the one-shot batch view") {
    val acts = Derive.stgActivities(spark, sfSmoke)
    val ties = Seq("src_seq")
    val batch = StagingLayer.cleanContactsPrimary(acts, ties)
      .collect().map(_.toString).sorted.toSeq

    val parts = (0 until 3).map(i => acts.filter(col("src_seq") % 3 === i))
    val state0 = StagingLayer.primaryState(parts(0), ties)
    val state1 = StagingLayer.incrementPrimary(state0, parts(1), ties)
    val state2 = StagingLayer.incrementPrimary(state1, parts(2), ties)
    val inc = StagingLayer.stateToView(state2)
      .collect().map(_.toString).sorted.toSeq

    assert(inc == batch)
  }

  test("an empty delta is a no-op") {
    val acts = Derive.stgActivities(spark, sfSmoke)
    val ties = Seq("src_seq")
    val state = StagingLayer.primaryState(acts, ties)
    val after = StagingLayer.incrementPrimary(
      state, acts.filter(lit(false)), ties)
    assert(StagingLayer.stateToView(after).collect().map(_.toString).sorted.toSeq ==
      StagingLayer.stateToView(state).collect().map(_.toString).sorted.toSeq)
  }
}
