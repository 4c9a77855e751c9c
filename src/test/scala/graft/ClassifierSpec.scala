package graft

import org.apache.spark.sql.functions._

/** Contracts for the trained centroid classifier
  * (ExtQueries.pipelineClassifierCentroid): the distilled model must
  * actually LEARN (holdout accuracy above the majority baseline — a
  * training loop that degenerates to the majority class would still
  * hash-gate, so the gate alone can't see this), training must be
  * partition-invariant (the fixed-point class sums are exact integer
  * adds), and scoring must stay a pure projection (no shuffle: the
  * trained weights are literals, so the scoring pass over 100 TB is
  * scan+project only).
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("holdout accuracy beats the majority baseline (the model learns)") {
    val out = ExtQueries.pipelineClassifierCentroid(spark, sfDir)
      .filter($"split" === "test")
      .select($"label", $"correct").as[(Long, Boolean)].collect()
    assert(out.nonEmpty)
    val acc = out.count(_._2).toDouble / out.length
    val majority = {
      val pos = out.count(_._1 == 1L).toDouble / out.length
      math.max(pos, 1 - pos)
    }
    assert(acc > majority + 0.05,
      f"holdout acc $acc%.4f does not beat majority $majority%.4f — the distilled model did not learn")
  }

  test("retraining is deterministic: margins bit-identical run over run") {
    // the training aggregate's class sums are integer adds
    // (associative + exact), so retraining must reproduce every margin
    // bit-identically; cross-partitioning invariance is covered by the
    // driver's 7- vs 13-thread determinism check over the gate output
    val a = ExtQueries.pipelineClassifierCentroid(spark, sfDir)
      .select($"doc_id", $"margin").as[(Long, Long)].collect().toMap
    val b = ExtQueries.pipelineClassifierCentroid(spark, sfDir)
      .select($"doc_id", $"margin").as[(Long, Long)].collect().toMap
    assert(a == b, "two trainings over the same corpus diverged")
  }

  test("scoring plan is scan+project only — no shuffle, no join") {
    val plan = ExtQueries.pipelineClassifierCentroid(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("label distribution is non-degenerate and split covers both tags") {
    val out = ExtQueries.pipelineClassifierCentroid(spark, sfDir)
    val labels = out.groupBy("label").count().as[(Long, Long)].collect().toMap
    assert(labels.keySet == Set(1L, -1L), s"degenerate label set: $labels")
    val splits = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.keySet == Set("train", "test"), s"split tags: $splits")
  }
}
