package graft

import org.apache.spark.sql.functions._

/** Round-14 ops: r8-verdict/advice hardening (solveAuto routing
  * observability, numeric batch-id recovery, degenerate dedup-eval
  * guards) and the stored/incremental graph-artifact family.
  */
class Round14OpsSpec extends SparkSpec {

  test("solveAuto: distributed star fallback fires past maxCollected") {
    import spark.implicits._
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val before = operators.ConnectedComponents.starFallbacks.get()
    val got = operators.ConnectedComponents
      .solveAuto(verts, edges, maxCollected = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the routing decision itself is what's under test: past the bound
    // the distributed contraction MUST run (a silent driver collect
    // here is the corpus-scale OOM VERDICT r8 #7 is about)
    assert(operators.ConnectedComponents.starFallbacks.get() > before)
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)))
  }

  test("solveAuto: driver union-find past 100k edges flags centralization") {
    val n = operators.ConnectedComponents.DriverPathWarnEdges + 1
    val edges = spark.range(n)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val verts = spark.range(n + 1).select(col("id"))
    val before = operators.ConnectedComponents.driverPathWarnings.get()
    val got = operators.ConnectedComponents
      .solveAuto(verts, edges, maxCollected = 10000000L)
    assert(got.agg(countDistinct(col("component"))).head().getLong(0) == 1L)
    assert(operators.ConnectedComponents.driverPathWarnings.get() > before)
  }

  test("readCommitted: numeric batch-id max across the 5→6 digit widening") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-rc-width").toString
    // 'batch-100000' sorts BEFORE 'batch-99999' as text — the numeric
    // parse must still pick it (ADVICE r8)
    assert(streaming.StreamingStage.commitBatch(Seq(99999L).toDF("v"), root, 99999L))
    assert(streaming.StreamingStage.commitBatch(Seq(100000L).toDF("v"), root, 100000L))
    val got = streaming.StreamingStage.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(100000L))
  }

  test("dedupEvalMetrics: degenerate zero counts report zero, not NULL/crash") {
    import spark.implicits._
    val zeroAll = ExtQueries.dedupEvalMetrics(
      Seq((0L, 0L, 0L)).toDF("n_truth", "n_detected", "tp")).head()
    assert(zeroAll.getAs[Number]("precision_ppm").longValue() == 0L)
    assert(zeroAll.getAs[Number]("recall_ppm").longValue() == 0L)
    assert(zeroAll.getAs[Number]("f1_ppm").longValue() == 0L)
    // tp = 0 with non-empty sides: ratios are well-defined zeros and f1
    // hits its own 0/0 — the second guard
    val tpZero = ExtQueries.dedupEvalMetrics(
      Seq((10L, 5L, 0L)).toDF("n_truth", "n_detected", "tp")).head()
    assert(tpZero.getAs[Number]("precision_ppm").longValue() == 0L)
    assert(tpZero.getAs[Number]("f1_ppm").longValue() == 0L)
    // sanity on the live arithmetic: tp=3 of truth=4/det=6
    val live = ExtQueries.dedupEvalMetrics(
      Seq((4L, 6L, 3L)).toDF("n_truth", "n_detected", "tp")).head()
    assert(live.getAs[Number]("precision_ppm").longValue() == 500000L)
    assert(live.getAs[Number]("recall_ppm").longValue() == 750000L)
    assert(live.getAs[Number]("f1_ppm").longValue() ==
      2L * 500000L * 750000L / (500000L + 750000L))
  }
}
