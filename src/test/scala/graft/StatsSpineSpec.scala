package graft

import org.apache.spark.sql.functions._
import graft.operators.StatsSpine

/** File-level min/max data-skipping spine: the physical claims the
  * `layout_stats_pruned_scan` hash gate can't see — strictly fewer
  * files scanned than written, superset-then-filter correctness,
  * null-stats and empty-survivor edge cases, and the append fold.
  */
class StatsSpineSpec extends SparkSpec {

  private def laidOut(n: Int = 8): (String, Long) = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-spine").toString
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    df.repartitionByRange(n, col("k")).sortWithinPartitions("k")
      .write.parquet(s"$base/data")
    (base, 1000L)
  }

  test("pruned read scans strictly fewer files and returns exactly the band") {
    val (base, _) = laidOut()
    val spine = StatsSpine.build(spark, s"$base/data", Seq("k"))
    val total = spine.count()
    assert(total >= 4, "layout should produce several files")
    // spine accounting is complete: file row counts sum to the table
    assert(spine.agg(sum("n_rows")).head.getLong(0) == 1000L)
    val surv = StatsSpine.survivors(spine, "k", 200L, 299L).count()
    assert(surv < total, s"pruning must drop files ($surv of $total kept)")
    val got = StatsSpine.prunedRead(spark, s"$base/data", spine, "k", 200L, 299L)
      .filter(col("k").between(200L, 299L))
    assert(got.count() == 100L)
    assert(got.agg(min("k"), max("k")).head.toSeq == Seq(200L, 299L))
  }

  test("empty survivor set returns a typed empty frame, not a crash") {
    val (base, _) = laidOut()
    val spine = StatsSpine.build(spark, s"$base/data", Seq("k"))
    val got = StatsSpine.prunedRead(spark, s"$base/data", spine, "k", 5000L, 6000L)
    assert(got.count() == 0L)
    assert(got.schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("all-null stats files are pruned; mixed-null files keep non-null bounds") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-spine-null").toString
    // one file of all-null k, one file with nulls mixed into [10, 19]
    // (append lands the second writer's part file in the same dir)
    Seq.fill(5)(Option.empty[Long]).map((_, "n")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$base/data")
    ((10L to 19L).map(Option(_)) ++ Seq.fill(3)(Option.empty[Long]))
      .map((_, "m")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(s"$base/data")
    val spine = StatsSpine.build(spark, s"$base/data", Seq("k"))
    // a range predicate never accepts null → the all-null file must go
    val surv = StatsSpine.survivors(spine, "k", 0L, 100L)
    assert(surv.count() == 1L)
    val got = StatsSpine.prunedRead(spark, s"$base/data", spine, "k", 12L, 15L)
      .filter(col("k").between(12L, 15L))
    assert(got.count() == 4L)
  }

  test("append fold: spine over base+batch == rebuild over the union") {
    import spark.implicits._
    val (base, _) = laidOut()
    val batchDir = s"$base/batch"
    (2000L until 2100L).map(i => (i, s"b$i")).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.parquet(batchDir)
    val folded = StatsSpine.append(spark,
      StatsSpine.build(spark, s"$base/data", Seq("k")), batchDir, Seq("k"))
    // fold cost ∝ batch, result complete: batch band served from the
    // folded spine (explicit file paths span both directories)
    val got = StatsSpine.prunedRead(spark, s"$base/data", folded, "k", 2000L, 2049L)
      .filter(col("k").between(2000L, 2049L))
    assert(got.count() == 50L)
    assert(folded.agg(sum("n_rows")).head.getLong(0) == 1100L)
    // base-band queries keep working off the folded spine too
    assert(StatsSpine.prunedRead(spark, s"$base/data", folded, "k", 0L, 9L)
      .filter(col("k").between(0L, 9L)).count() == 10L)
  }
}
