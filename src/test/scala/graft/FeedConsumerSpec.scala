package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{FeedConsumer, Publish, VersionedTable}

/** Consumer-loop claims the `layout_feed_consumer` hash gate can't
  * see: bounded catch-up under maxVersionsPerWake (the
  * maxFilesPerTrigger analog), offset monotonicity across paginated
  * wakes, and exact convergence to the head.
  */
class FeedConsumerSpec extends SparkSpec {

  private val spec = VersionedTable.Spec(Seq("k"), "k", 1 << 13)

  test("paginated catch-up: a backlog folds in bounded bites, converging exactly") {
    import spark.implicits._
    val tableRoot = java.nio.file.Files.createTempDirectory("graft-fc-t").toString
    val derivedRoot = java.nio.file.Files.createTempDirectory("graft-fc-d").toString
    val layout = (df: DataFrame) =>
      df.repartitionByRange(2, col("k")).sortWithinPartitions("k")
    def count(df: DataFrame): DataFrame = df.agg(sum(col("k")).as("sum_k"))
    def foldSum(state: DataFrame, feed: DataFrame): DataFrame = {
      val ins = feed.filter(col("change_type") === "insert")
        .agg(coalesce(sum(col("k")), lit(0L)).as("d"))
      val del = feed.filter(col("change_type") === "delete")
        .agg(coalesce(sum(col("k")), lit(0L)).as("d"))
      state.crossJoin(ins.select(col("d").as("__i")))
        .crossJoin(del.select(col("d").as("__d")))
        .select((col("sum_k") + col("__i") - col("__d")).as("sum_k"))
    }
    def wake(max: Int) = FeedConsumer.advance(
      spark, tableRoot, derivedRoot, count, foldSum, maxVersionsPerWake = max)
    VersionedTable.create(spark,
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), tableRoot, spec, layout)
    assert(wake(1)._2 == "bootstrap")
    // backlog: three data commits while the consumer sleeps
    VersionedTable.append(spark,
      (100L until 200L).map(i => (i, s"v$i")).toDF("k", "v"), tableRoot, spec, layout)
    VersionedTable.deleteRosterDV(spark, tableRoot, spec,
      (0L until 200L by 5L).toDF("k"))
    VersionedTable.append(spark,
      (200L until 300L).map(i => (i, s"v$i")).toDF("k", "v"), tableRoot, spec, layout)
    // bounded bites: each wake consumes ONE version of the backlog
    val (d1, a1) = wake(1)
    assert(a1 == "fold")
    assert(Publish.readMeta(derivedRoot, d1)("consumed_upto") == "v00002")
    val (d2, a2) = wake(1)
    assert(a2 == "fold")
    assert(Publish.readMeta(derivedRoot, d2)("consumed_upto") == "v00003")
    val (d3, a3) = wake(1)
    assert(a3 == "fold")
    val (d4, a4) = wake(1)
    assert(a4 == "noop" && d4 == d3, "a caught-up paginated wake must no-op")
    // exact convergence: folded sum == head sum
    val expect = VersionedTable.read(spark, tableRoot)
      .agg(sum(col("k"))).head.getLong(0)
    assert(Publish.read(spark, derivedRoot).head.getLong(0) == expect)
  }
}
