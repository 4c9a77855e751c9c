package graft

import org.apache.spark.sql.functions._
import graft.operators.LatestPerKey
import graft.plans.TopKPerKey

/** The native whole-operator top-k (LogicalPlan+Strategy+SparkPlan) must
  * return exactly the window form's rows for any data and k, and its
  * physical plan must show the two-phase (partial → exchange → final)
  * shape with no sort.
  */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("native ≡ window topK on random data (sets), k ∈ {1, 3, 10}") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { round =>
      val rows = List.fill(300)((rnd.nextInt(7), rnd.nextInt(40), rnd.nextInt(1000000))).distinct
      val df = rows.toDF("k", "ord", "seq").repartition(8)
      val order = Seq(col("ord").desc_nulls_last, col("seq").asc_nulls_first)
      for (k <- Seq(1, 3, 10)) {
        val window = LatestPerKey.topK(df, k, Seq(col("k")), order)
          .as[(Int, Int, Int)].collect().toSet
        val native = TopKPerKey(df, Seq(col("k")), order, k)
          .as[(Int, Int, Int)].collect().toSet
        assert(native == window, s"round=$round k=$k")
      }
    }
  }

  test("k larger than every group returns the full input") {
    val df = Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v")
    val out = TopKPerKey(df, Seq(col("k")), Seq(col("v").asc_nulls_first), 100)
      .as[(Int, Int)].collect().toSet
    assert(out == Set((1, 10), (1, 20), (2, 30)))
  }

  test("physical plan: partial/final around one exchange; full-input sort avoided") {
    val df = TopKPerKey(
      spark.read.parquet(s"$sfSmoke/orders.parquet"),
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix; partial=true/false show as args
    assert("TopKPerKey \\[".r.findAllIn(plan).size >= 2, plan.take(3000))
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan.take(3000))
    // the only sort is the final phase's spillable sort of the
    // partial-REDUCED candidates (above the exchange); the map side
    // below the exchange streams with heaps, no sort of the full input
    val finalSection = plan.split("== Initial Plan ==")(0)
    val belowExchange = finalSection.substring(
      finalSection.indexOf("Exchange hashpartitioning"))
    assert(!belowExchange.contains("Sort "), plan.take(3000))
  }

  test("partial flush cap preserves exactness under high key cardinality") {
    // cap of 2 tracked keys forces constant chunk flushes; the final
    // phase must still reduce to exactly the window form's rows
    spark.conf.set("spark.graft.nativeTopK.partialFlushGroups", "2")
    try {
      val rnd = new scala.util.Random(23)
      val rows = List.fill(500)((rnd.nextInt(50), rnd.nextInt(40), rnd.nextInt(1000000))).distinct
      val df = rows.toDF("k", "ord", "seq").repartition(6)
      val order = Seq(col("ord").desc_nulls_last, col("seq").asc_nulls_first)
      val window = LatestPerKey.topK(df, 2, Seq(col("k")), order)
        .as[(Int, Int, Int)].collect().toSet
      val native = TopKPerKey(df, Seq(col("k")), order, 2)
        .as[(Int, Int, Int)].collect().toSet
      assert(native == window)
    } finally spark.conf.unset("spark.graft.nativeTopK.partialFlushGroups")
  }
}
