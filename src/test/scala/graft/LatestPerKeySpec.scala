package graft

import org.apache.spark.sql.functions._
import graft.operators.LatestPerKey

/** Property-style tests for the latest-per-key operator (SURVEY.md §5.2
  * item 3): exactly one row per key, output ⊆ input, selected row is
  * minimal under the declared total order, idempotence. Uses a seeded
  * generator (the offline cache has no scalatest↔scalacheck bridge).
  */
class LatestPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("one row per key; min under order; idempotent (20 random sets)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val rows = List.fill(60)((rnd.nextInt(8), rnd.nextInt(6), rnd.nextInt(1000000))).distinct
      val df = rows.toDF("k", "ord", "seq")
      val order = Seq(col("ord").desc_nulls_last, col("seq").asc_nulls_first)
      val out = LatestPerKey(df, Seq(col("k")), order)
      val got = out.as[(Int, Int, Int)].collect().toSeq.sorted
      val expected = rows.groupBy(_._1).map { case (_, g) =>
        g.minBy(r => (-r._2, r._3))
      }.toSeq.sorted
      assert(got == expected)
      val again = LatestPerKey(out, Seq(col("k")), order)
        .as[(Int, Int, Int)].collect().toSeq.sorted
      assert(again == got)
    }
  }

  test("salted ≡ unsalted on random data including a 50%-hot key") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { round =>
      // half the rows land on hot key 0, rest spread over keys 1..7
      val rows = List.fill(400) {
        val k = if (rnd.nextBoolean()) 0 else 1 + rnd.nextInt(7)
        (k, rnd.nextInt(50), rnd.nextInt(1000000))
      }.distinct
      val df = rows.toDF("k", "ord", "seq").repartition(8)
      val order = Seq(col("ord").desc_nulls_last, col("seq").asc_nulls_first)
      for (salts <- Seq(1, 4, 16); k <- Seq(1, 3)) {
        val plain = LatestPerKey.topK(df, k, Seq(col("k")), order)
          .as[(Int, Int, Int)].collect().toSeq.sorted
        val salted = LatestPerKey.salted(df, Seq(col("k")), order, salts, k)
          .as[(Int, Int, Int)].collect().toSeq.sorted
        assert(salted == plain, s"round=$round salts=$salts k=$k")
      }
    }
  }

  test("adaptive: salted plan engages on a 50%-hot key, stock plan when uniform") {
    val order = Seq(col("ord").desc_nulls_last, col("seq").asc_nulls_first)
    // 50% of rows on one key → the sampled histogram must route salted
    val hotRows = (1 to 900).map(i => ("hot", i % 97, i)) ++
      (1 to 900).map(i => (s"k${i % 90}", i % 97, i + 10000))
    val hot = hotRows.toDF("k", "ord", "seq").repartition(8)
    val auto = LatestPerKey.adaptive(hot, Seq(col("k")), order,
      k = 1, hotKeyShare = 0.25, numSalts = 4, sampleFraction = 1.0)
    assert(auto.queryExecution.analyzed.toString.toLowerCase.contains("spark_partition_id"),
      "hot-key fixture must take the salted route")
    val stock = LatestPerKey(hot, Seq(col("k")), order)
      .as[(String, Int, Int)].collect().toSeq.sorted
    val got = auto.as[(String, Int, Int)].collect().toSeq.sorted
    assert(got == stock, "salted route must match the unsalted oracle")
    // uniform keys (max share 1%) → the stock single-window plan
    val flat = (1 to 1000).map(i => (s"k${i % 100}", i % 97, i))
      .toDF("k", "ord", "seq").repartition(8)
    val auto2 = LatestPerKey.adaptive(flat, Seq(col("k")), order,
      k = 1, hotKeyShare = 0.25, numSalts = 4, sampleFraction = 1.0)
    assert(!auto2.queryExecution.analyzed.toString.toLowerCase.contains("spark_partition_id"),
      "uniform fixture must keep the stock plan")
  }

  test("adaptive accepts expression-valued keys like topK/salted do") {
    // regression: the histogram used to re-resolve the key expression
    // against a projected frame and throw AnalysisException for
    // md5(col(...))-style keys
    val df = (1 to 200).map(i => (s"t${i % 9}", i)).toDF("text", "seq")
    val out = LatestPerKey.adaptive(df, Seq(md5(col("text").cast("binary"))),
      Seq(col("seq").desc_nulls_last), k = 1, sampleFraction = 1.0)
      .as[(String, Int)].collect()
    val expected = LatestPerKey(df, Seq(md5(col("text").cast("binary"))),
      Seq(col("seq").desc_nulls_last)).as[(String, Int)].collect()
    assert(out.sorted.toSeq == expected.sorted.toSeq && out.length == 9)
  }

  test("topK returns at most k per key and includes the top-1") {
    val df = (1 to 100).map(i => (i % 5, i)).toDF("k", "v")
    val top3 = LatestPerKey.topK(df, 3, Seq(col("k")), Seq(col("v").desc_nulls_last))
      .as[(Int, Int)].collect().toSeq
    assert(top3.groupBy(_._1).forall(_._2.size == 3))
    val top1 = LatestPerKey(df, Seq(col("k")), Seq(col("v").desc_nulls_last))
      .as[(Int, Int)].collect().toSet
    assert(top1.subsetOf(top3.toSet))
  }
}
