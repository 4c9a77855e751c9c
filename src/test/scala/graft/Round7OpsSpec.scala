package graft

import org.apache.spark.sql.functions._

/** Specs for the round-7 hygiene fixes: iterative-operator cache
  * lifetime, non-finite quantization inputs, z-order input guards.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: leaves no persistent RDDs behind (materialize-then-release)") {
    // The registry caller materializes at an unknown later point, so
    // run() itself must release its persisted intermediates — a
    // long-lived Verify/Bench session must not accumulate cache
    // entries across invocations (VERDICT r4 "what's wrong" #1).
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = ExtQueries.graphPageRank(spark, sfSmoke)
    assert(df.count() > 0)
    // a second consumption of the SAME returned frame must not replay
    // the iteration cascade against now-cold caches incorrectly either
    assert(df.agg(sum("rank_fp")).as[Long].head() > 0)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after == before,
      s"graphPageRank stranded ${after - before} persistent RDD(s)")
  }

  test("pageRank: result unchanged by the spine collapse (2-cycle + star re-check)") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val got = operators.PageRank.run(edges, iterations = 3)
      .select("node", "out_deg", "rank_fp").as[(String, Long, Long)]
      .collect().toSet
    val half = operators.PageRank.Scale / 2
    assert(got == Set(("a", 1L, half), ("b", 1L, half)), s"unexpected: $got")
  }

  test("quantize_i8d: non-finite elements pass through instead of crashing") {
    // BigDecimal.valueOf(NaN/Inf) throws — one bad embedding element
    // must not kill a corpus-wide query (ADVICE r4). Mirrors Spark's
    // RoundBase: non-finite in, non-finite out.
    val d = Seq(
      (1L, Array(1.0f, Float.NaN, -2.0f)),
      (2L, Array(Float.PositiveInfinity, 1.0f)),
      (3L, Array(3.0f, -1.5f))
    ).toDF("id", "emb")
    val got = d.select($"id", expr("quantize_i8d(emb)").as("q"))
      .as[(Long, Array[Double])].collect().toMap
    // NaN ignored by the max pass: scale = 2/127, finite elements quantize
    assert(got(1L)(0) == 64.0 && got(1L)(1).isNaN && got(1L)(2) == -127.0,
      s"unexpected: ${got(1L).toSeq}")
    // Inf dominates the max pass: scale = Inf, Inf/Inf = NaN, 1/Inf -> 0
    assert(got(2L)(0).isNaN && got(2L)(1) == 0.0, s"unexpected: ${got(2L).toSeq}")
    // untouched finite row still exact
    assert(got(3L).toSeq == Seq(127.0, -64.0), s"unexpected: ${got(3L).toSeq}")
  }

  test("zorderKey: negative or out-of-range input fails loudly, not silently") {
    val neg = Seq((-1L, 2L)).toDF("a", "b")
    val e1 = intercept[Exception] {
      neg.select(operators.Layout.zorderKey($"a", $"b")).collect()
    }
    assert(e1.getMessage != null)
    val wide = Seq((1L << 22, 2L)).toDF("a", "b")
    val e2 = intercept[Exception] {
      wide.select(operators.Layout.zorderKey($"a", $"b", bits = 21)).collect()
    }
    assert(e2.getMessage != null)
    // valid inputs unchanged by the guard
    val ok = Seq((3L, 5L)).toDF("a", "b")
      .select(operators.Layout.zorderKey($"a", $"b")).as[Long].head()
    // a=11b -> bits at pos 1,3; b=101b -> bits at pos 0,4: 11011b = 27
    assert(ok == 27L, s"unexpected: $ok")
  }
}
