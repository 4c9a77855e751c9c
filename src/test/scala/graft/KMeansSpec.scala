package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** Deterministic k-means: recovers planted clusters, is reproducible,
  * and reduces within-cluster distance across iterations.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def planted = {
    // 3 well-separated clusters around (0,0,..), (10,10,..), (-10,5,..)
    val centers = Seq(Array.fill(8)(0.0), Array.fill(8)(10.0),
      Array.tabulate(8)(d => if (d % 2 == 0) -10.0 else 5.0))
    (0 until 300).map { i =>
      val c = centers(i % 3)
      val noise = Array.tabulate(8)(d => math.sin(i * 13.7 + d) * 0.5)
      (i.toLong, c.zip(noise).map { case (a, b) => (a + b).toFloat }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("recovers planted clusters and is run-to-run deterministic") {
    val df = planted
    val c1 = KMeans.fit(df, k = 3, iterations = 5)
    val c2 = KMeans.fit(df, k = 3, iterations = 5)
    assert(c1.map(_._2.toSeq) == c2.map(_._2.toSeq), "same input must give same centroids")
    val assigned = KMeans.assign(df, c1)
    // every planted cluster maps to exactly one learned cluster
    val purity = assigned.select(col("vec_id"), col("cid"))
      .as[(Long, Int)].collect()
      .groupBy(_._1 % 3).map { case (_, g) => g.groupBy(_._2).values.map(_.size).max.toDouble / g.size }
    assert(purity.forall(_ == 1.0), s"planted clusters not cleanly recovered: $purity")
    // mean within-cluster distance far below the between-center distance
    val meanD2 = assigned.agg(avg(col("d2"))).as[Double].head()
    assert(meanD2 < 10.0, s"within-cluster d2 too large: $meanD2")
  }

  test("more iterations never increase total within-cluster distance") {
    val df = planted
    def cost(iters: Int): Double = {
      val c = KMeans.fit(df, k = 3, iterations = iters)
      KMeans.assign(df, c).agg(sum(col("d2"))).as[Double].head()
    }
    val c1 = cost(1); val c5 = cost(5)
    assert(c5 <= c1 + 1e-9, s"cost went up: $c1 -> $c5")
  }
}
