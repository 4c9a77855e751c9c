package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** Property test: the union+window as-of join equals a brute-force
  * per-row maximum over eligible right rows, on seeded random data
  * including no-match and equal-time cases.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("NULL right values attach atomically (no mixing of right rows)") {
    // right rows: (t=3, rt=3, v=1.0) then (t=5, rt=5, v=NULL); a left row
    // at t=6 must get the LATEST right row whole: (5, NULL) — never a
    // franken-row (5, 1.0) stitched from both
    val left = Seq((1L, 7L, 6L)).toDF("lid", "k", "t")
    val right = Seq((7L, 3L, 3L, Some(1.0)), (7L, 5L, 5L, Option.empty[Double]))
      .toDF("k", "t", "rt", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", Seq("rt", "v"))
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
    assert(out.toSeq == Seq((1L, 7L, 6L, Some(5L), None)))
  }

  test("backward as-of join matches brute force (incl. no-match and ties on time)") {
    val rnd = new scala.util.Random(7)
    val leftRows = List.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(50).toLong, rnd.nextInt(100000)))
      .zipWithIndex.map { case ((k, t, _), i) => (i.toLong, k, t) }
    val rightRows = List.fill(200)((rnd.nextInt(10).toLong, rnd.nextInt(50).toLong, rnd.nextDouble()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toList // unique (key, time)
    val left = leftRows.toDF("lid", "k", "t")
    val right = rightRows.toDF("k", "t", "v")
      .select(col("k"), col("t"), col("t").as("rt"), col("v"))

    val got = AsofJoin.backward(left, right,
        keyCols = Seq("k"), timeCol = "t", valueCols = Seq("rt", "v"))
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._4, r._5)).toMap

    leftRows.foreach { case (lid, k, t) =>
      val eligible = rightRows.filter(r => r._1 == k && r._2 <= t)
      val expected =
        if (eligible.isEmpty) (None, None)
        else {
          val best = eligible.maxBy(_._2)
          (Some(best._2), Some(best._3))
        }
      assert(got(lid) == expected, s"lid=$lid k=$k t=$t")
    }
  }
}
