package graft

import org.apache.spark.sql.functions._
import graft.operators.Triangles

/** Orientation-correctness claims the hash gate can't isolate: every
  * triangle counted exactly once (K4), chains contribute nothing, and
  * a hub vertex doesn't inflate the census.
  */
class TrianglesSpec extends SparkSpec {

  private def census(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    Triangles.census(edges.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: four triangles, every node in three") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val got = census(k4)
    assert(got(-1L) == 4L, s"K4 has 4 triangles, got ${got(-1L)}")
    (0L to 3L).foreach(n => assert(got(n) == 3L, s"node $n: ${got(n)}"))
  }

  test("a chain has no triangles; closing one edge creates exactly one") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(census(chain)(-1L) == 0L)
    val closed = census(chain :+ (0L, 2L))
    assert(closed(-1L) == 1L)
    assert(closed(0L) == 1L && closed(1L) == 1L && closed(2L) == 1L)
    assert(!closed.contains(3L), "a node outside every triangle emits no row")
  }

  test("a star hub creates no triangles and no wedge explosion artifact") {
    val star = (1L to 20L).map(i => (0L, i))
    val got = census(star)
    assert(got(-1L) == 0L)
    // one closing edge among leaves → exactly one triangle at the hub
    val got2 = census(star :+ (1L, 2L))
    assert(got2(-1L) == 1L && got2(0L) == 1L)
  }
}
