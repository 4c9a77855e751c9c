package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

/** The deletion-neighborhood blocking contract: one edit (drop / sub /
  * insert) and adjacent transpositions always share a key; re-score is
  * exact Levenshtein; best match is the deterministic (dist, key)
  * argmin; no-match rows surface with null key and n_cand = 0.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("deletionKeys = identity + every single-char deletion") {
    val got = Seq("abc").toDF("name")
      .select(EntityResolution.deletionKeys(col("name")).as("ks"))
      .as[Seq[String]].head()
    assert(got == Seq("abc", "bc", "ac", "ab"))
  }

  private def resolve(dirty: Seq[(Long, String)], clean: Seq[(Long, String)],
                      maxDist: Int = 2) =
    EntityResolution.resolve(
        dirty.toDF("dirty_id", "name"), clean.toDF("key", "name"), maxDist)
      .as[(Long, Option[Long], Option[Int], Long)].collect().toSeq.sortBy(_._1)

  test("each single-edit class resolves to its source; transposition at dist 2") {
    val clean = Seq((1L, "abcdef"), (2L, "qqqqqq"))
    val got = resolve(Seq(
      (10L, "abcdef"), // exact
      (11L, "abdef"),  // drop c
      (12L, "abxdef"), // substitute c -> x
      (13L, "abdcef")  // swap c,d: Levenshtein 2, still blocked-in
    ), clean)
    assert(got == Seq(
      (10L, Some(1L), Some(0), 1L),
      (11L, Some(1L), Some(1), 1L),
      (12L, Some(1L), Some(1), 1L),
      (13L, Some(1L), Some(2), 1L)))
  }

  test("no candidate within maxDist -> null match, n_cand 0") {
    val got = resolve(Seq((10L, "zzzzzz")), Seq((1L, "abcdef")))
    assert(got == Seq((10L, None, None, 0L)))
  }

  test("equal-distance tie breaks to the lowest registry key") {
    // dirty "ab" is one edit from both "ab c"-family keys "axb"(no)…
    // use "ab" vs clean "abx"(key 7) and "aby"(key 3): both dist 1
    val got = resolve(Seq((10L, "ab")), Seq((7L, "abx"), (3L, "aby")), maxDist = 1)
    assert(got == Seq((10L, Some(3L), Some(1), 2L)))
  }

  test("duplicate registry names both count as candidates; min key wins") {
    val got = resolve(Seq((10L, "abcd")), Seq((5L, "abcd"), (2L, "abcd")))
    assert(got == Seq((10L, Some(2L), Some(0), 2L)))
  }
}
