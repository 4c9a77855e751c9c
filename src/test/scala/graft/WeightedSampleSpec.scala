package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Efraimidis–Spirakis weighted sampling: the properties the hash
  * gate can't state — the selected set dominates every rejected row
  * on priority (the exact A-ES contract), and the weight genuinely
  * biases inclusion.
  */
class WeightedSampleSpec extends SparkSpec {

  test("selected rows dominate rejected rows on priority; weights bias the sample") {
    val out = ExtQueries.sampleWeighted(spark, sfSmoke)
    assert(out.count() == 100L)
    // recompute the priority independently and check the cut is exact
    val u = (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 13),
      16, 10).cast("double") + lit(1.0)) / lit(math.pow(2.0, 52))
    val keyed = Tables.load(spark, sfSmoke, "documents")
      .filter(col("n_chars") > 0)
      .select(col("doc_id"),
        pow(u, lit(1.0) / col("n_chars").cast("double")).as("k"),
        col("n_chars"))
    val sel = out.select("doc_id")
    val minSel = keyed.join(sel, "doc_id").agg(min(col("k"))).head.getDouble(0)
    val maxRej = keyed.join(sel, Seq("doc_id"), "left_anti")
      .agg(max(col("k"))).head.getDouble(0)
    assert(minSel >= maxRej,
      s"A-ES cut violated: min selected $minSel < max rejected $maxRej")
    // ranks are the priority order, contiguous 1..100
    val ranks = out.select("sel_rank").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq == (1 to 100))
    // longer documents are preferentially kept
    val meanSel = keyed.join(sel, "doc_id")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val meanAll = keyed.agg(avg(col("n_chars"))).head.getDouble(0)
    assert(meanSel > meanAll,
      s"weighting must bias toward long docs ($meanSel vs $meanAll)")
  }
}
