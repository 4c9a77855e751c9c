package graft

import org.apache.spark.sql.functions._
import graft.operators.Buckets

/** The bounded-bucket guard for LSH candidate generation: a constructed
  * hot bucket (every row colliding on one band/block value) must be
  * dropped before pair expansion, and surviving member lists are bounded
  * by the cap — the scale invariant behind dedup_minhash_lsh /
  * dedup_simhash (VERDICT r01 "What's wrong" #2–3).
  */
class BucketsSpec extends SparkSpec {
  import spark.implicits._

  test("degenerate hot bucket is dropped; normal buckets survive bounded") {
    val cap = 50
    val hot = (1 to 600).map(i => ("HOT", i.toLong))
    val ok = (1 to 10).map(i => ("ok", 1000L + i))
    val single = Seq(("lone", 9999L))
    val df = (hot ++ ok ++ single).toDF("bucket", "doc_id").repartition(8)

    val out = Buckets.boundedMembers(df, col("bucket"), col("doc_id"), cap)
      .select(col("bucket"), size(col("members")).as("n"))
      .as[(String, Int)].collect().toMap

    assert(!out.contains("HOT"), "hot bucket must be dropped from candidates")
    assert(!out.contains("lone"), "singleton buckets yield no pairs")
    assert(out("ok") == 10)
    assert(out.values.forall(_ <= cap))
  }

  test("cap keeps buckets at exactly the boundary") {
    val atCap = (1 to 50).map(i => ("edge", i.toLong))
    val df = atCap.toDF("bucket", "doc_id")
    val out = Buckets.boundedMembers(df, col("bucket"), col("doc_id"), 50)
      .select(size(col("members"))).as[Int].collect()
    assert(out.toSeq == Seq(50))
  }
}
