package graft

import org.apache.spark.sql.functions._

/** Round-15 ops: the stored/incremental BM25 inverted-index family. */
class Round15OpsSpec extends SparkSpec {

  private def tmpIdx(): (String, String) = (
    java.nio.file.Files.createTempDirectory("graft-bm25idx").toString,
    "bm25idx_" + java.util.UUID.randomUUID().toString.replace("-", ""))

  private def qOf(tbl: String) =
    spark.table(tbl).filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("query_id"), col("word"))

  test("Bm25Index: fold == from-scratch rebuild (global stats N/L/df move exactly)") {
    import spark.implicits._
    val all = Seq(
      (1L, "apple banana cherry date"),
      (2L, "apple apple banana"),
      (3L, "cherry date elder fig"),
      (4L, "banana fig fig grape"),
      (5L, "apple grape")).toDF("doc_id", "text")
    val (bA, tA) = tmpIdx()
    val s0 = operators.Bm25Index.build(spark, all.filter(col("doc_id") <= 3), tA, bA)
    val (s1, nNew) = operators.Bm25Index.append(spark, s0, all.filter(col("doc_id") > 3), 1)
    assert(nNew == 2)
    val (bB, tB) = tmpIdx()
    val oneShot = operators.Bm25Index.build(spark, all, tB, bB)
    // every appended doc shifts N, L and the df of its terms — scores of
    // PRE-EXISTING docs must move too, identically on both paths
    val got = operators.Bm25Index.scoredTopK(spark, s1, qOf(tA)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val want = operators.Bm25Index.scoredTopK(spark, oneShot, qOf(tB)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want && got.nonEmpty)
    // folded spines equal the rebuilt ones row-for-row
    val dfA = spark.read.parquet(s1.dfPath).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val dfB = spark.read.parquet(oneShot.dfPath).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dfA == dfB)
    assert(spark.read.parquet(s1.statsPath).collect().toSeq.map(_.toString) ==
      spark.read.parquet(oneShot.statsPath).collect().toSeq.map(_.toString))
    spark.sql(s"DROP TABLE IF EXISTS $tA")
    spark.sql(s"DROP TABLE IF EXISTS $tB")
  }

  test("Bm25Index: a replayed batch folds ZERO new documents (idempotent append)") {
    import spark.implicits._
    val (base, tbl) = tmpIdx()
    val d = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val batch = Seq((3L, "c d e")).toDF("doc_id", "text")
    val s0 = operators.Bm25Index.build(spark, d, tbl, base)
    val (s1, n1) = operators.Bm25Index.append(spark, s0, batch, 1)
    val rows1 = spark.table(tbl).count()
    // Structured Streaming's at-least-once redelivery: the same docs
    // arrive again — postings, df spine, and stats must all hold still
    val (s2, n2) = operators.Bm25Index.append(spark, s1, batch, 2)
    assert(n1 == 1 && n2 == 0)
    assert(spark.table(tbl).count() == rows1)
    assert(spark.read.parquet(s2.statsPath).collect().toSeq.map(_.toString) ==
      spark.read.parquet(s1.statsPath).collect().toSeq.map(_.toString))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("text_bm25_stored_topk query path reads ONLY stored artifacts (no tokenize, no corpus scan)") {
    import spark.implicits._
    val (base, tbl) = tmpIdx()
    val d = Seq((1L, "a b c"), (2L, "b c d"), (4L, "a d e")).toDF("doc_id", "text")
    val s0 = operators.Bm25Index.build(spark, d, tbl, base)
    val df = operators.Bm25Index.scoredTopK(spark, s0, qOf(tbl))
    val plan = df.queryExecution.optimizedPlan.toString
    // a raw-corpus path would drag the text column through split/explode;
    // the stored path's only relations are the postings table + spines
    assert(!plan.contains("explode") && !plan.contains("split"),
      s"query-time tokenize found in:\n$plan")
    assert(plan.contains(tbl), s"expected the stored postings table in:\n$plan")
    // zero corpus-side exchanges: the bucketed scan's doc_id partitioning
    // carries through the broadcast joins into the pair aggregation, so
    // the only exchange in the whole plan is the ≤k-per-query heap's
    // query_id shuffle
    val exchanges = "(?m)^.*Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges <= 1,
      s"expected ≤1 exchange (topk only):\n${df.queryExecution.executedPlan}")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
