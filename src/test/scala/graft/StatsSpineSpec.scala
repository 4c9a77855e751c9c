package graft

import org.apache.spark.sql.functions._
import graft.operators.StatsSpine

/** File-level min/max data-skipping spine: the physical claims the
  * `layout_stats_pruned_scan` hash gate can't see — strictly fewer
  * files scanned than written, superset-then-filter correctness,
  * null-stats and empty-survivor edge cases, and the append fold.
  */
class StatsSpineSpec extends SparkSpec {

  private def laidOut(n: Int = 8): (String, Long) = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-spine").toString
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    df.repartitionByRange(n, col("k")).sortWithinPartitions("k")
      .write.parquet(s"$base/data")
    (base, 1000L)
  }

  test("pruned read scans strictly fewer files and returns exactly the band") {
    val (base, _) = laidOut()
    val spine = StatsSpine.build(spark, s"$base/data", Seq("k"))
    val total = spine.count()
    assert(total >= 4, "layout should produce several files")
    // spine accounting is complete: file row counts sum to the table
    assert(spine.agg(sum("n_rows")).head.getLong(0) == 1000L)
    val surv = StatsSpine.survivors(spine, "k", 200L, 299L).count()
    assert(surv < total, s"pruning must drop files ($surv of $total kept)")
    val got = StatsSpine.prunedRead(spark, s"$base/data", spine, "k", 200L, 299L)
      .filter(col("k").between(200L, 299L))
    assert(got.count() == 100L)
    assert(got.agg(min("k"), max("k")).head.toSeq == Seq(200L, 299L))
  }

  test("empty survivor set returns a typed empty frame, not a crash") {
    val (base, _) = laidOut()
    val spine = StatsSpine.build(spark, s"$base/data", Seq("k"))
    val got = StatsSpine.prunedRead(spark, s"$base/data", spine, "k", 5000L, 6000L)
    assert(got.count() == 0L)
    assert(got.schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("all-null stats files are pruned; mixed-null files keep non-null bounds") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-spine-null").toString
    // one file of all-null k, one file with nulls mixed into [10, 19]
    // (append lands the second writer's part file in the same dir)
    Seq.fill(5)(Option.empty[Long]).map((_, "n")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$base/data")
    ((10L to 19L).map(Option(_)) ++ Seq.fill(3)(Option.empty[Long]))
      .map((_, "m")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(s"$base/data")
    val spine = StatsSpine.build(spark, s"$base/data", Seq("k"))
    // a range predicate never accepts null → the all-null file must go
    val surv = StatsSpine.survivors(spine, "k", 0L, 100L)
    assert(surv.count() == 1L)
    val got = StatsSpine.prunedRead(spark, s"$base/data", spine, "k", 12L, 15L)
      .filter(col("k").between(12L, 15L))
    assert(got.count() == 4L)
  }

  test("bloom sidecar: survivors == true holders where min/max keeps everything") {
    import spark.implicits._
    val mBits = 1 << 13
    val base = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // scatter unique ids across 8 files (hash layout — the min/max
    // killer: every file's id interval spans ~the whole domain)
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    df.repartition(8, col("k")).write.parquet(s"$base/data")
    val mm = StatsSpine.build(spark, s"$base/data", Seq("k"))
    val total = mm.count()
    assert(total == 8L)
    val keys = Seq(137L, 512L, 900L)
    // min/max skipping is useless here: a point probe keeps ALL files
    keys.foreach { k =>
      assert(StatsSpine.survivors(mm, "k", k, k).count() == total)
    }
    val bloom = StatsSpine.buildBloom(spark, s"$base/data", "k", mBits)
    // the true holder set, from the data itself
    val holders = spark.read.parquet(s"$base/data")
      .filter(col("k").isin(keys: _*))
      .select(input_file_name()).distinct().as[String].collect().toSet
    val survived = bloom
      .filter(StatsSpine.bloomSurvives(col("bloom"), keys.map(_.toString), mBits))
      .select("file").as[String].collect().toSet
    // no false negatives (⊇) and, at this load factor, no false
    // positives either (deterministic fixture) — exactly the holders
    assert(survived == holders)
    assert(survived.size < total)
    val got = StatsSpine.prunedReadByKeys(spark, s"$base/data", bloom,
        keys.map(_.toString), mBits)
      .filter(col("k").isin(keys: _*))
    assert(got.select("k").as[Long].collect().toSet == keys.toSet)
  }

  test("bloom sidecar: absent keys and empty key set read nothing, typed") {
    import spark.implicits._
    val mBits = 1 << 13
    val base = java.nio.file.Files.createTempDirectory("graft-bloom-miss").toString
    (0L until 200L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(4, col("k")).write.parquet(s"$base/data")
    val bloom = StatsSpine.buildBloom(spark, s"$base/data", "k", mBits)
    // absent keys: the exact re-filter makes any FP harmless — and at
    // this load the probe itself already drops every file
    val gotAbsent = StatsSpine.prunedReadByKeys(spark, s"$base/data", bloom,
      Seq("99999", "123456"), mBits)
    assert(gotAbsent.filter(col("k").isin(99999L, 123456L)).count() == 0L)
    val gotEmpty = StatsSpine.prunedReadByKeys(spark, s"$base/data", bloom,
      Seq.empty, mBits)
    assert(gotEmpty.count() == 0L)
    assert(gotEmpty.schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("append fold: spine over base+batch == rebuild over the union") {
    import spark.implicits._
    val (base, _) = laidOut()
    val batchDir = s"$base/batch"
    (2000L until 2100L).map(i => (i, s"b$i")).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.parquet(batchDir)
    val folded = StatsSpine.append(spark,
      StatsSpine.build(spark, s"$base/data", Seq("k")), batchDir, Seq("k"))
    // fold cost ∝ batch, result complete: batch band served from the
    // folded spine (explicit file paths span both directories)
    val got = StatsSpine.prunedRead(spark, s"$base/data", folded, "k", 2000L, 2049L)
      .filter(col("k").between(2000L, 2049L))
    assert(got.count() == 50L)
    assert(folded.agg(sum("n_rows")).head.getLong(0) == 1100L)
    // base-band queries keep working off the folded spine too
    assert(StatsSpine.prunedRead(spark, s"$base/data", folded, "k", 0L, 9L)
      .filter(col("k").between(0L, 9L)).count() == 10L)
  }
}
