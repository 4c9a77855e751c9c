package graft

import org.apache.spark.sql.functions._

/** Specs for the round-5 operators (repeated-substring span dedup, ...). */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("substringSpans: a shared 12-word run becomes ONE merged span per doc") {
    // docs 1 and 2 share words s0..s11 (positions 6..17 in doc 1,
    // 1..12 in doc 2); all other words are unique corpus-wide. The
    // shared run yields duplicated 8-windows at 5 consecutive positions
    // which must merge into exactly one 12-word span per doc.
    val shared = words("s", 12)
    val d = Seq(
      (1L, words("a", 5) + " " + shared + " " + words("b", 6)),
      (2L, shared + " " + words("c", 9)),
      (3L, words("u", 30))
    ).toDF("doc_id", "text")
    val got = ExtQueries.substringSpans(d)
      .select("doc_id", "span_idx", "start_pos", "end_pos", "n_words")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 6L, 17L, 12L), (2L, 1L, 1L, 12L, 12L)),
      s"unexpected spans: $got")
  }

  test("substringSpans: unique corpus yields no spans; short docs ignored") {
    val d = Seq(
      (1L, words("x", 40)),
      (2L, words("y", 40)),
      (3L, "too short for windows")
    ).toDF("doc_id", "text")
    assert(ExtQueries.substringSpans(d).count() == 0)
  }

  test("substringSpans: within-doc repetition yields two separated spans") {
    // the same 8-word phrase occurs twice in one doc, separated by 20
    // unique words — far enough (> W gap) that the spans must NOT merge
    val phrase = words("p", 8)
    val d = Seq(
      (7L, phrase + " " + words("m", 20) + " " + phrase + " " + words("n", 10))
    ).toDF("doc_id", "text")
    val got = ExtQueries.substringSpans(d)
      .select("span_idx", "start_pos", "end_pos", "n_words")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 8L, 8L), (2L, 29L, 36L, 8L)),
      s"unexpected spans: $got")
  }

  test("bloom: no false negatives — every inserted key passes both test paths") {
    val mBits = 4096
    val keys = (0 until 500).map(i => s"key_$i")
    val df = keys.toDF("k")
    val words = df.agg(call_function("bloom_agg", col("k"), lit(mBits)).as("bm"))
      .head().getSeq[Long](0)
    // Scala-side test
    keys.foreach { k =>
      assert(graft.functions.BloomFilterAgg.mightContain(
        words.toArray, mBits, k.getBytes("UTF-8")), s"false negative (scala): $k")
    }
    // native expression AND the SQL-stated conv/substring/md5 reference
    // must both address the SAME bits as the aggregate's byte arithmetic
    val passedNative = df.filter(
      graft.operators.BloomPrune.mightContain(col("k"), words, mBits)).count()
    val passedSql = df.filter(
      graft.operators.BloomPrune.mightContainSql(col("k"), words, mBits)).count()
    assert(passedNative == keys.length, s"native test lost keys: $passedNative/${keys.length}")
    assert(passedSql == keys.length, s"sql-form test lost keys: $passedSql/${keys.length}")
    // and they agree on non-members too (bit-addressing parity on 5000 probes)
    val probes = (0 until 5000).map(i => s"probe_$i").toDF("k")
    val nSet = probes.filter(graft.operators.BloomPrune.mightContain(col("k"), words, mBits))
      .as[String].collect().toSet
    val sSet = probes.filter(graft.operators.BloomPrune.mightContainSql(col("k"), words, mBits))
      .as[String].collect().toSet
    assert(nSet == sSet, "native and SQL membership tests diverge")
  }

  test("bloom: bitmap is partition-invariant and FP rate is sane") {
    val mBits = 1 << 16
    val keys = (0 until 2000).map(i => s"present_$i")
    val a = keys.toDF("k").agg(call_function("bloom_agg", col("k"), lit(mBits)))
      .head().getSeq[Long](0)
    val b = keys.toDF("k").repartition(17)
      .agg(call_function("bloom_agg", col("k"), lit(mBits)))
      .head().getSeq[Long](0)
    assert(a == b, "bitmap differs across partitionings (OR-merge must be associative)")
    // 2000 keys × 4 bits in 65536 bits ⇒ theoretical FP ≈ (1-e^(-8000/65536))^4 ≈ 1.7e-4
    val absent = (0 until 5000).map(i => s"absent_$i")
    val fps = absent.count(k => graft.functions.BloomFilterAgg.mightContain(
      a.toArray, mBits, k.getBytes("UTF-8")))
    assert(fps <= 25, s"false-positive rate too high: $fps/5000")
  }

  test("bloom-pruned semi-join equals the plain semi-join") {
    val big = (0L until 3000L).map(i => (i, s"payload_$i")).toDF("id", "payload")
    val small = (0L until 3000L by 97).map(i => Tuple1(i)).toDF("sid")
    val pruned = graft.operators.BloomPrune.semiJoin(big, small, "id", "sid")
      .as[(Long, String)].collect().toSet
    val plain = big.join(small, col("id") === col("sid"), "left_semi")
      .as[(Long, String)].collect().toSet
    assert(pruned == plain && plain.nonEmpty)
  }

  test("transformWithState sessionizer equals the flatMapGroupsWithState one and batch") {
    val tws = ExtQueries.streamingSessionizeTws(spark, sfSmoke).collect().toSet
    val fmg = ExtQueries.streamingSessionize(spark, sfSmoke).collect().toSet
    val batch = Queries.eventsSessionize(spark, sfSmoke).collect().toSet
    assert(tws == fmg, "tws and flatMapGroupsWithState sessionizers diverge")
    assert(tws == batch, "tws sessionizer diverges from the batch window form")
    assert(tws.nonEmpty)
  }

  test("rangeJoin: half-open semantics, multi-bin intervals, overlap multiplicity") {
    val pts = Seq((1L, 100L), (2L, 150L), (3L, 200L), (4L, 250L), (5L, 999L))
      .toDF("pid", "t")
    val ivs = Seq(
      (10L, 100L, 200L),   // covers t=100,150 (200 excluded: half-open)
      (11L, 140L, 260L),   // covers 150,200,250 — overlaps interval 10
      (12L, 0L, 50L)       // empty of points
    ).toDF("iid", "s", "e")
    val got = graft.operators.RangeJoin
      .pointInInterval(pts, "t", ivs, "s", "e", binWidth = 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L)),
      s"unexpected matches: $got")
  }

  test("rangeJoin equals the naive BETWEEN join and plans an equi-join") {
    val pts = (0L until 2000L).map(i => (i, i * 37L % 10000L)).toDF("pid", "t")
    val ivs = (0L until 50L).map(i => (i, i * 190L, i * 190L + (i % 13) * 29L + 1L))
      .toDF("iid", "s", "e")
    val binned = graft.operators.RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", 128L)
      .select("pid", "iid")
    val naive = pts.join(ivs, col("s") <= col("t") && col("t") < col("e"))
      .select("pid", "iid")
    assert(binned.as[(Long, Long)].collect().toSet ==
           naive.as[(Long, Long)].collect().toSet)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"binned range join fell back to nested loop:\n$plan")
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoop"),
      "fixture no longer demonstrates the nested-loop baseline")
  }

  test("kmv sketch re-aggregation is lossless and partition-invariant") {
    val rows = ExtQueries.qaSketchReagg(spark, sfSmoke)
      .as[(String, Double)].collect().toMap
    // the whole point: merging stored per-source sketches must equal
    // the direct aggregate over the raw data, bit-for-bit
    assert(java.lang.Double.doubleToLongBits(rows("__merged")) ==
           java.lang.Double.doubleToLongBits(rows("__direct")),
      s"sketch merge lost information: merged=${rows("__merged")} direct=${rows("__direct")}")
    // sketches are partition-invariant (min-k is associative+commutative)
    val d = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val a = d.agg(call_function("kmv_sketch", col("text"), lit(64))).head().getSeq[Long](0)
    val b = d.repartition(11).agg(call_function("kmv_sketch", col("text"), lit(64)))
      .head().getSeq[Long](0)
    assert(a == b)
    // estimate-from-sketch equals the direct kmv_distinct estimate
    val est = d.agg(call_function("kmv_distinct", col("text"), lit(64))).head().getDouble(0)
    val fromSketch = d.agg(call_function("kmv_sketch", col("text"), lit(64)).as("sk"))
      .select(ExtQueries.kmvEstimate(col("sk"), 64)).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(est) ==
           java.lang.Double.doubleToLongBits(fromSketch))
  }

  test("olsTrend: exact line recovered exactly; r2 = 1") {
    val pts = (0L until 100L).map(x => ("a", x, 3 * x + 7)) ++
      (0L until 50L).map(x => ("b", x, 1000L - 2 * x))
    val got = Queries.olsTrend(pts.toDF("event_type", "x", "y"))
      .select("event_type", "slope", "intercept", "r2")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((3.0, 7.0, 1.0)), s"line a misfit: ${got("a")}")
    assert(got("b") == ((-2.0, 1000.0, 1.0)), s"line b misfit: ${got("b")}")
  }

  test("substringSpans: result is identical across repartitionings") {
    val base = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val a = ExtQueries.substringSpans(base).collect().toSet
    val b = ExtQueries.substringSpans(base.repartition(13)).collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
