package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.streaming.StreamingStage

/** Streaming batch-equivalence and multimodal plumbing tests. */
class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly agg equals batch hourly agg") {
    val streamed = StreamingStage.streamingHourlyAgg(spark, sfSmoke)
      .as[(String, String, Long, Double)].collect().toSet
    val batch = Queries.eventsHourlyAgg(spark, sfSmoke)
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("in-flight purge equals the batch purge; nothing leaks; non-vacuous") {
    val streamed = StreamingStage.streamingDeletePropagate(spark, sfSmoke)
      .as[(String, Long, Long)].collect().toSet
    // batch twin over the same layer: surviving (non-roster) events
    val ev = sources.Tables.events(spark, sfSmoke)
    val batch = ev.filter(col("user_id") % 97 =!= 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_after"),
        count(when(col("user_id") % 97 === 0, lit(1))).as("n_leaked"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.forall(_._3 == 0L), s"purged stream leaked roster rows: $streamed")
    // non-vacuity: the roster must actually remove rows at this SF
    val total = ev.count()
    val after = streamed.toSeq.map(_._2).sum
    assert(after < total, "purge removed nothing — the fixture lost its roster users")
  }

  test("streaming dedup of a doubled stream equals the base table") {
    val deduped = StreamingStage.streamingDedupEvents(spark, sfSmoke)
    val base = sources.Tables.events(spark, sfSmoke)
    assert(deduped.count() == base.count())
    assert(deduped.select("event_id").distinct().count() == base.count())
  }

  test("stateful streaming sessionize equals batch window sessionize") {
    val streamed = StreamingStage.streamingSessionize(spark, sfSmoke)
      .as[(Long, Long, Long, String, String)].collect().toSet
    val batch = Queries.eventsSessionize(spark, sfSmoke)
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = StreamingStage.streamStreamAttribution(spark, sfSmoke)
      .as[(Long, Long, Long, Long)].collect().toSet
    val ev = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts_ns DIV 1000").as("us"))
    val batch = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") === lit("click") &&
          col("b.event_type") === lit("purchase") &&
          col("b.us") >= col("a.us") &&
          col("b.us") <= col("a.us") + lit(21600000000L))
      .select(col("a.user_id"), col("a.event_id"), col("b.event_id"),
        (col("b.us") - col("a.us")).as("lag_us"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // every lag respects the interval bound
    assert(streamed.forall { case (_, _, _, lag) => lag >= 0 && lag <= 21600000000L })
  }

  test("watermark drops data later than the horizon (late-data semantics)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    def ts(min: Int) = new java.sql.Timestamp(3600000L * 100 + min * 60000L)
    val ms = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val agg = ms.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes")).count()
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("count"))
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData((1L, ts(0)), (2L, ts(1)))   // window 00:00-05
      q.processAllAvailable()
      ms.addData((3L, ts(30)))               // advances watermark to 00:20
      q.processAllAvailable()
      ms.addData((4L, ts(2)))                // LATE: event-time < watermark
      ms.addData((5L, ts(60)))               // closes everything
      q.processAllAvailable()
      val got = spark.table("late_test").as[(String, Long)].collect().toMap
      // base ts = epoch+100h = 04:00 UTC; that window emitted with count
      // 2 — the late id=4 was dropped by the watermark
      assert(got.getOrElse("04:00", 0L) == 2L, s"late event must be dropped: $got")
      assert(got.getOrElse("04:30", 0L) == 1L)
    } finally q.stop()
  }

  test("multimodal features: deterministic, digest-consistent, full coverage") {
    val docs = sources.Tables.load(spark, sfSmoke, "documents")
    val feats = Multimodal.documentFeatures(docs)
    assert(feats.count() == docs.count())
    val row = feats.filter(col("doc_id") === 0).head()
    // sha256 must match Spark's own built-in over the same bytes
    val expectedSha = docs.filter(col("doc_id") === 0)
      .select(sha2(col("text").cast("binary"), 256)).as[String].head()
    assert(row.getAs[String]("sha256_hex") == expectedSha)
    assert(row.getAs[Long]("n_bytes") > 0)
    val w = row.getAs[Int]("width"); val h = row.getAs[Int]("height")
    assert(w >= 64 && w <= 176 && h >= 64 && h <= 176)
    assert(row.getAs[Int]("thumb_w") == w / 2 && row.getAs[Int]("thumb_h") == h / 2)
    // deterministic across runs
    val again = Multimodal.documentFeatures(docs).filter(col("doc_id") === 0).head()
    assert(again == row)
  }
}
