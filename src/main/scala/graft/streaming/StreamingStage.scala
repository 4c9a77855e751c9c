package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming mode for the engine — the incremental capability
  * the reference lacks entirely (its views are batch-only; SURVEY.md §7.1
  * item 7d). Streams are declared with the same Column expressions as the
  * batch layer, so batch/streaming parity is by construction.
  *
  * Scale design: the watermark bounds state (2 h of hourly windows /
  * pending event-ids per key); state lives in the state store keyed by
  * (window, event_type) or event_id, which shuffles by key exactly like
  * the batch groupBy — no driver-side state.
  */
object StreamingStage {

  /** Event stream from the parquet file, schema pinned from a batch read
    * (streaming sources require an explicit schema). `ts` arrives as
    * TIMESTAMP(NANOS) → Long ns (see Sessions), converted to µs
    * TimestampType for watermarking.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(stageAsDir(path))
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
  }

  /** Spark's file stream source only accepts directories; the testdata
    * ships single parquet files, so stage a copy under a per-input temp
    * dir (idempotent). Production streams read real directories/Kafka —
    * this shim exists only for the file-per-table test layout.
    */
  private def stageAsDir(file: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(file)
    val dirPath = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft-stream-" + Integer.toHexString(file.hashCode))
    val dst = dirPath.resolve(src.getFileName)
    if (!Files.exists(dst)) {
      Files.createDirectories(dirPath)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
    dirPath.toString
  }

  /** Watermarked hourly tumbling-window aggregation. Sum uses the
    * fixed-point pattern so partial/final aggregation order (and batch vs
    * streaming incremental merge) cannot change the result.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000000).cast("long")).as("sum_fp"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"),
        col("n_events"),
        (col("sum_fp").cast("double") / 1000000).as("sum_value"))

  /** Streaming exact dedup: duplicates within the watermark horizon are
    * dropped by key state (`dropDuplicatesWithinWatermark`), the
    * incremental form of the batch hash-groupBy dedup.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        col("value"), col("props"))

  /** Run a streaming DataFrame to completion over the static input
    * (Trigger.AvailableNow) into an in-memory table and return the
    * result — the batch-equivalence harness for the oracle gate. Memory
    * sink is test-scale only; production would writeStream to
    * parquet/kafka with the identical plan.
    */
  def runToTable(df: DataFrame, name: String, mode: String): DataFrame = {
    val spark = df.sparkSession
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming hourly aggregate, run to completion (complete mode: with
    * AvailableNow + append, windows newer than the final watermark would
    * never emit).
    */
  def streamingHourlyAgg(spark: SparkSession, dir: String): DataFrame =
    runToTable(hourlyAgg(eventsStream(spark, dir)), "streaming_hourly_agg", "complete")

  /** Streaming dedup over a deliberately duplicated stream (the source
    * unioned with itself) — output must equal the distinct base table.
    */
  def streamingDedupEvents(spark: SparkSession, dir: String): DataFrame = {
    val s1 = eventsStream(spark, dir)
    val s2 = eventsStream(spark, dir)
    runToTable(dedupEvents(s1.unionByName(s2)), "streaming_dedup_events", "append")
  }
}
