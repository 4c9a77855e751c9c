package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated TPC-H-ish parquet tables (TESTDATA.md)
  * plus generic source/sink helpers mirroring the reference's I/O surface
  * (reference `README.md:72-76` — CSV export; base tables "must exist",
  * `README.md:142`).
  */
object Tables {

  /** All driver-provided tables at a scale-factor directory. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events stream table. Its parquet type is TIMESTAMP(NANOS), which
    * Spark reads (under `spark.sql.legacy.parquet.nanosAsLong`) as Long
    * nanoseconds: exposed as `ts_ns` (exact, totally ordered — matches
    * DuckDB's native ns ordering) plus `ts` truncated to TimestampType
    * (µs) for formatting/windowing.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns DIV 1000")))

  /** Register every table as a temp view so `spark.sql` can address the
    * same relations the DuckDB oracle sees (SURVEY.md §2 S3/S4).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** CSV sink for business-user export (reference `README.md:72-76`).
    * `coalesce(1)` only for the human-readable single file — the
    * distributed write path (no coalesce) is the 100 TB default.
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.option("header", "true").mode("overwrite").csv(path)
  }

  /** Parquet sink; optional bucketing by key for shuffle-free downstream
    * joins (the scale-out replacement for the reference's B-tree index,
    * `01_staging_layer.sql:13-14`).
    */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned layout: one directory per value of
    * `partCol`, rows within each file sorted by `sortCol`. The 100 TB
    * table-layout op — a reader filtering on the partition column scans
    * ONLY the matching directories (partition pruning, visible as
    * `PartitionFilters` in the plan with the non-matching files never
    * listed as input), and the in-file sort keeps column chunks
    * min/max-tight for digest-range skipping.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String,
                       sortCol: String): Unit =
    // the partition column LEADS the sort: a partitionBy write requires
    // ordering by the partition column, so the planner inserts its own
    // Sort(partCol) and EliminateSorts silently DROPS a caller sort
    // that doesn't satisfy it (verified: sortWithinPartitions(sortCol)
    // alone left files in input order) — prefixing partCol satisfies
    // the writer's requirement, so no extra Sort is inserted and the
    // secondary sortCol order actually reaches the files
    df.sortWithinPartitions(
        org.apache.spark.sql.functions.col(partCol),
        org.apache.spark.sql.functions.col(sortCol))
      .write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)
}
