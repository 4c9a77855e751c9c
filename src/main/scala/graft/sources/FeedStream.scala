package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.VersionedTable

/** STREAMING SOURCE over a [[VersionedTable]]'s change feed — the
  * Delta streaming-source / CDF-read analog (VERDICT r12 frontier
  * gap #1): `spark.readStream.format("graft-feed").option("root", r)
  * .load()` yields an unbounded frame of feed rows (table columns +
  * `change_type`), one micro-batch per committed version window.
  *
  * Offsets are TABLE VERSION NUMBERS: the checkpoint's WAL stores the
  * last version each batch ended at, so a restart replays exactly the
  * committed window ranges (same start/end versions → same rows, see
  * spool idempotence below) and then continues from the head — the
  * [[graft.operators.FeedConsumer]] offset contract lifted into
  * Structured Streaming's own checkpoint machinery.
  *
  *  - `root` (required): the versioned table's root directory.
  *  - `startingVersion`: stream changes AFTER this version (a replica
  *    bootstrapped from `vK` passes `vK`). Default: the head at
  *    stream start — only NEW commits (the Kafka "latest" posture).
  *  - `maxVersionsPerTrigger`: back-pressure — each micro-batch ends
  *    at most this many versions past the previous one (the
  *    maxFilesPerTrigger analog; a backlogged stream catches up in
  *    bounded bites).
  *
  * Micro-batch planning materializes the window's feed ONCE into an
  * idempotent spool under `<root>/_stream/w_<a>_<b>` (keyed by the
  * version range; `_SUCCESS`-guarded): [[VersionedTable.changeFeed]]
  * runs DRIVER-side at planning time — exactly where Delta replays
  * its log — and a restart re-planning the same offset range reuses
  * the spool byte-for-byte instead of recomputing a diff that vacuum
  * may since have narrowed. Executors then read spool files directly
  * (one [[InputPartition]] per file) — the data path never funnels
  * through the driver.
  *
  * Scale shape (100 TB): each trigger costs ∝ its window's changed
  * files + DV delta (the changeFeed bill), never table bytes; the
  * spool is feed-sized and lives under the table root where
  * [[VersionedTable.vacuum]]'s custody rules already govern lifetime.
  *
  * Supported column types: boolean, int, long, float, double, string
  * (the spool reader converts parquet Groups without Spark's internal
  * vectorized machinery); schema inference refuses anything else.
  */
class FeedStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-feed"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FeedStream.feedSchema(FeedStream.rootOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new FeedStreamTable(schema, properties.get("root"),
      Option(properties.get("startingversion"))
        .orElse(Option(properties.get("startingVersion"))),
      Option(properties.get("maxversionspertrigger"))
        .orElse(Option(properties.get("maxVersionsPerTrigger"))).map(_.toLong))
}

private[sources] object FeedStream {
  def rootOf(options: CaseInsensitiveStringMap): String = {
    val r = options.get("root")
    require(r != null, "graft-feed source needs option(\"root\", <table root>)")
    r
  }

  /** head logical schema + change_type — the [[VersionedTable.changeFeed]]
    * output shape, refused early for column types the spool reader
    * can't convert.
    */
  def feedSchema(root: String): StructType = {
    val spark = SparkSession.active
    val base = VersionedTable.read(spark, root).schema
    val supported: Set[DataType] = Set(BooleanType, IntegerType, LongType,
      FloatType, DoubleType, StringType)
    val bad = base.filterNot(f => supported.contains(f.dataType))
    require(bad.isEmpty,
      s"graft-feed: unsupported column type(s) ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")} — " +
        "the feed spool reader handles boolean/int/long/float/double/string")
    StructType(base.fields :+ StructField("change_type", StringType, nullable = false))
  }
}

private[sources] class FeedStreamTable(feedSchema: StructType, root: String,
                                       startingVersion: Option[String],
                                       maxVersionsPerTrigger: Option[Long])
  extends Table with SupportsRead {
  override def name(): String = s"graft_feed($root)"
  override def schema(): StructType = feedSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = feedSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FeedMicroBatchStream(feedSchema, root, startingVersion,
            maxVersionsPerTrigger)
      }
    }
}

/** Offset = the table version number the batch range ends at. */
private[sources] case class FeedOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private[sources] class FeedMicroBatchStream(schema: StructType, root: String,
                                            startingVersion: Option[String],
                                            maxVersionsPerTrigger: Option[Long])
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  private def spark = SparkSession.active
  private def vNum(v: String): Long = v.drop(1).toLong
  private def vName(n: Long): String = "v%05d".format(n)
  private def head(): Long =
    vNum(VersionedTable.headVersion(root).getOrElse(throw
      new IllegalStateException(s"graft-feed: no published version under $root")))

  private lazy val initial: FeedOffset =
    FeedOffset(startingVersion.map(vNum).getOrElse(head()))
  // AvailableNow: the drain target is the head AT PREPARE TIME — the
  // run processes everything committed before it started, then stops
  // (commits racing in during the drain belong to the next run)
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = initial

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(head())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control hands us the RESTORED start offset, so
    * back-pressure composes with checkpoint restarts: each batch ends
    * at most `maxVersionsPerTrigger` versions past where the previous
    * one (possibly from a prior run) committed.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[FeedOffset].version
    val h = availableNowTarget.getOrElse(head())
    FeedOffset(math.max(from,
      maxVersionsPerTrigger.fold(h)(m => math.min(h, from + m))))
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "graft-feed implements SupportsAdmissionControl — latestOffset(start, limit)")

  override def deserializeOffset(json: String): Offset = {
    val m = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
    FeedOffset(m.map(_.group(1).toLong).getOrElse(
      throw new IllegalArgumentException(s"graft-feed: bad offset $json")))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[FeedOffset].version
    val b = end.asInstanceOf[FeedOffset].version
    if (a >= b) return Array.empty
    val spool = s"$root/_stream/w_${vName(a)}_${vName(b)}"
    val done = java.nio.file.Paths.get(spool, "_SUCCESS")
    if (!java.nio.file.Files.exists(done)) {
      // column order pinned to the declared schema so the spool's
      // parquet field layout is stable across replays
      VersionedTable.changeFeed(spark, root, vName(a), vName(b))
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(spool)
    }
    val files = {
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(spool))
      try st.iterator().asScala.map(_.toString)
        .filter(f => f.endsWith(".parquet") && !f.contains("_SUCCESS")).toArray
      finally st.close()
    }
    files.sorted.map(f => FeedInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FeedReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class FeedInputPartition(file: String) extends InputPartition

private[sources] class FeedReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FeedPartitionReader(partition.asInstanceOf[FeedInputPartition].file, schema)
}

/** Executor-side spool file reader: parquet example Groups →
  * InternalRows for the supported primitive/string types. The spool
  * was written by the planner with the schema's exact column order,
  * but fields are still resolved BY NAME for rename tolerance.
  */
private[sources] class FeedPartitionReader(file: String, schema: StructType)
  extends PartitionReader[InternalRow] {
  private val reader = org.apache.parquet.hadoop.ParquetReader
    .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
      new org.apache.hadoop.fs.Path(file))
    .build()
  private var current: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = { current = reader.read(); current != null }

  override def get(): InternalRow = {
    val g = current
    val vals = schema.fields.map { f =>
      val idx = g.getType.getFieldIndex(f.name)
      if (g.getFieldRepetitionCount(idx) == 0) null
      else f.dataType match {
        case BooleanType => java.lang.Boolean.valueOf(g.getBoolean(idx, 0))
        case IntegerType => java.lang.Integer.valueOf(g.getInteger(idx, 0))
        case LongType    => java.lang.Long.valueOf(g.getLong(idx, 0))
        case FloatType   => java.lang.Float.valueOf(g.getFloat(idx, 0))
        case DoubleType  => java.lang.Double.valueOf(g.getDouble(idx, 0))
        case StringType  => UTF8String.fromString(g.getString(idx, 0))
        case other => throw new IllegalStateException(
          s"graft-feed: unsupported type $other for ${f.name}")
      }
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
