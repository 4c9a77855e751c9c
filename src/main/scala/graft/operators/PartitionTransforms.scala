package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HIDDEN PARTITION TRANSFORMS (the Iceberg partition-spec idea,
  * re-expressed over the [[VersionedTable]] manifest's stats spine):
  * a table declares `bucket(N, c)` / `truncate(W, c)` / `day(c)` as
  * TABLE METADATA, writers cluster files by the transform value, and
  * the manifest carries per-file min/max of the DERIVED value — no
  * partition column is ever stored in data files and readers never
  * spell the transform in their predicates (the classic Hive failure
  * this design retires: a query filtering raw `ts` silently full-
  * scans a `ts_day`-partitioned table).
  *
  * Why this matters at 100 TB: min/max stats on the RAW column prune
  * range predicates only when the layout happens to cluster that
  * column. A point lookup on a high-cardinality column under any
  * other layout keeps every file (each file's raw [min, max] spans
  * ~the whole domain). `bucket(N, c)` makes the lookup read ~1/N of
  * the files REGARDLESS of what else the layout optimizes for — and
  * because the mapping is declared in table metadata, the reader
  * derives the bucket of its literal inside the manifest filter
  * (planning-time, manifest-sized) instead of trusting callers to
  * restate the transform.
  *
  * Reference scope: the reference pipeline has no table format at
  * all (`01_staging_layer.sql` rebuilds views per run); this module
  * follows the published Iceberg partition-transform design (Apache
  * Iceberg spec §"Partition Transforms") re-expressed as manifest
  * stats so one mechanism serves both pruning and evolution.
  *
  * Transform values are DERIVED AT SIDECAR TIME from raw columns
  * (one aggregate in the same single scan that builds row counts,
  * stats and the bloom bitmap), so:
  *  - data files stay transform-free (hidden partitioning);
  *  - a file written under an OLD spec simply lacks the new stat
  *    columns — its manifest entries read back NULL and the pruned
  *    read KEEPS it (correct superset, no pruning). That IS
  *    partition-spec evolution: no rewrite, old data unpruned but
  *    correct, new data pruned, both served by one manifest filter.
  *
  * Transforms are declared against PHYSICAL column names (the same
  * posture as `Spec.statCols`): a later logical rename never moves
  * the stat columns, so pruning survives it untouched.
  */
sealed trait PartitionTransform {
  /** physical source column the transform derives from */
  def srcCol: String

  /** manifest stat suffix — the manifest carries `min_<statName>` /
    * `max_<statName>` per file
    */
  def statName: String

  /** the transform applied to any expression over the source column
    * (a data column at sidecar time, a literal at pruning time —
    * evaluating the mapping IN-PLAN means the reader never
    * re-implements the hash driver-side)
    */
  def apply(raw: Column): Column

  /** order-preserving transforms (truncate, day) map RANGE predicates
    * to stat bands; bucket serves point lookups only
    */
  def orderPreserving: Boolean

  /** `_META` encoding (parsed back by [[PartitionTransform.parse]]) */
  def serial: String
}

/** `bucket(n, c)`: xxhash64 of the string form mod n. Point-lookup
  * pruning on high-cardinality columns — the case raw min/max can
  * never serve. Not order-preserving (range predicates pass through
  * unpruned).
  */
final case class BucketTransform(n: Int, srcCol: String) extends PartitionTransform {
  require(n > 1, s"bucket transform needs n > 1, got $n")
  def statName: String = s"pt_bucket${n}_$srcCol"
  // cast-to-string before hashing so the bucket of a literal equals
  // the bucket of the column value regardless of the literal's
  // narrower type (an Int probe against a BIGINT column). The string
  // RENDERING must still match — "123" vs "123.0" on a DOUBLE/DECIMAL
  // column would hash to different buckets — so the table layer casts
  // every probe literal to the column's declared type first
  // (VersionedTable.probeType) before computing the transform image.
  def apply(raw: Column): Column = pmod(xxhash64(raw.cast("string")), lit(n.toLong))
  def orderPreserving: Boolean = false
  def serial: String = s"bucket:$n:$srcCol"
}

/** `truncate(w, c)`: floor-to-width binning of a numeric column —
  * `v - pmod(v, w)` (pmod keeps the floor semantics for negatives,
  * matching Iceberg's truncate). Order-preserving: both point and
  * range predicates prune.
  */
final case class TruncateTransform(w: Long, srcCol: String) extends PartitionTransform {
  require(w > 0, s"truncate transform needs w > 0, got $w")
  def statName: String = s"pt_trunc${w}_$srcCol"
  def apply(raw: Column): Column = raw - pmod(raw, lit(w))
  def orderPreserving: Boolean = true
  def serial: String = s"trunc:$w:$srcCol"
}

/** `day(c)`: calendar-day binning of a timestamp/date column (the
  * ingest-time partitioning every event table wants). Order-
  * preserving.
  */
final case class DayTransform(srcCol: String) extends PartitionTransform {
  def statName: String = s"pt_day_$srcCol"
  def apply(raw: Column): Column = to_date(raw)
  def orderPreserving: Boolean = true
  def serial: String = s"day:$srcCol"
}

/** `hour(c)`: hour-granularity binning as epoch-hours (a LONG, so the
  * stat band stays integer-comparable across days). Order-preserving.
  */
final case class HourTransform(srcCol: String) extends PartitionTransform {
  def statName: String = s"pt_hour_$srcCol"
  def apply(raw: Column): Column =
    floor(unix_timestamp(raw.cast("timestamp")) / lit(3600L)).cast("long")
  def orderPreserving: Boolean = true
  def serial: String = s"hour:$srcCol"
}

object PartitionTransform {

  /** The same transform re-targeted at another (physical) column —
    * how the table layer resolves a caller's LOGICAL column name to
    * the stable on-file name before storing the spec.
    */
  def withSrc(t: PartitionTransform, c: String): PartitionTransform = t match {
    case b: BucketTransform   => b.copy(srcCol = c)
    case tr: TruncateTransform => tr.copy(srcCol = c)
    case d: DayTransform      => d.copy(srcCol = c)
    case h: HourTransform     => h.copy(srcCol = c)
  }

  /** Inverse of [[PartitionTransform.serial]]. */
  def parse(s: String): PartitionTransform = s.split(":", 3) match {
    case Array("bucket", n, c) => BucketTransform(n.toInt, c)
    case Array("trunc", w, c)  => TruncateTransform(w.toLong, c)
    case Array("day", c)       => DayTransform(c)
    case Array("hour", c)      => HourTransform(c)
    case _ => throw new IllegalArgumentException(
      s"unparseable partition transform '$s'")
  }

  /** Write-side clustering layout: one pinned-width RANGE shuffle on
    * the transform tuple so each output file covers a CONTIGUOUS
    * slice of partition values (tight pt min/max ⇒ real pruning).
    * Range, not hash (`repartition(cols)`): hash-partitioning the
    * bucket VALUES collides distinct buckets into one partition —
    * a file holding buckets {1, 7} carries the stat interval [1, 7]
    * and survives almost every probe. Pinned width for the same
    * reason as PLANS.md lesson 26: AQE's advisory sizing would
    * coalesce a small batch to one all-spanning file.
    */
  def clusterLayout(parts: Int, ts: Seq[PartitionTransform]): DataFrame => DataFrame = {
    require(ts.nonEmpty, "clusterLayout needs at least one transform")
    df => df.repartitionByRange(parts, ts.map(t => t(col(t.srcCol))): _*)
  }
}
