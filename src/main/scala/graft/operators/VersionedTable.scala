package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STATS + BLOOM SIDECARS composed with WAP versioning (VERDICT r10
  * #3): [[StatsSpine]] gave the repo file-level skipping and
  * [[Publish]] gave it atomic version pointers, but the spine was
  * rebuilt per invocation from a directory — here they are joined
  * into the Delta/Iceberg table model the scaladocs argue for: the
  * MANIFEST IS THE TABLE. Each published version is one small parquet
  * table with a row per live data file — row count, per-column
  * min/max, AND the file's Bloom bitmap (one manifest, both sidecar
  * projections, built in ONE scan of the files it describes) — and
  * every verb folds it:
  *
  *  - [[create]]: lay out + write generation 0, publish manifest v1;
  *  - [[append]]: write ONLY the batch generation, manifest = current
  *    ∪ batch sidecar rows (fold ∝ batch, never the table);
  *  - [[deleteRoster]]: bloom-probe the manifest for holder files
  *    ([[StatsSpine.rosterHolders]] — a distributed position join,
  *    roster never on the driver), rewrite ONLY holders into a fresh
  *    generation, manifest = survivors ∪ replacement rows;
  *  - reads resolve through the POINTER: [[read]] /
  *    [[readVersion]] list exactly the manifest's files — a directory
  *    is never trusted, so superseded generations sitting on disk
  *    (time-travel history) are invisible to the current version and
  *    old versions read back byte-identical after later deletes.
  *
  * Every publish runs the WAP audit on the READ-BACK manifest: rows
  * exist, and every named file is present on disk — a manifest that
  * names a missing file is vetoed before the pointer moves.
  *
  * Scale shape (100 TB): planning reads the manifest (≈ file count
  * rows), appends cost ∝ batch, deletes cost ∝ holder files, and the
  * atomic pointer swap is O(1) — Delta-log economics with the log
  * stored as a queryable parquet table.
  */
object VersionedTable {

  /** Table schema contract: which columns carry min/max stats and
    * which key column the Bloom sidecar indexes.
    */
  final case class Spec(statCols: Seq[String], keyCol: String, mBits: Int)

  private def filesDir(root: String) = s"$root/files"
  private def manifestRoot(root: String) = s"$root/manifest"

  /** ONE scan of `dataDir` producing the combined manifest rows:
    * (file, n_rows, min_c/max_c per stat column, bloom). The groupBy
    * key is the file name, so partial aggregation completes inside
    * each file's own scan tasks.
    */
  private def sidecar(s: SparkSession, dataDir: String, spec: Spec): DataFrame = {
    val aggs: Seq[Column] =
      spec.statCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
        call_function("bloom_agg", col(spec.keyCol).cast("string"), lit(spec.mBits))
          .as("bloom")
    s.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** WAP audit run against every read-back manifest before its
    * pointer swap: each named file must exist — the one invariant
    * whose violation makes every downstream read wrong.
    */
  private def auditFilesExist(back: DataFrame): Unit = {
    val missing = back.select("file").collect().map(_.getString(0))
      .filterNot(f => java.nio.file.Files.exists(
        java.nio.file.Paths.get(f.stripPrefix("file:"))))
    require(missing.isEmpty,
      s"versioned-table manifest names ${missing.length} missing file(s): " +
        missing.take(3).mkString(", "))
  }

  private def publishManifest(manifest: DataFrame, root: String,
                              meta: Map[String, String]): String =
    Publish.publish(manifest, manifestRoot(root),
      audit = auditFilesExist, meta = meta)

  private def freshGen(root: String): String = {
    val g = s"${filesDir(root)}/g-" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    g
  }

  /** Create the table: lay `df` out (caller-chosen clustering — range
    * partitioning for skip-friendly stats, anything for the bloom),
    * write generation 0, publish manifest v1. Returns the version.
    */
  def create(s: SparkSession, df: DataFrame, root: String, spec: Spec,
             layout: DataFrame => DataFrame = identity): String = {
    val gen = freshGen(root)
    layout(df).write.parquet(gen)
    publishManifest(sidecar(s, gen, spec), root, Map("verb" -> "create"))
  }

  /** Append a batch: ONLY the batch generation is written and scanned;
    * the manifest folds batch sidecar rows onto the current version's.
    */
  def append(s: SparkSession, df: DataFrame, root: String, spec: Spec,
             layout: DataFrame => DataFrame = identity): String = {
    val gen = freshGen(root)
    layout(df).write.parquet(gen)
    publishManifest(
      Publish.read(s, manifestRoot(root)).unionByName(sidecar(s, gen, spec)),
      root, Map("verb" -> "append"))
  }

  /** Targeted delete of a roster DataFrame: bloom-probe the CURRENT
    * manifest for holder files, rewrite only those (survivors into a
    * fresh generation, roster rows dropped by anti-join), and publish
    * a manifest with holder rows retracted and replacement rows
    * appended. Prior versions keep reading their own file sets —
    * physical reclaim of superseded generations is a separate janitor
    * (the [[Publish.vacuumRetain]] posture), not part of the commit.
    */
  def deleteRoster(s: SparkSession, root: String, spec: Spec,
                   roster: DataFrame): String = {
    val current = Publish.read(s, manifestRoot(root))
    val holders = StatsSpine.rosterHolders(
        current.select(col("file"), col("bloom")), roster, spec.keyCol, spec.mBits)
      .collect().map(_.getString(0)).toSeq
    if (holders.isEmpty)
      publishManifest(current, root, Map("verb" -> "delete-noop"))
    else {
      val gen = freshGen(root)
      val doomed = roster.select(col(spec.keyCol).cast("string").as("__doomed_k"))
        .filter(col("__doomed_k").isNotNull).distinct()
      s.read.parquet(holders: _*)
        .join(doomed, col(spec.keyCol).cast("string") === col("__doomed_k"), "left_anti")
        .write.parquet(gen)
      val hf = s.createDataFrame(
        java.util.Arrays.asList(holders.map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "file", org.apache.spark.sql.types.StringType, nullable = false))))
      publishManifest(
        current.join(hf, Seq("file"), "left_anti")
          .unionByName(sidecar(s, gen, spec)),
        root, Map("verb" -> "delete", "n_holders" -> holders.length.toString))
    }
  }

  /** The current version's manifest (the queryable table log). */
  def manifest(s: SparkSession, root: String): DataFrame =
    Publish.read(s, manifestRoot(root))

  /** Read the current version: exactly the manifest's file list. */
  def read(s: SparkSession, root: String): DataFrame =
    readFiles(s, manifest(s, root))

  /** TIME TRAVEL: read version `v`'s file set — immutable generations
    * mean the result is byte-identical to what `v`'s publish
    * committed, regardless of later appends/deletes.
    */
  def readVersion(s: SparkSession, root: String, v: String): DataFrame =
    readFiles(s, Publish.readVersion(s, manifestRoot(root), v))

  /** Range-pruned read off the current manifest: only files whose
    * [min, max] interval intersects the band are listed; the caller
    * re-applies the exact predicate (superset contract).
    */
  def prunedRead(s: SparkSession, root: String, c: String,
                 lo: Any, hi: Any): DataFrame =
    readFiles(s, StatsSpine.survivors(manifest(s, root), c, lo, hi))

  private def readFiles(s: SparkSession, manifestRows: DataFrame): DataFrame = {
    val files = manifestRows.select("file").collect().map(_.getString(0))
    require(files.nonEmpty, "versioned table manifest lists no files")
    s.read.parquet(files: _*)
  }
}
