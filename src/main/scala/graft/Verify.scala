package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = args.splitAt(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      // clear any stale output first: a failed query must not leave a
      // previous run's parquet in place to be read as current results
      deleteRec(new java.io.File(s"$outDir/$name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // leave a loud, compare-visible tombstone: the dir exists but
        // holds no parquet, so the driver's read errors (recorded as
        // `err`) instead of the query silently vanishing from the
        // artifact — the round-6 failure mode where 45 broken gates
        // read as "all green"
        new java.io.File(s"$outDir/$name").mkdirs()
        Files.writeString(Paths.get(s"$outDir/$name/_FAILED"),
          s"$name failed during Verify:\n$e")
        failures += name -> e.toString
      }
      // quiesce point: the query is fully written, so the iterative
      // operators' reliable checkpoints are dead — sweep them
      // (operators.Checkpoints contract) so a full Verify run holds at
      // most one invocation's checkpoint files at a time.
      operators.Checkpoints.sweep(spark.sparkContext)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // machine-readable failure roster alongside the per-query tombstones
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_verify_errors.json"), failJson)
    // loud summary but exit 0 by default: a partial run must still hand
    // the driver every good result plus the tombstones — a nonzero exit
    // could void the whole artifact. Automation that gates on exit
    // status alone (CI, not the driver) sets SPARK_GRAFT_VERIFY_STRICT=1
    // to get a nonzero exit AFTER all artifacts are written.
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries FAILED: " +
        failures.keys.mkString(", "))
    spark.stop()
    if (failures.nonEmpty &&
        sys.env.get("SPARK_GRAFT_VERIFY_STRICT").exists(v => v == "1" || v == "true"))
      sys.exit(1)
  }
}
