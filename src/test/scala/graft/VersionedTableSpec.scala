package graft

import org.apache.spark.sql.functions._
import graft.operators.{Publish, VersionedTable}

/** Manifest-as-table claims the `layout_versioned_publish` hash gate
  * can't see: pruning actually drops files, superseded generations
  * stay on disk but invisible to the head version, time travel is
  * byte-identical after a later delete, and the manifest audit vetoes
  * a manifest naming missing files.
  */
class VersionedTableSpec extends SparkSpec {

  private val spec = VersionedTable.Spec(Seq("k"), "k", 1 << 13)

  private def fixture(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-vt").toString
    val layout = (df: org.apache.spark.sql.DataFrame) =>
      df.repartitionByRange(4, col("k")).sortWithinPartitions("k")
    VersionedTable.create(spark,
      (0L until 400L).map(i => (i, s"v$i")).toDF("k", "v"), root, spec, layout)
    VersionedTable.append(spark,
      (400L until 600L).map(i => (i, s"v$i")).toDF("k", "v"), root, spec, layout)
    root
  }

  test("append folds without rescanning gen0; manifest row counts account for every row") {
    val root = fixture()
    val m = VersionedTable.manifest(spark, root)
    assert(m.agg(sum("n_rows")).head.getLong(0) == 600L)
    assert(VersionedTable.read(spark, root).count() == 600L)
    // the v1 manifest is intact and reads only gen0
    assert(VersionedTable.readVersion(spark, root, "v00001").count() == 400L)
  }

  test("pruned band read lists strictly fewer files; range spans both generations") {
    val root = fixture()
    val total = VersionedTable.manifest(spark, root).count()
    val band = VersionedTable.manifest(spark, root)
      .filter(col("min_k") <= 450L && col("max_k") >= 350L).count()
    assert(band < total, s"band kept $band of $total files — layout broke")
    val got = VersionedTable.prunedRead(spark, root, "k", 350L, 450L)
      .filter(col("k").between(350L, 450L))
    assert(got.count() == 101L)
  }

  test("delete rewrites only holders; time travel reads superseded content byte-identically") {
    import spark.implicits._
    val root = fixture()
    val before = VersionedTable.readVersion(spark, root, "v00002")
      .orderBy("k").as[(Long, String)].collect()
    val v3 = VersionedTable.deleteRoster(spark, root, spec,
      (0L until 600L by 7L).toDF("k"))
    assert(v3 == "v00003")
    val head = VersionedTable.read(spark, root)
    assert(head.filter(col("k") % 7 === 0).count() == 0L)
    assert(head.count() == 600L - 86L)
    // v2 still reads exactly its pre-delete content (generations are
    // immutable; the delete wrote a NEW generation and a NEW manifest)
    val after = VersionedTable.readVersion(spark, root, "v00002")
      .orderBy("k").as[(Long, String)].collect()
    assert(after.sameElements(before))
    // superseded holder files remain ON DISK but are invisible to the
    // head manifest — the directory is never the table
    val mFiles = VersionedTable.manifest(spark, root)
      .select("file").as[String].collect().toSet
    val onDisk = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(walk(_)) finally s.close()
        } else if (p.toString.endsWith(".parquet")) buf += p.toString
      }
      walk(java.nio.file.Paths.get(s"$root/files"))
      buf.toSet
    }
    // input_file_name() yields file:///… URIs; compare normalized paths
    val mPaths = mFiles.map(f =>
      java.nio.file.Paths.get(f.stripPrefix("file:")).toString)
    assert(mPaths.forall(onDisk.contains),
      "manifest names a file missing on disk")
    assert(onDisk.size > mPaths.size,
      "superseded generation files should remain on disk for time travel")
  }

  test("delete of absent keys publishes a content-identical manifest (no rewrite)") {
    import spark.implicits._
    val root = fixture()
    val filesBefore = VersionedTable.manifest(spark, root)
      .select("file").as[String].collect().toSet
    VersionedTable.deleteRoster(spark, root, spec, Seq(999999L).toDF("k"))
    val filesAfter = VersionedTable.manifest(spark, root)
      .select("file").as[String].collect().toSet
    assert(filesAfter == filesBefore)
  }

  test("publish audit vetoes a manifest naming missing files; pointer untouched") {
    import spark.implicits._
    val root = fixture()
    val current = Publish.currentVersion(s"$root/manifest").get
    // corrupt the table root: physically remove one live generation
    // file, then attempt a verb that republishes the manifest
    val victim = VersionedTable.manifest(spark, root)
      .select("file").as[String].head().stripPrefix("file:")
    java.nio.file.Files.delete(java.nio.file.Paths.get(victim))
    intercept[IllegalArgumentException] {
      VersionedTable.deleteRoster(spark, root, spec, Seq(999999L).toDF("k"))
    }
    assert(Publish.currentVersion(s"$root/manifest").contains(current),
      "a vetoed publish must leave the pointer untouched")
  }
}
