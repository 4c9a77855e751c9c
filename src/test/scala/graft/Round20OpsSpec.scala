package graft

import graft.operators.{LocalTableStore, Publish, TableStore, VersionedTable}

/** Round-16 control-plane hardening (VERDICT r15 #1–#3 + ADVICE r15):
  * one canonical spelling per table root wherever a root becomes a
  * key, the in-lock strictly-monotone ICT stamp, and the O(1)
  * `_ts_max` running-max commit cost.
  */
class Round20OpsSpec extends SparkSpec {

  /** Forwarding wrapper — specs override just the methods they count
    * or fault-inject.
    */
  private class Forward(d: TableStore) extends TableStore {
    override def exists(p: String) = d.exists(p)
    override def isDirectory(p: String) = d.isDirectory(p)
    override def listNames(p: String) = d.listNames(p)
    override def readString(p: String) = d.readString(p)
    override def writeString(p: String, c: String) = d.writeString(p, c)
    override def createDirectories(p: String) = d.createDirectories(p)
    override def createMarker(p: String) = d.createMarker(p)
    override def deleteIfExists(p: String) = d.deleteIfExists(p)
    override def deleteTree(p: String) = d.deleteTree(p)
    override def atomicSwap(t: String, p: String) = d.atomicSwap(t, p)
    override def rename(a: String, b: String) = d.rename(a, b)
    override def size(p: String) = d.size(p)
    override def lastModifiedMs(p: String) = d.lastModifiedMs(p)
  }

  test("canonicalRoot: separators collapse, trailing slash and dot segments drop, schemes survive") {
    assert(TableStore.canonicalRoot("/a/tbl") == "/a/tbl")
    assert(TableStore.canonicalRoot("/a/tbl/") == "/a/tbl")
    assert(TableStore.canonicalRoot("/a//tbl") == "/a/tbl")
    assert(TableStore.canonicalRoot("/a/./tbl/") == "/a/tbl")
    assert(TableStore.canonicalRoot("rel/t/") == "rel/t")
    assert(TableStore.canonicalRoot("s3://bucket//x/t/") == "s3://bucket/x/t")
  }

  test("canonical lock key: concurrent commits through four spellings of one root are gap-free, every dir committed") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-canon").toString
    val root = s"$base/t"
    // four spellings of the SAME root — the r15 weak: un-normalized
    // keys gave each its own lock object, so the advertised per-root
    // serialization silently didn't hold across spellings
    val spellings =
      Seq(root, root + "/", s"$base//t", s"$base/./t/")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val perThread = 6
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = spellings.zipWithIndex.map { case (spelling, ti) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try (0 until perThread).foreach { i =>
            Publish.publish(Seq((ti, i)).toDF("a", "b"), spelling)
          } catch { case _: Throwable => failures.incrementAndGet(); () }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(failures.get() == 0, "no commit may fail under contention")
    val names = LocalTableStore.listNames(root)
    val live = names.filter(_.matches("v\\d+")).map(_.drop(1).toLong).sorted
    assert(live == (1L to (4L * perThread)),
      s"versions must be gap-free and collision-free, got $live")
    live.foreach { n =>
      assert(LocalTableStore.exists(f"$root/v$n%05d/_SUCCESS"),
        s"v$n must carry _SUCCESS — a torn dir means the lock didn't hold")
    }
    assert(names.count(_.endsWith(".failed")) == 0, "no tombstoned attempts")
    assert(Publish.currentVersion(root).contains(f"v${4 * perThread}%05d"))
    // all four spellings read the same head
    spellings.foreach(sp =>
      assert(Publish.currentVersion(sp) == Publish.currentVersion(root)))
    LocalTableStore.deleteTree(base)
  }

  test("ICT stamp is strictly increasing across concurrent same-table writers (minted inside the commit lock)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ictc").toString
    val root = s"$base/t"
    val spec = VersionedTable.Spec(Seq("n"), "k", 1 << 10)
    VersionedTable.create(spark,
      (0L until 8L).map(i => (i, i)).toDF("k", "n"), root, spec)
    VersionedTable.setInCommitTimestamps(spark, root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = (0 until 6).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit =
          try (0 until 4).foreach { _ =>
            VersionedTable.setInCommitTimestamps(spark, root); ()
          } catch { case _: Throwable => failures.incrementAndGet(); () }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(failures.get() == 0)
    val stamps = VersionedTable.publishedVersions(root)
      .flatMap(v => VersionedTable.versionMeta(root, v).get("commit_ts"))
      .map(_.toLong)
    assert(stamps.length >= 25, s"24 concurrent + 1 enable: $stamps")
    stamps.sliding(2).foreach { case Seq(a, b) =>
      assert(a < b,
        s"ICT stamps must be STRICTLY increasing in version order, got $a !< $b")
    }
    LocalTableStore.deleteTree(base)
  }

  test("ICT commit cost is O(1) in table history: no _ts_index parse, one _ts_max read, constant _META reads per commit") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-icto").toString
    val root = s"$base/t"
    val spec = VersionedTable.Spec(Seq("n"), "k", 1 << 10)
    VersionedTable.create(spark,
      (0L until 8L).map(i => (i, i)).toDF("k", "n"), root, spec)
    VersionedTable.setInCommitTimestamps(spark, root)

    val tsIndexReads = new java.util.concurrent.atomic.AtomicLong(0)
    val tsMaxReads = new java.util.concurrent.atomic.AtomicLong(0)
    val metaReads = new java.util.concurrent.atomic.AtomicLong(0)
    val counting = new Forward(LocalTableStore) {
      override def readString(p: String) = {
        if (p.endsWith("_ts_index")) tsIndexReads.incrementAndGet()
        if (p.endsWith("_ts_max")) tsMaxReads.incrementAndGet()
        if (p.endsWith("_META")) metaReads.incrementAndGet()
        super.readString(p)
      }
    }
    def measureOneCommit(): (Long, Long, Long) = {
      TableStore.set(counting)
      try {
        tsIndexReads.set(0); tsMaxReads.set(0); metaReads.set(0)
        VersionedTable.setInCommitTimestamps(spark, root)
        (tsIndexReads.get(), tsMaxReads.get(), metaReads.get())
      } finally TableStore.set(LocalTableStore)
    }
    def grow(n: Int): Unit =
      (0 until n).foreach { _ =>
        VersionedTable.setInCommitTimestamps(spark, root); ()
      }

    grow(25)
    val small = measureOneCommit()
    grow(50)
    val large = measureOneCommit()
    // the r15 cost was O(history) per stamped commit (full
    // effectiveCommitTs walk: every version's _SUCCESS probed, the
    // whole _ts_index parsed); now the stamp reads ONE _ts_max line
    assert(small._1 == 0L && large._1 == 0L,
      s"a stamped commit must not parse _ts_index, got $small / $large")
    assert(small._2 == 1L && large._2 == 1L,
      s"exactly one _ts_max read per stamped commit, got $small / $large")
    assert(small._3 == large._3 && small._3 <= 2L,
      s"_META reads per commit must not grow with history, got $small / $large")
    // history is intact and stamps strictly increase end to end
    val stamps = VersionedTable.publishedVersions(root)
      .flatMap(v => VersionedTable.versionMeta(root, v).get("commit_ts"))
      .map(_.toLong)
    assert(stamps.length >= 78)
    stamps.sliding(2).foreach { case Seq(a, b) => assert(a < b) }
    LocalTableStore.deleteTree(base)
  }

  test("_ts_max advances past explicit stamps: a later auto-stamp never mints below history") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-icte").toString
    val root = s"$base/t"
    val spec = VersionedTable.Spec(Seq("n"), "k", 1 << 10)
    VersionedTable.create(spark,
      (0L until 8L).map(i => (i, i)).toDF("k", "n"), root, spec)
    VersionedTable.setInCommitTimestamps(spark, root) // seeds _ts_max
    // an explicit (clock-skewed) stamp far ahead of wallclock
    val skew = System.currentTimeMillis() + 86400000L
    VersionedTable.append(spark,
      (8L until 12L).map(i => (i, i)).toDF("k", "n"), root, spec,
      extraMeta = Map("commit_ts" -> skew.toString))
    // the next AUTO stamp must land strictly after the explicit one
    VersionedTable.setInCommitTimestamps(spark, root)
    val stamps = VersionedTable.publishedVersions(root)
      .flatMap(v => VersionedTable.versionMeta(root, v).get("commit_ts"))
      .map(_.toLong)
    stamps.sliding(2).foreach { case Seq(a, b) =>
      assert(a < b, s"auto-stamp after an explicit skewed stamp regressed: $stamps")
    }
    assert(stamps.last > skew)
    LocalTableStore.deleteTree(base)
  }
}
