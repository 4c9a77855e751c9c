package graft.operators

import org.apache.spark.SparkContext

/** Reliable-checkpoint lifetime management for the iterative operators
  * (PageRank, ConnectedComponents.runStar).
  *
  * Those operators materialize their result through a reliable
  * checkpoint — the only lineage-truncation that the cache manager does
  * NOT own (`localCheckpoint` persists outside it, where
  * `Dataset.unpersist` cannot release the blocks — PLANS.md #20), so
  * the cache-leak fix traded stranded memory for checkpoint FILES:
  * Spark never cleans reliable checkpoints by default, and a long
  * Verify/Bench session leaked one |V|-row directory per iterative
  * invocation (VERDICT r5 "what's wrong" #2). Three bounds close that:
  *
  *  1. ONE per-JVM root, deleted by a shutdown hook — no session can
  *     leak past its own lifetime;
  *  2. `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  *     (Sessions.tuned) — GC-collected checkpointed RDDs drop their
  *     files mid-session;
  *  3. [[sweep]] — an explicit quiesce-point clean for the
  *     deterministic bound the spec asserts (GC-driven cleaning has no
  *     testable deadline). Verify and Bench call it between queries.
  *
  * Sweep contract: every previously returned checkpointed frame is
  * DEAD after a sweep (its files are gone; re-reading it throws).
  * Callers invoke it only at points where prior results are fully
  * consumed — between Bench reps/queries, between Verify writes —
  * which is exactly where `spark.catalog.clearCache()` already sits.
  */
object Checkpoints {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-ckpt")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    p
  }

  /** Recursive delete shared by every local-artifact lifecycle in the
    * engine (checkpoint roots here, retired stored indexes in
    * ExtQueries, gate fixtures) — delegates to the [[TableStore]]
    * facade so the one storage-IO seam owns the implementation; the
    * storage layer itself calls `TableStore.get.deleteTree` directly.
    */
  private[graft] def deleteTree(p: java.nio.file.Path): Unit =
    TableStore.get.deleteTree(p.toString)

  /** Point the context at the per-JVM root (idempotent — an existing
    * checkpoint dir, e.g. a streaming test's, is left alone).
    */
  def ensure(sc: SparkContext): Unit = synchronized {
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(root.toString)
  }

  /** Delete every checkpoint under the context's checkpoint dir (the
    * `rdd-*` directories under the per-context UUID dir). Only touches
    * checkpoints under OUR root — a caller-supplied checkpoint dir is
    * never swept.
    */
  def sweep(sc: SparkContext): Unit = synchronized {
    sc.getCheckpointDir.foreach { d =>
      val p = java.nio.file.Paths.get(new java.net.URI(d).getPath match {
        case null => d
        case path => path
      })
      if (p.startsWith(root) && TableStore.get.isDirectory(p.toString))
        TableStore.get.listNames(p.toString)
          .foreach(n => TableStore.get.deleteTree(s"$p/$n"))
    }
  }

  /** Reliable-checkpoint a frame WITHOUT the double computation (r16,
    * guide §1 measure-first finding): `Dataset.checkpoint()` runs the
    * plan once for its eager count and then AGAIN inside
    * `doCheckpoint()` when the checkpoint files are written — Spark's
    * own RDD.checkpoint scaladoc says to persist first. For the
    * iterative operators that was the whole superstep cascade twice
    * per invocation (PageRank's three rounds, the BPE vocab scan, the
    * minhash pair pipelines). The persist bracket makes the checkpoint
    * write read cached blocks; the returned frame is backed by the
    * checkpoint files (NOT the cache), so the bracket releases
    * immediately and the caller's lifetime contract is unchanged.
    */
  def materialize(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    ensure(df.sparkSession.sparkContext)
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try cached.checkpoint() finally { cached.unpersist(); () }
  }

  /** Number of live checkpoint directories under the context's
    * checkpoint dir — the observable the hygiene spec bounds.
    */
  def liveCount(sc: SparkContext): Long =
    sc.getCheckpointDir.map { d =>
      val p = java.nio.file.Paths.get(new java.net.URI(d).getPath match {
        case null => d
        case path => path
      })
      if (TableStore.get.isDirectory(p.toString))
        TableStore.get.listNames(p.toString).length.toLong
      else 0L
    }.getOrElse(0L)
}
