package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-ARTIFACT ATOMIC COMMIT: a coordinator log pinning a
  * CONSISTENT SET of artifact versions behind ONE atomic pointer —
  * the multi-table transaction single-table formats punt on (a Delta
  * or Iceberg commit is per-table; catalog-level atomicity across a
  * table and its derived state is why Nessie-style catalogs exist).
  *
  * Protocol: every participant publishes its own new version FIRST —
  * a [[VersionedTable]] manifest, a [[Publish]]-versioned MV or index
  * spine — all immutable and, until pinned, UNREFERENCED. Then the
  * coordinator commits one tiny (artifact, root, version) manifest
  * through [[Publish]]'s write→audit→pointer-swap. Readers resolve
  * every artifact THROUGH the coordinator head, so:
  *
  *  - a crash after any participant publish but before the
  *    coordinator commit leaves readers on the PREVIOUS pinned set —
  *    individually newer versions exist on disk but are invisible
  *    (the WAP posture applied ACROSS artifacts);
  *  - a reader never observes a table at version N next to derived
  *    state computed from version M ≠ N — the torn read that
  *    per-artifact pointers permit;
  *  - [[resolve]] at an old coordinator version is time travel of the
  *    whole SET (each participant keeps its own history, the
  *    coordinator log names which versions belong together).
  *
  * The commit audit re-verifies ON THE READ-BACK rows that every
  * pinned version directory exists with its commit marker — a txn
  * must not pin an artifact version that never finished publishing.
  *
  * Concurrency: [[commit]] takes the expected coordinator head and
  * commits through [[Publish.publishIf]] — two racing transactions
  * cannot both pin; the loser gets [[Publish.PublishConflict]] and
  * rebases (re-reads the head set, re-derives, retries), the
  * single-table OCC loop lifted to the transaction level.
  *
  * Scale shape (100 TB): the coordinator commit is O(participants)
  * rows — the participants' own publishes carry all data cost;
  * isolation comes from immutability plus the single pointer swap,
  * not locks, so readers never block and a 1000-executor scan is
  * never torn by a concurrent commit.
  */
object Txn {

  /** A participant's version directory, wherever its format keeps it:
    * a Publish artifact's versions live at `root/vNNNNN`, a
    * [[VersionedTable]]'s at `root/manifest/vNNNNN`.
    */
  private def versionDir(root: String, v: String): Option[String] =
    Seq(s"$root/$v", s"$root/manifest/$v")
      .find(TableStore.get.isDirectory(_))

  /** Atomically pin `parts` (artifact → (root, version)) as the new
    * consistent set. `expectHead` is the coordinator head the caller
    * derived the set from (None for the first commit) — a moved head
    * throws [[Publish.PublishConflict]].
    */
  def commit(s: SparkSession, txnRoot: String,
             parts: Map[String, (String, String)],
             expectHead: Option[String]): String = {
    import s.implicits._
    require(parts.nonEmpty, "txn commit: no participants")
    val df = parts.toSeq.map { case (a, (r, v)) => (a, r, v) }
      .toDF("artifact", "root", "version")
    val audit = (back: DataFrame) => {
      val missing = back.select("artifact", "root", "version").collect()
        .filterNot { r =>
          versionDir(r.getString(1), r.getString(2))
            .exists(d => TableStore.get.exists(s"$d/_SUCCESS"))
        }
      require(missing.isEmpty,
        s"txn pins ${missing.length} missing/unfinished artifact version(s): " +
          missing.take(3).map(r => s"${r.getString(0)}@${r.getString(2)}").mkString(", "))
    }
    Publish.publishIf(df.coalesce(1), txnRoot, expectHead, audit = audit,
      meta = Map("verb" -> "txn", "n_parts" -> parts.size.toString))
  }

  /** The coordinator's published head version, if any. */
  def head(txnRoot: String): Option[String] = Publish.currentVersion(txnRoot)

  /** The pinned set at the coordinator head (or at a named coordinator
    * version — time travel of the whole set).
    */
  def resolve(s: SparkSession, txnRoot: String,
              at: Option[String] = None): Map[String, (String, String)] = {
    val df = at.fold(Publish.read(s, txnRoot))(v => Publish.readVersion(s, txnRoot, v))
    df.select("artifact", "root", "version").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
  }

  /** Read a [[VersionedTable]] participant through the coordinator. */
  def readTable(s: SparkSession, txnRoot: String, artifact: String,
                at: Option[String] = None): DataFrame = {
    val (root, v) = resolve(s, txnRoot, at)(artifact)
    VersionedTable.readVersion(s, root, v)
  }

  /** Read a [[Publish]]-versioned participant (MV, spine) through the
    * coordinator.
    */
  def readArtifact(s: SparkSession, txnRoot: String, artifact: String,
                   at: Option[String] = None): DataFrame = {
    val (root, v) = resolve(s, txnRoot, at)(artifact)
    Publish.readVersion(s, root, v)
  }
}
