package graft.operators

/** METADATA-ONLY cache keys for content-keyed stored artifacts
  * (VERDICT r10 #1): the stored graph/BM25 artifacts previously
  * derived their cache key by HASHING THE FULL CORPUS on every query
  * invocation — two full-table aggregate scans before any stored-path
  * query could start, a "cache-key ∝ corpus" cost that at 100 TB is a
  * complete corpus read per query, silently diluting the "query ∝
  * index" contract the stored artifacts exist for.
  *
  * The fix is the rule every table format already follows: content
  * can only change when a COMMIT happens, so the commit identity is
  * the cache key —
  *
  *  - a [[Publish]]-managed corpus (a `_CURRENT` pointer present) is
  *    keyed by its published version name: ONE pointer-file read,
  *    invalidation exactly on publish (Delta/Iceberg's
  *    snapshot-id-as-cache-key);
  *  - a plain immutable parquet directory (the driver's testdata) has
  *    no pointer, but its file manifest IS its snapshot: fold the
  *    (relative path, size, mtime) triple of every data file — a
  *    directory listing, zero data bytes, the same identity HDFS/
  *    object-store caches use. Any rewrite lands new files (new
  *    names/sizes/mtimes), so a changed corpus misses.
  *
  * Either way the keying submits NO Spark job (spec-asserted:
  * [[graft.ArtifactKeySpec]] counts jobs during a warm stored-path
  * keying and pins zero).
  */
object ArtifactKey {

  /** Cache key for one corpus path (a parquet file, a parquet
    * directory, or a [[Publish]] root). Stable across JVMs for
    * unchanged content; changes whenever a commit/rewrite lands.
    */
  def corpusKey(path: String): String = {
    val store = TableStore.get
    Publish.currentVersion(path) match {
      case Some(v) => s"pub:$v"
      case None =>
        val entries = scala.collection.mutable.ArrayBuffer.empty[String]
        def walk(f: String): Unit = {
          if (store.isDirectory(f)) store.listNames(f).foreach(n => walk(s"$f/$n"))
          else {
            val name = f.stripPrefix(path).stripPrefix("/")
            // skip commit markers/CRCs: identity is the data files
            if (!name.startsWith("_") && !name.startsWith(".")) {
              entries += s"$name|${store.size(f)}|${store.lastModifiedMs(f)}"
            }
          }
        }
        walk(path)
        val md = java.security.MessageDigest.getInstance("MD5")
        entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
        md.digest().map("%02x".format(_)).mkString.take(16)
    }
  }

  /** One key over several corpus paths plus a layout-version salt —
    * the composite a derived artifact (edges from orders⋈lineitem)
    * keys on: any input committing anew, or the artifact layout
    * version bumping, misses the cache.
    */
  def compositeKey(salt: String, paths: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(salt.getBytes("UTF-8"))
    paths.foreach(p => md.update(s"|${corpusKey(p)}".getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }
}
