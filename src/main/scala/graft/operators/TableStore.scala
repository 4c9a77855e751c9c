package graft.operators

/** CONTROL-PLANE storage facade for the table format (VERDICT r14 #7
  * — the one non-plan portability seam): every manifest, pointer,
  * `_META`, tag, marker, DV-sidecar and feed-spool listing/read/write/
  * delete the storage layer performs routes through this ONE small
  * interface, with the local-filesystem implementation as the default.
  * The DATA PLANE (parquet reads/writes) already rides Spark's own
  * Hadoop `FileSystem` abstraction and is untouched; what this facade
  * buys is that a 100 TB deployment points the DRIVER-SIDE planning IO
  * (version listings, pointer swaps, spool custody) at an object
  * store / HDFS by swapping one implementation — instead of hunting
  * `java.nio` calls across the storage layer.
  *
  * Path convention: plain strings, `/`-joined, exactly as the table
  * roots the verbs receive. An implementation maps them onto its own
  * namespace; the local default treats them as filesystem paths.
  * Callers normalize Spark's `file:` URI prefix BEFORE calling (the
  * data-file size probes) — a remote impl would translate schemes
  * there instead.
  *
  * Contract notes an implementation must honor (the crash contracts
  * upstream verbs are built on):
  *  - [[atomicSwap]] is the pointer-publish primitive: readers see the
  *    old or the new content, never a torn state (object-store
  *    conditional put / HDFS atomic rename).
  *  - [[rename]] is the tombstoning move and must FAIL (throw
  *    `java.io.IOException`) rather than overwrite an existing target.
  *  - [[listNames]] of a non-directory returns empty, never throws —
  *    absence and emptiness are the same planning fact.
  *
  * Gate fixtures and the bench/verify harness keep their direct
  * `java.nio` temp-dir management: they ARE local by definition; the
  * facade covers the engine's storage layer, not the test rig.
  */
trait TableStore {
  def exists(path: String): Boolean
  def isDirectory(path: String): Boolean

  /** Child FILE NAMES (not paths) of a directory; empty for a
    * non-directory.
    */
  def listNames(path: String): Seq[String]

  def readString(path: String): String
  def writeString(path: String, content: String): Unit
  def createDirectories(path: String): Unit

  /** Create an empty marker file if absent (idempotent). */
  def createMarker(path: String): Unit

  /** Delete a file (or empty dir) if present; false when absent. */
  def deleteIfExists(path: String): Boolean

  /** Recursive delete of a file or directory tree (idempotent). */
  def deleteTree(path: String): Unit

  /** Atomically replace `dst` with the staged `tmp`. */
  def atomicSwap(tmp: String, dst: String): Unit

  /** Atomic CREATE-NEW of an empty file: true when this call created
    * it, false when it already existed — the cross-process CLAIM
    * primitive (version-number allocation: two driver processes can
    * never both win one number). The default composes exists +
    * createMarker under a JVM-wide monitor and is therefore atomic
    * only against cooperating callers in THIS process; a deployment
    * overrides it with the store's own atomic create (`O_EXCL`, an
    * if-none-match put), as the local impl does.
    */
  def createExclusive(path: String): Boolean =
    TableStore.jvmCas.synchronized {
      if (exists(path)) false else { createMarker(path); true }
    }

  /** COMPARE-AND-SWAP pointer publish (VERDICT r15 #2): atomically
    * replace `dst` with the staged `tmp` ONLY IF dst's current content
    * (trimmed) equals `expected` (None = dst must not exist yet).
    * Returns whether the swap happened; on refusal the staged tmp is
    * deleted. Unlike [[atomicSwap]], the compare and the move are ONE
    * atom ACROSS PROCESSES — this is Delta's LogStore putIfAbsent / an
    * object store's conditional put (ETag compare-and-set) / a
    * catalog's conditional commit, the primitive the in-JVM commit
    * lock cannot substitute for when two DRIVERS share one table. The
    * default composes read + swap under a JVM-wide monitor (in-JVM
    * atomic only — fine for fault-injecting spec wrappers); the local
    * impl holds an OS file lock so two processes on one filesystem
    * cannot both win.
    */
  def swapIfContentIs(tmp: String, dst: String,
                      expected: Option[String]): Boolean =
    TableStore.jvmCas.synchronized {
      val found = if (exists(dst)) Some(readString(dst).trim) else None
      if (found != expected) { deleteIfExists(tmp); false }
      else { atomicSwap(tmp, dst); true }
    }

  /** Non-replacing rename; throws `java.io.IOException` when the
    * target exists or the move fails.
    */
  def rename(src: String, dst: String): Unit

  def size(path: String): Long

  /** Last-modified instant, epoch millis. Contract (ADVICE r15):
    * meaningful for FILES only — implementations need not maintain
    * directory mtimes (object stores have no directory entries at
    * all), so age-based policies must derive a directory's age from
    * the max over its CHILDREN's mtimes, never from the directory
    * entry itself.
    */
  def lastModifiedMs(path: String): Long
}

object TableStore {
  @volatile private var impl: TableStore = LocalTableStore

  /** The active store — resolved per call so a deployment swap (or a
    * spec's fault-injecting wrapper) takes effect everywhere at once.
    */
  def get: TableStore = impl

  def set(s: TableStore): Unit = impl = s

  /** JVM-wide monitor backing the trait's DEFAULT (in-process-only)
    * [[TableStore.createExclusive]] / [[TableStore.swapIfContentIs]]
    * compositions — coarse but correct for the control-plane's short,
    * rare critical sections.
    */
  private[operators] val jvmCas = new Object

  /** ONE canonical spelling per table root (VERDICT r15 #1): every
    * place a root string becomes a KEY — the per-root commit lock,
    * `manifest/` and `files/` path construction, consumer and branch
    * resolution — must normalize through this, or two spellings of one
    * root (`/a/tbl` vs `/a/tbl/` vs `/a//tbl`) silently get different
    * locks and different registry entries while addressing the same
    * directory (exactly the trailing-slash bug class the r15 vacuum
    * repair fixed on the listing side). Pure string normalization —
    * no filesystem access. Scheme-LESS (local filesystem) paths
    * collapse repeated separators and drop `.` segments and any
    * trailing separator. A scheme-qualified root (`s3://bucket/...`)
    * only drops trailing separators (what this facade's own
    * `/`-joining would otherwise double): on an object store the
    * "path" is an opaque KEY where empty segments are SIGNIFICANT —
    * `bucket//x/t` and `bucket/x/t` are DIFFERENT keys, and collapsing
    * them would silently read/write a different location than named.
    * `..` segments are NOT resolved (spell roots without them —
    * resolving would need filesystem semantics this facade
    * deliberately doesn't assume).
    */
  def canonicalRoot(path: String): String = {
    val (scheme, rest) = path.indexOf("://") match {
      case -1 => ("", path)
      case i => (path.substring(0, i + 3), path.substring(i + 3))
    }
    if (scheme.nonEmpty) scheme + rest.reverse.dropWhile(_ == '/').reverse
    else {
      val abs = rest.startsWith("/")
      val body = rest.split('/').iterator
        .filter(s => s.nonEmpty && s != ".").mkString("/")
      if (abs) "/" + body else body
    }
  }
}

/** Forwarding base for store wrappers (fault injection, counting
  * probes, smoke instrumentation): delegates EVERY trait method —
  * including [[TableStore.createExclusive]] and
  * [[TableStore.swapIfContentIs]], which the trait's in-JVM default
  * compositions would otherwise silently substitute for the
  * delegate's cross-process implementations — so a wrapper overrides
  * exactly the methods it instruments and everything else keeps the
  * delegate's semantics. (Two hand-rolled forwarders had already
  * drifted on exactly those two methods.)
  */
class ForwardingTableStore(protected val delegate: TableStore)
  extends TableStore {
  override def exists(path: String): Boolean = delegate.exists(path)
  override def isDirectory(path: String): Boolean = delegate.isDirectory(path)
  override def listNames(path: String): Seq[String] = delegate.listNames(path)
  override def readString(path: String): String = delegate.readString(path)
  override def writeString(path: String, content: String): Unit =
    delegate.writeString(path, content)
  override def createDirectories(path: String): Unit =
    delegate.createDirectories(path)
  override def createMarker(path: String): Unit = delegate.createMarker(path)
  override def deleteIfExists(path: String): Boolean =
    delegate.deleteIfExists(path)
  override def deleteTree(path: String): Unit = delegate.deleteTree(path)
  override def atomicSwap(tmp: String, dst: String): Unit =
    delegate.atomicSwap(tmp, dst)
  override def createExclusive(path: String): Boolean =
    delegate.createExclusive(path)
  override def swapIfContentIs(tmp: String, dst: String,
                               expected: Option[String]): Boolean =
    delegate.swapIfContentIs(tmp, dst, expected)
  override def rename(src: String, dst: String): Unit =
    delegate.rename(src, dst)
  override def size(path: String): Long = delegate.size(path)
  override def lastModifiedMs(path: String): Long =
    delegate.lastModifiedMs(path)
}

/** The default local-filesystem implementation (java.nio), the only
  * place in the storage layer that touches `java.nio.file.Files`.
  */
object LocalTableStore extends TableStore {
  private def p(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path)

  override def exists(path: String): Boolean =
    java.nio.file.Files.exists(p(path))

  override def isDirectory(path: String): Boolean =
    java.nio.file.Files.isDirectory(p(path))

  override def listNames(path: String): Seq[String] = {
    if (!java.nio.file.Files.isDirectory(p(path))) Seq.empty
    else {
      val s = java.nio.file.Files.list(p(path))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSeq
      } finally s.close()
    }
  }

  override def readString(path: String): String =
    new String(java.nio.file.Files.readAllBytes(p(path)),
      java.nio.charset.StandardCharsets.UTF_8)

  override def writeString(path: String, content: String): Unit = {
    java.nio.file.Files.write(p(path),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  override def createDirectories(path: String): Unit = {
    java.nio.file.Files.createDirectories(p(path))
    ()
  }

  override def createMarker(path: String): Unit =
    if (!java.nio.file.Files.exists(p(path))) {
      java.nio.file.Files.createFile(p(path))
      ()
    }

  override def deleteIfExists(path: String): Boolean =
    java.nio.file.Files.deleteIfExists(p(path))

  override def deleteTree(path: String): Unit = {
    def walk(d: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(d)) {
        val s = java.nio.file.Files.list(d)
        try s.forEach(walk(_)) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(d)
      ()
    }
    walk(p(path))
  }

  override def atomicSwap(tmp: String, dst: String): Unit = {
    java.nio.file.Files.move(p(tmp), p(dst),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  override def createExclusive(path: String): Boolean =
    try { java.nio.file.Files.createFile(p(path)); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  private val casMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Cross-PROCESS CAS: an OS advisory file lock on `dst + ".lock"`
    * makes the compare and the move one atom across drivers sharing a
    * filesystem. Same-JVM threads serialize on a monitor FIRST — file
    * locks are held per-process, and an overlapping same-JVM
    * acquisition throws rather than blocks.
    */
  override def swapIfContentIs(tmp: String, dst: String,
                               expected: Option[String]): Boolean =
    casMonitors.computeIfAbsent(dst, _ => new Object).synchronized {
      val ch = java.nio.channels.FileChannel.open(p(dst + ".lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try {
          val found =
            if (java.nio.file.Files.exists(p(dst))) Some(readString(dst).trim)
            else None
          if (found != expected) { deleteIfExists(tmp); false }
          else { atomicSwap(tmp, dst); true }
        } finally { lk.release() }
      } finally ch.close()
    }

  override def rename(src: String, dst: String): Unit = {
    java.nio.file.Files.move(p(src), p(dst))
    ()
  }

  override def size(path: String): Long =
    java.nio.file.Files.size(p(path))

  override def lastModifiedMs(path: String): Long =
    java.nio.file.Files.getLastModifiedTime(p(path)).toMillis
}
