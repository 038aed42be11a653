package graft.lake

import java.nio.file.{Files, Path}

/** Fault-injection hook for the commit protocol (test-only; a null hook —
  * the production state — costs one volatile read per commit primitive).
  *
  * Each commit-I/O primitive announces named points ("posix.tmp-written:…",
  * "store.put-acked:…", "version.published:…"); a test hook that throws
  * [[CommitFault.SimulatedCrash]] at a point emulates `kill -9` at exactly
  * that step. Kill-9 fidelity is the point: when the crash fires, NO
  * in-process cleanup may run (no tmp deletion, no staging removal, no
  * post-commit housekeeping) — the table must recover from exactly the
  * bytes a dead process left behind, via reload + retry + the orphan
  * sweep. `CommitTortureSpec` sweeps a crash over every point of a commit.
  */
object CommitFault {
  final class SimulatedCrash(val point: String)
    extends RuntimeException(s"simulated kill -9 at $point")

  @volatile var hook: (String => Unit) = null

  private val crashed = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  def hit(point: String): Unit = {
    val h = hook
    if (h != null) {
      try h(point)
      catch { case e: SimulatedCrash => crashed.set(java.lang.Boolean.TRUE); throw e }
    }
  }

  /** True while unwinding a SimulatedCrash on this thread: cleanup code
    * consults it to leave partial state behind, as a real dead process
    * would. */
  def crashing: Boolean = crashed.get()
  def isSimulatedCrash(e: Throwable): Boolean = e.isInstanceOf[SimulatedCrash]
  def reset(): Unit = { crashed.set(java.lang.Boolean.FALSE); hook = null }
}

/** The commit protocol's entire I/O contract: publish an immutable blob at
  * a name, atomically, iff the name is absent — plus an mtime freshen for
  * the orphan sweep's age guard. EVERYTHING else the table does with the
  * filesystem (reads, lists, deletes, data-file staging) needs only plain
  * GET/LIST/DELETE semantics that every object store provides; the two
  * operations here are the only ones whose atomicity the format's
  * correctness rests on, which is why they are the ones abstracted.
  *
  * Implementations: [[PosixCommitIo]] (hard-link create-if-absent — HDFS
  * maps it to create-no-overwrite) and [[ObjectStoreCommitIo]] (S3-style
  * conditional PUT — no links, no renames, no tmp files in the table
  * namespace). `CommitTortureSpec` runs the full commit path over both.
  */
trait CommitIo {
  def name: String

  /** Atomically publish `content` at `target` iff absent; false if a
    * concurrent writer won the name. The object must never be visible
    * partially written. */
  def putIfAbsent(target: Path, content: String): Boolean

  /** Refresh `p`'s last-modified time (the orphan sweep's age guard reads
    * it). Throws on failure — the caller treats an unfreshenable reused
    * manifest as a failed commit. */
  def freshen(p: Path): Unit
}

/** POSIX/HDFS commit I/O: write a temp file next to the target, then
  * hard-link it to the final name — link(2) is atomic and fails with
  * EEXIST when a concurrent writer won (HDFS: create-no-overwrite). The
  * temp file is removed on normal completion and on ordinary failures;
  * after a (simulated) process kill it stays behind, exactly like a real
  * crashed writer's, for the `.tmp-` sweep in cleanOrphanedStaging. */
object PosixCommitIo extends CommitIo {
  def name: String = "posix"

  def putIfAbsent(target: Path, content: String): Boolean = {
    if (Files.exists(target)) return false
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".tmp-", ".json")
    try {
      Files.writeString(tmp, content)
      CommitFault.hit(s"posix.tmp-written:${target.getFileName}")
      val linked =
        try { Files.createLink(target, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      CommitFault.hit(s"posix.linked:${target.getFileName}")
      linked
    } finally {
      if (!CommitFault.crashing) Files.deleteIfExists(tmp)
    }
  }

  def freshen(p: Path): Unit =
    Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis()))
}

/** S3-style commit I/O: the only primitive is an atomic whole-object
  * conditional PUT (`If-None-Match: *`) — no hard links, no renames, no
  * temp files beside the target. The local shim stages the body OUTSIDE
  * the table namespace (the store server's internal spool) and linearizes
  * visibility with one atomic link; that link is the emulation of the
  * store server's internal commit, not something the engine above this
  * interface relies on. Consequences faithfully modeled:
  *  - a client killed mid-PUT leaves either the complete object or
  *    nothing — never a partial object, never a `.tmp-` file in the
  *    metadata directory;
  *  - `freshen` is copy-to-self (the S3 idiom for refreshing an object's
  *    Last-Modified), here a server-side mtime update.
  */
final class ObjectStoreCommitIo(storeRoot: Path) extends CommitIo {
  def name: String = "store"

  def putIfAbsent(target: Path, content: String): Boolean = {
    CommitFault.hit(s"store.put-sent:${target.getFileName}")
    if (Files.exists(target)) return false
    Files.createDirectories(target.getParent)
    Files.createDirectories(storeRoot)
    val spool = Files.createTempFile(storeRoot, ".inflight-", ".obj")
    val accepted =
      try {
        Files.writeString(spool, content)
        try { Files.createLink(target, spool); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } finally Files.deleteIfExists(spool) // server spool — always reclaimed
    CommitFault.hit(s"store.put-acked:${target.getFileName}")
    accepted
  }

  def freshen(p: Path): Unit =
    Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis()))
}
