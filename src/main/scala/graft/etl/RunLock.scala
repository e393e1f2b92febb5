package graft.etl

import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.file.{Path, StandardOpenOption}

/** App-level run lock for the mutating pipeline stages.
  *
  * The reference serializes its archive under a PostgreSQL advisory lock
  * with a bounded wait
  * (/root/reference/python/04_archive_pedidos.py:74-82:
  * `SET LOCAL lock_timeout`, `pg_try_advisory_xact_lock(hashtext(
  * 'move_staging_to_archive'))`, abort-without-waiting when another runner
  * holds it). The engine owns plain parquet directories instead of a
  * database, so the equivalent inter-process primitive is an OS file lock:
  * `FileChannel.tryLock` on a sibling `.runlock` file, polled until a
  * bounded deadline, then a clean no-op — never a blocking wait, never a
  * concurrent double-move.
  *
  * Within one JVM an already-held `FileLock` makes `tryLock` throw
  * `OverlappingFileLockException` rather than return null; both signals are
  * treated as "busy". The lock is advisory exactly like the reference's:
  * it serializes runners that use it, it does not fence external writers.
  */
object RunLock {

  /** One shared, REFCOUNTED channel per lock file: POSIX fcntl drops ALL
    * of a process's locks on a file when ANY fd for it closes (the
    * FileLock javadoc's explicit warning), so a busy waiter closing its
    * own channel would silently release a lock another thread of this
    * process still believes it holds — re-opening the double-move window
    * the lock exists to close. A channel therefore closes only when the
    * LAST thread using that path leaves (no holder, no waiter), which
    * also keeps the fd count bounded for dynamic per-run lock paths. */
  private final class Entry(val ch: FileChannel) { var refs = 0 }
  private val entries = scala.collection.mutable.HashMap.empty[Path, Entry]

  /** Run `body` under an exclusive lock on `lockFile`, polling up to
    * `waitMs` ms for acquisition. Returns None (and runs nothing) if the
    * lock is still held elsewhere at the deadline — the caller reports a
    * clean "skipped: concurrent run" outcome, mirroring the reference's
    * abort message (04_archive_pedidos.py:82). */
  def tryWithLock[A](lockFile: Path, waitMs: Long)(body: => A): Option[A] = {
    val key = lockFile.toAbsolutePath.normalize
    val entry = entries.synchronized {
      val e = entries.getOrElseUpdate(key, {
        val parent = key.getParent
        if (parent != null) java.nio.file.Files.createDirectories(parent)
        new Entry(FileChannel.open(key,
          StandardOpenOption.CREATE, StandardOpenOption.WRITE))
      })
      e.refs += 1
      e
    }
    try {
      val deadline = System.nanoTime() + waitMs * 1000000L
      var lock: FileLock = tryAcquire(entry.ch)
      while (lock == null && System.nanoTime() < deadline) {
        Thread.sleep(25)
        lock = tryAcquire(entry.ch)
      }
      if (lock == null) None
      else try Some(body) finally lock.release()
    } finally entries.synchronized {
      entry.refs -= 1
      if (entry.refs == 0) {
        entries.remove(key)
        try entry.ch.close() catch { case _: Exception => () }
      }
    }
  }

  private def tryAcquire(ch: FileChannel): FileLock =
    try ch.tryLock()
    catch { case _: OverlappingFileLockException => null }
}
