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

  /** One JVM-wide channel per lock file, NEVER closed while the JVM lives:
    * POSIX fcntl drops ALL of a process's locks on a file when ANY fd for
    * it closes (the FileLock javadoc's explicit warning), so a busy
    * waiter closing its own channel would silently release a lock another
    * thread of this process still believes it holds — re-opening the
    * double-move window the lock exists to close. The map is bounded by
    * the number of distinct pipelines in the process. */
  private val channels =
    new java.util.concurrent.ConcurrentHashMap[Path, FileChannel]()

  private def channelFor(lockFile: Path): FileChannel = {
    val key = lockFile.toAbsolutePath.normalize
    channels.computeIfAbsent(key, p => {
      val parent = p.getParent
      if (parent != null) java.nio.file.Files.createDirectories(parent)
      FileChannel.open(p, StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    })
  }

  /** Run `body` under an exclusive lock on `lockFile`, polling up to
    * `waitMs` ms for acquisition. Returns None (and runs nothing) if the
    * lock is still held elsewhere at the deadline — the caller reports a
    * clean "skipped: concurrent run" outcome, mirroring the reference's
    * abort message (04_archive_pedidos.py:82). */
  def tryWithLock[A](lockFile: Path, waitMs: Long)(body: => A): Option[A] = {
    val ch = channelFor(lockFile)
    val deadline = System.nanoTime() + waitMs * 1000000L
    var lock: FileLock = tryAcquire(ch)
    while (lock == null && System.nanoTime() < deadline) {
      Thread.sleep(25)
      lock = tryAcquire(ch)
    }
    if (lock == null) None
    else try Some(body) finally lock.release()
  }

  private def tryAcquire(ch: FileChannel): FileLock =
    try ch.tryLock()
    catch { case _: OverlappingFileLockException => null }
}
