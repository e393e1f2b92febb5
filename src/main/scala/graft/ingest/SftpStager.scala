package graft.ingest

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/** Driver-side file stager: copy new remote CSVs into the local landing dir
  * (`novos/`) with size-verified, retried downloads — never deleting from
  * the source.
  *
  * Re-expression of /root/reference/python/01_ingest_sftp_pedidos.py:
  *  - list remote non-directories whose name uppercases to *.CSV (:46-49)
  *  - skip files whose name already exists locally (:96,112-114)
  *  - download via temp `.part` file, verify size, ≤3 attempts with 2 s
  *    backoff (:25-26,62-88)
  *  - clean stale `.part` files before a run (:51-60)
  *  - process in filename order (:110)
  *
  * This is deliberately NOT a Spark DataSource (SURVEY §7.4): the workload is
  * a few hundred small control-plane file transfers; Spark's entry point is
  * the landing directory. The transport is abstracted behind [[RemoteStore]]:
  * [[SftpBatchStore]] speaks wire SFTP through the OpenSSH `sftp(1)` client
  * (no SSH library ships in this build's dependency set), and [[LocalStore]]
  * serves tests and same-host pipelines.
  */
object SftpStager {

  /** Minimal remote-transport contract (list + streaming get + stat). */
  trait RemoteStore {
    def list(dir: String): Seq[RemoteFile]
    def size(path: String): Long
    def get(path: String, localTmp: Path): Unit
  }

  case class RemoteFile(name: String, path: String, size: Long, isDir: Boolean)

  /** Local-filesystem transport (tests / same-host staging). */
  class LocalStore(root: Path) extends RemoteStore {
    def list(dir: String): Seq[RemoteFile] = {
      val d = root.resolve(dir)
      if (!Files.isDirectory(d)) Seq.empty
      else Files.list(d).iterator.asScala.map { p =>
        RemoteFile(p.getFileName.toString, root.relativize(p).toString,
          if (Files.isRegularFile(p)) Files.size(p) else 0L, Files.isDirectory(p))
      }.toSeq
    }
    def size(path: String): Long = Files.size(root.resolve(path))
    def get(path: String, localTmp: Path): Unit =
      Files.copy(root.resolve(path), localTmp, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Wire SFTP transport via the OpenSSH `sftp(1)` client in batch mode —
    * the reference's paramiko `SFTPClient` (01_ingest_sftp_pedidos.py:40-44
    * connect, :46-49 listdir_attr, :62-88 get) re-expressed over the one
    * SSH implementation available in this environment (no SSH jars ship
    * with Spark; the `sftp` binary does). Each operation writes a batch
    * file and runs `sftp -b`, which aborts non-zero on the first failed
    * command — surfacing transfer errors to [[downloadWithVerify]]'s
    * retry loop exactly like a thrown paramiko error.
    *
    * `target` is `[user@]host` (port/identity/options via `extraArgs`,
    * e.g. `Seq("-P", "2222", "-i", keyPath)`). Default auth is
    * NON-INTERACTIVE (key/agent — BatchMode is forced); for the reference's
    * password setup use [[SftpBatchStore.withPassword]], which wraps the
    * client in sshpass(1). `command` is injectable so tests can exercise
    * the full batch/parse/verify plumbing against a scripted transport
    * without a live sshd; `env` adds process environment entries (the
    * password channel — never argv, which is world-readable in /proc). */
  class SftpBatchStore(target: String, extraArgs: Seq[String] = Seq.empty,
      command: Seq[String] = Seq("sftp", "-oBatchMode=yes"),
      env: Map[String, String] = Map.empty) extends RemoteStore {

    private def runBatch(cmds: Seq[String]): Seq[String] = {
      val batch = Files.createTempFile("graft_sftp_", ".batch")
      try {
        Files.write(batch, cmds.mkString("", "\n", "\n").getBytes("UTF-8"))
        val argv = command ++ extraArgs ++ Seq("-b", batch.toString, target)
        val pb = new ProcessBuilder(argv.asJava)
        env.foreach { case (k, v) => pb.environment().put(k, v); () }
        pb.redirectErrorStream(true) // one stream: no pipe-buffer deadlock
        val proc =
          try pb.start()
          catch {
            case e: java.io.IOException if command.headOption.contains("sshpass") =>
              throw new java.io.IOException(
                "sshpass(1) not found on PATH — password-authenticated SFTP " +
                  "needs it (e.g. `apt install sshpass`); alternatively use " +
                  "key/agent auth via the default SftpBatchStore", e)
          }
        val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
        val rc = proc.waitFor()
        if (rc != 0)
          throw new java.io.IOException(
            s"sftp exited $rc for [${cmds.mkString("; ")}]: ${out.takeRight(500)}")
        out.linesIterator.filterNot(_.startsWith("sftp>")).toSeq
      } finally { Files.deleteIfExists(batch); () }
    }

    /** `ls -l` long-listing line: perms(+optional ACL/SELinux suffix),
      * links, owner, group, SIZE, month day time/year, NAME. Emitted by
      * both openssh-sftp's ls and GNU ls (the test transport). Symlink
      * entries render the name as `link -> target`; keep the link name
      * (get() follows the link server-side). The reported SIZE is the
      * link inode's own, so verification fails loudly for symlinked
      * files — the same behavior as the reference's paramiko
      * `listdir_attr` size check (01_ingest_sftp_pedidos.py:46-49,78-82):
      * lstat-sized listings are an SFTP protocol limitation, not an
      * engine choice; publish real files, not links, on the remote. */
    private val lsLine =
      """^([-dl])[rwxsStT-]{9}[.+]?\s+\S+\s+\S+\s+\S+\s+(\d+)\s+\S+\s+\S+\s+\S+\s+(.+?)\s*$""".r

    // GNU ls (the test transport) prefixes directory listings with a
    // "total N" block-count line; openssh-sftp's ls does not. Known-benign,
    // never an entry — excluded from both the parse and the drift warning.
    private val lsTotal = """^total\s+\d+$""".r

    /** Split ls output into parsed entries and REJECTED lines. Rejects are
      * returned, not swallowed: a server-side ls format drift that matched
      * nothing would otherwise read as an empty directory and the stager
      * would silently stop ingesting. */
    private def parseLs(
        lines: Seq[String]): (Seq[(String, Long, Boolean)], Seq[String]) =
      lines.filter(_.trim.nonEmpty)
        .foldLeft((Vector.empty[(String, Long, Boolean)], Vector.empty[String])) {
          case ((ok, bad), lsLine(kind, size, name)) =>
            val cleanName =
              if (kind == "l") name.split(" -> ", 2).head else name
            (ok :+ ((cleanName, size.toLong, kind == "d")), bad)
          case ((ok, bad), lsTotal()) => (ok, bad)
          case ((ok, bad), other) => (ok, bad :+ other)
        }

    /** Batch-file command injection guard: sftp batch syntax cannot escape
      * a double-quote inside a quoted operand, and backslash is itself the
      * client tokenizer's escape character. */
    private def q(path: String): String = {
      require(!path.contains("\"") && !path.contains("\\") &&
        !path.contains("\n"),
        s"path not representable in sftp batch mode: $path")
      "\"" + path + "\""
    }

    def list(dir: String): Seq[RemoteFile] = {
      val (parsed, rejected) = parseLs(runBatch(Seq(s"ls -l ${q(dir)}")))
      // LOUD, not silent: rejected lines mean the server's ls format has
      // drifted from the expected long-listing shape — left unreported, a
      // full drift reads as "directory is empty" and ingestion just stops
      if (rejected.nonEmpty)
        System.err.println(s"[graft] sftp ls: ${rejected.size} unparseable " +
          s"line(s) ignored in listing of $dir (format drift? first: " +
          s"'${rejected.head.take(200)}')")
      parsed.map { case (name, sz, isDir) =>
        // ls prints basenames for a directory listing; rejoin with dir
        val base = name.substring(name.lastIndexOf('/') + 1)
        RemoteFile(base, s"$dir/$base", sz, isDir)
      }
    }

    def size(path: String): Long = {
      val lines = runBatch(Seq(s"ls -l ${q(path)}")).filter(_.trim.nonEmpty)
      val (parsed, _) = parseLs(lines)
      // unparseable output must be LOUD, not "0 entries": silently dropped
      // lines would report a stat failure for a file that exists
      if (parsed.isEmpty && lines.nonEmpty)
        throw new java.io.IOException(
          s"unparseable ls output for $path: '${lines.head.take(200)}'")
      def base(n: String) = n.substring(n.lastIndexOf('/') + 1)
      parsed match {
        // the single entry must BE the requested path: `ls -l <dir>` of a
        // directory with exactly one file also yields one non-dir entry,
        // and verifying a download against that child's size would pass
        // or fail arbitrarily
        case Seq((name, sz, false)) if base(name) == base(path) => sz
        case Seq((name, _, _)) => throw new java.io.IOException(
          s"stat of $path resolved to a different object '$name' " +
            "(directory, not a file?)")
        case other => throw new java.io.IOException(
          s"stat of $path returned ${other.size} entries")
      }
    }

    def get(path: String, localTmp: Path): Unit = {
      runBatch(Seq(s"get ${q(path)} ${q(localTmp.toString)}"))
      ()
    }
  }

  object SftpBatchStore {
    /** Password-authenticated transport — reference parity with paramiko's
      * `connect(..., password=...)` (01_ingest_sftp_pedidos.py:40-44). The
      * OpenSSH client itself cannot read a password from anywhere but a
      * TTY, so the store wraps it in sshpass(1), feeding the password via
      * the SSHPASS environment variable of the child process only (never
      * argv and never the JVM's own env). BatchMode must be OFF here —
      * it is precisely the "never prompt" switch — and prompts are capped
      * at one so a wrong password fails fast instead of retrying.
      * `command` stays injectable for tests (scripted transport, no sshd,
      * no sshpass). */
    def withPassword(target: String, password: String,
        extraArgs: Seq[String] = Seq.empty,
        command: Seq[String] = Seq("sshpass", "-e", "sftp",
          "-oBatchMode=no", "-oNumberOfPasswordPrompts=1")): SftpBatchStore =
      new SftpBatchStore(target, extraArgs, command,
        env = Map("SSHPASS" -> password))
  }

  val retries = 3 // ref :25
  val sleepBetweenMs = 2000L // ref :26

  case class Report(downloaded: Seq[String], skipped: Seq[String], failed: Seq[String])

  /** Delete stale *.part temp files (ref :51-60). */
  def cleanupPartFiles(landing: Path): Int = {
    if (!Files.isDirectory(landing)) return 0
    val parts = Files.list(landing).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".part")).toSeq
    parts.foreach(p => Try(Files.delete(p)))
    parts.size
  }

  /** Size-verified download with retry (ref :62-88): fetch to `<name>.part`,
    * compare sizes, atomically rename on success, delete partial on
    * mismatch; up to [[retries]] attempts. */
  def downloadWithVerify(store: RemoteStore, remote: RemoteFile, landing: Path,
      sleeper: Long => Unit = Thread.sleep): Boolean = {
    val tmp = landing.resolve(remote.name + ".part")
    val dst = landing.resolve(remote.name)
    (1 to retries).foreach { attempt =>
      Try {
        store.get(remote.path, tmp)
        val got = Files.size(tmp)
        if (got != remote.size)
          throw new java.io.IOException(s"size mismatch: $got != ${remote.size}")
        Files.move(tmp, dst, StandardCopyOption.REPLACE_EXISTING)
      } match {
        case Success(_) => return true
        case Failure(_) =>
          Try(Files.deleteIfExists(tmp))
          if (attempt < retries) sleeper(sleepBetweenMs)
      }
    }
    false
  }

  /** Full staging run (ref main() :90-134): clean temps, list remote CSVs,
    * anti-join against local names, download each in filename order. */
  def stage(store: RemoteStore, remoteDir: String, landing: Path): Report = {
    Files.createDirectories(landing)
    cleanupPartFiles(landing)
    val existing = Files.list(landing).iterator.asScala
      .map(_.getFileName.toString).toSet
    val remoteCsvs = store.list(remoteDir)
      .filter(f => !f.isDir && f.name.toUpperCase.endsWith(".CSV"))
      .sortBy(_.name)
    val (skip, fetch) = remoteCsvs.partition(f => existing(f.name))
    val (ok, bad) = fetch.partition(f => downloadWithVerify(store, f, landing))
    Report(ok.map(_.name), skip.map(_.name), bad.map(_.name))
  }
}
