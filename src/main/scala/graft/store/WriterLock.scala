package graft.store

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, NoSuchFileException, Path, Paths}
import java.nio.file.attribute.FileTime
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}

/** Advisory writer lock for a store directory — the Spark-side analogue of
  * the reference's transactional row lock around read-modify-write upserts
  * (`select_for_update` inside `transaction.atomic`,
  * chunk_timeserie_store.py:786-813). The reference locks per chunk row
  * because Postgres serializes the combine-first merge for it; here the
  * mutators stage whole partition directories (staged write + dynamic
  * partition overwrite), so the unit of exclusion is the store: one writer
  * at a time per store path, readers never blocked (reads only ever see
  * fully-committed parquet files — the staging protocol publishes
  * partitions atomically by directory move).
  *
  * Two layers, both reentrant per thread:
  *  - in-process: a per-path monitor serializes writer threads sharing the
  *    JVM (the common Spark-driver case — concurrent foreachBatch sinks or
  *    user threads over one store);
  *  - inter-process: an exclusive lock FILE at `<store>__lock` (sibling of
  *    the store root, like the staging dirs, so partition overwrites never
  *    touch it). `Files.createFile` is atomic create-no-overwrite on POSIX
  *    and HDFS; a lease heartbeat (mtime touch every `staleMs/3`) keeps the
  *    lock live across long compaction jobs, and a lock whose mtime is
  *    older than `staleMs` is presumed orphaned (writer crashed between
  *    acquire and release) and broken via an atomic single-winner rename.
  *
  * At cluster scale the lock lives where the driver runs, against
  * driver-visible storage: POSIX or NFS-consistent mounts and HDFS give
  * atomic create/rename. Plain S3 needs conditional PUT (If-None-Match)
  * instead of create-exclusive — swap `acquireFile`/`breakIfStale` for an
  * object-store conditional-write pair if the store root is s3a://; the
  * in-process layer and the lease protocol are unchanged.
  *
  * Failure behavior: acquisition that cannot win within `waitMs` throws
  * [[WriterLock.LockTimeoutException]] naming the current holder — callers
  * decide whether to retry; nothing is ever silently skipped.
  */
object WriterLock {

  final class LockTimeoutException(msg: String) extends RuntimeException(msg)

  /** In-process holder state for one canonical store path. */
  private final class Holder {
    var thread: Thread = _
    var depth: Int = 0
    var heartbeat: ScheduledFuture[_] = _
  }

  private val holders = new ConcurrentHashMap[String, Holder]()

  private lazy val heartbeater = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-writer-lock-heartbeat")
    t.setDaemon(true)
    t
  }

  /** The lock file is a SIBLING of the store root (`<path>__lock`): the
    * mutators' dynamic partition overwrites rewrite directories inside the
    * root, and a wiped store (clear-all) must not take the lock with it.
    */
  def lockFile(storePath: String): Path = canonical(storePath).resolveSibling(
    canonical(storePath).getFileName.toString + "__lock")

  private def canonical(storePath: String): Path =
    Paths.get(storePath).toAbsolutePath.normalize

  private def defaultOwner: String =
    s"${java.net.InetAddress.getLocalHost.getHostName}:${ProcessHandle.current().pid()}"

  /** Run `f` holding the store's writer lock. Reentrant: a thread already
    * holding the lock enters immediately (public mutators compose —
    * `setManyLc` calls `setLc`, `setTs(replace)` tombstones via `delete`).
    */
  def withLock[T](
      storePath: String,
      owner: String = defaultOwner,
      waitMs: Long = 30000L,
      staleMs: Long = 60000L)(f: => T): T = {
    val key = canonical(storePath).toString
    val h = holders.computeIfAbsent(key, _ => new Holder)
    val me = Thread.currentThread()
    h.synchronized {
      val deadline = System.nanoTime() + waitMs * 1000000L
      while (h.thread != null && (h.thread ne me)) {
        val leftMs = (deadline - System.nanoTime()) / 1000000L
        if (leftMs <= 0)
          throw new LockTimeoutException(
            s"writer lock on $storePath held in-process by thread ${h.thread.getName}")
        h.wait(math.max(1L, leftMs))
      }
      if (h.thread eq me) h.depth += 1
      else {
        acquireFile(key, owner, deadline, staleMs) // throws on timeout; state untouched
        h.thread = me
        h.depth = 1
        val period = math.max(1L, staleMs / 3)
        h.heartbeat = heartbeater.scheduleAtFixedRate(
          () => touch(lockFile(key)), period, period, TimeUnit.MILLISECONDS)
      }
    }
    try f
    finally h.synchronized {
      h.depth -= 1
      if (h.depth == 0) {
        if (h.heartbeat != null) { h.heartbeat.cancel(false); h.heartbeat = null }
        try Files.deleteIfExists(lockFile(key))
        catch { case _: java.io.IOException => () } // release best-effort; lease expiry reclaims
        h.thread = null
        h.notifyAll()
      }
    }
  }

  private def acquireFile(key: String, owner: String, deadlineNanos: Long, staleMs: Long): Unit = {
    val lp = lockFile(key)
    if (lp.getParent != null) Files.createDirectories(lp.getParent)
    var backoffMs = 5L
    while (true) {
      try {
        Files.createFile(lp) // atomic create-no-overwrite: single winner
        Files.write(lp, s"""{"owner":"$owner","acquired_ms":${System.currentTimeMillis()}}"""
          .getBytes(UTF_8))
        return
      } catch {
        case _: FileAlreadyExistsException =>
          breakIfStale(lp, staleMs)
          if (System.nanoTime() > deadlineNanos) {
            val holder =
              try new String(Files.readAllBytes(lp), UTF_8)
              catch { case _: Exception => "<released concurrently>" }
            throw new LockTimeoutException(
              s"timed out acquiring writer lock $lp; current holder: $holder")
          }
          Thread.sleep(math.min(backoffMs, 200L))
          backoffMs *= 2
      }
    }
  }

  /** Break an orphaned lock (holder crashed; heartbeat stopped > staleMs
    * ago). Rename-then-delete so exactly one breaker wins: the loser's
    * move throws NoSuchFileException and it just retries the create.
    */
  private def breakIfStale(lp: Path, staleMs: Long): Unit =
    try {
      val ageMs = System.currentTimeMillis() - Files.getLastModifiedTime(lp).toMillis
      if (ageMs > staleMs) {
        val tomb = lp.resolveSibling(
          lp.getFileName.toString + ".broken-" + java.util.UUID.randomUUID().toString.take(8))
        Files.move(lp, tomb)
        Files.deleteIfExists(tomb)
      }
    } catch {
      case _: NoSuchFileException        => () // released or broken concurrently — retry create
      case _: java.nio.file.FileSystemException => ()
    }

  private def touch(lp: Path): Unit =
    try Files.setLastModifiedTime(lp, FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Exception => () } // lock released mid-beat — harmless
}
