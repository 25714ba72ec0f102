package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Inter-PROCESS lock for the commit critical section — the pluggable
  * piece that makes [[Timeline.saveCommitOcc]]'s conflict check sound
  * across multiple DRIVERS (Hudi's LockProvider contract). Conflict
  * DETECTION is storage-based and driver-agnostic; only the
  * check-then-publish window needs mutual exclusion, and the JVM-wide
  * per-table lock covers a single driver only. */
trait TableLock {
  def withLock[T](f: => T): T
}

object TableLock {

  /** Single-driver deployments: the JVM per-table lock (always taken by
    * Timeline around the critical section) is sufficient on its own. */
  object JvmOnly extends TableLock {
    override def withLock[T](f: => T): T = f
  }

  /** Hadoop-conf keys: `graft.lock.provider` = `jvm` (default) | `fs`;
    * `graft.lock.ttlMs` (lease length before a crashed holder's lock is
    * breakable, default 60 s); `graft.lock.timeoutMs` (max wait to
    * acquire, default 60 s). Set them via
    * `spark.hadoop.graft.lock.provider=fs` etc. */
  val ProviderKey = "graft.lock.provider"
  val TtlKey = "graft.lock.ttlMs"
  val TimeoutKey = "graft.lock.timeoutMs"

  def fromConf(conf: Configuration, fs: FileSystem,
      basePath: Path): TableLock =
    conf.get(ProviderKey, "jvm") match {
      case "jvm" => JvmOnly
      case "fs" => new FsLock(fs,
        new Path(new Path(basePath, Timeline.MetaDir), ".lock"),
        ttlMs = conf.getLong(TtlKey, 60000L),
        timeoutMs = conf.getLong(TimeoutKey, 60000L))
      case other => throw new IllegalArgumentException(
        s"unknown $ProviderKey '$other' (jvm | fs)")
    }
}

/** Filesystem lock file with a LEASE: `.hoodie/.lock` created
  * without-overwrite, body `<ownerToken> <expiryEpochMs>`. Acquire spins
  * (50 ms backoff) until it creates the file, breaking a lock whose lease
  * expired (crashed holder); gives up past `timeoutMs`. Release deletes
  * only a lock it still owns — a broken-and-retaken lock is left alone.
  *
  * Atomicity rides the store's create-no-overwrite, exactly like the
  * timeline's own `<ts>.reserved` markers (HDFS create, S3 conditional
  * put; plain local filesystems approximate it — single-driver local
  * deployments are already covered by the JVM lock this composes with).
  * The critical sections it guards are metadata-only (decode + rename),
  * far shorter than the lease. Hudi's FileSystemBasedLockProvider analog.
  */
final class FsLock(fs: FileSystem, lockPath: Path, ttlMs: Long,
    timeoutMs: Long) extends TableLock {

  override def withLock[T](f: => T): T = {
    val token = acquire()
    try f finally release(token)
  }

  private def body(): Option[(String, Long)] =
    try {
      val in = fs.open(lockPath)
      val s = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
      s.split(' ') match {
        case Array(tok, exp) => exp.toLongOption.map(tok -> _)
        case _ => None
      }
    } catch { case _: java.io.IOException => None } // vanished or unreadable

  private def acquire(): String = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + timeoutMs
    while (true) {
      val now = System.currentTimeMillis()
      try {
        fs.mkdirs(lockPath.getParent)
        val out = fs.create(lockPath, false) // create-no-overwrite
        try out.write(s"$token ${now + ttlMs}"
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        return token
      } catch {
        case _: java.io.IOException =>
          body() match {
            case Some((_, exp)) if now > exp =>
              // expired lease (crashed holder): break it and re-race
              fs.delete(lockPath, false)
            case None => () // holder released between probe and read
            case _ =>
              if (now > deadline) throw new IllegalStateException(
                s"timed out after ${timeoutMs}ms waiting for table lock " +
                  s"$lockPath (held with a live lease; raise " +
                  s"${TableLock.TimeoutKey} or investigate the holder)")
              Thread.sleep(50)
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def release(token: String): Unit =
    // delete only while still owned — if the lease expired and another
    // writer broke + retook the lock, their file must survive
    if (body().exists(_._1 == token)) fs.delete(lockPath, false)
}
