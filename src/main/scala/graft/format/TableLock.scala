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
  * expired (crashed holder); gives up past `timeoutMs`. Release removes
  * only a lock it still owns — a broken-and-retaken lock is left alone.
  *
  * Atomicity rides the store's create-no-overwrite, exactly like the
  * timeline's own `<ts>.reserved` markers (HDFS create, S3 conditional
  * put; plain local filesystems approximate it — single-driver local
  * deployments are already covered by the JVM lock this composes with).
  *
  * BREAKING is arbitrated, not a bare delete: a bare `delete(lockPath)`
  * lets two waiters that both observed the same expired lease each
  * delete — the second delete removing the FIRST breaker's freshly
  * created lock, so two drivers hold the lock at once. Instead a breaker
  * CAPTURES the incarnation it observed by atomically renaming the lock
  * file to a waiter-unique name: rename succeeds for exactly one caller
  * (delete-if-match over the rename primitive), the loser re-loops. The
  * winner verifies the captured body is the expired incarnation it
  * observed and only then deletes it; a live lock that slipped into the
  * read→rename window is renamed back untouched. Release uses the same
  * capture-verify protocol (its window is lease-scale: a critical
  * section that overran `ttlMs`). Residual window: a full break+retake
  * by another waiter inside the µs between the breaker's verify re-read
  * and its rename — entered only after lease expiry plus a randomized
  * backoff; on stores with conditional delete, swap the rename for
  * delete-if-etag. The critical sections guarded are metadata-only
  * (decode + rename), far shorter than the lease. Hudi's
  * FileSystemBasedLockProvider analog.
  */
final class FsLock(fs: FileSystem, lockPath: Path, ttlMs: Long,
    timeoutMs: Long) extends TableLock {

  override def withLock[T](f: => T): T = {
    val token = acquire()
    try f finally release(token)
  }

  private def body(p: Path): Option[(String, Long)] =
    try {
      val in = fs.open(p)
      val s = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
      s.split(' ') match {
        case Array(tok, exp) => exp.toLongOption.map(tok -> _)
        case _ => None
      }
    } catch { case _: java.io.IOException => None } // vanished or unreadable

  /** Atomically capture the current lock file under a caller-unique name
    * and remove it ONLY if its body satisfies `owned`; otherwise restore
    * it. Rename is the arbiter: for a given lock-file incarnation exactly
    * one caller's rename succeeds. Returns true iff this caller removed
    * the incarnation it was entitled to remove. */
  private def captureAndRemove(unique: Path,
      owned: ((String, Long)) => Boolean): Boolean = {
    val renamed =
      try fs.rename(lockPath, unique)
      catch { case _: java.io.IOException => false }
    if (!renamed) false
    else if (body(unique).exists(owned)) { fs.delete(unique, false); true }
    else {
      // captured somebody else's live lock (it replaced the one we
      // observed inside the read→rename window): put it back untouched
      if (!fs.rename(unique, lockPath)) {
        // a third waiter created a new lock meanwhile — surface loudly
        // rather than leave two lock files on disk
        fs.delete(unique, false)
        throw new IllegalStateException(
          s"lock-break restore collision on $lockPath: a live lock was " +
            "captured and could not be restored; manual inspection needed")
      }
      false
    }
  }

  private def acquire(): String = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + timeoutMs
    val rnd = new java.util.Random()
    while (true) {
      val now = System.currentTimeMillis()
      // deadline applies to EVERY retry path — a persistently failing
      // break (rename-poor store) or an unreadable lock file must hit the
      // timeout too, not loop forever
      if (now > deadline) throw new IllegalStateException(
        s"timed out after ${timeoutMs}ms waiting for table lock " +
          s"$lockPath (live lease, unbreakable expired lease, or " +
          s"unreadable lock file; raise ${TableLock.TimeoutKey} or " +
          "investigate the holder)")
      try {
        fs.mkdirs(lockPath.getParent)
        val out = fs.create(lockPath, false) // create-no-overwrite
        try out.write(s"$token ${now + ttlMs}"
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        return token
      } catch {
        case _: java.io.IOException =>
          body(lockPath) match {
            case Some((tok, exp)) if now > exp =>
              // expired lease (crashed holder): randomized backoff so
              // concurrent breakers de-synchronize, re-verify the SAME
              // incarnation is still there, then capture-and-break it
              Thread.sleep(rnd.nextInt(100).toLong)
              if (body(lockPath).contains(tok -> exp))
                captureAndRemove(
                  new Path(lockPath.getParent, s".lock.broken.$token"),
                  b => b == (tok -> exp))
            case None => Thread.sleep(20) // released or unreadable: re-probe
            case _ => Thread.sleep(50) // live lease: wait it out
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def release(token: String): Unit =
    // remove only while still owned — if the lease expired and another
    // writer broke + retook the lock, their file must survive (the
    // capture-verify restores it if the pre-check read raced a break)
    if (body(lockPath).exists(_._1 == token))
      captureAndRemove(
        new Path(lockPath.getParent, s".lock.released.$token"),
        _._1 == token)
}
