package graft

import graft.format.{CommitMetadata, FsLock, TableLock, Timeline}
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** The inter-process table lock: mutual exclusion, stale-lease takeover,
  * timeout, conf wiring, and an end-to-end commit under the fs provider. */
class LockSpec extends SparkSpec {

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("FsLock: two instances mutually exclude; lock file gone on release") {
    val dir = freshDir("lock_mutex")
    val f = fs(dir)
    val p = new Path(dir, ".hoodie/.lock")
    val a = new FsLock(f, p, ttlMs = 60000, timeoutMs = 60000)
    val b = new FsLock(f, p, ttlMs = 60000, timeoutMs = 60000)
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t1 = new Thread(() => a.withLock {
      events.add("a-in"); Thread.sleep(300); events.add("a-out")
    })
    t1.start(); Thread.sleep(100) // a holds the lock
    val t2 = new Thread(() => b.withLock { events.add("b-in") })
    t2.start(); t1.join(10000); t2.join(10000)
    assert(events.toArray.toSeq == Seq("a-in", "a-out", "b-in"),
      s"b entered while a held the lock: ${events.toArray.toSeq}")
    assert(!f.exists(p), "released lock file must be deleted")
  }

  test("FsLock: an expired lease is broken; a live one times the waiter out") {
    val dir = freshDir("lock_stale")
    val f = fs(dir)
    val p = new Path(dir, ".hoodie/.lock")
    def plant(expiresInMs: Long): Unit = {
      f.mkdirs(p.getParent)
      val out = f.create(p, true)
      try out.write(s"dead-owner ${System.currentTimeMillis() + expiresInMs}"
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    // crashed holder: lease already expired -> next acquire breaks it
    plant(expiresInMs = -1000)
    var ran = false
    new FsLock(f, p, 60000, 5000).withLock { ran = true }
    assert(ran && !f.exists(p))
    // live lease -> a short-timeout waiter gives up loudly
    plant(expiresInMs = 60000)
    val e = intercept[IllegalStateException] {
      new FsLock(f, p, 60000, 300).withLock { () }
    }
    assert(e.getMessage.contains("timed out"))
    f.delete(p, false)
  }

  /** Local fs with HDFS-like ATOMIC create-no-overwrite — the store
    * contract FsLock rides on (HDFS create, S3 conditional put). The raw
    * local fs approximates it with a racy check-then-create, which is the
    * already-documented local-deployment caveat, not what this test is
    * probing. Rename is atomic on the local fs as-is. */
  private class AtomicCreateFs(u: org.apache.hadoop.fs.FileSystem)
      extends org.apache.hadoop.fs.FilterFileSystem(u) {
    private val gate = new Object
    override def create(f: Path,
        permission: org.apache.hadoop.fs.permission.FsPermission,
        overwrite: Boolean, bufferSize: Int, replication: Short,
        blockSize: Long, progress: org.apache.hadoop.util.Progressable)
        : org.apache.hadoop.fs.FSDataOutputStream =
      if (overwrite)
        super.create(f, permission, overwrite, bufferSize, replication,
          blockSize, progress)
      else gate.synchronized {
        if (fs.exists(f))
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            f.toString)
        super.create(f, permission, false, bufferSize, replication,
          blockSize, progress)
      }
  }

  test("FsLock: concurrent breakers of one expired lease still mutually " +
    "exclude (rename-arbitrated break, no double-delete)") {
    val dir = freshDir("lock_break_race")
    val f: org.apache.hadoop.fs.FileSystem = new AtomicCreateFs(fs(dir))
    val p = new Path(dir, ".hoodie/.lock")
    // crashed holder with an expired lease
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(s"dead-owner ${System.currentTimeMillis() - 5000}"
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // many waiters race to break it; the critical section asserts it is
    // never concurrently entered
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val l = new FsLock(f, p, ttlMs = 60000, timeoutMs = 30000)
        l.withLock {
          val n = inside.incrementAndGet()
          maxInside.updateAndGet(m => math.max(m, n))
          Thread.sleep(20)
          inside.decrementAndGet()
        }
        done.incrementAndGet()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(done.get() == 8, s"only ${done.get()}/8 waiters acquired")
    assert(maxInside.get() == 1,
      s"mutual exclusion violated: ${maxInside.get()} holders at once")
    assert(!f.exists(p), "lock file must be gone after the last release")
    // no capture temp files leaked
    val leftovers = f.listStatus(p.getParent)
      .map(_.getPath.getName).filter(_.startsWith(".lock"))
    assert(leftovers.isEmpty, s"leaked lock artifacts: ${leftovers.toSeq}")
  }

  test("conf wiring: provider=fs guards a real commit; unknown provider " +
    "refuses; default stays jvm-only") {
    val dir = freshDir("lock_conf")
    val conf = spark.sessionState.newHadoopConf()
    conf.set(TableLock.ProviderKey, "fs")
    val tl = Timeline(conf, dir)
    tl.saveCommitOcc("20260101000000", CommitMetadata(
      Map.empty, "INSERT", 0L, 0L))
    tl.refresh()
    assert(tl.completedInstants().map(_.ts) == Seq("20260101000000"))
    assert(!fs(dir).exists(new Path(dir, ".hoodie/.lock")),
      "lock must be released after the commit")
    val bad = spark.sessionState.newHadoopConf()
    bad.set(TableLock.ProviderKey, "zookeeper")
    assert(intercept[IllegalArgumentException] {
      Timeline(bad, dir)
    }.getMessage.contains("zookeeper"))
    // default conf: JvmOnly (no lock file ever appears)
    val plain = Timeline(spark.sessionState.newHadoopConf(), dir)
    plain.saveCommitOcc("20260102000000", CommitMetadata(
      Map.empty, "INSERT", 0L, 0L),
      readPoint = Some("20260101000000"))
    assert(!fs(dir).exists(new Path(dir, ".hoodie/.lock")))
  }
}
