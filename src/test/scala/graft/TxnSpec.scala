package graft

import graft.format.{CommitConflictException, Timeline}
import graft.write.{CowWriter, MultiTableTxn}
import org.apache.spark.sql.functions._

/** Multi-table transactional commit ([[graft.write.MultiTableTxn]]):
  * all-or-nothing across tables, OCC-failure atomicity, lock composition. */
class TxnSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(dir: String, rows: Seq[(Long, String, Long)],
      tpe: String = "cow"): Unit =
    rows.toDF("id", "part", "v").write.format("graft")
      .option("key", "id").option("partition", "part")
      .option("buckets", "2").option("type", tpe)
      .option("ts", "1000").save(dir)

  private def snap(dir: String): Map[Long, Long] =
    read.SnapshotReader.read(spark, dir).select("id", "v")
      .as[(Long, Long)].collect().toMap

  test("two-table txn: both commits land, reader sees both effects") {
    val a = freshDir("txn_a"); val b = freshDir("txn_b")
    mkTable(a, Seq((1L, "x", 10L), (2L, "y", 20L)))
    mkTable(b, Seq((1L, "x", 100L)), tpe = "mor")
    val ts = MultiTableTxn.commit(spark, Seq(
      MultiTableTxn.TableWrite(a,
        updates = Some(Seq((2L, "y", 21L)).toDF("id", "part", "v")),
        deletes = Some(Seq((1L, "x", 0L)).toDF("id", "part", "v"))),
      MultiTableTxn.TableWrite(b,
        updates = Some(Seq((2L, "z", 200L)).toDF("id", "part", "v")))))
    assert(ts.size == 2)
    assert(snap(a) == Map(2L -> 21L))
    assert(snap(b) == Map(1L -> 100L, 2L -> 200L))
    // ordinary commits: delete view / incremental / history all work
    assert(deleteview.DeleteView(spark, a, ts.head).toDF().count() == 1)
    assert(sources.GraftTable(spark, b).commits.last == ts(1))
  }

  test("conflict on ONE table rolls back the WHOLE txn: reader sees neither") {
    val a = freshDir("txn_c"); val b = freshDir("txn_d")
    mkTable(a, Seq((1L, "x", 10L)))
    mkTable(b, Seq((1L, "x", 100L)))
    val beforeA = snap(a); val beforeB = snap(b)
    val commitsA = sources.GraftTable(spark, a).commits
    val commitsB = sources.GraftTable(spark, b).commits
    // fault injection: AFTER the txn staged both writes (read points
    // pinned), land a conflicting commit on b's file group — the txn's
    // validate phase must fail the whole transaction
    val e = intercept[CommitConflictException] {
      MultiTableTxn.commitHook(spark, Seq(
        MultiTableTxn.TableWrite(a,
          updates = Some(Seq((1L, "x", 11L)).toDF("id", "part", "v"))),
        MultiTableTxn.TableWrite(b,
          updates = Some(Seq((1L, "x", 101L)).toDF("id", "part", "v")))),
        beforePublish = () =>
          new CowWriter(spark, b, 2).upsert(
            Seq((1L, "x", 999L)).toDF("id", "part", "v"),
            col("id"), col("part"), "2000"))
    }
    assert(e.getMessage.contains("conflicts"))
    // ALL-OR-NOTHING: table a shows NO txn effect (its own validate
    // passed, but b's conflict vetoed the publish of both)
    assert(snap(a) == beforeA)
    assert(sources.GraftTable(spark, a).commits == commitsA)
    // b shows only the interloper's commit
    assert(snap(b) == Map(1L -> 999L))
    assert(sources.GraftTable(spark, b).commits == commitsB :+ "2000")
    // no reservation markers leaked on either timeline
    Seq(a, b).foreach { d =>
      val tl = Timeline(spark.sessionState.newHadoopConf(), d)
      assert(tl.reservedTss().isEmpty, s"leaked reservation at $d")
    }
    // the failed txn's staged data files are unreferenced debris —
    // sweepOrphans reclaims them and the tables stay fully readable
    graft.write.TableMaintenance.sweepOrphans(spark, a, olderThanMs = 0L)
    assert(snap(a) == beforeA)
    // a RETRY of the same transaction (fresh plan) succeeds
    MultiTableTxn.commit(spark, Seq(
      MultiTableTxn.TableWrite(a,
        updates = Some(Seq((1L, "x", 11L)).toDF("id", "part", "v"))),
      MultiTableTxn.TableWrite(b,
        updates = Some(Seq((1L, "x", 101L)).toDF("id", "part", "v")))))
    assert(snap(a) == Map(1L -> 11L) && snap(b) == Map(1L -> 101L))
  }

  test("a no-effect MOR member fails the WHOLE txn loudly before any publish") {
    val a = freshDir("txn_i"); val b = freshDir("txn_j")
    mkTable(a, Seq((1L, "x", 10L)))
    mkTable(b, Seq((1L, "x", 100L)), tpe = "mor")
    val beforeA = snap(a)
    // b's frames filter to zero rows: the MOR delta write no-ops without
    // publishing — the txn must refuse BEFORE a's commit publishes
    val e = intercept[IllegalArgumentException] {
      MultiTableTxn.commit(spark, Seq(
        MultiTableTxn.TableWrite(a,
          updates = Some(Seq((1L, "x", 11L)).toDF("id", "part", "v"))),
        MultiTableTxn.TableWrite(b,
          updates = Some(Seq((2L, "y", 2L)).toDF("id", "part", "v")
            .filter(col("v") > 1000)))))
    }
    assert(e.getMessage.contains("no effects"), e.getMessage)
    assert(snap(a) == beforeA, "partial txn effect leaked")
    Seq(a, b).foreach { d =>
      val tl = Timeline(spark.sessionState.newHadoopConf(), d)
      assert(tl.reservedTss().isEmpty, s"leaked reservation at $d")
    }
  }

  test("journal recovery: crash mid-publish rolls FORWARD, crash pre-publish rolls BACK") {
    import graft.write.MultiTableTxn
    val a = freshDir("txn_g"); val b = freshDir("txn_h")
    mkTable(a, Seq((1L, "x", 10L)))
    mkTable(b, Seq((1L, "x", 100L)))
    val hconf = spark.sessionState.newHadoopConf()
    def tl(d: String) = Timeline(hconf, d)

    // --- simulate a crash AFTER table a promoted, before b did ---------
    // stage both commit bodies + journal on both, promote only a
    val (tsA, tsB) = ("3000", "3001")
    val metaFor = (d: String, ts: String, v: Long) => {
      // build a real staged commit by running the writer with a capturing
      // publisher, then hand-stage it
      var captured: Option[(String, graft.format.CommitMetadata, String,
        Option[String], Boolean)] = None
      new CowWriter(spark, d, 2, publish = Some(
        (cts, m, act, rp, coa) => captured = Some((cts, m, act, rp, coa))))
        .commit(Some(Seq((1L, "x", v)).toDF("id", "part", "v")), None,
          col("id"), col("part"), ts)
      captured.get
    }
    val ca = metaFor(a, tsA, 11L); val cb = metaFor(b, tsB, 101L)
    tl(a).stageCommitLocked(ca._1, ca._2, ca._3)
    tl(b).stageCommitLocked(cb._1, cb._2, cb._3)
    val members = Seq(MultiTableTxn.Member(a, tsA, ca._3),
      MultiTableTxn.Member(b, tsB, cb._3))
    MultiTableTxn.writeManifest(hconf, tl(a), "crash1", members)
    MultiTableTxn.writeManifest(hconf, tl(b), "crash1", members)
    tl(a).promoteStagedLocked(tsA, ca._3) // "crash" here: b never promoted
    // recovery from EITHER table completes the transaction
    val actions = MultiTableTxn.recover(spark, b)
    assert(actions == Seq("forward:crash1"), s"got $actions")
    assert(snap(a) == Map(1L -> 11L) && snap(b) == Map(1L -> 101L))
    assert(sources.GraftTable(spark, b).commits.contains(tsB))
    assert(MultiTableTxn.recover(spark, a).isEmpty, "journal not cleared")

    // --- simulate a crash BEFORE any promote: roll back ----------------
    val (tsA2, tsB2) = ("4000", "4001")
    val ca2 = metaFor(a, tsA2, 12L); val cb2 = metaFor(b, tsB2, 102L)
    tl(a).stageCommitLocked(ca2._1, ca2._2, ca2._3)
    tl(b).stageCommitLocked(cb2._1, cb2._2, cb2._3)
    val members2 = Seq(MultiTableTxn.Member(a, tsA2, ca2._3),
      MultiTableTxn.Member(b, tsB2, cb2._3))
    MultiTableTxn.writeManifest(hconf, tl(a), "crash2", members2)
    MultiTableTxn.writeManifest(hconf, tl(b), "crash2", members2)
    // "crash" before any rename → recovery must discard both stagings
    val actions2 = MultiTableTxn.recover(spark, a)
    assert(actions2 == Seq("back:crash2"), s"got $actions2")
    assert(snap(a) == Map(1L -> 11L) && snap(b) == Map(1L -> 101L))
    assert(!sources.GraftTable(spark, a).commits.contains(tsA2))
    assert(tl(a).reservedTss().isEmpty && tl(b).reservedTss().isEmpty)
    // tables remain fully writable afterwards
    MultiTableTxn.commit(spark, Seq(
      MultiTableTxn.TableWrite(a,
        updates = Some(Seq((1L, "x", 13L)).toDF("id", "part", "v"))),
      MultiTableTxn.TableWrite(b,
        updates = Some(Seq((1L, "x", 103L)).toDF("id", "part", "v")))))
    assert(snap(a) == Map(1L -> 13L) && snap(b) == Map(1L -> 103L))
  }

  test("concurrent txns on overlapping tables: exactly one winner per race") {
    val a = freshDir("txn_e"); val b = freshDir("txn_f")
    mkTable(a, Seq((1L, "x", 0L)))
    mkTable(b, Seq((1L, "x", 0L)))
    // two threads each running a txn over (a, b) touching the same key:
    // the locks serialize them; both succeed sequentially (second plans
    // after the first committed? No — both staged against the ORIGINAL
    // read point, so the loser must CONFLICT, not silently stomp)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val results = (1 to 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Seq[String]]] {
        override def call() =
          try Right(MultiTableTxn.commit(spark, Seq(
            MultiTableTxn.TableWrite(a,
              updates = Some(Seq((1L, "x", i.toLong)).toDF("id", "part", "v"))),
            MultiTableTxn.TableWrite(b,
              updates = Some(Seq((1L, "x", i.toLong)).toDF("id", "part", "v"))))))
          catch { case t: Throwable => Left(t) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val outcomes = results.map(_.get())
    val wins = outcomes.count(_.isRight)
    // both may win (serialized, disjoint read windows by luck of timing)
    // only if the loser re-staged after the winner — commit() does NOT
    // retry, so: exactly one winner, or two winners is impossible on the
    // same file group with pinned read points unless fully serialized
    // before staging. Accept 1 winner + 1 CommitConflictException, or 2
    // winners when the first txn completed before the second STAGED.
    assert(wins >= 1, s"no txn won: $outcomes")
    outcomes.filter(_.isLeft).foreach { l =>
      assert(l.swap.toOption.get.isInstanceOf[CommitConflictException],
        s"loser failed with the wrong error: $l")
    }
    // final state consistent: SAME value in both tables (no torn txn)
    assert(snap(a) == snap(b))
  }

  test("snapshotAll: a reader never observes one table post-txn and another pre-txn") {
    val a = freshDir("txn_s1"); val b = freshDir("txn_s2")
    mkTable(a, Seq((1L, "x", 10L)))
    mkTable(b, Seq((1L, "x", 100L)))
    def vOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select("v").as[Long].collect().head

    // clean state: both snapshots are the current state, pinned
    val s0 = MultiTableTxn.snapshotAll(spark, Seq(a, b))
    assert(vOf(s0(a)) == 10L && vOf(s0(b)) == 100L)

    // a completed txn: both effects visible
    MultiTableTxn.commit(spark, Seq(
      MultiTableTxn.TableWrite(a,
        updates = Some(Seq((1L, "x", 11L)).toDF("id", "part", "v"))),
      MultiTableTxn.TableWrite(b,
        updates = Some(Seq((1L, "x", 101L)).toDF("id", "part", "v")))))
    val s1 = MultiTableTxn.snapshotAll(spark, Seq(a, b))
    assert(vOf(s1(a)) == 11L && vOf(s1(b)) == 101L)

    // crash MID-PUBLISH (a promoted, b not): the naive per-table reads
    // WOULD see a=12/b=101 — snapshotAll must refuse that mix and serve
    // the consistent PRE-txn view of BOTH tables
    val hconf = spark.sessionState.newHadoopConf()
    def tl(d: String) = Timeline(hconf, d)
    val (tsA, tsB) = ("5000", "5001")
    val metaFor = (d: String, ts: String, v: Long) => {
      var captured: Option[(String, graft.format.CommitMetadata, String,
        Option[String], Boolean)] = None
      new CowWriter(spark, d, 2, publish = Some(
        (cts, m, act, rp, coa) => captured = Some((cts, m, act, rp, coa))))
        .commit(Some(Seq((1L, "x", v)).toDF("id", "part", "v")), None,
          col("id"), col("part"), ts)
      captured.get
    }
    val ca = metaFor(a, tsA, 12L); val cb = metaFor(b, tsB, 102L)
    tl(a).stageCommitLocked(ca._1, ca._2, ca._3)
    tl(b).stageCommitLocked(cb._1, cb._2, cb._3)
    val members = Seq(MultiTableTxn.Member(a, tsA, ca._3),
      MultiTableTxn.Member(b, tsB, cb._3))
    MultiTableTxn.writeManifest(hconf, tl(a), "mix1", members)
    MultiTableTxn.writeManifest(hconf, tl(b), "mix1", members)
    tl(a).promoteStagedLocked(tsA, ca._3) // "crash": b never promoted
    // sanity: the naive reads DO expose the inconsistency snapshotAll fixes
    assert(snap(a) == Map(1L -> 12L) && snap(b) == Map(1L -> 101L))
    val s2 = MultiTableTxn.snapshotAll(spark, Seq(a, b), waitMs = 300)
    assert(vOf(s2(a)) == 11L && vOf(s2(b)) == 101L,
      s"expected the consistent pre-txn view, got a=${vOf(s2(a))} " +
        s"b=${vOf(s2(b))}")

    // after recovery rolls the txn forward, both effects appear together
    assert(MultiTableTxn.recover(spark, a) == Seq("forward:mix1"))
    val s3 = MultiTableTxn.snapshotAll(spark, Seq(a, b))
    assert(vOf(s3(a)) == 12L && vOf(s3(b)) == 102L)

    // racing reader: while txns bump both tables in lockstep, every
    // snapshotAll observes a == b (the cross-table invariant)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    @volatile var writerDone = false
    val writer = pool.submit(new java.util.concurrent.Callable[Unit] {
      override def call(): Unit = try {
        (13L to 15L).foreach { v =>
          MultiTableTxn.commit(spark, Seq(
            MultiTableTxn.TableWrite(a,
              updates = Some(Seq((1L, "x", v)).toDF("id", "part", "v"))),
            MultiTableTxn.TableWrite(b,
              updates = Some(Seq((1L, "x", v + 90L)).toDF("id", "part", "v")))))
        }
      } finally writerDone = true
    })
    try {
      while (!writerDone) {
        val sr = MultiTableTxn.snapshotAll(spark, Seq(a, b))
        val (va, vb) = (vOf(sr(a)), vOf(sr(b)))
        assert(vb - va == 90L,
          s"inconsistent cross-table read: a=$va b=$vb")
      }
      writer.get()
    } finally pool.shutdownNow()
    val sF = MultiTableTxn.snapshotAll(spark, Seq(a, b))
    assert(vOf(sF(a)) == 15L && vOf(sF(b)) == 105L)
  }
}
