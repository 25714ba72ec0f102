package graft

import graft.deleteview.DeleteView
import graft.read.{IncrementalReader, SnapshotReader}
import graft.write.{CowWriter, MorWriter}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Lifecycle fuzzer for the versioned-table surface: random commit scripts
  * (upserts incl. re-inserts, deletes, MOR compactions at arbitrary points)
  * execute against a real table AND an in-memory key→value model; then the
  * head snapshot, EVERY time-travel point, every adjacent incremental
  * range, and every delete view must match the model exactly. This covers
  * the op INTERACTIONS the scripted specs can't enumerate (delete-then-
  * reinsert, compact-then-delete, upsert of a previously deleted key, ...).
  */
object TableProps extends Properties("VersionedTable") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private lazy val spark = TestSpark.spark

  private sealed trait Op
  private case class Upsert(keys: Seq[Long]) extends Op
  private case class Delete(picks: Seq[Int]) extends Op // indices into live set
  private case object Compact extends Op
  private case class Rollback(back: Int) extends Op // undo newest `back` commits

  private val genOp: Gen[Op] = Gen.frequency(
    4 -> Gen.nonEmptyListOf(Gen.choose(0L, 29L)).map(ks => Upsert(ks.distinct)),
    3 -> Gen.nonEmptyListOf(Gen.choose(0, 29)).map(ps => Delete(ps.distinct)),
    1 -> Gen.const(Compact),
    1 -> Gen.choose(1, 2).map(Rollback))

  private val genScript: Gen[(Boolean, Seq[Long], List[Op])] = for {
    mor <- Gen.oneOf(true, false)
    init <- Gen.nonEmptyListOf(Gen.choose(0L, 29L)).map(_.distinct)
    ops <- Gen.listOfN(4, genOp)
  } yield (mor, init, ops)

  private val dirCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  property("random scripts: snapshot, time travel, incremental, delete view == model") =
    Prop.forAllNoShrink(genScript) { case (mor, initKeys, ops) =>
      import spark.implicits._
      val dir = s"/tmp/graft_tableprops/t${dirCounter.incrementAndGet()}"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)

      val part = (k: Column) => concat(lit("p"), pmod(k, lit(2)).cast("string"))
      def rows(kvs: Seq[(Long, Long)]) = kvs.toDF("k", "v")
        .withColumn("part", part(col("k")))
      def value(k: Long, commitIdx: Int): Long = k * 1000 + commitIdx

      // writers share the insert/upsert/delete surface
      trait W { def up(df: org.apache.spark.sql.DataFrame, ts: String): Unit
                def del(df: org.apache.spark.sql.DataFrame, ts: String): Unit
                // long-lived writer observing external maintenance: drop the
                // instance's timeline memo so the next op re-lists the FS
                def refresh(): Unit }
      val (w, compactFn): (W, Option[String => Unit]) =
        if (mor) {
          val m = new MorWriter(spark, dir, numBuckets = 2)
          m.insert(rows(initKeys.map(k => k -> value(k, 1))),
            col("k"), col("part"), ts(1))
          (new W {
            def up(df: org.apache.spark.sql.DataFrame, t: String): Unit =
              m.upsert(df, col("k"), col("part"), t)
            def del(df: org.apache.spark.sql.DataFrame, t: String): Unit =
              m.delete(df, col("k"), col("part"), t)
            def refresh(): Unit = m.timeline.refresh()
          }, Some(t => m.compact(t)))
        } else {
          val c = new CowWriter(spark, dir, numBuckets = 2)
          c.insert(rows(initKeys.map(k => k -> value(k, 1))),
            col("k"), col("part"), ts(1))
          (new W {
            def up(df: org.apache.spark.sql.DataFrame, t: String): Unit =
              c.upsert(df, col("k"), col("part"), t)
            def del(df: org.apache.spark.sql.DataFrame, t: String): Unit =
              c.delete(df, col("k"), col("part"), t)
            def refresh(): Unit = c.timeline.refresh()
          }, None)
        }

      // model: key -> (value, lastWriteTs); history per commit
      var state = initKeys.map(k => k -> (value(k, 1), ts(1))).toMap
      // (commitTs, stateAfter, deletedAtCommit: key -> preValue)
      var history = Vector((ts(1), state, Map.empty[Long, Long]))
      var idx = 1
      ops.foreach {
        case Upsert(keys) =>
          idx += 1
          w.up(rows(keys.map(k => k -> value(k, idx))), ts(idx))
          state = state ++ keys.map(k => k -> (value(k, idx), ts(idx)))
          history :+= ((ts(idx), state, Map.empty[Long, Long]))
        case Delete(picks) =>
          val live = state.keys.toSeq.sorted
          val victims =
            if (live.isEmpty) Seq.empty[Long]
            else picks.map(i => live(i % live.size)).distinct
          if (victims.nonEmpty) {
            idx += 1
            w.del(rows(victims.map(k => k -> 0L)), ts(idx))
            val removed = victims.map(k => k -> state(k)._1).toMap
            state = state -- victims
            history :+= ((ts(idx), state, removed))
          }
        case Compact =>
          compactFn.foreach { f =>
            idx += 1
            f(ts(idx))
            history :+= ((ts(idx), state, Map.empty[Long, Long]))
          }
        case Rollback(back) =>
          if (history.size > back) { // never roll back the initial commit
            val target = history(history.size - back - 1)._1
            graft.write.TableMaintenance.rollback(spark, dir, target)
            w.refresh() // writer-instance timeline memo is now stale
            history = history.dropRight(back)
            state = history.last._2
            // idx stays monotone: post-rollback commits get fresh, strictly
            // newer timestamps than anything ever written
          }
      }

      def kvSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("k").cast("long"), col("v").cast("long"))
          .as[(Long, Long)].collect().toSet
      def modelSet(m: Map[Long, (Long, String)]): Set[(Long, Long)] =
        m.map { case (k, (v, _)) => (k, v) }.toSet

      // head snapshot
      val headOk = kvSet(SnapshotReader.read(spark, dir)) == modelSet(state)
      // time travel to EVERY commit point
      val travelOk = history.forall { case (t, st, _) =>
        kvSet(SnapshotReader.read(spark, dir, Some(t))) == modelSet(st)
      }
      // every adjacent incremental range: keys alive at `to` whose current
      // version was written in (from, to]
      val incOk = history.sliding(2).forall {
        case Vector((from, _, _), (to, stTo, _)) =>
          val expect = stTo.collect {
            case (k, (v, wts)) if wts > from && wts <= to => (k, v)
          }.toSet
          kvSet(IncrementalReader.read(spark, dir, from, to)) == expect
        case _ => true
      }
      // delete view of every deleting commit reconstructs the removed rows
      val dvOk = history.forall { case (t, _, removed) =>
        removed.isEmpty ||
          kvSet(DeleteView(spark, dir, t).toDF()) == removed.toSet
      }
      // format-surface batch read (COW scripts are always base-only —
      // MOR scripts may carry outstanding deltas, which the file relation
      // rejects by contract): head + every asOf point through
      // spark.read.format("graft") must match the model too
      val formatOk = mor || {
        kvSet(spark.read.format("graft").load(dir)) == modelSet(state) &&
          history.forall { case (t, st, _) =>
            kvSet(spark.read.format("graft").option("asOf", t).load(dir)) ==
              modelSet(st)
          }
      }
      headOk && travelOk && incOk && dvOk && formatOk
    }

  private def ts(i: Int): String = f"202601$i%02d000000"
}
