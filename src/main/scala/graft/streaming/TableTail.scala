package graft.streaming

import graft.format.Timeline
import graft.read.IncrementalReader
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Micro-batch tail over a versioned table: polls the timeline for commits
  * completed after a cursor and yields each new commit's incremental rows —
  * the "poll completed instants, read each new range" bridge promised by
  * [[graft.read.IncrementalReader]].
  *
  * Spark's built-in file streaming source cannot tail a COW table (a commit
  * REWRITES file slices, so carried-over rows would re-appear as new input);
  * the commit timeline is the only correct change log. This helper drives
  * foreachBatch-style processing from that log: one DataFrame per commit,
  * exactly once per cursor advance, resumable from any commit ts — the same
  * shape as a Structured Streaming `foreachBatch` sink, with the commit ts
  * as the epoch id.
  *
  * Scale: polling is a driver-side timeline listing (O(#instants) metadata);
  * each batch is a planned incremental read (commit-time filter pushed to
  * parquet row-group stats) — no state beyond the cursor string.
  */
object TableTail {

  /** Completed commits with ts strictly greater than `afterTs`, oldest
    * first (all commits when `afterTs` is None). */
  def newCommits(spark: SparkSession, basePath: String,
      afterTs: Option[String]): Seq[String] =
    Timeline(spark.sessionState.newHadoopConf(), basePath)
      .completedInstants().map(_.ts)
      .filter(ts => afterTs.forall(ts > _))

  /** Process every unseen commit once, oldest first; returns the advanced
    * cursor (unchanged if nothing new). `f` receives (commitTs, rows
    * written by that commit — current state, deletes excluded as in Hudi
    * incremental semantics; pair with DeleteView for the removed rows). */
  def drainOnce(spark: SparkSession, basePath: String,
      cursor: Option[String])(f: (String, DataFrame) => Unit): Option[String] = {
    val pending = newCommits(spark, basePath, cursor)
    var cur = cursor
    pending.foreach { ts =>
      f(ts, IncrementalReader.read(spark, basePath, cur.getOrElse("0"), ts))
      cur = Some(ts)
    }
    cur
  }
}
