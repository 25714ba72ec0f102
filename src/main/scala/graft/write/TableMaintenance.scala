package graft.write

import graft.format.Timeline
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-management operations a long-lived versioned lake table needs:
  * rollback (undo commits) and clean (reclaim unreferenced storage).
  *
  * Both are DRIVER-side metadata walks plus file deletions — O(#commits +
  * #touched file groups), never a data scan. At 100 TB, a table without a
  * cleaner grows without bound (every COW rewrite keeps its predecessor
  * slice forever); a cleaner bounded by time-travel retention is what makes
  * the versioning cost model sustainable — exactly Hudi's cleaner contract.
  */
object TableMaintenance {

  /** Roll the table back to `toTs` (inclusive): every later commit is
    * removed from the timeline, the files it wrote are deleted, and its
    * delete-view cache (if materialized) is dropped. Returns the rolled-back
    * commit timestamps, newest first.
    *
    * Interaction with [[clean]]: cleaning deletes slices OLDER than the
    * retention window, so only roll back to commits still inside the most
    * recent clean's window — rolling back past it leaves file groups whose
    * pre-rollback slices were already reclaimed (same contract as Hudi's
    * restore-vs-cleaner rule). */
  def rollback(spark: SparkSession, basePath: String,
      toTs: String): Seq[String] = {
    val tl = Timeline(spark.sessionState.newHadoopConf(), basePath)
    val fs = tl.fs
    val doomed = tl.completedInstants().filter(_.ts > toTs).reverse
    doomed.foreach { i =>
      tl.metadata(i.ts).allStats.foreach { case (_, s) =>
        s.path.foreach(rel => fs.delete(new Path(s"$basePath/$rel"), false))
      }
      fs.delete(new Path(s"$basePath/.delete/${i.ts}"), true)
      tl.deleteCommit(i.ts)
    }
    doomed.map(_.ts)
  }

  /** Clean: physically delete data files that no snapshot within the
    * retention window can reach — i.e. files not referenced by the latest
    * slices as of any of the newest `retainCommits` commits. Time travel
    * OLDER than the window stops working for rewritten groups (the Hudi
    * cleaner trade); everything the window can serve is untouched. Returns
    * the deleted table-relative paths. */
  def clean(spark: SparkSession, basePath: String,
      retainCommits: Int): Seq[String] = {
    require(retainCommits >= 1, "must retain at least the latest commit")
    val tl = Timeline(spark.sessionState.newHadoopConf(), basePath)
    val fs = tl.fs
    val instants = tl.completedInstants()
    if (instants.size <= retainCommits) return Seq.empty
    val retained = instants.takeRight(retainCommits)
    val referenced: Set[String] = retained.flatMap { i =>
      tl.latestSlices(Some(i.ts)).values.flatMap(sl =>
        sl.relPath.toSeq ++ sl.deltas.map(_.relPath))
    }.toSet
    val all: Seq[String] = instants
      .flatMap(i => tl.metadata(i.ts).allStats.flatMap(_._2.path))
    val doomed = all.distinct.filterNot(referenced).sorted
    doomed.foreach(rel => fs.delete(new Path(s"$basePath/$rel"), false))
    doomed
  }
}
