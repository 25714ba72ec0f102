package graft.util

import org.apache.spark.sql.DataFrame

/** Guards against compute starvation on low-split inputs.
  *
  * Spark's scan parallelism is bounded by parquet row-group splits; a table
  * written as one row group yields ONE task, so every narrow (per-row)
  * transformation above it — shingling, hashing, quantization, regex — runs
  * single-threaded no matter how many cores the cluster has. Compute-dense
  * operators should widen such inputs explicitly.
  *
  * At scale this is a NO-OP: a 100 TB table has thousands of splits, so the
  * condition never triggers and no shuffle is added. It only fires when the
  * input's split count is below the cluster's default parallelism, where the
  * round-robin exchange costs (tiny bytes) ≪ the serial compute it unblocks.
  */
object ParallelScan {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
