package graft
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.shuffle.partitions","8").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val wh = "/tmp/graft_probe_wh"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    s.conf.set("spark.sql.catalog.gp", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.gp.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gp.ns")
    s.sql("CREATE TABLE gp.ns.t (id BIGINT, part STRING, v BIGINT) PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '4')")
    s.sql("INSERT INTO gp.ns.t SELECT id, concat('p', id % 4), id * 10 FROM range(1000)")
    val df = s.sql("SELECT * FROM gp.ns.t")
    println("[probe] rdd partitions = " + df.rdd.getNumPartitions)
    println("[probe] plan: " + df.queryExecution.executedPlan.toString.linesIterator.take(3).mkString(" | "))
    s.stop()
  }
}
