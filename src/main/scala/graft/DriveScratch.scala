package graft
import org.apache.spark.sql.SparkSession
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val wh = "/tmp/graft_proc_wh"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.g", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.g.warehouse", wh)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE NAMESPACE g.ns")
    spark.sql("CREATE TABLE g.ns.t (id BIGINT, part STRING, v BIGINT) " +
      "PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')")
    spark.sql("INSERT INTO g.ns.t VALUES (1,'a',10),(2,'a',20),(3,'b',30)")
    spark.sql("INSERT INTO g.ns.t VALUES (4,'b',40)")
    spark.sql("DELETE FROM g.ns.t WHERE id = 2")
    println("== show_timeline")
    spark.sql("CALL g.system.show_timeline(table => 'ns.t')").show(false)
    println("== savepoint (default latest)")
    spark.sql("CALL g.system.savepoint(table => 'ns.t')").show(false)
    println("== delete_view")
    spark.sql("CALL g.system.delete_view(table => 'ns.t')").show(false)
    println("== cluster_zorder")
    spark.sql("CALL g.system.cluster_zorder(table => 'ns.t', cols => 'id,v')").show(false)
    println("== compact (cow -> no-op)")
    spark.sql("CALL g.system.compact(table => 'ns.t')").show(false)
    println("== clean")
    spark.sql("CALL g.system.clean(table => 'ns.t', retain_commits => 1)").show(false)
    println("== sweep_orphans default age")
    spark.sql("CALL g.system.sweep_orphans(table => 'ns.t')").show(false)
    println("== SHOW PROCEDURES")
    spark.sql("SHOW PROCEDURES IN g").show(30, false)
    println("== DESCRIBE PROCEDURE")
    spark.sql("DESCRIBE PROCEDURE g.system.clean").show(false)
    println("== rows after all: " + spark.sql("SELECT * FROM g.ns.t").count())
    spark.stop()
  }
}
