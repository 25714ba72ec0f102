package graft

import graft.deleteview.DeleteView
import graft.functions.ArrayNumeric
import graft.write.CowWriter
import org.apache.spark.sql.functions._

/** SQL-text surface: registered native functions + temp-view registration,
  * and a randomized end-to-end delete-view property check. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("long_array_dot callable from SQL after registry registration") {
    ArrayNumeric.register(spark)
    val d = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .as[Long].head()
    assert(d == 4 + 10 + 18)
    // null propagation
    assert(spark.sql("SELECT long_array_dot(NULL, array(1L)) AS d")
      .head().isNullAt(0))
  }

  test("GraftExtensions injects the same function via the extension hook") {
    // apply the extension function to a fresh builder-independent session is
    // heavyweight; assert the injection itself is well-formed instead.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }

  test("delete view registers as a SQL temp view with pushdown-able scan") {
    val dir = Fixtures.cowDir(spark, sf0001)
    DeleteView(spark, dir, Fixtures.C2).register("dv_c2")
    val n = spark.sql("SELECT count(*) FROM dv_c2").as[Long].head()
    val direct = DeleteView(spark, dir, Fixtures.C2).toDF().count()
    assert(n == direct && n > 0)
    // SQL filter over the view: every deleted key is ≡ 0 (mod 7)
    assert(spark.sql(
      "SELECT count(*) FROM dv_c2 WHERE o_orderkey % 7 <> 0")
      .as[Long].head() == 0)
  }

  test("randomized: delete view == exactly the randomly deleted rows") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .limit(300).cache()
    val keys = orders.select("o_orderkey").as[Long].collect().toSeq
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val frac = 0.05 + rnd.nextDouble() * 0.3
      val picked = keys.filter(_ => rnd.nextDouble() < frac) match {
        case Nil => keys.take(1)
        case ks => ks
      }
      val dir = freshDir(s"dv_prop_$seed")
      val w = new CowWriter(spark, dir, numBuckets = 4)
      w.insert(orders, col("o_orderkey"), col("o_orderstatus"), Fixtures.C1)
      w.delete(orders.filter(col("o_orderkey").isInCollection(picked)),
        col("o_orderkey"), col("o_orderstatus"), Fixtures.C2)
      val view = DeleteView(spark, dir, Fixtures.C2).toDF()
      val viewKeys = view.select("o_orderkey").as[Long].collect().toSet
      assert(viewKeys == picked.toSet,
        s"seed=$seed: view keys != deleted keys")
      // full payload equality against the pre-delete rows
      val expected = orders.filter(col("o_orderkey").isInCollection(picked))
      assert(view.select(orders.columns.map(col).toIndexedSeq: _*)
        .exceptAll(expected).isEmpty, s"seed=$seed: payload drift")
      assert(expected.exceptAll(
        view.select(orders.columns.map(col).toIndexedSeq: _*)).isEmpty,
        s"seed=$seed: missing rows")
    }
  }
}
