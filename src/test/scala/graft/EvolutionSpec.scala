package graft

import graft.read.{IncrementalReader, SnapshotReader}
import graft.write.{CowWriter, MorWriter}
import org.apache.spark.sql.functions._

/** ADD-COLUMN schema evolution: a later commit may introduce new payload
  * columns; earlier slices read them as null (mergeSchema scans +
  * allowMissingColumns unions across writers and readers). */
class EvolutionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders =
    spark.read.parquet(s"$sf0001/orders.parquet").limit(300)
  private val C1 = Fixtures.C1
  private val C2 = Fixtures.C2

  test("COW: upsert adds a payload column; old rows read null, old snapshots keep the old schema") {
    val dir = freshDir("orders_evo_cow")
    val w = new CowWriter(spark, dir, numBuckets = 2)
    w.insert(orders, col("o_orderkey"), col("o_orderstatus"), C1)
    val up = orders.filter($"o_orderkey" % 10 === 3)
      .withColumn("o_note", concat(lit("note-"), $"o_orderkey"))
    w.upsert(up, col("o_orderkey"), col("o_orderstatus"), C2)

    val snap = SnapshotReader.read(spark, dir)
    assert(snap.columns.contains("o_note"))
    assert(snap.count() == orders.count())
    assert(snap.filter($"o_orderkey" % 10 === 3 && $"o_note".isNull).isEmpty,
      "updated rows must carry the new column")
    assert(snap.filter($"o_orderkey" % 10 =!= 3 && $"o_note".isNotNull).isEmpty,
      "pre-evolution rows must read null")
    // time travel to C1 sees the pre-evolution schema
    assert(!SnapshotReader.read(spark, dir, asOf = Some(C1))
      .columns.contains("o_note"))
  }

  test("MOR: delta upsert with a new column merges against old base slices") {
    val dir = freshDir("orders_evo_mor")
    val w = new MorWriter(spark, dir, numBuckets = 2)
    w.insert(orders, col("o_orderkey"), col("o_orderstatus"), C1)
    val up = orders.filter($"o_orderkey" % 10 === 3)
      .withColumn("o_note", lit("x"))
    w.upsert(up, col("o_orderkey"), col("o_orderstatus"), C2)

    val snap = SnapshotReader.read(spark, dir)
    assert(snap.count() == orders.count())
    assert(snap.filter($"o_note" === "x").count() ==
      orders.filter($"o_orderkey" % 10 === 3).count())

    // incremental range read carries the evolved column for changed rows
    val inc = IncrementalReader.read(spark, dir, C1, C2)
    assert(inc.columns.contains("o_note"))
    assert(inc.count() == up.count())
    assert(inc.filter($"o_note".isNull).isEmpty)
  }
}
