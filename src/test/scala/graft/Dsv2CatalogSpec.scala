package graft

import graft.format.{MetaCols, Timeline}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** DSv2 catalog surface ([[graft.sources.GraftCatalog]]): catalog-managed
  * CREATE / INSERT INTO / INSERT OVERWRITE / DELETE / SELECT / time travel
  * on a plain session — no extension rule involved — plus the plan-parity
  * and cross-surface-equivalence gates (VERDICT r7 next-round #1). */
class Dsv2CatalogSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/dsv2_wh"
  private val cat = "graft_dsv2_test"

  private def conf(): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  private def freshTable(name: String): String = {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.$name")
    s"$cat.ns.$name"
  }

  test("CREATE TABLE + INSERT INTO lands upsert commits through pure DSv2") {
    val t = freshTable("t1")
    spark.sql(s"""CREATE TABLE $t (
      id BIGINT, part STRING, v BIGINT) PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2')""")
    // created-but-empty: readable, zero rows, payload schema only
    val empty = spark.sql(s"SELECT * FROM $t")
    assert(empty.columns.toSeq == Seq("id", "part", "v"))
    assert(empty.count() == 0)
    // the INSERT must plan as DSv2 (AppendData), NOT the extension's V1
    // command — proving the no-extension path even in a session that has
    // the extension installed
    val ins = spark.sql(
      s"INSERT INTO $t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)")
    assert(!ins.queryExecution.analyzed.toString.contains("GraftInsert"),
      "catalog INSERT must take the DSv2 write path, not the V1 rule")
    assert(spark.sql(s"SELECT * FROM $t").count() == 3)
    // second INSERT with an existing key = upsert-by-key (table semantics)
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 99), (4, 'c', 40)")
    val rows = spark.sql(s"SELECT id, v FROM $t ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 10L), (2L, 99L), (3L, 30L), (4L, 40L)))
    // the commits are ordinary graft commits: same table through the
    // format surface and the programmatic API, meta columns included
    val path = s"$wh/ns/t1"
    val viaFormat = spark.read.format("graft").load(path)
    assert(viaFormat.select("id", "v").orderBy("id")
      .as[(Long, Long)].collect().toSeq == rows)
    assert(viaFormat.columns.contains(MetaCols.RecordKey))
    assert(sources.GraftTable(spark, path).commits.size == 3) // create+2
  }

  test("metadata columns: _hoodie_* selectable by name, absent from *") {
    val t = freshTable("t2")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '1')""")
    spark.sql(s"INSERT INTO $t VALUES (7, 'x')")
    val m = spark.sql(
      s"SELECT ${MetaCols.RecordKey}, ${MetaCols.PartitionPath}, id FROM $t")
      .head()
    assert(m.getString(0) == "7" && m.getString(1) == "x" && m.getLong(2) == 7)
    assert(!spark.sql(s"SELECT * FROM $t").columns.exists(
      MetaCols.all.contains))
  }

  test("INSERT OVERWRITE replaces atomically; VERSION AS OF still serves history") {
    val t = freshTable("t3")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10), (2, 'b', 20)")
    val preTs = sources.GraftTable(spark, s"$wh/ns/t3").commits.last
    spark.sql(s"INSERT OVERWRITE $t VALUES (5, 'c', 50)")
    assert(spark.sql(s"SELECT id FROM $t").as[Long].collect().toSeq ==
      Seq(5L))
    // native DSv2 time travel — no extension rule resolves this
    val old = spark.sql(s"SELECT id FROM $t VERSION AS OF '$preTs' ORDER BY id")
    assert(old.as[Long].collect().toSeq == Seq(1L, 2L))
    // a time-travel snapshot refuses writes
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO $t VERSION AS OF '$preTs' VALUES (9, 'z', 9)"))
    assert(e.getMessage != null)
  }

  test("DELETE FROM via SupportsDelete: one delete commit, delete view works") {
    val t = freshTable("t4")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10), (2,'b',20), (3,'a',30)")
    spark.sql(s"DELETE FROM $t WHERE v >= 20")
    assert(spark.sql(s"SELECT id FROM $t").as[Long].collect().toSeq ==
      Seq(1L))
    // deleting nothing is a legal no-op, not a commit
    val path = s"$wh/ns/t4"
    val commits = sources.GraftTable(spark, path).commits
    spark.sql(s"DELETE FROM $t WHERE v > 1000000")
    assert(sources.GraftTable(spark, path).commits == commits)
    // the delete commit feeds the reference capability unchanged
    val dv = deleteview.DeleteView(spark, path, commits.last).toDF()
    assert(dv.select("id").as[Long].collect().toSeq.sorted == Seq(2L, 3L))
  }

  test("CTAS + MOR type + cross-surface parity with GraftTable.snapshot") {
    val t = freshTable("t5")
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "part", "v")
      .createOrReplaceTempView("dsv2_ctas_src")
    spark.sql(s"""CREATE TABLE $t PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2', type 'mor')
      AS SELECT * FROM dsv2_ctas_src""")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 99)") // MOR delta commit
    val viaCat = spark.sql(s"SELECT id, part, v FROM $t ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq
    assert(viaCat == Seq((1L, "a", 10L), (2L, "b", 99L)))
    val snap = sources.GraftTable(spark, s"$wh/ns/t5").snapshot()
      .select("id", "part", "v").orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(snap == viaCat)
    val tl = Timeline(spark.sessionState.newHadoopConf(), s"$wh/ns/t5")
    assert(tl.recordedExtraAsOf("type", None).contains("mor"))
  }

  test("pushdown: translatable filters are claimed by the scan, pruning works") {
    val t = freshTable("t6")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10), (2,'b',20), (3,'a',30)")
    val q = spark.sql(s"SELECT v FROM $t WHERE part = 'a' AND v > 15")
    assert(q.as[Long].collect().toSeq == Seq(30L))
    // both predicates are translatable and the table is delta-free →
    // the NATIVE batch scan serves it (r10), claiming the filters
    // (parquet row-group pushdown + row-exact re-verification inside the
    // reader — the result assert above is the correctness gate)
    val scans = q.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.toString.contains("GraftBatchScan")),
      s"expected the native graft batch scan, got:\n${q.queryExecution}")
    // column pruning reached the scan: its readSchema is just (part, v)
    assert(!q.queryExecution.executedPlan.toString
      .contains(MetaCols.CommitTime))
    // the same query against a DELTA-carrying (MOR) state serves through
    // the native MOR batch scan (r11): per-file-group merge tasks
    val m = freshTable("t6m")
    spark.sql(s"""CREATE TABLE $m (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2', type 'mor')""")
    spark.sql(s"INSERT INTO $m VALUES (1,'a',10), (2,'b',20)")
    spark.sql(s"INSERT INTO $m VALUES (2,'b',25), (3,'a',30)") // deltas
    val qm = spark.sql(s"SELECT v FROM $m WHERE part = 'b'")
    assert(qm.queryExecution.executedPlan.collectLeaves()
      .exists(_.toString.contains("GraftMorBatchScan")),
      s"MOR deltas must serve via the native MOR scan:\n${qm.queryExecution}")
    assert(qm.as[Long].collect().toSeq == Seq(25L))
  }

  test("V2 predicate pushdown: expression predicates are claimed and evaluated inside the snapshot plan") {
    val t = freshTable("t19")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $t VALUES " +
      (1 to 12).map(i => s"($i, 'p${i % 3}', ${i * 10})").mkString(", "))
    // an EXPRESSION predicate the V1 Filter algebra cannot carry
    // (modulo arithmetic): with the V1 bridge it stayed as a Filter node
    // above the DSv2 scan; the V2 path claims it, so it runs inside the
    // snapshot's optimized plan (no residual Filter in the logical plan)
    val q = spark.sql(
      s"SELECT id FROM $t WHERE part = 'p1' AND v % 40 = 0")
    assert(q.as[Long].collect().toSeq.sorted == Seq(4L))
    val optimized = q.queryExecution.optimizedPlan
    assert(!optimized.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]),
      s"expression predicates not fully claimed:\n$optimized")
    assert(q.queryExecution.executedPlan.toString.contains("%"),
      "claimed modulo predicate missing from the scan's pushed set:\n" +
        q.queryExecution.executedPlan)
    // classic comparison predicates still prune and still agg-push: the
    // V1 renderings keep feeding the metadata-aggregate path
    val c = spark.sql(s"SELECT count(*) FROM $t WHERE part = 'p1'")
    assert(c.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"))
    assert(c.as[Long].head == 4L)
    // an expression predicate DECLINES the metadata aggregate (no exact
    // partition evaluation) but stays correct through the ordinary scan
    val ce = spark.sql(s"SELECT count(*) FROM $t WHERE v % 40 = 0")
    assert(!ce.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"))
    assert(ce.as[Long].head == 3L)
  }

  test("LIMIT and ORDER BY ... LIMIT push into the inner snapshot plan") {
    val t = freshTable("t20")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $t VALUES " +
      (1 to 20).map(i => s"($i, 'p${i % 3}', ${i * 10})").mkString(", "))
    // plain LIMIT: the scan carries it (plan-visible), result bounded —
    // since r11 the NATIVE scan serves limit shapes too
    val l = spark.sql(s"SELECT id FROM $t LIMIT 5")
    assert(l.queryExecution.executedPlan.toString.contains("limit=5"),
      s"limit not pushed:\n${l.queryExecution.executedPlan}")
    assert(l.collect().length == 5)
    // TopN: ORDER BY + LIMIT — top-n per task, O(n) rows cross the V2
    // boundary; Spark's final sort/limit stays above for exactness
    // (partial semantics)
    val topn = spark.sql(s"SELECT id, v FROM $t ORDER BY v DESC LIMIT 3")
    assert(topn.queryExecution.executedPlan.toString.contains("top-n"),
      s"topN not pushed:\n${topn.queryExecution.executedPlan}")
    assert(topn.as[(Long, Long)].collect().toSeq ==
      Seq((20L, 200L), (19L, 190L), (18L, 180L)))
    // with a filter: both compose inside the inner plan
    val fl = spark.sql(
      s"SELECT id FROM $t WHERE part = 'p1' ORDER BY id LIMIT 2")
    assert(fl.as[Long].collect().toSeq == Seq(1L, 4L))
    // the V1-fallback path still pushes both (its own plan shapes)
    spark.conf.set("spark.graft.catalog.nativeScan", "false")
    try {
      val lv = spark.sql(s"SELECT id FROM $t LIMIT 5")
      assert(lv.queryExecution.executedPlan.toString
        .contains("PushedLimit"),
        s"V1 limit not pushed:\n${lv.queryExecution.executedPlan}")
      assert(lv.collect().length == 5)
      val tv = spark.sql(s"SELECT id, v FROM $t ORDER BY v DESC LIMIT 3")
      assert(tv.queryExecution.executedPlan.toString.contains("PushedTopN"))
      assert(tv.as[(Long, Long)].collect().toSeq ==
        Seq((20L, 200L), (19L, 190L), (18L, 180L)))
    } finally spark.conf.unset("spark.graft.catalog.nativeScan")
  }

  test("catalog DDL guards: reserved columns, missing key, bad partitioning") {
    val t = freshTable("t7")
    intercept[Exception](spark.sql(
      s"CREATE TABLE $t (id BIGINT, ${MetaCols.RecordKey} STRING, " +
        "part STRING) PARTITIONED BY (part) TBLPROPERTIES (key 'id')"))
    intercept[Exception](spark.sql(
      s"CREATE TABLE $t (id BIGINT, part STRING) PARTITIONED BY (part)"))
    intercept[Exception](spark.sql(
      s"CREATE TABLE $t (id BIGINT, part STRING, v BIGINT) " +
        "PARTITIONED BY (part, v) TBLPROPERTIES (key 'id')"))
    // none of the failures may leave a half-created table behind
    assert(!spark.sql(s"SHOW TABLES IN $cat.ns").collect()
      .map(_.getString(1)).contains("t7"))
  }

  test("listTables / tableExists / DROP TABLE / rename") {
    val t = freshTable("t8")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '1')""")
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").collect()
      .map(_.getString(1)).contains("t8"))
    spark.sql(s"ALTER TABLE $t RENAME TO ns.t8renamed")
    assert(spark.sql(s"SELECT * FROM $cat.ns.t8renamed").columns.nonEmpty)
    spark.sql(s"DROP TABLE $cat.ns.t8renamed")
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").collect()
      .map(_.getString(1)).forall(n => n != "t8" && n != "t8renamed"))
  }

  test("ALTER TABLE through the catalog: add/drop as evolution commits, guards shared") {
    val t = freshTable("t10")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '1')""")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10)")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (score BIGINT)")
    // pre-evolution rows null-pad; new inserts carry the column
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 20, 7)")
    val rows = spark.sql(s"SELECT id, score FROM $t ORDER BY id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq == Seq((1L, -1L), (2L, 7L)))
    spark.sql(s"ALTER TABLE $t DROP COLUMN score")
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq ==
      Seq("id", "part", "v"))
    // SAME guards as the extension surface: resurrection + identity
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (score BIGINT)"))
    assert(e1.getMessage.contains("re-add previously dropped"))
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $t DROP COLUMN id"))
    assert(e2.getMessage.contains("record-key column"))
    // the evolution commits are ordinary history: time travel serves the
    // pre-ALTER schema
    val preAlter = sources.GraftTable(spark, s"$wh/ns/t10").commits(1)
    assert(!spark.sql(s"SELECT * FROM $t VERSION AS OF '$preAlter'")
      .columns.contains("score"))
  }

  test("full DML on V2 catalog tables with the extension: arbitrary DELETE, UPDATE, MERGE") {
    val t = freshTable("t11")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $t VALUES " +
      (1 to 10).map(i => s"($i, 'p${i % 2}', ${i * 10})").mkString(", "))
    // DELETE with a NON-translatable predicate (modulo) — impossible via
    // SupportsDelete, handled by the extension's row-level path
    spark.sql(s"DELETE FROM $t WHERE id % 5 = 0")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head == 8L)
    // UPDATE with expression assignment
    spark.sql(s"UPDATE $t SET v = v + 1000 WHERE id % 3 = 1")
    val afterUpd = spark.sql(s"SELECT id, v FROM $t ORDER BY id")
      .as[(Long, Long)].collect().toMap
    assert(afterUpd(1L) == 1010L && afterUpd(4L) == 1040L &&
      afterUpd(2L) == 20L)
    // MERGE with update + insert (star expansion over the payload schema)
    Seq((2L, "p0", 999L), (50L, "p0", 500L)).toDF("id", "part", "v")
      .createOrReplaceTempView("dsv2_merge_src")
    spark.sql(
      s"""MERGE INTO $t tt USING dsv2_merge_src s ON tt.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val afterMerge = spark.sql(s"SELECT id, v FROM $t ORDER BY id")
      .as[(Long, Long)].collect().toMap
    assert(afterMerge(2L) == 999L && afterMerge(50L) == 500L &&
      afterMerge.size == 9)
    // row identity is immutable: meta assignment refused
    val e = intercept[Exception](spark.sql(
      s"UPDATE $t SET ${graft.format.MetaCols.RecordKey} = 'x'"))
    assert(e.getMessage != null)
    // all of it is ordinary commit history on the same table
    assert(sources.GraftTable(spark, s"$wh/ns/t11").commits.size == 5)
  }

  test("DML on a created-but-EMPTY catalog table is a legal no-op, not a crash") {
    val t = freshTable("t14")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '1')""")
    // row-level statements against zero rows: all no-ops (the extension's
    // V2 remap must use the empty-state-aware snapshot, like SELECT does)
    spark.sql(s"DELETE FROM $t WHERE id % 7 = 0")
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE id = 5")
    Seq((1L, "a", 1L)).toDF("id", "part", "v")
      .createOrReplaceTempView("dsv2_empty_src")
    spark.sql(s"""MERGE INTO $t tt USING dsv2_empty_src s ON tt.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    // the MERGE's not-matched insert is the only effect
    assert(spark.sql(s"SELECT id, v FROM $t").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 1L)))
  }

  test("catalog identifiers cannot escape the warehouse directory") {
    conf()
    val e = intercept[Exception](
      spark.sql(s"DROP TABLE $cat.`..`.`..`.`etc`"))
    assert(e.getMessage.contains("illegal catalog identifier") ||
      e.getMessage.contains("escape"), e.getMessage)
  }

  test("namespace verbs refuse TABLE directories; TIMESTAMP AS OF is validated") {
    val t = freshTable("t15")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '1')""")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    val catalog = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.GraftCatalog]
    // a direct API dropNamespace(ns=the table dir, cascade) must refuse —
    // containment must not depend on Spark's namespaceExists pre-check
    val d = intercept[IllegalArgumentException](
      catalog.dropNamespace(Array("ns", "t15"), true))
    assert(d.getMessage.contains("is a table"), d.getMessage)
    val c = intercept[IllegalArgumentException](
      catalog.createNamespace(Array("ns", "t15"),
        java.util.Collections.emptyMap[String, String]()))
    assert(c.getMessage.contains("is a table"), c.getMessage)
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head == 1L)
    // TIMESTAMP AS OF before the table existed: a clear time-travel error
    // at resolution, not a late "records no schema" state error
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $t TIMESTAMP AS OF '1999-01-01 00:00:00'")
        .collect())
    assert(e.getMessage.contains("predates"), e.getMessage)
  }

  test("COUNT(*) pushdown: answered from commit metadata, zero file reads") {
    val t = freshTable("t12")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    // empty table counts 0 from metadata
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head == 0L)
    spark.sql(s"INSERT INTO $t VALUES " +
      (1 to 9).map(i => s"($i, 'p${i % 3}', $i)").mkString(", "))
    spark.sql(s"DELETE FROM $t WHERE v >= 8") // COW rewrite: counts stay live
    val q = spark.sql(s"SELECT count(*) FROM $t")
    assert(q.as[Long].head == 7L)
    assert(q.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"),
      s"count(*) not metadata-answered:\n${q.queryExecution.executedPlan}")
    assert(q.inputFiles.isEmpty, "metadata count must read no files")
    // PARTITION-only filters are evaluated against the metadata (r9)
    val qf = spark.sql(s"SELECT count(*) FROM $t WHERE part = 'p1'")
    assert(qf.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"),
      s"partition-filtered count not metadata-answered:\n" +
        qf.queryExecution.executedPlan)
    assert(qf.as[Long].head == 3L)
    assert(qf.inputFiles.isEmpty)
    // non-partition filters decline (still correct through the scan)
    val qnf = spark.sql(s"SELECT count(*) FROM $t WHERE v <= 3")
    assert(!qnf.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"))
    assert(qnf.as[Long].head == 3L)
    // MOR with outstanding deltas: since r11 the count folds from the
    // exact per-delta counters — still metadata-answered, still correct
    // (1 update + 1 new key over a 2-row base = 3 live rows)
    val m = freshTable("t13")
    spark.sql(s"""CREATE TABLE $m (id BIGINT, part STRING)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '1', type 'mor')""")
    spark.sql(s"INSERT INTO $m VALUES (1, 'a'), (2, 'a')")
    spark.sql(s"INSERT INTO $m VALUES (2, 'a'), (3, 'a')") // delta upsert
    val qm = spark.sql(s"SELECT count(*) FROM $m")
    assert(qm.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"),
      s"delta count not metadata-answered:\n${qm.queryExecution}")
    assert(qm.inputFiles.isEmpty)
    assert(qm.as[Long].head == 3L)
  }

  test("MIN/MAX/COUNT(col) pushdown from the column-stats index, grouped by partition") {
    val t = freshTable("t16")
    // v is a DECLARED stats column; w is not (its extrema must decline)
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT, w BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2', stats 'v')""")
    spark.sql(s"INSERT INTO $t VALUES " +
      ((1 to 9).map(i => s"($i, 'p${i % 3}', ${i * 10}, $i)") :+
        "(10, 'p0', NULL, NULL)").mkString(", "))
    spark.sql(s"DELETE FROM $t WHERE id = 9") // rewrite refreshes stats

    // ungrouped MIN/MAX/COUNT(v): pure metadata, zero file reads
    val q = spark.sql(
      s"SELECT min(v) AS mn, max(v) AS mx, count(v) AS cv, count(*) AS n FROM $t")
    assert(q.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
      s"min/max not metadata-answered:\n${q.queryExecution.executedPlan}")
    assert(q.inputFiles.isEmpty)
    assert(q.as[(Long, Long, Long, Long)].head == ((10L, 80L, 8L, 9L)))

    // grouped by the partition column: one metadata row per partition
    val g = spark.sql(
      s"SELECT part, min(v) AS mn, max(v) AS mx, count(*) AS n FROM $t " +
        "GROUP BY part ORDER BY part")
    assert(g.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
      s"grouped min/max not metadata-answered:\n${g.queryExecution.executedPlan}")
    assert(g.inputFiles.isEmpty)
    assert(g.as[(String, Option[Long], Option[Long], Long)].collect().toSeq ==
      Seq(("p0", Some(30L), Some(60L), 3L), ("p1", Some(10L), Some(70L), 3L),
        ("p2", Some(20L), Some(80L), 3L)))

    // partition-filtered + grouped composes
    val f = spark.sql(
      s"SELECT part, max(v) AS mx FROM $t WHERE part >= 'p1' " +
        "GROUP BY part ORDER BY part")
    assert(f.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"))
    assert(f.as[(String, Long)].collect().toSeq ==
      Seq(("p1", 70L), ("p2", 80L)))

    // an UNDECLARED stats column declines to the ordinary scan, correctly
    val u = spark.sql(s"SELECT min(w) AS mw FROM $t")
    assert(!u.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"))
    assert(u.as[Long].head == 1L)

    // the same aggregates through the ordinary scan agree (cross-check the
    // metadata answers against real data)
    val real = spark.read.format("graft").load(s"$wh/ns/t16")
      .groupBy("part")
      .agg(min("v").as("mn"), max("v").as("mx"), count(lit(1)).as("n"))
      .orderBy("part")
      .as[(String, Option[Long], Option[Long], Long)].collect().toSeq
    assert(real == Seq(("p0", Some(30L), Some(60L), 3L),
      ("p1", Some(10L), Some(70L), 3L), ("p2", Some(20L), Some(80L), 3L)))

    // SUM from the recorded per-file sums (r9): metadata-only, grouped,
    // exact across the delete rewrite; the all-null-capable COUNT gates
    val sq = spark.sql(
      s"SELECT part, sum(v) AS sv, count(*) AS n FROM $t " +
        "GROUP BY part ORDER BY part")
    assert(sq.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
      s"grouped sum not metadata-answered:\n${sq.queryExecution.executedPlan}")
    assert(sq.inputFiles.isEmpty)
    assert(sq.as[(String, Option[Long], Long)].collect().toSeq ==
      Seq(("p0", Some(90L), 3L), ("p1", Some(120L), 3L),
        ("p2", Some(150L), 3L)))
    // ungrouped sum over a column with nulls: null rows are ignored
    val su = spark.sql(s"SELECT sum(v) AS sv FROM $t")
    assert(su.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"))
    assert(su.as[Long].head == 360L)
    // AVG on an integral column: the scan DECLINES the direct AVG (the
    // wrapped long stats can't mirror a double-summing Average), and
    // Spark itself rewrites it to sum/count — which ARE metadata-answered,
    // with Spark's own division on top (its exact rewrite semantics)
    val av = spark.sql(s"SELECT avg(v) AS av FROM $t")
    val avPlan = av.queryExecution.executedPlan.toString
    assert(avPlan.contains("GraftMetaAggScan") &&
      avPlan.contains("SUM(v)") && avPlan.contains("COUNT(v)"),
      s"integral avg should push via Spark's sum/count rewrite:\n$avPlan")
    assert(math.abs(av.as[Double].head - 45.0) < 1e-9)
    // sum on the UNDECLARED stats column declines, correctly
    val sw = spark.sql(s"SELECT sum(w) AS sw FROM $t")
    assert(!sw.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"))
    assert(sw.as[Long].head == 36L)
  }

  test("decimal SUM/AVG metadata pushdown is bit-exact; fp sums DECLINE (r10)") {
    val t = freshTable("t18")
    // d DECIMAL (declared stats → exact per-file sums recorded),
    // f DOUBLE (declared stats → min/max recorded but NO sum: fp
    // addition is order-dependent, the r9 q_v2_sum defect)
    spark.sql(s"""CREATE TABLE $t
      (id BIGINT, part STRING, d DECIMAL(10,2), f DOUBLE)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2', stats 'd,f')""")
    spark.sql(s"INSERT INTO $t VALUES " +
      ((1 to 12).map(i =>
        s"($i, 'p${i % 2}', CAST(${i * 7}.${10 + i} AS DECIMAL(10,2)), " +
          s"${i}.25)") :+ "(13, 'p1', NULL, NULL)").mkString(", "))
    spark.sql(s"DELETE FROM $t WHERE id = 12") // delete-rewrite refreshes

    // grouped decimal SUM + AVG: answered from metadata, zero file reads
    val q = spark.sql(
      s"SELECT part, sum(d) AS sd, avg(d) AS ad, count(*) AS n FROM $t " +
        "GROUP BY part ORDER BY part")
    assert(q.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
      s"decimal sum/avg not metadata-answered:\n${q.queryExecution.executedPlan}")
    assert(q.inputFiles.isEmpty)

    // ... and BIT-IDENTICAL (types and values) to the same aggregate over
    // the ordinary format-path scan, which has no V2 pushdown at all
    val real = spark.read.format("graft").load(s"$wh/ns/t18")
      .groupBy("part")
      .agg(sum("d").as("sd"), avg("d").as("ad"), count(lit(1)).as("n"))
      .orderBy("part")
    assert(q.schema == real.schema,
      s"pushed schema ${q.schema} != scan schema ${real.schema}")
    assert(q.collect().toSeq == real.collect().toSeq)
    // result types are Spark's own Sum/Average decimal result types
    assert(q.schema("sd").dataType ==
      org.apache.spark.sql.types.DecimalType(20, 2))
    assert(q.schema("ad").dataType ==
      org.apache.spark.sql.types.DecimalType(14, 6))

    // ungrouped, with the all-null row contributing nothing
    val u = spark.sql(s"SELECT sum(d) AS sd, avg(d) AS ad FROM $t")
    assert(u.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"))
    val realU = spark.read.format("graft").load(s"$wh/ns/t18")
      .agg(sum("d").as("sd"), avg("d").as("ad"))
    assert(u.collect().toSeq == realU.collect().toSeq)

    // a projection ABOVE the aggregate (q_v2_sum's string-rendered outer
    // SELECT) does not disturb the pushdown
    val w = spark.sql(
      s"SELECT part, CAST(sd AS STRING) AS sds FROM " +
        s"(SELECT part, sum(d) AS sd FROM $t GROUP BY part) ORDER BY part")
    assert(w.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
      s"projected sum not metadata-answered:\n${w.queryExecution.executedPlan}")

    // fp SUM and AVG both DECLINE to the ordinary scan — an fp fold can
    // never be exact against an arbitrary scan order, so the metadata
    // path must not claim it (the r9 lesson, pinned)
    for (agg <- Seq("sum(f)", "avg(f)")) {
      val fq = spark.sql(s"SELECT $agg AS x FROM $t")
      assert(!fq.queryExecution.executedPlan.toString
        .contains("GraftMetaAggScan"),
        s"$agg must decline the metadata path:\n${fq.queryExecution.executedPlan}")
    }
    // the declined answers are still served (by the real scan)
    assert(math.abs(spark.sql(s"SELECT sum(f) FROM $t").as[Double].head -
      (1 to 11).map(_ + 0.25).sum) < 1e-9)
  }

  test("string-function predicates (substring/upper/trim) are claimed and fused (r10)") {
    val t = freshTable("t23")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, nm STRING)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $t VALUES (1,'a','Widget'), (2,'b','Gadget')," +
      " (3,'a','widget'), (4,'b','  pad  ')")
    // substring: Spark 4.1's own V2→Catalyst translator has no mapping —
    // without the r10 extension this stays a Filter node above the scan
    val q1 = spark.sql(
      s"SELECT id FROM $t WHERE substring(nm, 1, 3) = 'Wid'")
    assert(q1.as[Long].collect().toSeq == Seq(1L))
    assert(!q1.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]),
      s"substring predicate not fully claimed:\n${q1.queryExecution.optimizedPlan}")
    val q2 = spark.sql(s"SELECT id FROM $t WHERE upper(nm) = 'WIDGET'")
    assert(q2.as[Long].collect().toSeq.sorted == Seq(1L, 3L))
    assert(!q2.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]),
      s"upper predicate not fully claimed:\n${q2.queryExecution.optimizedPlan}")
    val q3 = spark.sql(s"SELECT id FROM $t WHERE trim(nm) = 'pad'")
    assert(q3.as[Long].collect().toSeq == Seq(4L))
    assert(!q3.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]),
      s"trim predicate not fully claimed:\n${q3.queryExecution.optimizedPlan}")
  }

  test("multi-level namespace: cat.a.b.t serves CRUD and streaming toTable (r10)") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.a.b")
    spark.sql(s"DROP TABLE IF EXISTS $cat.a.b.deep")
    spark.sql(s"""CREATE TABLE $cat.a.b.deep (id BIGINT, part STRING,
      v BIGINT) PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $cat.a.b.deep VALUES (1,'x',10)")
    assert(spark.sql(s"SELECT id, v FROM $cat.a.b.deep")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 10L)))
    // the directory layout is the nested namespace
    assert(new java.io.File(s"$wh/a/b/deep/.hoodie").isDirectory)

    // streaming toTable INTO the deep table: the V1-fallback identifier
    // dot-joins (a, b) into TableIdentifier's single database string; the
    // catalog's namespace re-split resolves it back (the r9 honest note)
    val src = freshTable("t24")
    spark.sql(s"""CREATE TABLE $src (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $src VALUES (5,'y',50), (6,'y',60)")
    val ckp = "/tmp/graft_test/deep_ns_ckp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckp))
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.table(src).select("id", "part", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", ckp)
      .trigger(Trigger.AvailableNow()).toTable(s"$cat.a.b.deep")
    q.awaitTermination(120000)
    assert(spark.sql(s"SELECT id, v FROM $cat.a.b.deep ORDER BY id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (5L, 50L), (6L, 60L)))
  }

  test("native batch scan ≡ V1 fallback: rows, filters, projections, time travel (r10)") {
    conf()
    val t = freshTable("t21")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '4')""")
    spark.sql(s"INSERT INTO $t VALUES " +
      (1 to 40).map(i => s"($i, 'p${i % 3}', ${i * 10})").mkString(", "))
    spark.sql(s"INSERT INTO $t VALUES (2, 'p2', 999)") // upsert moves id=2
    spark.sql(s"DELETE FROM $t WHERE id = 7")
    def native(q: String) = spark.sql(q)
    def fallback(q: String) = {
      spark.conf.set("spark.graft.catalog.nativeScan", "false")
      try spark.sql(q).collect().toSeq
      finally spark.conf.unset("spark.graft.catalog.nativeScan")
    }
    for (q <- Seq(
      s"SELECT * FROM $t",
      s"SELECT id, v FROM $t WHERE part = 'p1' AND v > 100",
      s"SELECT ${MetaCols.CommitTime}, id FROM $t WHERE id <= 5",
      s"SELECT part, v FROM $t WHERE id % 4 = 1")) {
      val n = native(q)
      assert(n.collect().toSeq.toSet == fallback(q).toSet, s"mismatch: $q")
    }
    // the default path IS the native scan for this delta-free table
    val plan = native(s"SELECT * FROM $t").queryExecution.executedPlan
    assert(plan.collectLeaves().exists(_.toString.contains("GraftBatchScan")),
      s"native scan expected:\n$plan")
    // time travel through the native scan
    val v1 = spark.sql(s"SELECT count(*) FROM $t VERSION AS OF " +
      s"'${format.Timeline(spark.sessionState.newHadoopConf(),
        s"$wh/ns/t21").completedInstants().head.ts}'")
    assert(v1.as[Long].head == 0L) // creation commit: empty table declines

    // plain-mode scans byte-SPLIT large files (r10): under a tiny
    // maxPartitionBytes every file fans out into multiple range splits,
    // and the range-owned row groups still read each row exactly once
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      val df = spark.sql(s"SELECT id, v FROM $t")
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec
            if b.scan.getClass.getSimpleName == "GraftBatchScan" => b.scan
        }.get
      val nFiles = format.Timeline(spark.sessionState.newHadoopConf(),
        s"$wh/ns/t21").latestSlices(None).values.count(_.relPath.nonEmpty)
      assert(scan.toBatch.planInputPartitions().length > nFiles,
        "expected byte-range splits to outnumber files")
      assert(df.collect().toSeq.toSet == fallback(s"SELECT id, v FROM $t").toSet)
    } finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }

  test("bucket V2 function ≡ the writer's fileId arithmetic") {
    conf()
    import graft.sources.{GraftBucketBound, GraftBucketFunction}
    for (k <- Seq(1L, 2L, 17L, 123456789L, -5L)) {
      val expected = spark.sql(
        s"SELECT pmod(xxhash64(cast($k AS STRING)), 8)").head.getLong(0)
      val viaFn = GraftBucketBound(org.apache.spark.sql.types.LongType)
        .produceResult(org.apache.spark.sql.catalyst.InternalRow(8, k))
      assert(viaFn.toLong == expected, s"key $k")
      val viaHelper = GraftBucketFunction.bucketOf(
        org.apache.spark.unsafe.types.UTF8String.fromString(k.toString), 8)
      assert(viaHelper.toLong == expected, s"helper key $k")
    }
    // catalog-resolvable by name (the SPJ planning lookup path)
    val fn = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.FunctionCatalog]
      .loadFunction(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "bucket"))
    assert(fn.name() == "bucket")
  }

  test("exact scan statistics from metadata: small catalog table auto-broadcasts (r10)") {
    conf()
    val big = freshTable("stat_big"); val small = freshTable("stat_small")
    spark.sql(s"""CREATE TABLE $big (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '4')""")
    spark.sql(s"INSERT INTO $big SELECT id, concat('p', id % 4), id * 10 " +
      "FROM range(5000)")
    spark.sql(s"""CREATE TABLE $small (id BIGINT, part STRING, w BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '1')""")
    spark.sql(s"INSERT INTO $small VALUES (1,'a',100), (2,'a',200)")
    // the scan reports EXACT rows/bytes from the recorded write stats
    val tbl = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "stat_small"))
    val scan = tbl.asInstanceOf[
      org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new org.apache.spark.sql.util
        .CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
      .build()
    val st = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(st.numRows().getAsLong == 2L, s"numRows ${st.numRows()}")
    assert(st.sizeInBytes().getAsLong > 0 &&
      st.sizeInBytes().getAsLong < (1L << 20), s"bytes ${st.sizeInBytes()}")
    // ... which lets Spark AUTO-broadcast it under the default threshold,
    // no hint, no file-size listing
    val j = spark.sql(s"SELECT b.id, b.v, s.w FROM $big b " +
      s"JOIN $small s ON b.id = s.id")
    assert(j.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      s"expected stats-driven broadcast:\n${j.queryExecution.executedPlan}")
    assert(j.as[(Long, Long, Long)].collect().toSeq.sorted ==
      Seq((1L, 10L, 100L), (2L, 20L, 200L)))

    // a small MOR table with OUTSTANDING DELTAS serves via the native MOR
    // scan (r11), which reports recorded bytes (an upper bound on the
    // merge output) — it auto-broadcasts too
    val sm = freshTable("stat_mor")
    spark.sql(s"""CREATE TABLE $sm (id BIGINT, part STRING, w BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '1', type 'mor')""")
    spark.sql(s"INSERT INTO $sm VALUES (1,'a',100), (3,'a',300)")
    spark.sql(s"INSERT INTO $sm VALUES (3,'a',333)") // delta
    val j2 = spark.sql(s"SELECT b.id, s.w FROM $big b " +
      s"JOIN $sm s ON b.id = s.id")
    val p2 = j2.queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin") &&
      p2.contains("GraftMorBatchScan"),
      s"expected broadcast native MOR side:\n$p2")
    assert(j2.as[(Long, Long)].collect().toSeq.sorted ==
      Seq((1L, 100L), (3L, 333L)))
  }

  test("storage-partitioned join: same-key catalog tables join with ZERO Exchange (r10)") {
    conf()
    val t1 = freshTable("spj1"); val t2 = freshTable("spj2")
    for (t <- Seq(t1, t2))
      spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
        PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '4')""")
    spark.sql(s"INSERT INTO $t1 VALUES " +
      (1 to 30).map(i => s"($i, 'p${i % 2}', $i)").mkString(", "))
    spark.sql(s"INSERT INTO $t2 VALUES " +
      (11 to 40).map(i => s"($i, 'q${i % 3}', ${i * 100})").mkString(", "))
    // NOTE: restore is unset, not getOption round-trip — getOption
    // resolves SQLConf DEFAULTS, so "restoring" it would pin the default
    // as an explicit session value and leak into other tests
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.sql(
        s"SELECT a.id, a.v, b.v FROM $t1 a JOIN $t2 b ON a.id = b.id")
      assert(j.as[(Long, Long, Long)].collect().toSeq.sorted ==
        (11 to 30).map(i => (i.toLong, i.toLong, i * 100L)))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must plan with no shuffle:\n$plan")
      assert(plan.contains("GraftBatchScan"))
      // an aggregation keyed on the bucket key also satisfies its
      // clustering from the reported partitioning: no Exchange either
      // (the catalog twin of util.BucketedTables' zero-shuffle claim)
      val a = spark.sql(s"SELECT id, sum(v) AS sv FROM $t1 GROUP BY id")
      val aPlan = a.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange"),
        s"keyed aggregation must reuse the bucket partitioning:\n$aPlan")
      assert(a.as[(Long, Long)].collect().toSeq.sorted ==
        (1 to 30).map(i => (i.toLong, i.toLong)))
    } finally Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold").foreach(spark.conf.unset)
  }

  test("runtime filtering prunes partitions and buckets before any file opens (r10)") {
    conf()
    // pin ONE FILE PER TASK for this test (an open cost above half the
    // split size makes Spark's bin packing close every bin after one
    // file), so planned-partition counts measure file pruning directly
    spark.conf.set("spark.sql.files.openCostInBytes", (512L << 20).toString)
    val t = freshTable("t22")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '4')""")
    spark.sql(s"INSERT INTO $t VALUES " +
      (1 to 40).map(i => s"($i, 'p${i % 4}', ${i * 10})").mkString(", "))
    val tbl = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "t22"))
    def freshScan() = {
      val sb = tbl.asInstanceOf[
        org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new org.apache.spark.sql.util
          .CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
      sb.build()
    }
    val all = freshScan().toBatch.planInputPartitions().length
    assert(all > 4, s"expected per-file splits, got $all")
    // partition-column runtime filter: only p1's files stay planned
    val s1 = freshScan()
    s1.asInstanceOf[org.apache.spark.sql.connector.read
      .SupportsRuntimeFiltering]
      .filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("part", Array("p1"))))
    val p1 = s1.toBatch.planInputPartitions().length
    assert(p1 < all && p1 > 0, s"partition runtime filter: $p1 vs $all")
    // key-column runtime filter: only the keys' BUCKETS stay planned
    val s2 = freshScan()
    s2.asInstanceOf[org.apache.spark.sql.connector.read
      .SupportsRuntimeFiltering]
      .filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("id", Array(1L, 2L))))
    val b2 = s2.toBatch.planInputPartitions().length
    assert(b2 < all && b2 > 0, s"bucket runtime filter: $b2 vs $all")
    // unknown filter shapes keep everything (superset-safe contract)
    val s3 = freshScan()
    s3.asInstanceOf[org.apache.spark.sql.connector.read
      .SupportsRuntimeFiltering]
      .filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.GreaterThan("v", 0L)))
    assert(s3.toBatch.planInputPartitions().length == all)

    // end-to-end: a star join against a selective parquet dimension
    // plans a DYNAMIC-PRUNING runtime filter onto the fact scan (Spark's
    // DPP rule targets SupportsRuntimeFiltering scans) and still answers
    // exactly — runtime filters are an optimization, never a filter
    val dimPq = "/tmp/graft_test/rt_dim_pq"
    Seq(("p1", 1L), ("p2", 2L)).toDF("dpart", "w")
      .write.mode("overwrite").parquet(dimPq)
    spark.read.parquet(dimPq).createOrReplaceTempView("graft_dim_rt")
    val j = spark.sql(s"SELECT t.id, t.v FROM $t t JOIN graft_dim_rt d " +
      s"ON t.part = d.dpart WHERE d.w = 1")
    assert(j.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      s"expected a DPP runtime filter on the fact scan:\n" +
        j.queryExecution.executedPlan)
    assert(j.as[(Long, Long)].collect().toSeq.sorted ==
      (1 to 40).filter(_ % 4 == 1).map(i => (i.toLong, i * 10L)))
    spark.conf.unset("spark.sql.files.openCostInBytes")
  }

  test("filter values render via the writer's CAST: date partitions " +
    "prune statically and at runtime; unrenderable values decline (r10)") {
    conf()
    spark.conf.set("spark.sql.files.openCostInBytes", (512L << 20).toString)
    try {
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      spark.sql(s"DROP TABLE IF EXISTS $cat.ns.tdate")
      spark.sql(s"""CREATE TABLE $cat.ns.tdate (id BIGINT, pt DATE,
        v BIGINT) PARTITIONED BY (pt)
        TBLPROPERTIES (key 'id', buckets '2')""")
      spark.sql(s"INSERT INTO $cat.ns.tdate VALUES " +
        (1 to 16).map(i =>
          s"($i, DATE'2024-01-0${i % 4 + 1}', ${i * 10})").mkString(", "))

      def scanParts(q: org.apache.spark.sql.DataFrame): Int =
        q.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec => b.inputPartitions.length
        }.sum
      val full = spark.sql(s"SELECT v FROM $cat.ns.tdate")
      val filtered = spark.sql(
        s"SELECT v FROM $cat.ns.tdate WHERE pt = DATE'2024-01-02'")
      // correctness first: a bad rendering would silently return nothing
      assert(filtered.as[Long].collect().sorted.toSeq ==
        (1 to 16).filter(_ % 4 == 1).map(_ * 10L))
      // static pruning: the pushed date predicate narrows planned slices
      assert(scanParts(filtered) < scanParts(full) && scanParts(filtered) > 0,
        s"static date prune: ${scanParts(filtered)} vs ${scanParts(full)}")

      // runtime path: Spark's default SupportsRuntimeFiltering.filter
      // delivers EXTERNAL values (java.sql.Date) — must prune, not erase
      val tbl = spark.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("ns"), "tdate"))
      def freshScan() = tbl.asInstanceOf[
          org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new org.apache.spark.sql.util
          .CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
        .build()
      val all = freshScan().toBatch.planInputPartitions().length
      val s1 = freshScan()
      s1.asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsRuntimeFiltering]
        .filter(Array[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.EqualTo("pt",
            java.sql.Date.valueOf("2024-01-02"))))
      val p = s1.toBatch.planInputPartitions().length
      assert(p > 0 && p < all,
        s"date runtime filter must prune without erasing: $p vs $all")
      // an unrenderable value DECLINES the prune (superset kept)
      val s2 = freshScan()
      s2.asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsRuntimeFiltering]
        .filter(Array[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.EqualTo("pt", new Object())))
      assert(s2.toBatch.planInputPartitions().length == all)
    } finally spark.conf.unset("spark.sql.files.openCostInBytes")
  }

  test("namespace segments with trailing dots are rejected, not " +
    "silently normalized (r10: Java split drops trailing empties)") {
    conf()
    intercept[Exception](spark.sql(s"CREATE NAMESPACE $cat.`b.`"))
    intercept[Exception](spark.sql(s"CREATE NAMESPACE $cat.`b..`"))
    intercept[Exception](spark.sql(s"DROP NAMESPACE $cat.`b.`"))
  }

  test("streaming reads: readStream.table == the format-path stream, exactly-once across restarts") {
    val t = freshTable("t17")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10), (2,'b',20)")
    val base = "/tmp/graft_test/dsv2_stream"
    Seq("sinkCat", "sinkFmt", "ckpCat", "ckpFmt", "ckpToTable").foreach(n =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$base/$n")))
    import org.apache.spark.sql.streaming.Trigger
    def drainCat(): Unit = {
      val q = spark.readStream.table(t)
        .writeStream.format("parquet")
        .option("path", s"$base/sinkCat")
        .option("checkpointLocation", s"$base/ckpCat")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    def drainFmt(): Unit = {
      val q = spark.readStream.format("graft").load(s"$wh/ns/t17")
        .writeStream.format("parquet")
        .option("path", s"$base/sinkFmt")
        .option("checkpointLocation", s"$base/ckpFmt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    def rows(dir: String): Seq[(Long, Long, String)] =
      spark.read.parquet(dir)
        .selectExpr("id", "v", MetaCols.CommitTime)
        .as[(Long, Long, String)].collect().toSeq.sorted
    drainCat(); drainFmt()
    // the catalog stream IS the format stream: same rows, same meta cols
    assert(rows(s"$base/sinkCat") == rows(s"$base/sinkFmt"))
    assert(rows(s"$base/sinkCat").map(r => (r._1, r._2)) ==
      Seq((1L, 10L), (2L, 20L)))
    // restart from the SAME checkpoints after more commits: exactly-once
    // on both surfaces — only the new commit's rows are appended
    spark.sql(s"INSERT INTO $t VALUES (2,'b',99), (3,'a',30)")
    drainCat(); drainFmt()
    assert(rows(s"$base/sinkCat") == rows(s"$base/sinkFmt"))
    assert(rows(s"$base/sinkCat").map(r => (r._1, r._2)).sorted ==
      Seq((1L, 10L), (2L, 20L), (2L, 99L), (3L, 30L)))

    // writeStream.toTable onto a second catalog table: the V1 sink
    // fallback lands ordinary upsert commits (exactly-once replay gate)
    val s2 = freshTable("t18")
    spark.sql(s"""CREATE TABLE $s2 (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '2')""")
    val q2 = spark.readStream.table(t).select("id", "part", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpToTable")
      .trigger(Trigger.AvailableNow()).toTable(s2)
    q2.awaitTermination(120000)
    // table semantics: the upsert of id=2 resolves to its newest version
    assert(spark.sql(s"SELECT id, v FROM $s2 ORDER BY id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 99L), (3L, 30L)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("plan parity: configuring the catalog changes no existing plan") {
    conf()
    // representative existing surfaces, planned with the catalog
    // registered: V1 format read, programmatic snapshot, extension DML
    // target — their plans must be the same classes as always (catalog
    // code is additive; nothing intercepts non-catalog plans)
    val dir = Fixtures.cowDir(spark, sf0001)
    val viaFormat = spark.read.format("graft").load(dir)
    assert(viaFormat.queryExecution.optimizedPlan.collectLeaves()
      .forall(l => !l.toString.contains("GraftV1FallbackScan")))
    val viaApi = read.SnapshotReader.read(spark, dir)
    assert(viaApi.collect().length == viaFormat.collect().length)
  }

  test("LIMIT / TopN pushdown stays on the native scans (r11)") {
    conf()
    val t = freshTable("lim_nat")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part) TBLPROPERTIES (key 'id', buckets '4')""")
    spark.sql(s"INSERT INTO $t VALUES " +
      (1 to 40).map(i => s"($i, 'p${i % 3}', ${i * 10})").mkString(", "))
    // plain LIMIT: native delta-free scan with an early-stopping limit
    val ql = spark.sql(s"SELECT id, v FROM $t LIMIT 7")
    val pl = ql.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(pl.contains("GraftBatchScan") && pl.contains("limit=7"),
      s"native limit scan expected:\n$pl")
    assert(ql.collect().length == 7)
    // ORDER BY ... LIMIT: per-task top-n heap inside the native scan;
    // Spark's TakeOrderedAndProject above keeps exactness
    val qt = spark.sql(s"SELECT id, v FROM $t ORDER BY v DESC LIMIT 5")
    val pt = qt.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(pt.contains("GraftBatchScan") && pt.contains("top-n"),
      s"native top-n scan expected:\n$pt")
    assert(qt.as[(Long, Long)].collect().toSeq ==
      (40 to 36 by -1).map(i => (i.toLong, i * 10L)))
    // the sort column is NOT in the projection: still exact
    val qs = spark.sql(s"SELECT id FROM $t ORDER BY v ASC LIMIT 3")
    assert(qs.as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    assert(qs.queryExecution.executedPlan.collectLeaves()
      .exists(_.toString.contains("top-n")))
    // filtered TopN: predicate re-verified before the heap
    val qf = spark.sql(
      s"SELECT id FROM $t WHERE part = 'p1' ORDER BY v DESC LIMIT 2")
    assert(qf.as[Long].collect().toSeq == Seq(40L, 37L))
    // LIMIT on a delta-carrying MOR table: native MOR scan, post-merge
    val m = freshTable("lim_mor")
    spark.sql(s"""CREATE TABLE $m (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2', type 'mor')""")
    spark.sql(s"INSERT INTO $m VALUES (1,'a',10), (2,'b',20), (3,'a',30)")
    spark.sql(s"INSERT INTO $m VALUES (2,'b',25)") // delta
    val qm = spark.sql(s"SELECT id, v FROM $m LIMIT 2")
    assert(qm.queryExecution.executedPlan.collectLeaves()
      .exists(_.toString.contains("GraftMorBatchScan")),
      s"native MOR limit expected:\n${qm.queryExecution.executedPlan}")
    assert(qm.collect().length == 2)
    // a merged value must never leak a stale version through the limit
    val all = spark.sql(s"SELECT v FROM $m WHERE id = 2 LIMIT 1")
      .as[Long].collect().toSeq
    assert(all == Seq(25L), s"limit must see merged rows, got $all")
    // TopN on the MOR scan (r11): ranks by the MERGED values — the
    // delta's v=25 must place id=2 correctly, not its stale v=20
    val qmt = spark.sql(s"SELECT id, v FROM $m ORDER BY v DESC LIMIT 2")
    val pmt = qmt.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(pmt.contains("GraftMorBatchScan") && pmt.contains("top-n"),
      s"native MOR top-n expected:\n$pmt")
    assert(qmt.as[(Long, Long)].collect().toSeq ==
      Seq((3L, 30L), (2L, 25L)))
    // sort column outside the projection, with a filter, on MOR
    val qms = spark.sql(
      s"SELECT id FROM $m WHERE part = 'b' ORDER BY v ASC LIMIT 1")
    assert(qms.as[Long].collect().toSeq == Seq(2L))
  }

  test("native MOR batch scan ≡ V1 fallback: merge semantics through deltas (r11)") {
    conf()
    val t = freshTable("mor_nat")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '4', type 'mor')""")
    spark.sql(s"INSERT INTO $t VALUES " + // base files
      (1 to 40).map(i => s"($i, 'p${i % 3}', ${i * 10})").mkString(", "))
    val midTs = Timeline(spark.sessionState.newHadoopConf(),
      s"$wh/ns/mor_nat").completedInstants().last.ts
    spark.sql(s"INSERT INTO $t VALUES " + // delta upserts + new keys
      ((2 to 10 by 2).map(i => s"($i, 'p${i % 3}', ${i * 1000})") ++
        Seq("(41, 'p1', 410)", "(42, 'p2', 420)")).mkString(", "))
    spark.sql(s"DELETE FROM $t WHERE id IN (7, 13)") // delta delete markers
    spark.sql(s"INSERT INTO $t VALUES (7, 'p1', 777)") // resurrection
    def fallback(q: String) = {
      spark.conf.set("spark.graft.catalog.nativeScan", "false")
      try spark.sql(q).collect().toSeq
      finally spark.conf.unset("spark.graft.catalog.nativeScan")
    }
    for (q <- Seq(
      s"SELECT * FROM $t",
      s"SELECT id, v FROM $t WHERE part = 'p1' AND v > 100",
      s"SELECT ${MetaCols.CommitTime}, id FROM $t WHERE id <= 9",
      s"SELECT part, v FROM $t WHERE id % 4 = 1", // expression predicate
      s"SELECT v FROM $t WHERE id = 42", // bucket-pruned key lookup
      s"SELECT count(*) FROM $t", // agg declines to scan on deltas
      s"SELECT * FROM $t VERSION AS OF '$midTs'")) {
      val n = spark.sql(q)
      assert(n.collect().toSeq.toSet == fallback(q).toSet, s"mismatch: $q")
    }
    // deletes and resurrection resolved exactly
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 7").as[Long]
      .collect().toSeq == Seq(777L))
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 13").count() == 0)
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 4").as[Long]
      .collect().toSeq == Seq(4000L))
    // the default plan IS the native MOR scan while deltas are outstanding
    val plan = spark.sql(s"SELECT * FROM $t").queryExecution.executedPlan
    assert(plan.collectLeaves().exists(
      _.toString.contains("GraftMorBatchScan")),
      s"native MOR scan expected:\n$plan")
    // the pre-delta version has no deltas: the delta-free native scan
    val tt = spark.sql(s"SELECT * FROM $t VERSION AS OF '$midTs'")
    assert(tt.queryExecution.executedPlan.collectLeaves().exists(
      _.toString.contains("GraftBatchScan(")),
      s"delta-free time travel should use the plain native scan:\n" +
        s"${tt.queryExecution.executedPlan}")
  }

  test("native MOR scan: precombine event-time ordering parity (r11)") {
    conf()
    val t = freshTable("mor_pc")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT,
      pc BIGINT) PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2', type 'mor',
        precombine 'pc')""")
    spark.sql(s"INSERT INTO $t VALUES " +
      (1 to 10).map(i => s"($i, 'a', ${i * 10}, 100)").mkString(", "))
    // a STALE delta (pc 50 < 100) must not shadow the base row; a newer
    // one (pc 200) must win; a delete then re-insert resurrects
    spark.sql(s"INSERT INTO $t VALUES (2, 'a', 999, 50)")   // stale
    spark.sql(s"INSERT INTO $t VALUES (3, 'a', 333, 200)")  // newer
    spark.sql(s"DELETE FROM $t WHERE id = 4")
    spark.sql(s"INSERT INTO $t VALUES (4, 'a', 444, 60)")   // resurrect
    def fallback(q: String) = {
      spark.conf.set("spark.graft.catalog.nativeScan", "false")
      try spark.sql(q).collect().toSeq
      finally spark.conf.unset("spark.graft.catalog.nativeScan")
    }
    val q = s"SELECT id, v, pc FROM $t"
    assert(spark.sql(q).collect().toSeq.toSet == fallback(q).toSet)
    val got = spark.sql(s"SELECT id, v FROM $t WHERE id <= 4 ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 333L), (4L, 444L)),
      s"precombine merge mismatch: $got")
    assert(spark.sql(s"SELECT * FROM $t").queryExecution.executedPlan
      .collectLeaves().exists(_.toString.contains("GraftMorBatchScan")))
  }

  test("storage-partitioned join with OUTSTANDING deltas: zero Exchange (r11)") {
    conf()
    val t1 = freshTable("spjm1"); val t2 = freshTable("spjm2")
    for (t <- Seq(t1, t2))
      spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
        PARTITIONED BY (part)
        TBLPROPERTIES (key 'id', buckets '4', type 'mor')""")
    spark.sql(s"INSERT INTO $t1 VALUES " +
      (1 to 30).map(i => s"($i, 'p${i % 2}', $i)").mkString(", "))
    spark.sql(s"INSERT INTO $t2 VALUES " +
      (11 to 40).map(i => s"($i, 'q${i % 3}', ${i * 100})").mkString(", "))
    // outstanding deltas on BOTH sides
    spark.sql(s"INSERT INTO $t1 VALUES (12, 'p0', 1200)")
    spark.sql(s"INSERT INTO $t2 VALUES (12, 'q0', 120000)")
    spark.sql(s"DELETE FROM $t1 WHERE id = 15")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.sql(
        s"SELECT a.id, a.v, b.v FROM $t1 a JOIN $t2 b ON a.id = b.id")
      val expected = ((11 to 30).toSet - 15).toSeq.sorted.map { i =>
        (i.toLong,
          if (i == 12) 1200L else i.toLong,
          if (i == 12) 120000L else i * 100L)
      }
      assert(j.as[(Long, Long, Long)].collect().toSeq.sorted == expected)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SPJ through outstanding deltas must plan no shuffle:\n$plan")
      assert(plan.contains("GraftMorBatchScan"))
    } finally Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold").foreach(spark.conf.unset)
  }

  test("delta-tolerant metadata COUNT(*): exact fold from delta counters (r11)") {
    conf()
    val t = freshTable("cnt_mor")
    val path = s"$wh/ns/cnt_mor"
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2', type 'mor')""")
    spark.sql(s"INSERT INTO $t VALUES " + // base: 20 rows, parts p0/p1
      (1 to 20).map(i => s"($i, 'p${i % 2}', ${i * 10})").mkString(", "))
    // delta: 2 updates (no count change) + 2 new keys
    spark.sql(s"INSERT INTO $t VALUES (2,'p0',999), (4,'p0',888), " +
      "(21,'p1',210), (22,'p0',220)")
    // delta deletes: one base key, one delta-inserted key
    spark.sql(s"DELETE FROM $t WHERE id IN (5, 21)")
    // resurrection
    spark.sql(s"INSERT INTO $t VALUES (5, 'p1', 555)")
    // same-commit upsert+delete of a BRAND-NEW key: delete wins, net 0
    val w = new write.MorWriter(spark, path, numBuckets = 2)
    val probe = Seq((100L, "p0", 1L)).toDF("id", "part", "v")
    w.upsertDelta(Some(probe), Some(probe), col("id"), col("part"),
      write.FormatWriter.nextTs(w.timeline))
    // live truth from the merge (format surface, no metadata shortcuts)
    val truth = spark.read.format("graft").load(path).count()
    assert(truth == 21L) // 20 + 2 new - 2 del + 1 resurrect + 0
    val q = spark.sql(s"SELECT count(*) FROM $t")
    assert(q.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"),
      s"expected the metadata count on an outstanding-delta table:\n" +
        s"${q.queryExecution.executedPlan}")
    assert(q.as[Long].head == truth)
    assert(q.inputFiles.isEmpty, "metadata count must read zero files")
    // grouped by partition: matches the scan's GROUP BY exactly
    val g = spark.sql(
      s"SELECT part, count(*) AS n FROM $t GROUP BY part ORDER BY part")
    assert(g.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"), s"${g.queryExecution.executedPlan}")
    val viaScan = spark.read.format("graft").load(path)
      .groupBy("part").count().orderBy("part")
      .as[(String, Long)].collect().toSeq
    assert(g.as[(String, Long)].collect().toSeq == viaScan)
    // partition-only filter composes
    val f = spark.sql(s"SELECT count(*) FROM $t WHERE part = 'p1'")
    assert(f.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"))
    assert(f.as[Long].head == viaScan.toMap.apply("p1"))
    // extrema still DECLINE with outstanding deltas (merge-only facts)
    val m = spark.sql(s"SELECT max(v) FROM $t")
    assert(!m.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"))
    assert(m.as[Long].head == 999L)
    // a partition emptied by deletes emits NO group row (scan parity)
    val t2 = freshTable("cnt_mor_empty")
    spark.sql(s"""CREATE TABLE $t2 (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '1', type 'mor')""")
    spark.sql(s"INSERT INTO $t2 VALUES (1,'a',10), (2,'b',20)")
    spark.sql(s"DELETE FROM $t2 WHERE part = 'a'")
    val g2 = spark.sql(
      s"SELECT part, count(*) AS n FROM $t2 GROUP BY part")
    assert(g2.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"))
    assert(g2.as[(String, Long)].collect().toSeq == Seq(("b", 1L)))
  }

  test("append-only MOR deltas: full metadata aggregate fold (r11)") {
    conf()
    val t = freshTable("agg_mor_app")
    val path = s"$wh/ns/agg_mor_app"
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '2', type 'mor', stats 'v')""")
    spark.sql(s"INSERT INTO $t VALUES " + // base files
      (1 to 10).map(i => s"($i, 'p${i % 2}', ${i * 10})").mkString(", "))
    spark.sql(s"INSERT INTO $t VALUES " + // DELTA: exclusively new keys
      (11 to 20).map(i => s"($i, 'p${i % 2}', ${i * 10})").mkString(", "))
    val q = spark.sql(s"""SELECT part, count(*) AS n, count(v) AS nv,
      min(v) AS mn, max(v) AS mx, sum(v) AS sv FROM $t
      GROUP BY part ORDER BY part""")
    assert(q.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"),
      s"append-only deltas must keep the metadata fold:\n" +
        s"${q.queryExecution.executedPlan}")
    assert(q.inputFiles.isEmpty)
    val viaScan = spark.read.format("graft").load(path)
      .groupBy("part").agg(count(lit(1)).as("n"), count($"v").as("nv"),
        min($"v").as("mn"), max($"v").as("mx"), sum($"v").as("sv"))
      .orderBy("part").collect().toSeq
    assert(q.collect().toSeq == viaScan)
    // an UPDATE delta (existing key) breaks the union property: extrema
    // decline to the merge, COUNT(*) keeps folding from the counters
    spark.sql(s"INSERT INTO $t VALUES (5, 'p1', 999)")
    val m = spark.sql(s"SELECT max(v) FROM $t")
    assert(!m.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"))
    assert(m.as[Long].head == 999L)
    val c = spark.sql(s"SELECT count(*) FROM $t")
    assert(c.queryExecution.executedPlan.toString
      .contains("GraftMetaAggScan"))
    assert(c.as[Long].head == 20L)
  }

  test("plain-mode MOR scan byte-splits its CLEAN groups (r11)") {
    conf()
    val t = freshTable("mor_split")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES (key 'id', buckets '4', type 'mor')""")
    spark.sql(s"INSERT INTO $t SELECT id, concat('p', id % 3), id * 10 " +
      "FROM range(1, 2001)")
    spark.sql(s"INSERT INTO $t VALUES (7, 'p1', 777)") // ONE dirty group
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      val df = spark.sql(s"SELECT id, v FROM $t")
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec
            if b.scan.getClass.getSimpleName == "GraftMorBatchScan" =>
            b.scan
        }.get
      val parts = scan.toBatch.planInputPartitions()
      val nGroups = format.Timeline(spark.sessionState.newHadoopConf(),
        s"$wh/ns/mor_split").latestSlices(None).size
      // clean groups fan out into byte-range splits; the one dirty group
      // stays a whole-group merge task
      assert(parts.length > nGroups,
        s"expected byte splits to outnumber the $nGroups groups, " +
          s"got ${parts.length}")
      assert(parts.count(_.getClass.getSimpleName
        == "GraftMorGroupsPartition") == 1,
        "exactly one dirty-group merge task expected")
      // rows exact, merged value included, under the mixed plan
      spark.conf.set("spark.graft.catalog.nativeScan", "false")
      val ref = try spark.sql(s"SELECT id, v FROM $t").collect().toSet
        finally spark.conf.unset("spark.graft.catalog.nativeScan")
      assert(df.collect().toSet == ref)
      assert(spark.sql(s"SELECT v FROM $t WHERE id = 7")
        .as[Long].collect().toSeq == Seq(777L))
    } finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }

  test("randomized: native MOR scan and delta count-fold ≡ V1 fallback " +
      "under random op sequences (r11)") {
    conf()
    for (seed <- Seq(11L, 23L)) {
      val rnd = new scala.util.Random(seed)
      val t = freshTable(s"mor_fuzz_$seed")
      spark.sql(s"""CREATE TABLE $t (id BIGINT, part STRING, v BIGINT)
        PARTITIONED BY (part)
        TBLPROPERTIES (key 'id', buckets '3', type 'mor')""")
      var nextId = 31L
      val livePool = scala.collection.mutable.Set((1L to 30L): _*)
      spark.sql(s"INSERT INTO $t VALUES " + (1 to 30).map(i =>
        s"($i, 'p${rnd.nextInt(3)}', ${rnd.nextInt(1000)})")
        .mkString(", "))
      def fallback(q: String) = {
        spark.conf.set("spark.graft.catalog.nativeScan", "false")
        try spark.sql(q).collect().toSeq
        finally spark.conf.unset("spark.graft.catalog.nativeScan")
      }
      for (_ <- 1 to 6) {
        if (rnd.nextBoolean() || livePool.isEmpty) {
          // upsert: a mix of new ids and (maybe dead) existing ids
          val news = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1; livePool += id; id
          }
          val olds = rnd.shuffle((1L until nextId).toVector)
            .take(rnd.nextInt(3))
          olds.foreach(livePool += _) // resurrection is legal
          spark.sql(s"INSERT INTO $t VALUES " + (news ++ olds).map(i =>
            s"($i, 'p${rnd.nextInt(3)}', ${rnd.nextInt(1000)})")
            .mkString(", "))
        } else {
          val victims = rnd.shuffle(livePool.toSeq)
            .take(1 + rnd.nextInt(3))
          victims.foreach(livePool -= _)
          spark.sql(
            s"DELETE FROM $t WHERE id IN (${victims.mkString(",")})")
        }
        for (q <- Seq(s"SELECT * FROM $t",
          s"SELECT id, v FROM $t WHERE part = 'p1'")) {
          assert(spark.sql(q).collect().toSeq.toSet == fallback(q).toSet,
            s"seed=$seed mismatch: $q")
        }
        // the metadata count-fold must track the live set exactly
        val c = spark.sql(s"SELECT count(*) FROM $t")
        assert(c.queryExecution.executedPlan.toString
          .contains("GraftMetaAggScan"), s"seed=$seed count not folded")
        assert(c.as[Long].head == livePool.size.toLong,
          s"seed=$seed count ${c.as[Long].head} != ${livePool.size}")
      }
    }
  }

  test("a format-written table in the warehouse is immediately catalog-visible") {
    conf()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    val path = s"$wh/ns/t9"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    Seq((1L, "a", 5L)).toDF("id", "part", "v").write.format("graft")
      .option("key", "id").option("partition", "part")
      .option("buckets", "1").save(path)
    assert(spark.sql(s"SELECT id, v FROM $cat.ns.t9").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 5L)))
    spark.sql(s"INSERT INTO $cat.ns.t9 VALUES (2, 'b', 6)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t9").as[Long].head == 2L)
  }
}
