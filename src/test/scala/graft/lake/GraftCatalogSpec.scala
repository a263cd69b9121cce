package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[GraftCatalog]] — the DSv2 TableCatalog plugin
  * (`spark.sql.catalog.<name>=graft.lake.GraftCatalog`): DDL/DML/query
  * through multi-part identifiers, warehouse-file durability across
  * sessions, time travel via the loadTable overloads, and the pruning /
  * metadata-aggregate scan tiers reached through catalog resolution.
  */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._

  /** A session with THIS catalog under a fresh warehouse. newSession()
    * shares the SparkContext but gets its own conf + CatalogManager —
    * the honest in-JVM "fresh session" (plugin instances are per-session,
    * so durability below is carried by the warehouse files alone).
    */
  private def sessionWithCatalog(warehouse: String,
                                 cat: String = "gcat"): SparkSession = {
    val s = spark.newSession()
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    s
  }

  private def freshWarehouse(): String =
    Files.createTempDirectory("graft-cat-wh").toString

  test("CREATE NAMESPACE / CREATE TABLE / INSERT / SELECT / DELETE through multi-part identifiers") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (id BIGINT, s STRING, part STRING) " +
      "USING graft PARTITIONED BY (part)")
    // empty but schema-bearing from v0
    s.table("gcat.db.t").schema.fieldNames.toSeq shouldBe
      Seq("id", "s", "part")
    s.table("gcat.db.t").count() shouldBe 0L

    s.sql("INSERT INTO gcat.db.t VALUES (1, 'a', 'p1'), (2, 'b', 'p1'), " +
      "(3, 'c', 'p2')")
    s.sql("SELECT count(*) FROM gcat.db.t WHERE part = 'p1'")
      .head().getLong(0) shouldBe 2L

    // INSERT OVERWRITE = whole-table replace, one ACID commit
    s.sql("INSERT OVERWRITE gcat.db.t VALUES (9, 'z', 'p9')")
    s.table("gcat.db.t").select("id").as[Long].collect().toSeq shouldBe Seq(9L)

    s.sql("INSERT INTO gcat.db.t VALUES (10, 'y', 'p9'), (11, 'x', 'p0')")
    // DELETE FROM through SupportsDelete -> TxLog.delete (ACID rewrite)
    s.sql("DELETE FROM gcat.db.t WHERE id >= 10")
    s.table("gcat.db.t").select("id").as[Long].collect().toSeq shouldBe Seq(9L)

    // the data landed under the warehouse as a commit log (managed table)
    val root = s"${s.conf.get("spark.sql.catalog.gcat.warehouse")}/db/t"
    TxLog.readLatest(s, root).count() shouldBe 1L
  }

  test("SHOW NAMESPACES / SHOW TABLES / DROP reflect the warehouse; CTAS works") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db1")
    s.sql("CREATE NAMESPACE gcat.db2")
    s.sql("SHOW NAMESPACES IN gcat").as[String].collect().sorted.toSeq shouldBe
      Seq("db1", "db2")

    s.sql("CREATE TABLE gcat.db1.src (k INT, v STRING) USING graft")
    s.sql("INSERT INTO gcat.db1.src VALUES (1, 'a'), (2, 'b')")
    // CTAS: createTable + append through the same write builder
    s.sql("CREATE TABLE gcat.db1.ctas USING graft AS " +
      "SELECT k, upper(v) AS v FROM gcat.db1.src")
    s.sql("SELECT v FROM gcat.db1.ctas ORDER BY k").as[String]
      .collect().toSeq shouldBe Seq("A", "B")

    s.sql("SHOW TABLES IN gcat.db1").select("tableName").as[String]
      .collect().sorted.toSeq shouldBe Seq("ctas", "src")
    s.sql("DROP TABLE gcat.db1.ctas")
    s.sql("SHOW TABLES IN gcat.db1").count() shouldBe 1L
    intercept[Exception](s.sql("SELECT * FROM gcat.db1.ctas").collect())

    // non-empty namespace refuses a bare drop; cascade removes it
    intercept[Exception](s.sql("DROP NAMESPACE gcat.db1"))
    s.sql("DROP NAMESPACE gcat.db1 CASCADE")
    s.sql("SHOW NAMESPACES IN gcat").as[String].collect().toSeq shouldBe
      Seq("db2")
  }

  test("durability: a table created in one session is served to a fresh session by the warehouse alone") {
    val wh = freshWarehouse()
    val a = sessionWithCatalog(wh)
    a.sql("CREATE NAMESPACE gcat.shared")
    a.sql("CREATE TABLE gcat.shared.t (id BIGINT, v DOUBLE) USING graft")
    a.sql("INSERT INTO gcat.shared.t VALUES (1, 1.5), (2, 2.5)")

    // a FRESH session (own CatalogManager, own plugin instance): the only
    // shared state is the warehouse directory
    val b = sessionWithCatalog(wh)
    b.sql("SELECT sum(v) FROM gcat.shared.t").head().getDouble(0) shouldBe 4.0
    b.sql("INSERT INTO gcat.shared.t VALUES (3, 3.0)")
    a.sql("SELECT count(*) FROM gcat.shared.t").head().getLong(0) shouldBe 3L
  }

  test("VERSION AS OF / TIMESTAMP AS OF time-travel through catalog identifiers") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.tt")
    s.sql("CREATE TABLE gcat.tt.t (id BIGINT) USING graft") // v0 (empty)
    s.sql("INSERT INTO gcat.tt.t VALUES (1)")               // v1
    s.sql("INSERT INTO gcat.tt.t VALUES (2)")               // v2
    s.sql("SELECT count(*) FROM gcat.tt.t VERSION AS OF 1")
      .head().getLong(0) shouldBe 1L
    s.sql("SELECT count(*) FROM gcat.tt.t VERSION AS OF 2")
      .head().getLong(0) shouldBe 2L
    // timestamp AS OF: resolve v1's commit time from the log, query at it
    val root = s"${s.conf.get("spark.sql.catalog.gcat.warehouse")}/tt/t"
    val tsV1 = TxLog.historySummary(s, root)
      .find(_._1 == 1L).map(_._3).get
    val lit = new java.sql.Timestamp(tsV1).toString
    s.sql(s"SELECT count(*) FROM gcat.tt.t TIMESTAMP AS OF '$lit'")
      .head().getLong(0) shouldBe 1L
  }

  test("UPDATE and MERGE address catalog tables through TxLogSql with no register() call") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.dml")
    s.sql("CREATE TABLE gcat.dml.t (k BIGINT, v STRING) USING graft")
    s.sql("INSERT INTO gcat.dml.t VALUES (1, 'a'), (2, 'b')")

    TxLogSql.run(s, "UPDATE gcat.dml.t SET v = 'B' WHERE k = 2")
    s.sql("SELECT v FROM gcat.dml.t ORDER BY k").as[String]
      .collect().toSeq shouldBe Seq("a", "B")

    // the MERGE source view must live in s (temp views are per-session)
    s.createDataFrame(Seq((2L, "bb"), (3L, "c"))).toDF("k", "v")
      .createOrReplaceTempView("ups_s")
    TxLogSql.run(s,
      """MERGE INTO gcat.dml.t t USING ups_s s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql("SELECT v FROM gcat.dml.t ORDER BY k").as[String]
      .collect().toSeq shouldBe Seq("a", "bb", "c")

    // DELETE through run() resolves the catalog identifier the same way
    TxLogSql.run(s, "DELETE FROM gcat.dml.t WHERE k = 1")
    s.sql("SELECT count(*) FROM gcat.dml.t").head().getLong(0) shouldBe 2L
  }

  test("external LOCATION adopts an existing commit log; DROP leaves its data") {
    val s = sessionWithCatalog(freshWarehouse())
    val ext = Files.createTempDirectory("graft-cat-ext").toString
    (1 to 3).foreach(i => TxLog.append(s,
      Seq((i.toLong, s"v$i")).toDF("id", "v"), ext))
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.ext (id BIGINT, v STRING) USING graft " +
      s"LOCATION '$ext'")
    s.sql("SELECT count(*) FROM gcat.db.ext").head().getLong(0) shouldBe 3L
    s.sql("INSERT INTO gcat.db.ext VALUES (4, 'v4')")
    TxLog.readLatest(s, ext).count() shouldBe 4L
    s.sql("DROP TABLE gcat.db.ext")
    // the external data survives the catalog drop
    TxLog.readLatest(s, ext).count() shouldBe 4L
  }

  test("ALTER TABLE: ADD COLUMNS / RENAME COLUMN / SET TBLPROPERTIES / RENAME TABLE") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (id BIGINT) USING graft")
    s.sql("INSERT INTO gcat.db.t VALUES (1)")
    s.sql("ALTER TABLE gcat.db.t ADD COLUMNS (v STRING)")
    s.table("gcat.db.t").schema.fieldNames.toSeq shouldBe Seq("id", "v")
    s.sql("ALTER TABLE gcat.db.t RENAME COLUMN v TO w")
    s.table("gcat.db.t").schema.fieldNames.toSeq shouldBe Seq("id", "w")
    s.sql("ALTER TABLE gcat.db.t SET TBLPROPERTIES ('owner.team' = 'data')")
    // the new name resolves WITHIN the catalog (Spark's RENAME contract)
    s.sql("ALTER TABLE gcat.db.t RENAME TO db.t2")
    s.sql("SELECT id FROM gcat.db.t2").as[Long].collect().toSeq shouldBe Seq(1L)
    intercept[Exception](s.sql("SELECT * FROM gcat.db.t").collect())
  }

  test("scoped overwrites through the catalog replace ONLY their scope, atomically") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (id BIGINT, part STRING) USING graft " +
      "PARTITIONED BY (part)")
    s.sql("INSERT INTO gcat.db.t VALUES (1, 'p1'), (2, 'p1'), (3, 'p2')")
    val root = s"${s.conf.get("spark.sql.catalog.gcat.warehouse")}/db/t"
    val vBefore = TxLog.currentVersion(s, root).get

    // native SQL scoped replace: REPLACE WHERE plans OverwriteByExpression
    // whose predicate the write builder routes to the commit log's
    // partition-scoped replace — p1 rewritten, p2 untouched, ONE commit
    s.sql("INSERT INTO gcat.db.t REPLACE WHERE part = 'p1' " +
      "SELECT 9, 'p1'")
    s.sql("SELECT id FROM gcat.db.t ORDER BY id").as[Long]
      .collect().toSeq shouldBe Seq(3L, 9L)
    TxLog.currentVersion(s, root).get shouldBe vBefore + 1
    TxLog.history(s, root).last.operation shouldBe "overwrite_partitions"

    // DataFrameWriterV2: df.writeTo(t).overwrite(cond), same routing
    s.createDataFrame(Seq((8L, "p2"))).toDF("id", "part")
      .writeTo("gcat.db.t").overwrite(col("part") === "p2")
    s.sql("SELECT id FROM gcat.db.t ORDER BY id").as[Long]
      .collect().toSeq shouldBe Seq(8L, 9L)

    // the Hive INSERT OVERWRITE ... PARTITION spelling through PLAIN
    // spark.sql: the static value arrives as `part <=> 'p2'`, which the
    // write builder routes to the SAME metadata-scoped atomic replace —
    // one commit, no data read, p1 untouched
    s.sql("INSERT OVERWRITE gcat.db.t PARTITION (part = 'p2') SELECT 10")
    s.sql("SELECT id FROM gcat.db.t ORDER BY id").as[Long]
      .collect().toSeq shouldBe Seq(9L, 10L)
    TxLog.history(s, root).last.operation shouldBe "overwrite_partitions"

    // a row escaping the REPLACE WHERE scope is refused, not replaced in
    intercept[Exception](s.sql(
      "INSERT INTO gcat.db.t REPLACE WHERE part = 'p1' SELECT 11, 'p9'"))

    // unscoped INSERT OVERWRITE still replaces the whole table
    s.sql("INSERT OVERWRITE gcat.db.t VALUES (7, 'p7')")
    s.sql("SELECT id FROM gcat.db.t").as[Long].collect().toSeq shouldBe Seq(7L)
  }

  test("INSERT OVERWRITE under partitionOverwriteMode=dynamic replaces only the written partitions") {
    val s = sessionWithCatalog(freshWarehouse())
    graft.plans.GraftExtensions.register(s) // the strategy executes it
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (id BIGINT, part STRING) USING graft " +
      "PARTITIONED BY (part)")
    s.sql("INSERT INTO gcat.db.t VALUES (1, 'p1'), (2, 'p1'), (3, 'p2'), " +
      "(4, 'p3')")
    val root = s"${s.conf.get("spark.sql.catalog.gcat.warehouse")}/db/t"
    val vBefore = TxLog.currentVersion(s, root).get
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the batch touches p1 and p2: exactly those are replaced, p3
      // survives — ONE snapshot-atomic commit (Spark's default static
      // mode would truncate the whole table first)
      s.sql("INSERT OVERWRITE gcat.db.t VALUES (10, 'p1'), (30, 'p2')")
      s.sql("SELECT id, part FROM gcat.db.t ORDER BY id")
        .as[(Long, String)].collect().toSeq shouldBe
        Seq((4L, "p3"), (10L, "p1"), (30L, "p2"))
      TxLog.currentVersion(s, root).get shouldBe vBefore + 1
      TxLog.history(s, root).last.operation shouldBe "upsert"
      // the dynamic-partition column spelling routes the same way
      s.sql("INSERT OVERWRITE gcat.db.t PARTITION (part) SELECT 40, 'p3'")
      s.sql("SELECT id FROM gcat.db.t ORDER BY id").as[Long]
        .collect().toSeq shouldBe Seq(10L, 30L, 40L)
      // dynamic mode on an UNPARTITIONED table: the one implicit
      // partition is the table — whole-table replace, Spark's semantics
      s.sql("CREATE TABLE gcat.db.u (id BIGINT) USING graft")
      s.sql("INSERT INTO gcat.db.u VALUES (1), (2)")
      s.sql("INSERT OVERWRITE gcat.db.u VALUES (9)")
      s.sql("SELECT id FROM gcat.db.u").as[Long]
        .collect().toSeq shouldBe Seq(9L)
    } finally s.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("dynamic overwrite WITHOUT the extensions fails with the actionable error, not a generic one") {
    val s = sessionWithCatalog(freshWarehouse()) // catalog only, no strategy
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (id BIGINT, part STRING) USING graft " +
      "PARTITIONED BY (part)")
    s.sql("INSERT INTO gcat.db.t VALUES (1, 'p1')")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception](
        s.sql("INSERT OVERWRITE gcat.db.t VALUES (2, 'p2')"))
      e.getMessage should include("GraftExtensions")
    } finally s.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("spark.readStream.table on a catalog table streams its change feed") {
    // analyzer rules bind at session BUILD: this needs a session built
    // with the extensions (spark.sql.extensions on a cluster; the
    // graftnative constructor here, since runtime register() can only
    // add functions and planner strategies)
    val s = org.apache.spark.sql.graftnative
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val wh = freshWarehouse()
    s.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (id BIGINT, v STRING) USING graft")
    s.sql("INSERT INTO gcat.db.t VALUES (1, 'a'), (2, 'b')")
    s.sql("INSERT INTO gcat.db.t VALUES (3, 'c')")
    val q = s.readStream.table("gcat.db.t")
      .filter(col("_change_type") === "insert")
      .select("id", "v")
      .writeStream.format("memory").queryName("gcat_feed")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true
    s.table("gcat_feed").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (2L, "b"), (3L, "c"))
    // a time-travel-pinned identifier keeps Spark's own loud refusal
    intercept[Exception] {
      s.readStream.table("gcat.db.t VERSION AS OF 1")
        .writeStream.format("memory").queryName("gcat_pinned")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    // reader OPTIONS flow through the bridge to the change-feed source:
    // startingVersion (exclusive lower bound) skips the seed commits...
    val q2 = s.readStream.option("startingVersion", "1").table("gcat.db.t")
      .filter(col("_change_type") === "insert").select("id", "v")
      .writeStream.format("memory").queryName("gcat_feed_v")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000) shouldBe true
    s.table("gcat_feed_v").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq shouldBe Seq((3L, "c"))
    // ...and startingTimestamp (at-or-after the instant) bounds the same
    // drain by wall clock, resolved against the table's own history
    val root = s"$wh/db/t"
    val v2Ts = TxLog.historySummary(s, root)
      .find(_._1 == 2L).get._3
    val q3 = s.readStream.option("startingTimestamp", v2Ts.toString)
      .table("gcat.db.t")
      .filter(col("_change_type") === "insert").select("id", "v")
      .writeStream.format("memory").queryName("gcat_feed_ts")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q3.awaitTermination(120000) shouldBe true
    s.table("gcat_feed_ts").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq shouldBe Seq((3L, "c"))
    // the option pair stays mutually exclusive through the bridge
    intercept[Exception] {
      s.readStream.option("startingVersion", "1")
        .option("startingTimestamp", v2Ts.toString).table("gcat.db.t")
        .writeStream.format("memory").queryName("gcat_feed_both")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
  }

  test("descriptor keys are reserved; non-empty DROP NAMESPACE raises Spark's catalog error type") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db")
    // a user property literally named 'partitionCols' would overwrite
    // the durable marker's real partition layout — rejected at CREATE
    val e1 = intercept[Exception](s.sql("CREATE TABLE gcat.db.bad " +
      "(id BIGINT) USING graft TBLPROPERTIES ('partitionCols' = 'id')"))
    e1.getMessage should include("reserved")
    s.sql("CREATE TABLE gcat.db.t (id BIGINT, part STRING) USING graft " +
      "PARTITIONED BY (part)")
    // ... and at SET TBLPROPERTIES
    val e2 = intercept[Exception](s.sql(
      "ALTER TABLE gcat.db.t SET TBLPROPERTIES ('partitionCols' = 'id')"))
    e2.getMessage should include("reserved")
    // the rejected statements corrupted nothing: the layout still reads
    s.sql("INSERT INTO gcat.db.t VALUES (1, 'p1')")
    s.sql("SELECT part FROM gcat.db.t").as[String]
      .collect().toSeq shouldBe Seq("p1")
    // throwing Spark's NonEmptyNamespaceException (not a bare
    // IllegalStateException) lets DropNamespaceExec translate it into
    // the standard SCHEMA_NOT_EMPTY error-class AnalysisException —
    // the contract SQL clients and error handlers match on
    val e3 = intercept[org.apache.spark.sql.AnalysisException](
      s.sql("DROP NAMESPACE gcat.db"))
    e3.getCondition shouldBe "SCHEMA_NOT_EMPTY"
  }

  test("maintenance statements address catalog tables: DESCRIBE HISTORY / DETAIL via TxLogSql.run") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (id BIGINT) USING graft")
    s.sql("INSERT INTO gcat.db.t VALUES (1), (2)")
    val hist = TxLogSql.run(s, "DESCRIBE HISTORY gcat.db.t")
    hist.select("version").as[Long].collect().sorted.toSeq shouldBe Seq(0L, 1L)
    hist.select("operation").as[String].collect().toSet shouldBe
      Set("append")
    val detail = TxLogSql.run(s, "DESCRIBE DETAIL gcat.db.t")
    detail.select("num_files").as[Long].head() should be >= 1L
  }

  test("native spark.sql UPDATE / MERGE / DELETE via the injected DML strategy") {
    val s = sessionWithCatalog(freshWarehouse())
    graft.plans.GraftExtensions.register(s) // extraStrategies, runtime twin
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (k BIGINT, v STRING) USING graft")
    s.sql("INSERT INTO gcat.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")

    // UPDATE with an expression SET and predicate — plain spark.sql, no
    // TxLogSql spelling, no registration
    s.sql("UPDATE gcat.db.t SET v = upper(v) WHERE k >= 2")
    s.sql("SELECT v FROM gcat.db.t ORDER BY k").as[String]
      .collect().toSeq shouldBe Seq("a", "B", "C")

    // MERGE: whole-row upsert by key through the same strategy
    s.createDataFrame(Seq((3L, "cc"), (4L, "d"))).toDF("k", "v")
      .createOrReplaceTempView("m_src")
    s.sql("""MERGE INTO gcat.db.t t USING m_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql("SELECT v FROM gcat.db.t ORDER BY k").as[String]
      .collect().toSeq shouldBe Seq("a", "B", "cc", "d")

    // DELETE with a predicate SupportsDelete cannot translate (modulo):
    // the strategy preempts the connector path and runs TxLog.delete
    s.sql("DELETE FROM gcat.db.t WHERE k % 2 = 0")
    s.sql("SELECT k FROM gcat.db.t ORDER BY k").as[Long]
      .collect().toSeq shouldBe Seq(1L, 3L)

    // a subquery predicate cannot re-bind against the snapshot frame —
    // refused loudly, never mis-evaluated
    intercept[Exception](s.sql(
      "UPDATE gcat.db.t SET v = 'x' WHERE k IN (SELECT k FROM m_src)"))

    // vector mode rides the same conf as the TxLogSql path
    s.conf.set("spark.graft.update.mode", "vector")
    try {
      s.sql("UPDATE gcat.db.t SET v = 'z' WHERE k = 1")
      s.sql("SELECT v FROM gcat.db.t WHERE k = 1").as[String]
        .head() shouldBe "z"
    } finally s.conf.unset("spark.graft.update.mode")
  }

  test("a multi-property SET TBLPROPERTIES persists every property; a graft.statsCols property makes catalog writes stats-bearing") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (k BIGINT, v STRING) USING graft " +
      "TBLPROPERTIES ('graft.statsCols' = 'k')")
    // one ALTER, several changes: all must land (folded, one marker write)
    s.sql("ALTER TABLE gcat.db.t SET TBLPROPERTIES ('a' = '1', 'b' = '2')")
    val props = s.sql("SHOW TBLPROPERTIES gcat.db.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    props.get("a") shouldBe Some("1")
    props.get("b") shouldBe Some("2")
    props.get("graft.statsCols") shouldBe Some("k")

    // statsCols flow into catalog-authored writes: the metadata
    // aggregate tier engages with NO externally-written log
    s.sql("INSERT INTO gcat.db.t VALUES (1, 'x'), (9, 'y')")
    GraftDataSource.lastAggPushdown = None
    val row = s.sql("SELECT count(*), min(k), max(k) FROM gcat.db.t").head()
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe (2L, 1L, 9L)
    GraftDataSource.lastAggPushdown shouldBe
      Some("COUNT(*), MIN(k), MAX(k)")
  }

  test("a missing table under a REAL graft catalog fails loudly — never retargets a same-named session registration") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db")
    // a bare-name registration that a silent fallback would have hit
    val decoy = java.nio.file.Files.createTempDirectory("graft-decoy").toString
    s.createDataFrame(Seq((1L, "keep"))).toDF("k", "v")
      .write.format("graft").save(decoy)
    TxLogSql.register(s, "t", decoy)
    val e = intercept[IllegalArgumentException](
      TxLogSql.run(s, "DELETE FROM gcat.db.t WHERE k = 1"))
    e.getMessage should include("does not exist in graft catalog")
    TxLog.readLatest(s, decoy).count() shouldBe 1L // untouched
  }

  test("MERGE through the strategy survives type coercion on the key and star columns") {
    val s = sessionWithCatalog(freshWarehouse())
    graft.plans.GraftExtensions.register(s)
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (k BIGINT, v STRING) USING graft")
    s.sql("INSERT INTO gcat.db.t VALUES (1, 'a'), (2, 'b')")
    // INT source key/values onto a BIGINT target: the analyzer wraps the
    // source columns in casts when expanding SET * / INSERT * — still
    // the user's literal star merge, must be accepted
    s.createDataFrame(Seq((2, "bb"), (3, "c"))).toDF("k", "v")
      .createOrReplaceTempView("m_int_src")
    s.sql("""MERGE INTO gcat.db.t t USING m_int_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql("SELECT v FROM gcat.db.t ORDER BY k").as[String]
      .collect().toSeq shouldBe Seq("a", "bb", "c")
  }

  test("concurrent INSERTs through the catalog surface race correctly: contiguous versions, no lost rows") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db")
    s.sql("CREATE TABLE gcat.db.t (w STRING, seq BIGINT) USING graft")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        try (0 until 3).foreach { seq =>
          s.sql(s"INSERT INTO gcat.db.t VALUES ('w$w', $seq)")
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    errs.isEmpty shouldBe true
    val root = s"${s.conf.get("spark.sql.catalog.gcat.warehouse")}/db/t"
    // v0 (create) + 12 inserts, a contiguous chain — catalog resolution
    // adds no second commit arbiter to drift from the log's own
    TxLog.history(s, root).map(_.version) shouldBe (0L to 12L)
    s.sql("SELECT count(*) FROM gcat.db.t").head().getLong(0) shouldBe 12L
    s.createDataFrame((0 until 4).flatMap(w => (0 until 3)
      .map(seq => (s"w$w", seq.toLong)))).toDF("w", "seq")
      .except(s.table("gcat.db.t")).count() shouldBe 0L
  }

  test("catalog reads reach the pruning and metadata-aggregate tiers") {
    val s = sessionWithCatalog(freshWarehouse())
    s.sql("CREATE NAMESPACE gcat.db")
    val root = s"${s.conf.get("spark.sql.catalog.gcat.warehouse")}/db/clustered"
    (0 until 4).foreach { c =>
      TxLog.append(s,
        (0 until 10).map(i => (c * 10L + i, s"s$c-$i")).toDF("id", "s")
          .repartition(1), root, statsCols = Seq("id"))
    }
    s.sql("CREATE TABLE gcat.db.clustered (id BIGINT, s STRING) " +
      s"USING graft LOCATION '$root'")

    // stats-tier FILE pruning through a catalog-resolved scan
    TxLog.lastStatsPrune = None
    s.sql("SELECT id FROM gcat.db.clustered WHERE id >= 21 AND id < 25 " +
      "ORDER BY id").as[Long].collect().toSeq shouldBe (21L to 24L)
    TxLog.lastStatsPrune shouldBe Some((1, 4))

    // metadata-only aggregates: COUNT/MIN/MAX answered with zero tasks
    GraftDataSource.lastAggPushdown = None
    val row = s.sql(
      "SELECT count(*), min(id), max(id) FROM gcat.db.clustered").head()
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe (40L, 0L, 39L)
    GraftDataSource.lastAggPushdown shouldBe
      Some("COUNT(*), MIN(id), MAX(id)")
  }
}
