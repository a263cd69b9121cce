package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scoped overwrites: [[TxLog.replacePartitions]] (static partition
  * overwrite, metadata-only scope) and [[TxLog.replaceWhere]] (Delta's
  * predicate-scoped overwrite), plus their SQL form
  * `INSERT [OVERWRITE|INTO] t PARTITION (p = 'v')`.
  */
class TxLogReplaceSpec extends SparkSpec {

  import spark.implicits._

  private def seeded(): String = {
    val root = Files.createTempDirectory("graft-repl").toString
    TxLog.append(spark,
      Seq((1L, 10.0, "p1"), (2L, 20.0, "p1"), (3L, 30.0, "p2"),
        (4L, 40.0, "p3")).toDF("id", "bal", "part"),
      root, Seq("part"))
    root
  }

  test("replacePartitions swaps only the scoped partition in one commit") {
    val root = seeded()
    val v = TxLog.replacePartitions(spark,
      Seq((9L, 99.0, "p1")).toDF("id", "bal", "part"),
      root, Map("part" -> "p1"))
    v shouldBe 1L
    TxLog.readLatest(spark, root).orderBy("id")
      .as[(Long, Double, String)].collect().toSeq shouldBe Seq(
      (3L, 30.0, "p2"), (4L, 40.0, "p3"), (9L, 99.0, "p1"))
  }

  test("replacePartitions refuses a batch writing outside its scope") {
    val root = seeded()
    val vBefore = TxLog.latestVersion(spark, root).get
    val e = intercept[IllegalArgumentException] {
      TxLog.replacePartitions(spark,
        Seq((9L, 99.0, "p1"), (10L, 1.0, "p2")).toDF("id", "bal", "part"),
        root, Map("part" -> "p1"))
    }
    e.getMessage should include("outside its scope")
    TxLog.latestVersion(spark, root).get shouldBe vBefore
    TxLog.readLatest(spark, root).count() shouldBe 4L
    TxLog.cleanOrphans(spark, root, olderThanMs = 0L) shouldBe empty
  }

  test("replacePartitions validates filter keys against partition columns") {
    val root = seeded()
    intercept[IllegalArgumentException] {
      TxLog.replacePartitions(spark,
        Seq((9L, 99.0, "p1")).toDF("id", "bal", "part"),
        root, Map("bal" -> "10.0"))
    }
    intercept[IllegalArgumentException] {
      TxLog.replacePartitions(spark,
        Seq((9L, 99.0, "p1")).toDF("id", "bal", "part"),
        root, Map.empty[String, String])
    }
  }

  test("replaceWhere deletes the matching rows, keeps survivors, inserts the batch") {
    val root = seeded()
    // scope: bal >= 20 inside p1+p2 — p1's file is PARTIALLY matched
    // (id=2 goes, id=1 survives), p2 fully matched, p3 untouched
    val v = TxLog.replaceWhere(spark,
      Seq((8L, 25.0, "p1")).toDF("id", "bal", "part"),
      root, col("bal") >= 20 && col("part").isin("p1", "p2"))
    v shouldBe 1L
    TxLog.readLatest(spark, root).orderBy("id")
      .as[(Long, Double, String)].collect().toSeq shouldBe Seq(
      (1L, 10.0, "p1"), (4L, 40.0, "p3"), (8L, 25.0, "p1"))
  }

  test("replaceWhere refuses batch rows that do not satisfy the condition") {
    val root = seeded()
    val e = intercept[IllegalArgumentException] {
      TxLog.replaceWhere(spark,
        Seq((8L, 5.0, "p1")).toDF("id", "bal", "part"),
        root, col("bal") >= 20)
    }
    e.getMessage should include("not satisfying the scope")
    TxLog.readLatest(spark, root).count() shouldBe 4L
  }

  test("replaceWhere enforces CHECK constraints on the incoming batch") {
    val root = seeded()
    TxLog.addConstraint(spark, root, "bal_cap", "bal <= 1000")
    intercept[IllegalStateException] {
      TxLog.replaceWhere(spark,
        Seq((8L, 5000.0, "p1")).toDF("id", "bal", "part"),
        root, col("part") === "p1")
    }
    TxLog.readLatest(spark, root).count() shouldBe 4L
  }

  test("a zero-match replaceWhere with a narrower batch never narrows the table schema") {
    val root = seeded()
    TxLog.replaceWhere(spark,
      Seq((50L, "zz")).toDF("id", "part"),
      root, col("part") === "zz")
    val out = TxLog.readLatest(spark, root)
    out.columns.toSet shouldBe Set("id", "bal", "part")
    out.count() shouldBe 5L
    // existing rows keep their bal; the new row reads NULL for it
    out.filter(col("id") === 1L).head().getDouble(
      out.columns.indexOf("bal")) shouldBe 10.0
    out.filter(col("id") === 50L).head().isNullAt(
      out.columns.indexOf("bal")) shouldBe true
  }

  test("replacePartitions matches partition values containing escaped characters") {
    val root = Files.createTempDirectory("graft-repl-esc").toString
    // ':' is Hive-path-escaped to %3A in the directory name; the filter
    // takes the RAW value and must still match (scope check and removal)
    TxLog.append(spark,
      Seq((1L, "2024-01-01 00:00:00"), (2L, "plain"))
        .toDF("id", "part"), root, Seq("part"))
    TxLog.replacePartitions(spark,
      Seq((9L, "2024-01-01 00:00:00")).toDF("id", "part"),
      root, Map("part" -> "2024-01-01 00:00:00"))
    TxLog.readLatest(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq shouldBe Seq(
      (2L, "plain"), (9L, "2024-01-01 00:00:00"))
  }

  test("SQL INSERT OVERWRITE PARTITION replaces only the named partition") {
    val root = seeded()
    TxLogSql.register(spark, "repl_sql", root, partitionCols = Seq("part"))
    TxLogSql.run(spark,
      "INSERT OVERWRITE repl_sql PARTITION (part = 'p1') VALUES (9, 99.0)")
    spark.sql("SELECT id, bal, part FROM repl_sql ORDER BY id")
      .as[(Long, Double, String)].collect().toSeq shouldBe Seq(
      (3L, 30.0, "p2"), (4L, 40.0, "p3"), (9L, 99.0, "p1"))
    // INSERT INTO with a static partition constant appends into it
    TxLogSql.run(spark,
      "INSERT INTO repl_sql PARTITION (part = 'p2') VALUES (10, 1.5)")
    spark.sql("SELECT count(*) FROM repl_sql WHERE part = 'p2'")
      .head().getLong(0) shouldBe 2L
  }

  test("SQL PARTITION misuse fails loudly") {
    val root = seeded()
    TxLogSql.register(spark, "repl_bad", root, partitionCols = Seq("part"))
    // dynamic (value-less) partition column
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        "INSERT OVERWRITE repl_bad PARTITION (part) VALUES (9, 9.0, 'p1')")
    }
    // not a partition column
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        "INSERT OVERWRITE repl_bad PARTITION (bal = '9') VALUES (9, 'p1')")
    }
    // SELECT must omit the static column
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        "INSERT OVERWRITE repl_bad PARTITION (part = 'p1') " +
          "SELECT id, bal, part FROM repl_bad")
    }
    TxLog.readLatest(spark, root).count() shouldBe 4L
  }
}
