package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end EP-3 promote pipeline + catalog evolution
  * (SURVEY.md §3 EP-1/EP-3; reference utils.py:147-172,
  * staging_to_curated.py:82-175).
  */
class PromoteSpec extends SparkSpec {

  import spark.implicits._

  private def tmpZones(): Zones =
    Zones(Files.createTempDirectory("graft-lake").toString)

  test("enrich adds processed_at/year/month from a pinned timestamp") {
    val df = Seq(("a", 1)).toDF("k", "v")
    val out = Enrich.withAuditColumns(df, to_timestamp(lit("2026-03-15 10:30:00")))
    val r = out.head()
    r.getAs[String]("processed_at") shouldBe "2026-03-15 10:30:00"
    r.getAs[String]("processed_year") shouldBe "2026"
    // %m month — NOT the reference's %M minutes bug (SURVEY §8)
    r.getAs[String]("processed_month") shouldBe "03"
  }

  test("promote: staging JSON -> curated partitioned parquet, all-string, audit cols") {
    val zones = tmpZones()
    val records = Seq(
      """{"po":"P-1","detail":{"status":"OK","qty":3}}""",
      """{"po":"P-2","detail":{"status":"LATE","qty":9}}""").toDF("value")
    // stage as raw JSON lines (one object per line, like the reference's
    // to_json(orient=records) output)
    records.select(col("value")).write.mode("append")
      .text(zones.stagingIncremental("po_status"))

    val res = Promote.promote(spark, zones, "po_status",
      asOf = to_timestamp(lit("2026-03-15 10:30:00"))).get
    res.rows shouldBe 2L

    val back = Writer.readCurated(spark, res.curatedPath)
    back.columns.sorted.toSeq shouldBe
      Seq("detail_qty", "detail_status", "po", "processed_at", "processed_month", "processed_year")
    back.schema.fields.forall(_.dataType.typeName == "string") shouldBe true
    // Hive-style partition dirs exist
    val partDir = new java.io.File(s"${res.curatedPath}/processed_year=2026/processed_month=03")
    partDir.isDirectory shouldBe true
    back.where(col("po") === "P-1").head().getAs[String]("detail_qty") shouldBe "3"

    // A SECOND incremental promote must report only ITS batch's rows, not
    // a whole-table read-back count (1 new staged row -> rows == 1, even
    // though the table now holds 3).
    Writer.truncateStaging(spark, zones, "po_status")
    Seq("""{"po":"P-3","detail":{"status":"OK","qty":1}}""").toDF("value")
      .write.mode("append").text(zones.stagingIncremental("po_status"))
    val res2 = Promote.promote(spark, zones, "po_status",
      asOf = to_timestamp(lit("2026-04-02 08:00:00"))).get
    res2.rows shouldBe 1L
    spark.read.parquet(res2.curatedPath).count() shouldBe 3L
  }

  test("promote with expectations: violating rows are dropped and counted, survivors promote") {
    val zones = tmpZones()
    Seq(
      """{"po":"P-1","amount":"10"}""",
      """{"po":"","amount":"20"}""",
      """{"po":"P-3","amount":"-5"}""").toDF("value")
      .write.mode("append").text(zones.stagingIncremental("po_gate"))

    val res = Promote.promote(spark, zones, "po_gate",
      asOf = to_timestamp(lit("2026-03-15 10:30:00")),
      expectations = Seq(
        Expect.Expectation("po_present", col("po") =!= ""),
        Expect.Expectation("amount_nonneg", col("amount").cast("double") >= 0))).get
    res.rows shouldBe 1L
    res.dropped shouldBe Map("po_present" -> 1L, "amount_nonneg" -> 1L)
    Writer.readCurated(spark, res.curatedPath)
      .select("po").as[String].collect().toSeq shouldBe Seq("P-1")
  }

  test("staging scan survives malformed JSON lines (PERMISSIVE semantics)") {
    // A vendor feed WILL eventually ship a truncated/garbled line; the scan
    // must not fail the batch. Spark's default PERMISSIVE mode turns the
    // bad line into an all-null row, which normalize's all-string coercion
    // then maps to empty strings — the batch lands, nothing throws.
    val zones = tmpZones()
    val dir = zones.stagingIncremental("perm")
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.writeString(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"po": "1", "amount": "10"}
        |{"po": "2", "amount": NOT_JSON}
        |{"po": "3", "amount": "30"}
        |""".stripMargin)
    val raw = Writer.readStagingJson(spark, dir)
    raw.count() shouldBe 3L
    val good = raw.filter(col("po").isNotNull)
    good.count() shouldBe 2L
    val landed = Normalize.coerceToString(raw)
    landed.count() shouldBe 3L
    // coercion leaves no nulls anywhere, so downstream writes cannot choke
    landed.columns.foreach { c =>
      landed.filter(col(c).isNull).count() shouldBe 0L
    }
  }

  test("promote: empty staging -> None (count gate)") {
    val zones = tmpZones()
    // directory exists but holds no records
    new java.io.File(zones.stagingIncremental("empty_t")).mkdirs()
    Promote.promote(spark, zones, "empty_t") shouldBe None
  }

  test("promote with catalog: create, then evolve when a new column appears; old partitions stay readable") {
    val zones = tmpZones()
    val table = "po_evolve"
    Seq("""{"po":"P-1","amount":"10"}""").toDF("value")
      .write.mode("append").text(zones.stagingIncremental(table))
    val r1 = Promote.promote(spark, zones, table,
      asOf = to_timestamp(lit("2026-01-10 00:00:00")), register = true).get
    r1.addedColumns shouldBe empty
    spark.catalog.tableExists(table) shouldBe true

    // batch 2 brings a brand-new column (ship_date)
    Writer.truncateStaging(spark, zones, table)
    Seq("""{"po":"P-2","amount":"20","ship_date":"2026-02-01"}""").toDF("value")
      .write.mode("append").text(zones.stagingIncremental(table))
    val r2 = Promote.promote(spark, zones, table,
      asOf = to_timestamp(lit("2026-02-10 00:00:00")), register = true).get
    r2.addedColumns shouldBe Seq("ship_date" -> "string")

    val cols = spark.catalog.listColumns(table).collect().map(_.name)
    cols should contain("ship_date")
    // catalogued read sees both partitions; old rows have NULL ship_date
    val all = spark.sql(s"SELECT po, ship_date FROM $table ORDER BY po").collect()
    all.length shouldBe 2
    all(0).getString(0) shouldBe "P-1"
    all(0).isNullAt(1) shouldBe true
    all(1).getString(1) shouldBe "2026-02-01"
    spark.sql(s"DROP TABLE $table")
  }

  test("catalog type clamp: whitelisted types pass, nested types degrade to string") {
    CatalogOps.clampType("bigint") shouldBe "bigint"
    CatalogOps.clampType("decimal(30,6)") shouldBe "decimal(30,6)"
    CatalogOps.clampType("struct<a:int>") shouldBe "string"
    CatalogOps.clampType("array<double>") shouldBe "string"
    CatalogOps.clampType("map<string,int>") shouldBe "string"
    CatalogOps.clampType("TIMESTAMP") shouldBe "timestamp"
  }

  test("upsertPartitions overwrites only the loaded partitions; compaction shrinks file count") {
    val root = Files.createTempDirectory("graft-upsert").toString + "/t"
    val day1 = Seq(("a", "2026", "01"), ("b", "2026", "01")).toDF("k", "y", "m")
    val day2 = Seq(("c", "2026", "02")).toDF("k", "y", "m")
    Writer.writeCurated(day1, root, org.apache.spark.sql.SaveMode.Append, Seq("y", "m"))
    Writer.writeCurated(day2, root, org.apache.spark.sql.SaveMode.Append, Seq("y", "m"))

    // corrected reload of month 01 only: month 02 must survive
    val fix = Seq(("a2", "2026", "01")).toDF("k", "y", "m")
    Writer.upsertPartitions(fix, root, Seq("y", "m"))
    val back = Writer.readCurated(spark, root)
    back.count() shouldBe 2L
    back.select("k").collect().map(_.getString(0)).sorted.toSeq shouldBe Seq("a2", "c")

    // fragment month 02 with many small appends, then compact to 1 file
    (1 to 5).foreach { i =>
      Writer.writeCurated(Seq((s"x$i", "2026", "02")).toDF("k", "y", "m"),
        root, org.apache.spark.sql.SaveMode.Append, Seq("y", "m"))
    }
    def partFiles() = new java.io.File(s"$root/y=2026/m=02")
      .listFiles().count(_.getName.endsWith(".parquet"))
    partFiles() should be >= 6
    Writer.compactPartition(spark, root, Seq("y" -> "2026", "m" -> "02"))
    partFiles() shouldBe 1
    spark.read.parquet(root).count() shouldBe 7L
  }

  test("writer: staging truncate removes both staging prefixes") {
    val zones = tmpZones()
    Seq("""{"a":"1"}""").toDF("value").write.mode("append")
      .text(zones.staging("t1"))
    Seq("""{"a":"2"}""").toDF("value").write.mode("append")
      .text(zones.stagingIncremental("t1"))
    Writer.truncateStaging(spark, zones, "t1")
    new java.io.File(zones.staging("t1")).exists() shouldBe false
    new java.io.File(zones.stagingIncremental("t1")).exists() shouldBe false
  }

  test("withGroupedScan applies the 100 MiB grouping conf inside the action and restores after") {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    var inside: String = null
    Writer.withGroupedScan(spark) { inside = spark.conf.get(key) }
    inside shouldBe "104857600"
    spark.conf.get(key) shouldBe prev
    // restored even when the consuming action throws
    intercept[RuntimeException] {
      Writer.withGroupedScan(spark) { throw new RuntimeException("boom") }
    }
    spark.conf.get(key) shouldBe prev
  }

  test("writer: raw sink stores the verbatim payload") {
    val zones = tmpZones()
    val payload = """<xml><po>P-9</po></xml>"""
    Writer.writeRaw(spark, payload, zones.raw("po_status", "2026", "03"))
    val back = spark.read.text(zones.raw("po_status", "2026", "03"))
      .as[String].collect()
    back.toSeq shouldBe Seq(payload)
  }
}
