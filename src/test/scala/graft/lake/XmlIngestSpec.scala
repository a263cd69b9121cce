package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.types.StructType

/** O-2 vendor-XML ingest: payload -> per-item records -> raw + staging. */
class XmlIngestSpec extends SparkSpec {

  import spark.implicits._

  private val poSchema = StructType.fromDDL(
    "po_number STRING, status STRING, item ARRAY<STRUCT<sku: STRING, qty: BIGINT>>")

  private val payload =
    """<po>
      |  <po_number>P-77</po_number>
      |  <status>SHIPPED</status>
      |  <item><sku>A1</sku><qty>2</qty></item>
      |  <item><sku>B2</sku><qty>5</qty></item>
      |</po>""".stripMargin

  test("parse explodes repeated items with header fields repeated") {
    val out = XmlIngest.parse(Seq(payload).toDF("payload"), poSchema)
    out.columns.toSeq shouldBe Seq("po_number", "status", "sku", "qty")
    val rows = out.orderBy("sku").collect()
    rows.length shouldBe 2
    rows.map(_.getString(0)).toSet shouldBe Set("P-77")
    rows.map(r => (r.getString(2), r.getLong(3))).toSeq shouldBe
      Seq(("A1", 2L), ("B2", 5L))
  }

  test("parse without items keeps one header row") {
    val out = XmlIngest.parse(
      Seq("<po><po_number>P-1</po_number><status>OK</status></po>").toDF("payload"),
      StructType.fromDDL("po_number STRING, status STRING"), itemCol = "")
    out.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("P-1", "OK"))
  }

  test("ingest lands raw payload + staged records, promotable end-to-end") {
    val zones = Zones(java.nio.file.Files.createTempDirectory("graft-xml").toString)
    val records = XmlIngest.ingest(spark, zones, "po_status", payload,
      poSchema, "2026", "03")
    records.count() shouldBe 2L
    // raw zone holds the verbatim payload
    spark.read.text(zones.raw("po_status", "2026", "03"))
      .count() should be >= 1L
    // staged records promote through the standard pipeline
    val res = Promote.promote(spark, zones, "po_status",
      asOf = org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2026-03-01 00:00:00"))).get
    res.rows shouldBe 2L
  }
}
