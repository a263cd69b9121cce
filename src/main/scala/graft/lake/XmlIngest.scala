package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Vendor XML ingestion (SURVEY.md §2A O-2): the reference POSTs an XML
  * request to the vendor endpoint and turns the XML response into records
  * (purchase_orders.py:48-77 — including its bugs: GET-with-body and a
  * .json() parse of an XML payload; SURVEY §8 says implement the intent).
  *
  * The HTTP fetch is driver I/O outside the engine; this is the
  * payload -> records seam, built on Spark 4's native from_xml so the
  * parse runs distributed when payloads arrive in bulk (one row per
  * payload, exploded to one row per line item).
  */
object XmlIngest {

  /** Parse one-or-many XML payloads (one per row of `payloads`' `payload`
    * column) into flat per-item records: header fields are repeated onto
    * every exploded item row.
    *
    * @param schema  struct of the payload root, e.g.
    *                `po_number STRING, status STRING,
    *                 item ARRAY<STRUCT<sku: STRING, qty: BIGINT>>`
    * @param itemCol the repeated element to explode (empty = no explode)
    */
  def parse(payloads: DataFrame, schema: StructType,
            itemCol: String = "item"): DataFrame = {
    val parsed = payloads
      .withColumn("rec", from_xml(col("payload"), schema))
    val headerNames = schema.fields.filterNot(_.name == itemCol).map(_.name).toSeq
    val headerCols = headerNames.map(n => col(s"rec.$n").as(n))
    if (itemCol.nonEmpty && schema.fieldNames.contains(itemCol)) {
      val itemFields = schema(itemCol).dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.asInstanceOf[StructType].fieldNames.toSeq
      parsed
        .select(headerCols :+ explode_outer(col(s"rec.$itemCol")).as("_item"): _*)
        .select(headerNames.map(col) ++
          itemFields.map(n => col(s"_item.$n").as(n)): _*)
    } else parsed.select(headerCols: _*)
  }

  /** Full O-2 ingest: dump the verbatim payload to the raw zone, parse it,
    * stage the records as gzip JSON for the promote pipeline.
    */
  def ingest(spark: SparkSession, zones: Zones, table: String,
             payload: String, schema: StructType,
             year: String, month: String, itemCol: String = "item"): DataFrame = {
    import spark.implicits._
    Writer.writeRaw(spark, payload, zones.raw(table, year, month))
    val records = parse(Seq(payload).toDF("payload"), schema, itemCol)
    Writer.writeStagingJson(records, zones.stagingIncremental(table))
    records
  }
}
