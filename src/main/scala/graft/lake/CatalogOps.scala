package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Catalog management (SURVEY.md §2A O-22/23/24): create-if-absent,
  * schema-evolution diff + ADD COLUMNS with the reference's type whitelist
  * clamp, and partition discovery — all via spark.sql DDL against the
  * session catalog (Glue/Hive in production, in-memory in tests).
  *
  * Reference: staging_to_curated.py:122-171.
  */
object CatalogOps {

  /** Types allowed through to the catalog verbatim; anything else (struct/
    * array/map/...) degrades to `string` (staging_to_curated.py:158-160).
    */
  val TypeWhitelist: Set[String] = Set(
    "int", "bigint", "integer", "boolean", "tinyint", "smallint",
    "double", "float", "char", "decimal", "varchar", "string",
    "binary", "date", "timestamp")

  /** Clamp a Spark simpleString type to the whitelist. Parameterized types
    * (decimal(30,6), varchar(10), char(2)) pass on their base name.
    */
  def clampType(t: String): String = {
    val base = t.toLowerCase.takeWhile(c => c != '(' && c != '<').trim
    if (TypeWhitelist.contains(base)) t.toLowerCase else "string"
  }

  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** CREATE TABLE ... USING PARQUET PARTITIONED BY ... LOCATION if absent
    * (staging_to_curated.py:122-134; implicit in wrangler dataset writes).
    * Returns true when the table was created by this call.
    */
  def createParquetTableIfAbsent(
      spark: SparkSession, table: String, location: String,
      dataColumns: Seq[(String, String)],
      partitionColumns: Seq[(String, String)]): Boolean = {
    if (tableExists(spark, table)) return false
    val cols = (dataColumns ++ partitionColumns)
      .map { case (n, t) => s"`$n` ${clampType(t)}" }.mkString(", ")
    val parts = partitionColumns.map { case (n, _) => s"`$n`" }.mkString(", ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS `$table` ($cols)
         |USING PARQUET
         |${if (parts.nonEmpty) s"PARTITIONED BY ($parts)" else ""}
         |LOCATION '$location'""".stripMargin)
    true
  }

  /** Schema-evolution diff (staging_to_curated.py:136-168): any incoming
    * column missing from the catalog is added via ALTER TABLE ADD COLUMNS,
    * its type clamped to the whitelist. Existing columns are never altered
    * or dropped — old partitions stay readable. Returns the added columns.
    */
  def evolveSchema(spark: SparkSession, table: String,
                   incoming: Seq[(String, String)]): Seq[(String, String)] = {
    val existing = spark.catalog.listColumns(table).collect()
      .map(_.name.toLowerCase).toSet
    val added = incoming.filter { case (n, _) => !existing.contains(n.toLowerCase) }
      .map { case (n, t) => n -> clampType(t) }
    if (added.nonEmpty) {
      val ddl = added.map { case (n, t) => s"`$n` $t" }.mkString(", ")
      spark.sql(s"ALTER TABLE `$table` ADD COLUMNS ($ddl)")
    }
    added
  }

  /** Partition discovery after a direct-to-path write
    * (staging_to_curated.py:170-171). MSCK REPAIR TABLE is native Spark SQL.
    */
  def repairPartitions(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE `$table`")

  /** name -> type pairs from a Spark schema, partition columns excluded. */
  def dataColumns(schema: StructType, partitionCols: Seq[String]): Seq[(String, String)] = {
    val parts = partitionCols.map(_.toLowerCase).toSet
    schema.fields.toIndexedSeq
      .filterNot(f => parts.contains(f.name.toLowerCase))
      .map(f => f.name -> f.dataType.simpleString)
  }
}
