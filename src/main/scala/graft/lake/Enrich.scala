package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Audit-column enrichment (SURVEY.md §2A O-3): every record written to the
  * lake carries `processed_at` ("yyyy-MM-dd HH:mm:ss"), `processed_year`
  * and `processed_month` — the last two double as the partition scheme
  * (reference utils.py:55-56,131-133,232-234).
  *
  * Divergences from the reference, on purpose:
  *  - `%m` (month) for processed_month, not the reference's `%M` minutes
  *    bug at purchase_orders.py:80 (SURVEY §8).
  *  - Timestamps render in the session time zone (pinned UTC in this
  *    project) instead of hardcoded US/Eastern.
  */
object Enrich {

  val PartitionColumns: Seq[String] = Seq("processed_year", "processed_month")

  /** Append the audit columns. `asOf` defaults to the wall clock; pass a
    * literal/column for deterministic tests and oracle-checked pipelines.
    */
  def withAuditColumns(df: DataFrame, asOf: Column = current_timestamp()): DataFrame =
    df.withColumn("processed_at", date_format(asOf, "yyyy-MM-dd HH:mm:ss"))
      .withColumn("processed_year", date_format(asOf, "yyyy"))
      .withColumn("processed_month", date_format(asOf, "MM"))
}
