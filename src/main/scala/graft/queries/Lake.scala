package graft.queries

import graft.QDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-checkable demonstrations of the lake/ETL operator surface
  * (SURVEY.md §2A): normalize flatten, string coercion, audit enrichment,
  * and the staging->curated promote round trip.
  */
object Lake {

  val defs: Seq[QDef] = Seq()

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracle: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
