package graft.queries

import graft.QDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star text-analysis + deduplication operators over `documents`
  * (SURVEY.md §2C): text stats, token counting, exact/MinHash/SimHash/
  * n-gram-Jaccard dedup, language ID, quality scoring, fingerprinting.
  */
object Text {

  val defs: Seq[QDef] = Seq()

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracle: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
