package graft.queries

import graft.QDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star similarity-search operators over `embeddings` (SURVEY.md §2C):
  * brute-force cosine top-k baseline + LSH-bucketed scale path.
  */
object Similarity {

  val defs: Seq[QDef] = Seq()

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracle: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
