package graft.lake

/** The three-zone lake path scheme (SURVEY.md §1.1): raw / staging /
  * curated directories under one root, Hive-style `key=value` components
  * (reference utils.py:111-114,141-142,215-218,241-252). Works over any
  * Hadoop-visible filesystem (local FS in tests, S3A/HDFS in production).
  */
final case class Zones(root: String) {

  /** Verbatim-payload dump zone, dated (utils.py:215-218). */
  def raw(table: String, year: String, month: String): String =
    s"$root/etl_process=raw/table=$table/year=$year/month=$month"

  /** Gzip-JSON staging zone (utils.py:141-142). */
  def staging(table: String): String =
    s"$root/etl_process=staging/table=$table"

  /** Incremental twin of the staging zone (utils.py:153). */
  def stagingIncremental(table: String): String =
    staging(s"${table}_incremental")

  /** Curated partitioned-Parquet zone (utils.py:241-252). */
  def curated(table: String): String =
    s"$root/etl_process=processed/table=$table"
}
