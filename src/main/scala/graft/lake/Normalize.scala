package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's JSON-normalization pipeline (SURVEY.md §2A O-5/6/7/8),
  * re-expressed as plan-level column transforms (no UDFs — everything stays
  * inside whole-stage codegen and scales with the executor count).
  *
  * Reference semantics reproduced:
  *  - `pd.json_normalize` (utils.py:49,129,230): nested structs flatten to
  *    `parent_child` columns; arrays/maps are NOT exploded — they stay as a
  *    single serialized-JSON string cell.
  *  - `wr.catalog.sanitize_dataframe_columns_names` (utils.py:68,205):
  *    snake_case, lowercase, strip identifier-illegal chars.
  *  - `wr.catalog.drop_duplicated_columns` (utils.py:69,206): post-sanitize
  *    name collisions keep the first column.
  *  - `convert_dataframe_to_string` (utils.py:192-201): every cell to
  *    string, nulls and the pandas artifacts "nan"/"None" to "", and a
  *    10,000-char cell cap.
  */
object Normalize {

  /** Max characters kept per cell, mirroring utils.py:196. */
  val MaxCellChars = 10000

  /** Recursive struct flatten with `sep`-joined names; arrays and maps are
    * serialized to JSON strings instead of exploding (utils.py:49 keeps
    * arrays-of-dicts as objects). Purely a projection: no shuffle, fully
    * codegen'd, scale-free.
    */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    def expand(fields: Seq[StructField], parent: Option[Column], prefix: String): Seq[Column] =
      fields.flatMap { f =>
        val c = parent.map(_.getField(f.name)).getOrElse(col(s"`${f.name}`"))
        val name = if (prefix.isEmpty) f.name else s"$prefix$sep${f.name}"
        f.dataType match {
          case st: StructType => expand(st.fields.toSeq, Some(c), name)
          case _: ArrayType | _: MapType => Seq(to_json(c).as(name))
          case _ => Seq(c.as(name))
        }
      }
    df.select(expand(df.schema.fields.toSeq, None, ""): _*)
  }

  /** Glue/Athena-legal identifier: lowercase snake_case, illegal runs
    * collapsed to a single underscore (awswrangler's sanitize rule).
    */
  def sanitizeName(name: String): String =
    name.trim.toLowerCase.replaceAll("[^a-z0-9_]+", "_")

  /** Rename every column through [[sanitizeName]]. */
  def sanitizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitizeName).toIndexedSeq: _*)

  /** Keep the first of any columns that collide by (sanitized) name. */
  def dropDuplicatedColumns(df: DataFrame): DataFrame = {
    // Positional dedup needs unambiguous refs; go through the underlying
    // attribute order instead of (ambiguous) name lookups.
    if (df.columns.distinct.length == df.columns.length) df
    else {
      val indexed = df.toDF(df.columns.zipWithIndex
        .map { case (n, i) => s"__c$i" }.toIndexedSeq: _*)
      val seen2 = scala.collection.mutable.LinkedHashSet.empty[String]
      val cols = df.columns.zipWithIndex.collect {
        case (n, i) if seen2.add(n) => col(s"__c$i").as(n)
      }
      indexed.select(cols.toIndexedSeq: _*)
    }
  }

  /** All-string coercion: cast to string; NULL and the pandas string
    * artifacts "nan"/"None" become ""; every cell truncated to `maxLen`
    * chars (utils.py:192-201).
    */
  def coerceToString(df: DataFrame, maxLen: Int = MaxCellChars): DataFrame =
    df.select(df.columns.map { c =>
      val s = col(s"`$c`").cast(StringType)
      val cleaned = when(s.isNull || s.isin("nan", "None"), lit(""))
        .otherwise(s)
      substring(cleaned, 1, maxLen).as(c)
    }.toIndexedSeq: _*)

  /** Columns containing at least one NULL, computed in ONE distributed agg
    * pass (not a per-column count() loop — one job regardless of width).
    */
  def columnsWithNulls(df: DataFrame): Seq[String] = {
    if (df.columns.isEmpty) return Seq.empty
    val flags = df.select(df.columns.map(c =>
      max(col(s"`$c`").isNull.cast("int")).as(c)).toIndexedSeq: _*).head()
    df.columns.toIndexedSeq.filter(c => flags.getAs[Int](c) == 1)
  }

  /** Flag-gated drop of any column containing >= 1 NA before first write —
    * the reference does this lossily (utils.py:58-62, SURVEY §8 notes the
    * comment/code divergence); default OFF.
    */
  def dropNaColumns(df: DataFrame, enabled: Boolean = false): DataFrame =
    if (!enabled) df
    else {
      val bad = columnsWithNulls(df)
      if (bad.isEmpty) df else df.drop(bad: _*)
    }

  /** The full normalize pipeline: flatten -> sanitize -> dedup-columns ->
    * (optional NA-column drop) -> all-string coerce+truncate.
    */
  def normalize(df: DataFrame, dropNa: Boolean = false,
                maxLen: Int = MaxCellChars): DataFrame =
    coerceToString(
      dropNaColumns(dropDuplicatedColumns(sanitizeColumns(flatten(df))), dropNa),
      maxLen)
}
