package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` for the same key (the merge_asof / ASOF JOIN
  * semantics Spark lacks natively).
  *
  * Implementation is the scale-safe union+running-window rewrite: tag both
  * sides, union, and carry the last-seen right payload forward within each
  * key ordered by (time, tag). Cost is exactly ONE hash shuffle on the
  * key; the naive theta-join (`l.key = r.key AND r.t <= l.t` + max per
  * left row) degenerates to a per-key cross product, which is why this is
  * an operator and not a join hint. Ties: right rows sort before left rows
  * at equal time, so "at-or-before" is inclusive.
  *
  * Output: every left column, plus `rightValues` (null where no right row
  * qualifies — left-outer semantics). `tolerance` additionally nulls
  * matches older than `leftTime - tolerance` (same units as the time
  * columns), matching merge_asof's tolerance and keeping window state a
  * non-factor (the filter is post-hoc on the matched time).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightValues: Seq[String], tolerance: Option[Long] = None): DataFrame = {
    require(rightValues.nonEmpty, "rightValues must name at least one column")
    // Precision-preserving time normalization: cast("long") would truncate
    // TimestampType to whole SECONDS (sub-second order lost -> a right row
    // 0.5s after the left row would "match"); use unix_micros for
    // timestamps. TIMESTAMP_NTZ has no epoch function of its own and
    // rejects a direct bigint cast, so it routes through TimestampType
    // first — the session time zone then defines its epoch consistently
    // on both sides. Tolerance is therefore in MICROSECONDS for timestamp
    // columns, in DAYS for dates, in the column's own units for numerics.
    def asLong(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(col(c).cast(org.apache.spark.sql.types.TimestampType))
        case org.apache.spark.sql.types.DateType => unix_date(col(c)).cast("long")
        case _ => col(c).cast("long")
      }
    // Each side normalizes by its own type, so a DateType column (epoch
    // DAYS) against a timestamp column (epoch MICROS) would silently
    // compare incommensurate units and produce nonsense matches — reject
    // mixed unit families up front.
    def unitFamily(df: DataFrame, c: String): String =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => "timestamp (micros)"
        case org.apache.spark.sql.types.DateType => "date (days)"
        case _ => "numeric (own units)"
      }
    val (lFam, rFam) = (unitFamily(left, leftTime), unitFamily(right, rightTime))
    require(lFam == rFam,
      s"as-of time columns must share a unit family: left '$leftTime' is " +
        s"$lFam but right '$rightTime' is $rFam — cast one side first")
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("__k"), asLong(left, leftTime).as("__t"),
      lit(1).as("__kind"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(rightStructType(right, rightValues)).as("__rv"))
    // NULL keys never join in SQL (NULL = NULL is not true): drop null-key
    // right rows up front; null-key left rows then share a partition with
    // no right rows and emit unmatched, matching ASOF JOIN semantics.
    val r = right.filter(col(key).isNotNull).select(
      col(key).as("__k"), asLong(right, rightTime).as("__t"),
      lit(0).as("__kind"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType)
        .as("__lrow"),
      struct(rightValues.map(col): _*).as("__rv"))
    val w = Window.partitionBy("__k").orderBy("__t", "__kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__last_rv", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__last_t",
        last(when(col("__kind") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
    val withTol = tolerance match {
      case Some(tol) => matched.withColumn("__last_rv",
        when(col("__t") - col("__last_t") <= tol, col("__last_rv")))
      case None => matched
    }
    val outCols =
      leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        rightValues.map(c => col(s"__last_rv.$c").as(c))
    withTol.select(outCols: _*)
  }

  private def rightStructType(right: DataFrame, rightValues: Seq[String]) =
    right.select(struct(rightValues.map(col): _*)).schema.head.dataType

  /** Column-name collision guard helper: prefix right-side value columns. */
  def prefixed(df: DataFrame, prefix: String, except: Seq[String]): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      if (except.contains(c)) d else d.withColumnRenamed(c, prefix + c)
    }
}
