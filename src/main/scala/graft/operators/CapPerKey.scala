package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep the first `cap` rows per key under a deterministic total order —
  * the per-source balancing cap of dataset mixing — via a SALTED
  * two-phase plan that is skew-proof by construction.
  *
  * The naive form is one rank window partitioned by the key: a dominant
  * key (half the corpus from one crawl domain) lands on ONE task whose
  * sort is the straggler at 100 TB. Instead:
  *
  *   1. rank within (key, salt) buckets — `nSalts` parallel sorts per
  *      key, each keeping at most `cap` survivors. A row in the global
  *      top-`cap` has fewer than `cap` predecessors globally, so
  *      certainly fewer than `cap` within its own bucket: no survivor is
  *      ever lost to salting.
  *   2. re-rank the ≤ `cap * nSalts` survivors per key — a BOUNDED
  *      working set regardless of the key's original size — and keep the
  *      true top `cap`.
  *
  * No probe, no threshold, no second scan: the hot-key hatch is the
  * plan. The result is identical to the single-window form because the
  * order is total (callers must include a tiebreaker column, e.g. the id
  * itself); [[CapPerKeySpec]] pins the equivalence. Cost vs the naive
  * window: the same one full shuffle (on (key, salt) instead of key, so
  * it spreads instead of piling up) plus one shuffle of the bounded
  * survivor set.
  *
  * [[annotated]] additionally threads each bucket's row count through
  * phase 1, so per-key TOTALS aggregate from the survivor set without a
  * separate counting pass — each non-empty bucket's rank-1 row (always a
  * survivor, since cap >= 1) carries `__bucket_rows`; summing those per
  * key reconstructs the key's full row count. One scan serves cap and
  * census both (q98's shape).
  */
object CapPerKey {

  /** Phase-1 survivors with `__r1` (rank in (key, salt) bucket),
    * `__bucket_rows` (bucket size), `__rnk` (final per-key rank).
    * Rows with `__rnk <= cap` are the kept set;
    * `sum(if(__r1 = 1, __bucket_rows, 0))` per key is the key's total.
    */
  def annotated(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                cap: Int, nSalts: Int = 16): DataFrame =
    core(df, keyCols, orderCols, cap, nSalts, census = true)

  /** Rows surviving the cap, original columns preserved. Skips the
    * bucket-count window [[annotated]] carries — a cap-only caller
    * should not pay for the census.
    */
  def keep(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
           cap: Int, nSalts: Int = 16): DataFrame =
    core(df, keyCols, orderCols, cap, nSalts, census = false)
      .filter(col("__rnk") <= cap)
      .drop("__r1", "__rnk")

  private def core(df: DataFrame, keyCols: Seq[String],
                   orderCols: Seq[Column], cap: Int, nSalts: Int,
                   census: Boolean): DataFrame = {
    require(cap >= 1, s"cap must be >= 1 (got $cap)")
    require(nSalts >= 2, s"nSalts must be >= 2 (got $nSalts)")
    val keyExprs = keyCols.map(col)
    // salt from the order key: deterministic, layout-independent, and
    // spreads a single hot key across nSalts buckets
    val salted = df.withColumn("__salt",
      pmod(xxhash64(orderCols: _*), lit(nSalts)))
    val bucket = Window.partitionBy(keyExprs :+ col("__salt"): _*)
    val w1 = bucket.orderBy(orderCols: _*)
    val ranked = salted.withColumn("__r1", row_number().over(w1))
    val counted =
      if (census) ranked.withColumn("__bucket_rows",
        count(lit(1)).over(bucket).cast("long"))
      else ranked
    val w2 = Window.partitionBy(keyExprs: _*).orderBy(orderCols: _*)
    counted
      .filter(col("__r1") <= cap)
      .withColumn("__rnk", row_number().over(w2))
      .drop("__salt")
  }
}
