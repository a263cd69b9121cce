package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the 100 TB design note in the build
  * brief: "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join handles most cases at runtime; salting is the static
  * fallback for pathological single-key skew (one key holding >> a
  * partition's worth of rows, e.g. a null-ish default id): the skewed
  * (large) side spreads each key over `factor` salt buckets, the other
  * side is replicated `factor` times, and the join key becomes
  * (key, salt) — no single reducer sees a whole hot key.
  */
object SkewJoin {

  /** Inner/left equi-join of `large` (skewed) against `small` on `key`.
    * Result equals `large.join(small, key, joinType)` — salting changes
    * only the shuffle layout. `small` grows by `factor`x; keep it the
    * dimension side.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    // right/full outer would emit each unmatched SMALL row once per salt
    // replica (`factor` duplicates) — reject rather than silently corrupt.
    val supported = Set("inner", "left", "leftouter", "leftsemi", "leftanti")
    require(supported.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left join types only, got $joinType")
    // salt is only a distribution device, never part of the result; spread
    // rows deterministically-enough with a cheap per-row counter hash.
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Top-N most frequent values of `key` with counts — the reconnaissance
    * step before choosing a salt factor (run on a sample at scale).
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
