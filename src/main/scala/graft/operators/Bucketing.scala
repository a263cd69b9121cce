package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) tables: the static answer to repeated fact-fact
  * joins on the same key (build-brief scale rule: "co-locate joins via
  * bucketing"). Writing both sides bucketed+sorted by the join key lets
  * SortMergeJoin run with NO Exchange and NO per-query Sort — the shuffle
  * is paid once at write time and amortized over every subsequent join.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans without a
    * shuffle when bucket counts match (assert via `executedPlan`).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), Seq(key), joinType)
}
