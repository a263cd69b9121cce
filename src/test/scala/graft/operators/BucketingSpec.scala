package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located join: result parity with the plain join AND a
  * physical plan free of shuffles (the point of paying the bucket write).
  */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without Exchange and match the plain join") {
    val dir = sf("sf0.01")
    val orders = Tables.t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.t(spark, dir, "customer")
      .select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")

    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "customer_b", "o_custkey", 8)
    // at fixture scale Catalyst would (rightly) broadcast the small side,
    // which bypasses bucketing entirely — disable it to exercise the
    // co-located SortMergeJoin path this spec is about
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString

      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"

      val expected = orders.join(customer, "o_custkey")
        .orderBy("o_orderkey").collect()
      joined.orderBy("o_orderkey").collect() shouldBe expected
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
