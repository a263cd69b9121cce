package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Sanity checks the DuckDB oracle can't express (SURVEY.md §5):
  * HLL bound for q13, and structural checks on the contract maps.
  */
class QuerySanitySpec extends SparkSpec {

  test("q58 merged HLL sketches are within 5% of exact distinct users") {
    val dir = sf("sf0.01")
    val approx = SparkEntry.queries("q58_sketch_union")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (k, ex) =>
      // datasketches HLL at default lgk=12 has rsd ~1.6%; allow 3 sigma
      math.abs(approx(k).toDouble - ex) / ex should be <= 0.05
    }
  }

  test("q13 approx_count_distinct is within 15% of exact per group") {
    val dir = sf("sf0.01")
    val approx = SparkEntry.queries("q13_agg_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      // HLL++ default rsd is 5%; allow 3 sigma
      math.abs(ap - ex) / ex should be <= 0.15
    }
  }

  test("q65 approx percentiles track exact q55 within 1%") {
    val dir = sf("sf0.01")
    def collect(name: String) =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
    val exact = collect("q55_percentiles")
    val approx = collect("q65_percentiles_approx")
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (k, ex) =>
      ex.zip(approx(k)).foreach { case (e, a) =>
        // accuracy 10000 -> rank error <= 1/10000 of the group; on these
        // distributions that is well under 1% in value
        math.abs(a - e) / e should be <= 0.01
      }
    }
  }

  test("every oracleSql key has a matching queries entry") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.diff(qs) shouldBe empty
  }

  test("entry returns rows (driver smoke check)") {
    SparkEntry.entry(spark).count() should be > 0L
  }
}
