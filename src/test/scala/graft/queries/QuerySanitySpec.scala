package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Sanity checks the DuckDB oracle can't express (SURVEY.md §5):
  * HLL bound for q13, and structural checks on the contract maps.
  */
class QuerySanitySpec extends SparkSpec {

  // q13/q58/q65 now emit CONTRACT frames (exact oracle-computable values
  // + in-engine approx-error booleans) so the driver gate hash-checks
  // them; these tests pin the contract's own mechanics — the exact side
  // matches an independent computation, and every bound holds.

  test("q58 contract: exact side matches, sketch-union bound holds") {
    val dir = sf("sf0.01")
    val rows = SparkEntry.queries("q58_sketch_union")(spark, dir).collect()
    val exact = Tables.t(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.map(_.getString(0)).toSet shouldBe exact.keySet
    rows.foreach { r =>
      r.getLong(2) shouldBe exact(r.getString(0)) // n_exact column
      r.getLong(1) should be > 0L                 // n_days
      r.getBoolean(3) shouldBe true               // approx_ok
    }
  }

  test("q13 contract: exact side matches, HLL++ bound holds") {
    val dir = sf("sf0.01")
    val rows = SparkEntry.queries("q13_agg_approx_distinct")(spark, dir).collect()
    val exact = Tables.t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.map(_.getString(0)).toSet shouldBe exact.keySet
    rows.foreach { r =>
      r.getLong(1) shouldBe exact(r.getString(0)) // n_exact column
      r.getBoolean(2) shouldBe true               // approx_ok
    }
  }

  test("q65 contract: group counts match, every rank-space bound holds") {
    val dir = sf("sf0.01")
    val rows = SparkEntry.queries("q65_percentiles_approx")(spark, dir).collect()
    val exact = Tables.t(spark, dir, "lineitem")
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.map(_.getString(0)).toSet shouldBe exact.keySet
    rows.foreach { r =>
      r.getLong(1) shouldBe exact(r.getString(0))
      r.getBoolean(2) shouldBe true
      r.getBoolean(3) shouldBe true
      r.getBoolean(4) shouldBe true
    }
  }

  test("every oracleSql key has a matching queries entry") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.diff(qs) shouldBe empty
  }

  test("entry returns rows (driver smoke check)") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("Similarity.clearCache empties every cross-query memo, exactMemo included") {
    val dir = sf("sf0.001")
    Similarity.annWarmup(spark, dir)
    val (frames, codebooks, exact) = Similarity.cachedEntryCounts
    frames should be > 0
    codebooks should be > 0
    exact should be > 0
    // relative: other suites' caches may legitimately be live in the
    // shared session — only Similarity's frames must leave storage
    val beforeClear = spark.sparkContext.getPersistentRDDs.size
    Similarity.clearCache()
    Similarity.cachedEntryCounts shouldBe ((0, 0, 0))
    spark.sparkContext.getPersistentRDDs.size should be < beforeClear
  }
}
