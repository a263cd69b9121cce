package graft.plans

import graft.SparkSpec

/** SQL-surface registration of the native expressions. */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate the native expressions") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  vec_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)),
        |          array(CAST(4 AS FLOAT),   CAST(0.5 AS FLOAT))) AS dot,
        |  size(shingle_hash('a b c d')) AS n_sh,
        |  intersect_count(array(1L, 5L, 9L), array(5L, 9L, 12L)) AS ic,
        |  size(minhash_bands(shingle_hash('a b c d e f'))) AS n_bands,
        |  simhash64(shingle_hash('a b c')) AS sh
        |""".stripMargin).collect().head
    row.getDouble(0) shouldBe 7.0
    row.getInt(1) shouldBe 2
    row.getLong(2) shouldBe 2L
    row.getInt(3) shouldBe 16
    // simhash of a single feature == the feature hash itself (every bit
    // vote is decided by the one element)
    val single =
      spark.sql("SELECT shingle_hash('a b c')[0]").collect().head.getLong(0)
    row.getLong(4) shouldBe single
  }

  test("pq_adc SQL function sums coded LUT entries with a literal k") {
    GraftExtensions.register(spark)
    spark.sql(
      """SELECT pq_adc(array(0, 1, 0),
        |              array(CAST(10 AS DOUBLE), 20D, 30D, 40D, 50D, 60D),
        |              2) AS s""".stripMargin)
      .collect().head.getDouble(0) shouldBe 100.0
    // non-literal k is rejected at resolution
    intercept[Exception] {
      spark.sql("SELECT pq_adc(array(0), array(1D), CAST(rand()*2 AS INT))")
        .collect()
    }
  }

  test("arity errors are rejected at registration resolution") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(CAST(1 AS FLOAT)))").collect()
    }
    e.getMessage should include("vec_dot")
  }
}
