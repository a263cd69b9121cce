package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join: result-equivalence with the plain join, under heavy skew. */
class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin equals plain join on skewed data (inner and left)") {
    // 10k rows, 90% on one hot key
    val large = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 5).otherwise(1L).as("k"),
        col("id").as("v"))
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (9L, "none"))
      .toDF("k", "name")

    for (jt <- Seq("inner", "left")) {
      val expected = large.join(small, Seq("k"), jt)
        .orderBy("k", "v").collect()
      val salted = SkewJoin.saltedJoin(large, small, "k", factor = 8, joinType = jt)
        .orderBy("k", "v").collect()
      salted.length shouldBe expected.length
      salted.toSeq shouldBe expected.toSeq
    }
  }

  test("keyHistogram surfaces the hot key") {
    val df = spark.range(1000)
      .select(when(col("id") < 900, 7L).otherwise(col("id")).as("k"))
    val top = SkewJoin.keyHistogram(df, "k", topN = 1).collect()
    top.head.getLong(0) shouldBe 7L
    top.head.getLong(1) shouldBe 900L
  }
}
