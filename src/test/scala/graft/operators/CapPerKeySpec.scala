package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CapPerKeySpec extends SparkSpec {

  import spark.implicits._

  private def fixture = (1 to 5000).map { i =>
    // one dominant key holds 80% of the rows; the rest spread over 7 keys
    val k = if (i <= 4000) "hot" else s"k${i % 7}"
    (k, i.toLong, i * 2L)
  }.toDF("key", "id", "payload")

  private val order = Seq(md5(col("id").cast("string")), col("id"))

  test("salted two-phase cap keeps exactly the single-window rows") {
    val df = fixture
    // reference: the naive one-window form the salted plan must equal
    val w = Window.partitionBy("key").orderBy(order: _*)
    val reference = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 15).drop("rnk")
      .as[(String, Long, Long)].collect().toSet
    val salted = CapPerKey.keep(df, Seq("key"), order, cap = 15)
      .as[(String, Long, Long)].collect().toSet
    salted shouldBe reference
    salted.groupBy(_._1).foreach { case (_, rows) => rows.size shouldBe 15 }
    // the hot key's full-partition sort never happens: phase 1 windows
    // over (key, salt), phase 2 over the bounded survivor set
    val plan = CapPerKey.keep(df, Seq("key"), order, cap = 15)
      .queryExecution.executedPlan.toString
    "Window \\[".r.findAllIn(plan).size should be >= 2
  }

  test("annotated bucket counts reconstruct exact per-key totals") {
    val df = fixture
    val ann = CapPerKey.annotated(df, Seq("key"), order, cap = 15)
    val totals = ann.groupBy("key")
      .agg(sum(when(col("__r1") === 1, col("__bucket_rows")).otherwise(0L))
        .as("n_total"))
      .as[(String, Long)].collect().toMap
    val expected = df.groupBy("key").count()
      .as[(String, Long)].collect().toMap
    totals shouldBe expected
  }

  test("cap larger than a key's row count keeps every row of that key") {
    val df = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("b", 3L, 0L))
      .toDF("key", "id", "payload")
    CapPerKey.keep(df, Seq("key"), order, cap = 15).count() shouldBe 3L
  }
}
