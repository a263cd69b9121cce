package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopK aggregator: equivalence with the window-sort form on real data. */
class TopKAggSpec extends SparkSpec {

  test("topKPerGroup matches row_number window top-3 on orders") {
    val dir = sf("sf0.01")
    val orders = Tables.t(spark, dir, "orders")

    val viaAgg = TopKAgg.topKPerGroup(orders, "o_custkey", "o_totalprice",
        "o_orderkey", k = 3)
      .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rank")
      .collect()

    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"),
        col("o_totalprice").cast("double"))
      .orderBy("o_custkey", "rank")
      .collect()

    viaAgg.length shouldBe viaWindow.length
    viaAgg.toSeq shouldBe viaWindow.toSeq
  }

  test("NaN values sort last, never ranking above real values") {
    val agg = TopKAgg.TopK(3)
    // NaN arrives FIRST while the buffer is under k — the naive `>`
    // ordering would pin it at the head
    val buf = List(Double.NaN -> 1L, 2.0 -> 2L, 5.0 -> 3L, 1.0 -> 4L)
      .foldLeft(agg.zero)(agg.reduce)
    agg.finish(buf) shouldBe Seq(5.0 -> 3L, 2.0 -> 2L, 1.0 -> 4L)
    // a group with < k real values still lists NaN after them
    val sparse = List(Double.NaN -> 9L, 4.0 -> 8L).foldLeft(agg.zero)(agg.reduce)
    agg.finish(sparse).map(_._2) shouldBe Seq(8L, 9L)
  }

  test("buffer never exceeds k and merge order does not matter") {
    val agg = TopKAgg.TopK(2)
    val a = List(1.0 -> 10L, 5.0 -> 2L).foldLeft(agg.zero)(agg.reduce)
    val b = List(3.0 -> 7L, 5.0 -> 1L).foldLeft(agg.zero)(agg.reduce)
    a.length should be <= 2
    agg.merge(a, b) shouldBe agg.merge(b, a)
    agg.finish(agg.merge(a, b)) shouldBe Seq(5.0 -> 1L, 5.0 -> 2L)
  }
}
