package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** AsOfJoin vs an independently computed brute-force expected result. */
class AsOfJoinSpec extends SparkSpec {

  private def events = Tables.t(spark, sf("sf0.001"), "events")

  private def purchases = events.filter(col("event_type") === "purchase")
    .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))

  private def clicks = events.filter(col("event_type") === "click")
    .select(col("user_id"), col("ts"), col("event_id").as("click_id"))

  test("asOf matches the brute-force most-recent-at-or-before join") {
    val got = AsOfJoin.asOf(purchases,
        clicks.withColumn("click_ts", col("ts")),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        rightValues = Seq("click_id", "click_ts"))
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    // brute force: theta-join + keep max click_ts per purchase (test-only;
    // quadratic per key, which is exactly what AsOfJoin avoids)
    val brute = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("c.ts") <= col("p.ts"),
        "left")
      .groupBy(col("p.purchase_id"))
      .agg(max_by(col("c.click_id"), col("c.ts")).as("click_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    got.size shouldBe brute.size
    got shouldBe brute
    got.valuesIterator.count(_ == -1L) should be < got.size // some unmatched, some matched
  }

  test("tolerance nulls out matches older than the window") {
    val loose = AsOfJoin.asOf(purchases,
      clicks.withColumn("click_ts", col("ts")),
      key = "user_id", leftTime = "ts", rightTime = "ts",
      rightValues = Seq("click_id", "click_ts"))
    val tol = 60L * 1000 * 1000 // 60s in micros (timestamp-column contract)
    val tight = AsOfJoin.asOf(purchases,
      clicks.withColumn("click_ts", col("ts")),
      key = "user_id", leftTime = "ts", rightTime = "ts",
      rightValues = Seq("click_id", "click_ts"), tolerance = Some(tol))

    val looseMatched = loose.filter(col("click_id").isNotNull)
    def us(c: String) = unix_micros(col(c).cast("timestamp"))
    val tightRows = tight
      .select(col("purchase_id"), col("click_id"),
        us("click_ts").as("cts_us"), us("ts").as("ts_us"))
      .collect().map(r =>
        (r.getAs[Long]("purchase_id"), Option(r.getAs[Any]("click_id")),
          Option(r.getAs[Any]("cts_us")), r.getAs[Long]("ts_us"))).toSeq

    // every tight match is within tolerance; every in-tolerance loose match
    // survives
    tightRows.foreach { case (_, cid, cts, ts) =>
      if (cid.isDefined)
        (ts - cts.get.asInstanceOf[Long]) should be <= tol
    }
    val inTolLoose = looseMatched
      .filter(us("ts") - us("click_ts") <= tol).count()
    tightRows.count(_._2.isDefined).toLong shouldBe inTolLoose
  }

  test("mixed unit families (date vs timestamp) are rejected") {
    val leftDate = purchases.withColumn("d", col("ts").cast("date"))
    val err = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(leftDate, clicks.withColumn("click_ts", col("ts")),
        key = "user_id", leftTime = "d", rightTime = "ts",
        rightValues = Seq("click_id"))
    }
    err.getMessage should include("unit family")
    // same family on both sides (date/date) still works
    val rightDate = clicks.withColumn("d", col("ts").cast("date"))
    AsOfJoin.asOf(leftDate, rightDate, key = "user_id",
      leftTime = "d", rightTime = "d", rightValues = Seq("click_id"))
      .count() should be > 0L
  }

  test("plan shape: one hash shuffle, no nested loop") {
    val df = AsOfJoin.asOf(purchases,
      clicks.withColumn("click_ts", col("ts")),
      key = "user_id", leftTime = "ts", rightTime = "ts",
      rightValues = Seq("click_id"))
    val p = df.queryExecution.executedPlan.toString
    p should not include "BroadcastNestedLoopJoin"
    p.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
  }
}
