package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native text-hash expressions vs their declarative twins on real data. */
class TextHashSpec extends SparkSpec {

  private def docs = Tables.t(spark, sf("sf0.001"), "documents")

  test("ShingleHash matches the declarative distinct-trigram pipeline") {
    // Count parity: |sorted distinct trigram hashes| == |distinct trigram
    // strings| for every document (collision-free at fixture scale), and
    // the array is strictly increasing (sorted + deduped).
    val rows = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh_str", expr(
        """CASE WHEN size(toks) >= 3
          |  THEN array_distinct(transform(sequence(0, size(toks)-3),
          |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
          |  ELSE array() END""".stripMargin))
      .select(
        expr("size(sh_str)").as("n_str"),
        TextHash.shingleHashf(col("text")).as("shs"))
      .withColumn("n_hash", expr("size(shs)"))
      .withColumn("sorted_distinct",
        expr("shs = array_sort(array_distinct(shs))"))
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Int]("n_hash") shouldBe r.getAs[Int]("n_str")
      r.getAs[Boolean]("sorted_distinct") shouldBe true
    }
  }

  test("ShingleHash: equal texts collide, sub-3-token texts are empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c d"),   // identical -> identical arrays
      (3L, "a b"), (4L, ""), (5L, "x y z")
    ).toDF("id", "text")
      .select(col("id"), TextHash.shingleHashf(col("text")).as("shs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    df(1L) shouldBe df(2L)
    df(1L).length shouldBe 2
    df(3L) shouldBe empty
    df(4L) shouldBe empty
    df(5L).length shouldBe 1
  }

  test("IntersectCount equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val gen = for {
      a <- Gen.listOf(Gen.chooseNum(-50L, 50L))
      b <- Gen.listOf(Gen.chooseNum(-50L, 50L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val cases = (0 until 200).flatMap(i =>
      gen(Gen.Parameters.default, Seed(i.toLong)))
    val rows = cases.toDF("a", "b")
      .select(
        TextHash.intersectCountf(col("a"), col("b")).as("native"),
        expr("size(array_intersect(a, b))").cast("long").as("builtin"))
      .collect()
    rows.length shouldBe cases.length
    rows.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  test("MinHashBands: deterministic, band count, and containment monotonicity") {
    import spark.implicits._
    // A superset's band signature array differs, but identical inputs give
    // identical bands; near-identical sets agree on most bands.
    val rows = docs.limit(50)
      .select(TextHash.shingleHashf(col("text")).as("shs"))
      .filter(expr("size(shs) > 0"))
      .select(
        TextHash.minHashBandsf(col("shs"), 64, 4).as("b1"),
        TextHash.minHashBandsf(col("shs"), 64, 4).as("b2"))
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getSeq[Long](0).length shouldBe 16
      r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
    }
    // empty input -> empty band array (no blocking rows)
    val emptyBands = Seq(Tuple1(Seq.empty[Long])).toDF("shs")
      .select(TextHash.minHashBandsf(col("shs"), 64, 4).as("b")).collect()
    emptyBands.head.getSeq[Long](0) shouldBe empty
  }

  test("SimHash64 equals the declarative bit-vote aggregation") {
    val viaExpr = docs
      .select(col("doc_id"), TextHash.shingleHashf(col("text")).as("shs"))
      .filter(expr("size(shs) > 0"))
      .select(col("doc_id"), TextHash.simHash64f(col("shs")).as("simhash"))
    val viaAgg = {
      val e = docs
        .select(col("doc_id"), TextHash.shingleHashf(col("text")).as("shs"))
        .select(col("doc_id"), explode(col("shs")).as("h"))
      val votes = (0 until 64).map(i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"v$i"))
      e.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .withColumn("simhash",
          (0 until 64).map(i =>
            when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L)
              : org.apache.spark.sql.Column).reduce(_ + _))
        .select("doc_id", "simhash")
    }
    val l = viaExpr.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val r = viaAgg.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    l.length should be > 0
    l shouldBe r
  }
}
