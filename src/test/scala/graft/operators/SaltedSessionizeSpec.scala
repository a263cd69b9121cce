package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Salted two-phase sessionization must be result-identical to the plain
  * one-window lag+cumsum form for any chunk width — including on
  * whale-skewed data, the case it exists for.
  */
class SaltedSessionizeSpec extends SparkSpec {

  import spark.implicits._

  private val Gap = 100L

  private def plain(ev: DataFrame): Seq[(String, Long, Long)] = {
    val w = Window.partitionBy("u").orderBy("t")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("brk",
        when(col("t") - lag(col("t"), 1).over(w) > Gap, 1).otherwise(0))
      .withColumn("session_id", sum(col("brk")).over(wRun).cast("long"))
      .select("u", "t", "session_id").as[(String, Long, Long)]
      .collect().sorted.toSeq
  }

  private def salted(ev: DataFrame, chunk: Long): Seq[(String, Long, Long)] =
    SaltedSessionize.sessionize(ev, "u", "t", Gap, chunk)
      .select("u", "t", "session_id").as[(String, Long, Long)]
      .collect().sorted.toSeq

  test("parity with the plain window on whale-skewed data, across chunk widths") {
    // one whale user with 5000 events (dense bursts + occasional gaps),
    // plus sparse normal users — the distribution that motivates salting
    val gaps = Gen.frequency(9 -> Gen.chooseNum(1L, 60L), 1 -> Gen.chooseNum(101L, 400L))
    val whaleGaps = (0 until 5000).map(i => gaps(Gen.Parameters.default, Seed(i.toLong)).get)
    val whale = whaleGaps.scanLeft(0L)(_ + _).map(("whale", _))
    val normals = (0 until 50).flatMap { u =>
      (0 until 20).map(i => (s"u$u", i * 90L + u))
    }
    val ev = (whale ++ normals).toDF("u", "t")
    val expected = plain(ev)
    // chunk widths: smaller than the gap, comparable, and much larger —
    // the salt must never show in the result
    Seq(40L, 128L, 1000L, 1000000L).foreach { chunk =>
      withClue(s"chunk=$chunk: ") { salted(ev, chunk) shouldBe expected }
    }
  }

  test("session ids are 0-based and continuous per user; chunk-head continuation merges correctly") {
    // events engineered so a session SPANS a chunk boundary (t=95 -> t=105
    // with chunk 100: gap 10 <= 100 merges) and a break lands exactly ON a
    // boundary event
    val ev = Seq(
      ("a", 0L), ("a", 95L), ("a", 105L), ("a", 150L), // one session across the boundary
      ("a", 300L),                                     // gap 150 > 100 -> new session
      ("b", 99L), ("b", 100L), ("b", 201L), ("b", 302L) // gaps 1, 101, 101 -> 3 sessions
    ).toDF("u", "t")
    salted(ev, 100L) shouldBe Seq(
      ("a", 0L, 0L), ("a", 95L, 0L), ("a", 105L, 0L), ("a", 150L, 0L),
      ("a", 300L, 1L),
      ("b", 99L, 0L), ("b", 100L, 0L), ("b", 201L, 1L), ("b", 302L, 2L))
    salted(ev, 100L) shouldBe plain(ev)
  }

  test("duplicate timestamps stay in one session") {
    val ev = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 500L)).toDF("u", "t")
    salted(ev, 10L).map(_._3) shouldBe Seq(0L, 0L, 0L, 1L)
  }
}
