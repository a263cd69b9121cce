package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import scala.util.{Failure, Success}

/** O-25 orchestration: bounded fan-out concurrency + retry/backoff
  * (reference serverless.yml:157-169, 202-207 semantics).
  */
class OrchestrateSpec extends SparkSpec {

  import spark.implicits._

  private val fastRetry = Orchestrate.RetryPolicy(
    maxAttempts = 5, initialDelayMs = 1L, backoff = 2.0)

  test("concurrency never exceeds the bound; all items complete in order") {
    val inFlight = new AtomicInteger(0)
    val highWater = new AtomicInteger(0)
    val results = Orchestrate.mapBounded((1 to 40).toSeq, maxConcurrency = 5) { i =>
      val now = inFlight.incrementAndGet()
      highWater.getAndUpdate(h => math.max(h, now))
      Thread.sleep(5)
      inFlight.decrementAndGet()
      i * 10
    }
    highWater.get() should be <= 5
    highWater.get() should be > 1 // it actually ran in parallel
    results.map(_.get) shouldBe (1 to 40).map(_ * 10)
  }

  test("a transient failure is retried with backoff and then succeeds") {
    val attempts = new AtomicInteger(0)
    val result = Orchestrate.mapBounded(Seq("item"), 2, fastRetry) { _ =>
      if (attempts.incrementAndGet() < 3) sys.error("transient")
      "ok"
    }
    result.head shouldBe Success("ok")
    attempts.get() shouldBe 3
  }

  test("a persistent failure surfaces the last error after maxAttempts, without cancelling siblings") {
    val attempts = new AtomicInteger(0)
    val results = Orchestrate.mapBounded(Seq("bad", "good"), 2, fastRetry) {
      case "bad"  => attempts.incrementAndGet(); sys.error("always down")
      case "good" => "ok"
    }
    attempts.get() shouldBe 5
    results.head match {
      case Failure(e) => e.getMessage shouldBe "always down"
      case other      => fail(s"expected Failure, got $other")
    }
    results(1) shouldBe Success("ok")
  }

  test("promoteAll drives parallel promotes end-to-end (EP-2 terminal stage)") {
    val zones = Zones(Files.createTempDirectory("graft-orch").toString)
    val tables = Seq("po_a", "po_b", "po_c")
    tables.zipWithIndex.foreach { case (t, i) =>
      Seq(s"""{"po":"P-$i","qty":"${i + 1}"}""").toDF("value")
        .write.mode("append").text(zones.stagingIncremental(t))
    }
    val out = Orchestrate.promoteAll(spark, zones, tables,
      asOf = to_timestamp(lit("2026-04-01 00:00:00")),
      maxConcurrency = 2, policy = fastRetry)
    out.map(_._1) shouldBe tables
    out.foreach { case (t, r) =>
      r.get.get.rows shouldBe 1L
      Writer.readCurated(spark, zones.curated(t)).count() shouldBe 1L
    }
  }
}
