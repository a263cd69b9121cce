package graft.lake

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.current_timestamp

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.control.NonFatal
import scala.util.{Failure, Success, Try}

/** Driver-level orchestration (SURVEY.md §2A O-25): the reference fans a
  * PO list out through a Step Functions Map state with MaxConcurrency 5
  * and a per-branch retry of 5 attempts at 2.0 backoff
  * (serverless.yml:157-169, 202-207). Here the same semantics are a
  * bounded `Future` pool plus a retry wrapper, typically driving N
  * parallel [[Promote.promote]] calls against one SparkSession —
  * concurrent Spark actions from different threads schedule fine, and the
  * bound keeps N incremental loads from flooding the cluster, exactly
  * like the reference's MaxConcurrency.
  *
  * This is deliberately NOT a Spark-internal operator (the engine's
  * parallelism lives in its plans); it completes the EP-2 end-to-end
  * story: Athena query -> PO list -> bounded parallel ingest+promote.
  */
object Orchestrate {

  /** The reference's map-branch retry shape: `maxAttempts` total tries,
    * delays growing by `backoff` from `initialDelayMs`
    * (serverless.yml:202-207: IntervalSeconds 20, BackoffRate 2.0,
    * MaxAttempts 5 — defaults here scale the interval down to something a
    * library caller will override anyway).
    */
  final case class RetryPolicy(maxAttempts: Int = 5,
                               initialDelayMs: Long = 1000L,
                               backoff: Double = 2.0) {
    require(maxAttempts >= 1 && initialDelayMs >= 0 && backoff >= 1.0)
  }

  /** Run `f` over `items` with at most `maxConcurrency` in flight, each
    * item retried per `policy`. Returns per-item results in input order —
    * a Failure carries the LAST attempt's error; one item's failure never
    * cancels the others (the reference's map branches are independent).
    */
  def mapBounded[A, B](items: Seq[A], maxConcurrency: Int = 5,
                       policy: RetryPolicy = RetryPolicy())
                      (f: A => B): Seq[Try[B]] = {
    require(maxConcurrency >= 1, "need at least one worker")
    if (items.isEmpty) return Seq.empty
    val pool = Executors.newFixedThreadPool(math.min(maxConcurrency, items.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val fs = items.map(a => Future(withRetry(policy)(f(a))))
      // lift each future to Try so Future.sequence never short-circuits
      Await.result(
        Future.sequence(fs.map(_.map(Success(_)).recover { case e => Failure(e) })),
        Duration.Inf)
    } finally pool.shutdown()
  }

  /** `body` retried per `policy`; rethrows the last error when attempts
    * are exhausted. Only NonFatal errors retry.
    */
  def withRetry[B](policy: RetryPolicy)(body: => B): B = {
    var attempt = 1
    var delayMs = policy.initialDelayMs
    while (true) {
      try return body
      catch {
        case NonFatal(e) =>
          if (attempt >= policy.maxAttempts) throw e
          Thread.sleep(delayMs)
          delayMs = (delayMs * policy.backoff).toLong
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** EP-2's terminal stage: promote N staged tables in parallel under the
    * concurrency bound. Returns table -> promote outcome.
    */
  def promoteAll(spark: SparkSession, zones: Zones, tables: Seq[String],
                 asOf: Column = current_timestamp(),
                 maxConcurrency: Int = 5,
                 policy: RetryPolicy = RetryPolicy())
      : Seq[(String, Try[Option[Promote.Result]])] =
    tables.zip(mapBounded(tables, maxConcurrency, policy)(t =>
      Promote.promote(spark, zones, t, asOf)))
}
