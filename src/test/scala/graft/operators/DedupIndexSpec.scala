package graft.operators

import graft.SparkSpec
import graft.lake.TxLog
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[DedupIndex]] — incremental MinHash dedup against a persisted band
  * table: batch-incremental pair stream ≡ one-shot pair set, any batch
  * order, exactly-once under replay, delete-aware maintenance (a
  * deleted doc's bands are purged — the pair stream never revives it;
  * a rewritten doc re-bands).
  */
class DedupIndexSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-dedupidx").toString

  /** 30 docs; each even doc 2k has a near-dup at 2k+1 (12 words, last
    * word changed — trigram Jaccard 9/11 ≈ 0.818); odd-pair vocabularies
    * are disjoint across pairs, so the expected pair set is exactly the
    * planted one.
    */
  private def docs = (0 until 30).map { i =>
    val pair = i / 2
    val words = (0 until 11).map(j => s"w${pair}_$j") :+
      (if (i % 2 == 0) s"tail${pair}_a" else s"tail${pair}_b")
    (i.toLong, words.mkString(" "))
  }.toDF("doc_id", "text")

  private def runBatches(splits: Seq[org.apache.spark.sql.Column])
      : (String, String, Seq[(Long, Long, Double)]) = {
    val corpusRoot = tmp(); val indexRoot = tmp()
    val pairs = splits.flatMap { cond =>
      TxLog.append(spark, docs.filter(cond), corpusRoot)
      DedupIndex.update(spark, corpusRoot, indexRoot)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    }
    (corpusRoot, indexRoot, pairs)
  }

  test("batch-incremental pairs equal the one-shot pair set, under any batch order") {
    val (_, _, oneShot) = runBatches(Seq(lit(true)))
    oneShot.map(p => (p._1, p._2)).toSet shouldBe
      (0 until 30 by 2).map(k => (k.toLong, k + 1L)).toSet
    oneShot.foreach(_._3 shouldBe 0.818182 +- 1e-6)
    // three arrival batches, two different splits — same cumulative set
    val (_, _, byThirds) = runBatches(Seq(
      col("doc_id") < 10, col("doc_id") >= 10 && col("doc_id") < 20,
      col("doc_id") >= 20))
    byThirds.toSet shouldBe oneShot.toSet
    val (_, _, interleaved) = runBatches(Seq(
      col("doc_id") % 3 === 1, col("doc_id") % 3 === 2,
      col("doc_id") % 3 === 0))
    interleaved.toSet shouldBe oneShot.toSet
    // ...and each pair was emitted exactly once across batches
    byThirds.size shouldBe oneShot.size
    interleaved.size shouldBe oneShot.size
  }

  test("replay is exactly-once: a re-run after the commit landed indexes nothing and emits nothing") {
    val (corpusRoot, indexRoot, _) = runBatches(Seq(lit(true)))
    val v = TxLog.currentVersion(spark, indexRoot).get
    val wm = DedupIndex.watermark(spark, corpusRoot, indexRoot)
    wm shouldBe TxLog.currentVersion(spark, corpusRoot).get
    // the crash-replay shape: the driver re-runs the batch step after
    // the watermarked append already committed — the re-read watermark
    // covers the feed, so nothing is reprocessed or re-emitted
    DedupIndex.update(spark, corpusRoot, indexRoot).count() shouldBe 0L
    TxLog.currentVersion(spark, indexRoot).get shouldBe v
    DedupIndex.watermark(spark, corpusRoot, indexRoot) shouldBe wm
  }

  test("pairsRoot delivers every pair exactly once across batches and replays") {
    val corpusRoot = tmp(); val indexRoot = tmp(); val pairsRoot = tmp()
    Seq(col("doc_id") < 15, col("doc_id") >= 15).foreach { cond =>
      TxLog.append(spark, docs.filter(cond), corpusRoot)
      DedupIndex.update(spark, corpusRoot, indexRoot,
        pairsRoot = Some(pairsRoot)).count()
      ()
    }
    val delivered = TxLog.readLatest(spark, pairsRoot)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    delivered shouldBe (0 until 30 by 2).map(k => (k.toLong, k + 1L)).toSet
    val v = TxLog.currentVersion(spark, pairsRoot).get
    // replay: nothing re-delivered, nothing re-indexed
    DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot)).count() shouldBe 0L
    TxLog.currentVersion(spark, pairsRoot).get shouldBe v
    TxLog.readLatest(spark, pairsRoot).count() shouldBe 15L
  }

  test("racing updaters of the same batch: bands and pairs commit exactly once") {
    // two drivers replaying the same batch concurrently (the duplicated-
    // scheduler shape): the watermarked appends admit ONE winner per
    // table; the loser's appendIdempotent observes the winner's
    // watermark inside the commit loop and skips — no double-indexed
    // bands, no double-delivered pairs, both callers report the pairs
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val corpusRoot = tmp(); val indexRoot = tmp(); val pairsRoot = tmp()
    TxLog.append(spark, docs, corpusRoot)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    def attempt(): Future[Long] = Future {
      gate.await()
      DedupIndex.update(spark, corpusRoot, indexRoot,
        pairsRoot = Some(pairsRoot)).count()
    }
    val counts = Await.result(
      Future.sequence(Seq(attempt(), attempt())), 180.seconds)
    // both computed against the pre-append state: both see the pairs
    counts.foreach(_ shouldBe 15L)
    // ONE band append, ONE pairs append
    TxLog.history(spark, indexRoot).map(_.operation) shouldBe Seq("append")
    TxLog.history(spark, pairsRoot).map(_.operation) shouldBe Seq("append")
    TxLog.readLatest(spark, pairsRoot).count() shouldBe 15L
    TxLog.readLatest(spark, indexRoot).count() shouldBe
      30L * (DedupIndex.NumHashes / DedupIndex.RowsPerBand)
  }

  test("a deleted doc's bands are purged: the pair stream never revives it") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    // batch 1: evens only — every planted pair still waits on its twin
    TxLog.append(spark, docs.filter(col("doc_id") % 2 === 0), corpusRoot)
    DedupIndex.update(spark, corpusRoot, indexRoot).count() shouldBe 0L
    val bandsBefore = TxLog.readLatest(spark, indexRoot).count()
    bandsBefore shouldBe 15L * (DedupIndex.NumHashes / DedupIndex.RowsPerBand)
    // doc 0 is deleted BEFORE its twin (doc 1) arrives; the deletes-only
    // batch advances the watermark with a data-less txn mark
    TxLog.deleteVectored(spark, corpusRoot, col("doc_id") === 0L)
    DedupIndex.update(spark, corpusRoot, indexRoot).count() shouldBe 0L
    TxLog.readLatest(spark, indexRoot)
      .filter(col("doc_id") === 0L).count() shouldBe 0L
    DedupIndex.watermark(spark, corpusRoot, indexRoot) shouldBe
      TxLog.currentVersion(spark, corpusRoot).get
    // batch 2: the odd twins — every pair surfaces EXCEPT the dead one
    TxLog.append(spark, docs.filter(col("doc_id") % 2 === 1), corpusRoot)
    val pairs = DedupIndex.update(spark, corpusRoot, indexRoot)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    pairs shouldBe (2 until 30 by 2).map(k => (k.toLong, k + 1L)).toSet
    // replay after everything landed: nothing re-emitted
    DedupIndex.update(spark, corpusRoot, indexRoot).count() shouldBe 0L
  }

  test("a REWRITTEN doc re-bands: new near-dups surface, stale ones do not") {
    val (corpusRoot, indexRoot, oneShot) = runBatches(Seq(lit(true)))
    oneShot.size shouldBe 15
    // doc 3 (twin of 2) is rewritten into pair 0's vocabulary: its old
    // bands must leave the table (no re-emission against doc 2) and its
    // new bands must pair it with BOTH members of pair 0
    val newText = ((0 until 11).map(j => s"w0_$j") :+ "tail0_c").mkString(" ")
    TxLog.updateVectored(spark, corpusRoot, col("doc_id") === 3L,
      Map("text" -> lit(newText)))
    val pairs = DedupIndex.update(spark, corpusRoot, indexRoot)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((0L, 3L), (1L, 3L))
    TxLog.readLatest(spark, indexRoot).filter(col("doc_id") === 3L)
      .count() shouldBe (DedupIndex.NumHashes / DedupIndex.RowsPerBand).toLong
  }

  test("maintain() packs the band table; watermark, purge, and pair stream survive") {
    val corpusRoot = tmp(); val indexRoot = tmp(); val pairsRoot = tmp()
    // five arrival batches fragment the band table to >= 5 small files
    (0 until 5).foreach { b =>
      TxLog.append(spark, docs.filter(col("doc_id") % 5 === b), corpusRoot)
      DedupIndex.update(spark, corpusRoot, indexRoot,
        pairsRoot = Some(pairsRoot)).count()
      ()
    }
    // a takedown leaves a deletion vector on the band table
    TxLog.deleteVectored(spark, corpusRoot, col("doc_id") === 0L)
    DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot)).count() shouldBe 0L
    val filesBefore = TxLog.liveSizes(spark, indexRoot).size
    filesBefore should be >= 5
    DedupIndex.maintain(spark, indexRoot, pairsRoot = Some(pairsRoot))
    // bin-packed, DV materialized away with it
    TxLog.liveSizes(spark, indexRoot).size should be < filesBefore
    val bands = TxLog.readLatest(spark, indexRoot)
    bands.count() shouldBe
      29L * (DedupIndex.NumHashes / DedupIndex.RowsPerBand)
    bands.filter(col("doc_id") === 0L).count() shouldBe 0L
    // the watermark txns rode the checkpoints: a replay after maintenance
    // indexes nothing and re-delivers nothing
    DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot)).count() shouldBe 0L
    TxLog.readLatest(spark, pairsRoot).count() shouldBe 15L
    // and the packed index still discovers pairs for the NEXT batch —
    // a fresh doc in pair 1's vocabulary pairs with both living members
    val text = ((0 until 11).map(j => s"w1_$j") :+ "tail1_c").mkString(" ")
    TxLog.append(spark, Seq((100L, text)).toDF("doc_id", "text"),
      corpusRoot)
    DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot))
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .toSet shouldBe Set((2L, 100L), (3L, 100L))
    // a SECOND pass truncates the raw log (the first pass's checkpoint
    // is now an old-enough horizon) without breaking the watermark:
    // replay still indexes nothing after raw entries below it are gone
    TxLog.checkpointVersions(spark, indexRoot) should not be empty
    TxLog.history(spark, indexRoot).head.version shouldBe 0L
    DedupIndex.maintain(spark, indexRoot, pairsRoot = Some(pairsRoot))
    TxLog.history(spark, indexRoot).head.version should be > 0L
    DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot)).count() shouldBe 0L
    TxLog.readLatest(spark, pairsRoot).count() shouldBe 17L
    // a deletes-only batch right after the checkpointed maintenance:
    // the data-less txn mark must ride the RESOLVED schema — the raw
    // tail above the fresh checkpoint is empty, and failing here would
    // wedge the watermark forever
    TxLog.deleteVectored(spark, corpusRoot, col("doc_id") === 2L)
    DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot)).count() shouldBe 0L
    DedupIndex.watermark(spark, corpusRoot, indexRoot) shouldBe
      TxLog.currentVersion(spark, corpusRoot).get
  }

  test("a corpus OPTIMIZE between batches re-delivers nothing (relayouts are not churn)") {
    val corpusRoot = tmp(); val indexRoot = tmp(); val pairsRoot = tmp()
    TxLog.append(spark, docs, corpusRoot)
    DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot)).count() shouldBe 15L
    val bandRows = TxLog.readLatest(spark, indexRoot).count()
    // nightly maintenance rewrites every corpus file (fragment first so
    // the compact has something to pack) — the feed must not echo the
    // whole corpus as delete+insert into the index step
    TxLog.compact(spark, corpusRoot, smallerThanBytes = 1L << 30)
    DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot)).count() shouldBe 0L
    // no re-banding, no pair re-delivery, watermark advanced past the
    // relayout commit
    TxLog.readLatest(spark, indexRoot).count() shouldBe bandRows
    TxLog.readLatest(spark, pairsRoot).count() shouldBe 15L
    DedupIndex.watermark(spark, corpusRoot, indexRoot) shouldBe
      TxLog.currentVersion(spark, corpusRoot).get
  }

  test("a stale delete phase cannot remove re-banded rows (the losing-racer / replay shape)") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, docs, corpusRoot)
    DedupIndex.update(spark, corpusRoot, indexRoot).count() shouldBe 15L
    val wmOld = DedupIndex.watermark(spark, corpusRoot, indexRoot)
    // doc 3 is REWRITTEN; the winner completes the whole step (old bands
    // purged, new bands fenced-appended at the new watermark)
    val newText =
      ((0 until 11).map(j => s"w0_$j") :+ "tail0_c").mkString(" ")
    TxLog.updateVectored(spark, corpusRoot, col("doc_id") === 3L,
      Map("text" -> lit(newText)))
    DedupIndex.update(spark, corpusRoot, indexRoot)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .toSet shouldBe Set((0L, 3L), (1L, 3L))
    val perDoc = (DedupIndex.NumHashes / DedupIndex.RowsPerBand).toLong
    TxLog.readLatest(spark, indexRoot).filter(col("doc_id") === 3L)
      .count() shouldBe perDoc
    // NOW the racing loser (or a crash-replay) re-runs its DELETE phase
    // with the OLD watermark — its feed said delete(3), but bounded at
    // indexed_v <= wmOld it must match NOTHING: the winner's re-banded
    // rows carry the newer version (unbounded, this purge left doc 3
    // permanently unindexed — the silent-corruption interleaving)
    AnnIndex.deleteIdsChunked(spark, indexRoot, "doc_id",
      Seq(3L).toDF("doc_id"), atOrBelowV = wmOld)
    TxLog.readLatest(spark, indexRoot).filter(col("doc_id") === 3L)
      .count() shouldBe perDoc
    // the rewritten doc is still findable, not a phantom
    TxLog.append(spark,
      Seq((200L, newText + " extra")).toDF("doc_id", "text"), corpusRoot)
    DedupIndex.update(spark, corpusRoot, indexRoot)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .toSet should contain((3L, 200L))
  }

  test("a crash between the pairs and band commits replays without re-delivering") {
    val corpusRoot = tmp(); val indexRoot = tmp(); val pairsRoot = tmp()
    TxLog.append(spark, docs.filter(col("doc_id") % 2 === 0), corpusRoot)
    DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot)).count() shouldBe 0L
    // batch 2 arrives; the 'crashed' updater landed its PAIRS commit
    // (simulated by a sentinel row under the same fenced txn) but died
    // before the band commit...
    TxLog.append(spark,
      docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 15),
      corpusRoot)
    val v1 = TxLog.currentVersion(spark, corpusRoot).get
    TxLog.appendIdempotent(spark,
      Seq((-1L, -1L, 0.0)).toDF("doc_a", "doc_b", "jaccard"), pairsRoot,
      DedupIndex.appId(corpusRoot), v1)
    // ...and the corpus advances BEFORE the replay — the one-step replay
    // would re-deliver batch 2's pairs (its fence sits below the head)
    TxLog.append(spark,
      docs.filter(col("doc_id") % 2 === 1 && col("doc_id") >= 15),
      corpusRoot)
    val returned = DedupIndex.update(spark, corpusRoot, indexRoot,
      pairsRoot = Some(pairsRoot))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the caller re-receives the whole catch-up's pairs...
    returned shouldBe (0 until 30 by 2).map(k => (k.toLong, k + 1L)).toSet
    // ...but DELIVERY stays exactly-once: batch 2's slot holds only what
    // the crashed run delivered; batch 3's pairs landed exactly once
    val delivered = TxLog.readLatest(spark, pairsRoot)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    delivered.size shouldBe delivered.toSet.size
    delivered.toSet shouldBe
      Set((-1L, -1L)) ++ (14 until 30 by 2).map(k => (k.toLong, k + 1L))
    // and every doc's bands landed exactly once across the two sub-steps
    TxLog.readLatest(spark, indexRoot).groupBy("doc_id").count()
      .filter(col("count") =!=
        (DedupIndex.NumHashes / DedupIndex.RowsPerBand).toLong)
      .count() shouldBe 0L
  }

  test("cross-batch pairs are found when the LATER member arrives") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    // batch 1: only the even halves — no pairs yet
    TxLog.append(spark, docs.filter(col("doc_id") % 2 === 0), corpusRoot)
    DedupIndex.update(spark, corpusRoot, indexRoot).count() shouldBe 0L
    // batch 2: the odd twins — every planted pair surfaces now
    TxLog.append(spark, docs.filter(col("doc_id") % 2 === 1), corpusRoot)
    val pairs = DedupIndex.update(spark, corpusRoot, indexRoot)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    pairs shouldBe (0 until 30 by 2).map(k => (k.toLong, k + 1L)).toSet
  }
}
