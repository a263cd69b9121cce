package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.lake.TxLog

/** INCREMENTAL corpus deduplication — the single most common LLM-pipeline
  * loop, as a lake operator: a persisted MinHash band table that each new
  * corpus batch probes and extends. Per-batch cost is O(delta) shingling
  * + one SHUFFLE-FREE streamed scan of the band table (the batch's bands
  * are the broadcast side of the probe join; 8-byte hash rows, a
  * fraction of re-shingling the corpus) — never a whole-corpus text
  * recompute (the in-session q37 re-shingles everything per run; at
  * 100 TB that is a daily full-scan job for a few-GB delta). Measured
  * (graft.IndexLadder, BASELINE.md "Persistent index ladder"): at a
  * 100x corpus the delta batch costs 0.44x the full recompute, and the
  * gap widens with corpus size since the recompute's shingling is the
  * heavy term.
  *
  * The band table at `indexRoot` is a graft table
  * (band INT, bsig BIGINT, doc_id LONG, indexed_v LONG — the corpus
  * version the row was indexed at, the delete fence's bound) — one row
  * per (document, LSH band). It stores NO shingle arrays: candidate
  * verification re-shingles
  * exactly the candidate documents from the corpus by id (bounded by the
  * collision count). Same S-curve as q37 (64 hashes × bands of 2 — the
  * candidate probability at the verify threshold itself is ~0.9999, see
  * queries/Text.scala's band-shape note), so the incremental pair stream
  * equals the full-recompute pair set exactly (oracle q124 pins this).
  *
  * [[update]] is the exactly-once batch step the reference's
  * `{t}_incremental` staging pattern implies (utils.py:111-114) composed
  * with MinHash: read the index's corpus-version watermark (a commit-log
  * transaction — `appId(corpusRoot)`), reduce the change feed above it
  * to its NET effect — every id the feed deleted is vector-deleted from
  * the band table (idempotent O(deleted rows) commits: a removed doc
  * must stop matching future batches, the phantom-pair path), rewritten
  * docs re-band — then shingle + band only the feed's final-state
  * inserts, probe the persisted bands plus the batch's own (both
  * equi-joins on (band, bsig)), verify candidates by exact Jaccard, and
  * append the batch's band rows in ONE watermarked commit (a
  * deletes-only batch advances the watermark with a data-less txn mark
  * instead). A crash-replay re-reads the same watermark: deletes match
  * nothing, the appends dedup on their txn — no batch is ever
  * double-indexed. Pair DELIVERY: the returned frame is recomputed
  * deterministically only while the band commit has not landed; a crash
  * AFTER it but before the caller consumed the frame would drop that
  * batch's pairs — callers needing exactly-once pair delivery pass
  * `pairsRoot`, and the pairs are appended there (same corpus-version
  * transaction, committed BEFORE the band extension) so every crash
  * point replays into the same state: pairs committed once, bands
  * committed once. Pairs ALREADY DELIVERED for a doc that is later
  * deleted stay in the stream — they were true when emitted; what the
  * deletion guarantees is that no FUTURE batch pairs against the
  * deleted doc.
  */
object DedupIndex {

  /** q37's LSH shape — see the band-width rationale in queries/Text. */
  val NumHashes = 64
  val RowsPerBand = 2

  private[operators] def appId(corpusRoot: String): String =
    s"graft-dedup-index::$corpusRoot"

  /** The indexed-through corpus version (-1 before the first update). */
  def watermark(spark: SparkSession, corpusRoot: String,
                indexRoot: String): Long =
    TxLog.txnWatermark(spark, indexRoot, appId(corpusRoot)).getOrElse(-1L)

  /** One incremental step: index every corpus commit above the
    * watermark and return the VERIFIED near-dup pairs the delta
    * introduced — (doc_a, doc_b, jaccard) with doc_a < doc_b, exact
    * trigram-shingle Jaccard >= `threshold`; both batch-vs-indexed and
    * within-batch pairs. Empty when the corpus has nothing new. The
    * result's scans are snapshot-pinned at call time, so it reads the
    * same even when consumed after later appends (maintenance that
    * REMOVES files — compact/vacuum — invalidates it, like any held
    * snapshot).
    */
  def update(spark: SparkSession, corpusRoot: String, indexRoot: String,
             threshold: Double = 0.5, idCol: String = "doc_id",
             textCol: String = "text",
             pairsRoot: Option[String] = None): DataFrame = {
    val head = TxLog.currentVersion(spark, corpusRoot).getOrElse(
      throw new IllegalArgumentException(
        s"dedup index update: no committed corpus at $corpusRoot"))
    val wm = watermark(spark, corpusRoot, indexRoot)
    val splitAt = pairsRoot
      .map(pr => TxLog.txnWatermark(spark, pr, appId(corpusRoot))
        .getOrElse(-1L))
      .filter(pv => pv > wm && pv < head)
    splitAt match {
      case Some(pv) =>
        // TORN WINDOW: a crashed update delivered pairs through `pv`
        // but died before its band commit, and the corpus has since
        // moved on. Processing (wm, head] in one step would re-deliver
        // that batch's pairs (the pairs fence is below head). Replay
        // THAT batch to its OWN boundary first — its pairs append
        // self-fences, its band append lands — then the remainder.
        val first = updateStep(spark, corpusRoot, indexRoot, threshold,
          idCol, textCol, pairsRoot, pv, wm)
        // first's band commit moved the watermark to pv
        val second = updateStep(spark, corpusRoot, indexRoot, threshold,
          idCol, textCol, pairsRoot, head,
          watermark(spark, corpusRoot, indexRoot))
        first.unionByName(second)
      case None =>
        updateStep(spark, corpusRoot, indexRoot, threshold, idCol,
          textCol, pairsRoot, head, wm)
    }
  }

  private def updateStep(spark: SparkSession, corpusRoot: String,
                         indexRoot: String, threshold: Double,
                         idCol: String, textCol: String,
                         pairsRoot: Option[String],
                         corpusV: Long, wm: Long): DataFrame = {
    import spark.implicits._
    def emptyPairs =
      Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "jaccard")
    if (corpusV <= wm) return emptyPairs
    val feed = TxLog.readChanges(spark, corpusRoot, wm, Some(corpusV))
    // net effect per doc: deleted ids leave the band table BEFORE the
    // probe below reads it (a phantom band row would pair a dead doc
    // with every future near-dup of it), rewritten docs re-band
    val (removedIds, upserts) = AnnIndex.netFeed(feed, idCol)
    val indexExists = wm >= 0 &&
      TxLog.currentVersion(spark, indexRoot).isDefined
    if (indexExists)
      // bounded at the watermark: a racing loser or a crash-replay can
      // never delete band rows a fenced append landed at a newer
      // indexed_v (the rewritten-doc race — see deleteIdsChunked)
      AnnIndex.deleteIdsChunked(spark, indexRoot, "doc_id", removedIds,
        atOrBelowV = wm)
    val newDocs = upserts.select(col(idCol).as("doc_id"), col(textCol))
    val newBands = newDocs
      .select(col("doc_id"),
        posexplode(TextHash.minHashBandsf(
          TextHash.shingleHashf(col(textCol)), NumHashes, RowsPerBand))
          .as(Seq("band", "bsig")))
      .select("band", "bsig", "doc_id")
      .cache()
    try {
      val existing =
        if (!indexExists) newBands.limit(0)
        else TxLog.readLatest(spark, indexRoot)
          .select("band", "bsig", "doc_id")
      // batch bands probe (indexed ∪ batch): equi-join on (band, bsig),
      // the only shuffle key — bounded collisions, never all-pairs
      val target = existing.unionByName(newBands)
      val cand = newBands.as("a")
        .join(target.as("b"),
          col("a.band") === col("b.band") &&
            col("a.bsig") === col("b.bsig") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      // verify by EXACT Jaccard, re-shingling only the candidate docs
      // from the corpus snapshot (id equi-join — candidate-bounded;
      // the post-delete snapshot, so a candidate against a just-deleted
      // doc drops out here too — double protection with the band purge)
      val candIds = cand
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val candSigs = TxLog.readLatest(spark, corpusRoot)
        .select(col(idCol).as("doc_id"), col(textCol))
        .join(candIds, "doc_id")
        .select(col("doc_id"),
          TextHash.shingleHashf(col(textCol)).as("shs"))
        .withColumn("n_sh", size(col("shs")).cast("long"))
      val a = candSigs.select(col("doc_id").as("doc_a"),
        col("shs").as("sh_a"), col("n_sh").as("n_a"))
      val b = candSigs.select(col("doc_id").as("doc_b"),
        col("shs").as("sh_b"), col("n_sh").as("n_b"))
      val pairs = cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("inter",
          TextHash.intersectCountf(col("sh_a"), col("sh_b")))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"),
          round(col("jaccard"), 6).as("jaccard"))
        .distinct()
        .orderBy("doc_a", "doc_b")
      // the returned frame stays correct after the append below (and any
      // later corpus/index commits): every TxLog scan above resolved its
      // snapshot EAGERLY at call time, so the plan's file set is pinned —
      // re-evaluation re-reads those files, never the extended tables
      // exactly-once pair delivery (optional): committed BEFORE the band
      // extension under the same corpus-version transaction — a crash
      // between the two replays the batch (index watermark still old)
      // and the pairs append skips itself. The pipeline behind `pairs`
      // (probe + verify) is the batch's whole cost: persist it so the
      // emptiness gate, the append, and the caller's consumption run it
      // ONCE (the ContextCleaner reaps the cache when the frame dies)
      pairsRoot.foreach { pr =>
        pairs.persist()
        if (pairs.count() > 0)
          TxLog.appendIdempotent(spark, pairs, pr,
            appId(corpusRoot), corpusV)
      }
      // ONE watermarked commit extends the index; replay-safe. A batch
      // with no band rows (deletes-only, or every doc too short to
      // shingle) still advances the watermark — with a DATA-LESS txn
      // mark (an empty append would plant a stat-less file), and only
      // once the table exists to carry it
      if (newBands.limit(1).count() > 0)
        TxLog.appendIdempotent(spark,
          newBands.withColumn("indexed_v", lit(corpusV)), indexRoot,
          appId(corpusRoot), corpusV)
      else if (indexExists)
        TxLog.commitTxnMark(spark, indexRoot, appId(corpusRoot), corpusV)
      pairs
    } finally { newBands.unpersist(); () }
  }

  /** Periodic self-maintenance for the index's OWN tables: every batch
    * appends one commit and one small band file forever, so after
    * hundreds of batches the probe scan pays a small-file flood and
    * every update pays a long log tail. This bin-packs the band files
    * (compact — which also materializes takedown deletion vectors
    * away), checkpoints, reclaims files older than `keepVersions`
    * snapshots, and truncates the raw log down to a horizon that keeps
    * those snapshots readable ([[graft.lake.TxLog.maintain]] — on a
    * table's first pass truncation waits for the next one). Run it on
    * whatever cadence fits the batch rate (e.g. every 100 updates);
    * `graft.IndexLadder`'s maintenance rung measures the probe wall
    * staying flat. Note: like any compact/vacuum, this invalidates
    * snapshot-pinned frames still held from earlier [[update]] calls —
    * consume the pair stream first. The watermark transactions survive
    * (they ride checkpoints).
    */
  def maintain(spark: SparkSession, indexRoot: String,
               pairsRoot: Option[String] = None,
               smallerThanBytes: Long = 64L << 20,
               keepVersions: Int = 2): Unit =
    (Seq(indexRoot) ++ pairsRoot).foreach(
      TxLog.maintain(spark, _, smallerThanBytes, keepVersions))
}
