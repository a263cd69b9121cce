package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.lake.TxLog

/** PERSISTED IVF×PQ ANN index over a commit-log corpus table — the lake
  * artifact the in-session ANN family (graft.queries.Similarity) memoizes
  * per JVM. At 100 TB the index build is a batch job whose outputs must
  * outlive every session and version against the corpus; this operator
  * materializes them as four graft tables under `indexRoot`:
  *
  *   - `centroids`  (cell INT, ce ARRAY<FLOAT>, cenorm DOUBLE) — the IVF
  *     coarse quantizer, metadata-sized, broadcast at search time.
  *   - `codebook`   (sub INT, idx INT, vals ARRAY<FLOAT>) — the PQ
  *     codebooks, m*k rows, driver-loaded at search time.
  *   - `codes`      (vec_id LONG, cell INT, codes BINARY, cnorm DOUBLE) —
  *     one row per corpus vector: its IVF cell and byte-packed PQ codes.
  *     NO raw embeddings: the scan search pays is m bytes/row (16x
  *     smaller than the fixture's 64-float vectors); exact re-rank
  *     fetches only the shortlist's embeddings from the corpus by id.
  *   - `meta`       one row: (epoch, corpus_version, n_cells, m, k,
  *     rows_at_train, churn_since_train) — the index's consistency and
  *     progress record (below).
  *
  * CONSISTENCY ACROSS THE FOUR TABLES — the build epoch: [[build]] cannot
  * replace four independent commit logs atomically, so every table's
  * build commit carries a shared monotone epoch as a txn watermark
  * (`EpochApp`) and the `meta` row — committed LAST — records the epoch
  * the set is complete at. [[refresh]] and [[search]] verify every
  * table's epoch watermark equals meta's before trusting the artifacts:
  * a crash inside build() leaves SOME tables at epoch e+1 under a meta
  * still at e (or a meta at e+1 the codes never reached — impossible,
  * meta is last), which fails loudly with "re-run build()" instead of
  * silently mixing new quantizers with stale codes (the
  * permanent-recall-corruption window a naive last-table-wins ordering
  * has). build() is idempotent, so recovery is exactly that re-run.
  *
  * Versioning against the corpus: `meta.corpus_version` IS the indexed
  * watermark (committed only after the codes are in place, so a torn
  * refresh replays). [[refresh]] feeds the corpus change feed above it
  * through the EXISTING centroids + codebooks and appends the new rows
  * idempotently (the codes append carries its own (appId, corpusV) txn,
  * so a crash-replay never double-indexes), then advances the meta
  * watermark. Corpus DELETES and REWRITES are consumed, not refused:
  * every id the feed deleted is vector-deleted from `codes`
  * (idempotent deletion-vector commits, O(deleted rows)), and rewritten
  * ids re-encode through the append — maintenance stays O(delta) under
  * takedowns and GDPR deletes instead of degrading to a rebuild. When
  * the CUMULATIVE churn since the last (re)train
  * (`meta.churn_since_train`, adds + removes) drifts past `retrainAt`
  * of the corpus, refresh retrains from the full corpus — the
  * drift-triggered retrain hook (deletions drift the quantizers exactly
  * like insertions: the trained distribution is gone either way).
  *
  * Search never trains: a FRESH session loads the tables and runs
  * probe-cells → ADC shortlist → exact re-rank (the
  * [[graft.queries.Similarity.ivfPqTopK]] pipeline with the candidate
  * scan reading the persisted codes and the re-rank joining the corpus).
  */
object AnnIndex {

  def centroidsRoot(indexRoot: String): String = s"$indexRoot/centroids"
  def codebookRoot(indexRoot: String): String = s"$indexRoot/codebook"
  def codesRoot(indexRoot: String): String = s"$indexRoot/codes"
  def metaRoot(indexRoot: String): String = s"$indexRoot/meta"

  private def appId(corpusRoot: String): String =
    s"graft-ann-index::$corpusRoot"

  /** The shared build-epoch txn app: every artifact table's build commit
    * carries (EpochApp, epoch), and meta records the epoch the set is
    * complete at — the cross-table torn-build detector.
    */
  private[graft] val EpochApp = "graft-ann-epoch"

  /** What [[refresh]] did: rows newly indexed, rows vector-deleted from
    * the codes, total indexed rows after, and whether drift triggered a
    * full retrain.
    */
  final case class Refresh(added: Long, removed: Long, total: Long,
                           retrained: Boolean)

  /** The meta table's single row. */
  private final case class Meta(epoch: Long, corpusVersion: Long,
                                nCells: Int, m: Int, k: Int,
                                rowsAtTrain: Long, churnSinceTrain: Long)

  private def readMetaOpt(spark: SparkSession,
                          indexRoot: String): Option[Meta] =
    if (TxLog.currentVersion(spark, metaRoot(indexRoot)).isEmpty) None
    else TxLog.readLatest(spark, metaRoot(indexRoot))
      .select("epoch", "corpus_version", "n_cells", "m", "k",
        "rows_at_train", "churn_since_train")
      .collect().headOption.map(r => Meta(r.getLong(0), r.getLong(1),
        r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6)))

  private def writeMeta(spark: SparkSession, indexRoot: String,
                        m: Meta): Unit = {
    import spark.implicits._
    TxLog.overwrite(spark,
      Seq((m.epoch, m.corpusVersion, m.nCells, m.m, m.k, m.rowsAtTrain,
        m.churnSinceTrain))
        .toDF("epoch", "corpus_version", "n_cells", "m", "k",
          "rows_at_train", "churn_since_train"),
      metaRoot(indexRoot), txn = Some((EpochApp, m.epoch)))
    ()
  }

  /** Verify the artifact set is epoch-coherent (every table's build
    * watermark equals meta's epoch) and return the meta row — the gate
    * every read of the artifacts passes through. A mismatch means a
    * crash interrupted [[build]] between table replaces; the fix is
    * named because it is the whole fix.
    */
  private def coherentMeta(spark: SparkSession, indexRoot: String): Meta = {
    val meta = readMetaOpt(spark, indexRoot).getOrElse(
      throw new IllegalStateException(
        s"ANN index at $indexRoot has no meta table — run build() first"))
    Seq(centroidsRoot(indexRoot), codebookRoot(indexRoot),
      codesRoot(indexRoot)).foreach { r =>
      val e = TxLog.txnWatermark(spark, r, EpochApp).getOrElse(-1L)
      if (e != meta.epoch)
        throw new IllegalStateException(
          s"ANN index at $indexRoot is epoch-torn ($r at build epoch $e, " +
            s"meta at ${meta.epoch}) — a crash interrupted build(); " +
            "re-run build() to restore a coherent artifact set")
    }
    meta
  }

  private def normed(corpus: DataFrame, idCol: String,
                     vecCol: String): DataFrame =
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("nrm", VecOps.normf(col("embedding")))
      .filter(col("nrm") > 0)

  /** Build (or rebuild) the index from the corpus table's CURRENT
    * snapshot: train the coarse quantizer and PQ codebooks on bounded
    * samples (the FAISS rule — quality needs thousands of points, not
    * the corpus), encode every vector, and replace all four tables
    * under a fresh shared epoch (meta LAST — the commit that declares
    * the set coherent). Returns the corpus version the index now
    * summarizes. Idempotent: a crash mid-build leaves an epoch-torn set
    * every reader refuses until build() is re-run.
    */
  def build(spark: SparkSession, corpusRoot: String, indexRoot: String,
            nCells: Int, m: Int = 16, k: Int = 32,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): Long = {
    import spark.implicits._
    val corpusV = TxLog.currentVersion(spark, corpusRoot).getOrElse(
      throw new IllegalArgumentException(
        s"ANN index build: no committed corpus at $corpusRoot"))
    // next epoch: strictly above BOTH the last coherent epoch and any
    // torn table's watermark (a crashed build may have left a single
    // table ahead of meta — the new epoch must supersede it everywhere)
    val epoch = (Seq(centroidsRoot(indexRoot), codebookRoot(indexRoot),
      codesRoot(indexRoot)).map(r =>
      TxLog.txnWatermark(spark, r, EpochApp).getOrElse(0L)) ++
      readMetaOpt(spark, indexRoot).map(_.epoch).toSeq).max + 1
    val embs = normed(TxLog.readLatest(spark, corpusRoot), idCol, vecCol)
      .cache()
    try {
      val total = embs.count()
      val centroids = graft.queries.Similarity.trainCentroids(embs, nCells)
      val cb = graft.queries.Similarity.trainPqCodebooks(embs, m, k)
      val cbDf = cb.iterator.zipWithIndex.flatMap { case (sub, j) =>
        sub.iterator.zipWithIndex.map { case (cent, i) =>
          (j, i, cent.toSeq)
        }
      }.toSeq.toDF("sub", "idx", "vals")
      TxLog.overwrite(spark, centroids, centroidsRoot(indexRoot),
        txn = Some((EpochApp, epoch)))
      TxLog.overwrite(spark, cbDf, codebookRoot(indexRoot),
        txn = Some((EpochApp, epoch)))
      // statsCols: vec_id bounds ride every file so searches by id
      // range could prune; the epoch txn stamps the build generation
      // (the corpus watermark lives in meta — the codes append txn slot
      // stays free for refresh's exactly-once delta commits)
      // indexed_v: the corpus version each row was indexed at — the
      // delete fence's lower bound (deleteIdsChunked)
      TxLog.overwrite(spark,
        encode(embs, centroids, cb).withColumn("indexed_v", lit(corpusV)),
        codesRoot(indexRoot), statsCols = Seq("vec_id"),
        txn = Some((EpochApp, epoch)))
      // meta LAST: its epoch declares the set coherent; every earlier
      // crash point leaves a detectable mismatch, never a mixed index
      writeMeta(spark, indexRoot,
        Meta(epoch, corpusV, nCells, m, k, total, 0L))
      corpusV
    } finally { embs.unpersist(); () }
  }

  /** Assign to the single nearest cell and byte-pack the PQ codes — the
    * shared encode of [[build]] and [[refresh]] (scan-time projections,
    * no shuffle beyond the broadcast centroid join).
    */
  private def encode(embs: DataFrame, centroids: DataFrame,
                     cb: Array[Array[Array[Float]]]): DataFrame = {
    val m = cb.length
    val k = cb(0).length
    val flat = cb.flatten.flatten
    graft.queries.Similarity.ivfCells(
      embs.select(col("vec_id").as("cand_id"), col("embedding"),
        col("nrm").as("cnorm")),
      centroids, "cand_id", "embedding", "cnorm", keep = 1)
      .withColumn("codes", VecOps.pqEncodef(
        transform(col("embedding"), x => (x / col("cnorm")).cast("float")),
        flat, m, k))
      .select(col("cand_id").as("vec_id"), col("cell"), col("codes"),
        col("cnorm"))
  }

  /** Driver-load the persisted codebooks (m*k rows — metadata-sized). */
  private def loadCodebooks(spark: SparkSession,
                            indexRoot: String): Array[Array[Array[Float]]] =
    TxLog.readLatest(spark, codebookRoot(indexRoot))
      .select("sub", "idx", "vals").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray)
      }.toArray

  /** Vector-delete `ids` ((id LONG) single-column frame) from the rows of
    * `root` whose `idCol` matches AND whose `indexed_v` is at or below
    * `atOrBelowV` — streamed to the driver in bounded chunks so the
    * predicate never holds more than `chunk` ids, each chunk one
    * idempotent deletion-vector commit (O(matched rows), the
    * sparse-delete path). Shared by the index maintainers: delete feeds
    * are takedown-sized, but "bounded" is enforced, not assumed.
    *
    * The `indexed_v` bound (every index row carries the corpus version
    * it was indexed at) is the RACE AND REPLAY fence for rewritten ids:
    * without it, a racing updater that lost the watermark-fenced append
    * — or a crash-replay re-running the delete phase after the append
    * landed — would vector-delete the WINNER'S freshly appended rows for
    * any rewritten id, leaving the doc silently unindexed. Bounded at
    * the caller's observed watermark, a delete can only ever touch rows
    * older than the feed it is consuming.
    */
  private[operators] def deleteIdsChunked(spark: SparkSession, root: String,
                                          idCol: String, ids: DataFrame,
                                          atOrBelowV: Long,
                                          chunk: Int = 500000): Unit = {
    // pre-indexed_v ROWS (written before the column existed, NULL after
    // schema merge — NULL <= v would silently skip them and takedowns
    // would no-op) count as indexed at -1, always below the bound: they
    // predate every fenced append the bound exists to protect. A table
    // with NO indexed_v column at all fails LOUDLY at analysis instead
    // (a soft `lit(true)` fallback would re-open the racing-loser purge
    // for exactly the first post-upgrade batch); one insert-bearing
    // batch adds the column by schema merge.
    val it = ids.select(col(ids.columns.head).cast("long")).toLocalIterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    def flush(): Unit = if (buf.nonEmpty) {
      TxLog.deleteVectored(spark, root,
        col(idCol).isInCollection(buf.toSeq) &&
          coalesce(col("indexed_v"), lit(-1L)) <= atOrBelowV)
      buf.clear()
    }
    while (it.hasNext) {
      buf += it.next().getLong(0)
      if (buf.size >= chunk) flush()
    }
    flush()
  }

  /** The change feed REDUCED to net per-id effect: `removed` = every id
    * with a delete event (its old row/code is stale whether or not a
    * rewrite re-inserted it), `upserts` = the rows whose FINAL state in
    * the range is insert (at one version a rewrite emits delete+insert —
    * the row survives). Shared by the index maintainers.
    */
  private[operators] def netFeed(feed: DataFrame, idCol: String)
      : (DataFrame, DataFrame) = {
    val removed = feed.filter(col("_change_type") === "delete")
      .select(col(idCol)).distinct()
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "insert", 0).otherwise(1))
    val upserts = feed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("_change_type") === "insert")
      .drop("__rn")
    (removed, upserts)
  }

  /** Incrementally index the corpus commits above the watermark with the
    * EXISTING centroids/codebooks — deletes applied as idempotent
    * vector-delete commits, the insert delta as one idempotent append,
    * the watermark advanced by the meta commit LAST (every crash point
    * replays into the same state). When cumulative churn since the last
    * (re)train exceeds `retrainAt` of the corpus, rebuilds instead
    * (same cell count and PQ shape): many small refreshes accumulate
    * toward the trigger instead of each hiding under it.
    */
  def refresh(spark: SparkSession, corpusRoot: String, indexRoot: String,
              retrainAt: Double = 0.5,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): Refresh = {
    val codes = codesRoot(indexRoot)
    val meta0 = coherentMeta(spark, indexRoot)
    val head = TxLog.currentVersion(spark, corpusRoot).getOrElse(
      throw new IllegalArgumentException(
        s"ANN index refresh: no committed corpus at $corpusRoot"))
    val appendedThrough = TxLog.txnWatermark(spark, codes,
      appId(corpusRoot)).getOrElse(-1L)
    if (appendedThrough > meta0.corpusVersion && appendedThrough < head) {
      // TORN WINDOW: a crashed refresh appended codes through
      // `appendedThrough` but died before its meta commit, and the
      // corpus has since moved on. Processing (meta, head] in one step
      // would re-encode the crashed step's inserts under a fence that
      // no longer catches them (its watermark is below head) — double
      // codes per id. Replay THAT step to its OWN boundary first:
      // within the sub-range the old-watermark delete bound is exact
      // and the codes append self-fences; then process the remainder.
      val r1 = refreshStep(spark, corpusRoot, indexRoot, retrainAt,
        idCol, vecCol, appendedThrough, meta0)
      // r1's meta commit moved the watermark — the remainder reads the
      // fresh row (coherence was checked once above)
      val r2 = refreshStep(spark, corpusRoot, indexRoot, retrainAt,
        idCol, vecCol, head, readMetaOpt(spark, indexRoot).get)
      return Refresh(r1.added + r2.added, r1.removed + r2.removed,
        r2.total, r1.retrained || r2.retrained)
    }
    refreshStep(spark, corpusRoot, indexRoot, retrainAt, idCol, vecCol,
      head, meta0)
  }

  private def refreshStep(spark: SparkSession, corpusRoot: String,
                          indexRoot: String, retrainAt: Double,
                          idCol: String, vecCol: String,
                          corpusV: Long, meta: Meta): Refresh = {
    val codes = codesRoot(indexRoot)
    if (corpusV <= meta.corpusVersion)
      return Refresh(0L, 0L, TxLog.countRows(spark, codes), false)
    val feed = TxLog.readChanges(spark, corpusRoot, meta.corpusVersion,
      Some(corpusV))
    val (removedIds, upserts) = netFeed(feed, idCol)
    val delta = normed(upserts, idCol, vecCol).cache()
    try {
      val added = delta.count()
      val preTotal = TxLog.countRows(spark, codes)
      // deletes FIRST, bounded at the meta watermark (idempotent — a
      // replayed chunk matches nothing, and neither a replay nor a
      // racing loser can touch rows the fenced append landed at a newer
      // indexed_v): stale codes leave the scan before anything new
      // lands, and the exact removed count falls out of the metadata
      // row counts
      deleteIdsChunked(spark, codes, "vec_id", removedIds,
        atOrBelowV = meta.corpusVersion)
      val afterDelete = TxLog.countRows(spark, codes)
      val removed = preTotal - afterDelete
      // known undercount on crash-replay: a crashed run's deletes were
      // applied but never persisted into churnSinceTrain, and the
      // replay's deletes match nothing — drift from crashed-run
      // removals is lost (the adds replay fully; bounded by one crash
      // window per refresh, and a manual build() always resets)
      // crash-replay between the codes append and writeMeta: the
      // appended rows are already IN afterDelete, so adding `added`
      // again would overstate the total (and understate the drift
      // ratio) — the codes txn watermark says whether the append landed
      val alreadyAppended = TxLog.txnWatermark(spark, codes,
        appId(corpusRoot)).exists(_ >= corpusV)
      val total = afterDelete + (if (alreadyAppended) 0L else added)
      val churn = meta.churnSinceTrain + added + removed
      if (total > 0 && churn.toDouble / total > retrainAt) {
        // drift hook: cumulative churn now dominates what the
        // quantizers were trained on — retrain from the full corpus at
        // the same shape (build resets the churn clock)
        build(spark, corpusRoot, indexRoot, meta.nCells,
          m = meta.m, k = meta.k, idCol = idCol, vecCol = vecCol)
        return Refresh(added, removed, TxLog.countRows(spark, codes),
          retrained = true)
      }
      if (added > 0) {
        val centroids = TxLog.readLatest(spark, centroidsRoot(indexRoot))
        val cb = loadCodebooks(spark, indexRoot)
        TxLog.appendIdempotent(spark,
          encode(delta, centroids, cb)
            .withColumn("indexed_v", lit(corpusV)),
          codes, appId(corpusRoot), corpusV, statsCols = Seq("vec_id"))
      }
      // watermark + churn advance LAST: a crash before this line
      // replays the whole step (deletes no-op, append dedups on its
      // own txn) and lands here again with the same numbers
      writeMeta(spark, indexRoot,
        meta.copy(corpusVersion = corpusV, churnSinceTrain = churn))
      Refresh(added, removed, total, retrained = false)
    } finally { delta.unpersist(); () }
  }

  /** Periodic self-maintenance for the index's OWN tables: every
    * refresh appends one codes commit (and rewrites meta), so after
    * hundreds of refreshes the ADC scan pays a small-file flood and
    * every maintenance step pays a long log tail. Bin-packs the codes
    * files (also materializing delete-refresh vectors away),
    * checkpoints, reclaims files older than `keepVersions` snapshots,
    * and truncates the raw logs down to a horizon that keeps those
    * snapshots readable ([[graft.lake.TxLog.maintain]]), across all
    * four artifact tables.
    * Epoch and watermark transactions survive (they ride checkpoints);
    * `graft.IndexLadder`'s maintenance rung measures the search wall
    * staying flat.
    */
  def maintain(spark: SparkSession, indexRoot: String,
               smallerThanBytes: Long = 64L << 20,
               keepVersions: Int = 2): Unit =
    Seq(codesRoot(indexRoot), centroidsRoot(indexRoot),
      codebookRoot(indexRoot), metaRoot(indexRoot)).foreach(
      TxLog.maintain(spark, _, smallerThanBytes, keepVersions))

  /** Top-k cosine search against the PERSISTED index — no training, no
    * session state: verify epoch coherence, load centroids (broadcast) +
    * codebooks (driver), probe each query's `nProbe` nearest cells,
    * ADC-score the cell candidates from the byte-packed codes scan,
    * shortlist, then re-rank the shortlist EXACTLY by fetching only its
    * embeddings from the corpus (an id equi-join — the full vectors are
    * never scanned). `queries` = (qid, qe ARRAY<FLOAT>, qnorm).
    */
  def search(spark: SparkSession, corpusRoot: String, indexRoot: String,
             queries: DataFrame, kTop: Int, nProbe: Int, shortlist: Int,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    coherentMeta(spark, indexRoot)
    val centroids = TxLog.readLatest(spark, centroidsRoot(indexRoot))
    val cb = loadCodebooks(spark, indexRoot)
    val m = cb.length
    val k = cb(0).length
    val flat = cb.flatten.flatten
    val codes = TxLog.readLatest(spark, codesRoot(indexRoot))
    val probes = graft.queries.Similarity.ivfCells(
      queries, centroids, "qid", "qe", "qnorm", keep = nProbe)
      .withColumn("lut", VecOps.pqLutf(
        transform(col("qe"), x => (x / col("qnorm")).cast("float")),
        flat, m, k))
    val wAdc = Window.partitionBy("qid")
      .orderBy(col("adc").desc, col("vec_id"))
    val short = probes.join(codes, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("adc", VecOps.pqAdcf(col("codes"), col("lut"), k))
      .withColumn("srnk", row_number().over(wAdc))
      .filter(col("srnk") <= shortlist)
      .select(col("qid"), col("vec_id").as("cand_id"), col("qe"),
        col("qnorm"))
    val corpusEmb =
      normed(TxLog.readLatest(spark, corpusRoot), idCol, vecCol)
        .select(col("vec_id").as("cand_id"), col("embedding"),
          col("nrm").as("cnorm"))
    val wExact = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("cand_id"))
    short.join(corpusEmb, "cand_id")
      .withColumn("cosine",
        VecOps.dotf(col("qe"), col("embedding")) /
          (col("qnorm") * col("cnorm")))
      .withColumn("rnk", row_number().over(wExact).cast("long"))
      .filter(col("rnk") <= kTop)
      .select("qid", "cand_id", "rnk", "cosine")
      .orderBy("qid", "rnk")
  }
}
