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
  * materializes them as three graft tables under `indexRoot`:
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
  *
  * Versioning against the corpus: the `codes` commits carry a
  * (appId(corpusRoot), corpusVersion) transaction, so the indexed corpus
  * version IS the table's txn watermark — [[refresh]] reads it, feeds
  * only the corpus change feed above it through the EXISTING centroids +
  * codebooks, and appends the new rows idempotently in ONE commit
  * (crash-replay safe: a replayed refresh at-or-below the watermark is a
  * no-op). Appends therefore cost O(delta); corpus DELETES invalidate a
  * grow-only index and fail the refresh loudly (rebuild, or vector-delete
  * the ids from `codes` first). When the un-retrained fraction drifts
  * past `retrainAt`, refresh retrains centroids + codebooks from the
  * full corpus and rebuilds — the drift-triggered retrain hook.
  *
  * Search never trains: a FRESH session loads the three tables and runs
  * probe-cells → ADC shortlist → exact re-rank (the
  * [[graft.queries.Similarity.ivfPqTopK]] pipeline with the candidate
  * scan reading the persisted codes and the re-rank joining the corpus).
  */
object AnnIndex {

  def centroidsRoot(indexRoot: String): String = s"$indexRoot/centroids"
  def codebookRoot(indexRoot: String): String = s"$indexRoot/codebook"
  def codesRoot(indexRoot: String): String = s"$indexRoot/codes"

  private def appId(corpusRoot: String): String =
    s"graft-ann-index::$corpusRoot"

  /** What [[refresh]] did: rows newly indexed, total indexed rows after,
    * and whether drift triggered a full retrain.
    */
  final case class Refresh(added: Long, total: Long, retrained: Boolean)

  private def normed(corpus: DataFrame, idCol: String,
                     vecCol: String): DataFrame =
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("nrm", VecOps.normf(col("embedding")))
      .filter(col("nrm") > 0)

  /** Build (or rebuild) the index from the corpus table's CURRENT
    * snapshot: train the coarse quantizer and PQ codebooks on bounded
    * samples (the FAISS rule — quality needs thousands of points, not
    * the corpus), encode every vector, and replace all three tables.
    * Returns the corpus version the index now summarizes.
    */
  def build(spark: SparkSession, corpusRoot: String, indexRoot: String,
            nCells: Int, m: Int = 16, k: Int = 32,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): Long = {
    import spark.implicits._
    val corpusV = TxLog.currentVersion(spark, corpusRoot).getOrElse(
      throw new IllegalArgumentException(
        s"ANN index build: no committed corpus at $corpusRoot"))
    val embs = normed(TxLog.readLatest(spark, corpusRoot), idCol, vecCol)
      .cache()
    try {
      val centroids = graft.queries.Similarity.trainCentroids(embs, nCells)
      val cb = graft.queries.Similarity.trainPqCodebooks(embs, m, k)
      val cbDf = cb.iterator.zipWithIndex.flatMap { case (sub, j) =>
        sub.iterator.zipWithIndex.map { case (cent, i) =>
          (j, i, cent.toSeq)
        }
      }.toSeq.toDF("sub", "idx", "vals")
      TxLog.overwrite(spark, centroids, centroidsRoot(indexRoot))
      TxLog.overwrite(spark, cbDf, codebookRoot(indexRoot))
      // the codes table carries the corpus watermark (UNFENCED on the
      // overwrite — a rebuild at the same corpus version must still
      // replace, or re-running build() after changing nCells/m/k would
      // silently keep stale codes under fresh quantizers). A crash
      // BETWEEN the three replaces leaves mixed artifacts — build() is
      // idempotent, so the recovery is simply to re-run it; searches in
      // the window may lose recall but never error. statsCols: vec_id
      // bounds ride every file so the refresh drift check counts from
      // metadata, and searches by id range could prune
      TxLog.overwrite(spark, encode(embs, centroids, cb),
        codesRoot(indexRoot), statsCols = Seq("vec_id"),
        txn = Some((appId(corpusRoot), corpusV)))
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

  /** Incrementally index the corpus commits above the watermark with the
    * EXISTING centroids/codebooks — one idempotent O(delta) commit. When
    * the CUMULATIVE fraction of rows indexed since the last (re)train —
    * everything appended to the codes table after its newest overwrite
    * commit, plus this delta — exceeds `retrainAt`, rebuilds instead
    * (same cell count and PQ shape): many small refreshes accumulate
    * toward the trigger instead of each hiding under it.
    */
  def refresh(spark: SparkSession, corpusRoot: String, indexRoot: String,
              retrainAt: Double = 0.5,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): Refresh = {
    val codes = codesRoot(indexRoot)
    val wm = TxLog.txnWatermark(spark, codes, appId(corpusRoot)).getOrElse(
      throw new IllegalStateException(
        s"ANN index at $indexRoot has no build watermark for corpus " +
          s"$corpusRoot — run build() first"))
    val corpusV = TxLog.currentVersion(spark, corpusRoot).getOrElse(
      throw new IllegalArgumentException(
        s"ANN index refresh: no committed corpus at $corpusRoot"))
    if (corpusV <= wm)
      return Refresh(0L, TxLog.countRows(spark, codes), false)
    val feed = TxLog.readChanges(spark, corpusRoot, wm, Some(corpusV))
    // a grow-only index cannot honor corpus deletes (stale codes would
    // keep surfacing deleted ids): loud, with both ways out named.
    // File-rewrite ops emit delete+insert per row, so this also catches
    // updates — correct: an updated vector's old code is equally stale.
    if (feed.filter(col("_change_type") === "delete").limit(1).count() > 0)
      throw new IllegalStateException(
        s"corpus $corpusRoot deleted or rewrote rows since indexed " +
          s"version $wm — rebuild the ANN index (build()), or vector-" +
          "delete the affected ids from the codes table first")
    val delta = normed(feed, idCol, vecCol).cache()
    try {
      val added = delta.count()
      val preTotal = TxLog.countRows(spark, codes)
      // CUMULATIVE drift since the last (re)train: the codes table's
      // newest overwrite commit IS the last train (build replaces it),
      // so everything above that version arrived through refreshes
      val trainedV = TxLog.historySummary(spark, codes)
        .filter(_._2 == "overwrite").map(_._1).max
      val atTrain = TxLog.countRows(spark, codes, Some(trainedV))
      val sinceTrain = (preTotal - atTrain) + added
      if (preTotal > 0 &&
          sinceTrain.toDouble / (preTotal + added) > retrainAt) {
        // drift hook: the un-retrained fraction now dominates what the
        // quantizers were trained on — retrain from the full corpus at
        // the same shape
        val nCells = TxLog.readLatest(spark,
          centroidsRoot(indexRoot)).count().toInt
        val cb = loadCodebooks(spark, indexRoot)
        build(spark, corpusRoot, indexRoot, nCells,
          m = cb.length, k = cb(0).length, idCol = idCol, vecCol = vecCol)
        return Refresh(added, preTotal + added, retrained = true)
      }
      val centroids = TxLog.readLatest(spark, centroidsRoot(indexRoot))
      val cb = loadCodebooks(spark, indexRoot)
      TxLog.appendIdempotent(spark, encode(delta, centroids, cb), codes,
        appId(corpusRoot), corpusV, statsCols = Seq("vec_id"))
      Refresh(added, preTotal + added, retrained = false)
    } finally { delta.unpersist(); () }
  }

  /** Top-k cosine search against the PERSISTED index — no training, no
    * session state: load centroids (broadcast) + codebooks (driver),
    * probe each query's `nProbe` nearest cells, ADC-score the cell
    * candidates from the byte-packed codes scan, shortlist, then re-rank
    * the shortlist EXACTLY by fetching only its embeddings from the
    * corpus (an id equi-join — the full vectors are never scanned).
    * `queries` = (qid, qe ARRAY<FLOAT>, qnorm).
    */
  def search(spark: SparkSession, corpusRoot: String, indexRoot: String,
             queries: DataFrame, kTop: Int, nProbe: Int, shortlist: Int,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
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
