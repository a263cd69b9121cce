package graft.queries

import graft.{QDef, Tables}
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** North-star similarity-search operators over `embeddings` (SURVEY.md §2C):
  * brute-force cosine top-k (the correctness baseline — broadcast the small
  * query set, map-side scan of the corpus, no shuffle until top-k), an
  * IVF-bucketed approximate variant (the 100 TB scale path — candidate
  * generation is an equi-join on cell id, never all-pairs), and an exact
  * cosine-threshold near-dup self-join.
  *
  * Arithmetic parity with the DuckDB oracle is exact, not rounded: both
  * engines fold the element products left-to-right in double precision
  * (Spark `aggregate` with 0.0 init == DuckDB `list_reduce` — the extra
  * leading +0.0 is IEEE-exact), and sqrt/division are correctly rounded,
  * so cosine values are bit-identical.
  */
object Similarity {

  /** Left-to-right double-precision dot product of two float-array columns:
    * the native codegen'd [[graft.functions.VecDot]] expression (the
    * equivalent aggregate/zip_with HOF chain is a CodegenFallback and ran
    * ~20x slower on the all-pairs join; fold order — and therefore oracle
    * parity — is identical).
    */
  private def dotExpr(x: String, y: String): Column =
    graft.functions.VecOps.dotf(col(x), col(y))

  /** sqrt(dot(x,x)) — computed ONCE PER ROW before any pairwise stage, so
    * the pair loop does a single dot product + one divide (3x fewer array
    * folds than inlining the norms into the cosine).
    */
  private def normExpr(x: String): Column = graft.functions.VecOps.normf(col(x))

  /** DuckDB twin of [[dotExpr]]: identical fold order via list_reduce
    * (the leading +0.0 from list_prepend is IEEE-exact).
    */
  private def duckDot(x: String, y: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(list_zip($x, $y),
       |                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
       |  (acc, v) -> acc + v)""".stripMargin

  private def duckNorm(x: String): String = s"sqrt(${duckDot(x, x)})"

  /** Embeddings with per-row norm, memoized + cached per (session, dir) and
    * spread across the cluster: the fixture is a single small parquet file
    * -> a 1-partition scan, which would run the pairwise dot-product loops
    * of q40/q42 on ONE core. One tiny deterministic shuffle at build time
    * parallelizes every downstream scan; norms are computed once here, so
    * each pair stage does a single dot + divide.
    */
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def withNorms(s: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((s, dir, "norms"), {
      val n = s.conf.get("spark.sql.shuffle.partitions").toInt
      t(s, dir, "embeddings")
        .repartition(n, col("vec_id"))
        .select(col("vec_id"), col("embedding"), normExpr("embedding").as("nrm"))
        // Degenerate-vector guard: a zero-norm embedding has no direction,
        // and dot/(0*n) = NaN — which Spark orders ABOVE every real double,
        // so one all-zero row would top every descending cosine top-k.
        // Excluded here once for every similarity query (oracles carry the
        // same nrm > 0 predicate).
        .filter(col("nrm") > 0)
        .cache()
    })

  /** Drop cached per-dir feature frames (test/benchmark hygiene: a
    * long-lived JVM serving many dirs would otherwise pin executor
    * storage memory forever).
    */
  def clearCache(): Unit = {
    memo.values.foreach(_.unpersist())
    memo.clear()
    pqMemo.clear()
    exactMemo.clear()
    countMemo.clear()
  }

  /** Memo occupancy (frames, codebooks, exact-contract rows) — lets the
    * cleanup spec assert [[clearCache]] really empties every cross-query
    * cache, exactMemo included.
    */
  private[queries] def cachedEntryCounts: (Int, Int, Int) =
    (memo.size, pqMemo.size, exactMemo.size)

  /** Corpus row count, memoized per (session, dir): one job on the cached
    * norms frame, reused by every adaptive index-sizing decision below.
    */
  private val countMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Long]
  private def corpusCount(s: SparkSession, dir: String): Long =
    countMemo.getOrElseUpdate((s, dir), withNorms(s, dir).count())

  /** Corpus-adaptive IVF cell counts, calibrated so every standard
    * fixture keeps the original 16 cells (contract outputs there are
    * bit-unchanged) while large corpora stop paying fixed-cell blowup —
    * the retune the 100x scale-ladder rung demanded (BASELINE.md
    * "Dedup/ANN scale ladder"):
    *
    *  - [[probeCells]] (the q41/q82 top-k indexes): ceil(sqrt(N/8)) —
    *    the FAISS sqrt(N) sizing. Per-query candidate volume
    *    nProbe*N/cells then grows as sqrt(N) instead of linearly
    *    (fixed 16 cells made a 100x corpus scan 1/4 of itself per query).
    *  - [[blockCells]] (q108 SemDeDup's blocking): N/125 — constant
    *    EXPECTED CELL SIZE, so the within-cell all-pairs stage grows
    *    linearly with the corpus instead of quadratically (fixed 16
    *    cells made it (N/16)^2 per cell).
    */
  private def probeCells(s: SparkSession, dir: String): Int = {
    val n = corpusCount(s, dir)
    math.min(4096, math.max(16, math.ceil(math.sqrt(n / 8.0)).toInt))
  }
  private def blockCells(s: SparkSession, dir: String): Int = {
    val n = corpusCount(s, dir)
    math.min(8192, math.max(16, (n / 125L).toInt))
  }

  /** Corpus with per-row norm, projected once before any pairwise stage. */
  private def corpus(s: SparkSession, dir: String): DataFrame =
    withNorms(s, dir).select(col("vec_id").as("cand_id"), col("embedding"),
      col("nrm").as("cnorm"))

  /** Every 20th vector is a query — a small set next to the corpus, the
    * realistic ANN shape (and broadcastable at any corpus scale).
    */
  private def querySet(s: SparkSession, dir: String): DataFrame =
    withNorms(s, dir).filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qnorm"))

  val TopK = 5

  /** Train the IVF coarse quantizer: spherical k-means (Spark ML KMeans
    * over unit-normalized vectors, fixed seed) on the corpus. Returns a
    * centroid-count-sized (cell, ce, cenorm) frame — metadata-sized by
    * construction, safe to broadcast at any corpus scale. At 100 TB the
    * only change is `.sample(...)` before `fit` (k-means quality needs a
    * few-hundred-k sample, not the corpus); the fixtures are already
    * sample-sized. Memoized per (session, dir, k) so the bench's repeat
    * runs don't retrain.
    */
  def trainedCentroids(s: SparkSession, dir: String, nCells: Int): DataFrame =
    memo.getOrElseUpdate((s, dir, s"centroids$nCells"),
      trainCentroids(withNorms(s, dir), nCells))

  /** Pre-train the ANN index artifacts (IVF centroids + PQ codebooks) and
    * materialize the normed-corpus cache. Index TRAINING is index build,
    * not query — a production ANN system trains once and serves many
    * probes — so [[graft.Bench]] calls this in its warm-up phase and the
    * timed q41/q81/q82 samples measure the probe path. (Idempotent: the
    * same memos the queries consult.)
    */
  def annWarmup(s: SparkSession, dir: String): Unit = {
    trainedCentroids(s, dir, probeCells(s, dir)).count()
    pqCodebooks(s, dir)
    exactSampleTopK(s, dir)
    annIndexRoots(s, dir)
    ()
  }

  /** q123's persisted-index lifecycle, once per (session, dir): a
    * commit-log corpus table built from the fixture in TWO commits (bulk,
    * then a 5% delta) with an [[graft.operators.AnnIndex]] BUILT on the
    * bulk and REFRESHED for the delta — the artifact the contract query
    * then probes came through the full build→append→refresh path, and
    * the query itself never trains (a fresh session would read the same
    * tables; AnnIndexSpec pins that). Index construction is index build,
    * not query — built in [[annWarmup]] like the in-session artifacts.
    */
  private val idxMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, String)]

  private def annIndexRoots(s: SparkSession, dir: String): (String, String) =
    idxMemo.getOrElseUpdate((s, dir), {
      val corpusRoot = Tables.scratch(dir, "ann_index_corpus")
      val indexRoot = Tables.scratch(dir, "ann_index")
      // the memo is per (session, dir) but the scratch root is per JVM:
      // a SECOND session's memo miss must rebuild from empty, not append
      // the bulk a second time (duplicate vec_ids would silently break
      // the recall contract). Deterministic content either way.
      val hconf = s.sparkContext.hadoopConfiguration
      Seq(corpusRoot, indexRoot).foreach { r =>
        val p = new org.apache.hadoop.fs.Path(r)
        val fs = p.getFileSystem(hconf)
        if (fs.exists(p)) fs.delete(p, true)
      }
      val base = t(s, dir, "embeddings").select("vec_id", "embedding")
      graft.lake.TxLog.append(s,
        base.filter(col("vec_id") % 20 =!= 3), corpusRoot)
      graft.operators.AnnIndex.build(s, corpusRoot, indexRoot,
        nCells = probeCells(s, dir), m = PqM, k = PqK)
      graft.lake.TxLog.append(s,
        base.filter(col("vec_id") % 20 === 3), corpusRoot)
      graft.operators.AnnIndex.refresh(s, corpusRoot, indexRoot)
      // delete leg of the maintenance lifecycle: EXACT CLONES of every
      // 40th vector join the corpus under decoy ids, get indexed, then
      // are deleted and the deletion refreshed through (vector-deletes
      // on the codes table). The final corpus equals the fixture, so
      // the recall contract's exact side is unchanged — but a decoy
      // whose code survived its deletion is a cosine-1.0 twin that
      // outranks the true neighbor for its source's queries and fails
      // the contract (leaked ids are not in the exact pair set).
      graft.lake.TxLog.append(s,
        base.filter(col("vec_id") % 40 === 0)
          .select((col("vec_id") + 10000000L).as("vec_id"),
            col("embedding")), corpusRoot)
      graft.operators.AnnIndex.refresh(s, corpusRoot, indexRoot)
      graft.lake.TxLog.deleteVectored(s, corpusRoot,
        col("vec_id") >= 10000000L)
      graft.operators.AnnIndex.refresh(s, corpusRoot, indexRoot)
      (corpusRoot, indexRoot)
    })

  /** The contract's EXACT side — top-k by brute force on the deterministic
    * query subsample (qid % 100 == 0) — computed ONCE per (session, dir)
    * and held as local rows: the subsample is bounded by construction
    * (|queries|/100 qids × k pairs — metadata-sized at any corpus scale,
    * like the centroid frame), and it is the same frame for all four ANN
    * variants, so recomputing it inside every timed bench sample measured
    * the checker, not the probe. Warm-up builds it next to the centroids;
    * Verify's first contract query pays it once.
    */
  private val exactMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Array[(Long, Long)], Long)]

  private def exactSampleTopK(s: SparkSession, dir: String): (Array[(Long, Long)], Long) =
    exactMemo.getOrElseUpdate((s, dir), {
      val sampleQ = querySet(s, dir).filter(col("qid") % 100 === 0)
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cand_id"))
      val pairs = corpus(s, dir)
        .crossJoin(broadcast(sampleQ))
        .filter(col("cand_id") =!= col("qid"))
        .withColumn("cosine",
          dotExpr("qe", "embedding") / (col("qnorm") * col("cnorm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
        .select(col("qid"), col("cand_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val nSample = sampleQ.count()
      (pairs, nSample)
    })

  /** Driver-checkable CONTRACT frame for an approximate top-k result: the
    * r5 verdict's gap was that the ANN queries' only driver-visible signal
    * was rows > 0 — a recall collapse would ship green. This wraps an ANN
    * result into a frame every value of which an exact SQL oracle CAN pin:
    *
    *   - `n_queries` / `n_rows`: COUNT(DISTINCT qid) / COUNT(*) over the
    *     FULL approximate result (so the probe still runs end-to-end and
    *     its fan-out is checked: n_rows must be exactly k * n_queries).
    *   - `recall_ok`: mean recall@k vs the EXACT top-k, computed in the
    *     same job on the deterministic query subsample (qid % 100 == 0 —
    *     exact scoring on 1/5 of the queries costs a small fraction of
    *     the probe itself), thresholded in-engine to a boolean the oracle
    *     states as TRUE. A recall collapse now turns the row red.
    *
    * The per-variant thresholds are floors with wide margin under the
    * measured fixture recalls (see the QDef sites), not tuned targets —
    * they exist to catch collapse (a broken cell join, a wrong ADC
    * table), not to certify quality; NorthStarSpec keeps the tight
    * recall assertions.
    */
  def annContract(variant: String, res: DataFrame, s: SparkSession,
                  dir: String, minMeanRecall: Double): DataFrame =
    annStats(variant, res, s, dir)
      .select(col("variant"), col("n_queries"), col("n_rows"),
        (col("mean_recall") >= minMeanRecall).as("recall_ok"))

  /** Raw mean recall per variant on the contract's query subsample — what
    * [[graft.AnnProbe]] prints when (re)deriving a contract floor.
    */
  def recallProbe(s: SparkSession, dir: String, queryName: String): DataFrame =
    annStats(queryName, rawAnn(queryName)(s, dir), s, dir)

  /** The unwrapped approximate top-k results (qid, cand_id, rnk, cosine)
    * behind each contract query — shared by the QDefs and [[recallProbe]].
    */
  private[queries] lazy val rawAnn: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q41_sim_topk_ivf" -> ((s, dir) =>
        ivfTopK(corpus(s, dir), querySet(s, dir),
          trainedCentroids(s, dir, probeCells(s, dir)), TopK, nProbe = 4)),
      "q60_sim_topk_quant" -> (int8TopK _),
      "q81_sim_topk_pq" -> ((s, dir) =>
        pqTopK(corpus(s, dir), querySet(s, dir), pqCodebooks(s, dir),
          TopK, shortlist = 8 * TopK)),
      "q82_sim_topk_ivfpq" -> ((s, dir) =>
        ivfPqTopK(corpus(s, dir), querySet(s, dir),
          trainedCentroids(s, dir, probeCells(s, dir)), pqCodebooks(s, dir),
          TopK, nProbe = 4, shortlist = 8 * TopK)),
      "q123_sim_topk_ann_index" -> ((s, dir) => {
        val (corpusRoot, indexRoot) = annIndexRoots(s, dir)
        graft.operators.AnnIndex.search(s, corpusRoot, indexRoot,
          querySet(s, dir), TopK, nProbe = 4, shortlist = 8 * TopK)
      }))

  private def annStats(variant: String, res: DataFrame, s: SparkSession,
                       dir: String): DataFrame = {
    import s.implicits._
    // ONE consumption of the probe result: the memoized exact top-k pairs
    // broadcast onto the probe output as a hit marker, so row stats AND
    // recall come out of a single aggregation pass over `res`. (The first
    // cut cached `res` and fed it to two subtrees plus separate
    // stats/recall aggregations — ~1 s of pure job overhead per ANN
    // query at bench scale; the second cut recomputed the exact side
    // inside every timed sample, measuring the checker instead of the
    // probe. The exact side is deterministic per (session, dir) and
    // shared by all four variants — see [[exactSampleTopK]].)
    val (pairs, nSample) = exactSampleTopK(s, dir)
    val exact = pairs.toSeq.toDF("qid", "cand_id")
      .withColumn("hit", lit(1L))
    // recall denominator = |sample| * k, counted from the sample frame
    // itself so queries the probe answered badly (or not at all) still
    // weigh in — a collapse cannot hide by dropping qids.
    res.join(broadcast(exact), Seq("qid", "cand_id"), "left")
      .agg(count_distinct(col("qid")).as("n_queries"),
        count(lit(1)).as("n_rows"),
        sum(coalesce(col("hit"), lit(0L))).as("nhit"))
      .select(lit(variant).as("variant"), col("n_queries"), col("n_rows"),
        (col("nhit").cast("double") / (nSample * TopK))
          .as("mean_recall"))
  }

  /** DuckDB twin of [[annContract]]'s pinnable values: the query-set size
    * under the same `vec_id % 20 == 0 AND norm > 0` predicate, the exact
    * `k * n_queries` fan-out, and TRUE for the in-engine recall bound.
    */
  private def annContractOracle(variant: String): String =
    s"""WITH q AS (SELECT COUNT(*) AS nq FROM embeddings
       |           WHERE vec_id % 20 = 0 AND ${duckNorm("embedding")} > 0)
       |SELECT '$variant' AS variant,
       |  CAST(nq AS BIGINT) AS n_queries,
       |  CAST($TopK * nq AS BIGINT) AS n_rows,
       |  TRUE AS recall_ok
       |FROM q""".stripMargin

  /** Spherical k-means over any (vec_id, embedding, nrm) frame — the
    * trainable half of [[trainedCentroids]], exposed so specs can train on
    * synthetic clustered corpora.
    */
  def trainCentroids(embs: DataFrame, nCells: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val unit0 = embs
      .select(array_to_vector(
        transform(col("embedding"), x => x / col("nrm"))).as("features"))
    // train on a BOUNDED sample (the FAISS train-on-sample rule): k-means
    // quality needs ~tens of points per cell, not the corpus, and the
    // adaptive cell counts above would otherwise make training cost
    // N x cells. Deterministic seed; every standard fixture sits under
    // the cap, so their centroids are bit-unchanged.
    val target = math.max(25000L, 64L * nCells)
    val n = embs.count()
    val unit =
      if (n <= target) unit0
      else unit0.sample(withReplacement = false, target.toDouble / n, 42L)
    val model = new KMeans()
      .setK(nCells).setMaxIter(10).setSeed(42L).setFeaturesCol("features")
      .fit(unit)
    val s = embs.sparkSession
    import s.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("cell", "ce")
      .select(col("cell"), col("ce"), normExpr("ce").as("cenorm"))
      .filter(col("cenorm") > 0)
  }

  /** Nearest centroid cells by cosine — the IVF assignment/probe step,
    * shared by [[ivfTopK]] and [[ivfPqTopK]] (and driven directly by
    * specs that assert candidate counts). The centroid table is broadcast
    * (metadata-sized by construction); `norm` is the caller-provided
    * per-row norm column so only the point-centroid dot runs per pair.
    * The crossJoin is k-bounded: |points| x |centroids| with a tiny
    * broadcast side — a scan-time projection, not an all-pairs blowup.
    */
  def ivfCells(points: DataFrame, centroidsDf: DataFrame, id: String,
               vec: String, norm: String, keep: Int): DataFrame = {
    val w = Window.partitionBy(id).orderBy(col("cell_cos").desc, col("cell"))
    points.crossJoin(broadcast(centroidsDf))
      .withColumn("cell_cos",
        dotExpr(vec, "ce") / (col(norm) * col("cenorm")))
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= keep)
      .drop("ce", "cenorm", "cell_cos", "cell_rank")
  }

  /** IVF ANN top-k over a centroid table: corpus vectors are assigned to
    * their single nearest cell, queries probe their `nProbe` nearest
    * cells, and candidates are the cell-id EQUI-JOIN of the two — the
    * shuffle keys are bounded by the centroid count and the per-cell work
    * is AQE-splittable. Exposed as an operator (not just a query) so specs
    * can drive it with synthetic clustered corpora.
    *
    * Expects `corpus` = (cand_id, embedding, cnorm),
    * `queries` = (qid, qe, qnorm), `centroids` = (cell, ce, cenorm).
    */
  def ivfTopK(corpusDf: DataFrame, queriesDf: DataFrame, centroidsDf: DataFrame,
              k: Int, nProbe: Int): DataFrame = {
    val assigned = ivfCells(corpusDf, centroidsDf, "cand_id", "embedding", "cnorm", keep = 1)
    val probes = ivfCells(queriesDf, centroidsDf, "qid", "qe", "qnorm", keep = nProbe)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cand_id"))
    probes.join(assigned, "cell")
      .filter(col("cand_id") =!= col("qid"))
      .withColumn("cosine",
        dotExpr("qe", "embedding") / (col("qnorm") * col("cnorm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("qid", "cand_id", "rnk", "cosine")
      .orderBy("qid", "rnk")
  }

  /** Train PRODUCT-QUANTIZATION codebooks: the embedding space is split
    * into `m` contiguous subspaces and each gets its own k-means codebook
    * (`k` entries) — so a vector compresses to m small codes (m bytes at
    * k<=256) with reconstruction error far below one global quantizer at
    * the same budget. Returns driver-side [m][k][subDim] floats —
    * metadata-sized (m*k*subDim = d*k values), broadcastable at any
    * corpus scale; at 100 TB train each subspace on a sample exactly like
    * [[trainCentroids]].
    */
  def trainPqCodebooks(embs: DataFrame, m: Int, k: Int,
                       sampleN: Int = 4096): Array[Array[Array[Float]]] = {
    // SPHERICAL PQ on a DRIVER-COLLECTED SAMPLE: train on unit-normalized
    // vectors, because the search ranks by cosine — on the unit sphere
    // dot == cosine, so the ADC approximation targets the right ordering.
    // The sample is bounded (`sampleN` rows = a few MB) and THAT is the
    // standard PQ practice at any corpus scale: codebook quality needs
    // thousands of points per subspace, not the corpus — m distributed
    // k-means fits here would cost 16 Spark jobs to learn what a
    // millisecond driver loop learns from the same sample (measured: the
    // Spark ML variant dominated the query's entire runtime).
    // deterministic PSEUDORANDOM sample: order by a hash of the id, not
    // the id itself (a head-of-table slice would bias codebooks toward
    // the earliest ingest on corpora where distribution drifts with id;
    // orderBy+limit plans as TakeOrderedAndProject — a per-partition
    // top-N heap, no full sort)
    val sample = embs.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleN)
      .select(transform(col("embedding"), x => (x / col("nrm")).cast("float")))
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    (0 until m).toArray.map { j =>
      val pts = sample.map { r =>
        val p = new Array[Double](subDim)
        var i = 0
        while (i < subDim) { p(i) = r(j * subDim + i).toDouble; i += 1 }
        p
      }
      localKMeans(pts, k, seed = 42L + j).map(_.map(_.toFloat))
    }
  }

  /** Seeded Lloyd's k-means over a small in-memory point set (PQ subspace
    * training). Empty clusters keep their previous centroid; ties go to
    * the lower index — fully deterministic for a given seed.
    */
  private def localKMeans(pts: Array[Array[Double]], k: Int, seed: Long,
                          iters: Int = 10): Array[Array[Double]] = {
    val d = pts.head.length
    val rnd = new scala.util.Random(seed)
    // init from DISTINCT indices: sampling with replacement would seed
    // duplicate centroids, and a duplicate can never separate (ties go to
    // the lower index, so its twin keeps zero members forever) — silently
    // shrinking the effective codebook
    val init = rnd.shuffle(pts.indices.toVector).take(k)
    val cents = Array.tabulate(k)(c => pts(init(c % init.length)).clone)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val cnt = new Array[Int](k)
      var p = 0
      while (p < pts.length) {
        val x = pts(p)
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0
          var i = 0
          while (i < d) { val t = x(i) - cents(c)(i); dist += t * t; i += 1 }
          if (dist < bd) { bd = dist; best = c }
          c += 1
        }
        cnt(best) += 1
        var i = 0
        while (i < d) { sums(best)(i) += x(i); i += 1 }
        p += 1
      }
      var c = 0
      while (c < k) {
        if (cnt(c) > 0) {
          var i = 0
          while (i < d) { cents(c)(i) = sums(c)(i) / cnt(c); i += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  private val pqMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Array[Array[Array[Float]]]]

  val PqM = 16     // subspaces (64-dim fixture -> 4 dims each)
  val PqK = 32     // codebook entries per subspace

  private def pqCodebooks(s: SparkSession, dir: String): Array[Array[Array[Float]]] =
    pqMemo.getOrElseUpdate((s, dir),
      trainPqCodebooks(withNorms(s, dir), PqM, PqK))

  /** PQ ANN top-k with ADC scoring and exact re-rank — the third member
    * of the approximate family (IVF = bucketed candidates, LSH = banded
    * candidates, PQ = compressed scoring):
    *
    *  1. ENCODE the corpus once: per subspace, the nearest codebook entry
    *     by L2 (argmax of x·c - |c|²/2 over the broadcast literal
    *     codebook — a scan-time projection, no join, no shuffle).
    *  2. Per query, precompute the flat LUT of subvector·centroid dots
    *     (m*k doubles — the whole point: query-candidate scoring becomes
    *     m table reads via the codegen'd [[graft.functions.PqAdc]],
    *     never a d-element dot).
    *  3. Broadcast the small query set across the corpus codes, take an
    *     ADC `shortlist` per query, re-rank EXACTLY (true cosine) and
    *     keep `kTop` — re-ranking restores exact ordering among the
    *     shortlist, so recall loss is only shortlist misses.
    *
    * At 100 TB the scan carries m BYTE-PACKED codes per row (`binary`,
    * 16 bytes at m=16 vs 256 for the raw 64-float vector — true 16x
    * compression); the full embeddings are only touched for the shortlist
    * (here they ride along because the fixture is small; a production
    * layout fetches them by id after the shortlist).
    */
  def pqTopK(corpusDf: DataFrame, queriesDf: DataFrame,
             cb: Array[Array[Array[Float]]], kTop: Int,
             shortlist: Int): DataFrame = {
    val m = cb.length
    val k = cb(0).length
    val flat = cb.flatten.flatten

    // unit-normalize both sides before coding (spherical PQ, matching the
    // trainer): ADC then approximates cosine itself, which is what the
    // final ranking needs. Encode and LUT are each ONE native expression
    // carrying the codebook as a reference object — the same pipeline
    // built from m*k per-centroid dot columns plans a >1000-node tree
    // whose Catalyst passes alone cost seconds per run (measured).
    val cand = corpusDf.withColumn("codes",
      graft.functions.VecOps.pqEncodef(
        transform(col("embedding"), x => (x / col("cnorm")).cast("float")),
        flat, m, k))

    val qs = queriesDf.withColumn("lut",
      graft.functions.VecOps.pqLutf(
        transform(col("qe"), x => (x / col("qnorm")).cast("float")),
        flat, m, k))

    adcShortlistRerank(cand.crossJoin(broadcast(qs)), k, kTop, shortlist)
  }

  /** The shared PQ scoring tail: ADC-score candidate pairs (each row a
    * (query, candidate) pair carrying `codes` + `lut`), shortlist by
    * ADC, re-rank the shortlist by EXACT cosine, keep `kTop`. The ONE
    * place the ADC/shortlist/re-rank semantics live — [[pqTopK]] (flat
    * scan) and [[ivfPqTopK]] (cell-pruned) differ only in how the pairs
    * are generated, so a tie-break or guard fix here cannot
    * desynchronize them.
    */
  private def adcShortlistRerank(pairs: DataFrame, k: Int, kTop: Int,
                                 shortlist: Int): DataFrame = {
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("cand_id"))
    val wExact = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cand_id"))
    pairs
      .filter(col("cand_id") =!= col("qid"))
      .withColumn("adc", graft.functions.VecOps.pqAdcf(col("codes"), col("lut"), k))
      .withColumn("srnk", row_number().over(wAdc))
      .filter(col("srnk") <= shortlist)
      .withColumn("cosine", dotExpr("qe", "embedding") / (col("qnorm") * col("cnorm")))
      .withColumn("rnk", row_number().over(wExact).cast("long"))
      .filter(col("rnk") <= kTop)
      .select("qid", "cand_id", "rnk", "cosine")
      .orderBy("qid", "rnk")
  }

  /** IVF×PQ — the composed 100 TB ANN path (IndexIVFPQ shape): IVF prunes
    * WHICH candidates are scored (each query touches only its nProbe
    * cells' vectors — candidate generation is the cell-id equi-join,
    * never a corpus scan) and PQ compresses HOW each survivor is scored
    * (m byte-packed codes + an ADC table lookup, never a d-element dot).
    * Exact re-rank of the ADC shortlist restores true cosine ordering, so
    * recall loss = cell misses + shortlist misses. Neither half alone is
    * the scale answer: flat PQ still scans every code (linear), and plain
    * IVF still dots full vectors per candidate; composed, the per-query
    * cost is (|corpus| * nProbe / nCells) table reads over a 16x smaller
    * scan. Candidate volume drops by ~nCells/nProbe vs the flat scan —
    * NorthStarSpec asserts the count and the recall floor.
    */
  def ivfPqTopK(corpusDf: DataFrame, queriesDf: DataFrame,
                centroidsDf: DataFrame, cb: Array[Array[Array[Float]]],
                kTop: Int, nProbe: Int, shortlist: Int): DataFrame = {
    val m = cb.length
    val k = cb(0).length
    val flat = cb.flatten.flatten
    // one scan-time projection each: cell assignment + byte-packed codes
    // for the corpus, cell probes + ADC LUT for the queries
    val assigned = ivfCells(corpusDf, centroidsDf, "cand_id", "embedding",
      "cnorm", keep = 1)
      .withColumn("codes",
        graft.functions.VecOps.pqEncodef(
          transform(col("embedding"), x => (x / col("cnorm")).cast("float")),
          flat, m, k))
    val probes = ivfCells(queriesDf, centroidsDf, "qid", "qe", "qnorm",
      keep = nProbe)
      .withColumn("lut",
        graft.functions.VecOps.pqLutf(
          transform(col("qe"), x => (x / col("qnorm")).cast("float")),
          flat, m, k))
    adcShortlistRerank(probes.join(assigned, "cell"), k, kTop, shortlist)
  }

  // Hyperplane-LSH parameters for q61: 128 sign bits as 16 bands of 8.
  // At the planted-pair similarity (cosine ~0.992 -> bit-agreement
  // p ~ 0.96) per-pair recall is 1-(1-p^8)^16 ~ 1-1e-9; background pairs
  // (|cosine| <~ 0.5) collide in some band ~6% of the time and are
  // rejected by the exact verify.
  private val LshBits = 128
  private val LshRowsPerBand = 8

  /** q61's corpus: the embeddings plus a deterministic planted near-dup
    * for every 40th vector (same vector with element 0 zeroed — cosine
    * ~ sqrt(1 - v0^2/|v|^2) ~ 0.99, and crucially every element is
    * bit-identical to engine-independent values, so the DuckDB oracle
    * reproduces the corpus exactly). Cached with the per-row LSH band
    * signatures so the explode/self-join stages never recompute them.
    */
  private def lshCorpus(s: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((s, dir, "lsh"), {
      val base = withNorms(s, dir).select("vec_id", "embedding", "nrm")
      // Fixture contract for the EXACT oracle over this constructed corpus:
      // (a) planted ids live at vec_id + 1,000,000 — assert the id spaces
      // cannot collide (a corpus with vec_id >= 1e6 would alias planted
      // onto organic rows and silently corrupt the pair set);
      // (b) no ORGANIC pair reaches cosine 0.8 (fixture max ~0.6) and every
      // planted pair (~0.992) collides in >= 1 band with P ~ 1-1e-9, so the
      // probabilistic candidate set equals the exact-threshold pair set. If
      // fixtures ever grow organic pairs near the threshold, this oracle
      // must become a recall-style spec instead of exact equality.
      val maxId = base.agg(max(col("vec_id"))).head().getLong(0)
      require(maxId < 1000000L,
        s"q61 planted-id space collision: max vec_id $maxId >= 1000000")
      val pert = base.filter(col("vec_id") % 40 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, lit(0f)).otherwise(x)).as("embedding"))
        .select(col("vec_id"), col("embedding"), normExpr("embedding").as("nrm"))
        .filter(col("nrm") > 0)
      base.unionAll(pert)
        .withColumn("bands",
          graft.functions.VecOps.hyperplaneBandsf(col("embedding"),
            LshBits, LshRowsPerBand))
        .cache()
    })

  val defs: Seq[QDef] = Seq(

    // Brute-force cosine top-k: broadcast queries x full corpus scan.
    // Plan: BroadcastNestedLoopJoin (the *intended* physical shape here —
    // each executor scans its corpus slice against the in-memory query set;
    // zero shuffle before the final per-query top-k).
    QDef(
      "q40_sim_topk",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe,
         |             ${duckNorm("embedding")} AS qnorm
         |           FROM embeddings WHERE vec_id % 20 = 0),
         |c AS (SELECT vec_id AS cand_id, embedding,
         |        ${duckNorm("embedding")} AS cnorm
         |      FROM embeddings),
         |s AS (SELECT q.qid, c.cand_id,
         |        ${duckDot("q.qe", "c.embedding")} / (q.qnorm * c.cnorm) AS cosine
         |      FROM q, c
         |      WHERE c.cand_id <> q.qid AND q.qnorm > 0 AND c.cnorm > 0),
         |r AS (SELECT qid, cand_id, cosine,
         |        ROW_NUMBER() OVER (PARTITION BY qid
         |                           ORDER BY cosine DESC, cand_id) AS rnk
         |      FROM s)
         |SELECT qid, cand_id, CAST(rnk AS BIGINT) AS rnk, cosine
         |FROM r WHERE rnk <= $TopK ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
      val scored = corpus(s, dir)
        .crossJoin(broadcast(querySet(s, dir)))
        .filter(col("cand_id") =!= col("qid"))
        .withColumn("cosine",
          dotExpr("qe", "embedding") / (col("qnorm") * col("cnorm")))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cand_id"))
      scored
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= TopK)
        .select("qid", "cand_id", "rnk", "cosine")
        .orderBy("qid", "rnk")
    },

    // IVF approximate top-k — the scale path. Coarse quantizer = k-means
    // centroids TRAINED on the corpus (spherical: unit-normalized inputs,
    // fixed seed — at 100 TB you train on a sample, then broadcast the tiny
    // centroid table exactly as here); every vector is assigned to its
    // nearest centroid cell (broadcast map-side pass), queries probe their
    // 4 nearest cells, and candidate generation is an EQUI-JOIN on cell id.
    // Shuffle keys are bounded by the centroid count; skewed cells are
    // AQE-splittable. Output is the [[annContract]] frame (full-probe
    // fan-out counts + in-engine recall@k bound vs exact), every value of
    // which the SQL oracle pins exactly; NorthStarSpec keeps the tight
    // recall assertions (>=0.8 on a clusterable corpus). Threshold 0.25:
    // measured mean recall on the near-uniform fixture sample is ~2x
    // that — the floor catches collapse, not drift.
    QDef("q41_sim_topk_ivf", annContractOracle("ivf")) { (s, dir) =>
      annContract("ivf", rawAnn("q41_sim_topk_ivf")(s, dir),
        s, dir, minMeanRecall = 0.25)
    },

    // Embedding-cosine near-dup pairs (the §2C dedup family's embedding
    // member): EXACT threshold self-join organized as a BLOCK-PAIR
    // EQUI-JOIN. At a 60-degree threshold over near-uniform vectors there
    // is no sub-quadratic exact algorithm (the fixture's qualifying pairs
    // sit AT the threshold, so LSH-candidate recall cannot be made exact)
    // — the O(n^2) compute is inherent; what scales is its ORGANIZATION.
    // Each vector hashes into one of B blocks and is replicated to its
    // (block, block)-pair keys, so the join is a plain equi-join: memory
    // per task is two blocks (nothing corpus-sized is ever broadcast,
    // unlike a nested-loop plan), the B(B+1)/2 pair cells are balanced by
    // construction and spread across the cluster, and B tunes per-task
    // compute independently of corpus size. The sub-quadratic APPROXIMATE
    // path at production thresholds is q61 (hyperplane LSH).
    QDef(
      "q42_dedup_embcos",
      s"""WITH c AS (SELECT vec_id, embedding,
         |             ${duckNorm("embedding")} AS nrm
         |           FROM embeddings),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |        ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
         |      FROM c a JOIN c b
         |        ON a.vec_id < b.vec_id AND a.nrm > 0 AND b.nrm > 0)
         |SELECT vec_a, vec_b, cosine FROM p
         |WHERE cosine >= 0.5 ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      // B block-pair cells, derived from cluster parallelism the same way
      // withNorms sizes its repartition: smallest B with B(B+1)/2 >= the
      // configured shuffle parallelism (32 partitions -> B=8 -> 36 cells;
      // a 1000-core cluster conf -> B=45 -> 1035 cells). Replication per
      // side is ~B/2, so B also tunes per-task compute vs fan-out.
      val cores = s.conf.get("spark.sql.shuffle.partitions").toInt
      val B = math.ceil((math.sqrt(8.0 * cores + 1) - 1) / 2).toInt.max(2)
      val withB = withNorms(s, dir)
        .withColumn("blk", pmod(col("vec_id"), lit(B)).cast("int"))
      val left = withB.select(
        col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("nrm").as("na"), col("blk").as("b1"),
        explode(sequence(col("blk"), lit(B - 1))).as("b2"))
      val right = withB.select(
        col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("nrm").as("nb"), col("blk").as("b2"),
        explode(sequence(lit(0), col("blk"))).as("b1"))
      // A cross-block pair meets exactly once, at key (min blk, max blk) —
      // possibly with vec_a > vec_b, canonicalized after the symmetric
      // cosine. A same-block pair meets twice at the diagonal key; the
      // vec_a < vec_b guard keeps one copy.
      left.join(right, Seq("b1", "b2"))
        .filter(col("b1") =!= col("b2") || col("vec_a") < col("vec_b"))
        .withColumn("cosine", dotExpr("ea", "eb") / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.5)
        .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
          greatest(col("vec_a"), col("vec_b")).as("vec_b"), col("cosine"))
        .orderBy("vec_a", "vec_b")
    },

    // Hyperplane-LSH embedding near-dup — the sub-quadratic production
    // path (q42's approximate twin, at the high thresholds real near-dup
    // corpora use). Candidates are an equi-join on (band, band-signature);
    // only colliding pairs get the exact cosine verify, mirroring how q37
    // (MinHash) relates to q36 (exact Jaccard). The fixture's organic
    // pairs top out at cosine ~0.6, so the corpus plants a deterministic
    // near-dup per 40th vector (element 0 zeroed — reproduced exactly by
    // the oracle, which stays EXACT SQL over the same constructed corpus).
    QDef(
      "q61_dedup_emblsh",
      s"""WITH pert AS (SELECT vec_id + 1000000 AS vec_id,
         |        [CASE WHEN i = 1 THEN CAST(0 AS FLOAT) ELSE embedding[i] END
         |         for i in range(1, len(embedding) + 1)] AS embedding
         |      FROM embeddings WHERE vec_id % 40 = 0),
         |u AS (SELECT vec_id, embedding FROM embeddings
         |      UNION ALL SELECT vec_id, embedding FROM pert),
         |c AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm FROM u),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |        ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
         |      FROM c a JOIN c b
         |        ON a.vec_id < b.vec_id AND a.nrm > 0 AND b.nrm > 0)
         |SELECT vec_a, vec_b, cosine FROM p
         |WHERE cosine >= 0.8 ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      val corpus = lshCorpus(s, dir)
      val banded = corpus.select(col("vec_id"), explode(col("bands")).as("bsig"))
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.bsig") === col("b.bsig") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      val ea = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("nrm").as("na"))
      val eb = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      cand.join(ea, "vec_a").join(eb, "vec_b")
        .withColumn("cosine", dotExpr("ea", "eb") / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.8)
        .select("vec_a", "vec_b", "cosine")
        // candidate pairs can collide in several bands; dedup AFTER the
        // cheap verify so only the final near-dup pair set is shuffled
        .distinct()
        .orderBy("vec_a", "vec_b")
    },

    // Int8 scalar-quantized top-k: per-vector min/max quantization to
    // 8-bit codes (4x smaller than float32 — at a 100 TB embedding store
    // the scan is usually IO-bound, so the quantized representation is
    // what actually gets scanned; the float originals live cold). The
    // search dequantizes on the fly and runs the same broadcast top-k
    // shape as q40. Contract-checked via [[annContract]];
    // SimilaritySpec bounds top-k agreement against the exact q40.
    QDef("q60_sim_topk_quant", annContractOracle("int8")) { (s, dir) =>
      // int8 reconstruction barely perturbs the ordering — measured mean
      // recall@5 vs exact is ~0.95 on the fixture; 0.7 is the collapse
      // floor (a broken dequant or scale-0 path lands far below it)
      annContract("int8", int8TopK(s, dir), s, dir, minMeanRecall = 0.7)
    },

    // PQ ANN (contract-checked; NorthStarSpec keeps the tight agreement
    // bounds vs exact q40): ADC-scored shortlist over per-subspace
    // codebooks, exact re-rank — the compressed-domain member of the ANN
    // family.
    QDef("q81_sim_topk_pq", annContractOracle("pq")) { (s, dir) =>
      // Exact re-rank of an 8k shortlist keeps measured recall high
      // (~0.9); 0.5 is the collapse floor.
      annContract("pq", rawAnn("q81_sim_topk_pq")(s, dir),
        s, dir, minMeanRecall = 0.5)
    },

    // IVF×PQ composed ANN (contract-checked; NorthStarSpec bounds recall
    // and asserts the candidate-count reduction on a clustered corpus):
    // the actual 100 TB ANN layout — IVF cell pruning picks WHICH vectors
    // get scored, byte-packed PQ codes + ADC decide HOW cheaply, exact
    // re-rank restores true ordering within the shortlist. Same
    // cells/probes as q41 and same codebooks as q81, so the three queries
    // isolate each contribution. The composed floor is the lowest: cell
    // pruning and PQ scoring losses multiply on the near-uniform fixture.
    QDef("q82_sim_topk_ivfpq", annContractOracle("ivfpq")) { (s, dir) =>
      annContract("ivfpq", rawAnn("q82_sim_topk_ivfpq")(s, dir),
        s, dir, minMeanRecall = 0.2)
    },

    // q82's pipeline against the PERSISTED index ([[graft.operators
    // .AnnIndex]]): the probe loads centroids/codebooks/codes from lake
    // tables built once in warm-up through the full
    // build → corpus-append → O(delta) refresh lifecycle, and re-ranks
    // its shortlist by fetching ONLY those embeddings from the corpus
    // table — at 100 TB the scan is the 16x-compressed codes table and
    // the index outlives every session (q41/q82's in-session artifacts
    // retrain per JVM). Same contract shape and floor as q82. Measured
    // fixture recall (AnnProbe, sf0.1): 0.47 vs q82's 0.64 — the same
    // math trained on the 95% bulk instead of the full corpus; on the
    // weakly-clustered fixture embeddings the k-means optimum is
    // split-sensitive, and the 0.2 floor holds with >2x margin.
    QDef("q123_sim_topk_ann_index", annContractOracle("ivfpq_persisted")) {
      (s, dir) =>
        annContract("ivfpq_persisted",
          rawAnn("q123_sim_topk_ann_index")(s, dir),
          s, dir, minMeanRecall = 0.2)
    },

    // SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv:2303.09540):
    // embedding near-dup detection blocked by k-means cells instead of an
    // all-pairs or block-pair join — the paper's observation is that
    // semantic duplicates land in the same coarse cluster, so pairwise
    // cosine only ever runs WITHIN a cell. Pipeline: assign the q61
    // corpus (organic + planted ~0.992-cosine clones) to its nearest
    // trained centroid (broadcast map-side pass, q41's assignment step),
    // equi-join on cell id for candidate pairs, exact-cosine verify at
    // the q42 threshold, then large-star/small-star connected components
    // (q71's operator) pick one canonical keeper per duplicate group.
    // The cell assignment is exported (q71 scratch pattern) and
    // EVERYTHING downstream of it — the perturbed corpus, the within-cell
    // pair set, the transitive closure, the keeper choice — is recomputed
    // independently by DuckDB, so a wrong cosine, a lost pair, or a
    // broken component merge turns the row red; NorthStarSpec separately
    // bounds planted-clone capture (the blocking-quality contract the
    // oracle, which replays the engine's own blocking, cannot state).
    // Scale shape: shuffle keys are bounded by the centroid count, the
    // per-cell quadratic work is the paper's accepted cost (cells are
    // corpus/k sized and AQE-splittable), and nothing corpus-sized is
    // ever broadcast or collected.
    QDef(
      "q108_semantic_dedup",
      s"""WITH RECURSIVE
         |pert AS (SELECT vec_id + 1000000 AS vec_id,
         |        [CASE WHEN i = 1 THEN CAST(0 AS FLOAT) ELSE embedding[i] END
         |         for i in range(1, len(embedding) + 1)] AS embedding
         |      FROM embeddings WHERE vec_id % 40 = 0),
         |u AS (SELECT vec_id, embedding FROM embeddings
         |      UNION ALL SELECT vec_id, embedding FROM pert),
         |c AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
         |      FROM u),
         |cells AS (SELECT vec_id, cell
         |          FROM read_parquet('__SCRATCH__/q108_cells/*.parquet')),
         |j AS (SELECT c.vec_id, c.embedding, c.nrm, cells.cell
         |      FROM c JOIN cells USING (vec_id) WHERE c.nrm > 0),
         |p AS (SELECT a.vec_id AS pu, b.vec_id AS pv
         |      FROM j a JOIN j b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |      WHERE ${duckDot("a.embedding", "b.embedding")}
         |            / (a.nrm * b.nrm) >= 0.5),
         |e AS (SELECT pu AS eu, pv AS ev FROM p
         |      UNION SELECT pv, pu FROM p),
         |n AS (SELECT DISTINCT eu AS node FROM e),
         |reach(node, r) AS (
         |  SELECT node, node FROM n
         |  UNION
         |  SELECT e.eu, reach.r FROM e JOIN reach ON e.ev = reach.node),
         |comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
         |sized AS (SELECT component, COUNT(*) AS csize
         |          FROM comp GROUP BY component)
         |SELECT c2.node AS vec_id, c2.component, s.csize,
         |       c2.node = c2.component AS keep
         |FROM comp c2 JOIN sized s USING (component)
         |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val corpus = lshCorpus(s, dir).select("vec_id", "embedding", "nrm")
      // blocking tier: constant expected cell size (N/125), so the
      // within-cell all-pairs stage below stays linear in the corpus
      val cents = trainedCentroids(s, dir, blockCells(s, dir))
      val assigned = ivfCells(corpus, cents, "vec_id", "embedding", "nrm",
        keep = 1)
      // materialize the blocking once and hand the SAME copy to the
      // oracle — everything after this line is independently recomputed
      val cellsPath = Tables.scratch(dir, "q108_cells")
      // plain parallel write — the oracle globs the directory, so the
      // single-task coalesce(1) serialization point was pure overhead
      assigned.select("vec_id", "cell")
        .write.mode("overwrite").parquet(cellsPath)
      val withCell = corpus.join(s.read.parquet(cellsPath), "vec_id")
      val a = withCell.select(col("cell"), col("vec_id").as("u"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = withCell.select(col("cell"), col("vec_id").as("v"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      val pairs = a.join(b, Seq("cell"))
        .filter(col("u") < col("v"))
        .withColumn("cosine", dotExpr("ea", "eb") / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.5)
        .select("u", "v")
      val comps = graft.operators.ConnectedComponents.components(pairs)
      val sized = comps.groupBy("component").agg(count(lit(1)).as("csize"))
      comps.join(sized, "component")
        .select(col("node").as("vec_id"), col("component"), col("csize"),
          (col("node") === col("component")).as("keep"))
        .orderBy("vec_id")
    })

  /** Int8 scalar-quantized top-k (q60's raw result): per-vector min/max
    * quantization to 8-bit codes, dequantize-on-scan, q40's broadcast
    * top-k shape.
    */
  private def int8TopK(s: SparkSession, dir: String): DataFrame = {
      val e = t(s, dir, "embeddings")
      // Quantization params + codes + dequantized reconstruction in ONE
      // narrow projection chain — no join anywhere before the top-k (each
      // select only references columns the previous one produced, so
      // Catalyst collapses the chain into a single scan-time project).
      def quantized(idAs: String, pfx: String) = e
        .select(col("vec_id").as(idAs), col("embedding"),
          array_min(col("embedding")).as(s"${pfx}min"),
          array_max(col("embedding")).as(s"${pfx}max"))
        // scale 0 (constant embedding) would put NaN in every code, so
        // codes are kept at 0 and the reconstruction is all-min — EXACT for
        // any constant vector. A constant NONZERO vector therefore survives
        // the norm filter below (|min|*sqrt(d) > 0) with exact
        // reconstruction; only the all-zero vector (no direction) is
        // dropped by it.
        .select(col(idAs), col("embedding"), col(s"${pfx}min"),
          ((col(s"${pfx}max") - col(s"${pfx}min")) / 255.0).as(s"${pfx}scale"))
        .select(col(idAs), col(s"${pfx}min"), col(s"${pfx}scale"),
          // the int8 code array — this is what a quantized store persists
          transform(col("embedding"),
            x => when(col(s"${pfx}scale") === 0, lit(0))
              .otherwise(round((x - col(s"${pfx}min")) / col(s"${pfx}scale")))
              .cast("int"))
            .as(s"${pfx}q"))
        // dequantized reconstruction used by the scan-time dot product
        .withColumn(s"${pfx}deq",
          transform(col(s"${pfx}q"),
            v => (col(s"${pfx}min") + v * col(s"${pfx}scale")).cast("float")))
        .withColumn(s"${pfx}norm",
          graft.functions.VecOps.normf(col(s"${pfx}deq")))
        .filter(col(s"${pfx}norm") > 0)
      val cand = quantized("cand_id", "c")
      val qs = quantized("qid", "q").filter(col("qid") % 20 === 0)
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cand_id"))
      cand.crossJoin(broadcast(qs))
        .filter(col("cand_id") =!= col("qid"))
        .withColumn("cosine",
          graft.functions.VecOps.dotf(col("qdeq"), col("cdeq"))
            / (col("qnorm") * col("cnorm")))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= TopK)
        .select("qid", "cand_id", "rnk", "cosine")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracle: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
