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
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def withNorms(s: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((s, dir), {
      val n = s.conf.get("spark.sql.shuffle.partitions").toInt
      t(s, dir, "embeddings")
        .repartition(n, col("vec_id"))
        .select(col("vec_id"), col("embedding"), normExpr("embedding").as("nrm"))
        .cache()
    })

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
         |      FROM q, c WHERE c.cand_id <> q.qid),
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

    // IVF approximate top-k — the scale path. Coarse quantizer = the first
    // 16 vectors (deterministic stand-in for trained centroids); every
    // vector is assigned to its nearest centroid cell (broadcast map-side
    // pass), queries probe their 4 nearest cells, and candidate generation
    // is an EQUI-JOIN on cell id. Shuffle keys are bounded by the centroid
    // count; skewed cells are AQE-splittable. Rows-only check (approximate
    // results have no SQL oracle); SimilaritySpec asserts recall vs q40.
    QDef("q41_sim_topk_ivf", null) { (s, dir) =>
      val nCells = 16
      val nProbe = 4
      val centroids = broadcast(
        withNorms(s, dir).filter(col("vec_id") < nCells)
          .select(col("vec_id").as("cell"), col("embedding").as("ce"),
            col("nrm").as("cenorm")))
      // nearest centroid cells by cosine; `norm` is the caller-provided
      // per-row norm column so only the q-c dot runs per (point, centroid)
      def nearestCells(points: DataFrame, id: String, vec: String,
                       norm: String, keep: Int) = {
        val w = Window.partitionBy(id).orderBy(col("cell_cos").desc, col("cell"))
        points.crossJoin(centroids)
          .withColumn("cell_cos",
            dotExpr(vec, "ce") / (col(norm) * col("cenorm")))
          .withColumn("cell_rank", row_number().over(w))
          .filter(col("cell_rank") <= keep)
          .drop("ce", "cenorm", "cell_cos", "cell_rank")
      }
      val assigned = nearestCells(corpus(s, dir), "cand_id", "embedding", "cnorm", keep = 1)
      val probes = nearestCells(querySet(s, dir), "qid", "qe", "qnorm", keep = nProbe)
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cand_id"))
      probes.join(assigned, "cell")
        .filter(col("cand_id") =!= col("qid"))
        .withColumn("cosine",
          dotExpr("qe", "embedding") / (col("qnorm") * col("cnorm")))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= TopK)
        .select("qid", "cand_id", "rnk", "cosine")
        .orderBy("qid", "rnk")
    },

    // Embedding-cosine near-dup pairs (the §2C dedup family's embedding
    // member): exact threshold self-join. This is the correctness baseline
    // — all-pairs is intentional and oracle-checked; at 100 TB the same
    // output comes from the q41 cell structure (equi-join candidates +
    // threshold verify) once a trained quantizer bounds cell sizes.
    QDef(
      "q42_dedup_embcos",
      s"""WITH c AS (SELECT vec_id, embedding,
         |             ${duckNorm("embedding")} AS nrm
         |           FROM embeddings),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |        ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
         |      FROM c a JOIN c b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, cosine FROM p
         |WHERE cosine >= 0.5 ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      val withN = withNorms(s, dir)
      val a = withN.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("nrm").as("na"))
      val b = withN.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      a.join(broadcast(b), col("vec_a") < col("vec_b"))
        .withColumn("cosine", dotExpr("ea", "eb") / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.5)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    },

    // Int8 scalar-quantized top-k: per-vector min/max quantization to
    // 8-bit codes (4x smaller than float32 — at a 100 TB embedding store
    // the scan is usually IO-bound, so the quantized representation is
    // what actually gets scanned; the float originals live cold). The
    // search dequantizes on the fly and runs the same broadcast top-k
    // shape as q40. Rows-only (quantization error has no SQL oracle);
    // SimilaritySpec bounds top-k agreement against the exact q40.
    QDef("q60_sim_topk_quant", null) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      def quantized(idAs: String, pfx: String) = e.select(
        col("vec_id").as(idAs),
        array_min(col("embedding")).as(s"${pfx}min"),
        ((array_max(col("embedding")) - array_min(col("embedding"))) / 255.0)
          .as(s"${pfx}scale"))
        .join(e.select(col("vec_id").as(idAs), col("embedding")), idAs)
        .select(col(idAs), col(s"${pfx}min"), col(s"${pfx}scale"),
          // the int8 code array — this is what a quantized store persists
          transform(col("embedding"),
            x => round((x - col(s"${pfx}min")) / col(s"${pfx}scale")).cast("int"))
            .as(s"${pfx}q"))
        // dequantized reconstruction used by the scan-time dot product
        .withColumn(s"${pfx}deq",
          transform(col(s"${pfx}q"),
            v => (col(s"${pfx}min") + v * col(s"${pfx}scale")).cast("float")))
        .withColumn(s"${pfx}norm",
          graft.functions.VecOps.normf(col(s"${pfx}deq")))
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
        .orderBy("qid", "rnk")
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracle: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
