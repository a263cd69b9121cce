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

  /** Left-to-right double-precision cosine between two float-array columns
    * (codegen'd higher-order functions; no UDF).
    */
  private def cosine(a: String, b: String): Column = {
    def dot(x: String, y: String) =
      s"""aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
         |          CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin
    expr(
      s"""${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))""")
  }

  /** DuckDB twin of [[cosine]]: identical fold order via list_reduce. */
  private def duckCosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(list_zip($x, $y),
         |                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
         |  (acc, v) -> acc + v)""".stripMargin
    s"""${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"""
  }

  /** Every 20th vector is a query — a small set next to the corpus, the
    * realistic ANN shape (and broadcastable at any corpus scale).
    */
  private def querySet(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))

  val TopK = 5

  val defs: Seq[QDef] = Seq(

    // Brute-force cosine top-k: broadcast queries x full corpus scan.
    // Plan: BroadcastNestedLoopJoin (the *intended* physical shape here —
    // each executor scans its corpus slice against the in-memory query set;
    // zero shuffle before the final per-query top-k).
    QDef(
      "q40_sim_topk",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe
         |           FROM embeddings WHERE vec_id % 20 = 0),
         |s AS (SELECT q.qid, e.vec_id AS cand_id,
         |        ${duckCosine("q.qe", "e.embedding")} AS cosine
         |      FROM q, embeddings e WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, cand_id, cosine,
         |        ROW_NUMBER() OVER (PARTITION BY qid
         |                           ORDER BY cosine DESC, cand_id) AS rnk
         |      FROM s)
         |SELECT qid, cand_id, CAST(rnk AS BIGINT) AS rnk, cosine
         |FROM r WHERE rnk <= $TopK ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val scored = e.select(col("vec_id").as("cand_id"), col("embedding"))
        .crossJoin(broadcast(querySet(e)))
        .filter(col("cand_id") =!= col("qid"))
        .withColumn("cosine", cosine("qe", "embedding"))
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
      val e = t(s, dir, "embeddings")
      val nCells = 16
      val nProbe = 4
      val centroids = broadcast(
        e.filter(col("vec_id") < nCells)
          .select(col("vec_id").as("cell"), col("embedding").as("ce")))
      def nearestCells(points: DataFrame, id: String, vec: String, keep: Int) = {
        val w = Window.partitionBy(id).orderBy(col("cell_cos").desc, col("cell"))
        points.crossJoin(centroids)
          .withColumn("cell_cos", cosine(vec, "ce"))
          .withColumn("cell_rank", row_number().over(w))
          .filter(col("cell_rank") <= keep)
          .drop("ce", "cell_cos", "cell_rank")
      }
      val assigned = nearestCells(
        e.select(col("vec_id").as("cand_id"), col("embedding")),
        "cand_id", "embedding", keep = 1)
      val probes = nearestCells(querySet(e), "qid", "qe", keep = nProbe)
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cand_id"))
      probes.join(assigned, "cell")
        .filter(col("cand_id") =!= col("qid"))
        .withColumn("cosine", cosine("qe", "embedding"))
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
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${duckCosine("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.5
         |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cosine", cosine("ea", "eb"))
        .filter(col("cosine") >= 0.5)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracle: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
