package graft.queries

import graft.{QDef, Tables}
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** North-star text-analysis + deduplication operators over `documents`
  * (SURVEY.md §2C; BASELINE.json north_star): text stats, token counting,
  * language-ID heuristic, quality scoring, fingerprinting, exact dedup,
  * n-gram-Jaccard dedup, MinHash+LSH dedup, SimHash dedup.
  *
  * Scale design (100 TB): every operator is expressed as narrow projections
  * plus equi-joins/aggregations on bounded keys — tokenize/shingle are
  * per-row codegen'd projections; near-dup candidate generation is an
  * equi-join on shingle / LSH-band / SimHash-chunk (never an all-pairs
  * cross join); verification touches only candidate pairs.
  */
object Text {

  /** Whitespace tokens. Fixture text is single-space separated. */
  private def toks(c: Column): Column = split(c, " ")

  /** Per-(session, dir) memo for the shared shingle frame: q36/q37/q38 all
    * consume the same cached copy — the local analog of materializing the
    * shingle table once instead of recomputing it per downstream query (at
    * 100 TB the same role is played by a persisted intermediate table).
    */
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Drop cached per-dir feature frames (test/benchmark hygiene: a
    * long-lived JVM serving many dirs would otherwise pin executor
    * storage memory forever).
    */
  def clearCache(): Unit = {
    memo.values.foreach(_.unpersist())
    memo.clear()
  }

  /** (doc_id, shs: sorted distinct array<long>, n_sh) — hashed trigram
    * shingles via the native [[graft.functions.ShingleHash]] expression:
    * 8-byte hashes instead of ~20-byte strings (identical pair results —
    * a 64-bit collision across ~1e5-1e8 distinct shingles is ~1e-9 and
    * deterministic), sorted so a global-order prefix is `slice` and
    * intersection is a linear merge.
    */
  private def hashShingled(s: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((s, dir, "shs"), {
      // The documents fixture is a single small parquet file -> a 1-partition
      // scan, which would run every downstream narrow stage (hashing, prefix
      // explode, broadcast-join probes, merge-counts) on ONE core. One tiny
      // deterministic shuffle here spreads the cached frame across the
      // cluster; on a real multi-file corpus the scan is already parallel
      // and this becomes a no-op-sized rebalance.
      val n = s.conf.get("spark.sql.shuffle.partitions").toInt
      t(s, dir, "documents")
        .repartition(n, col("doc_id"))
        .select(col("doc_id"),
          graft.functions.TextHash.shingleHashf(col("text")).as("shs"))
        .withColumn("n_sh", size(col("shs")).cast("long"))
        .cache()
    })

  /** Exact trigram-shingle Jaccard >= `threshold` for a candidate-pair
    * frame with columns (doc_a, doc_b): joins the hashed shingle arrays
    * back on both sides and verifies with the native linear-merge
    * [[graft.functions.IntersectCount]] — only candidate pairs are
    * touched, never the full cross product.
    */
  private def verifyJaccard(cand: DataFrame, docs: DataFrame,
                            threshold: Double): DataFrame = {
    val a = docs.select(col("doc_id").as("doc_a"), col("shs").as("sh_a"),
      col("n_sh").as("n_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("shs").as("sh_b"),
      col("n_sh").as("n_b"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter",
        graft.functions.TextHash.intersectCountf(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      // Dedup AFTER verification: candidate generators may emit a pair once
      // per shared prefix shingle / band, but verification is a narrow
      // broadcast-join + merge-count, so re-verifying duplicates is cheaper
      // than a pre-verify distinct over the full candidate set — the
      // distinct here shuffles only the final (tiny) near-dup pair set.
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** The q36 exact near-dup pair set (prefix-filtered candidates +
    * verified Jaccard >= 0.5), memoized like [[hashShingled]]: q36 emits
    * it and q71 builds dup clusters on it — the local analog of the
    * persisted pair table a production dedup pipeline would keep between
    * the pairing and clustering stages.
    */
  private def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((s, dir, "jpairs"), {
      val docs = hashShingled(s, dir)
      val pre = docs.select(col("doc_id"),
        explode(slice(col("shs"), lit(1), (col("n_sh") / 2 + 1).cast("int")))
          .as("shingle"))
      val cand = pre.as("a")
        .join(pre.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      verifyJaccard(cand, docs, 0.5).cache()
    })

  /** DuckDB oracle prelude: tokenized + shingled documents (1-based
    * subscripts; string shingles — the engine side hashes them via
    * [[graft.functions.ShingleHash]], which preserves the pair set).
    */
  private val oracleShingles =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id,
      |        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                       for i in range(1, greatest(len(toks)-1, 1))]) AS sh
      |      FROM w),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db, a.n AS na, b.n AS nb,
      |             count(*) AS inter
      |      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2, 3, 4)
      |SELECT da AS doc_a, db AS doc_b,
      |       ROUND(CAST(inter AS DOUBLE)/(na+nb-inter), 6) AS jaccard
      |FROM p
      |WHERE CAST(inter AS DOUBLE)/(na+nb-inter) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q124's DuckDB twin: the full exact-Jaccard pair set MINUS exactly
    * the pairs the lifecycle's takedown suppresses — a deleted doc
    * (doc_id % 5 == 2, present only if it arrived in batches 1-2, i.e.
    * doc_id % 3 < 2) can no longer pair with the LATER batch-3 docs
    * (doc_id % 3 == 2); every other pair was delivered before the
    * deletion and stays in the append-only stream.
    */
  private val oracleIncremental =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id,
      |        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                       for i in range(1, greatest(len(toks)-1, 1))]) AS sh
      |      FROM w),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db, a.n AS na, b.n AS nb,
      |             count(*) AS inter
      |      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2, 3, 4)
      |SELECT da AS doc_a, db AS doc_b,
      |       ROUND(CAST(inter AS DOUBLE)/(na+nb-inter), 6) AS jaccard
      |FROM p
      |WHERE CAST(inter AS DOUBLE)/(na+nb-inter) >= 0.5
      |  AND NOT ((da % 5 = 2 AND da % 3 < 2 AND db % 3 = 2)
      |        OR (db % 5 = 2 AND db % 3 < 2 AND da % 3 = 2))
      |ORDER BY doc_a, doc_b""".stripMargin

  // MinHash family: 64 permutations approximated by seeded hashes; bands
  // of 2 rows => 32 bands. Band width is chosen so the LSH S-curve is
  // ~1 AT the q36 verify threshold itself, not just for high-J pairs:
  // P(candidate | J=0.5) = 1-(1-0.5^2)^32 ≈ 0.99990, so oracle equality
  // with the exact-Jaccard pair set holds for any fixture whose dup pairs
  // clear the threshold (previously 16x4 bands gave only ~0.64 at J=0.5
  // and leaned on the fixtures' dups being high-J). The cost is a fatter
  // candidate set (background pairs at J≈0.1 collide in some band ~27% of
  // the time) — acceptable because candidates are verified by a cheap
  // narrow merge-count, and at production thresholds (J >= 0.8) the band
  // shape would be re-tuned anyway.
  private val NumHashes = 64
  private val RowsPerBand = 2
  private val NumBands = NumHashes / RowsPerBand

  /** q38's DuckDB twin, from the engine-exported feature frame
    * (`__SCRATCH__` expands to the per-SF scratch root in [[graft.Verify]]):
    * per-(doc, bit) majority votes over the shingle hashes, vote signs
    * packed into 4 x 16-bit chunk values, then an all-pairs hamming join.
    * `h >> j` is DuckDB's arithmetic shift on signed BIGINT — correct for
    * every bit index because the `& 1` masks the sign extension.
    */
  private val oracleSimhash =
    """WITH f AS (SELECT doc_id, unnest(shs) AS h
      |           FROM read_parquet('__SCRATCH__/q38_features/*.parquet')),
      |v AS (SELECT doc_id, j,
      |             SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |      FROM f, range(64) t(j) GROUP BY doc_id, j),
      |ch AS (SELECT doc_id, CAST(j // 16 AS INT) AS chunk,
      |              SUM(CASE WHEN vote > 0
      |                       THEN (1 << CAST(j % 16 AS INT)) ELSE 0 END) AS cval
      |       FROM v GROUP BY doc_id, chunk),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |             SUM(bit_count(xor(CAST(a.cval AS BIGINT),
      |                               CAST(b.cval AS BIGINT)))) AS hamming
      |      FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
      |FROM p WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin

  val defs: Seq[QDef] = Seq(

    // ------------------------------------------------------------------
    // Text analysis
    // ------------------------------------------------------------------

    // Corpus stats per language: doc counts, char mass, token averages.
    QDef(
      "q30_text_stats",
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"),
          sum(size(toks(col("text"))).cast("long")).as("total_tokens"),
          (sum(size(toks(col("text"))).cast("long")).cast("double") / count(lit(1)))
            .as("avg_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang")
    },

    // Per-doc token counting: whitespace tokens + a BPE-ish regex pass
    // (letter runs / digit runs / single non-alnum symbols).
    QDef(
      "q31_token_count",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(LENGTH(text) AS BIGINT) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          size(toks(col("text"))).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).cast("long")
            .as("n_bpe_tokens"),
          length(col("text")).cast("long").as("n_chars_m"))
        .orderBy("doc_id")
    },

    // Language-ID heuristic: stopword-profile scores -> argmax (fixed
    // priority on ties), reported as a lang x predicted confusion matrix.
    QDef(
      "q32_lang_id",
      """WITH scored AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','is'))) AS s_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','que','y'))) AS s_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','ist'))) AS s_de,
        |    len(list_filter(string_split(text,' '), t -> t IN ('le','les','et','des'))) AS s_fr
        |  FROM documents),
        |pred AS (
        |  SELECT lang, CASE
        |    WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
        |    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |    WHEN s_de >= s_fr THEN 'de'
        |    ELSE 'fr' END AS lang_pred
        |  FROM scored)
        |SELECT lang, lang_pred, COUNT(*) AS n
        |FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin) { (s, dir) =>
      def score(words: Seq[String]): String =
        s"size(filter(split(text, ' '), t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
      t(s, dir, "documents")
        .withColumn("s_en", expr(score(Seq("the", "a", "of", "and", "is"))))
        .withColumn("s_es", expr(score(Seq("el", "la", "de", "que", "y"))))
        .withColumn("s_de", expr(score(Seq("der", "die", "und", "ist"))))
        .withColumn("s_fr", expr(score(Seq("le", "les", "et", "des"))))
        .withColumn("lang_pred",
          when(col("s_en") === 0 && col("s_es") === 0 && col("s_de") === 0 && col("s_fr") === 0, "und")
            .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")
    },

    // Quality scoring: length band, stopword ratio, mean token length,
    // symbol ratio -> one deterministic composite in [0,1].
    QDef(
      "q33_quality_score",
      """SELECT doc_id,
        |  CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  ROUND(CAST(LENGTH(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
        |        / len(string_split(text,' ')), 6) AS avg_token_len,
        |  ROUND(CAST(len(list_filter(string_split(text,' '),
        |          t -> t IN ('the','a','of','and','is'))) AS DOUBLE)
        |        / len(string_split(text,' ')), 6) AS stopword_ratio,
        |  ROUND(CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
        |        / LENGTH(text), 6) AS symbol_ratio,
        |  ROUND(0.5 * LEAST(CAST(len(string_split(text,' ')) AS DOUBLE) / 50.0, 1.0)
        |      + 0.5 * LEAST(CAST(len(list_filter(string_split(text,' '),
        |            t -> t IN ('the','a','of','and','is'))) AS DOUBLE)
        |          / len(string_split(text,' ')) * 5.0, 1.0), 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val nt = size(toks(col("text"))).cast("long")
      val stop = expr("size(filter(split(text, ' '), t -> t IN ('the','a','of','and','is')))")
        .cast("long")
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars_m"),
          nt.as("n_tokens"),
          round((length(col("text")).cast("double") - nt + lit(1)) / nt, 6)
            .as("avg_token_len"),
          round(stop.cast("double") / nt, 6).as("stopword_ratio"),
          round(length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double")
            / length(col("text")), 6).as("symbol_ratio"),
          round(lit(0.5) * least(nt.cast("double") / 50.0, lit(1.0))
            + lit(0.5) * least(stop.cast("double") / nt * 5.0, lit(1.0)), 6)
            .as("quality"))
        .orderBy("doc_id")
    },

    // Document fingerprinting: whole-text digest plus head/tail chunk
    // digests (the cheap shift-detector pattern).
    QDef(
      "q34_fingerprint",
      """SELECT doc_id,
        |  md5(text) AS fp,
        |  md5(substr(text, 1, 64)) AS fp_head,
        |  md5(substr(text, GREATEST(LENGTH(text)-63, 1))) AS fp_tail
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          md5(col("text")).as("fp"),
          md5(substring(col("text"), 1, 64)).as("fp_head"),
          md5(col("text").substr(greatest(length(col("text")) - 63, lit(1)),
            length(col("text")))).as("fp_tail"))
        .orderBy("doc_id")
    },

    // ------------------------------------------------------------------
    // Deduplication
    // ------------------------------------------------------------------

    // Exact dedup: hash-groupBy on the text digest, keep the lowest doc_id.
    // One shuffle on the digest; scales as a plain aggregation.
    QDef(
      "q35_dedup_exact",
      """SELECT md5(text) AS fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("fp")
    },

    // n-gram Jaccard near-dup pairs with PREFIX FILTERING (the classic
    // set-similarity-join bound, cf. SSJoin/PPJoin): under a global
    // element order, two sets with Jaccard >= t must share an element
    // within each set's first n - ceil(t*n) + 1 elements (t=0.5 ->
    // floor(n/2)+1). So only prefixes are exploded and joined — at sf0.1
    // this cuts candidate pairs ~1.1M -> ~0.3M with zero extra shuffles
    // (the order is the hash value itself; sorting is per-row) — and
    // candidates are then verified exactly. Same oracle as the naive
    // explode-all join; q37 (MinHash bands) remains the probabilistic
    // production path when even prefix fan-out is too hot.
    QDef("q36_dedup_jaccard", oracleShingles) { (s, dir) =>
      jaccardPairs(s, dir)
    },

    // MinHash + LSH banding: 64 seeded-hash mins -> 16 band signatures ->
    // equi-join on (band, signature) for candidates -> exact-Jaccard
    // verification of candidates only. Never an all-pairs comparison; every
    // shuffle key (band index, band signature) is bounded by band count x
    // bucket population. The whole signature step is the native one-pass
    // MinHashBands projection — LSH banding runs at scan speed and only the
    // small (doc_id, band, bsig) table is shuffled. Oracle: identical to
    // q36 — the fixed hash family makes candidate recall exact at these
    // similarity gaps (see NumHashes).
    QDef("q37_dedup_minhash", oracleShingles) { (s, dir) =>
      val docs = hashShingled(s, dir)
      val banded = docs
        .select(col("doc_id"),
          posexplode(graft.functions.TextHash.minHashBandsf(
            col("shs"), NumHashes, RowsPerBand)).as(Seq("band", "bsig")))
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      verifyJaccard(cand, docs, 0.5)
    },

    // INCREMENTAL corpus dedup ([[graft.operators.DedupIndex]]) — the
    // production shape of q37: the documents arrive as THREE commit-log
    // batches plus a DELETE batch, each insert batch shingles/bands ONLY
    // its own docs, probes the persisted band table, verifies candidates
    // by exact Jaccard, and extends the table in one watermarked commit
    // (crash-replay idempotent — DedupIndexSpec). The delete batch
    // (every doc_id % 5 == 2 doc already indexed) vector-deletes those
    // docs' band rows, so pairs they would have formed with the LATER
    // third batch never appear — while pairs already delivered before
    // the deletion stay in the stream (delivery is append-only). The
    // accumulated stream must equal q37's full-recompute pair set MINUS
    // exactly the deleted-x-batch3 pairs: the oracle restates that
    // set-algebra independently, so a phantom pair from an unpurged
    // band row (or a pair lost across a batch boundary, or emitted
    // twice) turns the row red. At 100 TB each batch costs O(delta +
    // collisions) and a takedown costs O(deleted rows); q37's recompute
    // costs O(corpus) per run.
    QDef("q124_dedup_incremental", oracleIncremental) { (s, dir) =>
      val corpusRoot = Tables.scratch(dir, "dedup_idx_corpus")
      val indexRoot = Tables.scratch(dir, "dedup_idx")
      // fresh per invocation (bench runs the query twice per process):
      // the scratch root is per-JVM, so same-session reruns must reset
      val hconf = s.sparkContext.hadoopConfiguration
      Seq(corpusRoot, indexRoot).foreach { r =>
        val p = new org.apache.hadoop.fs.Path(r)
        val fs = p.getFileSystem(hconf)
        if (fs.exists(p)) fs.delete(p, true)
      }
      val docs = t(s, dir, "documents").select("doc_id", "text")
      def step(batch: Option[DataFrame]): DataFrame = {
        batch.foreach(graft.lake.TxLog.append(s, _, corpusRoot))
        graft.operators.DedupIndex.update(s, corpusRoot, indexRoot,
          threshold = 0.5)
      }
      val p1 = step(Some(docs.filter(col("doc_id") % 3 === 0)))
      val p2 = step(Some(docs.filter(col("doc_id") % 3 === 1)))
      // takedown between batches 2 and 3: already-indexed docs leave
      // the corpus; the maintenance step consumes the delete feed
      graft.lake.TxLog.deleteVectored(s, corpusRoot,
        col("doc_id") % 5 === 2)
      val pd = step(None)
      val p3 = step(Some(docs.filter(col("doc_id") % 3 === 2)))
      Seq(p1, p2, pd, p3).reduce(_ unionByName _)
        .orderBy("doc_a", "doc_b")
    },

    // SimHash near-dup: 64-bit signature from per-shingle hash bit votes
    // (trigram shingles — unigram features degenerate on low-entropy
    // vocabularies: unrelated docs share whole token SETS); candidates
    // block on 4x16-bit chunks (a pair within Hamming distance 3 must
    // agree on >= 1 chunk), verified with bit_count(xor) <= 3.
    //
    // Oracle contract: the XXH64 shingle hashing itself is not
    // SQL-expressible (wrapping 64-bit multiplies), so the query EXPORTS
    // its feature frame (doc_id, shs) and DuckDB independently recomputes
    // EVERYTHING downstream of it — the per-bit majority vote, the
    // signature packing, and the pair verify as an ALL-PAIRS hamming join
    // (which also proves the chunk blocking loses nothing: hamming <= 3
    // forces >= 1 agreeing 16-bit chunk by pigeonhole). The features are
    // the same frame q36/q37 build on, whose pair-set fidelity is
    // oracle-checked directly.
    QDef("q38_dedup_simhash", oracleSimhash) { (s, dir) =>
      val feats = hashShingled(s, dir).filter(col("n_sh") > 0)
      // metadata-sized export for the DuckDB recheck (see oracle above);
      // written per VERIFY run so the oracle always sees THIS run's
      // features — gated on the property graft.Verify sets, because the
      // frame exists only for the oracle and Bench paying the write per
      // timed run double-counted it (r4: q38 0.32 -> 0.74 s)
      if (sys.props.get("graft.verify.export").contains("true"))
        feats.select("doc_id", "shs").coalesce(1).write.mode("overwrite")
          .parquet(Tables.scratch(dir, "q38_features"))
      // The ShingleHash longs are already uniform 64-bit hashes, and the
      // native SimHash64 projection folds the per-bit majority vote into a
      // single per-row pass — signatures at scan speed, no explode shuffle.
      // Empty-shingle docs are filtered: an all-zero signature would make
      // every sub-3-token doc a candidate pair of every other.
      val sig = feats
        .select(col("doc_id"),
          graft.functions.TextHash.simHash64f(col("shs")).as("simhash"))
      val chunks = sig.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), 16 * c).bitwiseAND(0xFFFFL)): _*))
          .as(Seq("chunk", "cval")))
      val cand = chunks.as("a")
        .join(chunks.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.cval") === col("b.cval")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      cand
        .withColumn("hamming",
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
        .filter(col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        // dedup after the (narrow) hamming check — same rationale as
        // verifyJaccard: only the final pair set is shuffled
        .distinct()
        .orderBy("doc_a", "doc_b")
    },

    // Benchmark decontamination — the cross-set variant of near-dup: flag
    // TRAINING docs whose shingles are CONTAINED in any benchmark/eval doc
    // (containment = |overlap| / |train shingles|, asymmetric — a short
    // training doc fully quoted inside a long benchmark doc must flag even
    // though symmetric Jaccard would be low). Every 50th doc stands in for
    // the benchmark set. Candidate generation is the same bounded
    // shingle-hash equi-join as q36 (never all-pairs): the benchmark side
    // is tiny by nature, so at 100 TB this is a broadcast/bloom probe of
    // the training scan. Verified with the native linear merge-count.
    QDef(
      "q70_decontaminate",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                       for i in range(1, greatest(len(toks)-1, 1))]) AS sh
        |      FROM w),
        |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |b AS (SELECT * FROM e WHERE doc_id % 50 = 0),
        |t AS (SELECT * FROM e WHERE doc_id % 50 <> 0),
        |p AS (SELECT t.doc_id AS train_doc, b.doc_id AS bench_doc,
        |             t.n AS nt, count(*) AS inter
        |      FROM t JOIN b ON t.shingle = b.shingle
        |      GROUP BY 1, 2, 3)
        |SELECT train_doc, bench_doc,
        |       ROUND(CAST(inter AS DOUBLE) / nt, 6) AS containment
        |FROM p
        |WHERE CAST(inter AS DOUBLE) / nt >= 0.5
        |ORDER BY train_doc, bench_doc""".stripMargin) { (s, dir) =>
      val docs = hashShingled(s, dir).filter(col("n_sh") > 0)
      val bench = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("bench_doc"), col("shs").as("sh_b"))
      val train = docs.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id").as("train_doc"), col("shs").as("sh_t"),
          col("n_sh").as("nt"))
      // candidates: shingle equi-join of the training scan against the
      // (tiny, broadcastable) benchmark side
      val benchEx = bench.select(col("bench_doc"), explode(col("sh_b")).as("shingle"))
      val trainEx = train.select(col("train_doc"), explode(col("sh_t")).as("shingle"))
      val cand = trainEx.join(broadcast(benchEx), "shingle")
        .select("train_doc", "bench_doc").distinct()
      cand.join(train, "train_doc").join(broadcast(bench), "bench_doc")
        .withColumn("inter",
          graft.functions.TextHash.intersectCountf(col("sh_t"), col("sh_b")))
        .withColumn("containment",
          round(col("inter").cast("double") / col("nt"), 6))
        .filter(col("inter").cast("double") / col("nt") >= 0.5)
        .select("train_doc", "bench_doc", "containment")
        .orderBy("train_doc", "bench_doc")
    },

    // Dedup cluster canonicalization — near-dup PAIRS (q36/q37/q61) are
    // not directly actionable: near-duplication is transitive in effect
    // but not in the pair set (A~B and B~C without an emitted A~C pair
    // would over-delete under keep-one-per-pair). The pair graph's
    // connected components ARE the dup clusters; the canonical keeper is
    // the minimum doc_id per cluster. Components run over the
    // oracle-checked q36 exact-Jaccard pair set via large-star/small-star
    // ([[graft.operators.ConnectedComponents]]) — O(log n) bounded-key
    // rounds on a graph orders of magnitude smaller than the corpus. The
    // pair set is exported (q38 scratch pattern) so DuckDB independently
    // derives the same components with a recursive transitive closure.
    QDef(
      "q71_dedup_clusters",
      """WITH RECURSIVE
        |p AS (SELECT doc_a, doc_b
        |      FROM read_parquet('__SCRATCH__/q71_pairs/*.parquet')),
        |e AS (SELECT doc_a AS u, doc_b AS v FROM p
        |      UNION SELECT doc_b, doc_a FROM p),
        |n AS (SELECT DISTINCT u AS node FROM e),
        |reach(node, r) AS (
        |  SELECT node, node FROM n
        |  UNION
        |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node),
        |comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
        |sized AS (SELECT component, COUNT(*) AS csize
        |          FROM comp GROUP BY component)
        |SELECT c.node AS doc_id, c.component, s.csize,
        |       c.node = c.component AS keep
        |FROM comp c JOIN sized s USING (component)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val pairs = jaccardPairs(s, dir).select("doc_a", "doc_b")
      // export the pair set so the oracle derives components from the
      // SAME edges — q38 scratch pattern, gated on the Verify property
      // because Bench paying a coalesce(1) write per timed rep measured
      // contract plumbing, not the operator ([[components]] already
      // localCheckpoints its input, so the write never fed the engine
      // path anything a cache didn't)
      val pg =
        if (sys.props.get("graft.verify.export").contains("true")) {
          pairs.coalesce(1).write.mode("overwrite")
            .parquet(Tables.scratch(dir, "q71_pairs"))
          s.read.parquet(Tables.scratch(dir, "q71_pairs"))
        } else pairs
      val comps = graft.operators.ConnectedComponents.components(
        pg.select(col("doc_a").as("u"), col("doc_b").as("v")))
      val sized = comps.groupBy("component").agg(count(lit(1)).as("csize"))
      comps.join(sized, "component")
        .select(col("node").as("doc_id"), col("component"), col("csize"),
          (col("node") === col("component")).as("keep"))
        .orderBy("doc_id")
    },

    // Repetition-based quality filter (Gopher-style rules, word-level —
    // the fixture has no line structure): duplicate-word fraction and
    // top-bigram fraction, thresholded at the corpus median so both
    // outcomes are exercised. Scale shape: the word metrics are pure
    // narrow projections (array_distinct per row, scan speed); the
    // top-bigram count is a two-level aggregation on (doc_id, bigram)
    // with map-side partial combine — bounded keys, no join against
    // anything corpus-sized. Thresholds compare the UNROUNDED doubles on
    // both sides (identical fold order -> bit-exact parity).
    QDef(
      "q72_quality_repetition",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |d AS (SELECT doc_id, tk, len(tk) AS n,
        |             len(list_distinct(tk)) AS nd FROM w),
        |bg AS (SELECT doc_id,
        |         unnest([tk[i] || ' ' || tk[i+1] for i in range(1, n)]) AS b
        |       FROM d WHERE n >= 2),
        |bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |bm AS (SELECT doc_id, MAX(c) AS mx FROM bc GROUP BY 1)
        |SELECT d.doc_id, CAST(n AS BIGINT) AS n_words,
        |       ROUND(1 - CAST(nd AS DOUBLE) / n, 6) AS dup_word_frac,
        |       ROUND(COALESCE(CAST(mx AS DOUBLE) / (n - 1), 0.0), 6)
        |         AS top_bigram_frac,
        |       (1 - CAST(nd AS DOUBLE) / n) <= CAST(0.6 AS DOUBLE)
        |         AND COALESCE(CAST(mx AS DOUBLE) / (n - 1), 0.0)
        |             <= CAST(0.05 AS DOUBLE) AS keep
        |FROM d LEFT JOIN bm USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .withColumn("n", size(col("tk")).cast("long"))
        .withColumn("nd", size(array_distinct(col("tk"))).cast("long"))
      val bg = d.filter(col("n") >= 2)
        .select(col("doc_id"),
          explode(expr("transform(sequence(0, cast(n as int) - 2), " +
            "i -> concat(tk[i], ' ', tk[i + 1]))")).as("b"))
      val bm = bg.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("mx"))
      val dupF = lit(1.0) - col("nd").cast("double") / col("n")
      val bigF = coalesce(col("mx").cast("double") / (col("n") - 1), lit(0.0))
      d.join(bm, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n").as("n_words"),
          round(dupF, 6).as("dup_word_frac"),
          round(bigF, 6).as("top_bigram_frac"),
          (dupF <= 0.6 && bigF <= 0.05).as("keep"))
        .orderBy("doc_id")
    },

    // Vocabulary extraction — top-k tokens per language by frequency, the
    // seed step of tokenizer/vocab training. Scale shape: the corpus-sized
    // data passes through ONE bounded aggregation on (lang, token) with
    // map-side combine; the rank window runs on the aggregated vocab
    // frame (|langs| x |vocab| rows), so corpus rows never reach a sort.
    QDef(
      "q75_vocab_topk",
      """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |c AS (SELECT lang, tok, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
        |r AS (SELECT lang, tok, cnt,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |                           ORDER BY cnt DESC, tok) AS rnk
        |      FROM c)
        |SELECT lang, rnk, tok, cnt FROM r WHERE rnk <= 20
        |ORDER BY lang, rnk""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("tok"))
      t(s, dir, "documents")
        .select(col("lang"), explode(toks(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 20)
        .select("lang", "rnk", "tok", "cnt")
        .orderBy("lang", "rnk")
    },

    // Vocabulary coverage — the tokenizer-sizing diagnostic: what
    // fraction of a language's token MASS do its top-k types cover?
    // Rank window runs on the aggregated vocab frame (corpus rows never
    // sorted, same discipline as q75); the ratio is integer-count
    // arithmetic with ONE final double division, so both engines produce
    // the identical IEEE result — no transcendental functions whose libm
    // implementations could differ by an ulp across engines.
    QDef(
      "q93_vocab_coverage",
      """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |c AS (SELECT lang, tok, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
        |r AS (SELECT lang, cnt,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |                           ORDER BY cnt DESC, tok) AS rnk
        |      FROM c)
        |SELECT lang, COUNT(*) AS vocab_size,
        |  CAST(SUM(cnt) AS BIGINT) AS total_tokens,
        |  CAST(CAST(SUM(CASE WHEN rnk <= 20 THEN cnt ELSE 0 END) AS DOUBLE)
        |       / CAST(SUM(cnt) AS DOUBLE) AS DOUBLE) AS top20_coverage
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("tok"))
      t(s, dir, "documents")
        .select(col("lang"), explode(toks(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(w))
        .groupBy("lang")
        .agg(count(lit(1)).as("vocab_size"),
          sum(col("cnt")).as("total_tokens"),
          (sum(when(col("rnk") <= 20, col("cnt")).otherwise(lit(0L)))
            .cast("double") / sum(col("cnt")).cast("double"))
            .as("top20_coverage"))
        .orderBy("lang")
    },

    // PII redaction — the scrub step every training corpus runs: emails
    // and phone numbers replaced by tags, with per-doc match counts for
    // the removal audit. A pure narrow projection (regexp at scan speed,
    // no shuffle before the final sort). The fixture text carries no
    // organic PII, so the corpus plants deterministic emails (every 10th
    // doc) and phone numbers (every 15th) that the oracle reconstructs
    // identically — both engines then redact with the same patterns.
    QDef(
      "q68_pii_redact",
      """WITH c AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 10 = 0
        |      THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        |         || CASE WHEN doc_id % 15 = 0
        |      THEN ' call 555-123-4567' ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(length(regexp_extract_all(t,
        |    '(\(\d{3}\)\s?|\d{3}-)\d{3}-\d{4}')) AS BIGINT) AS n_phones,
        |  substring(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '(\(\d{3}\)\s?|\d{3}-)\d{3}-\d{4}', '<PHONE>', 'g'),
        |    greatest(length(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '(\(\d{3}\)\s?|\d{3}-)\d{3}-\d{4}', '<PHONE>', 'g')) - 59, 1),
        |    60) AS redacted_tail
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "(\\(\\d{3}\\)\\s?|\\d{3}-)\\d{3}-\\d{4}"
      val withPii = t(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 10 === 0,
              concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
              .otherwise(""),
            when(col("doc_id") % 15 === 0, lit(" call 555-123-4567"))
              .otherwise("")).as("t"))
      val redacted =
        regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"),
          phone, "<PHONE>")
      withPii.select(
        col("doc_id"),
        regexp_count(col("t"), lit(email)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(phone)).cast("long").as("n_phones"),
        redacted.substr(greatest(length(redacted) - 59, lit(1)), lit(60))
          .as("redacted_tail"))
        .orderBy("doc_id")
    },

    // Context-window chunking — the training-pipeline step that turns
    // documents into fixed-size token windows with overlap (stride <
    // window). A pure generate: per-row window starts from `sequence`,
    // exploded, sliced — no shuffle anywhere until the final ORDER BY, so
    // it runs at scan speed and the 3x-ish row fan-out streams straight
    // into the next stage (pack/tokenize). Window 64 tokens, stride 48
    // (16-token overlap).
    QDef(
      "q67_chunk_windows",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks, len(toks) AS n FROM w),
        |s AS (SELECT doc_id, n, toks,
        |        unnest(range(0, greatest(n, 1), 48)) AS start
        |      FROM c)
        |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
        |  array_to_string(toks[start + 1:start + 64], ' ') AS chunk,
        |  CAST(least(64, n - start) AS BIGINT) AS n_chunk_tokens
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      val (window, stride) = (64, 48)
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .select(col("doc_id"), col("toks"), col("n"),
          explode(sequence(lit(0), greatest(col("n") - 1, lit(0)),
            lit(stride))).as("start"))
        .select(
          col("doc_id"),
          (col("start") / stride).cast("long").as("chunk_idx"),
          concat_ws(" ",
            slice(col("toks"), col("start") + 1, lit(window))).as("chunk"),
          least(lit(window), col("n") - col("start")).cast("long")
            .as("n_chunk_tokens"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Deterministic stratified sampling: per-language keep-rates applied as
    // a pure narrow filter on the key (no shuffle, no state — the sample
    // decision is a projection, so it runs at scan speed on any cluster
    // size and is reproducible run-to-run). doc_id % 100 stands in for the
    // production key-hash (fixture ids are uniform); swap in
    // pmod(xxhash64(key), 100) when ids are not.
    QDef(
      "q52_stratified_sample",
      """SELECT doc_id, lang FROM documents
        |WHERE (doc_id % 100) <
        |  CASE lang WHEN 'en' THEN 20 WHEN 'es' THEN 50 ELSE 100 END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .filter(col("doc_id") % 100 <
          when(col("lang") === "en", 20)
            .when(col("lang") === "es", 50)
            .otherwise(100))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Sequence packing for pretraining: greedy sequential assignment of
    // docs to fixed token-budget bins per language — bin id is the running
    // token total (exclusive of the current doc) div the budget. One
    // shuffle on lang; within a partition the window is a single sorted
    // pass, which is exactly how a sharded corpus would be packed at
    // 100 TB (pack within shard, shard = partition key).
    QDef(
      "q53_pack_sequences",
      """WITH sized AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |packed AS (
        |  SELECT lang, n_tok,
        |    CAST((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id)
        |          - n_tok) // 2048 AS BIGINT) AS bin
        |  FROM sized)
        |SELECT lang, bin, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
        |FROM packed GROUP BY lang, bin ORDER BY lang, bin""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("lang").orderBy("doc_id")
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(toks(col("text"))).cast("long").as("n_tok"))
        .withColumn("bin",
          floor((sum(col("n_tok")).over(w) - col("n_tok")) / 2048).cast("long"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tokens"))
        .orderBy("lang", "bin")
    },

    // Training-mixture sampling: given target MIX WEIGHTS per source group
    // and a total budget, derive each group's keep-rate from its actual
    // row count (rate = weight * budget / n_g, clamped to 1) and apply it
    // as a deterministic key filter. The rate table is a tiny aggregation
    // broadcast back onto a narrow scan — the corpus is never shuffled, so
    // the op runs at scan speed at any size; changing the mix re-plans
    // only the rate table. Rates are computed in per-mille to keep the
    // threshold integral and engine-exact.
    QDef(
      "q56_weighted_mix",
      """WITH d AS (SELECT doc_id, source,
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'web'
        |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 'books'
        |         ELSE 'code' END AS grp FROM documents),
        |c AS (SELECT grp, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(FLOOR(0.4 * SUM(n)) AS BIGINT) AS budget FROM c),
        |r AS (SELECT grp, LEAST(1000, CAST(FLOOR(
        |        (CASE grp WHEN 'web' THEN 0.6 WHEN 'books' THEN 0.3 ELSE 0.1 END)
        |        * budget * 1000.0 / n) AS BIGINT)) AS thresh
        |      FROM c, t)
        |SELECT d.doc_id, d.grp, d.source FROM d JOIN r USING (grp)
        |WHERE d.doc_id % 1000 < r.thresh ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val grpExpr = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), "web")
        .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), "books")
        .otherwise("code")
      val wExpr = when(col("grp") === "web", 0.6)
        .when(col("grp") === "books", 0.3).otherwise(0.1)
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), grpExpr.as("grp"))
      val counts = d.groupBy("grp").agg(count(lit(1)).as("n"))
      val budget = counts.agg(
        floor(lit(0.4) * sum(col("n"))).cast("long").as("budget"))
      val rates = counts.crossJoin(budget)
        .select(col("grp"),
          least(lit(1000L),
            floor(wExpr * col("budget") * lit(1000.0) / col("n")).cast("long"))
            .as("thresh"))
      d.join(broadcast(rates), Seq("grp"))
        .filter(col("doc_id") % 1000 < col("thresh"))
        .select("doc_id", "grp", "source")
        .orderBy("doc_id")
    },

    // Substring-level exact dedup (the ExactSubstr signal of Lee et al.
    // 2022, "Deduplicating Training Data Makes Language Models Better"):
    // doc-level dedup misses the document that is 40% boilerplate — the
    // unit of duplication is the SPAN. Every 8-token window is a
    // candidate span; a window whose text occurs in >= 2 distinct docs is
    // duplicated, and a doc's dup_tokens is the size of the UNION of its
    // duplicated windows (overlaps merged via the classic
    // running-max-end island pass, a doc-partitioned window — no
    // per-corpus sort). Grouping is by window TEXT here so the oracle is
    // exact; the 100 TB variant groups by ShingleHash64 of the window
    // (same plan shape, 8 bytes per key instead of the span text) and
    // accepts the ~2^-64 collision rate. Corpus-side cost: one shuffle by
    // window key (partial-agg combines repeats map-side), one by doc_id.
    QDef(
      "q85_substring_dup",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
        |              FROM documents),
        |ntok AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens FROM toks),
        |pos AS (SELECT doc_id, ts,
        |          UNNEST(range(1, greatest(len(ts) - 7, 0) + 1)) AS i
        |        FROM toks),
        |sh AS (SELECT doc_id, i AS pos,
        |         array_to_string(ts[i:i+7], ' ') AS sh FROM pos),
        |dup AS (SELECT sh FROM sh GROUP BY sh
        |        HAVING COUNT(DISTINCT doc_id) >= 2),
        |iv AS (SELECT s.doc_id, s.pos AS st, s.pos + 7 AS en
        |       FROM sh s JOIN dup USING (sh)),
        |w AS (SELECT doc_id, st, en,
        |        MAX(en) OVER (PARTITION BY doc_id ORDER BY st, en
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM iv),
        |g AS (SELECT doc_id, st, en,
        |        SUM(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY doc_id ORDER BY st, en
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |      FROM w),
        |isl AS (SELECT doc_id, grp, MAX(en) - MIN(st) + 1 AS cov
        |        FROM g GROUP BY doc_id, grp),
        |d AS (SELECT doc_id, CAST(SUM(cov) AS BIGINT) AS dup_tokens
        |      FROM isl GROUP BY doc_id)
        |SELECT n.doc_id, n.n_tokens,
        |  COALESCE(d.dup_tokens, 0) AS dup_tokens,
        |  CAST(COALESCE(d.dup_tokens, 0) AS DOUBLE) / n.n_tokens AS dup_ratio
        |FROM ntok n LEFT JOIN d USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tk = t(s, dir, "documents")
        .select(col("doc_id"), toks(col("text")).as("ts"))
      val ntok = tk.select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"))
      // windows as an array transform — per-row generation, no join, no
      // shuffle; sequence() is guarded (Spark's sequence(1, 0) counts
      // DOWN, so short docs must produce an empty array explicitly)
      // cached: `sh` feeds BOTH the corpus-wide dup aggregation and the
      // interval join below — without the cache the whole tokenize +
      // window-generate stage (the query's most expensive part) executes
      // twice (Spark reuses no plan subtrees on its own)
      val sh = graft.TransientCaches.register(
        tk.filter(size(col("ts")) >= 8)
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(1, size(ts) - 7), i -> concat_ws(' ', slice(ts, i, 8)))")))
          .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("sh"))
          .cache())
      val dup = sh.groupBy("sh")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select("sh")
      val iv = sh.join(dup, "sh")
        .select(col("doc_id"), col("pos").as("st"), (col("pos") + 7).as("en"))
      val byStart = Window.partitionBy("doc_id").orderBy("st", "en")
      // two projections: a window function cannot nest inside another
      // window function's argument, so pmax materializes first (both run
      // over the SAME doc_id partitioning — one shuffle, one sort)
      val withPmax = iv.withColumn("pmax", max(col("en")).over(
        byStart.rowsBetween(Window.unboundedPreceding, -1)))
      val grp = sum(when(col("pmax").isNull || col("st") > col("pmax"), 1)
        .otherwise(0))
        .over(byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val islands = withPmax.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg((max(col("en")) - min(col("st")) + 1).as("cov"))
      val dups = islands.groupBy("doc_id")
        .agg(sum(col("cov")).cast("long").as("dup_tokens"))
      ntok.join(dups, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          (coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
            .as("dup_ratio"))
        .orderBy("doc_id")
    },

    // Boilerplate n-gram filter (the C4/RefinedWeb pre-clean): a 5-gram
    // occurring in >= 5 DISTINCT docs is boilerplate (nav bars, license
    // headers, templated footers); report per language how much token
    // mass it claims. Scale shape: window generation is a per-row
    // projection (no shuffle); the threshold agg shuffles on the gram key
    // with map-side partial counts; the marker join is a shuffle equi-join
    // on the same key (at 100 TB the over-threshold gram set is tiny and
    // broadcast-able — AQE converts it). Integer counts + one final
    // division, so both engines agree bit-exactly.
    QDef(
      "q96_boilerplate",
      """WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ts
        |              FROM documents),
        |pos AS (SELECT doc_id, lang, ts,
        |          UNNEST(range(1, greatest(len(ts) - 4, 0) + 1)) AS i
        |        FROM toks),
        |g AS (SELECT doc_id, lang,
        |        array_to_string(ts[i:i+4], ' ') AS gram FROM pos),
        |boiler AS (SELECT gram FROM g GROUP BY gram
        |           HAVING COUNT(DISTINCT doc_id) >= 5),
        |m AS (SELECT g.doc_id, g.lang,
        |        CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END AS is_b
        |      FROM g LEFT JOIN boiler b USING (gram))
        |SELECT lang, COUNT(*) AS n_grams,
        |  CAST(SUM(is_b) AS BIGINT) AS n_boiler,
        |  COUNT(DISTINCT CASE WHEN is_b = 1 THEN doc_id END) AS docs_affected,
        |  CAST(SUM(is_b) AS DOUBLE) / COUNT(*) AS boiler_frac
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      // cached: the frame feeds BOTH the boiler-threshold aggregation and
      // the probe join, and Spark reuses no plan subtrees on its own —
      // uncached, the tokenize+explode stage (the query's most expensive
      // part) would run twice
      val grams = graft.TransientCaches.register(
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), toks(col("text")).as("ts"))
          .filter(size(col("ts")) >= 5)
          .select(col("doc_id"), col("lang"), explode(expr(
            "transform(sequence(1, size(ts) - 4), i -> concat_ws(' ', slice(ts, i, 5)))"))
            .as("gram"))
          .cache())
      val boiler = grams.groupBy("gram")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 5)
        .select(col("gram"), lit(1).as("is_b"))
      grams.join(boiler, Seq("gram"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("is_b"), lit(0))).cast("long").as("n_boiler"),
          countDistinct(when(col("is_b") === 1, col("doc_id")))
            .as("docs_affected"),
          (sum(coalesce(col("is_b"), lit(0))).cast("double") / count(lit(1)))
            .as("boiler_frac"))
        .orderBy("lang")
    },

    // Deterministic train/val/test split — the assignment step every
    // training corpus runs before packing. The split key is a hex digit of
    // md5(doc_id): content-independent, stable across runs and engines,
    // and uniform enough that no salt/reshuffle pass is needed. Pure
    // narrow projection + one bounded agg; at 100 TB the assignment adds
    // zero shuffles to whatever write follows it.
    QDef(
      "q97_split_assign",
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
        |            THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd'
        |            THEN 'val' ELSE 'test' END AS split,
        |  lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
        |FROM documents
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      t(s, dir, "documents")
        .select(
          when(h <= "b", "train").when(h <= "d", "val").otherwise("test")
            .as("split"),
          col("lang"), col("n_chars"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars_total"))
        .orderBy("split", "lang")
    },

    // Per-source balancing cap — dataset mixing's guard against one
    // domain swamping the blend (the "no more than N docs per source"
    // rule). Keep order is md5(doc_id): deterministic, content-blind, and
    // engine-agnostic. Runs through CapPerKey's SALTED two-phase plan —
    // rank within (source, salt) buckets, then re-rank the bounded
    // survivor set — so a single dominant crawl domain cannot turn the
    // cap into one straggler sort task at 100 TB; the per-source totals
    // ride phase 1 as bucket counts (one scan serves cap and census).
    QDef(
      "q98_source_cap",
      """WITH r AS (SELECT source, lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN rnk <= 15 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(CASE WHEN rnk <= 15 THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS kept_chars
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
      val ann = graft.operators.CapPerKey.annotated(docs, Seq("source"),
        Seq(md5(col("doc_id").cast("string")), col("doc_id")), cap = 15)
      ann.groupBy("source")
        .agg(
          sum(when(col("__r1") === 1, col("__bucket_rows")).otherwise(0L))
            .as("n_total"),
          sum(when(col("__rnk") <= 15, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("__rnk") <= 15, col("n_chars")).otherwise(0L))
            .cast("long").as("kept_chars"))
        .orderBy("source")
    },

    // Cross-document n-gram novelty — the freshness diagnostic for
    // incremental corpus growth: of a doc's DISTINCT trigrams, how many
    // first appear in this doc (no earlier doc_id contains them)? Per-doc
    // distinct grams dedupe in one (doc, gram) shuffle; first-seer
    // attribution is a min-agg on the gram key; the per-language rollup
    // sums integers so the single final division is bit-exact on both
    // engines. Three bounded-key shuffles total, no self-join on docs.
    QDef(
      "q99_novelty",
      """WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ts
        |              FROM documents),
        |pos AS (SELECT doc_id, lang, ts,
        |          UNNEST(range(1, greatest(len(ts) - 2, 0) + 1)) AS i
        |        FROM toks),
        |dg AS (SELECT DISTINCT doc_id, lang,
        |         array_to_string(ts[i:i+2], ' ') AS gram FROM pos),
        |fs AS (SELECT gram, MIN(doc_id) AS first_doc FROM dg GROUP BY gram)
        |SELECT d.lang, COUNT(*) AS n_distinct_grams,
        |  CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_novel,
        |  CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
        |       AS DOUBLE) / COUNT(*) AS novelty_frac
        |FROM dg d JOIN fs f USING (gram)
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, dir) =>
      // cached: consumed by the first-seer aggregation AND the join back
      val dg = graft.TransientCaches.register(
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), toks(col("text")).as("ts"))
          .filter(size(col("ts")) >= 3)
          .select(col("doc_id"), col("lang"), explode(expr(
            "transform(sequence(1, size(ts) - 2), i -> concat_ws(' ', slice(ts, i, 3)))"))
            .as("gram"))
          .distinct()
          .cache())
      val fs = dg.groupBy("gram").agg(min(col("doc_id")).as("first_doc"))
      dg.join(fs, "gram")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_distinct_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"),
          (sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("novelty_frac"))
        .orderBy("lang")
    },

    // Cross-source contamination matrix — which corpus sources share
    // verbatim 5-gram content (mirror sites, syndication, benchmark
    // leakage between collections). Per-source DISTINCT grams dedupe in
    // one (source, gram) shuffle; the pairwise overlap is a gram-key
    // self-join whose fan-out per gram is bounded by the SOURCE count
    // (not the corpus), and the output is at most C(n_sources, 2) rows —
    // metadata-sized at any corpus scale. Containment = shared / smaller
    // set: integer counts + one division, bit-exact on both engines.
    QDef(
      "q100_source_overlap",
      """WITH toks AS (SELECT source, string_split(text, ' ') AS ts
        |              FROM documents),
        |pos AS (SELECT source, ts,
        |          UNNEST(range(1, greatest(len(ts) - 4, 0) + 1)) AS i
        |        FROM toks),
        |dg AS (SELECT DISTINCT source,
        |         array_to_string(ts[i:i+4], ' ') AS gram FROM pos),
        |per AS (SELECT source, COUNT(*) AS n FROM dg GROUP BY source),
        |sh AS (SELECT a.source AS src_a, b.source AS src_b,
        |         COUNT(*) AS n_shared
        |       FROM dg a JOIN dg b ON a.gram = b.gram
        |         AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT sh.src_a, sh.src_b, sh.n_shared,
        |  CAST(sh.n_shared AS DOUBLE) / least(pa.n, pb.n) AS containment
        |FROM sh JOIN per pa ON pa.source = sh.src_a
        |        JOIN per pb ON pb.source = sh.src_b
        |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
      // cached: consumed THREE times — the per-source counts and both
      // sides of the self-join
      val dg = graft.TransientCaches.register(
        t(s, dir, "documents")
          .select(col("source"), toks(col("text")).as("ts"))
          .filter(size(col("ts")) >= 5)
          .select(col("source"), explode(expr(
            "transform(sequence(1, size(ts) - 4), i -> concat_ws(' ', slice(ts, i, 5)))"))
            .as("gram"))
          .distinct()
          .cache())
      val per = dg.groupBy("source").agg(count(lit(1)).as("n"))
      val sh = dg.as("a")
        .join(dg.as("b"),
          col("a.gram") === col("b.gram") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
      sh.join(broadcast(per.as("pa")), col("pa.source") === col("src_a"))
        .join(broadcast(per.as("pb")), col("pb.source") === col("src_b"))
        .select(col("src_a"), col("src_b"), col("n_shared"),
          (col("n_shared").cast("double") /
            least(col("pa.n"), col("pb.n"))).as("containment"))
        .orderBy("src_a", "src_b")
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracle: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
