package graft.operators

import graft.SparkSpec
import graft.functions.VecOps
import graft.lake.TxLog
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[AnnIndex]] — the persisted IVF×PQ index: build/search across
  * sessions with no retraining, O(delta) refresh off the change feed,
  * delete-aware maintenance (corpus deletes vector-delete the codes;
  * search never returns a deleted id), epoch-torn detection, and the
  * drift-triggered retrain.
  */
class AnnIndexSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-annidx").toString

  /** Deterministic clustered corpus: ids land in 4 orthogonal clusters
    * (dimension id%4 dominant) with a small id-seeded perturbation, so
    * nearest neighbors are same-cluster by construction.
    */
  private def corpusDf(ids: Range) = {
    // modulus prime and LARGER than the id range x 31: two distinct ids
    // can never produce identical perturbations (a composite/small
    // modulus planted exact duplicates 13 apart — and exact twins make
    // "find vector X" assertions ambiguous under id tie-breaks)
    val rows = ids.map { i =>
      val v = Array.tabulate(8)(d => 0.0005f * ((i * 31 + d * 7) % 997))
      v(i % 4) = 1f
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  private def queriesOf(ids: Seq[Long]) = {
    val all = corpusDf(0 until 400)
    all.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", VecOps.normf(col("qe")))
  }

  test("build once, search from a FRESH session: no training, identical answers, same-cluster recall") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 200), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    val qs = queriesOf(Seq(0L, 21L, 42L, 63L, 100L))
    def run(s: org.apache.spark.sql.SparkSession) =
      AnnIndex.search(s, corpusRoot, indexRoot, qs, kTop = 5, nProbe = 2,
        shortlist = 20).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val res = run(spark)
    res.size shouldBe 5 * 5
    // top-1 neighbor shares the query's cluster — the index answers
    res.filter(_._3 == 1L).foreach { case (qid, cand, _, _) =>
      (cand % 4) shouldBe (qid % 4)
    }
    // a fresh session (no memos, no ML models in scope) reads the SAME
    // answers from the persisted artifacts alone
    run(spark.newSession()) shouldBe res
  }

  test("refresh indexes only the delta (one idempotent commit) and search sees the new vectors") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 160), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    val codesRoot = AnnIndex.codesRoot(indexRoot)
    val vBuilt = TxLog.currentVersion(spark, codesRoot).get
    TxLog.append(spark, corpusDf(160 until 200), corpusRoot)
    val r = AnnIndex.refresh(spark, corpusRoot, indexRoot)
    r shouldBe AnnIndex.Refresh(40L, 0L, 200L, false)
    // ONE append commit, O(delta): exactly the 40 new rows landed
    val last = TxLog.history(spark, codesRoot).last
    last.version shouldBe vBuilt + 1
    last.operation shouldBe "append"
    TxLog.readLatest(spark, codesRoot).count() shouldBe 200L
    // idempotent: nothing new -> no commit
    AnnIndex.refresh(spark, corpusRoot, indexRoot) shouldBe
      AnnIndex.Refresh(0L, 0L, 200L, false)
    TxLog.currentVersion(spark, codesRoot).get shouldBe vBuilt + 1
    // a query AT a fresh vector finds it first (query id outside the
    // corpus; shortlist covers the probed cells — the coarse k=8 PQ
    // codes tie whole sub-clusters at the same ADC score, and a narrow
    // shortlist cut inside a tie is id-ordered, which is the
    // recall-vs-cost tradeoff, not what THIS test pins)
    val probe = corpusDf(180 until 181)
      .select(lit(99999L).as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", VecOps.normf(col("qe")))
    val top = AnnIndex.search(spark, corpusRoot, indexRoot, probe,
      kTop = 1, nProbe = 2, shortlist = 200).head()
    top.getLong(1) shouldBe 180L
    top.getDouble(3) shouldBe 1.0 +- 1e-9
  }

  test("a REBUILD at the same corpus version replaces the codes (never a mixed index)") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 100), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    val codesRoot = AnnIndex.codesRoot(indexRoot)
    val v1 = TxLog.currentVersion(spark, codesRoot).get
    // same corpus version, different PQ shape: the codes overwrite must
    // WIN (a watermark-fenced skip would leave stale 4x8 codes under
    // fresh 2x4 codebooks — silently wrong ADC scores)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 2, k = 4)
    TxLog.currentVersion(spark, codesRoot).get should be > v1
    TxLog.history(spark, codesRoot).last.operation shouldBe "overwrite"
    TxLog.readLatest(spark,
      AnnIndex.codebookRoot(indexRoot)).count() shouldBe 2L * 4L
    // the rebuilt artifacts answer consistently
    val probe = corpusDf(42 until 43)
      .select(lit(99999L).as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", VecOps.normf(col("qe")))
    AnnIndex.search(spark, corpusRoot, indexRoot, probe,
      kTop = 1, nProbe = 2, shortlist = 100).head().getLong(1) shouldBe 42L
  }

  test("drift accumulates ACROSS refreshes: small deltas trigger the retrain once their sum passes the threshold") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 50), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    // three 20-row batches: cumulative un-retrained fraction 20/70,
    // 40/90, 60/110 — the THIRD crosses 0.5 even though each single
    // delta is far under it
    TxLog.append(spark, corpusDf(50 until 70), corpusRoot)
    AnnIndex.refresh(spark, corpusRoot, indexRoot).retrained shouldBe false
    TxLog.append(spark, corpusDf(70 until 90), corpusRoot)
    AnnIndex.refresh(spark, corpusRoot, indexRoot).retrained shouldBe false
    TxLog.append(spark, corpusDf(90 until 110), corpusRoot)
    val r = AnnIndex.refresh(spark, corpusRoot, indexRoot)
    r.retrained shouldBe true
    // retrain resets the clock: the next small delta refreshes again
    TxLog.append(spark, corpusDf(110 until 120), corpusRoot)
    AnnIndex.refresh(spark, corpusRoot, indexRoot) shouldBe
      AnnIndex.Refresh(10L, 0L, 120L, false)
  }

  test("corpus deletes are consumed: codes vector-deleted, search never returns a deleted id") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 100), corpusRoot)
    // an exact clone of vector 42 under id 1042: if 42's code survives
    // its deletion, a probe AT that vector would rank the phantom first
    TxLog.append(spark, corpusDf(42 until 43)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")),
      corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    TxLog.deleteVectored(spark, corpusRoot, col("vec_id") === 42L)
    val r = AnnIndex.refresh(spark, corpusRoot, indexRoot)
    r shouldBe AnnIndex.Refresh(0L, 1L, 100L, false)
    val codes = TxLog.readLatest(spark, AnnIndex.codesRoot(indexRoot))
    codes.filter(col("vec_id") === 42L).count() shouldBe 0L
    codes.count() shouldBe 100L
    val probe = corpusDf(42 until 43)
      .select(lit(99999L).as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", VecOps.normf(col("qe")))
    val hits = AnnIndex.search(spark, corpusRoot, indexRoot, probe,
      kTop = 3, nProbe = 2, shortlist = 100)
      .select("cand_id").as[Long].collect().toSeq
    hits should not contain 42L
    hits.head shouldBe 1042L // the clone answers in the dead id's place
    // replay of the same maintenance step: deletes match nothing, the
    // watermark already covers the feed
    AnnIndex.refresh(spark, corpusRoot, indexRoot) shouldBe
      AnnIndex.Refresh(0L, 0L, 100L, false)
  }

  test("a REWRITTEN vector re-encodes; insert+delete inside one window leaves no phantom") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 100), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    // rewrite: vector 7 becomes vector 60's embedding (delete+insert in
    // the feed at one version — the net state is insert, re-encoded)
    val v60 = corpusDf(60 until 61).select(col("embedding")).head()
      .getSeq[Float](0)
    TxLog.updateVectored(spark, corpusRoot, col("vec_id") === 7L,
      Map("embedding" -> typedLit(v60).cast("array<float>")))
    // and a same-window insert+delete: 200 never reaches the index
    TxLog.append(spark, corpusDf(200 until 201), corpusRoot)
    TxLog.deleteVectored(spark, corpusRoot, col("vec_id") === 200L)
    val r = AnnIndex.refresh(spark, corpusRoot, indexRoot)
    r.removed shouldBe 1L // 7's old code; 200 was never indexed
    r.added shouldBe 1L   // 7's new code
    r.total shouldBe 100L
    val codes = TxLog.readLatest(spark, AnnIndex.codesRoot(indexRoot))
    codes.filter(col("vec_id") === 200L).count() shouldBe 0L
    codes.filter(col("vec_id") === 7L).count() shouldBe 1L
    // a probe at 60's vector now finds the re-encoded 7 as an exact twin
    val probe = corpusDf(60 until 61)
      .select(lit(99999L).as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", VecOps.normf(col("qe")))
    AnnIndex.search(spark, corpusRoot, indexRoot, probe, kTop = 2,
      nProbe = 2, shortlist = 200)
      .select("cand_id").as[Long].collect().toSet shouldBe Set(7L, 60L)
  }

  test("an epoch-torn artifact set (crash inside build) is refused loudly and heals on re-build") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 100), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    // simulate a crash between build's table replaces: the centroids
    // advance to a new epoch the meta never declared complete
    val centRoot = AnnIndex.centroidsRoot(indexRoot)
    val e = TxLog.txnWatermark(spark, centRoot, AnnIndex.EpochApp).get
    TxLog.overwrite(spark, TxLog.readLatest(spark, centRoot), centRoot,
      txn = Some((AnnIndex.EpochApp, e + 1)))
    intercept[IllegalStateException](
      AnnIndex.refresh(spark, corpusRoot, indexRoot))
      .getMessage should include("re-run build()")
    val qs = queriesOf(Seq(0L, 21L))
    intercept[IllegalStateException](
      AnnIndex.search(spark, corpusRoot, indexRoot, qs, kTop = 5,
        nProbe = 2, shortlist = 20)).getMessage should include("build()")
    // the named recovery: re-running build restores a coherent set
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    AnnIndex.search(spark, corpusRoot, indexRoot, qs, kTop = 5,
      nProbe = 2, shortlist = 20).count() shouldBe 10L
    AnnIndex.refresh(spark, corpusRoot, indexRoot).retrained shouldBe false
  }

  test("a corpus OPTIMIZE is not churn: refresh sees no delta and never drifts toward a retrain") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 60).repartition(3), corpusRoot)
    TxLog.append(spark,
      corpusDf(60 until 100).repartition(2), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    // nightly maintenance rewrites every corpus file; un-skipped, the
    // feed would say delete+insert x 100 — a full vector-delete, a full
    // re-encode, and churn 2x the corpus (an instant spurious retrain)
    TxLog.compact(spark, corpusRoot, smallerThanBytes = 1L << 30)
    AnnIndex.refresh(spark, corpusRoot, indexRoot) shouldBe
      AnnIndex.Refresh(0L, 0L, 100L, false)
    TxLog.readLatest(spark,
      AnnIndex.codesRoot(indexRoot)).count() shouldBe 100L
  }

  test("crash-replay between the codes append and the meta commit converges") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 100), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    val metaBefore = TxLog.readLatest(spark,
      AnnIndex.metaRoot(indexRoot)).collect().head
    // a rewrite + an insert, then the full step runs (the 'crashed'
    // driver got through deletes AND the fenced codes append)...
    val v60 = corpusDf(60 until 61).select(col("embedding")).head()
      .getSeq[Float](0)
    TxLog.updateVectored(spark, corpusRoot, col("vec_id") === 7L,
      Map("embedding" -> typedLit(v60).cast("array<float>")))
    TxLog.append(spark, corpusDf(200 until 210), corpusRoot)
    val first = AnnIndex.refresh(spark, corpusRoot, indexRoot)
    first shouldBe AnnIndex.Refresh(11L, 1L, 110L, false)
    // ...but 'crashed' before writeMeta: rewind meta to the pre-step row
    // (same epoch — only the watermark and churn go back)
    TxLog.overwrite(spark,
      spark.createDataFrame(
        java.util.List.of(metaBefore), metaBefore.schema),
      AnnIndex.metaRoot(indexRoot),
      txn = Some((AnnIndex.EpochApp, metaBefore.getLong(0))))
    // ...AND the corpus advances before the replay — the one-step
    // replay would re-encode the crashed step's inserts under a fence
    // that no longer catches them (double codes per id); the refresh
    // must split at the codes watermark: replay the crashed step to its
    // own boundary (deletes bounded, append self-fenced, total not
    // double-counted), then process the remainder
    TxLog.append(spark, corpusDf(300 until 306), corpusRoot)
    val replay = AnnIndex.refresh(spark, corpusRoot, indexRoot)
    replay.removed shouldBe 0L
    replay.total shouldBe 116L
    replay.retrained shouldBe false
    val codes = TxLog.readLatest(spark, AnnIndex.codesRoot(indexRoot))
    codes.count() shouldBe 116L
    codes.groupBy("vec_id").count()
      .filter(col("count") =!= 1L).count() shouldBe 0L
    codes.filter(col("vec_id") === 7L).count() shouldBe 1L
    codes.filter(col("vec_id") >= 300L).count() shouldBe 6L
    // a probe at 60's vector still finds the re-encoded 7 as its twin
    val probe = corpusDf(60 until 61)
      .select(lit(99999L).as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", VecOps.normf(col("qe")))
    AnnIndex.search(spark, corpusRoot, indexRoot, probe, kTop = 2,
      nProbe = 2, shortlist = 200)
      .select("cand_id").as[Long].collect().toSet shouldBe Set(7L, 60L)
  }

  test("maintain() packs the artifact tables; epoch, watermark, and answers survive") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 160), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    // four O(delta) refreshes fragment the codes table (cumulative churn
    // 40/200 stays far under the retrain threshold)...
    (0 until 4).foreach { b =>
      TxLog.append(spark,
        corpusDf(160 + b * 10 until 170 + b * 10), corpusRoot)
      AnnIndex.refresh(spark, corpusRoot, indexRoot)
        .retrained shouldBe false
    }
    // ...and a delete-refresh leaves a deletion vector on the codes
    TxLog.deleteVectored(spark, corpusRoot, col("vec_id") === 42L)
    AnnIndex.refresh(spark, corpusRoot, indexRoot).removed shouldBe 1L
    val codesRoot = AnnIndex.codesRoot(indexRoot)
    val qs = queriesOf(Seq(0L, 21L, 63L))
    def run() = AnnIndex.search(spark, corpusRoot, indexRoot, qs,
      kTop = 5, nProbe = 2, shortlist = 50).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val before = run()
    val filesBefore = TxLog.liveSizes(spark, codesRoot).size
    filesBefore should be >= 5
    AnnIndex.maintain(spark, indexRoot)
    TxLog.liveSizes(spark, codesRoot).size should be < filesBefore
    // identical answers from the packed artifacts; the dead id stays dead
    run() shouldBe before
    TxLog.readLatest(spark, codesRoot)
      .filter(col("vec_id") === 42L).count() shouldBe 0L
    // epoch + watermark rode the checkpoints: refresh is still the
    // coherent idempotent no-op, not a torn-set refusal
    AnnIndex.refresh(spark, corpusRoot, indexRoot) shouldBe
      AnnIndex.Refresh(0L, 0L, 199L, false)
  }

  test("drift past the threshold retrains from the full corpus") {
    val corpusRoot = tmp(); val indexRoot = tmp()
    TxLog.append(spark, corpusDf(0 until 50), corpusRoot)
    AnnIndex.build(spark, corpusRoot, indexRoot, nCells = 4, m = 4, k = 8)
    val centV =
      TxLog.currentVersion(spark, AnnIndex.centroidsRoot(indexRoot)).get
    TxLog.append(spark, corpusDf(50 until 200), corpusRoot)
    val r = AnnIndex.refresh(spark, corpusRoot, indexRoot, retrainAt = 0.5)
    r.retrained shouldBe true
    r.added shouldBe 150L
    // the retrain REBUILT the quantizers (new centroid version) and the
    // codes table covers the whole corpus at the new watermark
    TxLog.currentVersion(spark,
      AnnIndex.centroidsRoot(indexRoot)).get should be > centV
    TxLog.readLatest(spark,
      AnnIndex.codesRoot(indexRoot)).count() shouldBe 200L
    AnnIndex.refresh(spark, corpusRoot, indexRoot) shouldBe
      AnnIndex.Refresh(0L, 0L, 200L, false)
  }
}
