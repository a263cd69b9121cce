package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Physical-plan shape assertions: the scale properties SCALE.md claims
  * (pushdown, pruning, broadcast, no accidental nested-loop joins, shuffle
  * counts) checked mechanically, so a regression in plan shape fails CI
  * even while results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.executedPlan.toString
  }

  test("q02 scan has pushed filters and a pruned read schema") {
    val p = plan("q02_scan_filter")
    p should include("PushedFilters: [")
    p should not include "PushedFilters: []"
    // projection pruning: the lineitem scan must not read all 16 columns
    p should include("ReadSchema")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
      .split("ReadSchema:").last
    readSchema.count(_ == ',') should be < 8
  }

  test("q08 broadcasts the dimension side") {
    plan("q08_join_broadcast") should include("BroadcastHashJoin")
  }

  test("q09 range join is banded: no broadcast nested loop") {
    val p = plan("q09_join_range")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("dedup candidate joins are equi-joins, never all-pairs") {
    for (q <- Seq("q36_dedup_jaccard", "q37_dedup_minhash", "q38_dedup_simhash")) {
      val p = plan(q)
      withClue(q) {
        p should not include "BroadcastNestedLoopJoin"
        p should not include "CartesianProduct"
      }
    }
  }

  test("q36 stays the documented exact-SSJoin baseline: postings equi-join on the shingle prefix") {
    // BASELINE.md's scale ladder documents q36 as the CORRECTNESS
    // baseline whose postings join transitions broadcast->shuffle at
    // ~10x sf0.1 (1077x bytes) — and q37 as the production path BECAUSE
    // of that constant. This pins the shape so neither can silently
    // change roles: the candidate join must stay a plain equi-join of
    // the exploded prefix postings (hash or merge at this SF — never
    // all-pairs, never pre-verified distinct), keyed on the shingle.
    // If this test fails after editing Text.scala, re-run
    // `graft.ScaleLadder` and update BASELINE.md's ladder table.
    val p = plan("q36_dedup_jaccard")
    (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")) shouldBe true
    p should include("shingle")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q123 persisted-index probe: cell equi-join candidates, id-join re-rank — never all-pairs") {
    // the candidate generation must stay the (cell) EQUI-join of probes
    // vs the PERSISTED codes scan, and the exact re-rank an id equi-join
    // back to the corpus. The only nested-loop joins allowed are the
    // k-BOUNDED centroid-assignment crossJoins (a broadcast of the
    // metadata-sized centroid table — the intended IVF shape, same as
    // q41/q82): one for the query probes, never one over the codes or
    // the corpus (points x centroids pairs, not points x points).
    val p = plan("q123_sim_topk_ann_index")
    p should not include "CartesianProduct"
    val nested = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    nested should be <= 1
    // the candidate join itself is hash/merge on the cell key
    (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")) shouldBe true
  }

  test("q124 incremental dedup: band-table probe and candidate verify are equi-joins") {
    val p = plan("q124_dedup_incremental")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q42 exact near-dup is a block-pair equi-join, not a nested loop") {
    val p = plan("q42_dedup_embcos")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q61 LSH near-dup candidates come from a signature equi-join") {
    val p = plan("q61_dedup_emblsh")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q41 IVF candidate generation is an equi-join on cell id") {
    val p = plan("q41_sim_topk_ivf")
    // the centroid assignment is an INTENDED broadcast cross join (16
    // centroids); the corpus-side candidate join must be hash/merge
    (p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")) shouldBe true
    p.linesIterator.count(_.trim.startsWith("BroadcastNestedLoopJoin")) should be <= 2
  }

  test("q82 IVF×PQ candidate generation is an equi-join on cell id") {
    val p = plan("q82_sim_topk_ivfpq")
    // two INTENDED k-bounded broadcast cross joins (corpus x 16 centroids,
    // queries x 16 centroids); the candidate join itself must be
    // hash/merge — never an all-pairs scan of the codes
    (p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")) shouldBe true
    p.linesIterator.count(_.trim.startsWith("BroadcastNestedLoopJoin")) should be <= 2
  }

  test("q54 as-of join costs one hash shuffle plus the final sort") {
    val p = plan("q54_asof_join")
    p should include("Window")
    p should not include "BroadcastNestedLoopJoin"
    p.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
  }

  test("q55 percentiles run as distributed window sorts, not a value-map aggregate") {
    val p = plan("q55_percentiles")
    p should include("Window")
    p.toLowerCase should not include "percentile"
  }

  test("q56 mixing broadcasts the tiny rate table onto the corpus scan") {
    plan("q56_weighted_mix") should include("BroadcastHashJoin")
  }

  test("q51 aggregator plan has a map-side partial aggregate") {
    // the whole point of TopKAgg vs the window form: partial aggregation
    // before the shuffle bounds per-group state
    val p = plan("q51_topk_agg")
    p.toLowerCase should include("partial")
    p should not include "Window"
  }

  test("q65 approx percentiles are a mergeable aggregate: no per-group sort anywhere") {
    val p = plan("q65_percentiles_approx")
    p.toLowerCase should include("partial_percentile_approx")
    p should not include "Window"
  }

  test("q71 cluster canonicalization stays equi-join through every CC round") {
    val p = plan("q71_dedup_clusters")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q72 repetition metrics aggregate with a map-side partial combine") {
    val p = plan("q72_quality_repetition")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    p.toLowerCase should include("partial")
  }

  test("q73 ORC read-back partition-prunes on the filtered flag") {
    val p = plan("q73_orc_scan")
    p.toLowerCase should include("orc")
    val scanLine = p.linesIterator.find(l =>
      l.contains("PartitionFilters")).getOrElse("")
    scanLine should include("l_returnflag")
    scanLine should not include "PartitionFilters: []"
  }

  test("q75 vocab rank window runs above a partial-combined aggregate") {
    val p = plan("q75_vocab_topk")
    // the corpus-sized explode must be reduced by a map-side partial
    // aggregate BEFORE anything reaches the rank window's sort
    p.toLowerCase should include("partial")
    p should include("Window")
  }

  test("q64 salted sessionize never sorts a whole user's event stream") {
    val p = plan("q64_sessionize_salted")
    // the event-sized shuffles carry the salt key
    p should include regex raw"hashpartitioning\(user_id#\d+L, _chunk#\d+L"
    // no event-time window partitioned by user alone (that is exactly the
    // whale-user sort q64 exists to avoid; the summary windows order by
    // _chunk, not by event time, so this regex matches only the bad shape)
    p should not include regex (raw"windowspecdefinition\(user_id#\d+L, t#\d+L ASC")
  }

  test("q88 posexplode is a map-side Generate: no shuffle before the generator") {
    val p = plan("q88_posexplode")
    p should include("Generate")
    // the only Exchange is the final orderBy's range partitioning — the
    // Generate itself must sit directly on the scan side
    val fromGenerate = p.substring(p.indexOf("Generate"))
    fromGenerate should not include "Exchange hashpartitioning"
  }

  test("q90 correlated subqueries decorrelate to joins: no per-row subquery plans") {
    val p = plan("q90_correlated_subquery")
    // EXISTS/NOT EXISTS/scalar-COUNT all become joins
    p should not include "Subquery"
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q91 array HOFs stay a narrow projection: no Generate, no extra shuffle") {
    val p = plan("q91_array_hof")
    p should not include "Generate"
    // one Exchange only: the final orderBy (rangepartitioning); the
    // lambda work itself is projection-local
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 0
  }

  test("q85 substring dedup: equi-joins only, islands windowed per doc") {
    val p = plan("q85_substring_dup")
    // window-text match and the doc join are both hash equi-joins
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    // duplicated-window detection partial-aggregates map-side before the
    // shuffle by window key
    p should include("partial_count(distinct")
    // the island merge windows are partitioned by doc_id — never a
    // corpus-wide unpartitioned sort
    p should not include "windowspecdefinition(st"
    p should include regex raw"windowspecdefinition\(doc_id#\d+"
  }
}
