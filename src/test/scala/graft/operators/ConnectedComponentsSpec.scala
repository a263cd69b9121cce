package graft.operators

import graft.SparkSpec

/** Large-star/small-star connected components: known graphs + a
  * property check against a driver-side union-find.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side union-find oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to one component rooted at the minimum") {
    // diameter-4 path exercises multi-round convergence
    cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L)
  }

  test("disjoint components keep distinct minima; self-loops are ignored") {
    cc(Seq(10L -> 11L, 11L -> 12L, 7L -> 7L, 20L -> 21L)) shouldBe
      Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
  }

  test("duplicate and reversed edges do not change the result") {
    cc(Seq(2L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 2L)) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("matches a union-find oracle on a pseudo-random graph") {
    // deterministic LCG so the graph is stable across runs
    var s = 12345L
    def nxt(): Long = { s = (s * 1103515245L + 12345L) & 0x7FFFFFFFL; s }
    val edges = (1 to 300).map { _ => (nxt() % 80, nxt() % 80) }
      .filter { case (a, b) => a != b }
    cc(edges) shouldBe unionFind(edges)
  }

  test("the FORCED distributed star rounds agree with the local tier and the oracle") {
    // localMaxEdges = 0 pushes even a tiny graph through the
    // large-star/small-star rounds — the billion-edge path must stay
    // semantically identical to the bounded driver tier it dispatches
    // away from
    import spark.implicits._
    var s = 987654L
    def nxt(): Long = { s = (s * 1103515245L + 12345L) & 0x7FFFFFFFL; s }
    val edges = ((1 to 200).map { _ => (nxt() % 60, nxt() % 60) } ++
      Seq((300L, 301L), (301L, 302L), (302L, 303L), (303L, 304L)))
      .filter { case (a, b) => a != b }
    val dist = ConnectedComponents
      .components(edges.toDF("u", "v"), localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    dist shouldBe unionFind(edges)
    dist shouldBe cc(edges)
  }
}
