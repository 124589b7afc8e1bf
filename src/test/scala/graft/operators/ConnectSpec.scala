package graft.operators

import graft.SparkSpec

class ConnectSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force union-find reference: node -> min id of its component. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      if (a != b) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Connect.components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("two cliques and a bridge-free pair resolve to their minima") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), // clique {1,2,3}
      (10L, 11L), (11L, 12L), // path {10,11,12}
      (20L, 21L)) // pair
    val got = run(edges)
    assert(got == ufComponents(edges))
    assert(got(3L) == 1L && got(12L) == 10L && got(21L) == 20L)
  }

  test("deep chain (diameter >> rounds of naive gossip) converges") {
    // a 64-node path: worst case for diameter-bound algorithms
    val edges = (1L until 64L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got == ufComponents(edges))
    assert(got.values.toSet == Set(1L))
  }

  test("star with a high-degree center matches union-find") {
    val edges = (2L to 40L).map(i => (20L, i)).filter { case (a, b) => a != b }
    assert(run(edges) == ufComponents(edges))
  }

  test("random graph (seeded) matches union-find exactly") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    assert(run(edges) == ufComponents(edges))
  }

  test("self-loops are dropped; empty input yields empty output") {
    assert(run(Seq((5L, 5L))).isEmpty)
    assert(run(Seq.empty).isEmpty)
  }

  test("two roots sharing one child merge (multi-parent star census)") {
    // {m1-c, m2-c}: small-star can emit c with TWO parents mid-convergence;
    // the terminal-star test must NOT accept that state (its naive "no root
    // is also a child" half alone would) — all three nodes must land on the
    // component minimum.
    val edges = Seq((10L, 30L), (20L, 30L))
    val got = run(edges)
    assert(got == ufComponents(edges))
    assert(got.values.toSet == Set(10L))
  }

  test("input that is already a terminal star converges in one round") {
    val edges = Seq((1L, 7L), (1L, 8L), (1L, 9L))
    val got = run(edges)
    assert(got == Map(1L -> 1L, 7L -> 1L, 8L -> 1L, 9L -> 1L))
  }

  test("dedupDecisions marks exactly the component minima as canonical") {
    val pairs = Seq((3L, 1L), (2L, 3L), (9L, 8L)).toDF("doc_a", "doc_b")
    val got = Connect.dedupDecisions(pairs, "doc_a", "doc_b")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (8L, 8L, true), (9L, 8L, false)))
  }

  test("string node ids use lexicographic minima (oracle-compatible)") {
    val edges = Seq(("b", "c"), ("c", "a"), ("z", "y")).toDF("a", "b")
    val got = Connect.components(edges, "a", "b")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "y" -> "y", "z" -> "y"))
  }
}
