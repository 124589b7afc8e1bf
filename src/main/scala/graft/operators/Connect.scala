package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the cluster-resolution step of
  * a dedup pipeline: near-dup PAIRS (from [[Dedup.minhashNearDups]] or
  * [[Ann.nearDupPairs]]) become per-document cluster labels, and "keep the
  * minimum id per cluster" becomes the dedup decision. Extension surface
  * beyond the reference (SURVEY §7.3).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * shuffle-native formulation. Unlike naive min-label propagation, whose
  * round count tracks the graph DIAMETER (a 100 TB corpus with chained
  * near-dups can be arbitrarily deep), large-star/small-star converges in
  * O(log²) rounds, and in practice a handful, because every round
  * re-attaches whole subtrees directly to their current minimum.
  *
  * Scale posture: each half-round is one hash-aggregate (per-node min over
  * neighbors) plus one equi-join of the edge set against that k-v min table
  * — both shuffle on the node id, never materialize a neighborhood list
  * (no `collect_list`, so a celebrity node cannot OOM a task; AQE handles
  * its shuffle skew). Per-round driver state is ONE boolean from the
  * terminal-star census (see [[isTerminalStars]]), which recognizes the
  * fixpoint the round it is produced instead of one confirming round
  * later. Each round's edge frame is materialized with
  * an eager `localCheckpoint` — the convergence check forces a pass anyway,
  * and iterative plans MUST truncate lineage or the logical plan doubles
  * per round (union+join over the previous round) and planning itself
  * becomes the bottleneck. On a real cluster prefer reliable checkpointing
  * (`spark.sparkContext.setCheckpointDir` + `.checkpoint()`) so an executor
  * loss cannot drop a round's blocks mid-convergence.
  */
object Connect {

  /** Label every node of the undirected `edges` graph with the MINIMUM node
    * id reachable from it (its canonical component representative).
    *
    * Returns `(node, component)` — one row per node that appears in at
    * least one (non-self-loop) edge; isolated nodes are absent by
    * construction (a dedup caller treats them as singleton keepers without
    * ever shuffling them). The fixpoint is unique, so the output is
    * deterministic regardless of round count.
    *
    * Node ids may be any orderable type (the component min is `min` in both
    * Spark and any SQL oracle); ints/longs and strings both work.
    */
  def components(edges: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50): DataFrame = {
    var e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint() // eager: truncates lineage AND caches the blocks
    var rounds = 0
    var converged = e.isEmpty
    while (!converged) {
      rounds += 1
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"Connect.components did not converge in $maxRounds rounds")
      val next = smallStar(largeStar(e)).localCheckpoint()
      e = next // previous round's blocks are released by the ContextCleaner
      converged = isTerminalStars(next)
    }
    // At the fixpoint the edge set is a union of stars (child, root) with
    // root = component min: children label from their edge, roots from
    // themselves.
    e.select(col("a").as("node"), col("b").as("component"))
      .union(e.select(col("b").as("node"), col("b").as("component")))
      .distinct()
  }

  /** Large-star: for every node u, re-attach each STRICTLY LARGER neighbor
    * v to m(u) = min(Γ(u) ∪ {u}). Works on the symmetric closure; the
    * per-node min is a hash-agg, the re-attach an equi-join on u. */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mb"))
      .select(col("a"), least(col("a"), col("mb")).as("m"))
    // Emitted (v, m) always has v > u ≥ m — no self-loops possible. NOT
    // deduplicated here: the orientation filter already caps the output at
    // one row per input edge (only the b > a orientation survives), so the
    // only duplicates are distinct u's re-attaching the same (v, m) — and
    // small-star's terminal distinct canonicalizes the round anyway. A
    // distinct here is one extra full shuffle per round for rows the next
    // half-round's aggregates absorb for free (removing it measured
    // q329 6.28 → 5.80 s at sf0.1, ~10% of its component time).
    sym.filter(col("b") > col("a"))
      .join(mins, "a")
      .select(col("b").as("a"), col("m").as("b"))
  }

  /** Small-star: orient every edge toward its larger endpoint u; re-attach
    * u and all its smaller neighbors to their minimum. */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("a"), col("b")).as("u"),
      least(col("a"), col("b")).as("v"))
    val mins = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
    val reChildren = oriented.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("a"), col("m").as("b"))
    val reCenter = mins.select(col("u").as("a"), col("m").as("b"))
    reChildren.union(reCenter).distinct()
  }

  /** Terminal-state test (r15 — replaces the old "run one MORE round and
    * compare (count, hash-sum) signatures" scheme, which could only OBSERVE
    * the fixpoint one full round after reaching it): a round's output is
    * the fixpoint iff it is a union of SINGLE-PARENT stars — for every
    * node, (i) its distinct parent set has size ≤ 1 and (ii) a node with a
    * parent is never itself a parent (no chains). Such a set maps to
    * itself under both stars (every child's only neighbor IS its root, the
    * root's min is itself), and conversely any violation changes under the
    * next round, so this detects exactly the states the signature test
    * detected — one round earlier. Condition (i) is NOT redundant:
    * small-star can emit a child with two parents mid-convergence (v a
    * child of u₁ and u₂ with different minima), a state the naive "no root
    * is also a child" test alone would wrongly accept. One aggregation
    * over ≤ 2|E| rows (min≠max spots multi-parents without a
    * countDistinct buffer); min/max ignore the root-marker rows' NULLs. */
  private def isTerminalStars(e: DataFrame): Boolean = {
    val nullP = lit(null).cast(e.schema("b").dataType)
    e.select(col("a").as("n"), col("b").as("p"), lit(0).as("isroot"))
      .union(e.select(col("b").as("n"), nullP.as("p"), lit(1).as("isroot")))
      .groupBy(col("n"))
      .agg(min(col("p")).as("lo"), max(col("p")).as("hi"),
        max(col("isroot")).as("isp"))
      .filter(col("lo") =!= col("hi") ||
        (col("lo").isNotNull && col("isp") === 1))
      .isEmpty
  }

  /** Dedup decision over near-dup pairs: cluster, then keep the minimum doc
    * id of each cluster. `(node, component, is_canonical)` — a doc survives
    * iff it is its cluster's canonical representative (singletons, absent
    * here, all survive). */
  def dedupDecisions(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    components(pairs, aCol, bCol)
      .withColumn("is_canonical", col("node") === col("component"))
}
