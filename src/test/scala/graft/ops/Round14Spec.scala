package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 invariants the oracle hash cannot express on its own —
  * brute-force / property proofs in the Round13Spec tradition.
  *
  * q359 (IVF recall under hot-cell query skew) is hash-gated against its
  * DuckDB replay, which proves both engines compute the SAME numbers;
  * these tests prove the numbers mean what the gate claims:
  *  - the query set genuinely comes from the most-occupied cell (the
  *    "worst case" in the gate's name is real, not a label);
  *  - recall is MONOTONE in nprobe — a provable property of the
  *    candidate-pool lattice: the nprobe+1 pool is a superset, and any
  *    candidate that displaces an exact-top-10 member from the retrieved
  *    top-10 must itself have a higher cosine, i.e. must itself BE an
  *    exact-top-10 member, so the hit count can never drop. A
  *    non-monotone readout would mean the probe or ranking order is
  *    inconsistent between the exact and probed paths.
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  test("q359: recall is monotone in nprobe and bounded by n_retrieved") {
    val rows = AnnQueries.ivfHotCellRecall(spark, sf0001)
      .orderBy($"nprobe").collect()
    assert(rows.length == 3, s"expected nprobe 1..3, got ${rows.length} rows")
    val byNp = rows.map(r => (r.getAs[Int]("nprobe"), r.getAs[Long]("n_hits"),
      r.getAs[Long]("n_retrieved"), r.getAs[Long]("n_exact"),
      r.getAs[Long]("recall_bp")))
    assert(byNp.map(_._1).toSeq == Seq(1, 2, 3))
    for (Array((_, h1, _, _, r1), (_, h2, _, _, r2)) <- byNp.sliding(2))
      assert(h2 >= h1 && r2 >= r1,
        s"recall dropped with more probes: $byNp — probe/ranking order " +
          "disagrees between the exact and probed paths")
    for ((np, hits, retrieved, exact, bp) <- byNp) {
      assert(hits <= retrieved && hits <= exact,
        s"nprobe=$np hit count exceeds a side: $byNp")
      assert(bp == 10000L * hits / exact,
        s"nprobe=$np recall_bp is not the integer division of its own " +
          s"numerator/denominator: $byNp")
    }
    // at full probing of a tiny corpus the candidate pool contains the
    // exact top-10's cells with high probability — sanity floor only
    assert(byNp.last._5 >= 5000L,
      s"nprobe=3 recall ${byNp.last._5} bp — the probed search is not " +
        "finding the neighborhood at all")
  }

  test("q359: the artifact's hot cell IS the most-occupied primary cell") {
    val out = AnnQueries.ivfHotCellRecall(spark, sf0001).head()
    val hotCell = out.getAs[Int]("hot_cell").toLong
    val nHot = out.getAs[Long]("n_hot")
    // re-derive the election brute-force from the same public pieces
    val g = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", graft.operators.Ann.gridQuantize($"embedding").as("embedding"))
    val cents = graft.operators.Ann.trainCentroidsGrid(
      g.withColumn("seed", pmod($"vec_id", lit(8)).cast("int")).cache(),
      "seed", iters = 2)
    val occ = graft.operators.Ann.probeCells(g, cents, 1)
      .groupBy($"cell").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"cell".asc).head()
    assert(occ.getAs[Any]("cell").toString.toLong == hotCell,
      s"hot cell ${occ.get(0)} (brute-force) != $hotCell (gate)")
    assert(occ.getAs[Long]("n") == nHot,
      s"hot-cell occupancy ${occ.getAs[Long]("n")} != $nHot (gate)")
    spark.catalog.clearCache()
  }

  test("Scratch.totalBytes counts scratch files and skips symlinks") {
    val before = graft.Scratch.totalBytes
    val dir = graft.Scratch.named("round14_bytes_test")
    java.nio.file.Files.write(dir.resolve("a.bin"), new Array[Byte](4096))
    java.nio.file.Files.write(dir.resolve("b.bin"), new Array[Byte](1000))
    val after = graft.Scratch.totalBytes
    assert(after - before >= 5096,
      s"totalBytes grew by ${after - before}, expected >= 5096")
    // a symlink must count as itself (0 here), never be followed
    val link = dir.resolve("ln")
    try {
      java.nio.file.Files.createSymbolicLink(link, dir.resolve("a.bin"))
      assert(graft.Scratch.totalBytes == after,
        "a symlink changed totalBytes — it is being followed")
    } catch { case _: UnsupportedOperationException => () }
  }
}
