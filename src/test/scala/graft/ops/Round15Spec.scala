package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Round-15 invariants the oracle hash cannot express on its own, in the
  * Round13/Round14Spec tradition.
  *
  * q360 (LSH recall under hot-bucket document skew) is hash-gated against
  * its DuckDB replay, which proves both engines compute the SAME numbers;
  * these tests prove the numbers mean what the gate claims:
  *  - the query set genuinely comes from the most-occupied (band, bkey)
  *    bucket of the production 6×2 banding (the "worst case" in the
  *    gate's name is real, not a label);
  *  - candidate sets are NESTED across the swept configs — each 6-row or
  *    4-row band key is the md5 of a concatenation of whole 2-row bands,
  *    so a coarse-band match implies a fine-band match: C(2×6) ⊆ C(3×4)
  *    ⊆ C(6×2). Hits and candidates must therefore be monotone
  *    nondecreasing in the band count; a violation would mean the banding
  *    or hit join is inconsistent between configs.
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  test("q360: candidates/hits monotone in bands; bp is its own division") {
    val rows = DedupQueries.lshHotBandRecall(spark, sf0001)
      .orderBy($"bands").collect()
    assert(rows.length == 3, s"expected configs 2/3/6 bands, got ${rows.length}")
    val byB = rows.map(r => (r.getAs[Int]("bands"), r.getAs[Long]("n_candidates"),
      r.getAs[Long]("n_hits"), r.getAs[Long]("n_true"),
      r.getAs[Long]("recall_bp")))
    assert(byB.map(_._1).toSeq == Seq(2, 3, 6))
    for (Array((_, c1, h1, _, r1), (_, c2, h2, _, r2)) <- byB.sliding(2))
      assert(c2 >= c1 && h2 >= h1 && r2 >= r1,
        s"candidate nesting violated: $byB — a coarse-band match did not " +
          "imply a fine-band match")
    for ((b, cands, hits, nTrue, bp) <- byB) {
      assert(hits <= cands && hits <= nTrue,
        s"bands=$b hit count exceeds a side: $byB")
      assert(bp == (if (nTrue > 0) 10000L * hits / nTrue else 0L),
        s"bands=$b recall_bp is not the integer division of its own " +
          s"numerator/denominator: $byB")
    }
    for (r <- rows) {
      val (c, h, p) = (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("precision_bp"))
      assert(p == (if (c > 0) 10000L * h / c else 0L),
        s"precision_bp is not the integer division of its own " +
          s"numerator/denominator: ($c, $h, $p)")
    }
    // bucket-mates share a full 2-row band by construction, so at 6×2
    // every query sees at least the other hot-bucket members
    val nHot = rows.head.getAs[Long]("n_hot")
    val nQueries = math.min(10L, nHot)
    assert(byB.last._2 >= nQueries * (nHot - 1),
      s"6-band candidates ${byB.last._2} < ${nQueries * (nHot - 1)} — the " +
        "hot bucket's own members are missing from the candidate join")
  }

  test("q360: the artifact's hot bucket IS the most-occupied 6x2 bucket") {
    val out = DedupQueries.lshHotBandRecall(spark, sf0001).head()
    val hotBand = out.getAs[Int]("hot_band")
    val hotBkey = out.getAs[String]("hot_bkey")
    val nHot = out.getAs[Long]("n_hot")
    // re-derive the election brute-force from the public Dedup pieces
    val docs = graft.Tables.documents(spark, sf0001)
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 12)
    val occ = Dedup.bandKeys(sigs, "doc_id", 6, 2)
      .groupBy($"band", $"bkey").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"band".asc, $"bkey".asc).head()
    assert(occ.getAs[Int]("band") == hotBand && occ.getAs[String]("bkey") == hotBkey,
      s"hot bucket (${occ.get(0)}, ${occ.get(1)}) (brute-force) != " +
        s"($hotBand, $hotBkey) (gate)")
    assert(occ.getAs[Long]("n") == nHot,
      s"hot-bucket occupancy ${occ.getAs[Long]("n")} != $nHot (gate)")
  }

  test("q360: swept candidate sets are literally nested at sf0.001") {
    val docs = graft.Tables.documents(spark, sf0001)
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 12).cache()
    def pairs(b: Int, r: Int): Set[(Long, Long)] =
      Dedup.candidatePairs(Dedup.bandKeys(sigs, "doc_id", b, r), "doc_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val (c2, c3, c6) = (pairs(2, 6), pairs(3, 4), pairs(6, 2))
    assert(c2.subsetOf(c3), s"C(2x6) ⊄ C(3x4): ${(c2 -- c3).take(3)}")
    assert(c3.subsetOf(c6), s"C(3x4) ⊄ C(6x2): ${(c3 -- c6).take(3)}")
    assert(c6.nonEmpty, "no candidates at 6x2 on the fixture corpus")
    spark.catalog.clearCache()
  }
}
