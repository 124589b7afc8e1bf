package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
    (4L, "completely different text about spark engines and shuffles"),
    (5L, "tiny doc") // shorter than one shingle
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps the lowest id") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
    assert(out.count() == 4) // 5 docs, one exact pair
    val dup = out.filter($"n_copies" === 2).head()
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 2L))) // identical → certain candidate
    assert(pairs.collectFirst { case (1L, 2L, j) => j }.get == 1.0)
    // near-dup pair 1-3 shares most shingles → high jaccard if surfaced
    pairs.collectFirst { case (1L, 3L, j) => j }.foreach(j => assert(j > 0.4))
    // unrelated doc 4 must never pair with 1
    assert(!pairSet.contains((1L, 4L)) && !pairSet.contains((4L, 5L)))
  }

  test("simhash: identical docs get identical signatures; signature is 16-bit") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      .select("doc_id", "simhash").as[(Long, Int)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs.values.forall(s => s >= 0 && s < 65536))
    // near dup differs in few bits from its original
    val hamming = Integer.bitCount(sigs(1L) ^ sigs(3L))
    assert(hamming <= 6, s"near-dup hamming distance was $hamming")
  }

  test("short documents fall back to a whole-text shingle") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 4)
    assert(sigs.filter($"doc_id" === 5L).count() == 1)
  }

  test("q159 invariant: no near-dup cluster straddles train/val/test splits") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val split = graft.ops.DedupQueries.clusterSafeSplit(spark, dir).cache()
    // every document is assigned exactly once
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(split.count() == nDocs)
    // the leakage-safety guarantee: one split per component
    val straddling = split.groupBy($"component")
      .agg(countDistinct($"split").as("n_splits"))
      .filter($"n_splits" > 1).count()
    assert(straddling == 0, s"$straddling clusters straddle splits")
    // and it only diverges from the doc-id split where clustering demands:
    // singleton components carry q83's exact assignment (same salt/rule)
    val h = substring(md5(concat(lit("split:"), $"doc_id".cast("string"))), 1, 2)
    val q83Rule = when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    val divergentSingletons = split.filter($"component" === $"doc_id")
      .filter($"split" =!= q83Rule).count()
    assert(divergentSingletons == 0)
    split.unpersist()
  }

  test("q160 persisted LSH index: delta probes find exactly the delta-vs-base near-dups") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.DedupQueries.lshIndexPersisted(spark, dir).cache()
    // doc_a is always delta (id % 10 == 0), doc_b always base
    assert(out.filter($"doc_a" % 10 =!= 0 || $"doc_b" % 10 === 0).count() == 0)
    // it agrees with the full-corpus pair query restricted to delta-vs-base
    val full = graft.ops.DedupQueries.minhashLsh(spark, dir)
      .filter($"is_near_dup")
    val expected = full.filter($"doc_a" % 10 === 0 && $"doc_b" % 10 =!= 0)
      .select($"doc_a", $"doc_b")
      .union(full.filter($"doc_b" % 10 === 0 && $"doc_a" % 10 =!= 0)
        .select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .as[(Long, Long)].collect().toSet
    assert(out.select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      == expected)
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("q180 compacted LSH index: probe agrees with the full pair query, probe-side restricted") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.DedupQueries.lshIndexCompacted(spark, dir).cache()
    // doc_a is always a probe (delta) doc; never a self-pair
    assert(out.filter($"doc_a" % 10 =!= 0 || $"doc_a" === $"doc_b").count() == 0)
    // post-compaction the index holds the WHOLE corpus: expected = all
    // near-dup pairs ordered with a probe doc first (both orders when both
    // sides are delta docs)
    val full = graft.ops.DedupQueries.minhashLsh(spark, dir)
      .filter($"is_near_dup")
    val expected = full.filter($"doc_a" % 10 === 0)
      .select($"doc_a", $"doc_b")
      .union(full.filter($"doc_b" % 10 === 0)
        .select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .as[(Long, Long)].collect().toSet
    assert(out.select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      == expected)
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("q180 makes intra-delta duplicates visible where q160 cannot see them") {
    val dir = graft.Scratch.fresh("q180micro").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words one two three four five"),
      (10L, "red green blue cyan magenta yellow black white"),
      (20L, "red green blue cyan magenta yellow black white"), // intra-delta dup of 10
      (30L, "alpha beta gamma delta epsilon zeta eta theta")) // delta dup of base 1
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val compacted = graft.ops.DedupQueries.lshIndexCompacted(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(Set((10L, 20L), (20L, 10L), (30L, 1L)).subsetOf(compacted))
    assert(!compacted.contains((1L, 30L)), "doc_a must be a probe doc")
    val deltaOnly = graft.ops.DedupQueries.lshIndexPersisted(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(deltaOnly == Set((30L, 1L)),
      "the pre-compaction index must miss the intra-delta pair")
    spark.catalog.clearCache()
  }

  test("q161 keep-best: survivor is the largest member, ties to smaller id") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val best = graft.ops.DedupQueries.clusterKeepBest(spark, dir)
    val members = graft.ops.DedupQueries.dupClusters(spark, dir)
      .join(graft.Tables.documents(spark, dir).select($"doc_id", $"n_chars"),
        "doc_id")
      .as[(Long, Long, Boolean, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(m => (m._1, m._4))).toMap
    val rows = best.select($"component", $"n_members", $"survivor_id",
      $"survivor_chars").as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length == members.size)
    rows.foreach { case (comp, n, sid, schars) =>
      val ms = members(comp)
      assert(n == ms.length)
      val want = ms.minBy { case (id, chars) => (-chars, id) }
      assert((sid, schars) == want,
        s"component $comp kept ($sid,$schars), expected $want")
    }
  }

  test("minhash estimate tracks exact Jaccard within the 12-hash error budget") {
    // the quantitative gate behind q100: on the real corpus's LSH
    // candidates, the signature estimate must stay within the binomial
    // error of a 12-hash signature (std ≈ sqrt(J(1−J)/12) ≈ 0.09 at
    // J ≈ 0.9) — mean well under one std, max bounded by a few
    val out = graft.ops.DedupQueries.minhashAccuracy(spark, "/root/testdata/sf0.001")
      .select("abs_err").as[Double].collect()
    assert(out.nonEmpty)
    val mean = out.sum / out.length
    assert(mean < 0.15, s"mean |est - exact| = $mean")
    assert(out.max < 0.5, s"max |est - exact| = ${out.max}")
  }

  test("q188 band sweep: coarser banding never gains candidates or recall (S-curve shape)") {
    // measured at sf0.01: candidates 1248/27/25/25/23 and recall
    // 1.0/1.0/1.0/1.0/0.92 across (12,1)..(2,6) — the textbook trade.
    val rows = graft.ops.DedupQueries.lshBandSweep(spark, "/root/testdata/sf0.01")
      .orderBy(org.apache.spark.sql.functions.col("bands").desc)
      .select("bands", "n_candidates", "n_true_candidates", "n_exact_true")
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(12, 6, 4, 3, 2))
    // Containment is a THEOREM only where the coarser config's every band
    // window covers a complete aligned band of the finer config:
    // (12,1) ⊇ (6,2) ⊇ (4,3) ⊇ (2,6) and (6,2) ⊇ (3,4) ⊇ (2,6) —
    // (4,3) vs (3,4) is incomparable (window [4,7] contains no aligned
    // 3-row band), so the spec asserts exactly the nested chains.
    val byBands = rows.map(r => r._1 -> r).toMap
    def cands(b: Int) = byBands(b)._2
    def trues(b: Int) = byBands(b)._3
    for (Seq(coarse, fine) <- Seq(Seq(6, 12), Seq(4, 6), Seq(2, 4), Seq(3, 6), Seq(2, 3))) {
      assert(cands(coarse) <= cands(fine),
        s"bands=$coarse candidates ${cands(coarse)} > bands=$fine ${cands(fine)}")
      assert(trues(coarse) <= trues(fine),
        s"bands=$coarse true-candidates not nested under bands=$fine")
    }
    // LSH verification admits no false positives past the exact check
    assert(rows.forall(r => r._3 <= r._4))
    // the aggressive end must find every exact pair on this corpus
    assert(rows.head._3 == rows.head._4,
      s"12x1 banding missed exact pairs: ${rows.head}")
  }
}
