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
}
