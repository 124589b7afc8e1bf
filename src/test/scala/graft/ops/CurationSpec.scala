package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property tests for the round-9 curation gates. The gate queries prove
  * oracle equality on the corpus; these prove the ALGORITHMS on inputs the
  * corpus may not contain, and the internal claims the oracle can't see:
  *  - q170's bloom is a pure optimization (result == the bloom-free twin);
  *  - q173's prefix filter is COMPLETE (== brute-force all-pairs
  *    containment, including planted exact subsets);
  *  - q174 is exactly Duffield–Lund–Thorup priority sampling (driver
  *    recompute with the same md5→uniform mapping), incl. the n ≤ k
  *    tau=0 edge;
  *  - q171's fixed-point scores match a driver recompute of the same
  *    5-op IEEE sequence;
  *  - q172's cascade assigns the FIRST failing rule.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def toks(text: String): Seq[String] =
    text.split("\\s+").filter(_.nonEmpty).toSeq

  private def shingles(text: String, n: Int): Seq[String] = {
    val t = toks(text)
    if (t.size >= n) t.sliding(n).map(_.mkString(" ")).toSeq
    else Seq(t.mkString(" "))
  }

  /** Writes a documents.parquet corpus into a fresh scratch dir. */
  private def corpus(rows: Seq[(Long, String, String, String)]): String = {
    val dir = graft.Scratch.fresh("curation").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- q170 ----

  test("bloom decontamination equals the bloom-free exact twin on the corpus") {
    val got = PipelineQueries.bloomDecontaminate(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet

    // bloom-free twin: identical dataflow minus the pre-filter
    val splitCol = {
      val h = substring(md5(concat(lit("split:"), $"doc_id".cast("string"))), 1, 2)
      when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    }
    val shingled = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", splitCol.as("split"),
        explode(graft.operators.Dedup.wordShingles($"text", 5)).as("sh"))
    val trainSh = shingled.filter($"split" === "train").select($"sh").distinct()
    val testSh = shingled.filter($"split" === "test")
      .select($"doc_id", $"lang", $"sh").distinct()
    val totals = testSh.groupBy($"doc_id")
      .agg(first($"lang").as("lang"), count(lit(1)).as("n_shingles"))
    val shared = testSh.join(trainSh, Seq("sh"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
    val expected = totals.join(shared, Seq("doc_id"), "left_outer")
      .select($"lang", $"n_shingles", coalesce($"n_shared", lit(0L)).as("n_shared"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_test_docs"),
        sum(when($"n_shared" * 2 >= $"n_shingles", 1L).otherwise(0L)).as("n_dropped"),
        sum(when($"n_shared" * 2 >= $"n_shingles", 0L).otherwise(1L)).as("n_kept"))
      .as[(String, Long, Long, Long)].collect().toSet

    assert(got == expected)
    assert(got.map(_._2).sum > 0, "test split must not be empty")
  }

  // ---- q173 ----

  private def bruteContainment(rows: Seq[(Long, String)]): Set[(Long, Long, Long, Boolean)] = {
    val sets = rows.map { case (id, text) => id -> shingles(text, 3).toSet }.toMap
    (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      inter = (sa & sb).size
      if 10L * inter >= 6L * sa.size
    } yield (a, b, inter.toLong, inter == sa.size)).toSet
  }

  test("containment join equals brute-force all-pairs on seeded random docs") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val base = (1L to 60L).map { i =>
      i -> (1 to (5 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // plant: 61 is an exact subset (prefix) of 1; 62 shares a 70% slice of 2
    val planted = Seq(
      61L -> base(0)._2.split(" ").take(9).mkString(" "),
      62L -> (base(1)._2.split(" ").take(14) ++ Seq("qqq", "zzz")).mkString(" "))
    val rows = base ++ planted
    val dir = corpus(rows.map { case (id, t) => (id, t, "en", "s") })
    val got = DedupQueries.containmentJoin(spark, dir)
      .select($"doc_a", $"doc_b", $"n_shared", $"is_exact_subset")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val expected = bruteContainment(rows)
    assert(got == expected)
    assert(expected.exists { case (a, _, _, exact) => a == 61L && exact },
      "planted exact subset must be found")
  }

  // ---- q174 ----

  private def refPriorities(rows: Seq[(Long, Long)]): Seq[(Long, Long, Double)] =
    rows.map { case (id, w) =>
      val m = java.lang.Long.parseLong(md5hex(s"psamp:$id").take(8), 16)
      (id, w, w.toDouble * 4294967296.0 / (m + 1).toDouble)
    }

  test("priority sample equals the DLT reference computation") {
    val rnd = new scala.util.Random(17)
    val rows = (1L to 40L).map(i => i -> (10L + rnd.nextInt(500)))
    val dir = corpus(rows.map { case (id, w) => (id, "x " * w.toInt, "en", "s") })
    // n_chars = 2*w (written text length) — read back what the corpus says
    val weights = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toSeq
    val k = 10
    val ref = refPriorities(weights).sortBy { case (id, _, p) => (-p, id) }
    val tau = ref(k)._3 // 11th priority (n=40 > k)
    val expected = ref.take(k).zipWithIndex.map { case ((id, w, p), i) =>
      (i + 1, id, w, p, math.max(w.toDouble, tau))
    }.toSet
    val got = PipelineQueries.prioritySampleK(spark, dir, k)
      .as[(Int, Long, Long, Double, Double)].collect().toSet
    assert(got == expected)
  }

  test("priority sample with n <= k keeps everything at tau = 0") {
    val rows = (1L to 5L).map(i => (i, s"doc number $i words", "en", "s"))
    val dir = corpus(rows)
    val got = PipelineQueries.prioritySampleK(spark, dir, 10)
      .select($"doc_id", $"weight", $"ht_weight")
      .as[(Long, Long, Double)].collect()
    assert(got.length == 5)
    // tau = 0 → ht_weight degenerates to the true weight
    assert(got.forall { case (_, w, ht) => ht == w.toDouble })
  }

  // ---- q171 ----

  test("DSIR fixed-point weights match a driver recompute of the same IEEE sequence") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s"),
      (2L, "el rapido zorro marron salta sobre el perro", "es", "s"),
      (3L, "the lazy dog sleeps while the quick fox runs", "en", "s"),
      (4L, "der schnelle fuchs springt uber den faulen hund", "de", "s"))
    val dir = corpus(rows)

    def bigrams(t: String): Seq[String] = toks(t).sliding(2).map(_.mkString(" ")).toSeq
    val occ = rows.flatMap { case (id, t, lang, _) =>
      bigrams(t).map(b => (id, lang, md5hex("dsir:" + b).take(2)))
    }
    val rcnt = occ.groupBy(_._3).map { case (b, xs) =>
      b -> (xs.size.toLong, xs.count(_._2 == "en").toLong)
    }
    val rr = rcnt.values.map(_._1).sum
    val tt = rcnt.values.map(_._2).sum
    val score = rcnt.map { case (b, (r, t)) =>
      b -> math.floor(1000000.0 * ((t + 1).toDouble / (tt + 256).toDouble) /
        ((r + 1).toDouble / (rr + 256).toDouble)).toLong
    }
    val expected = occ.groupBy(_._1).map { case (id, xs) =>
      (id, xs.size.toLong, xs.map(x => score(x._3)).sum)
    }.toSet

    val got = PipelineQueries.dsirImportance(spark, dir)
      .select($"doc_id", $"n_bigrams", $"dsir_fp")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  // ---- q175 ----

  test("source drift matches the exact integer TV computation") {
    // srcA/srcB share a distribution; srcC is skewed — TV must rank C above
    val rows = Seq(
      (1L, "a b c d a b c d", "en", "srcA"),
      (2L, "a b c d a b c d", "en", "srcB"),
      (3L, "z z z z z z a b", "en", "srcC"))
    val dir = corpus(rows)
    // driver recompute with the same BIGINT floor-divisions
    val occ = rows.flatMap { case (_, t, _, s) => toks(t).map(s -> _) }
    val cst = occ.groupBy(identity).map { case ((s, tk), xs) => (s, tk, xs.size.toLong) }
    val ct = cst.groupBy(_._2).map { case (tk, xs) => tk -> xs.map(_._3).sum }
    val ns = cst.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val n = ct.values.sum
    val expected = cst.groupBy(_._1).map { case (s, xs) =>
      val sumAbs = xs.map { case (_, tk, c) =>
        math.abs(c * 1000000000L / ns(s) - ct(tk) * 1000000000L / n)
      }.sum
      val sumR2 = xs.map { case (_, tk, _) => ct(tk) * 1000000000L / n }.sum
      (s, ns(s), sumAbs + (1000000000L - sumR2))
    }.toSet
    val got = PipelineQueries.sourceDrift(spark, dir)
      .select($"source", $"n_source_tokens", $"tv_fp")
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
    val tv = got.map(x => x._1 -> x._3).toMap
    assert(tv("srcC") > tv("srcA") && tv("srcC") > tv("srcB"))
  }

  // ---- q176 ----

  test("repetition chars flags a bigram-repeating doc and not a clean one") {
    val rows = Seq(
      (1L, "spam ham spam ham spam ham spam ham", "en", "s"), // every bigram repeats
      (2L, "one two three four five six seven eight", "en", "s")) // zero repeats
    val dir = corpus(rows)
    val got = PipelineQueries.repetitionChars(spark, dir)
      .select($"doc_id", $"dup_gram_chars", $"total_gram_chars", $"is_repetitive")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // doc 1: 7 bigrams, "spam ham" ×4 (mass 4·8=32) + "ham spam" ×3 (24) → all dup
    assert(got(0) == ((1L, 56L, 56L, true)))
    assert(got(1)._2 == 0L && !got(1)._4)
  }

  // ---- q177 ----

  test("embedding norm QA computes exact grid norms and flags drifted vectors") {
    val dir = graft.Scratch.fresh("curation").toString
    val dims = 8
    def pad(v: Seq[Float]) = v ++ Seq.fill(dims - v.size)(0.0f)
    Seq(
      (1L, pad(Seq(1.0f)), 0),            // norm2 = 1000² = 1e6 → in band
      (2L, pad(Seq(0.6f, 0.8f)), 0),      // 600² + 800² = 1e6 → in band
      (3L, pad(Seq(0.5f, 0.5f)), 0),      // 500000 → outlier
      (4L, pad(Seq(-1.0f)), 1))           // floor(-1000.0) = -1000 → 1e6, in band
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = AnnQueries.embeddingNormQa(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0, 3L, 500000L, 1000000L, 1L), (1, 1L, 1000000L, 1000000L, 0L)))
  }

  // ---- q178 ----

  test("boilerplate spans reports only cross-doc 8-grams, ranked by count") {
    val span = "alpha beta gamma delta eps zeta eta theta"
    val rows = Seq(
      (1L, s"$span tail1a tail1b", "en", "s"),
      (2L, s"$span tail2a tail2b", "en", "s"),
      (3L, s"$span tail3a tail3b", "en", "s"),
      // intra-doc repeat only: its 8-gram occurs twice but in ONE doc
      (4L, "one two three four five six seven eight one two three four five six seven eight", "en", "s"))
    val dir = corpus(rows)
    val got = TextQueries.boilerplateSpans(spark, dir)
      .select($"gram", $"n_occ", $"n_docs", $"rank")
      .as[(String, Long, Long, Int)].collect()
    assert(got.head == ((span, 3L, 3L, 1)))
    assert(got.forall(_._3 >= 2L), "single-doc spans must be excluded")
    assert(!got.exists(_._1.startsWith("one two")))
  }

  // ---- q181 ----

  test("data card agrees with its building-block gates on the corpus") {
    val card = PipelineQueries.dataCard(spark, sf0001).cache()
    val docs = graft.Tables.documents(spark, sf0001).cache()
    val nDocs = docs.count()
    // volume adds up
    assert(card.agg(sum($"n_docs")).as[Long].head == nDocs)
    // exact-dup total = docs minus distinct content hashes
    val distinctHashes = docs.select(md5($"text")).distinct().count()
    assert(card.agg(sum($"n_exact_dup")).as[Long].head == nDocs - distinctHashes)
    // quality-pass total = the q172 funnel's 'pass' bucket
    val passTotal = TextQueries.qualityFunnel(spark, sf0001)
      .filter($"verdict" === "pass").agg(sum($"n_docs")).as[Long].head
    assert(card.agg(sum($"n_quality_pass")).as[Long].head == passTotal)
    // near-dup membership = the shared component frame's node count
    val clustered = DedupQueries.components(spark, sf0001)
      .select($"doc_id").distinct().count()
    assert(card.agg(sum($"n_near_dup_members")).as[Long].head == clustered)
    card.unpersist(); docs.unpersist()
    spark.catalog.clearCache()
  }

  // ---- q179 ----

  test("modality coverage counts matched, missing, and orphan embeddings per source") {
    val dir = corpus(Seq(
      (1L, "one", "en", "sA"), (2L, "two", "en", "sA"), (3L, "three", "en", "sB"),
      (4L, "four", "en", "sB"), (5L, "five", "en", "sB")))
    Seq((1L, Seq(1.0f), 0), (2L, Seq(1.0f), 0), (3L, Seq(1.0f), 0),
      (100L, Seq(1.0f), 1), (101L, Seq(1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = MultimodalQueries.modalityCoverage(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("sA", 2L, 2L, 0L, 0L),
      ("sB", 3L, 1L, 2L, 0L),
      ("__orphan_embeddings__", 0L, 0L, 0L, 2L)))
  }

  // ---- q172 ----

  test("quality funnel assigns the FIRST failing rule of the cascade") {
    val pass = ("the " + (1 to 30).map(i => s"word$i").mkString(" ")) // 31 uniq toks, marker, mean len ok
    val rows = Seq(
      (1L, "the of to", "en", "s"), // 3 toks → too_short (fires before any later rule)
      (2L, (1 to 95).map(i => s"w$i").mkString(" "), "en", "s"), // too_long beats no_stopwords
      (3L, "the " * 40, "en", "s"), // 40 toks, 1 uniq → low_diversity (marker present: proves order vs no_stopwords)
      (4L, (1 to 30).map(i => s"wordword$i").mkString(" "), "en", "s"), // mean len > 6.5 → word_shape
      (5L, (1 to 30).map(i => s"xyz$i").mkString(" "), "en", "s"), // mean len ok, no markers → no_stopwords
      (6L, pass, "en", "s"))
    val dir = corpus(rows)
    val got = TextQueries.qualityFunnel(spark, dir)
      .select($"verdict", $"n_docs").as[(String, Long)].collect().toMap
    assert(got == Map("too_short" -> 1L, "too_long" -> 1L, "low_diversity" -> 1L,
      "word_shape" -> 1L, "no_stopwords" -> 1L, "pass" -> 1L))
  }
}
