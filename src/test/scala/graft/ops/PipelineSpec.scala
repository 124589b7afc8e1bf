package graft.ops

import org.apache.spark.sql.functions.{coalesce, lit}

import graft.SparkSpec

/** Hand-computed fixtures for the curation operators (the gate checks them
  * against DuckDB on the real corpus; these pin the semantics on inputs
  * small enough to verify by eye). Each test writes a tiny documents table
  * to a temp dir so the (spark, dir) query functions run unmodified. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  /** (doc_id, text, lang, source, n_chars) rows → a dir Tables.documents reads. */
  private def docsDir(rows: (Long, String, String, String, Long)*): String = {
    val dir = graft.Scratch.fresh("docs").toString
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("repetition signals: hand-computed fractions") {
    val dir = docsDir(
      (0L, "a a b", "en", "s0", 5L), // top a=2/3, dup 1/3; bigrams "a a","a b" distinct
      (1L, "x y z w", "en", "s0", 7L)) // no repetition at all
    val out = PipelineQueries.repetitionSignals(spark, dir)
      .orderBy("doc_id")
      .select("n_toks", "top_tok_frac", "dup_tok_frac", "dup_bigram_frac")
      .as[(Long, Double, Double, Double)].collect()
    assert(out(0) == ((3L, 2.0 / 3, 1.0 / 3, 0.0)))
    assert(out(1) == ((4L, 1.0 / 4, 0.0, 0.0)))
  }

  test("hash split: deterministic, exhaustive, and roughly 80/10/10") {
    val dir = "/root/testdata/sf0.01"
    val a = PipelineQueries.hashSplit(spark, dir).orderBy("lang", "split")
      .as[(String, String, Long, Long)].collect()
    val b = PipelineQueries.hashSplit(spark, dir).orderBy("lang", "split")
      .as[(String, String, Long, Long)].collect()
    assert(a.sameElements(b)) // pure function of content hash
    val bySplit = a.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.7 && bySplit("train") / total < 0.9)
    assert(bySplit("test") / total > 0.03 && bySplit("val") / total > 0.03)
  }

  test("weighted repeat: 1 + chars/100 copies, capped at 3") {
    val dir = docsDir(
      (0L, "t", "en", "s0", 50L),   // 1 copy
      (1L, "t", "en", "s0", 150L),  // 2 copies
      (2L, "t", "en", "s0", 950L))  // capped at 3
    val out = PipelineQueries.weightedRepeat(spark, dir)
      .groupBy("doc_id").count().orderBy("doc_id")
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 1L), (1L, 2L), (2L, 3L)))
  }

  test("sequence packing: pack id is the pre-doc running total / 2048") {
    // three ~1000-token docs in one source: cum_before 0 / 1000 / 2000 →
    // packs 0, 0, 0; the fourth (cum_before 3000) opens pack 1
    val text1000 = Seq.fill(1000)("w").mkString(" ")
    val dir = docsDir(
      (0L, text1000, "en", "s0", 1L), (1L, text1000, "en", "s0", 1L),
      (2L, text1000, "en", "s0", 1L), (3L, text1000, "en", "s0", 1L),
      (4L, text1000, "en", "OTHER", 1L)) // separate source restarts at pack 0
    val out = PipelineQueries.sequencePacking(spark, dir)
      .orderBy("doc_id").select("pack_id").as[Int].collect()
    assert(out.toSeq == Seq(0, 0, 0, 1, 0))
  }

  test("edit distance pairs: identical blocked texts at distance 0") {
    val t = "alpha beta gamma delta epsilon zeta"
    val dir = docsDir(
      (0L, t, "en", "s0", t.length.toLong),
      (1L, t, "en", "s0", t.length.toLong), // identical → same block, dist 0
      (2L, "completely different words here entirely", "en", "s0", 40L))
    val out = PipelineQueries.editDistancePairs(spark, dir)
      .select("doc_a", "doc_b", "edit_distance").as[(Long, Long, Int)].collect()
    assert(out.toSeq == Seq((0L, 1L, 0)))
  }

  test("temperature mix: min source keeps all, rates follow sqrt(n_min/n)") {
    val rows = (0L to 15L).map(i => (i, s"doc $i", "en", "big", 10L)) :+
      ((100L, "only one", "en", "small", 8L))
    val dir = docsDir(rows: _*)
    val out = PipelineQueries.temperatureMix(spark, dir)
      .orderBy("source").as[(String, Long, Long, Double)].collect()
    val Array(big, small) = out
    assert(big == (("big", 16L, big._3, 0.25))) // sqrt(1/16)
    assert(big._3 <= 16L)
    assert(small == (("small", 1L, 1L, 1.0))) // rate 1 → keeps everything
    // pure function of content: a second run keeps exactly the same docs
    val again = PipelineQueries.temperatureMix(spark, dir)
      .orderBy("source").as[(String, Long, Long, Double)].collect()
    assert(out.sameElements(again))
  }

  test("temperature mix α=3/4: rates follow (n_min/n)^(3/4) exactly") {
    val rows = (0L to 15L).map(i => (i, s"doc $i", "en", "big", 10L)) :+
      ((100L, "only one", "en", "small", 8L))
    val dir = docsDir(rows: _*)
    val out = PipelineQueries.temperatureMixAlpha34(spark, dir)
      .orderBy("source").as[(String, Long, Long, Double)].collect()
    val Array(big, small) = out
    // (1/16)^(3/4) = sqrt(1/16)·sqrt(sqrt(1/16)) = 0.25 · 0.5 = 0.125
    assert(big == (("big", 16L, big._3, 0.125)))
    assert(small == (("small", 1L, 1L, 1.0)))
    // α=3/4 keeps at least as much of the big source as α=1/2 drops:
    // the rate is gentler than sqrt's (0.125 vs 0.25 is HARSHER here —
    // n_min/n < 1 so a larger exponent shrinks it). Just pin determinism.
    val again = PipelineQueries.temperatureMixAlpha34(spark, dir)
      .orderBy("source").as[(String, Long, Long, Double)].collect()
    assert(out.sameElements(again))
  }

  test("dyadicPow: iterated-sqrt products hit every dyadic exponent") {
    val xs = Seq(0.017, 0.25, 0.5, 0.9, 1.0, 3.7)
    val df = xs.toDF("x")
    def eval(k: Int, m: Int): Seq[Double] =
      df.select(PipelineQueries.dyadicPow($"x", k, m).as("y"))
        .as[Double].collect().toSeq
    // exact identities: the column tree is literally the same op sequence
    assert(eval(1, 1) == xs.map(math.sqrt))
    assert(eval(1, 2) == xs.map(x => math.sqrt(math.sqrt(x))))
    assert(eval(3, 2) == xs.map(x => math.sqrt(x) * math.sqrt(math.sqrt(x))))
    assert(eval(5, 3) == xs.map(x =>
      math.sqrt(x) * math.sqrt(math.sqrt(math.sqrt(x)))))
    // and the products approximate the real power to double precision
    for ((y, x) <- eval(5, 3).zip(xs))
      assert(math.abs(y - math.pow(x, 0.625)) < 1e-12)
    intercept[IllegalArgumentException](PipelineQueries.dyadicPow($"x", 4, 2))
  }

  test("stratified sample: exact-k smallest salted hashes per stratum") {
    // two strata; k=20 exceeds one and bounds the other
    val rows = (0L until 30L).map(i =>
      (i, s"doc $i", "en", if (i < 25) "big" else "tiny", 5L))
    val dir = docsDir(rows: _*)
    val out = PipelineQueries.stratifiedSample(spark, dir)
      .select("source", "doc_id", "sample_rank")
      .as[(String, Long, Int)].collect()
    val bySrc = out.groupBy(_._1)
    assert(bySrc("big").length == 20 && bySrc("tiny").length == 5)
    // reference ordering: md5("strat:" + id) first 12 hex as a long,
    // ascending (the query negates for its max-heap TopK)
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): Long = {
      val hex = md.digest(s"strat:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    for ((src, ids) <- Map("big" -> (0L until 25L), "tiny" -> (25L until 30L))) {
      val expect = ids.sortBy(key).take(20).toSeq
      val got = bySrc(src).sortBy(_._3).map(_._2).toSeq
      assert(got == expect, s"stratum $src")
    }
  }

  test("text scrub: stopword, denylist, and cleaned-length accounting") {
    val dir = docsDir(
      (0L, "a customer saw the customer", "en", "s0", 27L),
      (1L, "no stopwords here", "en", "s0", 17L))
    val out = TextQueries.textScrub(spark, dir).orderBy("doc_id")
      .as[(Long, Int, Int, Int)].collect()
    // doc 0: stopwords {a, the}=2; denied "customer"×2;
    // cleaned = "<TERM> saw <TERM>" → 17 chars
    assert(out(0) == ((0L, 2, 2, 17)))
    assert(out(1) == ((1L, 0, 0, "no stopwords here".length)))
  }

  test("shard assignment: nibble shards with dense per-shard positions") {
    val dir = docsDir((0L to 63L).map(i => (i, s"d$i", "en", "s0", 2L)): _*)
    val out = PipelineQueries.shardAssignment(spark, dir)
      .select("doc_id", "shuffle_key", "shard_id", "pos_in_shard")
      .as[(Long, String, Int, Int)].collect()
    assert(out.length == 64)
    out.foreach { case (_, key, shard, _) =>
      assert(shard == Integer.parseInt(key.take(2), 16)) // first two nibbles
    }
    // positions are 1..k dense within each shard, ordered by the hash key
    out.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
      assert(rows.sortBy(_._4).map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    }
  }

  test("bigram LM: hand-computed conditional probabilities") {
    val dir = docsDir((0L, "a b a b c", "en", "s0", 9L))
    val out = PipelineQueries.bigramLm(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // bigrams: (a,b)x2 (b,a) (b,c); c(a)=2, c(b)=2
    assert(out == Seq(
      ("a", "b", 2L, 2L, 1.0),
      ("b", "a", 1L, 2L, 0.5),
      ("b", "c", 1L, 2L, 0.5)))
  }

  test("curation pipeline: quality gate and dedup both drop rows") {
    val t25 = (1 to 25).map(i => s"w$i").mkString(" ")
    val u25 = (1 to 25).map(i => s"v$i").mkString(" ")
    val dir = docsDir(
      (0L, t25, "en", "s0", 5L),
      (1L, t25, "en", "s0", 5L),        // exact dup of doc 0 → dropped
      (2L, "too short", "en", "s0", 9L), // under the token floor → dropped
      (3L, u25, "en", "s0", 5L))
    val out = PipelineQueries.curationPipeline(spark, dir)
      .as[(String, String, Long, Long)].collect()
    assert(out.map(_._3).sum == 2L)       // doc 0 + doc 3 survive
    assert(out.map(_._4).sum == 50L)      // 25 tokens each
    assert(out.forall(_._2 == "s0"))
  }

  test("grouped median matches the interpolation rule") {
    val dir = docsDir(
      (0L, "t", "en", "odd", 1L), (1L, "t", "en", "odd", 3L),
      (2L, "t", "en", "odd", 5L),
      (3L, "t", "en", "even", 2L), (4L, "t", "en", "even", 4L))
    val out = ExtendedQueries.groupedMedian(spark, dir)
      .as[(String, Long, Double)].collect().toSet
    assert(out == Set(("odd", 3L, 3.0), ("even", 2L, 3.0)))
  }

  test("cdc merge: latest change wins, deletes drop, inserts appear") {
    // doc 10: update (seq 1) then delete (seq 2) → gone
    // doc  5: update only → upper(source), n_chars+1
    // doc  7: insert twin at 10000007 with source 'backfill'
    // doc  3: untouched → last_op K
    val dir = docsDir(
      (3L, "t", "en", "s0", 30L), (5L, "t", "en", "s0", 50L),
      (7L, "t", "en", "s0", 70L), (10L, "t", "en", "s0", 100L))
    val out = PipelineQueries.cdcMerge(spark, dir)
      .as[(Long, String, Long, String)].collect().toSet
    assert(out == Set(
      (3L, "s0", 30L, "K"),
      (5L, "S0", 51L, "U"),
      (7L, "s0", 70L, "K"),
      (10000007L, "backfill", 70L, "I")))
  }

  test("scd2 history: versioned intervals, delete closes, insert opens") {
    // same feed as cdc merge; every key's timeline becomes
    // [valid_from_seq, valid_to_seq) rows, delete rows vanish but close
    val dir = docsDir(
      (3L, "t", "en", "s0", 30L), (5L, "t", "en", "s0", 50L),
      (7L, "t", "en", "s0", 70L), (10L, "t", "en", "s0", 100L))
    val out = PipelineQueries.scd2History(spark, dir)
      .select($"doc_id", $"valid_from_seq",
        coalesce($"valid_to_seq", lit(-1L)), $"source", $"n_chars",
        $"is_current")
      .as[(Long, Long, Long, String, Long, Boolean)].collect().toSet
    assert(out == Set(
      (3L, 0L, -1L, "s0", 30L, true),            // untouched: v0 still open
      (5L, 0L, 1L, "s0", 50L, false),            // closed by the update
      (5L, 1L, -1L, "S0", 51L, true),            // updated version current
      (7L, 0L, -1L, "s0", 70L, true),            // source row untouched
      (10000007L, 1L, -1L, "backfill", 70L, true), // insert twin current
      (10L, 0L, 1L, "s0", 100L, false),          // closed by the update
      (10L, 1L, 2L, "S0", 101L, false)))         // closed by the DELETE: none current
  }

  test("incremental agg maintenance equals recompute from the merged state") {
    // includes a group-moving update (doc 5/10's source flips case) and a
    // delete — the two cases delta maintenance must retract correctly
    val dir = docsDir(
      (3L, "t", "en", "s0", 30L), (5L, "t", "en", "s0", 50L),
      (7L, "t", "en", "s1", 70L), (10L, "t", "en", "s1", 100L))
    val inc = PipelineQueries.incrementalAgg(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    val recompute = PipelineQueries.cdcMerge(spark, dir)
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum("n_chars").as("total_chars"))
      .as[(String, Long, Long)].collect().toSet
    assert(inc == recompute)
    // hand-check one cell: s0 keeps doc 3 only (5 moved to S0) → (1, 30)
    assert(inc.contains(("s0", 1L, 30L)))
  }

  test("chunking: stride-48 windows cover every token; short docs get one chunk") {
    val t100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val dir = docsDir(
      (0L, t100, "en", "s0", 100L), // starts 1, 49, 97 → 64, 52, 4 tokens
      (1L, "tiny doc", "en", "s0", 8L)) // one 2-token chunk
    val out = TextQueries.chunkDocs(spark, dir)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_toks", "chunk_text")
      .as[(Long, Int, Int, String)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 1, 64), (0L, 2, 52), (0L, 3, 4), (1L, 1, 2)))
    assert(out(0)._4.startsWith("w1 w2 ") && out(0)._4.endsWith(" w64"))
    assert(out(2)._4 == "w97 w98 w99 w100")
    assert(out(3)._4 == "tiny doc")
    // overlap invariant: chunk i+1 starts 48 tokens after chunk i → the
    // last 16 tokens of a full chunk reappear at the head of the next
    assert(out(0)._4.split(" ").drop(48).toSeq == out(1)._4.split(" ").take(16).toSeq)
  }

  test("decontamination fractions are well-formed on the real corpus") {
    val out = PipelineQueries.decontamination(spark, "/root/testdata/sf0.001")
      .select("n_shingles", "n_shared", "contamination_frac")
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, shared, frac) =>
      assert(shared >= 0 && shared <= n)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(frac == shared.toDouble / n)
    }
  }

  test("surprisal: hand-computed integer floor(log2) per bigram") {
    // corpus bigrams: "a b" ×4 (doc0 ×3 + doc2 ×1), "a c" ×1 (doc1), so
    // c(a·)=5; s("a b") = floor(log2(5 div 4)) = 0, s("a c") =
    // floor(log2(5 div 1)) = 2
    val dir = docsDir(
      (0L, "a b a b a b", "en", "s0", 11L), // bigrams: ab, ba, ab, ba, ab
      (1L, "a c", "en", "s0", 3L),
      (2L, "a b", "en", "s0", 3L))
    val out = PipelineQueries.surprisalScore(spark, dir)
      .orderBy("doc_id")
      .select("n_bigrams", "total_surprisal", "avg_surprisal")
      .as[(Long, Long, Double)].collect()
    // doc0: ab,ba,ab,ba,ab — c(b·)=2 ("b a" ×2), s(ba)=floor(log2(2 div 2))=0
    assert(out(0) == ((5L, 0L, 0.0)))
    assert(out(1) == ((1L, 2L, 2.0))) // "a c": 5 div 1 = 5 → floor log2 = 2
    assert(out(2) == ((1L, 0L, 0.0))) // "a b": 5 div 4 = 1 → 0
  }

  test("ngram novelty: shared shingles score 0, unique ones score 1") {
    val dir = docsDir(
      (0L, "p q r s", "en", "s0", 7L), // shingles: pqr, qrs — both also in doc1
      (1L, "p q r s", "en", "s0", 7L),
      (2L, "u v w x", "en", "s0", 7L)) // uvw, vwx — unique to doc2
    val out = PipelineQueries.ngramNovelty(spark, dir)
      .orderBy("doc_id")
      .select("n_shingles", "n_unique", "novelty_frac")
      .as[(Long, Long, Double)].collect()
    assert(out(0) == ((2L, 0L, 0.0)))
    assert(out(1) == ((2L, 0L, 0.0)))
    assert(out(2) == ((2L, 2L, 1.0)))
  }

  test("q222 PIT join: every temporal edge on a hand-built timeline") {
    // id 3: plain base; id 5: update at seq 1; id 10: update then delete;
    // id 7: base + a backfill insert under key 10000007 at seq 1
    val dir = docsDir(
      (3L, "t", "en", "src3", 30L),
      (5L, "t", "en", "src5", 50L),
      (7L, "t", "en", "src7", 70L),
      (10L, "t", "en", "src10", 100L))
    val got = PipelineQueries.pitJoin(spark, dir)
      .as[(Long, Option[String], Long, Option[Long])].collect().toSet
    val want = Set[(Long, Option[String], Long, Option[Long])](
      // as_of 0: pre-insert probe for 10000007 finds nothing
      (0L, Some("src3"), 1L, Some(30L)), (0L, Some("src5"), 1L, Some(50L)),
      (0L, Some("src7"), 1L, Some(70L)), (0L, Some("src10"), 1L, Some(100L)),
      (0L, None, 1L, None),
      // as_of 1: updates visible, insert live
      (1L, Some("src3"), 1L, Some(30L)), (1L, Some("SRC5"), 1L, Some(51L)),
      (1L, Some("src7"), 1L, Some(70L)), (1L, Some("SRC10"), 1L, Some(101L)),
      (1L, Some("backfill"), 1L, Some(70L)),
      // as_of 2: the delete closes id 10's last version — null group, no leak
      (2L, Some("src3"), 1L, Some(30L)), (2L, Some("SRC5"), 1L, Some(51L)),
      (2L, Some("src7"), 1L, Some(70L)), (2L, Some("backfill"), 1L, Some(70L)),
      (2L, None, 1L, None))
    assert(got == want, s"got:\n${got.toSeq.sorted.mkString("\n")}")
  }
}
