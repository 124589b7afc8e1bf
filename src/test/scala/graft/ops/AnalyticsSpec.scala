package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the round-4 analytics/search operators
  * (funnel, retention, phrase search, HLL rollup, prefix-filter similarity
  * join). The gate checks them against DuckDB on the real corpus; these pin
  * the semantics on inputs small enough to verify by eye. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, ts NANOS, user_id, event_type, value) → a dir
    * Tables.events reads (ts stored as long nanos, as the corpus). */
  private def eventsDir(rows: (Long, Long, Long, String, Double)*): String = {
    val dir = graft.Scratch.fresh("ev").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit(null).cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def docsDir(rows: (Long, String, String, String, Long)*): String = {
    val dir = graft.Scratch.fresh("docs").toString
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def mins(m: Long): Long = m * 60L * 1000000000L // minutes → nanos

  test("funnel: ordered steps, strict time ordering, stage counting") {
    val dir = eventsDir(
      // user 1 completes the funnel in order → stage 3
      (0L, mins(10), 1L, "view", 0.0),
      (1L, mins(20), 1L, "click", 0.0),
      (2L, mins(30), 1L, "purchase", 0.0),
      // user 2's click PRECEDES the first view → not a conversion, stage 1
      (3L, mins(5), 2L, "click", 0.0),
      (4L, mins(10), 2L, "view", 0.0),
      // user 3 never viewed → absent from the funnel entirely
      (5L, mins(10), 3L, "click", 0.0),
      // user 4's click is SIMULTANEOUS with the view (strict >) → stage 1
      (6L, mins(10), 4L, "view", 0.0),
      (7L, mins(10), 4L, "click", 0.0))
    val out = EventQueries.funnel(spark, dir).orderBy("user_id")
      .select($"user_id", $"stage", $"click_ts".isNull, $"purchase_ts".isNull)
      .as[(Long, Int, Boolean, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, 3, false, false), (2L, 1, true, true), (4L, 1, true, true)))
  }

  test("cohort retention: Monday-aligned weeks, integer offsets") {
    val wk = 7L * 24 * 60 // one week in minutes
    // epoch week 0 starts Thu 1970-01-01; Monday alignment means the
    // cells below are asserted by cohort VALUE equality, not arithmetic
    val dir = eventsDir(
      (0L, mins(8 * 24 * 60), 1L, "view", 0.0),      // u1 week of Jan 5 1970 (Mon)
      (1L, mins(8 * 24 * 60 + wk), 1L, "view", 0.0), // u1 active next week too
      (2L, mins(8 * 24 * 60 + wk), 2L, "view", 0.0)) // u2 cohorted one week later
    val out = EventQueries.cohortRetention(spark, dir)
      .orderBy("cohort_week", "week_offset")
      .select($"week_offset", $"n_users").as[(Int, Long)].collect()
    assert(out.toSeq == Seq((0, 1L), (1, 1L), (0, 1L)))
  }

  test("phrase search: adjacent positions only, per-doc occurrence counts") {
    val dir = docsDir(
      (0L, "hash join hash join x hash", "en", "s", 1L), // two occurrences
      (1L, "join hash", "en", "s", 1L),                  // reversed → none
      (2L, "hash x join", "en", "s", 1L))                // gap → none
    val out = TextQueries.phraseSearch(spark, dir)
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 2L)))
  }

  test("hll rollup: per-type exact twins + mergeable global, bounds gated") {
    val out = ExtendedQueries.hllRollup(spark, sf0001)
      .orderBy("event_type")
      .as[(String, Long, Boolean)].collect()
    assert(out.length == 6) // 5 event types + ALL
    assert(out.forall(_._3)) // raise_error would have fired otherwise
    val exact = graft.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(out.find(_._1 == "ALL").get._2 == exact)
  }

  test("jsonl round trip: aggregates equal the direct parquet path") {
    val rt = SourceQueries.jsonlRoundtrip(spark, sf0001)
      .orderBy("source", "lang")
      .as[(String, String, Long, Long, Long, Long)].collect()
    val direct = graft.Tables.documents(spark, sf0001)
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"),
        sum(length($"text")).cast("long").as("total_text_len"),
        countDistinct(md5($"text")).as("n_uniq_texts"))
      .orderBy("source", "lang")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rt.nonEmpty && rt.toSeq == direct.toSeq)
  }

  test("csv round trip: aggregates equal the jsonl path (same contract)") {
    val csv = SourceQueries.csvRoundtrip(spark, sf0001)
      .orderBy("source", "lang")
      .as[(String, String, Long, Long, Long, Long)].collect()
    val jsonl = SourceQueries.jsonlRoundtrip(spark, sf0001)
      .orderBy("source", "lang")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(csv.nonEmpty && csv.toSeq == jsonl.toSeq)
  }

  test("gap fill: missing hour-type cells appear as explicit zeros") {
    val dir = eventsDir(
      (0L, mins(10), 1L, "view", 0.0),   // hour 0
      (1L, mins(130), 1L, "click", 0.0)) // hour 2 — hour 1 is a gap
    val out = EventQueries.gapFillHourly(spark, dir)
      .orderBy("hour_start", "event_type")
      .select($"event_type", $"n_events").as[(String, Long)].collect()
    // 3 hours × 2 types = 6 cells, two of them ones
    assert(out.toSeq == Seq(
      ("click", 0L), ("view", 1L),
      ("click", 0L), ("view", 0L),
      ("click", 1L), ("view", 0L)))
  }

  test("session_window boundary: an exact 30:00 gap MERGES (window end is " +
    "treated as inclusive by the merge rule), matching the oracle's gap > " +
    "30min split condition") {
    // ADVICE r4: pin the boundary semantics instead of relying on the
    // corpus never hitting it. Three users:
    //  u1: gap = exactly 30:00           → one session iff Spark merges
    //      adjacent [t, t+gap) windows that touch at the boundary
    //  u2: gap = 30:00 − 1 us            → unambiguously one session
    //  u3: gap = 30:00 + 1 us            → unambiguously two sessions
    val gapNs = 30L * 60 * 1000000000L
    val dir = eventsDir(
      (0L, mins(10), 1L, "view", 0.0),
      (1L, mins(10) + gapNs, 1L, "click", 0.0),
      (2L, mins(10), 2L, "view", 0.0),
      (3L, mins(10) + gapNs - 1000L, 2L, "click", 0.0),
      (4L, mins(10), 3L, "view", 0.0),
      (5L, mins(10) + gapNs + 1000L, 3L, "click", 0.0))
    val out = EventQueries.sessionWindowFn(spark, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"),
        max($"n_events").as("max_events"))
      .orderBy("user_id")
      .select($"user_id", $"n_sessions", $"max_events")
      .as[(Long, Long, Long)].collect()
    // Spark merges sessions when the next event's start <= current end
    // (session_window end = last_ts + gap, and the exact-boundary event
    // starts AT that end) — the same contract as the oracle CTE's
    // "new session only when gap > 30 min". If a Spark upgrade ever flips
    // this to a strict <, u1 breaks here before the gate does.
    assert(out.toSeq == Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 2L, 1L)))
  }

  test("mad: hand-computed median and deviation") {
    // n_chars 10, 20, 100 → median 20; |x−20| = 10, 0, 80 → MAD 10
    val dir = docsDir(
      (0L, "t", "en", "s", 10L), (1L, "t", "en", "s", 20L),
      (2L, "t", "en", "s", 100L))
    val out = ExtendedQueries.madStats(spark, dir)
      .as[(Double, Double)].head()
    assert(out == ((20.0, 10.0)))
  }

  test("paragraph dedup: corpus-wide first occurrence survives, docs reassemble") {
    // paragraphs are 32-token windows; build exact-width paragraphs so the
    // expected segmentation is unambiguous
    def para(tag: String): String = (1 to 32).map(i => s"$tag$i").mkString(" ")
    val (p1, p2, p3) = (para("x"), para("y"), para("z"))
    val tail8 = (1 to 8).map(i => s"t$i").mkString(" ") // partial final window
    val dir = docsDir(
      (1L, s"$p1 $p2", "en", "web", 1L),      // first occurrence of p1, p2
      (2L, s"$p1 $p3", "en", "web", 1L),      // p1 is a dup here → dropped
      (3L, p1, "en", "web", 1L),              // everything dropped
      (4L, s"$p2 $tail8", "en", "web", 1L))   // p2 dup + unique 8-token tail
    val out = TextQueries.paragraphDedup(spark, dir)
      .orderBy("doc_id")
      .select($"doc_id", $"n_paras", $"n_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, s"$p1 $p2"),
      (2L, 2L, 1L, p3),
      (3L, 1L, 0L, ""),
      (4L, 2L, 1L, tail8)))
  }

  test("paragraph dedup: equals a reference recomputation on seeded random docs") {
    // docs are concatenations of shared 32-token templates plus a random
    // tail, so cross-document duplicate paragraphs are guaranteed and the
    // partial-final-window path is exercised
    val rnd = new scala.util.Random(42)
    val templates = Array.tabulate(8)(t => (1 to 32).map(i => s"w${t}_$i"))
    val docs = (1L to 30L).map { id =>
      val picks = Seq.fill(1 + rnd.nextInt(3))(templates(rnd.nextInt(8))).flatten
      val tail = (1 to rnd.nextInt(20)).map(i => s"tail_${id}_$i")
      (id, (picks ++ tail).mkString(" "), "en", "web", 1L)
    }
    val dir = docsDir(docs: _*)
    // reference: same segmentation + corpus-wide first occurrence, in Scala
    val paras = docs.flatMap { case (id, text, _, _, _) =>
      text.split("\\s+").filter(_.nonEmpty).grouped(32).zipWithIndex
        .map { case (chunk, i) => (id, i + 1, chunk.mkString(" ")) }.toSeq
    }
    val firstOf = paras.groupBy(_._3).map { case (t, occ) =>
      (t, occ.map(o => (o._1, o._2)).min)
    }
    val expected = paras.groupBy(_._1).map { case (id, ps) =>
      val kept = ps.sortBy(_._2).filter(p => firstOf(p._3) == ((p._1, p._2)))
      (id, ps.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
    }.toSeq.sortBy(_._1)
    val got = TextQueries.paragraphDedup(spark, dir).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == expected)
  }

  test("token-budget mix: every source stays within budget; order is stable") {
    val out = PipelineQueries.tokenBudgetMix(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, nDocs, nToks) =>
      assert(nDocs > 0 && nToks <= 400L, s"$src kept $nToks tokens (> 400)")
    }
    // determinism: a re-run admits the identical selection
    val again = PipelineQueries.tokenBudgetMix(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("prefix-filter similarity join: equals brute-force all-pairs Jaccard") {
    val out = DedupQueries.prefixFilterJoin(spark, sf0001)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect()
    // brute force: every pair sharing ANY shingle (no prefix filter), exact
    // Jaccard, same integer threshold — proves the filter lost nothing
    val sh = graft.Tables.documents(spark, sf0001)
      .select($"doc_id",
        explode(graft.operators.Dedup.wordShingles($"text", 3)).as("s"))
      .distinct()
    val sz = sh.groupBy("doc_id").count()
    val brute = sh.toDF("doc_a", "s").join(sh.toDF("doc_b", "s"), "s")
      .filter($"doc_a" < $"doc_b")
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
      .join(sz.toDF("doc_a", "sa"), "doc_a")
      .join(sz.toDF("doc_b", "sb"), "doc_b")
      .filter($"c" * 13 >= ($"sa" + $"sb") * 3)
      .select($"doc_a", $"doc_b",
        ($"c".cast("double") / ($"sa" + $"sb" - $"c").cast("double")).as("jaccard"))
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect()
    assert(out.nonEmpty && out.toSeq == brute.toSeq)
    spark.catalog.clearCache() // prefixFilterJoin caches its shingle frame
  }

  test("q223 rolling WAU sweep-line equals the brute-force windowed distinct") {
    val dir = "/root/testdata/sf0.001"
    val got = EventQueries.rollingDistinctWau(spark, dir)
      .as[(String, java.sql.Date, Long)].collect().toSet
    // brute force straight off the definition: distinct users with any
    // activity in [day-6, day], per type, over the same calendar spine
    val days = graft.Tables.events(spark, dir)
      .select($"event_type", $"user_id", to_date($"ts").as("d")).distinct()
    val spine = days.select($"event_type").distinct()
      .crossJoin(days.agg(min($"d").as("lo"), max($"d").as("hi")))
      .select($"event_type",
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val brute = spine.alias("s")
      .join(days.alias("a"),
        col("a.event_type") === col("s.event_type") &&
          col("a.d") >= date_sub(col("s.day"), 6) &&
          col("a.d") <= col("s.day"),
        "left")
      .groupBy(col("s.event_type").as("event_type"), col("s.day").as("day"))
      .agg(countDistinct(col("a.user_id")).as("wau"))
      .as[(String, java.sql.Date, Long)].collect().toSet
    assert(got == brute)
    // a WAU curve that never moves is a broken fixture, not a pass
    assert(got.map(_._3).size > 1, "constant curve — segments never break")
  }
}
