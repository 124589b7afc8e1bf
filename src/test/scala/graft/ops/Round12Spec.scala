package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force equivalence proofs for the round-12 gates (q321–q326):
  * each distributed result is recomputed in plain Scala from the
  * collected sf0.001 inputs — an implementation-independent second
  * derivation, the Round11eSpec convention.
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private def docTokens(text: String): Vector[String] =
    text.split("\\s+").filter(_.nonEmpty).toVector

  private def shingles(toks: Vector[String], n: Int): Vector[String] =
    if (toks.size >= n) toks.sliding(n).map(_.mkString(" ")).toVector
    else Vector(toks.mkString(" "))

  test("q321: per-source census equals the per-doc brute force") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val perDoc = docs.map { case (_, source, text) =>
      val tk = docTokens(text)
      val g3 = shingles(tk, 3).groupBy(identity).map(_._2.size).max
      val g5 = shingles(tk, 5)
      val top3 = if (tk.nonEmpty) 10000L * 3 * g3 / tk.size else 0L
      val rep5 = if (g5.nonEmpty)
        10000L * (g5.size - g5.distinct.size) / g5.size else 0L
      (source, top3, rep5)
    }
    val expect = perDoc.groupBy(_._1).map { case (src, rows) =>
      src -> ((rows.length.toLong,
        rows.map(_._2).sum / rows.length,
        rows.map(_._3).sum / rows.length,
        rows.count(_._3 > 1500).toLong))
    }
    val got = TextQueries.gopherRepetition(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect)
  }

  test("q322: pair Jaccard equals brute-force 8-gram set algebra") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"text").as[(String, String)].collect()
    val sets = docs.groupBy(_._1).map { case (src, rows) =>
      src -> rows.flatMap(r => shingles(docTokens(r._2), 8)).toSet
    }
    val expect = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a < b
      inter = (sa & sb).size if inter > 0
    } yield (a, b) -> ((sa.size.toLong, sb.size.toLong, inter.toLong,
      10000L * inter / (sa.size + sb.size - inter)))).toMap
    val got = DedupQueries.contaminationMatrix(spark, sf0001)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got == expect)
  }

  test("q323: greedy k-center trajectory equals the plain-Scala replay") {
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id",
        transform($"embedding".cast("array<double>"),
          x => floor(x * lit(1000000.0)).cast("long")).as("v"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => (x - y) * (x - y) }.sum
    var centers = Vector(vecs.head)
    val expect = Vector.newBuilder[(Int, Long, Long)]
    (1 to 4).foreach { k =>
      val md = vecs.map { case (id, v) =>
        (id, v, centers.map(c => d2(v, c._2)).min)
      }
      expect += ((k, centers(k - 1)._1, md.map(_._3).max))
      if (k < 4) {
        val far = md.minBy { case (id, _, d) => (-d, id) }
        centers :+= ((far._1, far._2))
      }
    }
    val got = AnnQueries.kcenterCoreset(spark, sf0001)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toVector
    assert(got == expect.result(),
      s"trajectory drifted: $got vs ${expect.result()}")
    // the covering radius must be non-increasing as centers are added
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }

  test("q324: split day equals the brute-force prefix-sum arg-max") {
    val daily = graft.Tables.events(spark, sf0001)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, java.sql.Date, Long)].collect()
    val expect = daily.groupBy(_._1).flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._2.toString)
      val n = sorted.length.toLong
      if (n < 2) None else {
        val tot = sorted.map(_._3).sum
        val best = sorted.zipWithIndex.dropRight(1).map { case ((_, day, _), i) =>
          val t = i + 1L
          val s = sorted.take(i + 1).map(_._3).sum
          val l = 1000000L * s / t
          val r = 1000000L * (tot - s) / (n - t)
          (day, t, l, r, math.abs(l - r))
        }.minBy { case (day, _, _, _, gap) => (-gap, day.toString) }
        Some(et -> ((best._1.toString, best._2, n, best._3, best._4, best._5)))
      }
    }
    val got = EventQueries.changepointScan(spark, sf0001)
      .as[(String, java.sql.Date, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2.toString, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == expect)
  }

  test("q325: digit census equals the brute force; Benford table is sane") {
    val cents = graft.Tables.orders(spark, sf0001)
      .select(($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"))
      .as[Long].collect().filter(_ > 0)
    val hist = cents.map(_.toString.head.asDigit).groupBy(identity)
      .map { case (d, xs) => d -> xs.length.toLong }
    val benford = Map(1 -> 3010L, 2 -> 1760L, 3 -> 1249L, 4 -> 969L,
      5 -> 791L, 6 -> 669L, 7 -> 579L, 8 -> 511L, 9 -> 457L)
    val got = CoreQueries.benfordDigits(spark, sf0001)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(got.map(r => r._1 -> r._2).toMap == hist)
    got.foreach { case (d, n, obs, ben, dev) =>
      assert(obs == 10000L * n / cents.length)
      assert(ben == benford(d))
      assert(dev == math.abs(obs - ben))
    }
    // Benford reference masses are floor(log10(1+1/d)·10⁴) — re-derive
    // the literals (test-side only; the engine never computes a log)
    benford.foreach { case (d, bp) =>
      assert(math.floor(math.log10(1.0 + 1.0 / d) * 10000).toLong == bp)
    }
  }

  test("q327: ACF equals the plain-Scala replay (incl. negative lags' trunc div)") {
    val daily = graft.Tables.events(spark, sf0001)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, java.sql.Date, Long)].collect()
    val expect = daily.groupBy(_._1).flatMap { case (et, rows) =>
      val byDay = rows.map(r => r._2.toLocalDate -> r._3).toMap
      val d0 = byDay.keys.minBy(_.toEpochDay)
      val d1 = byDay.keys.maxBy(_.toEpochDay)
      val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => byDay.getOrElse(d, 0L)).toVector
      val n = xs.size.toLong
      val s = xs.sum
      val c = xs.map(x => n * x - s)
      val den = c.map(v => v * v).sum
      (1 to 7).map { l =>
        val num = c.dropRight(l).zip(c.drop(l)).map { case (a, b) => a * b }.sum
        (et, l) -> ((n, if (den > 0) 10000 * num / den else 0L))
      }
    }
    val got = EventQueries.autocorrelation(spark, sf0001)
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == expect.toMap)
    // sanity: some lag must be anti-correlated on this corpus or the
    // negative-numerator path went untested
    assert(got.values.exists(_._2 < 0),
      "no negative acf_bp at sf0.001 — pick a corpus slice that exercises it")
  }

  test("q328: fused top-10 equals the plain-Scala RRF replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val tokSets = docs.map { case (id, t) => id -> docTokens(t).toSet }.toMap
    val grid = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", graft.operators.Ann.gridQuantize($"embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    def ranks(scored: Seq[(Long, Double)]): Map[Long, Long] =
      scored.sortBy { case (id, s) => (-s, id) }.take(50)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expect = (0L until 5L).flatMap { q =>
      val lex = ranks(tokSets.keys.filter(_ != q).toSeq
        .map(id => id -> (tokSets(id) & tokSets(q)).size.toDouble)
        .filter(_._2 > 0))
      val vec = ranks(grid.keys.filter(_ != q).toSeq
        .map(id => id -> grid(id).zip(grid(q)).map { case (a, b) => a * b }.sum))
      val fused = (lex.keySet ++ vec.keySet).toSeq.map { id =>
        val rrf = lex.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L) +
          vec.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
        (id, lex.getOrElse(id, 0L), vec.getOrElse(id, 0L), rrf)
      }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10)
      fused.zipWithIndex.map { case ((id, rl, rv, rrf), i) =>
        (q, i + 1, id) -> ((rl, rv, rrf))
      }
    }.toMap
    val got = AnnQueries.rrfHybrid(spark, sf0001)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    assert(got == expect)
    // both legs must actually contribute to some fused winner
    assert(got.values.exists(v => v._1 > 0 && v._2 > 0),
      "no candidate ranked by BOTH legs — fusion untested")
  }

  test("q329: survivorship equals brute-force all-pairs linkage + union-find") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val cur = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      d(a.length)
    }
    val cust = graft.Tables.customer(spark, sf0001)
      .select($"c_name", ($"c_acctbal".cast("decimal(14,2)") * 100).cast("long"))
      .as[(String, Long)].collect()
    val names = cust.map(_._1).distinct.sorted
    // brute-force all-pairs distance-1 graph — independent of the
    // deletion-key blocking, so this ALSO re-proves blocking completeness
    val parent = scala.collection.mutable.Map(names.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- names.indices; j <- (i + 1) until names.length
         if lev(names(i), names(j)) <= 1) {
      val (a, b) = (find(names(i)), find(names(j)))
      if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
    }
    val comp = names.map(n => n -> find(n)).toMap
    val linked = comp.groupBy(_._2).filter(_._2.size >= 2)
    val expect = linked.map { case (entity, ms) =>
      val members = ms.keys.toSeq
      val golden = members.minBy(n => (-n.length, n))
      val rows = cust.filter(r => members.contains(r._1))
      entity -> ((golden, members.size.toLong, rows.length.toLong,
        rows.map(_._2).sum))
    }
    val got = PipelineQueries.survivorship(spark, sf0001)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect)
    assert(got.nonEmpty, "no merged entity at sf0.001 — linkage untested")
  }

  test("q326: differing buckets are exactly the drifted keys' buckets") {
    val keys = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey").as[Long].collect()
    val driftKeys = keys.filter(_ % 1000 == 7)
    val expectBuckets = driftKeys.map(_ % 64).toSet
    val got = SourceQueries.merkleReconcile(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == expectBuckets,
      "a drifted row's bucket digest failed to differ (xor collision " +
        "would be astronomically unlikely) or a clean bucket was flagged")
    // every flagged bucket's row-level diff finds exactly its drifted keys
    val perBucket = driftKeys.groupBy(_ % 64).view.mapValues(_.length.toLong)
    got.foreach { case (bucket, nRows, xorA, xorB, nChanged) =>
      assert(xorA != xorB)
      assert(nChanged == perBucket(bucket))
      assert(nRows == keys.count(_ % 64 == bucket))
    }
    assert(got.map(_._5).sum == driftKeys.length)
  }
}
