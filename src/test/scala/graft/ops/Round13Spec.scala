package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force equivalence proofs for the round-13 gates (q330–q335):
  * each distributed result is recomputed in plain Scala from the
  * collected sf0.001 inputs — an implementation-independent second
  * derivation, the Round11eSpec/Round12Spec convention. Where the engine
  * shuffles on an md5 digest (q332), the brute force groups the RAW
  * strings, so digest collisions would be caught here, not just
  * engine/oracle agreement.
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def levenshtein(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("q330: doubled-midrank U equals the sort-and-rank brute force") {
    val per = graft.Tables.events(spark, sf0001)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    val armed = per.map { case (uid, n) =>
      val isA = "0123456789abcdef".indexOf(md5hex(s"mw:$uid").charAt(0)) < 8
      (n, isA)
    }
    // classic formulation: sort all values, doubled midrank of position
    // range [i, j] is (i + j + 1) for 0-based i..j-1 occupied by the tie
    // group — i.e. 2·midrank = 2·(#below) + t + 1
    val sorted = armed.map(_._1).sorted
    val firstIdx = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min, xs.length) }
    val nA = armed.count(_._2).toLong
    val nB = armed.size - nA
    val twoRA = armed.filter(_._2).map { case (v, _) =>
      val (lo, t) = firstIdx(v); 2L * lo + t + 1L
    }.sum
    val twoUA = twoRA - nA * (nA + 1)
    val tieCubic = firstIdx.values.map { case (_, t) =>
      t.toLong * (t - 1L) * (t + 1L)
    }.sum
    val got = EventQueries.mannWhitney(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toVector
    assert(got == Vector((nA, nB, twoRA, twoUA, 2 * nA * nB - twoUA, tieCubic)))
  }

  test("q331: KMV estimate equals the sort-all-hashes brute force") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"text").as[(String, String)].collect()
    val expect = docs.groupBy(_._1).map { case (src, rows) =>
      val hs = rows.map(r =>
        java.lang.Long.parseLong(md5hex(r._2).substring(0, 12), 16))
        .distinct.sorted
      val nExact = hs.length.toLong
      val hK = if (hs.length >= 64) Some(hs(63)) else None
      val est = hK.map(h => 63L * (1L << 48) / h).getOrElse(nExact)
      val errBp = if (nExact > 0) math.abs(est - nExact) * 10000 / nExact else 0L
      src -> ((nExact, hK, est, errBp))
    }
    val got = ExtendedQueries.kmvDistinct(spark, sf0001)
      .as[(String, Long, Option[Long], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect)
  }

  test("q332: span census equals the raw-string window brute force") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val wins = docs.flatMap { case (id, src, text) =>
      (0 to text.length - 40 by 10).map(p => (id, src, p.toLong,
        text.substring(p, p + 40)))
    }
    val dup = wins.groupBy(_._4).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val spans = wins.filter(w => dup.contains(w._4))
      .groupBy(w => (w._1, w._2)).toSeq.flatMap { case ((id, src), ws) =>
        val ps = ws.map(_._3).sorted
        val islands = ps.foldLeft(Vector.empty[Vector[Long]]) { (acc, p) =>
          if (acc.nonEmpty && p - acc.last.last <= 40) acc.init :+ (acc.last :+ p)
          else acc :+ Vector(p)
        }
        islands.map(is => (src, is.last - is.head + 40, is.size.toLong))
      }
    val expect = spans.groupBy(_._1).map { case (src, xs) =>
      val docsAffected = wins.filter(w => dup.contains(w._4) && w._2 == src)
        .map(_._1).distinct.size.toLong
      src -> ((docsAffected, xs.map(_._3).sum, xs.size.toLong,
        xs.map(_._2).sum, xs.map(_._2).max))
    }
    val got = DedupQueries.dupSpans(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == expect)
  }

  test("q333: coverage census equals the interval-merge brute force") {
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", $"event_id", unix_micros($"ts").as("t"))
      .as[(Long, String, Long, Long)].collect()
    val sessions = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap {
      case ((uid, _), es) =>
        val sorted = es.sortBy(e => (e._4, e._3)).map(_._4)
        val groups = sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
          if (acc.nonEmpty && t - acc.last.last <= 1800000000L)
            acc.init :+ (acc.last :+ t)
          else acc :+ Vector(t)
        }
        groups.map(g => (uid, g.head, g.last))
    }
    val perUser = sessions.groupBy(_._1).map { case (uid, ss) =>
      // sweep in (start, end) order with an explicit running max-end —
      // the gate's island rule verbatim
      val ivs = ss.map(s => (s._2, s._3)).sortBy(identity)
      var maxEnd = Long.MinValue
      val islands = Vector.newBuilder[(Long, Long)]
      var cur: Option[(Long, Long)] = None
      ivs.foreach { case (st, en) =>
        cur match {
          case Some((f, _)) if st <= maxEnd =>
            maxEnd = math.max(maxEnd, en); cur = Some((f, maxEnd))
          case Some(done) =>
            islands += done; maxEnd = en; cur = Some((st, en))
          case None => maxEnd = en; cur = Some((st, en))
        }
      }
      cur.foreach(islands += _)
      val isl = islands.result()
      uid -> ((isl.size.toLong, isl.map(i => i._2 - i._1).sum))
    }
    val expect = perUser.values.groupBy { case (_, cov) =>
      java.lang.Long.toBinaryString(1L + cov / 1000000L).length - 1
    }.map { case (bucket, xs) =>
      bucket -> ((xs.size.toLong, xs.map(_._1).sum, xs.map(_._2).sum,
        xs.map(_._2).max))
    }
    val got = EventQueries.intervalUnionCoverage(spark, sf0001)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect)
  }

  test("q334: blocking census equals the per-name key brute force") {
    val names = graft.Tables.customer(spark, sf0001)
      .select($"c_name").as[String].collect().distinct
    def keys(n: String): Set[String] =
      (Set(n) ++ n.indices.map(i => n.substring(0, i) + n.substring(i + 1)))
    val nk = names.flatMap(n => keys(n).map(k => (k, n)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct.size.toLong }
    val nKeys = nk.size.toLong
    val nBlocksGe2 = nk.values.count(_ >= 2).toLong
    val maxBlock = nk.values.max
    val nCand = nk.values.map(c => c * (c - 1) / 2).sum
    val verified = (for {
      (k, _) <- nk.toSeq
      block = names.filter(n => keys(n).contains(k)).sorted
      i <- block.indices; j <- (i + 1) until block.length
      if levenshtein(block(i), block(j)) <= 1
    } yield (block(i), block(j))).distinct.size.toLong
    val nNames = names.length.toLong
    val totalPairs = nNames * (nNames - 1) / 2
    val rr = if (nNames >= 2) 10000L - nCand * 10000L / totalPairs else 10000L
    val pq = if (nCand > 0) verified * 10000L / nCand else 0L
    val got = PipelineQueries.blockingEfficiency(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toVector
    assert(got == Vector((nNames, nKeys, nBlocksGe2, maxBlock, nCand,
      verified, rr, pq)))
  }

  test("q336: l/tv census equals the distribution brute force") {
    val rows = graft.Tables.orders(spark, sf0001)
      .select($"o_orderpriority",
        date_trunc("month", $"o_orderdate").cast("date").cast("string"),
        $"o_orderstatus")
      .as[(String, String, String)].collect()
    val n = rows.length.toLong
    val cntS = rows.groupBy(_._3).map { case (s, xs) => s -> xs.length.toLong }
    val perGroup = rows.groupBy(r => (r._1, r._2)).map { case (_, xs) =>
      val nG = xs.length.toLong
      val cntGs = xs.groupBy(_._3).map { case (s, ys) => s -> ys.length.toLong }
      val l = cntGs.size.toLong
      val sumDev = cntS.map { case (s, cs) =>
        math.abs(cntGs.getOrElse(s, 0L) * n - cs * nG)
      }.sum
      (l, nG, sumDev * 10000L / (2L * nG * n))
    }
    val expect = perGroup.groupBy(_._1).map { case (l, xs) =>
      l -> ((xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).max))
    }
    val got = PipelineQueries.lDiversityAudit(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expect)
  }

  test("q337: layout zones equal the shard-assignment brute force") {
    val ids = graft.Tables.documents(spark, sf0001)
      .select($"doc_id").as[Long].collect()
    val (gLo, gHi) = (ids.min, ids.max)
    val width = (gHi - gLo) / 16 + 1
    def census(assign: Long => Long) = {
      val zones = ids.groupBy(assign).map { case (sh, xs) =>
        (sh, xs.min, xs.max, xs.length.toLong)
      }.toSeq
      val overlaps = zones.map { case (sh, lo, hi, _) =>
        zones.count { case (sh2, lo2, hi2, _) =>
          sh2 != sh && lo <= hi2 && lo2 <= hi
        }.toLong
      }
      (zones.size.toLong, ids.length.toLong, overlaps.sum / 2, overlaps.max,
        zones.map(z => z._3 - z._2 + 1).sum * 100 / (gHi - gLo + 1))
    }
    val expect = Map(
      "hash" -> census(id =>
        "0123456789abcdef".indexOf(md5hex(s"layout:$id").charAt(0)).toLong),
      "range" -> census(id => (id - gLo) / width))
    val got = SourceQueries.layoutOverlapAudit(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == expect)
  }

  test("q338: centroid drift equals the per-dim integer brute force") {
    val src = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .filter(v => src.contains(v._1))
      .map { case (id, e) =>
        (src(id), e.map(x => math.floor(x.toDouble * 1000000.0).toLong))
      }
    val dims = vecs.head._2.length
    def floorDivOff(s: Long, n: Long): Long = (s + 2000000L * n) / n - 2000000L
    val perSrc = vecs.groupBy(_._1)
    val gSum = (0 until dims).map(d => vecs.map(_._2(d)).sum)
    val nTot = vecs.length.toLong
    val gC = gSum.map(s => floorDivOff(s, nTot))
    val expect = perSrc.map { case (s, vs) =>
      val n = vs.length.toLong
      val c = (0 until dims).map(d => floorDivOff(vs.map(_._2(d)).sum, n))
      val devs = c.zip(gC).map { case (a, b) => a - b }
      s -> ((n, devs.map(x => x * x).sum, devs.map(math.abs).max))
    }
    val got = AnnQueries.centroidDrift(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expect)
  }

  test("q335: bucket clustering equals the adjacency-set brute force") {
    val items = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect().distinct
    val edges = items.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    // per-vertex triangle count: closed neighbor pairs at v
    val triAt = adj.map { case (v, ns) =>
      val s = ns.toSeq.sorted
      v -> (for (i <- s.indices; j <- (i + 1) until s.length
        if edges.contains((math.min(s(i), s(j)), math.max(s(i), s(j)))))
        yield 1L).sum
    }
    val expect = adj.keys.toSeq.map { v =>
      val deg = adj(v).size.toLong
      (java.lang.Long.toBinaryString(deg).length - 1, deg, triAt(v))
    }.groupBy(_._1).map { case (b, xs) =>
      val sp = xs.map(x => x._2 * (x._2 - 1)).sum
      b -> ((xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum, sp,
        if (sp > 0) 2L * xs.map(_._3).sum * 10000L / sp else 0L))
    }
    val got = GraphQueries.localClustering(spark, sf0001)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == expect)
  }

  private def toks(text: String): Vector[String] =
    text.split("\\s+").filter(_.nonEmpty).toVector

  /** Positional shingles with the engine's short-doc rule: one whole-doc
    * shingle when fewer than n tokens. */
  private def posShingles(tk: Vector[String], n: Int): Vector[String] =
    if (tk.length >= n) tk.sliding(n).map(_.mkString(" ")).toVector
    else Vector(tk.mkString(" "))

  test("q339: winnowing census equals the sliding-window brute force") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expect = docs.map { case (id, text) =>
      val sh = posShingles(toks(text), 5)
      val keys = sh.zipWithIndex.map { case (s, p) =>
        md5hex(s).substring(0, 8) +
          ("%07d".format(1048576 - p))
      }
      val n = sh.length
      val ends = math.min(3, n - 1) until n
      val winmins = ends.map(e => keys.slice(math.max(0, e - 3), e + 1).min)
      id -> ((n.toLong, ends.size.toLong,
        winmins.distinct.size.toLong,
        winmins.map(_.substring(0, 8)).distinct.size.toLong,
        10000L * winmins.distinct.size / ends.size))
    }.toMap
    val got = DedupQueries.winnowing(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == expect)
  }

  test("q340: CMS estimates equal the hash-replay brute force and are one-sided") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"text").as[String].collect()
    val counts = docs.flatMap(toks).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    def bucket(r: Int, tok: String) = md5hex(s"$r:$tok").substring(0, 2)
    val counters = (0 until 4).flatMap { r =>
      counts.toSeq.groupBy { case (t, _) => (r, bucket(r, t)) }
        .map { case (k, xs) => k -> xs.map(_._2).sum }
    }.toMap
    val probes = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
    val expect = probes.map { case (t, c) =>
      val est = (0 until 4).map(r => counters((r, bucket(r, t)))).min
      t -> ((c, est, est - c, 10000L * (est - c) / c))
    }.toMap
    val got = TextQueries.countMinSketch(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect)
    // CMS is one-sided by construction: estimate >= exact, always
    assert(got.values.forall { case (c, est, _, _) => est >= c })
  }

  test("q341: edge-Jaccard census equals the adjacency-set brute force") {
    val items = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect().distinct
    val edges = items.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val expect = edges.toSeq.map { case (u, v) =>
      val common = (adj(u) & adj(v)).size.toLong
      val den = adj(u).size + adj(v).size - 2L - common
      val bp = if (den > 0) 10000L * common / den else 0L
      (bp / 1000, common, bp)
    }.groupBy(_._1).map { case (b, xs) =>
      b.toInt -> ((xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).max))
    }
    val got = GraphQueries.edgeJaccard(spark, sf0001)
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expect)
  }

  test("q342: greedy rounds equal the set-cover brute force") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"text").as[(String, String)].collect()
    val bySource = docs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.flatMap(d => posShingles(toks(d._2), 3)).toSet
    }
    var covered = Set.empty[String]
    val expect = Vector.newBuilder[(Int, String, Long, Long)]
    var cum = 0L
    var round = 1
    var continue = true
    while (round <= 3 && continue) {
      val gains = bySource.map { case (s, sh) => s -> (sh -- covered).size }
        .filter(_._2 > 0)
      if (gains.isEmpty) continue = false
      else {
        val (src, g) = gains.toSeq.minBy { case (s, n) => (-n, s) }
        cum += g
        expect += ((round, src, g.toLong, cum))
        covered ++= bySource(src)
        round += 1
      }
    }
    val got = PipelineQueries.greedySetCover(spark, sf0001)
      .as[(Int, String, Long, Long)].collect().toVector.sortBy(_._1)
    assert(got == expect.result())
  }

  test("q343: Haar levels equal the pairwise brute force and conserve mass") {
    val os = graft.Tables.orders(spark, sf0001)
      .selectExpr("CAST(o_orderdate AS STRING)", "o_totalprice")
      .as[(String, Double)].collect()
      .map { case (d, p) => (java.time.LocalDate.parse(d.take(10)), p) }
    val d0 = os.map(_._1.toEpochDay).min
    val daily = os.groupBy(_._1.toEpochDay - d0)
      .map { case (idx, xs) =>
        val cents = xs.map(r => BigDecimal(r._2).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact).sum
        idx -> cents / 10000L
      }
    var cur = daily
    val expect = (1 to 3).map { l =>
      val lev = cur.groupBy(_._1 / 2).map { case (j, xs) =>
        j -> ((xs.values.sum,
          xs.map { case (i, v) => if (i % 2 == 0) v else -v }.sum))
      }
      cur = lev.map { case (j, (v, _)) => j -> v }
      (l, lev.size.toLong, lev.values.map(_._1).sum,
        lev.values.map(d => d._2 * d._2).sum)
    }.toVector
    val got = ExtendedQueries.haarDecomposition(spark, sf0001)
      .as[(Int, Long, Long, Long)].collect().toVector.sortBy(_._1)
    assert(got == expect)
    // the unnormalized transform conserves the series total at every level
    assert(got.map(_._3).distinct.size == 1)
  }

  test("q344: rules equal the lattice brute force; confidence is directional") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val brand = graft.Tables.part(spark, sf0001)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val ob = li.map { case (o, p) => (o, brand(p)) }.distinct
    val nb = ob.map(_._1).distinct.length.toLong
    val itemN = ob.groupBy(_._2).map { case (i, xs) => i -> xs.length.toLong }
    val freq = itemN.filter { case (_, n) => n * 20 >= nb }
    val byBasket = ob.filter(x => freq.contains(x._2)).groupBy(_._1)
    val pairN = byBasket.values.toSeq.flatMap { xs =>
      val is = xs.map(_._2).distinct.sorted
      for (i <- is.indices; j <- (i + 1) until is.length) yield (is(i), is(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val expect = pairN.toSeq
      .filter { case (_, n) => 10000L * n / nb >= 275 }
      .flatMap { case ((a, b), n) =>
        def assoc(na: Long, ncons: Long) =
          if (n * nb > na * ncons) "positive"
          else if (n * nb < na * ncons) "negative" else "independent"
        Seq((a, b, freq(a), n, 10000L * n / freq(a), assoc(freq(a), freq(b))),
          (b, a, freq(b), n, 10000L * n / freq(b), assoc(freq(b), freq(a))))
      }.toSet
    val got = ExtendedQueries.associationRules(spark, sf0001)
      .as[(String, String, Long, Long, Long, String)].collect().toSet
    assert(got == expect)
  }

  test("q345: ladder equals the 4-level census brute force; chosen is first-meets-k") {
    val os = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "CAST(o_orderdate AS STRING)", "o_totalprice")
      .as[(Long, String, Double)].collect()
    val cn = graft.Tables.customer(spark, sf0001)
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    val nat = graft.Tables.nation(spark, sf0001)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val reg = graft.Tables.region(spark, sf0001)
      .select($"r_regionkey", $"r_name").as[(Long, String)].collect().toMap
    val rows = os.map { case (ck, d, p) =>
      val ld = java.time.LocalDate.parse(d.take(10))
      val (nn, rk) = nat(cn(ck))
      val cents = BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
      val q = (ld.getMonthValue + 2) / 3
      (nn, reg(rk), ld.getYear * 100 + ld.getMonthValue,
        ld.getYear * 10 + q, ld.getYear, cents)
    }
    val levels = Seq[((String, String, Int, Int, Int, Long)) => String](
      r => s"${r._1}|${r._3}|${r._6 / 100000}",
      r => s"${r._1}|${r._4}|${r._6 / 500000}",
      r => s"${r._1}|${r._5}|${r._6 / 2500000}",
      r => s"${r._2}|${r._5}|${r._6 / 2500000}")
    val pl = levels.zipWithIndex.map { case (f, l) =>
      val cls = rows.groupBy(f).map(_._2.length.toLong)
      (l, cls.size.toLong, cls.min, cls.min >= 5L)
    }
    val chosen = pl.find(_._4).map(_._1)
    val expect = pl.map { case (l, nc, mn, mk) =>
      (l, nc, mn, mk, chosen.contains(l))
    }.toSet
    val got = PipelineQueries.generalizationLadder(spark, sf0001)
      .as[(Int, Long, Long, Boolean, Boolean)].collect().toSet
    assert(got == expect)
  }

  test("q347: BM25 top-10 equals the integer-arithmetic brute force") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val perDoc = docs.map { case (id, tx) => id -> toks(tx) }
    val n = perDoc.length.toLong
    val dl = perDoc.map { case (id, tk) => id -> tk.length.toLong }.toMap
    val avgdl = dl.values.sum / n
    val tf = perDoc.flatMap { case (id, tk) => tk.map(t => (id, t)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val dfm = tf.keys.toSeq.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val c = perDoc.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val q = c.toSeq.filter { case (t, _) => dfm(t) * 4 <= n }
      .sortBy { case (t, cc) => (-cc, t) }.take(4).map(_._1)
    def log2(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val scores = perDoc.flatMap { case (id, _) =>
      val terms = q.filter(t => tf.contains((id, t)))
      if (terms.isEmpty) None
      else Some((id, terms.length.toLong, terms.map { t =>
        val idf = log2(n / dfm(t)).toLong
        val f = tf((id, t))
        10000L * idf * 44 * f * avgdl / (20 * f * avgdl + 6 * avgdl + 18 * dl(id))
      }.sum))
    }
    val expect = scores.sortBy { case (id, _, s) => (-s, id) }.take(10).toSet
    val got = TextQueries.bm25Retrieval(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("q348: concordance census equals the all-pairs brute force") {
    val os = graft.Tables.orders(spark, sf0001)
      .select($"o_custkey", $"o_totalprice").as[(Long, Double)].collect()
    val cn = graft.Tables.customer(spark, sf0001)
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    val nat = graft.Tables.nation(spark, sf0001)
      .select($"n_nationkey", $"n_name").as[(Long, String)].collect().toMap
    val per = os.map { case (ck, p) =>
      (nat(cn(ck)), BigDecimal(p).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
    }.groupBy(_._1).map { case (nm, xs) =>
      (nm, xs.map(_._2).sum, xs.length.toLong)
    }.toVector
    def rank(key: ((String, Long, Long)) => Long) =
      per.map { x =>
        x._1 -> (1L + per.count(y => key(y) > key(x) ||
          (key(y) == key(x) && y._1 < x._1)))
      }.toMap
    val r1 = rank(_._2); val r2 = rank(_._3)
    val pairs = for (a <- per; b <- per if a._1 < b._1) yield (a, b)
    val conc = pairs.count { case (a, b) =>
      (a._2 > b._2 && a._3 > b._3) || (a._2 < b._2 && a._3 < b._3) }.toLong
    val disc = pairs.count { case (a, b) =>
      (a._2 > b._2 && a._3 < b._3) || (a._2 < b._2 && a._3 > b._3) }.toLong
    val ni = per.length.toLong
    val fr = per.map(x => math.abs(r1(x._1) - r2(x._1))).sum
    val expect = (ni, conc, disc, ni * (ni - 1) / 2 - conc - disc,
      if (conc + disc > 0) 10000L * conc / (conc + disc) else 0L, fr)
    val got = ExtendedQueries.rankAgreement(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(expect))
  }

  test("q349: b-bit estimates clamp at agree<6 and match exact-set replay") {
    import org.apache.spark.sql.Row
    val got = DedupQueries.bbitMinhash(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { case Row(_, _, agree: Long, est: Long, exact: Long, err: Long) =>
      if (agree < 6) assert(est == 0L)
      else assert(est == (2 * agree - 12) * 10000 / 12)
      assert(err == math.abs(est - exact))
      assert(exact >= 0L && exact <= 10000L)
    }
  }

  test("q350: risk ratios equal the contingency brute force") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_returnflag").as[(Long, String)].collect()
    val brand = graft.Tables.part(spark, sf0001)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val rows = li.map { case (pk, rf) => (brand(pk), rf == "R") }
    val tAll = rows.length.toLong
    val rAll = rows.count(_._2).toLong
    val expect = rows.groupBy(_._1).map { case (b, xs) =>
      val t = xs.length.toLong; val a = xs.count(_._2).toLong
      val u = tAll - t; val cc = rAll - a
      val rr = if (u > 0 && cc > 0 && t > 0) 10000L * a * u / (t * cc) else 0L
      val dir = if (a * u > cc * t) "over"
        else if (a * u < cc * t) "under" else "neutral"
      b -> ((t, a, rr, dir))
    }
    val got = ExtendedQueries.riskRatioExplanation(spark, sf0001)
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect)
  }

  test("q351: butterfly counts equal the combinatorial brute force") {
    val ut = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type").as[(Long, String)].collect()
      .distinct.toVector
    val wedges = ut.groupBy(_._1).values
      .map(xs => { val d = xs.length.toLong; d * (d - 1) / 2 }).sum
    val tp = ut.groupBy(_._1).values.toSeq.flatMap { xs =>
      val ts = xs.map(_._2).sorted
      for (i <- ts.indices; j <- (i + 1) until ts.length) yield (ts(i), ts(j))
    }.groupBy(identity).map(_._2.length.toLong)
    val expect = (ut.map(_._1).distinct.size.toLong,
      ut.map(_._2).distinct.size.toLong, ut.size.toLong, wedges,
      tp.size.toLong, tp.max, tp.map(w => w * (w - 1) / 2).sum)
    val got = EventQueries.butterflyCensus(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(expect))
  }

  test("q352: window census equals the closed-form waveform brute force") {
    val ids = graft.Tables.documents(spark, sf0001)
      .select($"doc_id").as[Long].collect()
    val expect = ids.map { id =>
      val nSamp = (id % 97 + 16).toInt
      val seed = id % 251
      val ss = Array.tabulate(nSamp)(k => ((seed + 9973L * k) % 65536) - 32768)
      val wins = ss.grouped(16).toVector
      val es = wins.map(w => w.map(v => v * v).sum)
      id -> ((nSamp.toLong, wins.size.toLong,
        wins.count(_.map(math.abs).max < 8192L).toLong, es.max, es.sum))
    }.toMap
    val got = MultimodalQueries.audioEnergyWindows(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == expect)
  }

  /** Daily cents totals keyed by day index from the min order date. */
  private def dailyCents(unitDiv: Long): Map[Long, Long] = {
    val os = graft.Tables.orders(spark, sf0001)
      .selectExpr("CAST(o_orderdate AS STRING)", "o_totalprice")
      .as[(String, Double)].collect()
      .map { case (d, p) => (java.time.LocalDate.parse(d.take(10)), p) }
    val d0 = os.map(_._1.toEpochDay).min
    os.groupBy(_._1.toEpochDay - d0).map { case (idx, xs) =>
      idx -> xs.map(r => BigDecimal(r._2).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact).sum / unitDiv
    }
  }

  test("q353: SAX transitions equal the rank-quartile brute force") {
    val daily = dailyCents(10000L)
    val paa = daily.groupBy(_._1 / 8).map { case (s, xs) =>
      s -> xs.values.sum / 8
    }.toVector
    val n = paa.length.toLong
    val ranked = paa.sortBy { case (s, v) => (v, s) }.zipWithIndex
      .map { case ((s, _), i) => s -> ((i.toLong * 4) / n) }.toMap
    val expect = paa.map(_._1).flatMap { s =>
      ranked.get(s).zip(ranked.get(s + 1)).map { case (a, b) => (a, b) }
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val got = ExtendedQueries.saxSymbolization(spark, sf0001)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expect)
  }

  test("q354: grid clusters equal the BFS-over-cells brute force") {
    val vs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>)").as[Seq[Double]].collect()
    val cells = vs.map { v =>
      ((math.floor(v(0) * 1e6).toLong + 2000000) / 250000,
        (math.floor(v(1) * 1e6).toLong + 2000000) / 250000)
    }.groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val core = cells.filter(_._2 >= 8).keys.toSet
    // BFS components over 8-adjacency
    var remaining = core
    val clusters = Vector.newBuilder[Set[(Long, Long)]]
    while (remaining.nonEmpty) {
      var comp = Set(remaining.head)
      var frontier = comp
      while (frontier.nonEmpty) {
        val next = frontier.flatMap { case (x, y) =>
          for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0)
            yield (x + dx, y + dy)
        }.filter(c => remaining.contains(c) && !comp.contains(c))
        comp ++= next
        frontier = next
      }
      clusters += comp
      remaining --= comp
    }
    val cs = clusters.result()
    val sizes = cs.map(c => c.toSeq.map(cells).sum)
    val noise = cells.filterNot(kv => core.contains(kv._1)).values.sum
    val expect = (cs.length.toLong, core.size.toLong, sizes.sum,
      if (sizes.nonEmpty) sizes.max else 0L, noise)
    val got = AnnQueries.gridDensityClusters(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(expect))
  }

  test("q355: control-chart flags equal the cross-multiplied brute force") {
    val xs = dailyCents(1000000L).values.toVector
    val n = xs.length.toLong
    val s = xs.sum; val q = xs.map(x => x * x).sum
    val high = xs.count(x => { val d = n * x - s; d * d > 9 * (n * q - s * s) && d > 0 }).toLong
    val low = xs.count(x => { val d = n * x - s; d * d > 9 * (n * q - s * s) && d < 0 }).toLong
    val got = ExtendedQueries.controlChart(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((n, s / n, high, low)))
  }

  test("q356: fertility ratios equal the regex brute force") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"lang", $"text", $"n_chars".cast("long"))
      .as[(String, String, Long)].collect()
    val re = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val expect = docs.groupBy(_._1).map { case (lang, xs) =>
      val w = xs.map(d => toks(d._2).length.toLong).sum
      val p = xs.map(d => re.findAllIn(d._2).length.toLong).sum
      val ch = xs.map(_._3).sum
      lang -> ((xs.length.toLong, w, p, ch,
        if (w > 0) 10000L * p / w else 0L,
        if (p > 0) 10000L * ch / p else 0L))
    }
    val got = TextQueries.tokenizerFertility(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == expect)
  }

  test("q357: CSR shards equal the sorted-offsets brute force") {
    val items = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect().distinct
    val edges = items.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    val sorted = deg.toVector.sortBy(_._1)
    val n = sorted.length.toLong
    var cum = 0L
    val expect = sorted.zipWithIndex.map { case ((_, d), i) =>
      val off = cum; cum += d
      (i.toLong * 4 / n, d, off, cum)
    }.groupBy(_._1).map { case (sh, xs) =>
      sh -> ((xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).min,
        xs.map(_._4).max, xs.map(_._3).sum))
    }
    val got = GraphQueries.csrExport(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == expect)
  }

  test("q358: mapped sums equal the rank-lookup brute force") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"n_chars".cast("long"))
      .as[(Long, String, Long)].collect().toVector
    val n = docs.length.toLong
    val globalSorted = docs.sortBy(d => (d._3, d._1)).map(_._3)
    val expect = docs.groupBy(_._2).map { case (src, xs) =>
      val inSrc = xs.sortBy(d => (d._3, d._1)).zipWithIndex
      val ns = xs.length.toLong
      val mapped = inSrc.map { case (d, i) =>
        val gm = if (ns > 1) 1 + i.toLong * (n - 1) / (ns - 1) else (n + 1) / 2
        (d._3, globalSorted((gm - 1).toInt))
      }
      src -> ((ns, mapped.map(_._1).sum, mapped.map(_._2).sum,
        mapped.map(m => math.abs(m._1 - m._2)).max))
    }
    val got = PipelineQueries.quantileNormalization(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect)
  }

  test("q346: banded motif census equals the quadratic brute force") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_type", "unix_micros(ts)")
      .as[(Long, String, Long)].collect()
    val expect = ev.toVector.groupBy(_._1).toSeq.flatMap { case (uid, xs) =>
      for {
        a <- xs; b <- xs
        if b._3 > a._3 && b._3 - a._3 <= 3600000000L
      } yield ((a._2, b._2), uid)
    }.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.size.toLong, xs.map(_._2).distinct.size.toLong))
    }
    val got = EventQueries.temporalMotifs(spark, sf0001)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == expect)
  }
}
