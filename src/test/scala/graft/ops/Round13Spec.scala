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
}
