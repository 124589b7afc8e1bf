package graft.operators

import scala.annotation.tailrec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics via iterative histogram pruning — the
  * scale path for "exact quantiles at 100 TB", where a single
  * percentile/median aggregate is untenable (its state buffers the value
  * distribution: ~n distinct doubles per partition for continuous data).
  *
  * [[rankValues]] finds the r1-th and r2-th smallest values (1-based) by
  * repeatedly histogramming the candidate range (one `buckets`-row shuffle
  * per level) and narrowing to the bucket(s) covering the target ranks.
  * When the covering range holds ≤ [[MaxCollect]] rows it is resolved with
  * one bounded TakeOrdered; otherwise the range recurses — each level
  * divides the value range by `buckets`, so even a fully degenerate
  * distribution (all mass in one bucket) converges: the range shrinks
  * geometrically until double resolution separates the values or they are
  * all equal. Driver state is O(buckets) longs per level; nothing
  * data-sized ever reaches the driver.
  *
  * [[exactMedian]] / [[exactPercentile]] reproduce the interpolation rule
  * shared by Spark's `percentile`/`median` and DuckDB's `quantile_cont`:
  * rank = 1 + p·(n−1), linear interpolation between the two covering
  * values. For integral-valued columns and dyadic p the result is a single
  * exact double on any engine (the q54 rationale).
  */
object Stats {

  /** Rows the final TakeOrdered may gather; above this the range recurses. */
  private val MaxCollect = 1 << 16

  def exactMedian(df: DataFrame, valueCol: String, buckets: Int = 2048): Double =
    exactPercentile(df, valueCol, 0.5, buckets)

  /** Exact p-quantile (0 ≤ p ≤ 1) with linear interpolation. `maxCollect`
    * is exposed for tests to force the recursive narrowing on small data. */
  def exactPercentile(df: DataFrame, valueCol: String, p: Double,
      buckets: Int = 2048, maxCollect: Int = MaxCollect): Double =
    exactPercentiles(df, valueCol, Seq(p), buckets, maxCollect).head

  /** Exact quantiles for several p values, sharing the head statistics,
    * the cardinality probe, AND the first-level histogram across all of
    * them. Route choice: a cheap HLL probe picks between
    * (a) LOW-CARDINALITY — one `groupBy(value).count` pass resolves every
    * quantile from the (small) value distribution, the right algorithm
    * when the column holds few distinct values (integral quantities,
    * categories); and (b) CONTINUOUS — ONE shared histogram over
    * [min, max] locates every p's covering bucket(s), then only the
    * per-p tails narrow independently. The probe only selects the route;
    * both routes are exact.
    *
    * Null, NaN, and ±Infinity rows are EXCLUDED (nulls per SQL; the
    * non-finite values would poison the histogram arithmetic — min/NaN
    * makes the range NaN, ±Inf makes bucket widths infinite — and send
    * data-sized state to the driver. Callers that assign meaning to
    * non-finite values should clamp them to finite sentinels first). */
  def exactPercentiles(df: DataFrame, valueCol: String, ps: Seq[Double],
      buckets: Int = 2048, maxCollect: Int = MaxCollect): Seq[Double] = {
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"p must be in [0,1]: $ps")
    // The prune makes ≥3 passes over the projected values (head stats,
    // level-1 histogram, per-p tail resolves) — persist the single-column
    // projection for the prune's lifetime so each pass reads the cached
    // column, not the full source scan (q64 r3 regression: uncached, every
    // pass re-scanned lineitem). MEMORY_AND_DISK: a too-big cache spills
    // rather than recomputing.
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(finite(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try exactPercentilesOn(vals, ps, buckets, maxCollect)
    finally vals.unpersist(blocking = false)
  }

  private def exactPercentilesOn(vals: DataFrame, ps: Seq[Double],
      buckets: Int, maxCollect: Int): Seq[Double] = {
    val head = vals.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(lit(1)).as("n"), approx_count_distinct(col("v")).as("nd")).head()
    if (head.isNullAt(2) || head.getLong(2) == 0L) return ps.map(_ => Double.NaN)
    val (mn, mx, n) = (head.getDouble(0), head.getDouble(1), head.getLong(2))
    if (mn == mx) return ps.map(_ => mn)
    def ranks(p: Double): (Long, Long, Double) = {
      // 0-based fractional position, EXACTLY as Spark's percentile and
      // DuckDB's quantile_cont compute it — adding 1.0 before taking the
      // fraction can shift it by an ulp for non-dyadic p
      val pos = p * (n - 1)
      val lower = math.floor(pos)
      val r1 = lower.toLong + 1
      (r1, math.min(n, r1 + 1), pos - lower)
    }
    if (head.getLong(3) <= maxCollect / 2) {
      // low-cardinality: one distribution pass answers every quantile
      val dist = vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("v").asc).collect().map(r => (r.getDouble(0), r.getLong(1)))
      ps.map { p =>
        val (r1, r2, frac) = ranks(p)
        var cum = 0L; var a = Double.NaN; var b = Double.NaN
        for ((v, cnt) <- dist) {
          if (a.isNaN && cum + cnt >= r1) a = v
          if (b.isNaN && cum + cnt >= r2) b = v
          cum += cnt
        }
        if (frac == 0.0) a else a + (b - a) * frac
      }
    } else {
      // continuous: ONE level-1 histogram over [mn, mx] serves every p —
      // each p re-uses it to find its covering bucket(s), and only the
      // (bucket-sized) tails narrow per p
      val width = (mx - mn) / buckets
      if (width == 0.0 || width.isNaN) {
        // range below double resolution at the top level
        ps.map { p =>
          val (r1, r2, frac) = ranks(p)
          val (a, b) = rankValues(vals, r1, r2, mn, mx, buckets, maxCollect)
          if (frac == 0.0) a else a + (b - a) * frac
        }
      } else {
        val bucket = least(lit(buckets - 1),
          greatest(lit(0), floor((col("v") - mn) / width))).cast("int")
        val hist = vals.groupBy(bucket.as("b")).agg(count(lit(1)).as("cnt"))
          .orderBy("b").collect().map(r => (r.getInt(0), r.getLong(1)))
        ps.map { p =>
          val (r1, r2, frac) = ranks(p)
          var cum = 0L; var before = 0L; var bLo = -1; var bHi = -1
          for ((b, cnt) <- hist) {
            if (bLo < 0 && cum + cnt >= r1) { bLo = b; before = cum }
            if (bHi < 0 && cum + cnt >= r2) bHi = b
            cum += cnt
          }
          val (a, b) =
            if (bLo != bHi) {
              // straddle: r1 = max of bucket bLo, r2 = min of bucket bHi
              val r = vals.agg(
                max(when(bucket === bLo, col("v"))).as("a"),
                min(when(bucket === bHi, col("v"))).as("b")).head()
              (r.getDouble(0), r.getDouble(1))
            } else rankValues(vals.filter(bucket === bLo),
              r1 - before, r2 - before,
              mn + bLo * width, math.min(mx, mn + (bLo + 1) * width),
              buckets, maxCollect)
          if (frac == 0.0) a else a + (b - a) * frac
        }
      }
    }
  }

  /** Finite-value predicate: not null, not NaN, not ±Infinity. */
  private def finite(c: Column): Column =
    c.isNotNull && !isnan(c) &&
      c =!= lit(Double.PositiveInfinity) && c =!= lit(Double.NegativeInfinity)

  /** Exact per-group p-quantile for a SMALL number of HUGE groups — the
    * regime where both standard formulations break down: a per-group
    * `percentile`/`median` aggregate buffers each group's value
    * distribution in executor state, and a row_number window sorts every
    * group's full data. Here each level runs ONE histogram pass over all
    * active groups at once (per-group ranges ride in on a broadcast join),
    * the driver holds O(groups × buckets) longs, and groups narrow
    * independently — a group resolves as soon as its covering range holds
    * ≤ `maxCollect` rows.
    *
    * Like [[rankValues]], level-to-level membership is decided by the SAME
    * clamped bucket expression that counted the row, never by re-deriving a
    * value-range predicate — an FP division at a bucket boundary may
    * disagree with the real-arithmetic range, and a row that was counted
    * must stay in scope or ranks drift.
    *
    * For many small groups use an ordinary window/aggregate (q98); this
    * path is for the "20 sources, billions of rows each" shape.
    * Interpolation matches `percentile`/`quantile_cont` exactly. */
  def groupedPercentile(df: DataFrame, groupCol: String, valueCol: String,
      p: Double, buckets: Int = 1024, maxCollect: Int = 4096): Map[Any, Double] = {
    require(p >= 0.0 && p <= 1.0, s"p must be in [0,1]: $p")
    val spark = df.sparkSession
    // null/NaN/±Inf excluded, as in exactPercentiles (same rationale).
    // Persisted for the loop's lifetime: every level joins the (g, v)
    // projection against the broadcast ranges up to three times (tiny-range
    // resolve, histogram, bucket resolve/narrow) — without the cache each
    // pass would re-scan the source.
    val vals = df.select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(finite(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try groupedPercentileOn(vals, p, buckets, maxCollect)
    finally vals.unpersist(blocking = false)
  }

  private def groupedPercentileOn(vals: DataFrame, p: Double,
      buckets: Int, maxCollect: Int): Map[Any, Double] = {
    val spark = vals.sparkSession
    val gType = vals.schema("g").dataType
    final class St(var lo: Double, var hi: Double, var r1: Long, var r2: Long,
      val frac: Double)
    val state = scala.collection.mutable.LinkedHashMap.empty[Any, St]
    val result = scala.collection.mutable.Map.empty[Any, Double]
    vals.groupBy(col("g"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"), count(lit(1)).as("n"))
      .collect().foreach { r =>
        val (g, mn, mx, n) = (r.get(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
        val pos = p * (n - 1)
        val lower = math.floor(pos)
        val r1 = lower.toLong + 1
        if (mn == mx) result(g) = mn
        else state(g) = new St(mn, mx, r1, math.min(n, r1 + 1), pos - lower)
      }

    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
    def ranges(m: scala.collection.Map[Any, St]): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(m.toSeq.map { case (g, s) => Row(g, s.lo, s.hi) }: _*),
        StructType(Seq(StructField("g", gType), StructField("lo", DoubleType),
          StructField("hi", DoubleType))))
    // the clamped bucket of v within the group's current [lo, hi)
    def bucketCol: Column = least(lit(buckets - 1), greatest(lit(0),
      floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / buckets)))).cast("int")

    var cur = vals
    while (state.nonEmpty) {
      // groups whose range is below double resolution: resolve through the
      // (tiny) per-group value distribution
      val tiny = state.filter { case (_, s) =>
        val w = (s.hi - s.lo) / buckets; w == 0.0 || w.isNaN }
      if (tiny.nonEmpty) {
        val dist = cur.join(broadcast(ranges(tiny)), "g")
          .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
          .collect().groupBy(_.get(0))
        tiny.foreach { case (g, s) =>
          val d = dist.getOrElse(g, Array.empty[Row])
            .map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
          var cum = 0L; var a = Double.NaN; var b = Double.NaN
          for ((v, c) <- d) {
            if (a.isNaN && cum + c >= s.r1) a = v
            if (b.isNaN && cum + c >= s.r2) b = v
            cum += c
          }
          result(g) = if (s.frac == 0.0) a else a + (b - a) * s.frac
          state.remove(g)
        }
      }
      if (state.nonEmpty) {
        val hist = cur.join(broadcast(ranges(state)), "g")
          .groupBy(col("g"), bucketCol.as("b")).agg(count(lit(1)).as("cnt"))
          .collect().groupBy(_.get(0))
        // Per group, three outcomes from its covering buckets:
        //  - (r1, r2) in DIFFERENT buckets: r1 is the last row of bucket
        //    bLo and r2 the first of bucket bHi — one aggregate resolves
        //    both exactly (narrowing would be a non-terminating trap when
        //    [bLo..bHi] spans the whole range, e.g. a balanced two-valued
        //    group);
        //  - one SMALL bucket: bounded per-group top-k collect;
        //  - one LARGE bucket: narrow to it (range shrinks by the bucket
        //    count each level — guaranteed progress).
        val span = scala.collection.mutable.LinkedHashMap.empty[Any, (Int, Int)]
        val resolve = scala.collection.mutable.LinkedHashMap.empty[Any, (Int, Long)]
        val narrow = scala.collection.mutable.LinkedHashMap.empty[Any, (Int, Long)]
        state.foreach { case (g, s) =>
          val h = hist.getOrElse(g, Array.empty[Row])
            .map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
          var cum = 0L; var before = 0L; var bLo = -1; var bHi = -1
          var inBucket = 0L
          for ((b, c) <- h) {
            if (bLo < 0 && cum + c >= s.r1) { bLo = b; before = cum; inBucket = c }
            if (bHi < 0 && cum + c >= s.r2) bHi = b
            cum += c
          }
          if (bLo != bHi) span(g) = (bLo, bHi)
          else if (inBucket <= maxCollect) resolve(g) = (bLo, before)
          else narrow(g) = (bLo, before)
        }
        def withBuckets(m: scala.collection.Map[Any, (Int, Int)]): DataFrame = {
          val rows = m.toSeq.map { case (g, (bLo, bHi)) =>
            Row(g, state(g).lo, state(g).hi, bLo, bHi) }
          val r = spark.createDataFrame(java.util.Arrays.asList(rows: _*),
            StructType(Seq(StructField("g", gType), StructField("lo", DoubleType),
              StructField("hi", DoubleType), StructField("bLo", IntegerType),
              StructField("bHi", IntegerType))))
          cur.join(broadcast(r), "g")
        }
        if (span.nonEmpty) {
          val got = withBuckets(span)
            .groupBy(col("g")).agg(
              max(when(bucketCol === col("bLo"), col("v"))).as("a"),
              min(when(bucketCol === col("bHi"), col("v"))).as("b"))
            .collect()
          got.foreach { r =>
            val g = r.get(0); val s = state(g)
            val (a, b) = (r.getDouble(1), r.getDouble(2))
            result(g) = if (s.frac == 0.0) a else a + (b - a) * s.frac
            state.remove(g)
          }
        }
        if (resolve.nonEmpty) {
          // rows collected are bounded by the covering-bucket size
          // (≤ maxCollect per group), keeping the driver contract
          val got = withBuckets(resolve.map { case (g, (b, _)) => g -> (b, b) })
            .filter(bucketCol === col("bLo"))
            .select(col("g"), col("v"))
            .collect().groupBy(_.get(0))
          resolve.foreach { case (g, (_, before)) =>
            val s = state(g)
            val sorted = got.getOrElse(g, Array.empty[Row]).map(_.getDouble(1)).sorted
            val a = sorted((s.r1 - before).toInt - 1)
            val b = sorted((s.r2 - before).toInt - 1)
            result(g) = if (s.frac == 0.0) a else a + (b - a) * s.frac
            state.remove(g)
          }
        }
        if (narrow.nonEmpty) {
          cur = withBuckets(narrow.map { case (g, (b, _)) => g -> (b, b) })
            .filter(bucketCol === col("bLo"))
            .select(col("g"), col("v"))
          narrow.foreach { case (g, (bLo, before)) =>
            val s = state(g)
            val width = (s.hi - s.lo) / buckets
            s.hi = math.min(s.hi, s.lo + (bLo + 1) * width)
            s.lo = s.lo + bLo * width
            s.r1 -= before
            s.r2 -= before
          }
        }
        // narrow empty ⇒ every group resolved ⇒ state empty ⇒ loop exits
      }
    }
    result.toMap
  }

  def groupedMedian(df: DataFrame, groupCol: String, valueCol: String): Map[Any, Double] =
    groupedPercentile(df, groupCol, valueCol, 0.5)

  /** The r1-th and r2-th smallest of `vals.v` (1-based, r1 ≤ r2 ≤ r1+1),
    * scanning only within [lo, hi]. */
  @tailrec private def rankValues(vals: DataFrame, r1: Long, r2: Long,
      lo: Double, hi: Double, buckets: Int, maxCollect: Int): (Double, Double) = {
    // NOTE: a collapsed range (lo == hi) deliberately falls into the
    // width==0 branch below — returning `lo` directly would hand back a
    // bucket BOUNDARY, and boundary-rounded rows clamped into the range
    // may carry a neighboring representable double, not `lo` itself.
    val width = (hi - lo) / buckets
    if (width == 0.0 || width.isNaN) {
      // Range below double resolution: only a handful of representable
      // values remain, however many ROWS carry them — resolve through the
      // (tiny) value distribution, never a row collect.
      val dist = vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("v").asc).collect().map(r => (r.getDouble(0), r.getLong(1)))
      var cum = 0L; var a = Double.NaN; var b = Double.NaN
      for ((v, cnt) <- dist) {
        if (a.isNaN && cum + cnt >= r1) a = v
        if (b.isNaN && cum + cnt >= r2) b = v
        cum += cnt
      }
      return (a, b)
    }
    val bucket = least(lit(buckets - 1),
      greatest(lit(0), floor((col("v") - lo) / width))).cast("int")
    val hist = vals.groupBy(bucket.as("b")).agg(count(lit(1)).as("cnt"))
      .orderBy("b").collect().map(r => (r.getInt(0), r.getLong(1)))
    var cum = 0L; var before = 0L; var bLo = -1; var bHi = -1
    for ((b, cnt) <- hist) {
      if (bLo < 0 && cum + cnt >= r1) { bLo = b; before = cum }
      if (bHi < 0 && cum + cnt >= r2) bHi = b
      cum += cnt
    }
    if (bLo != bHi) {
      // r2 = r1 + 1 and they land in DIFFERENT buckets ⇒ r1 is the last
      // row of bucket bLo and r2 the first of bucket bHi — one aggregate
      // resolves both exactly. (Narrowing instead would be a trap: with
      // mass at both range extremes, [bLo..bHi] spans the whole range and
      // the recursion would make no progress — an infinite loop.)
      val r = vals.agg(
        max(when(bucket === bLo, col("v"))).as("a"),
        min(when(bucket === bHi, col("v"))).as("b")).head()
      return (r.getDouble(0), r.getDouble(1))
    }
    val need = r2 - before
    val inRange = vals.filter(bucket === bLo)
    if (need <= maxCollect) {
      // bounded distributed top-k: TakeOrdered of `need` rows, never the
      // whole bucket
      val arr = inRange.orderBy(col("v").asc).limit(need.toInt)
        .collect().map(_.getDouble(0))
      ((arr((r1 - before).toInt - 1), arr((r2 - before).toInt - 1)))
    } else {
      // narrow to the single covering bucket and re-rank inside it — the
      // range shrinks by the bucket count each level, so this terminates;
      // boundary-rounded stragglers are clamped into the edge buckets by
      // the greatest/least guards, so no counted row can escape the range
      val newLo = lo + bLo * width
      val newHi = math.min(hi, lo + (bLo + 1) * width)
      rankValues(inRange, r1 - before, r2 - before, newLo, newHi, buckets, maxCollect)
    }
  }
}
