package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT heavy hitters from a bounded-memory sketch — the
  * "which keys exceed a frequency floor" primitive behind vocabulary
  * induction, hot-key/skew audits, and stopword discovery, built the only
  * way it can work at 100 TB: a full `groupBy(key)` is a shuffle of the
  * whole key universe, but heavy hitters need state for only the heavy
  * tail-free few.
  *
  * Two passes:
  *  1. CANDIDATES — per-partition SpaceSaving ([[spaceSavingKeys]], at
  *     most `m` counters per partition, `mapPartitions`, zero shuffle).
  *     Guarantee chain: an item with global count·k > n must, by
  *     pigeonhole over Σcount_p = count and Σn_p = n, have count_p·k >
  *     n_p in at least one partition; SpaceSaving with m ≥ k keeps every
  *     item whose partition count exceeds n_p/m ≥ that bound — so the
  *     union of the per-partition summaries is a SUPERSET of the true
  *     heavy hitters. The sketch contents are arrival-order-dependent
  *     and are never emitted.
  *  2. VERIFY — one exact pass: rows left-join the broadcast candidate
  *     set, non-candidates collapse into a single null-key tail group
  *     (map-side combine makes the tail one row per partition), and the
  *     integer cross-multiplication `cnt·k > n` picks the true heavy
  *     hitters — EXACT and deterministic whatever the sketch captured,
  *     with `n` recovered from the same aggregate (Σ all groups), so the
  *     verify pass is the only full-data pass after the sketch.
  */
object HeavyHitters {

  /** SpaceSaving stream summary over one iterator: at most `m` counters;
    * an unseen item evicts the minimum counter and inherits its count +1
    * (counts overestimate, never underestimate — the superset guarantee).
    * Returns the surviving KEYS only; min-eviction is an O(m) scan, paid
    * only when the summary is full and the item is new. */
  private[graft] def spaceSavingKeys(it: Iterator[String], m: Int): Iterator[String] = {
    require(m > 0, s"m must be positive: $m")
    val counts = new java.util.HashMap[String, java.lang.Long](m * 2)
    while (it.hasNext) {
      val x = it.next()
      val c = counts.get(x)
      if (c != null) counts.put(x, c + 1L)
      else if (counts.size < m) counts.put(x, 1L)
      else {
        var minK: String = null
        var minV = Long.MaxValue
        val e = counts.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue < minV) { minV = kv.getValue; minK = kv.getKey }
        }
        counts.remove(minK)
        counts.put(x, minV + 1L)
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().iterator().asScala
  }

  /** Exact keys with `count·k > n` (strictly above the 1/k frequency
    * floor), with their exact counts and the stream total. `m` sizes the
    * per-partition sketch; the superset guarantee needs m ≥ k. */
  def heavyHitters(items: DataFrame, keyCol: String, k: Int,
      m: Int): DataFrame = {
    require(k > 1 && m >= k, s"need m >= k > 1: k=$k m=$m")
    val spark = items.sparkSession
    import spark.implicits._
    val keys = items.select(col(keyCol).cast("string").as("k"))
    val cands = keys.as[String]
      .mapPartitions(it => spaceSavingKeys(it, m))
      .toDF("k").distinct()
    // candidates are bounded by partitions × m — broadcast territory
    val counted = keys
      .join(broadcast(cands.withColumn("cand", lit(1))), Seq("k"), "left")
      .groupBy(when($"cand".isNotNull, $"k").as("k"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = counted.agg(sum($"cnt").as("n"))
    counted.filter($"k".isNotNull)
      .crossJoin(broadcast(total))
      .filter($"cnt" * k > $"n")
      .select($"k".as(keyCol), $"cnt".as("n_occurrences"), $"n".as("n_total"))
  }
}
