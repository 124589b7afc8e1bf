package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the bounded top-k aggregate against a brute-force reference, with
  * emphasis on the r6 in-heap dedup (equality-skip must reproduce
  * distinct-then-rank BIT FOR BIT across partial buffers and merges —
  * seeded random rounds, duplicates injected, several partitions so the
  * merge path is really exercised). */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def reference(rows: Seq[(Long, Double, Long)], k: Int,
      dedup: Boolean): Map[Long, Seq[(Long, Double)]] = {
    val perQuery = rows.groupBy(_._1)
    perQuery.map { case (q, rs) =>
      val scored = rs.map(r => (r._2, r._3))
      val pool = if (dedup) scored.distinct else scored
      q -> pool.sortBy { case (s, id) => (-s, id) }.take(k)
        .map { case (s, id) => (id, s) }
    }
  }

  private def run(rows: Seq[(Long, Double, Long)], k: Int,
      dedup: Boolean): Map[Long, Seq[(Long, Double)]] =
    rows.toDF("q", "score", "id").repartition(7)
      .groupBy($"q")
      .agg(TopK.scoredTopK($"score", $"id", k, dedup).as("top"))
      .as[(Long, Seq[(Long, Double)])].collect().toMap

  test("random rounds with injected duplicates match distinct-then-rank") {
    val rnd = new Random(42)
    for (round <- 1 to 5) {
      val k = 1 + rnd.nextInt(7)
      val base = (1 to 400).map { _ =>
        (rnd.nextInt(5).toLong,                  // query
         (rnd.nextInt(20) / 10.0),               // coarse scores → many ties
         rnd.nextInt(30).toLong)                 // ids collide across rows
      }
      // duplicate a random slice verbatim — the multi-probe arrival shape
      val dups = rnd.shuffle(base).take(150)
      val rows = rnd.shuffle(base ++ dups)
      assert(run(rows, k, dedup = true) == reference(rows, k, dedup = true),
        s"dedup mismatch in round $round (k=$k)")
      assert(run(rows, k, dedup = false) == reference(rows, k, dedup = false),
        s"non-dedup mismatch in round $round (k=$k)")
    }
  }

  test("duplicate of an evicted entry cannot re-enter the heap") {
    // k=2; ids 1,2 (score 9,8) fill the heap, id 3 (score 1) is evicted
    // by id 4 (score 10); a late duplicate of id 3 must stay out
    val rows = Seq(
      (0L, 1.0, 3L), (0L, 9.0, 1L), (0L, 8.0, 2L),
      (0L, 10.0, 4L), (0L, 1.0, 3L))
    assert(run(rows, 2, dedup = true) ==
      Map(0L -> Seq((4L, 10.0), (1L, 9.0))))
  }
}
