package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-interval (range) join: all (left, right) pairs with the same key
  * and `rightTs ∈ [leftTs, leftTs + maxGap]` — "what happened within N
  * minutes after X". A naive theta-join is a per-key cross product; this
  * implementation buckets time into `maxGap`-sized cells and equi-joins on
  * (key, bucket) with the right side duplicated into its own and its
  * predecessor bucket — every qualifying pair shares a bucket, the exact
  * predicate then prunes. Cost is O(pairs within 2·maxGap), not O(n²), and
  * the shuffle is a plain hash exchange on (key, bucket) — skew-safe for
  * hot keys as long as activity per (key, gap-window) is bounded.
  *
  * (SURVEY §7 preference (a): composed from built-ins — no custom
  * SparkPlan; Catalyst sees an ordinary equi-join.)
  */
object RangeJoin {

  /** @param left   interval-start side; all its columns survive prefixed as-is
    * @param right  matched side (columns prefixed `r_` in the output)
    * @param keys   equi-key column names present on both sides
    * @param tsCol  timestamp column name (both sides)
    * @param maxGapUs  inclusive upper bound on rightTs − leftTs, microseconds
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, maxGapUs: Long): DataFrame = {
    require(maxGapUs > 0, "maxGapUs must be positive")
    val keyCols = keys.map(col)
    // floor division, NOT bare `div`: integer `div` truncates toward zero,
    // which disagrees with floor bucketing for pre-1970 (negative
    // unix_micros) timestamps and would silently drop boundary pairs there.
    // pmod makes the numerator exactly divisible, so `div` == floor — all in
    // exact long arithmetic (a double round-trip would lose bits past 2^53).
    def bucketOf(c: String) = expr(
      s"(unix_micros($c) - pmod(unix_micros($c), ${maxGapUs}L)) div ${maxGapUs}L")
    val l = left.withColumn("__bucket", bucketOf(tsCol))
    val rBase = right.select(
      keyCols ++ Seq(col(tsCol).as(s"r_$tsCol")) ++
        right.columns.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => col(c).as(s"r_$c")): _*)
    // right row lands in its own bucket and the preceding one: any left row
    // within maxGap of it is in one of those two cells
    val r = rBase.withColumn("__bucket",
      explode(array(bucketOf(s"r_$tsCol"), bucketOf(s"r_$tsCol") - 1)))
    l.join(r, keys :+ "__bucket")
      .filter(col(s"r_$tsCol") >= col(tsCol) &&
        unix_micros(col(s"r_$tsCol")) - unix_micros(col(tsCol)) <= maxGapUs)
      .drop("__bucket")
  }
}
