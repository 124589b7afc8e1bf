package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics via histogram pruning — the scale
  * path for "exact median at 100 TB", where a single percentile/median
  * aggregate is untenable (its state buffers the value distribution:
  * ~n distinct doubles per partition for continuous data).
  *
  * Two cheap passes + one bounded take:
  *  1. min/max/count (one codegen'd scan);
  *  2. a fixed-width histogram (groupBy on the bucket id — the shuffle
  *     carries `buckets` rows total);
  *  3. locate the bucket(s) covering the median ranks from the cumulative
  *     histogram (driver math over `buckets` longs), then TakeOrdered only
  *     the rows of those buckets up to the needed rank — the sort is
  *     bounded by the hot bucket's size (~n/buckets for non-degenerate
  *     distributions; pathological concentration can be re-split by
  *     recursing with a narrower range — not needed at gate scale).
  *
  * Result is the true median (even n: mean of the two middle values —
  * the same interpolation rule as Spark's `median` and DuckDB's
  * `quantile_cont(0.5)`).
  */
object Stats {

  def exactMedian(df: DataFrame, valueCol: String, buckets: Int = 2048): Double = {
    val c = col(valueCol).cast("double")
    val head = df.agg(min(c).as("mn"), max(c).as("mx"), count(c).as("n")).head()
    if (head.isNullAt(2) || head.getLong(2) == 0L) return Double.NaN
    val (mn, mx, n) = (head.getDouble(0), head.getDouble(1), head.getLong(2))
    if (mn == mx) return mn
    val width = (mx - mn) / buckets
    val bucket = least(lit(buckets - 1), floor((c - mn) / width)).cast("int")
    val hist = df.groupBy(bucket.as("b")).agg(count(lit(1)).as("cnt"))
      .orderBy("b").collect().map(r => (r.getInt(0), r.getLong(1)))

    val r1 = (n + 1) / 2 // lower middle rank (1-based)
    val r2 = n / 2 + 1   // upper middle rank (== r1 for odd n)
    var cum = 0L; var before = 0L; var bLo = -1; var bHi = -1
    for ((b, cnt) <- hist) {
      if (bLo < 0 && cum + cnt >= r1) { bLo = b; before = cum }
      if (bHi < 0 && cum + cnt >= r2) bHi = b
      cum += cnt
    }
    val need = (r2 - before).toInt
    val vals = df.select(c.as("v")).filter(bucket.between(bLo, bHi))
      .orderBy(col("v").asc).limit(need)
      .collect().map(_.getDouble(0))
    if (n % 2 == 1) vals(need - 1)
    else (vals(need - 2) + vals(need - 1)) / 2.0
  }
}
