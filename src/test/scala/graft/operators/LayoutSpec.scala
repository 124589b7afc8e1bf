package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, j) =>
      acc | (((a >> j) & 1L) << (2 * j)) | (((b >> j) & 1L) << (2 * j + 1))
    }

  test("zValue matches the reference interleave on random inputs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = rows.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b", 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == morton(a, b, 16), s"($a,$b)") }
  }

  test("zValue masks inputs beyond `bits` and handles the corners") {
    val got = Seq((0L, 0L), (65535L, 65535L), (65536L, 1L))
      .toDF("a", "b").select(Layout.zValue($"a", $"b", 16)).as[Long].collect()
    assert(got(0) == 0L)
    assert(got(1) == (1L << 32) - 1) // all 32 low bits set
    assert(got(2) == 2L) // bit 16 of a is out of range; b contributes bit 1
  }

  test("rescale is monotone, exact at the endpoints, and integral") {
    val got = Seq(0L, 1L, 500L, 999L, 1000L).toDF("x")
      .select(Layout.rescale($"x", lit(1000L), 16)).as[Long].collect()
    assert(got.head == 0L && got.last == 65535L)
    assert(got.sameElements(got.sorted))
    assert(got.forall(v => v >= 0 && v <= 65535))
  }

  /** The reason z-order exists: a file layout sorted on x alone prunes
    * x-predicates perfectly but cannot prune y-predicates at all (every
    * file spans the full y domain), while z-buckets have bounded extent in
    * BOTH dimensions. Metric = how many buckets' [min,max] box a narrow
    * single-dimension band touches — exactly the file-footer min/max
    * pruning rule. */
  test("z-buckets prune narrow bands on BOTH dims; linear sort fails one dim") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(4096)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    def touched(bucket: org.apache.spark.sql.Column, dim: String,
        lo: Long, hi: Long): Long =
      pts.groupBy(bucket.as("bk"))
        .agg(min(col(dim)).as("mn"), max(col(dim)).as("mx"))
        .filter($"mn" <= hi && $"mx" >= lo)
        .count()
    // 64 buckets each way: z top-6-bits vs pure-x-sort slices (x div 16)
    val zBucket = shiftright(Layout.zValue(
      Layout.rescale($"x", lit(1023L), 16),
      Layout.rescale($"y", lit(1023L), 16), 16), 26)
    val linBucket = expr("x div 16")
    // a 16-wide band is ~1.6% of the domain
    val zX = touched(zBucket, "x", 400, 415)
    val zY = touched(zBucket, "y", 400, 415)
    val linX = touched(linBucket, "x", 400, 415)
    val linY = touched(linBucket, "y", 400, 415)
    assert(linX <= 2, s"x-sort should prune x-bands hard, touched $linX")
    assert(linY > 56, s"x-sort cannot prune y-bands, touched $linY of 64")
    // z: a 16-wide band crosses at most 2 of the 8 tiles per axis → ≤ 16
    assert(zX <= 16 && zY <= 16, s"z touched x=$zX y=$zY of 64")
  }
}
