package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton) interleaving of two sort keys.
  * Extension surface beyond the reference (SURVEY §7.3) — the lakehouse
  * OPTIMIZE ZORDER primitive: rows sorted by the interleaved key land in
  * files whose min/max footer stats form tight rectangles in BOTH
  * dimensions, so a predicate on either column (or both) prunes files —
  * a single-column sort gives pruning on that column only. At 100 TB this
  * is scan-avoidance infrastructure, not a query: you pay one global sort
  * at write time and every selective read afterwards skips most files.
  *
  * Everything here is integer Column math (shifts, masks, adds) — exact,
  * codegen-friendly, and reproducible in any SQL oracle term-for-term.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of `a` and `b` (a in even
    * positions, b in odd): z = Σ_j ((a>>j)&1)·4^j + ((b>>j)&1)·2·4^j.
    * Inputs are masked to `bits` bits, so callers should rank/rescale
    * wider domains first (see [[rescale]]); 2·bits ≤ 62 keeps the result
    * in a long. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { j =>
      Seq(shiftleft(shiftright(a.cast("long"), j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(b.cast("long"), j).bitwiseAND(lit(1L)), 2 * j + 1))
    }
    terms.reduce(_ + _)
  }

  /** Rescale a non-negative key with known max onto the full `bits`-bit
    * range: (x · (2^bits − 1)) div max. Integral div — exact on any
    * engine; monotone, so z-locality is preserved. Keys whose domain is
    * far smaller than 2^bits would otherwise leave the high interleave
    * bits constant and the clustering one-sided. */
  def rescale(x: Column, maxVal: Column, bits: Int): Column =
    call_function("div", // integral div: float division corrupts big longs
      x.cast("long") * lit((1L << bits) - 1), maxVal.cast("long"))
}
