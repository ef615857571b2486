package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional file clustering (SINK-13) — the Delta OPTIMIZE ZORDER
  * analogue, built from codegen'd bit-twiddling built-ins only.
  *
  * A linear sort on column A gives parquet files tight min/max stats on A
  * and useless stats on B (every file spans B's whole range). Interleaving
  * the bits of A and B into one z-value and sorting files by IT makes each
  * file a rectangle in (A, B) space, so footer stats skip files for
  * selective filters on EITHER column. That is the difference between a
  * metadata-bounded and a scan-bounded point read at 100 TB.
  */
object Layout {

  /** Bit-interleave of two non-negative integer columns: bit i of `a` goes
    * to z-bit 2i, bit i of `b` to z-bit 2i+1. `bits` per input (default 20
    * ⇒ 40-bit z, comfortably inside LongType and ANSI-safe — no overflow).
    * Values ≥ 2^bits keep their low `bits` bits; at lake scale inputs are
    * first quantile-mapped into the bit range (the standard z-order recipe)
    * so the curve stays balanced under skew.
    *
    * The unrolled fold stays entirely inside whole-stage codegen — shifts,
    * AND, OR — no UDF; constant-folding collapses the literal shift
    * amounts at plan time. */
  def zvalue(a: Column, b: Column, bits: Int = 20): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L).cast("long")) { (z, i) =>
      z.bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }
}
