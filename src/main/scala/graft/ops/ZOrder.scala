package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping — the
  * storage-layout half of "fast scans at 100 TB". Sorting a table by the
  * interleaved bits of two (or more) bucketed columns before a parquet
  * write (`ParquetSink.writePartitioned(sortCols = Seq("zval"))`) bounds
  * BOTH coordinates' min/max ranges within every file and row group, so a
  * 2-D box predicate prunes row groups on either dimension — where a
  * linear sort only ever narrows its leading column (the same layout trick
  * behind Delta's OPTIMIZE ZORDER; public geometry from Morton 1966).
  *
  * Pure bitwise column arithmetic: codegen'd by Spark's built-in shift/and/
  * or expressions, reproducible in any engine with `>> << & |` — so a
  * z-value query carries a full DuckDB oracle.
  */
object ZOrder {

  /** 2-D Morton code over the low `bits` bits of each coordinate: bit k of
    * `x` lands at position 2k, bit k of `y` at 2k+1. Inputs must be
    * non-negative (bucket/clamp first); values above 2^bits-1 wrap by bit
    * truncation, so size `bits` to the bucket domain. */
  def interleave2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"interleave2: bits in [1,31], got $bits")
    (0 until bits).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k)
        .bitwiseOR(shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB SQL fragment computing the same Morton code. */
  def interleave2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { k =>
      s"((($x >> $k) & 1) << ${2 * k}) | ((($y >> $k) & 1) << ${2 * k + 1})"
    }.mkString("(", " | ", ")")
}
