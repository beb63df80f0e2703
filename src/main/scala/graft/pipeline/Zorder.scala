package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values as a pure column expression — the
  * multi-dimensional clustering key lakehouse formats use so that
  * range-partitioning on ONE derived value yields segments that are
  * tight on EVERY clustered dimension at once (a single-column sort
  * gives perfect zone maps on that column and useless full-range
  * maps on all others).
  *
  * Each dimension is linearly quantized to a `bits`-wide cell from
  * its [min, max] (driver-supplied — metadata-scale stats, same
  * stance as the ANN centroid fetches), then cells are bit-interleaved
  * LSB-first. Everything is built-in bitwise/arithmetic functions, so
  * the z-value stays inside whole-stage codegen; no UDF, no shuffle.
  *
  * Linear quantization is deliberate: rank quantization would need a
  * global sort or sketch per dimension, and the clustered write
  * ([[ManifestTable.writeClustered]]) already rank-balances SEGMENT
  * boundaries on the final z-value — skew moves segment cuts, not
  * cell quality.
  */
object Zorder {

  /** Interleaved z-value for `dims` = (column, min, max) triples.
    * 2 dims × 10 bits → a 20-bit key; supports up to 6 dims at the
    * default width before the key outgrows a long.
    */
  def zvalue(dims: Seq[(Column, Double, Double)], bits: Int = 10): Column = {
    require(dims.nonEmpty && dims.size * bits <= 62,
      s"${dims.size} dims x $bits bits won't fit a long")
    val d = dims.size
    val cells = dims.map { case (c, mn, mx) => cell(c, mn, mx, bits) }
    val terms = for {
      b <- 0 until bits
      (cellCol, j) <- cells.zipWithIndex
    } yield shiftleft(shiftright(cellCol, b).bitwiseAND(1), b * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `bits`-wide cell index of `c` within [mn, mx], clamped — values
    * outside the stated range (stale stats) land in the edge cells
    * rather than corrupting the interleave.
    */
  private def cell(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val cellCount = 1L << bits
    if (mx <= mn) lit(0L)
    else {
      val scale = cellCount / (mx - mn)
      least(lit(cellCount - 1),
        greatest(lit(0L), floor((c.cast("double") - mn) * scale).cast("long")))
    }
  }
}
