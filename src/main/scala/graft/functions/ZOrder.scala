package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) key construction — shared between the
  * `q_zorder_layout` audit query ([[graft.queries.AdvancedQueries]])
  * and the physical write path
  * ([[graft.sink.PartitionedWriter.writeZOrdered]]), so the layout a
  * query PROVES and the layout the sink WRITES cannot drift.
  *
  * The key is a fixed tree of shift/mask/add over two columns — pure
  * map-side, codegen'd, no exchange — interleaving `bits` bits of
  * each quantized dimension (x at even positions, y at odd). Domain
  * quantization is shift-based (`value >> shift`, i.e. cells of
  * `2^shift`), with BOTH edges clamped: a value below the anchor
  * would shift as a negative and scatter into an arbitrary cell
  * (arithmetic shiftright keeps the sign), breaking the rectangle
  * invariant — `greatest(0)`/`least(2^bits − 1)` pin out-of-domain
  * values into the edge cells, never lost. Domain bounds are
  * layout-time constants by design: a layout job knows its key
  * domains. */
object ZOrder {

  /** Quantize a non-negative-anchored long column into `2^shift`-wide
    * cells, clamped to `[0, 2^bits)`. */
  def quantize(c: Column, shift: Int, bits: Int): Column =
    least(shiftright(greatest(c, lit(0L)), shift), lit((1L << bits) - 1))

  /** Interleave two already-quantized `[0, 2^bits)` cell columns into
    * the Morton key (x even bits, y odd bits). */
  def interleave(xq: Column, yq: Column, bits: Int): Column = {
    def bit(c: Column, i: Int) = shiftright(c, i).bitwiseAND(lit(1L))
    (0 until bits).map(i =>
        shiftleft(bit(xq, i), 2 * i) + shiftleft(bit(yq, i), 2 * i + 1))
      .reduce(_ + _)
  }

  /** The full key: quantize both dimensions, interleave. */
  def zkey(x: Column, xShift: Int, y: Column, yShift: Int, bits: Int): Column =
    interleave(quantize(x, xShift, bits), quantize(y, yShift, bits), bits)
}
