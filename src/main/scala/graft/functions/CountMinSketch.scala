package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min Sketch as a typed `Aggregator[IN, BUF, OUT]` — the
  * custom-UDAF surface (SURVEY §2.10: "extension surface would use
  * Aggregator"). Gives ε-approximate frequencies for heavy-hitter
  * detection over a keyed stream/table in ONE pass with a fixed-size
  * mergeable buffer: buffers combine associatively (element-wise add),
  * so partial aggregation works map-side and the shuffle carries
  * depth×width longs per group, independent of cardinality — the
  * 100 TB alternative to an exact groupBy count over a hot column.
  *
  * Estimate guarantee: est(x) ≥ true(x), and est(x) ≤ true(x) + εN
  * with probability 1−δ for width=⌈e/ε⌉, depth=⌈ln(1/δ)⌉.
  */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] with Serializable {

  private def hash(d: Int, value: String): Int = {
    // one stable 64-bit basis per row via FNV-1a seeded by d
    var h = 1469598103934665603L ^ (d * 1099511628211L)
    var i = 0
    while (i < value.length) {
      h ^= value.charAt(i)
      h *= 1099511628211L
      i += 1
    }
    val m = (h % width).toInt
    if (m < 0) m + width else m
  }

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], value: String): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + hash(d, value)) += 1
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // Native array<bigint> encoding: the partial buffers cross the
  // shuffle as primitive long arrays, not Java-serialized blobs.
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** Point estimate from a finished sketch. */
  def estimate(sketch: Array[Long], value: String): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + hash(d, value))
      if (c < best) best = c
      d += 1
    }
    best
  }
}
