/** Lives under org.apache.spark.sql for the private[sql]
  * Column↔Expression bridge, like QuantizedDotProduct. */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Primitive-buffer bounded top-k: (id, score) pairs ranked by
  * score DESC, id ASC, k-capped — kept in two flat arrays with
  * shift-insert (k is small; no heap bookkeeping, no per-row
  * allocation).
  */
final class TopKBuf(val k: Int) extends Serializable {
  val ids = new Array[Long](k)
  val scores = new Array[Double](k)
  var n = 0

  // does (s, id) rank strictly before slot j?
  @inline private def before(s: Double, id: Long, j: Int): Boolean =
    s > scores(j) || (s == scores(j) && id < ids(j))

  def insert(id: Long, s: Double): Unit = {
    if (n == k && !before(s, id, n - 1)) return
    var pos = if (n == k) n - 1 else n
    while (pos > 0 && before(s, id, pos - 1)) pos -= 1
    var j = math.min(n, k - 1)
    while (j > pos) { ids(j) = ids(j - 1); scores(j) = scores(j - 1); j -= 1 }
    ids(pos) = id
    scores(pos) = s
    if (n < k) n += 1
  }
}

/** Native bounded top-k aggregate — the [[graft.functions.BoundedTopK]]
  * Aggregator re-done as a Catalyst `TypedImperativeAggregate` with a
  * primitive-array buffer: no Seq allocation per input row, no
  * ExpressionEncoder round-trip per partial, and a 16·k+4-byte flat
  * serialization at shuffle boundaries.
  *
  * Scale contract is identical (and is the point of both): map-side
  * partials reduce every input partition to ≤ k entries per group, so
  * the one shuffle moves O(partitions · k) rows per group and ranking
  * parallelism follows the input partitioning, never the group count —
  * the window-free top-k shape.
  *
  * Returns `array<struct<id:bigint, score:double>>` ordered by
  * score DESC, id ASC. NaN scores are dropped on update (a NaN has no
  * place in a total order, so admitting it would make results depend
  * on partition/merge arrival order; cosine yields NaN for a zero-norm
  * vector and "unranked" is the honest answer for it).
  */
case class TopKAggregate(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf]
  with BinaryLike[Expression] with ExpectsInputTypes {

  require(k > 0, "k must be positive")

  override def left: Expression = id
  override def right: Expression = score
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_topk"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i != null && s != null) {
      val sv = s.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(sv)) buf.insert(i.asInstanceOf[Long], sv)
    }
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var j = 0
    while (j < other.n) { buf.insert(other.ids(j), other.scores(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val out = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) { out(j) = InternalRow(buf.ids(j), buf.scores(j)); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) { bb.putLong(buf.ids(j)); bb.putDouble(buf.scores(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    buf.n = n
    var j = 0
    while (j < n) { buf.ids(j) = bb.getLong; buf.scores(j) = bb.getDouble; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAggregate =
    copy(id = newLeft, score = newRight)
}

object TopKAggregate {
  /** Column-level accessor usable from any package. */
  def of(id: Column, score: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKAggregate(ExpressionUtils.expression(id),
        ExpressionUtils.expression(score), k).toAggregateExpression())
}
