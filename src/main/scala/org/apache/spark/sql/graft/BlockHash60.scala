package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit block-mean perceptual hash — the sketch
  * core of mm_phash_neardup (Blockhash-family: bit i compares block
  * i's mean intensity to the global median, the integer-exact cousin
  * of DCT pHash).
  *
  * With a real media codec the 60 blocks would be the decoded image's
  * block-mean lumas; this container has no codecs, so the honestly-
  * stubbed "decode" interprets the payload's codepoint stream as a
  * 1-D luma scanline (deterministic, locality-preserving: a small
  * payload edit perturbs one block's mean, flipping at most a few
  * bits — the perceptual-hash property the banding downstream relies
  * on). Swapping in a real decoder changes ONLY the scanline source;
  * grid → median → bits → banding stay as tested.
  *
  * Contract (replayed exactly by the DuckDB oracle, all integer):
  * codepoint j of n belongs to block w = (j·60) div n; block value
  * q_w = (Σcp · 1000) div width (1e3 fixed-point mean, 0 for empty
  * blocks); bit w = 1 iff q_w > lower-median (31st smallest of the
  * 60). Empty payload → hash 0. 60 bits so the sketch, its 4×15-bit
  * Hamming bands, and every shift stay positive in a BIGINT on both
  * engines (same reasoning as [[SimHash60]]).
  *
  * Overflow: Σcp ≤ n·0x10FFFF, ×1000 fits a long for any payload
  * under ~8·10⁹ codepoints — per-asset, not per-corpus, so safe.
  */
case class BlockHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "blockhash60"

  override def nullSafeEval(input: Any): Any =
    BlockHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.BlockHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BlockHash60 {
  def of(payload: Column): Column =
    ExpressionUtils.column(BlockHash60(ExpressionUtils.expression(payload)))

  /** Called from generated code — one codepoint pass, no allocation
    * beyond the three 60-slot arrays. */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val n = s.codePointCount(0, s.length).toLong
    if (n == 0L) return 0L
    val sums = new Array[Long](60)
    val widths = new Array[Long](60)
    var i = 0
    var j = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = ((j * 60L) / n).toInt
      sums(w) += cp
      widths(w) += 1
      j += 1
      i += Character.charCount(cp)
    }
    val q = new Array[Long](60)
    var k = 0
    while (k < 60) {
      q(k) = if (widths(k) > 0) sums(k) * 1000L / widths(k) else 0L
      k += 1
    }
    val sorted = q.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(29) // lower median, 1-based 30th — oracle: list_sort[30]
    var h = 0L
    k = 0
    while (k < 60) {
      if (q(k) > med) h |= 1L << k
      k += 1
    }
    h
  }
}
