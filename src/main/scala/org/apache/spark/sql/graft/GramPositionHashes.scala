package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd POSITIONAL k-gram hashes: text → one hash per
  * token position, element `i` (0-based) hashing the k-token gram
  * starting at token `i+1` — the anchor table of the substring-run
  * dedup (`dd_substring_runs`).
  *
  * The positional sibling of [[ShingleHashes]]: that expression
  * canonicalizes to a sorted-DISTINCT hash SET (membership queries —
  * containment, contamination), which deliberately erases positions;
  * detecting verbatim RUNS needs them back, because a shared run of
  * L ≥ k tokens is exactly a maximal chain of positionally
  * consecutive anchor matches at one alignment offset. Same
  * tokenization ([[Tokenize.sqlTokens]] — bit-equal to
  * `regexp_split_to_array(trim(text), '\s+')`), same fold-with-' '
  * construction, so the DuckDB oracle twin reproduces every hash
  * bit-for-bit, collisions included.
  *
  * Hash width: ShingleMinHash's single 31-bit fold is fine for
  * similarity estimation but thin for EXACT-match anchors (birthday
  * collisions from ~50k distinct grams would fabricate phantom
  * "verbatim" matches). Anchors therefore combine TWO independent
  * 31-bit polynomial folds (seeds 7/13, multipliers 1000003/1000033,
  * both mod 2^31−1) as `h1 · (2^31−1) + h2` — an effective ~62-bit
  * key that still fits 64-bit arithmetic on BOTH engines (h1 < 2^31,
  * so the combine is overflow-free in a signed long, and each fold's
  * step product stays under 2^51). A doc with fewer than k tokens
  * has no k-gram and returns an EMPTY array (no whole-doc fallback:
  * it cannot contain a k-token run by definition).
  *
  * DuckDB oracle twin (per gram string v):
  * `fold(v,7,1000003) * 2147483647 + fold(v,13,1000033)` with
  * fold = `list_reduce` over codepoints, exactly
  * [[graft.queries.Dedup]]'s proven polyHash spelling.
  */
case class GramPositionHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"gram size must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_position_hashes"

  override def nullSafeEval(input: Any): Any =
    GramPositionHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GramPositionHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramPositionHashes {
  import ShingleMinHash.P // 2^31 - 1
  private val M1 = 1000003L
  private val M2 = 1000033L
  private val Seed1 = 7L
  private val Seed2 = 13L

  private def extend(h0: Long, m: Long, tok: String): Long = {
    var h = h0
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h = (h * m + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Called from generated code — static and allocation-light. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = Tokenize.sqlTokens(text)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h1 = Seed1
      var h2 = Seed2
      var j = 0
      while (j < k) {
        if (j > 0) {
          h1 = (h1 * M1 + ' ') % P
          h2 = (h2 * M2 + ' ') % P
        }
        h1 = extend(h1, M1, toks(i + j))
        h2 = extend(h2, M2, toks(i + j))
        j += 1
      }
      hs(i) = h1 * P + h2
      i += 1
    }
    new GenericArrayData(hs)
  }

  /** Column-level accessor usable from any package. */
  def of(text: Column, k: Int): Column =
    ExpressionUtils.column(
      GramPositionHashes(ExpressionUtils.expression(text), k))
}
