package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd shingle hash set: text → the sorted-distinct
  * rolling hashes of its 3-word shingles, as `array<long>`.
  *
  * The set-valued sibling of [[ShingleMinHash]] (same tokenization,
  * same polynomial hash, same <3-token fallback — see its scaladoc
  * for the hash and parity contract). MinHash keeps only the 8
  * permutation minima; this keeps the whole set, for operators that
  * need membership rather than similarity: contamination screens,
  * n-gram overlap joins, Bloom prefilters.
  *
  * Why longs and not shingle strings: the downstream explode + join
  * then moves 8-byte keys instead of ~20-char UTF8 strings, and the
  * per-row pass is one tight codegen'd loop instead of the
  * interpreted HigherOrderFunction transform (CodegenFallback) that
  * also knocks the enclosing projection out of whole-stage codegen.
  *
  * DuckDB oracle twin:
  * `list_sort(list_distinct(list_transform(sh, v -> polyHash(v))))`
  * over the same shingle strings — both engines agree bit-for-bit,
  * hash collisions included.
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  import ShingleMinHash.{M, P, Seed}

  private def extend(h0: Long, tok: String): Long = {
    var h = h0
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h = (h * M + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Called from generated code — static and allocation-light. */
  def compute(text: UTF8String): ArrayData = {
    val toks = Tokenize.sqlTokens(text)
    val n = if (toks.length >= 3) toks.length - 2 else 1
    val hs = new Array[Long](n)
    if (toks.length >= 3) {
      var i = 0
      while (i <= toks.length - 3) {
        var h = extend(Seed, toks(i))
        h = (h * M + ' ') % P
        h = extend(h, toks(i + 1))
        h = (h * M + ' ') % P
        hs(i) = extend(h, toks(i + 2))
        i += 1
      }
    } else {
      var h = Seed
      var i = 0
      while (i < toks.length) {
        if (i > 0) h = (h * M + ' ') % P
        h = extend(h, toks(i))
        i += 1
      }
      hs(0) = h
    }
    // sorted-distinct: canonical set representation, mirrors
    // list_sort(list_distinct(...)) on the oracle side
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < n) {
      if (r == 0 || hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Column-level accessor usable from any package. */
  def of(text: Column): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(text)))
}
