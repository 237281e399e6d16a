package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit SimHash over distinct whitespace tokens —
  * the sketch core of dd_simhash_neardup, promoted from its HOF
  * formulation exactly as that query's scaladoc planned ("the
  * dataflow is final, the expression is the swap-in").
  *
  * Bit-for-bit contract with the expression chain it replaces (and
  * with the DuckDB oracle, which still spells that chain out):
  * per DISTINCT token t, v(t) = first 15 hex chars of md5(t) parsed
  * base-16 (== `conv(substring(md5(t), 1, 15), 16, 10)` cast long —
  * 60 bits); bit i of the sketch is set iff
  * Σ_t (bit_i(v(t)) ? +1 : −1) ≥ 0. The ±1 votes are order-free, so
  * the HOF's first-occurrence distinct order never mattered and a
  * hash-set pass is exact.
  *
  * Why native: the original derivation was 60 interpreted `aggregate`
  * folds over a `transform`'d md5 array per row (one md5 per token is
  * unavoidable; 60 array traversals were not). Here each distinct
  * token is hashed once and votes into 60 counters in one tight loop.
  * SimHash60Spec pins equality against the HOF reference.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def of(text: Column): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(text)))

  private val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 15 lowercase-hex chars of md5(tok), parsed base 16 —
    * identical to conv(substring(md5(tok), 1, 15), 16, 10)::long
    * (15 hex chars = bytes 0..6 plus the high nibble of byte 7, most
    * significant first). */
  private def tokenHash(tok: String): Long = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex chars = first 7 bytes + the high nibble of byte 8
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (bytes(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((bytes(7) & 0xf0L) >> 4)
  }

  /** Called from generated code. */
  def compute(text: UTF8String): Long = {
    val toks = Tokenize.sqlTokens(text)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val v = tokenHash(toks(i))
        var b = 0
        while (b < 60) {
          votes(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) >= 0) sh |= 1L << b
      b += 1
    }
    sh
  }
}
