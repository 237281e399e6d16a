package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd MinHash signature: text → the 8 permutation
  * minima over 3-word shingle hashes, in ONE tight per-row loop.
  *
  * This replaces a five-op interpreted pipeline (split → transform
  * shingles [HigherOrderFunction, CodegenFallback] → explode → md5 +
  * hex conv per shingle → groupBy(doc).min ×8) with a single
  * map-side expression: no shuffle, no per-shingle string
  * materialization, no crypto hash. At 100 TB the signature pass is
  * pure scan+map — the shape a production dedup pipeline wants
  * (reference semantics: near-dup detection over scraped documents;
  * the signature table is the persisted artifact downstream banding
  * reads).
  *
  * Hash: polynomial rolling hash over Unicode codepoints,
  * h = (h·1000003 + cp) mod (2³¹−1), seed 7 — chosen because the
  * DuckDB oracle replays it exactly with integer SQL
  * (list_reduce over unicode(v[i]); BIGINT never overflows:
  * h·M + cp < 2³¹·2²⁰ + 2²¹ ≪ 2⁶³). Permutation i maps v ↦
  * (aᵢ·v + bᵢ) mod P. Duplicate shingles don't affect minima, so no
  * distinct pass is needed.
  *
  * Tokenization parity with the SQL twin via [[Tokenize.sqlTokens]]
  * (exact `split(trim(text), '\s+')` semantics); shingles are
  * single-space joins of 3 consecutive tokens; texts with <3 tokens
  * contribute one shingle = all tokens single-space joined (matching
  * `array_join(toks, ' ')`).
  */
case class ShingleMinHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_minhash"

  override def nullSafeEval(input: Any): Any =
    ShingleMinHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleMinHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleMinHash {
  val P = 2147483647L // 2^31 - 1
  val M = 1000003L
  val Seed = 7L
  // (a, b) per permutation h_i(v) = (a*v + b) % P; a*v < 31*2^31 — no overflow.
  val A: Array[Long] = Array(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
  val B: Array[Long] = Array(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)

  /** Fold `tok`'s codepoints into rolling hash `h`. */
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

  private def updateMins(mins: Array[Long], v: Long): Unit = {
    var j = 0
    while (j < 8) {
      val x = (v * A(j) + B(j)) % P
      if (x < mins(j)) mins(j) = x
      j += 1
    }
  }

  /** Called from generated code — must stay a static, allocation-light
    * method so the JIT inlines the hot loop. */
  def compute(text: UTF8String): ArrayData = {
    val toks = Tokenize.sqlTokens(text)
    val mins = Array.fill(8)(Long.MaxValue)
    if (toks.length >= 3) {
      var i = 0
      while (i <= toks.length - 3) {
        var h = extend(Seed, toks(i))
        h = (h * M + ' ') % P
        h = extend(h, toks(i + 1))
        h = (h * M + ' ') % P
        h = extend(h, toks(i + 2))
        updateMins(mins, h)
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
      updateMins(mins, h)
    }
    new GenericArrayData(mins)
  }

  /** Column-level accessor usable from any package. */
  def of(text: Column): Column =
    ExpressionUtils.column(ShingleMinHash(ExpressionUtils.expression(text)))
}
