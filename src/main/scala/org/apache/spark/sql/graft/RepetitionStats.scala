package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd repetition counters: text →
  * struct(n_tokens, top_token_count, n_bigrams, n_distinct_bigrams).
  *
  * The counting core of t_repetition (TextAnalysis.qRepetition). The
  * original formulation computed the max token count with an
  * `aggregate` HOF over `array_sort(toks)` and the bigram distinct
  * count with `transform` + `array_distinct` — all higher-order
  * functions, interpreted (CodegenFallback) and re-evaluating the
  * token split per consumer; the honest sf1 sweep measured ~21s for
  * 50k docs in that shape. One hash-counting pass here replaces all
  * of it: max multiplicity IS the max sorted-run length, and distinct
  * bigram count over space-joined pairs is injective because tokens
  * cannot contain whitespace.
  *
  * Deliberately INTEGER-only: every float (ratios, rounding) stays in
  * ordinary Spark expressions built on these fields, so cross-engine
  * float policy lives in one place (the query) and this expression
  * can never drift from the DuckDB oracle's arithmetic.
  * RepetitionStatsSpec pins equivalence against the original HOF
  * formulation.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("top_token_count", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  def of(text: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(text)))

  /** Called from generated code — one pass, two hash tables. */
  def compute(text: UTF8String): InternalRow = {
    // single tokenization contract — see Tokenize.sqlTokens: exact
    // split(trim(text), "\s+") SQL semantics, non-space padding kept
    val toks = Tokenize.sqlTokens(text)
    val counts = new java.util.HashMap[String, Integer](toks.length * 2)
    var top = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    var nBigrams = 0
    var nDistinct = 0
    if (toks.length >= 2) {
      nBigrams = toks.length - 1
      val seen = new java.util.HashSet[String](nBigrams * 2)
      var j = 0
      while (j < toks.length - 1) {
        // space-joined pair — injective (tokens contain no whitespace),
        // identical identity to the concat_ws(" ", a, b) formulation
        if (seen.add(toks(j) + " " + toks(j + 1))) nDistinct += 1
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](toks.length, top, nBigrams, nDistinct))
  }
}
