package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{I128Sum, QuantizedDotProduct, RepetitionStats, ShingleHashes, ShingleMinHash, SimHash60}

/** SQL exposure for the engine's native Catalyst expressions, so
  * spark.sql() users get them without touching the Scala API:
  *
  *  - production: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard SparkSessionExtensions injection point);
  *  - live session / tests: `GraftExtensions.register(spark)` — the
  *    same registrations applied to an existing session's function
  *    registry.
  *
  * Functions:
  *  - `quantized_dot(array<bigint>, array<bigint>) -> bigint` — the
  *    codegen'd exact dot product (similarity hot loop);
  *  - `i128_sum(double) -> double` — the exact order-independent sum
  *    (two-long i128 accumulator, decimal(…,6) per-row rounding);
  *  - `shingle_minhash(string) -> array<bigint>` — 8-permutation
  *    MinHash signature over 3-word shingles in one codegen'd pass;
  *  - `shingle_hashes(string) -> array<bigint>` — the sorted-distinct
  *    shingle hash set (membership-style dedup/contamination ops);
  *  - `repetition_stats(string) -> struct` — single-pass token/bigram
  *    repetition counters (n_tokens, top_token_count, n_bigrams,
  *    n_distinct_bigrams);
  *  - `simhash60(string) -> bigint` — 60-bit SimHash over distinct
  *    tokens (Hamming-space near-dup sketch).
  *
  * Optimizer rules:
  *  - [[graft.plans.I128SumRewrite]] — `sum(CAST(x AS DECIMAL(p,6)))`
  *    over doubles → the i128 exact aggregate (schema-preserving;
  *    disable with `spark.graft.i128SumRewrite.enabled=false`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.I128SumRewrite)
  }
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDotProduct].getName, "quantized_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "quantized_dot(a, b) takes 2 arguments")
        QuantizedDotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("i128_sum"),
      new ExpressionInfo(classOf[I128Sum].getName, "i128_sum"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "i128_sum(x) takes 1 argument")
        // bare aggregate function — the analyzer wraps it, same as sum()
        I128Sum(args.head)
      }),
    (FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "shingle_minhash(text) takes 1 argument")
        ShingleMinHash(args.head)
      }),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "shingle_hashes(text) takes 1 argument")
        ShingleHashes(args.head)
      }),
    (FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "repetition_stats(text) takes 1 argument")
        RepetitionStats(args.head)
      }),
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash60(text) takes 1 argument")
        SimHash60(args.head)
      }),
    (FunctionIdentifier("gram_position_hashes"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.GramPositionHashes].getName,
        "gram_position_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "gram_position_hashes(text, k) takes 2 arguments")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"gram size must be an int literal, got $other")
        }
        org.apache.spark.sql.graft.GramPositionHashes(args.head, k)
      }))

  /** Apply the same registrations to a live session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.I128SumRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.I128SumRewrite
    }
  }
}
