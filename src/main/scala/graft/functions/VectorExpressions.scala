package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.QuantizedDotProduct

/** Vector similarity primitives over quantized (int64) embeddings.
  * The dot-product hot loop is a native codegen'd Catalyst expression
  * ([[org.apache.spark.sql.graft.QuantizedDotProduct]]); this object
  * is the engine-facing API.
  */
object VectorExpressions {

  /** Native codegen'd int64 dot product. */
  def quantizedDot(a: Column, b: Column): Column = QuantizedDotProduct.dot(a, b)

  /** float array → int64-quantized array (exact on both engines —
    * see queries/Similarity.scala for the determinism argument). */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 10000 + 0.5).cast("long"))

  /** Cosine over quantized vectors using the native expression. */
  def quantizedCosine(a: Column, b: Column): Column =
    quantizedDot(a, b).cast("double") /
      (sqrt(quantizedDot(a, a).cast("double")) *
       sqrt(quantizedDot(b, b).cast("double")))

  /** SQL registration: SELECT quantized_dot(a, b). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot",
      exprs => QuantizedDotProduct(exprs(0), exprs(1)),
      "built-in")
}
