/** Column bridge for Spark's codegen'd Bloom-filter probe.
  *
  * `DataFrameStatFunctions.bloomFilter` hands back a driver-side
  * [[org.apache.spark.util.sketch.BloomFilter]] object with no public
  * Column-level probe, which is why the pre-round-8 screen wrapped it
  * in a Scala UDF. Spark already ships the right expression —
  * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]],
  * the one its runtime bloom-filter joins inject — taking the
  * serialized sketch as a foldable binary and deserializing it once
  * per task inside whole-stage codegen. This object is the two-line
  * bridge from the sketch object to that expression (ExpressionUtils
  * is private[sql], hence the package).
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

object BloomProbe {

  /** `might_contain(<sketch>, value)` as a codegen'd predicate. */
  def mightContain(bf: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      ExpressionUtils.expression(value)))
  }
}
