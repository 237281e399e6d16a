package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native codegen'd random-hyperplane LSH bucketing: a quantized
  * embedding → one bucket id per hash table, where table t's bucket
  * is `bits` sign bits of pseudo-random ±1 hyperplane projections
  * (plane p = t·bits+j, element i sign = bit 16 of the LCG
  * (i + 64p)·1103515245 + 12345 — pure integer arithmetic, replayed
  * exactly by the DuckDB oracle).
  *
  * Replaces a per-plane HigherOrderFunction formulation
  * (`aggregate(zip_with(q, sequence(0,63), ±x)) >= 0` per bit):
  * tables·bits interpreted lambda chains per row, each re-walking the
  * vector with boxed Longs — CodegenFallback that also knocked the
  * enclosing project out of whole-stage codegen. Here the ±1 sign
  * matrix is precomputed once per query and embedded as a codegen
  * reference object; the per-row work is one tight
  * planes×64 multiply-accumulate loop.
  *
  * Semantics mirror the HOF twin bit-for-bit (equivalence proven in
  * HyperplaneBucketsSpec, including the degenerate edges):
  * vectors shorter than 64 elements or containing a null element
  * yield null projection sums → every sign bit 0 → all buckets 0;
  * elements past index 63 pair with a null sequence index, so the
  * lambda's `otherwise(-x)` branch subtracts them from every plane's
  * sum.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(tables >= 1 && bits >= 1 && bits <= 63,
    s"need 1 <= bits <= 63 and tables >= 1, got tables=$tables bits=$bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ann_buckets"

  @transient private lazy val signs: Array[Byte] =
    HyperplaneBuckets.signMatrix(tables * bits)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(
      input.asInstanceOf[ArrayData], signs, tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HyperplaneBuckets.compute($c, $signsRef, $tables, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {

  /** ±1 sign per (plane, element): sign matrix row p, column i. */
  def signMatrix(planes: Int): Array[Byte] = {
    val m = new Array[Byte](planes * 64)
    var p = 0
    while (p < planes) {
      var i = 0
      while (i < 64) {
        val lcg = (i + 64L * p) * 1103515245L + 12345L
        m(p * 64 + i) = if (((lcg >> 16) & 1L) == 1L) 1 else -1
        i += 1
      }
      p += 1
    }
    m
  }

  /** Called from generated code — static, allocation-light. */
  def compute(q: ArrayData, signs: Array[Byte], tables: Int,
      bits: Int): ArrayData = {
    val out = new Array[Long](tables)
    val n = q.numElements()
    if (n < 64) return new GenericArrayData(out) // null-padded sums → 0
    var base = 0L
    var i = 0
    while (i < n) {
      if (q.isNullAt(i)) return new GenericArrayData(out) // null sum → 0
      if (i >= 64) base -= q.getLong(i) // null seq index → otherwise(-x)
      i += 1
    }
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val off = (t * bits + j) * 64
        var s = base
        var k = 0
        while (k < 64) {
          s += signs(off + k) * q.getLong(k)
          k += 1
        }
        if (s >= 0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level accessor usable from any package. */
  def of(q: Column, tables: Int, bits: Int): Column =
    ExpressionUtils.column(
      HyperplaneBuckets(ExpressionUtils.expression(q), tables, bits))
}
