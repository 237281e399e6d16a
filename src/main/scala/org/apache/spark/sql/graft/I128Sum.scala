/** Lives under org.apache.spark.sql for the private[sql]
  * Column↔Expression bridge, like QuantizedDotProduct. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Exact order-independent double sum — the codegen'd replacement for
  * the decimal-routed `sum(cast(x as decimal(28,6)))` parity trick
  * (Tables.dsum). Same numeric contract, ~half the cost on the q1 hot
  * path:
  *
  *  - per row, the input is rounded to 6 decimal places. The fast path
  *    is Spark's own double→Decimal(18,6) cast (bit-identical to the
  *    decimal route, and to the oracle's CAST(x AS DECIMAL(28,6)) on
  *    this data) whose unscaled long is extracted — no BigDecimal
  *    survives past the row. Rows the 18-digit cast can't hold
  *    (|x| ≥ 1e12) fall through LAZILY to [[DoubleI128Part]], which
  *    performs the identical HALF_UP rounding via one BigDecimal and
  *    splits the unscaled value into (hi, lo) longs — so large
  *    magnitudes are summed exactly instead of silently skipped
  *    (they'd otherwise look like nulls — the r2 ADVICE trap);
  *  - the aggregation buffer is a two-long i128 accumulator (hi +
  *    unsigned lo) updated with pure long arithmetic inside
  *    whole-stage codegen: wrapping adds (EvalMode.LEGACY — overflow
  *    IS the 128-bit carry mechanism, never user-facing) plus a
  *    branch-free carry: carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63;
  *  - exact up to ±2^127/1e6 ≈ 1.7e32 per GROUP total; a single ROW
  *    beyond that range raises (DoubleI128Part) rather than wrapping.
  *    Accumulator wrap itself is unreachable below ~1e26 rows of the
  *    max per-row magnitude;
  *  - finally the i128 converts once per GROUP: to double via
  *    BigDecimal(unscaled, 6).doubleValue ([[I128Sum]]) or to an exact
  *    Decimal ([[I128DecimalSum]], the optimizer-rewrite target).
  *
  * Sum semantics: null and non-finite (NaN/±Inf) inputs skipped —
  * exactly what the decimal cast route does (double→decimal cast
  * yields null for non-finite); empty/all-null group → null.
  */
trait I128SumLike extends DeclarativeAggregate with UnaryLike[Expression] {

  override def nullable: Boolean = true

  protected lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  protected lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  protected lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Wrapping 64-bit add — LEGACY mode so ANSI never throws; the
    * wrap-around is the carry into `hi`. */
  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Carry-out of the unsigned add a+b (= wrapped sum `s`). */
  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  /** (newHi, newLo) after adding the signed-128 value (vHi, vLo). */
  protected def add128(oldHi: Expression, oldLo: Expression,
      vHi: Expression, vLo: Expression): (Expression, Expression) = {
    val newLo = wadd(oldLo, vLo)
    val newHi = wadd(wadd(oldHi, vHi), carry(oldLo, vLo, newLo))
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // Fast path: Spark's own rounding, double → Decimal(18,6) →
    // unscaled long. LEGACY explicitly — the null on |x| ≥ 1e12 is the
    // signal to take the slow path, never a user-facing error.
    val fast =
      UnscaledValue(Cast(child, DecimalType(18, 6), None, EvalMode.LEGACY))
    // Slow path (evaluated ONLY when fast is null — Coalesce codegen
    // is lazy): identical HALF_UP rounding through one BigDecimal,
    // split into i128 halves. Null iff the input is null/NaN/±Inf.
    val slowLo = DoubleI128Part(child, hiHalf = false)
    val slowHi = DoubleI128Part(child, hiHalf = true)
    val vLoN = Coalesce(Seq(fast, slowLo)) // null ⇔ no contribution
    val vHiN = Coalesce(Seq(ShiftRight(fast, Literal(63)), slowHi))
    val vLo = Coalesce(Seq(vLoN, Literal(0L)))
    val vHi = Coalesce(Seq(vHiN, Literal(0L)))
    val (nHi, nLo) = add128(hi, lo, vHi, vLo)
    Seq(nHi, nLo, Or(seen, IsNotNull(vLoN)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nHi, nLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(nHi, nLo, Or(seen.left, seen.right))
  }
}

case class I128Sum(child: Expression)
    extends I128SumLike with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "i128_sum"

  override lazy val evaluateExpression: Expression =
    If(seen, I128ToDouble(hi, lo), Literal(null, DoubleType))

  override protected def withNewChildInternal(newChild: Expression): I128Sum =
    copy(child = newChild)
}

/** The same exact i128 sum, evaluated to an EXACT Decimal(precision, 6)
  * instead of a double — the drop-in replacement for
  * `Sum(Cast(x AS DECIMAL(p,6)))` that [[graft.plans.I128SumRewrite]]
  * installs (result precision must equal Sum's p+10-capped-38 widening
  * so the rewrite preserves the plan schema). A group total beyond the
  * result precision evaluates to null — the LEGACY decimal-sum
  * overflow behavior (reachable only ≥ 1e(precision-6), i.e. 1e32 for
  * the standard 38-digit result). */
case class I128DecimalSum(child: Expression, precision: Int)
    extends I128SumLike with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DecimalType(precision, 6)
  override def prettyName: String = "i128_decimal_sum"

  override lazy val evaluateExpression: Expression =
    If(seen, I128ToDecimal(hi, lo, precision),
      Literal(null, DecimalType(precision, 6)))

  override protected def withNewChildInternal(
      newChild: Expression): I128DecimalSum =
    copy(child = newChild)
}

/** (hi, unsigned lo) two's-complement i128 → the double value of
  * unscaled/1e6 — one BigDecimal per GROUP, identical to the decimal
  * route's final Decimal→Double cast. */
case class I128ToDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "i128_to_double"

  override def nullSafeEval(h: Any, l: Any): Any =
    I128ToDouble.toDouble(h.asInstanceOf[Long], l.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, l) => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.I128ToDouble.toDouble($h, $l);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object I128ToDouble {
  /** The i128 (hi, lo) as a BigInteger. Static so generated code can
    * call the converters directly. */
  def toBigInteger(hi: Long, lo: Long): java.math.BigInteger = {
    val unsignedLo = new java.math.BigInteger(java.lang.Long.toUnsignedString(lo))
    java.math.BigInteger.valueOf(hi).shiftLeft(64).add(unsignedLo)
  }

  def toDouble(hi: Long, lo: Long): Double =
    new java.math.BigDecimal(toBigInteger(hi, lo), 6).doubleValue()
}

/** i128 → exact Decimal(precision, 6); null when the total needs more
  * than `precision` digits (LEGACY decimal-sum overflow semantics). */
case class I128ToDecimal(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = DecimalType(precision, 6)
  override def nullable: Boolean = true
  override def prettyName: String = "i128_to_decimal"

  override def nullSafeEval(h: Any, l: Any): Any =
    I128ToDecimal.toDecimal(h.asInstanceOf[Long], l.asInstanceOf[Long], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      Decimal ${ev.value} = null;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        ${ev.value} = org.apache.spark.sql.graft.I128ToDecimal.toDecimal(
          ${leftGen.value}, ${rightGen.value}, $precision);
        ${ev.isNull} = (${ev.value} == null);
      }
    """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object I128ToDecimal {
  /** Static for generated code; null on precision overflow. */
  def toDecimal(hi: Long, lo: Long, precision: Int): org.apache.spark.sql.types.Decimal = {
    val bd = new java.math.BigDecimal(I128ToDouble.toBigInteger(hi, lo), 6)
    if (bd.precision > precision) null
    else org.apache.spark.sql.types.Decimal(bd, precision, 6)
  }
}

/** Slow-path per-row decomposition: double → HALF_UP scale-6 rounding
  * (the exact rounding Spark's double→decimal cast performs:
  * BigDecimal.valueOf(x).setScale(6, HALF_UP)) → the hi or lo long of
  * the i128 unscaled value. Null for null/NaN/±Inf input (skip, like
  * the decimal cast); RAISES if |x| exceeds the i128 range (~1.7e32) —
  * a value too large to accumulate must never be silently dropped. */
case class DoubleI128Part(child: Expression, hiHalf: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (hiHalf) "double_i128_hi" else "double_i128_lo"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val d = v.asInstanceOf[Double]
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null
      else java.lang.Long.valueOf(DoubleI128Part.part(d, hiHalf))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${childGen.isNull} && !Double.isNaN(${childGen.value})
          && !Double.isInfinite(${childGen.value})) {
        ${ev.isNull} = false;
        ${ev.value} = org.apache.spark.sql.graft.DoubleI128Part.part(
          ${childGen.value}, $hiHalf);
      }
    """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(
      newChild: Expression): DoubleI128Part = copy(child = newChild)
}

object DoubleI128Part {
  /** Static so generated code can call it directly. `x` finite. */
  def part(x: Double, hiHalf: Boolean): Long = {
    // BigDecimal.valueOf == scala BigDecimal(double) == what Spark's
    // Decimal(double) builds (canonical Double.toString repr) — the
    // HALF_UP setScale then matches Cast→Decimal bit-for-bit.
    val bi = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue()
    if (bi.bitLength > 127)
      throw new ArithmeticException(
        s"i128_sum: input $x exceeds the i128 accumulator range (~1.7e32)")
    if (hiHalf) bi.shiftRight(64).longValue() else bi.longValue()
  }
}

object I128Sum {
  /** Column-level accessor usable from any package. */
  def dsum(c: Column): Column =
    ExpressionUtils.column(
      I128Sum(ExpressionUtils.expression(c)).toAggregateExpression())
}
