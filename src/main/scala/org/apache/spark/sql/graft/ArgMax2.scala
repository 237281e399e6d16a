/** Lives under org.apache.spark.sql for the private[sql]
  * Column↔Expression bridge, like I128Sum. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Hash-aggregable argmax with an explicit tie-break — the drop-in
  * replacement for the `max(struct(ord, tie))` idiom.
  *
  * Why: `Max` over a struct carries the struct itself in the
  * aggregation buffer, and a non-primitive buffer disqualifies the
  * plan from `HashAggregateExec` — every `max(struct(...))` argmax in
  * the engine silently ran as a partial+final SORT aggregate, i.e. a
  * full sort of the pre-aggregation table. Invisible at the gate
  * scale; at sf10 the LPA rounds' neighbor-vote sort was the single
  * largest spiller in the shuffle audit (~90 GB memory spill per
  * communities run). This aggregate keeps the exact same selection
  * semantics but buffers two primitives (`ord`, `tie`) plus a seen
  * flag, so it codegens into whole-stage hash aggregation — argmax
  * over a corpus-scale table becomes one hash-aggregate again, the
  * shape every scale-path scaladoc in queries/ already claims.
  *
  * Selection contract (identical to `max(struct(ord, tie))` on the
  * engine's call sites): the row with the greatest `ord` wins; equal
  * `ord` falls to the greatest `tie` (callers pass a NEGATED key to
  * select the smallest id — the established `(-lab)` convention).
  * Rows where `ord` or `tie` is null are skipped (the call sites
  * never produce one — both come from joins/aggregates over non-null
  * columns); an empty/all-null group evaluates to a null struct.
  * Result: `struct(ord, tie)` with the winning pair, field names
  * `ord`/`tie`.
  *
  * Doubles compare with primitive `>`: parity with struct ordering
  * holds for finite values, which is what the call sites feed it
  * (fixed-point longs, `round(x, 6)` cosines — never NaN/±Inf).
  */
case class ArgMax2(left: Expression, right: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression]
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(NumericType, LongType)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("ord", left.dataType, nullable = false),
    StructField("tie", LongType, nullable = false)))
  override def prettyName: String = "argmax2"

  private lazy val bOrd =
    AttributeReference("bOrd", left.dataType, nullable = false)()
  private lazy val bTie =
    AttributeReference("bTie", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bOrd, bTie, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.default(left.dataType), Literal(0L), Literal(false))

  /** (newOrd, newTie) beats (curOrd, curTie) under the max-then-max
    * ordering — or nothing has been seen yet. */
  private def beats(curSeen: Expression,
      curOrd: Expression, curTie: Expression,
      newOrd: Expression, newTie: Expression): Expression =
    Or(Not(curSeen),
      Or(GreaterThan(newOrd, curOrd),
        And(EqualTo(newOrd, curOrd), GreaterThan(newTie, curTie))))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(left), IsNotNull(right))
    val take = And(valid, beats(seen, bOrd, bTie, left, right))
    Seq(
      If(take, left, bOrd),
      If(take, right, bTie),
      Or(seen, valid))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(seen.right,
      beats(seen.left, bOrd.left, bTie.left, bOrd.right, bTie.right))
    Seq(
      If(take, bOrd.right, bOrd.left),
      If(take, bTie.right, bTie.left),
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen,
      CreateNamedStruct(Seq(
        Literal("ord"), bOrd, Literal("tie"), bTie)),
      Literal(null, dataType))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMax2 =
    copy(left = newLeft, right = newRight)
}

object ArgMax2 {
  /** `argmax2(ord, tie)` as a Column: the winning `struct(ord, tie)`
    * under greatest-ord-then-greatest-tie. Negate `tie` to pick the
    * SMALLEST key on ties (the call-site convention). */
  def of(ord: Column, tie: Column): Column =
    ExpressionUtils.column(
      ArgMax2(ExpressionUtils.expression(ord),
        ExpressionUtils.expression(tie)).toAggregateExpression())
}
