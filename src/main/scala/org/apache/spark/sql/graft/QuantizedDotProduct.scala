/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Column↔Expression bridge (ExpressionUtils) and AbstractDataType —
  * the standard packaging technique for native Catalyst extensions.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression for the hot loop of similarity search:
  * int64 dot product over two quantized embedding arrays with full
  * whole-stage codegen — a tight primitive loop, no HigherOrderFunction
  * lambda dispatch, no boxing. SURVEY §7.3: "Vector similarity →
  * custom Expression (codegen dot-product)". Semantics match
  * aggregate(zip_with(a, b, _*_), 0L, _+_) with min-length zip
  * (equivalence proven in graft.VectorExprSpec).
  */
case class QuantizedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  /** A null ELEMENT nulls the whole product, exactly like the
    * aggregate(zip_with(a, b, _*_), 0L, _+_) twin this expression
    * replaces (null product → null accumulator). */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDotProduct {
  /** Column-level accessor usable from any package. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(QuantizedDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
