package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two ARRAY<DOUBLE> columns with
  * whole-stage codegen — the hot kernel of the ANN/similarity operators as a
  * first-class expression (no UDF serialization boundary, stays inside the
  * generated loop).
  *
  * Null handling follows SQL arithmetic: null array → null result
  * (BinaryExpression default), a null ELEMENT in either array → null
  * result, and MISMATCHED lengths → null result — a corrupted or truncated
  * vector must rank nowhere and fail every threshold, not score as if the
  * hole were 0.0 or the tail didn't exist (a shorter vector's smaller norm
  * would otherwise INFLATE its cosine and displace genuine neighbors in
  * cosineTopK/cosinePairs). The Column constructor casts both inputs to
  * ARRAY<DOUBLE>, so no ExpectsInputTypes contract is needed.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null can surface from ELEMENT nulls even when both array columns are
  // non-nullable — and this also guarantees codegen allocates a real
  // isNull variable for the mid-loop assignment below
  override def nullable: Boolean = true

  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |}
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column API: `array_dot(a, b)` over ARRAY<DOUBLE> (inputs are cast). */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(ArrayDotProduct(
      ColumnShim.expression(a.cast("array<double>")),
      ColumnShim.expression(b.cast("array<double>"))))
}
