package graft.functions

import org.apache.spark.sql.{graftbridge, Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: double-precision dot product of two
  * `array<float>` columns, accumulated in list order (left fold — reproducible
  * across engines and identical to the UDF/`aggregate` formulations).
  * Mismatched lengths yield NULL, matching the `zip_with`+`aggregate` HOF
  * formulation (zip_with null-pads the shorter side and the sum of a null
  * product is null) — a silently truncated dot product would be plausible but
  * wrong.
  *
  * Rationale (SURVEY.md §4 extension): the embedding-similarity sweep is the
  * one hot numeric kernel in the engine. Catalyst's `aggregate`/`zip_with`
  * higher-order functions are CodegenFallback (interpreted per element) and a
  * Scala UDF pays a serialization copy per row; this expression stays inside
  * whole-stage codegen and reads the columnar `ArrayData` directly.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  // getFloat() on a non-float array would silently read garbage — reject at
  // analysis time instead.
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).collect { case ArrayType(FloatType, _) => () } match {
      case Seq((), ()) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  // nullable even with non-null children: length mismatch or a null array
  // element returns NULL
  override def nullable: Boolean = true

  // element-null checks are only emitted when the input TYPE admits null
  // elements — parquet-read arrays usually do — keeping the common dense
  // loop branch-free when the schema proves elements non-null
  private def mayHaveNullElements: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = mayHaveNullElements
    var i = 0
    var s = 0.0
    while (i < n) {
      // a null element makes the product NULL, matching the zip_with/
      // aggregate HOF form — getFloat on a null slot would read 0.0 silently
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck = if (mayHaveNullElements)
        s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Expose as a Column — plan-level, works in any session, no registration. */
  def apply(a: Column, b: Column): Column =
    graftbridge.column(DotProduct(graftbridge.expression(a), graftbridge.expression(b)))
}

/** SQL-name registration for the engine's native expressions:
  * `spark.sql.extensions=graft.functions.GraftExtensions` →
  * `SELECT graft_dot(a, b)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          s"graft_dot requires exactly 2 arguments, got ${exprs.length}")
      }))
}
