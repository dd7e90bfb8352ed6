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

/** SQL-name registration for the engine's function surface:
  * `spark.sql.extensions=graft.functions.GraftExtensions` gives `spark.sql`
  * users the same kernels the DataFrame API composes — the native codegen
  * dot product plus the column-composed text/similarity functions (each
  * built from the SAME shared Column definition as its DataFrame twin, so
  * the two surfaces cannot drift):
  *
  *  - `graft_dot(a, b)`       — double dot product of two array<float>
  *  - `graft_cosine(a, b)`    — cosine similarity of two array<float>
  *  - `graft_token_count(t)`  — whitespace token count (BIGINT)
  *  - `graft_quality(t)`      — composite quality score (DOUBLE)
  *  - `graft_fingerprint(t)`  — whitespace-normalized md5 fingerprint
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == n,
          s"$name requires exactly $n argument(s), got ${exprs.length}")
        build(exprs)
      })

  /** Compose a registered function from Column-level definitions: wrap the
    * argument expressions as Columns, build with the shared definition, and
    * EAGERLY convert the result to a catalyst tree (a lazy column-node
    * wrapper would reach codegen unresolved — see graftbridge.expressionNow). */
  private def viaColumns(build: Seq[Column] => Column)(
      exprs: Seq[Expression]): Expression =
    graftbridge.expressionNow(build(exprs.map(graftbridge.column)))

  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.functions.{size, sqrt}
    e.injectFunction(arity("graft_dot", 2) {
      case Seq(a, b) => DotProduct(a, b)
    })
    e.injectFunction(arity("graft_cosine", 2)(viaColumns {
      case Seq(a, b) =>
        DotProduct(a, b) / (sqrt(DotProduct(a, a)) * sqrt(DotProduct(b, b)))
    }))
    e.injectFunction(arity("graft_token_count", 1)(viaColumns {
      case Seq(t) => size(graft.ext.TextStats.toks(t)).cast("long")
    }))
    e.injectFunction(arity("graft_quality", 1)(viaColumns {
      case Seq(t) => graft.ext.TextStats.qualityScore(t)
    }))
    e.injectFunction(arity("graft_fingerprint", 1)(viaColumns {
      case Seq(t) => graft.ext.TextStats.fingerprint(t)
    }))
  }
}
