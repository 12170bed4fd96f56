package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding math (dot product and L2
  * norm over `array<float>` columns), replacing the SQL higher-order
  * `aggregate(zip_with(...))` formulations: higher-order functions evaluate
  * a lambda per element through the interpreted expression path and block
  * whole-stage codegen around them, while these generate a tight primitive
  * loop inside the stage (`doGenCode`) — the preference order for engine
  * extensions: native codegen Expression over lambda-composition over UDF.
  * Float elements are widened to double before multiply/accumulate, in the
  * same left-to-right order as the SQL `aggregate` they replace, so scores
  * are bit-identical and the DuckDB oracles stay green. */
object VectorExprs {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Σ aᵢ·bᵢ of two float arrays (double accum). NULL-parity with the SQL
    * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` it replaces: unequal
    * lengths → NULL (zip_with null-pads the shorter side and the null
    * propagates through the sum — it does NOT truncate), and any NULL
    * element → NULL. A malformed vector must surface as NULL and fall out
    * of a top-k orderBy, never as a silent partial sum. */
  final case class DotProductF(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs, got ${left.dataType} / ${right.dataType}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product_f"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $s;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** √(Σ xᵢ²) of a float array (double accum, same order as the SQL form);
    * a NULL element propagates to a NULL result, exactly as it does through
    * the SQL `aggregate` accumulator. */
  final case class L2NormF(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> input, got ${child.dataType}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "l2_norm_f"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getFloat(i).toDouble
        s += v * v
        i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $v = (double) $a.getFloat($i);
           |  $s += $v * $v;
           |}
           |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column builders. */
  def dotF(a: Column, b: Column): Column =
    GraftColumnBridge.columnOf(DotProductF(
      GraftColumnBridge.expressionOf(a), GraftColumnBridge.expressionOf(b)))

  def l2normF(a: Column): Column =
    GraftColumnBridge.columnOf(L2NormF(GraftColumnBridge.expressionOf(a)))
}
