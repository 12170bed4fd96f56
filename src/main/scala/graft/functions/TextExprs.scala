package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions. [[TextExprs.RollingHashF]] is the document
  * fingerprint F-family rolling hash — `h ← (h·31 + codepoint) mod 2³¹−1`
  * over the string's code points — as a codegen loop, replacing a SQL
  * `aggregate(transform(sequence(...)))` that evaluated TWO interpreted
  * lambdas per character (and fenced whole-stage codegen). Code-point
  * iteration matches the DuckDB oracle's per-character `unicode(text[i:i])`
  * exactly (TextExprSpec pins equality on the testdata). */
object TextExprs {

  final case class RollingHashF(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}")
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash_f"

    override protected def nullSafeEval(a: Any): Any =
      hash(a.asInstanceOf[UTF8String].toString)

    def hash(s: String): Long = {
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % 2147483647L
        i += Character.charCount(cp)
      }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        val cp = ctx.freshName("cp")
        s"""
           |java.lang.String $s = $a.toString();
           |long $h = 0L;
           |int $i = 0;
           |while ($i < $s.length()) {
           |  int $cp = $s.codePointAt($i);
           |  $h = ($h * 31L + $cp) % 2147483647L;
           |  $i += java.lang.Character.charCount($cp);
           |}
           |${ev.value} = $h;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def rollingHashF(a: Column): Column =
    GraftColumnBridge.columnOf(RollingHashF(GraftColumnBridge.expressionOf(a)))
}
