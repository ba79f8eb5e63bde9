package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst string expressions for SQLite functions Spark's
  * built-ins don't cover exactly. Codegen'd like [[JsonExpressions]]. */
object StringExpressions {

  /** One character from a full Unicode code point — the per-argument
    * kernel of SQLite's char(X1,...,XN) (lang_corefunc.html#char).
    * Spark's chr() wraps its argument modulo 256 (ASCII/Latin-1 only), so
    * char(955) would yield '»' instead of 'λ'. Out-of-range points and
    * lone surrogates become U+FFFD, matching SQLite's clamp of invalid
    * values to the replacement character. */
  case class CodePointChar(child: Expression) extends UnaryExpression {
    // child is wrapped in Cast(_, LongType) at construction (registry),
    // so eval/codegen always see a long
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "char"

    override protected def nullSafeEval(x: Any): Any =
      StringOps.codePointChar(x.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.StringOps.codePointChar($x)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}

/** Static kernels called from generated code (must be a top-level class
  * with JVM-static methods for janino). */
object StringOps {
  def codePointChar(x: Long): UTF8String = {
    val cp =
      if (x < 0L || x > 0x10FFFFL || (x >= 0xD800L && x <= 0xDFFFL)) 0xFFFD
      else x.toInt
    UTF8String.fromString(new String(Character.toChars(cp)))
  }
}
