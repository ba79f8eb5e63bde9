package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the SQLite JSON1 mutation functions
  * (SURVEY §2A row 29) — the round-1 audit's "only per-row UDFs in the
  * SQL surface". As expressions they stay inside whole-stage codegen:
  * `doGenCode` emits a direct static call into [[JsonOps]] on UTF8String
  * values — no ScalaUDF wrapper, no Catalyst<->Scala converters, ordinary
  * null-safe codegen like Spark's own built-ins.
  *
  * Null semantics: any NULL input yields NULL (standard null-intolerant
  * expression contract); a malformed document or missing json_type path
  * yields NULL from the kernel, surfaced through `isNull`.
  */
object JsonExpressions {

  /** json_set / json_insert / json_replace — mode picks the create/replace
    * behavior (SQLite lang_json1.html#jins). */
  case class JsonMutate(doc: Expression, path: Expression, value: Expression,
      mode: String) extends TernaryExpression {
    override def first: Expression = doc
    override def second: Expression = path
    override def third: Expression = value
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = s"json_$mode"

    override protected def nullSafeEval(d: Any, p: Any, v: Any): Any =
      JsonOps.mutate(d.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
        v.asInstanceOf[UTF8String], mode)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (d, p, v) => s"""
        ${ev.value} = graft.functions.JsonOps.mutate($d, $p, $v, "$mode");
        ${ev.isNull} = ${ev.value} == null;""")

    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Expression =
      copy(doc = newFirst, path = newSecond, value = newThird)
  }

  /** json_remove(doc, path). */
  case class JsonRemove(doc: Expression, path: Expression)
      extends BinaryExpression {
    override def left: Expression = doc
    override def right: Expression = path
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_remove"

    override protected def nullSafeEval(d: Any, p: Any): Any =
      JsonOps.remove(d.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (d, p) => s"""
        ${ev.value} = graft.functions.JsonOps.remove($d, $p);
        ${ev.isNull} = ${ev.value} == null;""")

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression = copy(doc = newLeft, path = newRight)
  }

  /** json_patch(target, patch) — RFC 7386 merge patch. */
  case class JsonPatch(target: Expression, patchDoc: Expression)
      extends BinaryExpression {
    override def left: Expression = target
    override def right: Expression = patchDoc
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_patch"

    override protected def nullSafeEval(t: Any, p: Any): Any =
      JsonOps.patch(t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, p) => s"""
        ${ev.value} = graft.functions.JsonOps.patch($t, $p);
        ${ev.isNull} = ${ev.value} == null;""")

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression =
      copy(target = newLeft, patchDoc = newRight)
  }

  /** json_type(doc, path) — NULL for a missing path. */
  case class JsonType(doc: Expression, path: Expression)
      extends BinaryExpression {
    override def left: Expression = doc
    override def right: Expression = path
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_type"

    override protected def nullSafeEval(d: Any, p: Any): Any =
      JsonOps.typeOf(d.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (d, p) => s"""
        ${ev.value} = graft.functions.JsonOps.typeOf($d, $p);
        ${ev.isNull} = ${ev.value} == null;""")

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression = copy(doc = newLeft, path = newRight)
  }

  /** json_valid(doc) — 1/0. */
  case class JsonValid(doc: Expression)
      extends UnaryExpression {
    override def child: Expression = doc
    override def dataType: DataType = LongType
    override def prettyName: String = "json_valid"

    override protected def nullSafeEval(d: Any): Any =
      JsonOps.valid(d.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, d => s"graft.functions.JsonOps.valid($d)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(doc = newChild)
  }

  /** json_quote(text) — a JSON string fragment. */
  case class JsonQuote(text: Expression)
      extends UnaryExpression {
    override def child: Expression = text
    override def dataType: DataType = StringType
    override def prettyName: String = "json_quote"

    override protected def nullSafeEval(t: Any): Any =
      JsonOps.quote(t.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t => s"graft.functions.JsonOps.quote($t)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(text = newChild)
  }
}
