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

  /** Unicode normalization for text-pipeline canonicalization (dedup and
    * fingerprinting treat 'é' composed and 'e'+COMBINING ACUTE as the same
    * document). Forms: "nfc" / "nfkc" (java.text.Normalizer), "strip"
    * (NFKD, drop combining marks — accent folding), "casefold" (strip +
    * locale-independent lowercase). Codegen'd like the JSON pack. */
  case class NormalizeText(child: Expression, form: String)
      extends UnaryExpression {
    require(StringOps.NormalForms.contains(form), s"unknown normal form: $form")
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = s"normalize_$form"

    override protected def nullSafeEval(x: Any): Any =
      StringOps.normalizeText(x.asInstanceOf[UTF8String], form)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        x => s"""graft.functions.StringOps.normalizeText($x, "$form")""")

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

  val NormalForms: Set[String] = Set("nfc", "nfkc", "strip", "casefold")

  def normalizeText(s: UTF8String, form: String): UTF8String = {
    import java.text.Normalizer
    val in = s.toString
    val out = form match {
      case "nfc" => Normalizer.normalize(in, Normalizer.Form.NFC)
      case "nfkc" => Normalizer.normalize(in, Normalizer.Form.NFKC)
      case "strip" =>
        Normalizer.normalize(in, Normalizer.Form.NFKD)
          .replaceAll("\\p{M}+", "")
      case "casefold" =>
        Normalizer.normalize(in, Normalizer.Form.NFKD)
          .replaceAll("\\p{M}+", "")
          .toLowerCase(java.util.Locale.ROOT)
      case other => throw new IllegalArgumentException(s"unknown normal form: $other")
    }
    UTF8String.fromString(out)
  }
}
