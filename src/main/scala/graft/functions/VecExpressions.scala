package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native kernel for the row×row cosine (r18 optimization): the HOF
  * formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_) / (sqrt(...)
  * * sqrt(...))` evaluates THREE interpreted per-element folds per pair —
  * StageProfile measured ~89 µs/pair on 64-dim vectors, 178 s of CPU for
  * p17's all-pairs verification baseline at sf0.1. One compiled loop does
  * the same arithmetic in the same IEEE order.
  *
  * Bitwise compatibility is the design constraint (the oracles hash
  * every rounded sim): the kernel reproduces the HOF's exact float-op
  * sequence — dot = ((0.0 + a0·b0) + a1·b1) + …, each norm the same fold
  * over squares, result dot / (sqrt(na) * sqrt(nb)) — and its exact NULL
  * semantics: zip_with pads a length mismatch with null and aggregate's
  * `acc + null` poisons the fold, so ANY null element or length mismatch
  * yields NULL, which the kernel replicates by returning null in exactly
  * those cases; likewise Spark's Divide yields NULL on a zero divisor
  * (zero-norm vector), which the kernel reproduces. One documented
  * deviation: under ANSI mode (the session default) the HOF's division
  * RAISES DIVIDE_BY_ZERO on a zero norm — the kernel returns the
  * non-ANSI NULL instead of erroring; no declared corpus carries
  * zero-norm vectors. OperatorsSpec pins kernel == non-ANSI HOF bitwise
  * on adversarial inputs (mismatched lengths, null elements, empties,
  * zero norms, NaN/Inf). */
object VecExpressions {

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_sim"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      VecOps.cosine(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val res = ctx.freshName("cosRes")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Double $res = graft.functions.VecOps.cosine($a, $b);
           |if ($res == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $res.doubleValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}

/** Static kernel (top-level object, JVM-static methods for janino). */
object VecOps {

  /** cosine of two array<double> columns, or null under the HOF's
    * null-poisoning rules (any null element, or a length mismatch whose
    * zip_with padding injects one). */
  def cosine(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la != lb) return null
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    i = 0
    while (i < la) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val divisor = math.sqrt(na) * math.sqrt(nb)
    // Spark's Divide is NULL on a zero divisor (non-ANSI; ANSI errors) —
    // never IEEE Infinity. A NaN divisor is NOT zero and divides through.
    if (divisor == 0.0) null
    else java.lang.Double.valueOf(dot / divisor)
  }
}
