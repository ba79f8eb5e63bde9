package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TypeOf}
import org.apache.spark.sql.functions._

/** Registers the SQLite built-ins Spark lacks under their SQLite NAMES in
  * a session's function registry, so the engine's SQL dialect accepts
  * `SELECT iif(...), strftime(...), group_concat(...)` exactly as the
  * reference does (SQLite core functions, lang_corefunc.html — the
  * reference executes them inside SQLite's VDBE; here they resolve to the
  * same codegen'd Column compositions the f-pack oracle-checks).
  *
  * Implementations delegate to [[SqliteFunctions]]/[[JsonFunctions]];
  * arguments that SQLite requires to be compile-time constants (format
  * strings, paths, separators) must be literals, enforced with a clear
  * error. `typeof` is built on the Catalyst TypeOf node directly — going
  * through `call_function("typeof", ...)` would resolve back to this very
  * registration and loop.
  */
object SqliteRegistry {

  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def ex(col: Column): Expression = GraftSqlBridge.eagerExpression(col)

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v, _) if v != null => v.toString
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Number, _) => v.intValue()
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  def register(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    def put(name: String)(b: Seq[Expression] => Column): Unit =
      reg.createOrReplaceTempFunction(name, exprs => ex(b(exprs)), "scala_udf")

    put("iif") { a => SqliteFunctions.iif(c(a(0)), c(a(1)), c(a(2))) }
    put("total") { a => SqliteFunctions.total(c(a(0))) }
    put("group_concat") { a =>
      val sep = if (a.length > 1) strLit(a(1), "group_concat separator") else ","
      SqliteFunctions.groupConcatOrdered(c(a(0)), sep)
    }
    put("unixepoch") { a => SqliteFunctions.unixepoch(c(a(0))) }
    put("julianday") { a => SqliteFunctions.julianday(c(a(0))) }
    put("strftime") { a =>
      val base =
        if (a.length > 2)
          SqliteFunctions.dateModify(c(a(1)),
            a.drop(2).map(strLit(_, "strftime modifier")): _*)
        else c(a(1))
      SqliteFunctions.strftime(strLit(a(0), "strftime format"), base)
    }
    put("date") { a =>
      val base =
        if (a.length > 1)
          SqliteFunctions.dateModify(c(a(0)),
            a.drop(1).map(strLit(_, "date modifier")): _*)
        else c(a(0))
      SqliteFunctions.strftime("%Y-%m-%d", base)
    }
    put("datetime") { a =>
      val base =
        if (a.length > 1)
          SqliteFunctions.dateModify(c(a(0)),
            a.drop(1).map(strLit(_, "datetime modifier")): _*)
        else c(a(0))
      SqliteFunctions.strftime("%Y-%m-%d %H:%M:%S", base)
    }
    // glob(PATTERN, VALUE) per SQLite's two-arg form (Y GLOB X rewrites to
    // glob(X, Y))
    put("glob") { a => SqliteFunctions.glob(c(a(1)), strLit(a(0), "glob pattern")) }
    put("typeof") { a =>
      val t = c(TypeOf(a(0)))
      val v = c(a(0))
      when(v.isNull, "null").otherwise(
        when(t.isin("tinyint", "smallint", "int", "bigint"), "integer")
          .when(t.isin("float", "double", "decimal"), "real")
          .when(t === "binary", "blob")
          .otherwise("text"))
    }
    put("zeroblob") { a => SqliteFunctions.zeroblob(intLit(a(0), "zeroblob size")) }
    put("randomblob") { a =>
      // n pseudo-random bytes; SQLite's is also non-deterministic
      val n = intLit(a(0), "randomblob size")
      unhex(concat((0 until n).map(_ =>
        lpad(hex((rand() * 256).cast("int")), 2, "0")): _*))
    }
    put("quote") { a => SqliteFunctions.quoteText(c(a(0))) }
    put("likely") { a => SqliteFunctions.likely(c(a(0))) }
    put("unlikely") { a => SqliteFunctions.unlikely(c(a(0))) }
    put("likelihood") { a =>
      SqliteFunctions.likelihood(c(a(0)),
        strLit(a(1), "likelihood probability").toDouble)
    }
    put("sqlite_version") { _ => SqliteFunctions.sqliteVersion }
    // printf/format (lang_corefunc.html; format is the 3.38 alias) — C-style
    // %d/%s/%f tokens match java.util.Formatter's for the common cases
    put("printf") { a =>
      c(org.apache.spark.sql.catalyst.expressions.FormatString(a: _*))
    }
    put("format") { a =>
      c(org.apache.spark.sql.catalyst.expressions.FormatString(a: _*))
    }
    // unicode(X) = first code point; char(X1, X2, ...) = string from FULL
    // Unicode code points (Spark's chr() wraps modulo 256, so it can't
    // build char(955) = 'λ' — the native expression can)
    put("unicode") { a => ascii(c(a(0))) }
    put("char") { a =>
      concat(a.map(x => c(StringExpressions.CodePointChar(
        org.apache.spark.sql.catalyst.expressions.Cast(
          x, org.apache.spark.sql.types.LongType)))): _*)
    }
    // JSON1 (SURVEY §2A row 29): extraction maps to Spark's native
    // get_json_object; mutation/inspection to the native Catalyst pack
    put("json_extract") { a =>
      get_json_object(c(a(0)), strLit(a(1), "json path"))
    }
    put("json_set") { a => jsonPairs(a, "set") }
    put("json_insert") { a => jsonPairs(a, "insert") }
    put("json_replace") { a => jsonPairs(a, "replace") }
    put("json_remove") { a =>
      a.drop(1).foldLeft(c(a(0)))((doc, p) =>
        JsonFunctions.jsonRemove(doc, strLit(p, "json path")))
    }
    put("json_patch") { a => JsonFunctions.jsonPatch(c(a(0)), c(a(1))) }
    put("json_type") { a =>
      if (a.length > 1) JsonFunctions.jsonType(c(a(0)), strLit(a(1), "json path"))
      else JsonFunctions.jsonType(c(a(0)), "$")
    }
    put("json_valid") { a => JsonFunctions.jsonValid(c(a(0))) }
    put("json_quote") { a => JsonFunctions.jsonQuote(c(a(0))) }
  }

  /** SQLite's variadic json_set/insert/replace(doc, p1, v1, p2, v2, ...)
    * folds left over the (path, value) pairs. */
  private def jsonPairs(a: Seq[Expression], mode: String): Column = {
    require(a.length >= 3 && a.length % 2 == 1,
      s"json_$mode takes a document plus (path, value) pairs")
    a.drop(1).grouped(2).foldLeft(c(a.head)) { case (doc, Seq(p, v)) =>
      mode match {
        case "set" => JsonFunctions.jsonSet(doc, strLit(p, "json path"), c(v))
        case "insert" => JsonFunctions.jsonInsert(doc, strLit(p, "json path"), c(v))
        case _ => JsonFunctions.jsonReplace(doc, strLit(p, "json path"), c(v))
      }
    }
  }
}
