package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, lit}
import graft.functions.JsonExpressions._

/** SQLite JSON1 mutation/inspection functions Spark lacks (SURVEY §2A
  * row 29): json_set / json_insert / json_replace / json_remove /
  * json_patch (RFC 7386) / json_type / json_valid / json_quote.
  *
  * Each is a native Catalyst expression ([[JsonExpressions]]) whose
  * codegen calls a static [[JsonOps]] kernel on UTF8String — the round-1
  * audit's "only per-row UDFs in the SQL surface" are gone; these now
  * participate in whole-stage codegen like Spark's built-ins. The
  * extraction hot path (json_extract/->>) maps to Spark's native
  * get_json_object/from_json, see f04.
  *
  * Value arguments are raw JSON fragments (`"7"`, `"[1,2]"`,
  * `"\"text\""`); use [[jsonQuote]] to build a fragment from a string
  * column and `.cast("string")` for numeric columns.
  */
object JsonFunctions {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  private def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)

  def jsonSet(doc: Column, path: String, valueJson: Column): Column =
    col(JsonMutate(expr(doc), expr(lit(path)), expr(valueJson), "set"))
  def jsonInsert(doc: Column, path: String, valueJson: Column): Column =
    col(JsonMutate(expr(doc), expr(lit(path)), expr(valueJson), "insert"))
  def jsonReplace(doc: Column, path: String, valueJson: Column): Column =
    col(JsonMutate(expr(doc), expr(lit(path)), expr(valueJson), "replace"))
  def jsonRemove(doc: Column, path: String): Column =
    col(JsonRemove(expr(doc), expr(lit(path))))
  def jsonPatch(target: Column, patch: Column): Column =
    col(JsonPatch(expr(target), expr(patch)))
  def jsonType(doc: Column, path: String): Column =
    col(JsonType(expr(doc), expr(lit(path))))
  /** SQLite json_valid(NULL) = 0, preserved via coalesce over the
    * null-intolerant expression. */
  def jsonValid(doc: Column): Column =
    coalesce(col(JsonValid(expr(doc))), lit(0L))
  /** json_quote of SQL NULL renders the JSON null literal. */
  def jsonQuote(text: Column): Column =
    coalesce(col(JsonQuote(expr(text))), lit("null"))
}
