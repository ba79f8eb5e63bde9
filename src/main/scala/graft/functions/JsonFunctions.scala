package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, udf}
import scala.jdk.CollectionConverters._

/** SQLite JSON1 mutation/inspection functions Spark lacks (SURVEY §2A
  * row 29): json_set / json_insert / json_replace / json_remove /
  * json_patch (RFC 7386) / json_type / json_valid / json_quote.
  *
  * These are Scala UDFs over Jackson (which Spark already bundles) rather
  * than codegen'd expressions: document mutation is inherently
  * tree-structured, and these functions sit in ETL-style projections, not
  * scan/filter hot paths (the extraction hot path — json_extract/->> —
  * maps to Spark's native get_json_object/from_json, see f04). Output is
  * minified with insertion-ordered keys, matching SQLite's rendering.
  *
  * Value arguments are raw JSON fragments (`"7"`, `"[1,2]"`,
  * `"\"text\""`); use [[jsonQuote]] to build a fragment from a string
  * column and `.cast("string")` for numeric columns.
  */
object JsonFunctions {

  @transient private lazy val mapper = new ObjectMapper()

  private sealed trait Part
  private case class Key(k: String) extends Part
  private case class Idx(i: Int) extends Part

  private val token = """\.([^.\[\]]+)|\[(\d+)\]""".r

  private def parsePath(p: String): Seq[Part] = {
    require(p != null && p.startsWith("$"), s"json path must start with $$: $p")
    token.findAllMatchIn(p.drop(1)).map { m =>
      if (m.group(1) != null) Key(m.group(1)) else Idx(m.group(2).toInt)
    }.toSeq
  }

  /** Shared walk-and-mutate core. `valueJson=None` means remove.
    * SQLite semantics: set = create or replace; insert = create only;
    * replace = overwrite only; missing intermediate object keys are
    * created on the create paths; out-of-range array writes append. */
  private def mutate(doc: String, path: String, valueJson: Option[String],
      createOk: Boolean, replaceOk: Boolean): String = {
    if (doc == null) return null
    val root = try mapper.readTree(doc) catch { case _: Exception => return null }
    val parts = parsePath(path)
    if (parts.isEmpty) return mapper.writeValueAsString(root)
    var node: JsonNode = root
    for (p <- parts.dropRight(1)) {
      node = (p, node) match {
        case (Key(k), o: ObjectNode) =>
          if (o.has(k)) o.get(k)
          else if (createOk && valueJson.isDefined) {
            val child = mapper.createObjectNode(); o.set(k, child); child
          } else return mapper.writeValueAsString(root)
        case (Idx(i), a: ArrayNode) if i < a.size() => a.get(i)
        case _ => return mapper.writeValueAsString(root)
      }
    }
    (parts.last, node) match {
      case (Key(k), o: ObjectNode) => valueJson match {
        case Some(v) =>
          val exists = o.has(k)
          if ((exists && replaceOk) || (!exists && createOk)) {
            o.set(k, mapper.readTree(v)); ()
          }
        case None => o.remove(k); ()
      }
      case (Idx(i), a: ArrayNode) => valueJson match {
        case Some(v) =>
          if (i < a.size()) { if (replaceOk) { a.set(i, mapper.readTree(v)); () } }
          else if (createOk) { a.add(mapper.readTree(v)); () }
        case None => if (i < a.size()) { a.remove(i); () }
      }
      case _ => ()
    }
    mapper.writeValueAsString(root)
  }

  /** RFC 7386 merge patch (SQLite json_patch): null removes, objects
    * recurse, everything else replaces. */
  private def patchNodes(target: JsonNode, patch: JsonNode): JsonNode =
    patch match {
      case po: ObjectNode =>
        val base = target match {
          case to: ObjectNode => to
          case _ => mapper.createObjectNode()
        }
        po.fields().asScala.toSeq.foreach { e =>
          if (e.getValue.isNull) { base.remove(e.getKey); () }
          else if (e.getValue.isObject) {
            base.set(e.getKey, patchNodes(base.path(e.getKey), e.getValue)); ()
          } else { base.set(e.getKey, e.getValue); () }
        }
        base
      case other => other
    }

  private def typeName(n: JsonNode): String =
    if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "text"
    else if (n.isIntegralNumber) "integer"
    else if (n.isNumber) "real"
    else if (n.isBoolean) { if (n.asBoolean()) "true" else "false" }
    else "null"

  private val setU = udf((d: String, p: String, v: String) =>
    mutate(d, p, Option(v), createOk = true, replaceOk = true))
  private val insertU = udf((d: String, p: String, v: String) =>
    mutate(d, p, Option(v), createOk = true, replaceOk = false))
  private val replaceU = udf((d: String, p: String, v: String) =>
    mutate(d, p, Option(v), createOk = false, replaceOk = true))
  private val removeU = udf((d: String, p: String) =>
    mutate(d, p, None, createOk = false, replaceOk = true))
  private val patchU = udf((t: String, p: String) => {
    if (t == null || p == null) null
    else try mapper.writeValueAsString(
      patchNodes(mapper.readTree(t), mapper.readTree(p)))
    catch { case _: Exception => null }
  })
  private val typeU = udf((d: String, p: String) => {
    if (d == null) null
    else try {
      val target = parsePath(p).foldLeft(Option(mapper.readTree(d): JsonNode)) {
        case (Some(o: ObjectNode), Key(k)) if o.has(k) => Some(o.get(k))
        case (Some(a: ArrayNode), Idx(i)) if i < a.size() => Some(a.get(i))
        case _ => None
      }
      target.map(typeName).orNull
    } catch { case _: Exception => null }
  })
  private val validU = udf((d: String) =>
    if (d == null) 0L
    else try { mapper.readTree(d); 1L } catch { case _: Exception => 0L })
  private val quoteU = udf((s: String) =>
    if (s == null) "null" else mapper.writeValueAsString(new TextNode(s)))

  def jsonSet(doc: Column, path: String, valueJson: Column): Column =
    setU(doc, lit(path), valueJson)
  def jsonInsert(doc: Column, path: String, valueJson: Column): Column =
    insertU(doc, lit(path), valueJson)
  def jsonReplace(doc: Column, path: String, valueJson: Column): Column =
    replaceU(doc, lit(path), valueJson)
  def jsonRemove(doc: Column, path: String): Column = removeU(doc, lit(path))
  def jsonPatch(target: Column, patch: Column): Column = patchU(target, patch)
  def jsonType(doc: Column, path: String): Column = typeU(doc, lit(path))
  def jsonValid(doc: Column): Column = validU(doc)
  def jsonQuote(text: Column): Column = quoteU(text)
}
