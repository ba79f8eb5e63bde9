package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Runtime kernels for the JSON1 Catalyst expressions
  * ([[JsonExpressions]]): static methods called from generated code, the
  * same pattern Spark's own built-ins use for tree-structured work that
  * does not inline. Operating on UTF8String keeps the call inside
  * whole-stage codegen with no Row/ScalaUDF conversion layer.
  *
  * Semantics are SQLite JSON1 (lang_json1.html): set = create or replace,
  * insert = create only, replace = overwrite only, out-of-range array
  * writes append, malformed documents yield NULL; json_patch is RFC 7386.
  * Output is minified with insertion-ordered keys, matching SQLite's
  * rendering.
  */
object JsonOps {

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

  private def out(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** Shared walk-and-mutate core; mode is "set" | "insert" | "replace". */
  def mutate(docU: UTF8String, pathU: UTF8String, valueU: UTF8String,
      mode: String): UTF8String = {
    val (createOk, replaceOk) = mode match {
      case "set" => (true, true)
      case "insert" => (true, false)
      case _ => (false, true)
    }
    out(mutateStr(docU.toString, pathU.toString, Some(valueU.toString),
      createOk, replaceOk))
  }

  def remove(docU: UTF8String, pathU: UTF8String): UTF8String =
    out(mutateStr(docU.toString, pathU.toString, None,
      createOk = false, replaceOk = true))

  private def mutateStr(doc: String, path: String, valueJson: Option[String],
      createOk: Boolean, replaceOk: Boolean): String = {
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
  def patch(targetU: UTF8String, patchU: UTF8String): UTF8String =
    out(try mapper.writeValueAsString(
      patchNodes(mapper.readTree(targetU.toString), mapper.readTree(patchU.toString)))
    catch { case _: Exception => null })

  private def patchNodes(target: JsonNode, patch: JsonNode): JsonNode =
    patch match {
      case po: ObjectNode =>
        val base = target match {
          case to: ObjectNode => to
          case _ => mapper.createObjectNode()
        }
        po.properties().asScala.toSeq.foreach { e =>
          if (e.getValue.isNull) { base.remove(e.getKey); () }
          else if (e.getValue.isObject) {
            base.set(e.getKey, patchNodes(base.path(e.getKey), e.getValue)); ()
          } else { base.set(e.getKey, e.getValue); () }
        }
        base
      case other => other
    }

  /** SQLite json_type(doc, path): type name, or NULL for a missing path
    * or malformed document. */
  def typeOf(docU: UTF8String, pathU: UTF8String): UTF8String =
    out(try {
      val target = parsePath(pathU.toString)
        .foldLeft(Option(mapper.readTree(docU.toString): JsonNode)) {
          case (Some(o: ObjectNode), Key(k)) if o.has(k) => Some(o.get(k))
          case (Some(a: ArrayNode), Idx(i)) if i < a.size() => Some(a.get(i))
          case _ => None
        }
      target.map { n =>
        if (n.isObject) "object"
        else if (n.isArray) "array"
        else if (n.isTextual) "text"
        else if (n.isIntegralNumber) "integer"
        else if (n.isNumber) "real"
        else if (n.isBoolean) { if (n.asBoolean()) "true" else "false" }
        else "null"
      }.orNull
    } catch { case _: Exception => null })

  def valid(docU: UTF8String): Long =
    try { mapper.readTree(docU.toString); 1L } catch { case _: Exception => 0L }

  def quote(textU: UTF8String): UTF8String =
    out(mapper.writeValueAsString(new TextNode(textU.toString)))
}
