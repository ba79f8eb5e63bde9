package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL authorizer (B9): per-statement access-key checks.
  *
  * The reference hooks SQLite's authorizer callback and checks 25 action
  * codes against the access key's privileges
  * (pkg/database/database_connection.go:608-690; privilege names
  * pkg/auth/database_privileges.go:4-45). We get a better seam: the parsed
  * Catalyst plan. The statement kind decides the required verb privilege;
  * for reads we additionally walk the plan for every referenced relation
  * and check table-granular read access.
  */
case class AccessKey(id: String, privileges: Set[String],
    tableAllow: Set[String] = Set("*")) {
  def can(priv: String): Boolean =
    privileges.contains("*") || privileges.contains(priv)
  def canReadTable(t: String): Boolean =
    tableAllow.contains("*") || tableAllow.contains(t.toLowerCase)
}

object AccessKey {
  /** Root key: everything allowed. */
  val root: AccessKey = AccessKey("root", Set("*"))
}

class DeniedException(msg: String) extends RuntimeException(msg)

object Authorizer {

  /** Privilege demanded by a statement kind (subset of
    * database_privileges.go relevant to our engine). */
  def requiredPrivilege(stmt: String): Seq[String] = {
    val s = stmt.trim
    val k = Classifier.kind(s)
    k match {
      case "dql" => Seq("database:query", "database:select")
      case "dml" =>
        if (Classifier.isDML(s) && s.regionMatches(true, 0, "insert", 0, 6))
          Seq("database:query", "database:insert")
        else if (s.regionMatches(true, 0, "update", 0, 6))
          Seq("database:query", "database:update")
        else Seq("database:query", "database:delete")
      case "ddl" =>
        if (s.regionMatches(true, 0, "create", 0, 6)) {
          if (s.toLowerCase.contains("index")) Seq("database:query", "database:create_index")
          else if (s.toLowerCase.contains("view")) Seq("database:query", "database:create_view")
          else Seq("database:query", "database:create_table")
        } else if (s.regionMatches(true, 0, "drop", 0, 4)) {
          if (s.toLowerCase.contains("view")) Seq("database:query", "database:drop_view")
          else Seq("database:query", "database:drop_table")
        } else Seq("database:query", "database:alter_table")
      case "pragma" => Seq("database:query", "database:pragma")
      case "begin" | "commit" | "rollback" => Seq("database:query", "database:transaction")
      case _ => Seq("database:query")
    }
  }

  /** Relations referenced by a parsed (unresolved) plan. */
  def referencedTables(plan: LogicalPlan): Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    plan.foreach {
      case r: UnresolvedRelation => out += r.multipartIdentifier.last.toLowerCase
      case other =>
        other.subqueries.foreach(sq => out ++= referencedTables(sq))
    }
    out.toSet
  }

  /** Authorize or throw DeniedException (SQLITE_DENY analog). */
  def authorize(spark: SparkSession, key: AccessKey, stmt: String): Unit = {
    requiredPrivilege(stmt).foreach { p =>
      if (!key.can(p)) throw new DeniedException(s"access key lacks $p")
    }
    if (Classifier.isDQL(stmt)) {
      // best-effort plan walk: engine-dialect statements Spark's parser
      // can't read (FTS MATCH) are table-checked by their own handlers
      val plan =
        try spark.sessionState.sqlParser.parsePlan(stmt)
        catch { case _: org.apache.spark.sql.catalyst.parser.ParseException =>
          return }
      referencedTables(plan).foreach { t =>
        if (!key.canReadTable(t))
          throw new DeniedException(s"access key cannot read table $t")
      }
    }
  }
}
