package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation, UnresolvedTable, UnresolvedTableOrView}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, UpdateTable}

/** Access-key authorization (B9 + reference pkg/auth).
  *
  * The reference's model (pkg/auth/access_key_statements.go:7-36): an
  * access key carries policy STATEMENTS — (effect allow|deny, resource
  * pattern, actions) — evaluated most-specific-first with deny precedence
  * and default deny (pkg/auth/authorized.go:30-77). Resources form a
  * hierarchy: `*`, `database:<db>`, `database:<db>:branch:<br>`,
  * `database:<db>:branch:<br>:table:<t>`, with trailing-`*` prefix
  * patterns at every level. Actions are the database privileges of
  * pkg/auth/database_privileges.go.
  */
case class AccessKeyStatement(effect: String, resource: String, actions: Seq[String])

case class AccessKey(id: String, secret: String = "",
    description: String = "", statements: Seq[AccessKeyStatement] = Nil,
    createdAt: Long = 0L, updatedAt: Long = 0L)

object AccessKey {
  /** Root key: everything allowed. */
  val root: AccessKey =
    AccessKey("root", statements = Seq(AccessKeyStatement("allow", "*", Seq("*"))))

  /** Convenience: a key allowing the given actions on every resource. */
  def allowing(id: String, actions: Seq[String], resource: String = "*",
      secret: String = ""): AccessKey =
    AccessKey(id, secret = secret,
      statements = Seq(AccessKeyStatement("allow", resource, actions)))
}

class DeniedException(msg: String) extends RuntimeException(msg)

object Authorizer {

  /** Resource pattern match (reference authorized.go:9-27): universal `*`,
    * exact, or trailing-`*` prefix. */
  def resourceMatches(pattern: String, resource: String): Boolean =
    pattern == "*" || pattern == resource ||
      (pattern.endsWith("*") && resource.startsWith(pattern.dropRight(1)))

  /** Statement evaluation (reference authorized.go:30-77): statements
    * sorted most-specific-first (segment count), deny always wins, default
    * deny when nothing matches. */
  def authorized(statements: Seq[AccessKeyStatement], resource: String,
      action: String): Boolean = {
    val sorted = statements.sortBy(s => -s.resource.count(_ == ':'))
    var allowFound = false
    sorted.foreach { st =>
      if (resourceMatches(st.resource, resource)) {
        val applies = st.actions.contains("*") || st.actions.contains(action)
        if (applies) {
          if (st.effect.equalsIgnoreCase("deny")) return false
          if (st.effect.equalsIgnoreCase("allow")) allowFound = true
        }
      }
    }
    allowFound
  }

  /** True when an explicit deny statement matches the resource and action.
    * Used to give denies LADDER-WIDE precedence in the can* checks: the
    * reference's probe ladder (access_key_statements.go:42+) ORs the
    * levels, so an allow matching a COARSE probe short-circuits before a
    * finer probe where a table-specific deny would bite — e.g. allow
    * `database:d:branch:main:*` + deny `…:table:secret` reads `secret` in
    * the reference, because the deny never matches the `branch:main:*`
    * probe the allow wins at. We instead veto when a deny matches ANY
    * probed level: strictly fail-closed, and it makes the natural
    * "whole branch except this table" policy shape actually enforceable.
    * Pinned in AuthSpec. */
  private def explicitDeny(statements: Seq[AccessKeyStatement],
      resource: String, action: String): Boolean =
    statements.exists(st => st.effect.equalsIgnoreCase("deny") &&
      resourceMatches(st.resource, resource) &&
      (st.actions.contains("*") || st.actions.contains(action)))

  /** `denyProbes` widens the VETO scan beyond the allow ladder: a check
    * that deliberately omits ancestor-exact resources from its allow
    * probes (see [[canOnTable]]) must still let a deny written at those
    * ancestors veto — otherwise "deny enforced no matter how coarse the
    * allow" would hold only for fine denies vs coarse allows, not the
    * converse (a db-exact read deny + a `database:d:*` allow would read
    * tables). The veto set is allow probes ∪ denyProbes. */
  private def ladder(key: AccessKey, probes: Seq[String], action: String,
      denyProbes: Seq[String] = Nil): Boolean =
    !(probes ++ denyProbes).exists(r => explicitDeny(key.statements, r, action)) &&
      probes.exists(r => authorized(key.statements, r, action))

  /** Branch-scoped check: probe the resource ladder like the reference's
    * authorizedForBranch (access_key_statements.go:42-70), with
    * ladder-wide deny precedence (see [[explicitDeny]]). */
  def canOnBranch(key: AccessKey, db: String, branch: String, action: String): Boolean =
    ladder(key, Seq("*", "database:*", s"database:$db", s"database:$db:*",
      s"database:$db:branch:*", s"database:$db:branch:$branch:*",
      s"database:$db:branch:$branch"), action)

  /** Table-scoped check (authorizedForTable, access_key_statements.go:118+).
    *
    * Deliberately STRICTER than the reference's probe ladder: the
    * reference also probes the branch-exact resource
    * (`database:<db>:branch:<br>`), which lets a branch-exact allow grant
    * every table read even when the key carries a table-specific DENY —
    * the deny statement never matches the branch-level probe, so the
    * branch allow wins and the table deny is dead. We omit the
    * branch-exact (and `branch:*`) probes so a branch-exact allow grants
    * branch OPERATIONS ([[canOnBranch]]) but not table reads — grant
    * `database:<db>:branch:<br>:*` for that. Combined with ladder-wide
    * deny precedence ([[explicitDeny]]), a table-specific deny is
    * enforced no matter how coarse the allow. The omitted ancestor-exact
    * resources still ride in the DENY probes (r17): a deny written
    * db-exact or branch-exact must veto table reads too, or the coarse
    * direction of "deny wins regardless of granularity" breaks — e.g. a
    * `database:d` read deny beside a `database:d:*` allow would still
    * read every table. Fail-closed divergences, pinned in AuthSpec. */
  def canOnTable(key: AccessKey, db: String, branch: String, table: String,
      action: String): Boolean =
    ladder(key, Seq("*", "database:*", s"database:$db:*",
      s"database:$db:branch:$branch:*",
      s"database:$db:branch:$branch:table:*",
      s"database:$db:branch:$branch:table:$table:*",
      s"database:$db:branch:$branch:table:$table"), action,
      denyProbes = Seq(s"database:$db", s"database:$db:branch:$branch"))

  /** Database-scoped check (authorizedForDatabase) — the `database:<db>:*`
    * probe keeps a key scoped "everything under db" consistent between
    * database- and branch-level actions. */
  def canOnDatabase(key: AccessKey, db: String, action: String): Boolean =
    ladder(key, Seq("*", "database:*", s"database:$db", s"database:$db:*"),
      action)

  /** Branch-level privileges demanded by a statement kind (subset of
    * database_privileges.go relevant to our engine). Comment-stripped: a
    * `/* hint */`-prefixed DML must demand DML privileges. */
  def requiredPrivilege(stmt: String): Seq[String] = {
    val s = Sql.stripLeadingComments(stmt.trim)
    Classifier.kind(s) match {
      case "dql" => Seq("database:query", "database:select")
      case "dml" =>
        if (s.regionMatches(true, 0, "insert", 0, 6))
          Seq("database:query", "database:insert")
        else if (s.regionMatches(true, 0, "update", 0, 6))
          Seq("database:query", "database:update")
        else Seq("database:query", "database:delete")
      case "ddl" =>
        // verb-prefix matches only: a CTAS selecting from a table whose
        // name contains "view" must still demand create_table
        if (s.matches("(?is)^create\\s+(unique\\s+)?index\\b.*"))
          Seq("database:query", "database:create_index")
        else if (s.matches("(?is)^create\\s+(temp(orary)?\\s+)?trigger\\b.*"))
          // reference: DatabasePrivilegeCreateTrigger
          // (pkg/auth/access_key_statements.go:280)
          Seq("database:query", "database:create_trigger")
        else if (s.matches("(?is)^drop\\s+trigger\\b.*"))
          Seq("database:query", "database:drop_trigger")
        else if (s.matches("(?is)^create\\s+view\\b.*"))
          Seq("database:query", "database:create_view")
        else if (s.regionMatches(true, 0, "create", 0, 6))
          Seq("database:query", "database:create_table")
        else if (s.matches("(?is)^drop\\s+view\\b.*"))
          Seq("database:query", "database:drop_view")
        else if (s.matches("(?is)^drop\\s+index\\b.*"))
          // symmetric with create_index (SQLITE_DROP_INDEX action code) —
          // a table-only drop grant must not remove clustering directives
          Seq("database:query", "database:drop_index")
        else if (s.regionMatches(true, 0, "drop", 0, 4))
          Seq("database:query", "database:drop_table")
        else Seq("database:query", "database:alter_table")
      case "pragma" => Seq("database:query", "database:pragma")
      case "begin" | "commit" | "rollback" =>
        // ROLLBACK TO SAVEPOINT is the savepoint privilege's verb, not a
        // full-transaction rollback
        if (s.matches("(?is)^rollback\\s+(transaction\\s+)?to\\b.*"))
          Seq("database:query", "database:savepoint")
        else Seq("database:query", "database:transaction")
      case _ =>
        if (s.regionMatches(true, 0, "attach", 0, 6))
          Seq("database:query", "database:attach")
        else if (s.regionMatches(true, 0, "detach", 0, 6))
          Seq("database:query", "database:detach")
        else if (s.regionMatches(true, 0, "savepoint", 0, 9) ||
            s.regionMatches(true, 0, "release", 0, 7))
          Seq("database:query", "database:savepoint")
        else if (s.regionMatches(true, 0, "analyze", 0, 7))
          // SQLITE_ANALYZE action code (reference
          // database_connection.go:618, database_privileges.go:19)
          Seq("database:query", "database:analyze")
        else if (s.regionMatches(true, 0, "reindex", 0, 7))
          // SQLITE_REINDEX (database_connection.go:664,
          // database_privileges.go:41)
          Seq("database:query", "database:reindex")
        else Seq("database:query", "database:select")
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

  // DML/DDL target extraction (the reference gets this from SQLite's
  // authorizer callback arg1; we regex the verb's target)
  private val dmlTargetRe =
    """(?is)^\s*(?:insert\s+(?:or\s+\w+\s+)?into|update|delete\s+from)\s+([\w"]+).*$""".r
  // a trigger's authorization subject is the table it is ON (reference
  // CanCreateTrigger(databaseId, branchId, tableName, triggerName))
  private val createTriggerTargetRe =
    """(?is)^\s*create\s+(?:temp(?:orary)?\s+)?trigger\s+.*?\bon\s+([\w"]+).*$""".r
  private val ddlTargetRe =
    ("""(?is)^\s*(?:create\s+(?:virtual\s+)?table\s+(?:if\s+not\s+exists\s+)?|""" +
      """drop\s+table\s+(?:if\s+exists\s+)?|alter\s+table\s+)([\w"]+).*$""").r
  private val fromTargetRe = """(?is)^.*?\bfrom\s+([\w"]+).*$""".r

  private def unq(n: String): String = n.replace("\"", "").toLowerCase

  /** Reserved internal namespace. `__att_*` (attached-table views) and
    * `__graft_*` (per-statement scratch views) are never addressable from
    * user SQL — naming them directly would bypass target-side authorization
    * or read another statement's scratch state. `__fts_match` is the FTS
    * scratch view; the `__fts_<t>_*` CATALOG tables stay readable (SQLite
    * exposes FTS shadow tables read-only the same way) but are never valid
    * DML/DDL targets. */
  private def reservedRead(t: String): Boolean =
    t.startsWith("__att_") || t.startsWith("__graft_") || t.startsWith("__fts_match") ||
      t.startsWith("__trig_")
  /** `sqlite_*` mirrors SQLite's "object name reserved" rule: only the
    * engine itself writes sqlite_stat1 (via ANALYZE); reads stay open. */
  private def reservedWrite(t: String): Boolean =
    t.startsWith("__att_") || t.startsWith("__graft_") || t.startsWith("__fts_") ||
      t.startsWith("__trig_") || t.startsWith("sqlite_")

  /** The table-granular ACTION a statement performs on its target
    * (mirrors the SQLITE_INSERT/UPDATE/DELETE/CREATE_TABLE/... codes the
    * reference checks per table, database_connection.go:608-690). */
  private def targetAction(stmt: String): Option[String] = {
    val s = stmt.trim
    if (s.regionMatches(true, 0, "insert", 0, 6)) Some("database:insert")
    else if (s.regionMatches(true, 0, "update", 0, 6)) Some("database:update")
    else if (s.regionMatches(true, 0, "delete", 0, 6)) Some("database:delete")
    else if (s.matches("(?is)^create\\s+(temp(orary)?\\s+)?trigger\\b.*"))
      Some("database:create_trigger")
    else if (s.matches("(?is)^drop\\s+trigger\\b.*"))
      Some("database:drop_trigger")
    else if (s.regionMatches(true, 0, "create", 0, 6) &&
      !s.toLowerCase.contains(" index")) Some("database:create_table")
    else if (s.regionMatches(true, 0, "drop", 0, 4)) Some("database:drop_table")
    else if (s.regionMatches(true, 0, "alter", 0, 5)) Some("database:alter_table")
    else None
  }

  /** DML/DDL target via Spark's parser — the analog of the reference
    * reading the table argument of SQLite's authorizer callback instead of
    * regexing SQL text: robust to comments, odd whitespace and quoting.
    * Engine-dialect forms the parser rejects (CREATE VIRTUAL TABLE, ...)
    * return None and the caller falls back to the verb regexes. */
  private def parsedTarget(plan: LogicalPlan): Option[String] =
    plan match {
      // DML: the target relation, never the SELECT sources
      case i: InsertIntoStatement => i.table.collectFirst {
        case r: UnresolvedRelation => r.multipartIdentifier.last.toLowerCase }
      case u: UpdateTable => u.table.collectFirst {
        case r: UnresolvedRelation => r.multipartIdentifier.last.toLowerCase }
      case d: DeleteFromTable => d.table.collectFirst {
        case r: UnresolvedRelation => r.multipartIdentifier.last.toLowerCase }
      // DDL commands carry their target as an unresolved identifier/table
      // node (CreateTable, CTAS, DropTable, AlterTable variants)
      case other => other.collectFirst {
        case u: UnresolvedIdentifier => u.nameParts.last.toLowerCase
        case t: UnresolvedTable => t.multipartIdentifier.last.toLowerCase
        case tv: UnresolvedTableOrView => tv.multipartIdentifier.last.toLowerCase
      }
    }

  /** Authorize or throw DeniedException (SQLITE_DENY analog).
    *
    * Checks, in order:
    *  1. branch-level verb privileges (CanSelect/CanPragma/... analog);
    *  2. the table-granular action on the DML/DDL target table;
    *  3. `database:read` on every OTHER referenced relation — reads inside
    *     INSERT ... SELECT, UPDATE/DELETE subqueries and plain queries all
    *     hit this (the reference's SQLITE_READ fires per column read
    *     regardless of the outer verb).
    *
    * All checks see through leading comments (the reference's run inside
    * SQLite's callback, which comments can't disarm); routing still
    * prefix-matches the raw text for reference parity.
    */
  def authorize(spark: SparkSession, key: AccessKey, db: String, branch: String,
      stmt: String): Unit = {
    requiredPrivilege(stmt).foreach { p =>
      if (!canOnBranch(key, db, branch, p))
        throw new DeniedException(s"access key lacks $p")
    }
    val s = Sql.stripLeadingComments(stmt.trim)
    val kind = Classifier.kind(s)
    // Normalize engine-dialect suffixes BEFORE parsing so their reads are
    // still checked: ON CONFLICT / RETURNING / OR REPLACE|IGNORE would
    // otherwise fail the parse and silently skip the source-table walk
    // (e.g. INSERT INTO t1 SELECT * FROM secret ON CONFLICT ... must
    // still read-check `secret`). CTAS parses natively and its SELECT
    // sources land here too. Stripping is QUOTE-AWARE (top-level keyword
    // scan) — a 'returning' inside a string literal must not truncate
    // the statement, or the broken parse would skip the walk entirely.
    val noReturning = Sql.splitOnTopLevelKeyword(s, "returning")
      .map(_._1).getOrElse(s)
    val noConflict = Sql.splitOnTopLevelKeyword(noReturning, "conflict")
      .map { case (before, _) =>
        before.replaceAll("(?is)\\s+on\\s*$", "") }
      .getOrElse(noReturning)
    val normalized =
      noConflict.replaceAll("(?is)^(\\s*insert\\s+)or\\s+\\w+\\s+", "$1")
    // ONE parse serves both the target extraction and the read walk
    val parsed: Option[LogicalPlan] =
      try Some(spark.sessionState.sqlParser.parsePlan(normalized))
      catch { case _: Exception => None }
    val target: Option[String] = kind match {
      case "dml" => parsed.flatMap(parsedTarget).orElse(s match {
        case dmlTargetRe(t) => Some(unq(t))
        case _ => None
      })
      case "ddl" => parsed.flatMap(parsedTarget).orElse(s match {
        case createTriggerTargetRe(t) => Some(unq(t))
        case ddlTargetRe(t) => Some(unq(t))
        case _ => None
      })
      case _ => None
    }
    target.foreach { t =>
      if (reservedWrite(t))
        throw new DeniedException(s"table $t may not be modified")
    }
    target.zip(targetAction(s)).foreach { case (t, action) =>
      if (!canOnTable(key, db, branch, t, action))
        throw new DeniedException(s"access key cannot $action on table $t")
    }
    if (kind == "dql" || kind == "dml" || kind == "other" || kind == "ddl") {
      // best-effort plan walk: statements Spark's parser can't read
      // (FTS MATCH) fall back to the FROM target
      val reads: Set[String] = parsed.map(referencedTables).getOrElse {
        if (kind == "dql") s match {
          case fromTargetRe(t) => Set(unq(t))
          case _ => Set.empty
        } else Set.empty
      }
      reads.foreach { t =>
        if (reservedRead(t))
          throw new DeniedException(s"no such table: $t")
      }
      (reads -- target).foreach { t =>
        if (!canOnTable(key, db, branch, t, "database:read"))
          throw new DeniedException(s"access key cannot read table $t")
      }
    }
  }
}
