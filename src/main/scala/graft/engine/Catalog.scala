package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Multi-tenant catalog: databases, copy-on-write branches, and per-table
  * version manifests powering snapshots / point-in-time restore.
  *
  * Reference mapping (SURVEY §1.1, §2B B14/B17-B19):
  *   - databases / database_branches system tables
  *     (pkg/database/system_database.go:96-130) -> in-memory maps persisted
  *     as a JSON manifest per branch.
  *   - WAL version manager + rollback/snapshot logs
  *     (pkg/database/database_wal_manager.go, pkg/backups/rollback_log.go)
  *     -> immutable parquet file-sets + an append-only version list per
  *     table; restore-to-timestamp re-points at an older file-set
  *     (pkg/backups/restore.go:23-95 copy semantics, but zero-copy here
  *     because parquet versions are immutable).
  *   - branch creation copies the parent's manifest
  *     (pkg/backups/restore.go:28-95 CopySourceDatabaseToTargetDatabase);
  *     file-sets are shared, so branching is O(tables), not O(bytes).
  *
  * At 100 TB this design is the standard lakehouse shape: tables are lists
  * of immutable files; commits, branches and time travel are manifest
  * operations that never touch data.
  */
/** FTS5-style index definition (SURVEY §2A row 5): `table` is the indexed
  * (content) table, `textCols` the indexed columns (comma-joined), `idCol`
  * the document id. The index DATA lives in ordinary catalog tables
  * (`__fts_<name>_{postings,dl,stats}`) so it is versioned, branched,
  * backed up and vacuumed exactly like user data — this record is only the
  * definition, mirroring how FTS5 keeps its schema in sqlite_master and
  * its data in shadow tables. */
case class FtsIndexDef(table: String, textCols: String, idCol: String)

/** Secondary-index definition (SURVEY §2A row 2). No b-tree exists — the
  * recorded columns drive CLUSTERING: compaction rewrites the table
  * range-sorted on them, so parquet file/row-group min-max statistics
  * prune scans on the indexed columns (the lakehouse OPTIMIZE/Z-ORDER
  * idiom standing in for SQLite's secondary index). `cols` is empty for
  * expression indexes, which are accepted but drive no clustering. */
case class ClusterIndexDef(table: String, cols: Seq[String],
  unique: Boolean = false, partial: Boolean = false,
  // raw WHERE predicate of a partial index (lang_createindex.html#partialidx)
  // — kept so partial UNIQUE indexes enforce over exactly the predicate's
  // row subset at write time
  where: Option[String] = None,
  // multi-dimensional layout: CREATE INDEX ix ON t (zorder(a, b)) — SQLite
  // expression-index syntax recording a Z-ORDER (Morton) clustering, so
  // compaction interleaves the columns' bucket bits instead of sorting
  // lexicographically. Every indexed column then gets blocky per-file
  // min/max ranges (range pruning on ALL of them), where a lexicographic
  // sort prunes by min/max only on the leading column.
  zorder: Boolean = false)

/** A stored CREATE TRIGGER definition (SQLite lang_createtrigger.html;
  * reference authorizes the verb at pkg/auth/access_key_statements.go:280).
  * timing ∈ {BEFORE, AFTER}; event ∈ {INSERT, UPDATE, DELETE}; updateCols
  * non-empty only for UPDATE OF; `when` is the raw WHEN expression text;
  * `body` is the BEGIN...END statements in order. FOR EACH ROW semantics
  * are evaluated SET-WISE at fire time: the body runs once per triggering
  * STATEMENT against the affected-row delta (NEW/OLD resolve per row
  * through a join), so a trigger is one distributed plan, not a row loop. */
case class TriggerDef(table: String, timing: String, event: String,
  updateCols: Seq[String], when: Option[String], body: Seq[String])

class Catalog(val root: Path) {

  /** One committed state of a table: file-set + bookkeeping. `pk` records
    * declared PRIMARY KEY columns (drives INSERT OR REPLACE/IGNORE's
    * conflict target — not enforced as a constraint, SURVEY §7.5);
    * `defaults` maps column -> DEFAULT expression text. `clusteredBy` is
    * the clustering order THIS version's files were physically laid out
    * in (set by compaction, cleared by any rewrite that doesn't sort) —
    * lets compaction skip re-sorting a version that already matches the
    * recorded index instead of churning identical versions. */
  case class TableVersion(ts: Long, paths: Seq[String], rowCount: Long,
      maxRowId: Long, schemaDdl: String, pk: Seq[String] = Nil,
      defaults: Map[String, String] = Map.empty,
      clusteredBy: Seq[String] = Nil,
      // SQLite 3.37 table options: STRICT enforces declared column types
      // on write; WITHOUT ROWID is recorded for dialect fidelity (there
      // are no rowid b-trees here to begin with)
      strict: Boolean = false, withoutRowid: Boolean = false,
      // GENERATED ALWAYS AS columns: column -> expression text. Both
      // VIRTUAL and STORED materialize at write time here (every write
      // rewrites whole immutable files anyway, so storing the computed
      // value is free and keeps reads plain scans)
      generated: Map[String, String] = Map.empty,
      // declared NOT NULL columns and CHECK expressions — enforced at
      // write time through the same raise_error guard as STRICT (no
      // validation pre-scan; a violating row fails the write job)
      notNull: Seq[String] = Nil, checks: Seq[String] = Nil,
      // INTEGER PRIMARY KEY AUTOINCREMENT (SQLite lang_createtable.html
      // #rowid): maxRowId becomes the never-decreasing sequence — DELETE
      // does not lower it, so rowids are never reused; surfaced through
      // the synthesized sqlite_sequence table
      autoincrement: Boolean = false,
      // declared UNIQUE key sets (column-level UNIQUE + table-level
      // UNIQUE(a, b)) — enforced at write time by a post-write probe job
      // over the files just written (never a pre-scan of the source plan)
      uniques: Seq[Seq[String]] = Nil)

  case class BranchState(tables: mutable.Map[String, mutable.ArrayBuffer[TableVersion]])

  private val databases = mutable.LinkedHashMap[String, Long]() // name -> createdAt
  // per-database mutable settings — the reference Database model's
  // `settings.backups` shape (pkg/database/database_settings.go:9-44,
  // created enabled+incremental per pkg/database/database.go:46-53). The
  // reference's own `database update` verb is an empty stub
  // (pkg/cli/cmd/database_update.go:13-16) with no PUT route; the PUT
  // /v1/databases/{name} + CLI verb here is the documented superset that
  // makes it real. name -> (backupsEnabled, incrementalEnabled)
  private val dbSettings = mutable.LinkedHashMap[String, (Boolean, Boolean)]()
  private val branches = mutable.LinkedHashMap[(String, String), BranchState]()
  private val ftsDefs = mutable.LinkedHashMap[(String, String, String), FtsIndexDef]()
  private val indexDefs = mutable.LinkedHashMap[(String, String, String), ClusterIndexDef]()
  // SQL view definitions, insertion-ordered so views-on-views re-register
  // in dependency order (a view can only reference names created before it)
  private val viewDefs = mutable.LinkedHashMap[(String, String, String), String]()
  // trigger definitions, insertion-ordered: SQLite fires same-event
  // triggers in an unspecified order in the docs but creation order in
  // practice, and tests depend on it
  private val triggerDefs = mutable.LinkedHashMap[(String, String, String), TriggerDef]()
  private val versionCounter = new java.util.concurrent.atomic.AtomicLong(0)

  Files.createDirectories(root)
  loadCatalog()

  // --- manifest persistence ------------------------------------------------
  // Two tiers (r2 VERDICT "wrong #2" — a single whole-catalog manifest
  // rewritten per mutation serializes every INSERT across all tenants on a
  // full-catalog JSON serialization):
  //   - root/_catalog.json: databases, the branch LIST, backups — written
  //     only by rare catalog-level DDL.
  //   - root/<db>/<branch>/_manifest.json: that branch's tables/versions,
  //     views and fts definitions — written per data mutation, O(branch)
  //     not O(catalog).
  // JSON is built under the global lock (microseconds over in-memory maps);
  // file IO runs OUTSIDE it under a per-branch lock with a sequence check
  // (stale snapshots never overwrite newer ones), so writers on different
  // branches persist concurrently. Writes are temp + atomic rename, like
  // the reference's WAL-index swap.

  private def legacyManifestPath = root.resolve("_manifest.json")
  private def catalogPath = root.resolve("_catalog.json")
  private def branchManifestPath(db: String, branch: String): Path =
    root.resolve(db).resolve(branch).resolve("_manifest.json")

  // lazy: loadCatalog() runs from the constructor, before plain vals init
  private lazy val om = new com.fasterxml.jackson.databind.ObjectMapper()
  private lazy val branchSeqs =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      java.util.concurrent.atomic.AtomicLong]()
  private lazy val branchWritten =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()
  private lazy val branchIoLocks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Object]()

  private def writeVersionNode(vn: com.fasterxml.jackson.databind.node.ObjectNode,
      v: TableVersion): Unit = {
    vn.put("ts", v.ts); vn.put("rowCount", v.rowCount)
    vn.put("maxRowId", v.maxRowId); vn.put("schemaDdl", v.schemaDdl)
    val ps = vn.putArray("paths"); v.paths.foreach(ps.add)
    if (v.pk.nonEmpty) { val pa = vn.putArray("pk"); v.pk.foreach(pa.add) }
    if (v.defaults.nonEmpty) {
      val dn = vn.putObject("defaults")
      v.defaults.foreach { case (k, e) => dn.put(k, e) }
    }
    if (v.clusteredBy.nonEmpty) {
      val ca = vn.putArray("clusteredBy"); v.clusteredBy.foreach(ca.add)
    }
    if (v.strict) vn.put("strict", true)
    if (v.withoutRowid) vn.put("withoutRowid", true)
    if (v.generated.nonEmpty) {
      val gn = vn.putObject("generated")
      v.generated.foreach { case (k, e) => gn.put(k, e) }
    }
    if (v.notNull.nonEmpty) {
      val nn = vn.putArray("notNull"); v.notNull.foreach(nn.add)
    }
    if (v.checks.nonEmpty) {
      val cn = vn.putArray("checks"); v.checks.foreach(cn.add)
    }
    if (v.autoincrement) vn.put("autoincrement", true)
    if (v.uniques.nonEmpty) {
      val ua = vn.putArray("uniques")
      v.uniques.foreach { ks => val kn = ua.addArray(); ks.foreach(kn.add) }
    }
  }

  private def readVersionNode(vn: com.fasterxml.jackson.databind.JsonNode): TableVersion =
    TableVersion(vn.path("ts").asLong(),
      vn.path("paths").elements().asScala.map(_.asText()).toSeq,
      vn.path("rowCount").asLong(), vn.path("maxRowId").asLong(),
      vn.path("schemaDdl").asText(),
      vn.path("pk").elements().asScala.map(_.asText()).toSeq,
      vn.path("defaults").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap,
      vn.path("clusteredBy").elements().asScala.map(_.asText()).toSeq,
      vn.path("strict").asBoolean(false),
      vn.path("withoutRowid").asBoolean(false),
      vn.path("generated").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap,
      vn.path("notNull").elements().asScala.map(_.asText()).toSeq,
      vn.path("checks").elements().asScala.map(_.asText()).toSeq,
      vn.path("autoincrement").asBoolean(false),
      vn.path("uniques").elements().asScala
        .map(kn => kn.elements().asScala.map(_.asText()).toSeq).toSeq)

  /** Serialize one branch's state under the caller's (global) lock;
    * the returned thunk does the file IO without it. (`private[engine]`
    * so the drop-vs-pending-snapshot race is testable deterministically.) */
  private[engine] def snapshotBranch(db: String, branch: String): () => Unit =
    branches.get((db, branch)) match {
      case None => () => () // branch dropped concurrently: nothing to write
      case Some(st) =>
        val node = om.createObjectNode()
        val ts = node.putObject("tables")
        st.tables.foreach { case (t, vs) =>
          val arr = ts.putArray(t)
          vs.foreach(v => writeVersionNode(arr.addObject(), v))
        }
        val vws = node.putArray("views")
        viewDefs.foreach { case ((d, b, name), sql) =>
          if (d == db && b == branch) {
            val n = vws.addObject(); n.put("name", name); n.put("sql", sql)
          }
        }
        val fts = node.putArray("ftsIndexes")
        ftsDefs.foreach { case ((d, b, name), defn) =>
          if (d == db && b == branch) {
            val n = fts.addObject()
            n.put("name", name); n.put("table", defn.table)
            n.put("textCols", defn.textCols); n.put("idCol", defn.idCol)
          }
        }
        val cixs = node.putArray("clusterIndexes")
        indexDefs.foreach { case ((d, b, name), defn) =>
          if (d == db && b == branch) {
            val n = cixs.addObject()
            n.put("name", name); n.put("table", defn.table)
            n.put("unique", defn.unique); n.put("partial", defn.partial)
            if (defn.zorder) n.put("zorder", true)
            defn.where.foreach(w => n.put("where", w))
            val cs = n.putArray("cols"); defn.cols.foreach(cs.add)
          }
        }
        val trgs = node.putArray("triggers")
        triggerDefs.foreach { case ((d, b, name), defn) =>
          if (d == db && b == branch) {
            val n = trgs.addObject()
            n.put("name", name); n.put("table", defn.table)
            n.put("timing", defn.timing); n.put("event", defn.event)
            val uc = n.putArray("updateCols"); defn.updateCols.foreach(uc.add)
            defn.when.foreach(w => n.put("when", w))
            val bs = n.putArray("body"); defn.body.foreach(bs.add)
          }
        }
        val bytes = om.writeValueAsBytes(node)
        val seq = branchSeqs
          .computeIfAbsent((db, branch),
            _ => new java.util.concurrent.atomic.AtomicLong())
          .incrementAndGet()
        () => writeBranchManifest(db, branch, bytes, seq)
    }

  private def writeBranchManifest(db: String, branch: String,
      bytes: Array[Byte], seq: Long): Unit = {
    val io = branchIoLocks.computeIfAbsent((db, branch), _ => new Object)
    io.synchronized {
      val last = Option(branchWritten.get((db, branch))).map(_.longValue).getOrElse(0L)
      if (seq <= last) return // a newer snapshot already reached disk, or dropped
      val p = branchManifestPath(db, branch)
      Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling(s"_manifest.json.tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      branchWritten.put((db, branch), java.lang.Long.valueOf(seq))
    }
  }

  /** Remove a dropped branch's manifest so a later branch of the same name
    * can't resurrect its state. The write fence advances to Long.MaxValue
    * under the branch IO lock BEFORE the delete, so a snapshot thunk from
    * an earlier mutation that hasn't reached disk yet is discarded by the
    * seq check instead of re-creating the file after it. */
  private def tombstoneBranchManifest(db: String, branch: String): Unit = {
    val io = branchIoLocks.computeIfAbsent((db, branch), _ => new Object)
    io.synchronized {
      branchWritten.put((db, branch), java.lang.Long.valueOf(Long.MaxValue))
      try Files.deleteIfExists(branchManifestPath(db, branch))
      catch { case _: java.io.IOException => () }
    }
  }

  /** Lift a drop tombstone when a branch name is (re-)created. Safe
    * against stale pre-drop thunks: branchSeqs is monotonic and never
    * reset, so every snapshot of the new incarnation outnumbers — and
    * therefore overwrites or fences out — anything from the old one. */
  private def reviveBranchManifest(db: String, branch: String): Unit = {
    val io = branchIoLocks.computeIfAbsent((db, branch), _ => new Object)
    io.synchronized { branchWritten.remove((db, branch)) }
  }

  /** Catalog-level state (databases, branch list, backups) — rare writes,
    * done inside the global lock. */
  private def persistCatalog(): Unit = {
    val rootNode = om.createObjectNode()
    val dbs = rootNode.putObject("databases")
    databases.foreach { case (n, ts) => dbs.put(n, ts) }
    val sets = rootNode.putObject("settings")
    dbSettings.foreach { case (n, (bk, inc)) =>
      val s = sets.putObject(n)
      s.put("backups", bk); s.put("incremental", inc)
    }
    val brs = rootNode.putArray("branches")
    branches.keys.foreach { case (db, br) =>
      val b = brs.addObject(); b.put("db", db); b.put("branch", br)
    }
    val bks = rootNode.putArray("backups")
    backups.values.foreach { b =>
      val bn = bks.addObject()
      bn.put("id", b.id); bn.put("db", b.db); bn.put("branch", b.branch)
      bn.put("createdAt", b.createdAt)
      val ts = bn.putObject("tables")
      b.tables.foreach { case (t, v) => writeVersionNode(ts.putObject(t), v) }
    }
    val tmp = root.resolve("_catalog.json.tmp")
    Files.write(tmp, om.writeValueAsBytes(rootNode))
    Files.move(tmp, catalogPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def loadCatalog(): Unit = {
    if (!Files.exists(catalogPath)) { loadLegacyManifest(); return }
    val rootNode = om.readTree(Files.readAllBytes(catalogPath))
    rootNode.path("databases").properties().asScala.foreach { e =>
      databases(e.getKey) = e.getValue.asLong()
    }
    // settings absent (pre-r12 catalog file) → create defaults via the
    // databaseSettings getter's getOrElse; only persisted values load
    rootNode.path("settings").properties().asScala.foreach { e =>
      dbSettings(e.getKey) = (e.getValue.path("backups").asBoolean(true),
        e.getValue.path("incremental").asBoolean(true))
    }
    rootNode.path("branches").elements().asScala.foreach { b =>
      val db = b.path("db").asText(); val br = b.path("branch").asText()
      branches((db, br)) = BranchState(mutable.Map())
      loadBranchManifest(db, br)
    }
    rootNode.path("backups").elements().asScala.foreach { bn =>
      val tables = bn.path("tables").properties().asScala
        .map(t => t.getKey -> readVersionNode(t.getValue)).toMap
      backups(bn.path("id").asText()) = Backup(bn.path("id").asText(),
        bn.path("db").asText(), bn.path("branch").asText(), tables,
        bn.path("createdAt").asLong())
    }
  }

  private def loadBranchManifest(db: String, branch: String): Unit = {
    val p = branchManifestPath(db, branch)
    if (!Files.exists(p)) return // branch created but never written to
    val node = om.readTree(Files.readAllBytes(p))
    val st = branches((db, branch))
    node.path("tables").properties().asScala.foreach { t =>
      val vs = mutable.ArrayBuffer[TableVersion]()
      t.getValue.elements().asScala.foreach(vn => vs += readVersionNode(vn))
      st.tables(t.getKey) = vs
    }
    node.path("views").elements().asScala.foreach { n =>
      viewDefs((db, branch, n.path("name").asText())) = n.path("sql").asText()
    }
    node.path("ftsIndexes").elements().asScala.foreach { n =>
      ftsDefs((db, branch, n.path("name").asText())) =
        FtsIndexDef(n.path("table").asText(), n.path("textCols").asText(),
          n.path("idCol").asText())
    }
    node.path("clusterIndexes").elements().asScala.foreach { n =>
      indexDefs((db, branch, n.path("name").asText())) =
        ClusterIndexDef(n.path("table").asText(),
          n.path("cols").elements().asScala.map(_.asText()).toSeq,
          n.path("unique").asBoolean(false), n.path("partial").asBoolean(false),
          if (n.has("where")) Some(n.path("where").asText()) else None,
          n.path("zorder").asBoolean(false))
    }
    node.path("triggers").elements().asScala.foreach { n =>
      triggerDefs((db, branch, n.path("name").asText())) =
        TriggerDef(n.path("table").asText(), n.path("timing").asText(),
          n.path("event").asText(),
          n.path("updateCols").elements().asScala.map(_.asText()).toSeq,
          if (n.has("when")) Some(n.path("when").asText()) else None,
          n.path("body").elements().asScala.map(_.asText()).toSeq)
    }
  }

  /** Read a pre-split whole-catalog manifest (round <=2 layout) once; the
    * next mutation persists in the split layout, which then takes
    * precedence on load. */
  private def loadLegacyManifest(): Unit = {
    if (!Files.exists(legacyManifestPath)) return
    val rootNode = om.readTree(Files.readAllBytes(legacyManifestPath))
    rootNode.path("databases").properties().asScala.foreach { e =>
      databases(e.getKey) = e.getValue.asLong()
    }
    rootNode.path("branches").elements().asScala.foreach { b =>
      val st = BranchState(mutable.Map())
      b.path("tables").properties().asScala.foreach { t =>
        val vs = mutable.ArrayBuffer[TableVersion]()
        t.getValue.elements().asScala.foreach(vn => vs += readVersionNode(vn))
        st.tables(t.getKey) = vs
      }
      branches((b.path("db").asText(), b.path("branch").asText())) = st
    }
    rootNode.path("views").elements().asScala.foreach { n =>
      viewDefs((n.path("db").asText(), n.path("branch").asText(),
        n.path("name").asText())) = n.path("sql").asText()
    }
    rootNode.path("ftsIndexes").elements().asScala.foreach { n =>
      ftsDefs((n.path("db").asText(), n.path("branch").asText(),
        n.path("name").asText())) = FtsIndexDef(n.path("table").asText(),
        n.path("textCols").asText(), n.path("idCol").asText())
    }
    rootNode.path("backups").elements().asScala.foreach { bn =>
      val tables = bn.path("tables").properties().asScala
        .map(t => t.getKey -> readVersionNode(t.getValue)).toMap
      backups(bn.path("id").asText()) = Backup(bn.path("id").asText(),
        bn.path("db").asText(), bn.path("branch").asText(), tables,
        bn.path("createdAt").asLong())
    }
    // re-persist immediately in the split layout so the legacy file is
    // never read again (it is left in place, inert)
    persistCatalog()
    branches.keys.toSeq.foreach { case (db, br) => snapshotBranch(db, br)() }
  }

  /** Monotonic version timestamp (millis + sub-ms counter so two commits in
    * the same millisecond stay ordered). */
  def nextVersionTs(): Long =
    System.currentTimeMillis() * 1000 + (versionCounter.incrementAndGet() % 1000)

  def createDatabase(name: String): Unit = synchronized {
    require(!databases.contains(name), s"database $name already exists")
    databases(name) = System.currentTimeMillis()
    dbSettings(name) = (true, true) // reference create defaults (database.go:46-53)
    branches((name, "main")) = BranchState(mutable.Map())
    reviveBranchManifest(name, "main")
    snapshotBranch(name, "main")()
    persistCatalog()
  }

  def listDatabases(): Seq[String] = synchronized { databases.keys.toSeq }

  def databaseCreatedAt(name: String): Option[Long] =
    synchronized(databases.get(name))

  /** (backupsEnabled, incrementalBackupsEnabled); databases created
    * before the settings field existed read as the create defaults. */
  def databaseSettings(name: String): Option[(Boolean, Boolean)] =
    synchronized {
      if (databases.contains(name)) Some(dbSettings.getOrElse(name, (true, true)))
      else None
    }

  /** Partial update (None = keep): the PUT /v1/databases/{name} body may
    * carry either flag alone, like the reference's other update verbs. */
  def updateDatabaseSettings(name: String, backups: Option[Boolean],
      incremental: Option[Boolean]): Unit = synchronized {
    require(databases.contains(name), s"database $name not found")
    val cur = dbSettings.getOrElse(name, (true, true))
    dbSettings(name) =
      (backups.getOrElse(cur._1), incremental.getOrElse(cur._2))
    persistCatalog()
  }

  /** Drop a database and all of its branches (reference
    * DatabaseDestroyController + system-table CASCADE). Data dirs stay
    * until a vacuum pass finds them unreachable. */
  def dropDatabase(name: String): Unit = synchronized {
    require(databases.contains(name), s"database $name not found")
    databases.remove(name)
    dbSettings.remove(name)
    val dead = branches.keys.toSeq.filter(_._1 == name)
    dead.foreach(branches.remove)
    ftsDefs.keys.toSeq.filter(_._1 == name).foreach(ftsDefs.remove)
    indexDefs.keys.toSeq.filter(_._1 == name).foreach(indexDefs.remove)
    viewDefs.keys.toSeq.filter(_._1 == name).foreach(viewDefs.remove)
    triggerDefs.keys.toSeq.filter(_._1 == name).foreach(triggerDefs.remove)
    viewVersions.keys.toSeq.filter(_._1 == name).foreach(viewVersions.remove)
    // drop the per-branch manifest files too (same resurrection guard as
    // dropBranch): a re-created database must start empty
    dead.foreach { case (d, b) => tombstoneBranchManifest(d, b) }
    persistCatalog()
  }

  def listBranches(db: String): Seq[String] = synchronized {
    branches.keys.filter(_._1 == db).map(_._2).toSeq
  }

  /** Copy-on-write branch: manifest copy, file-sets shared. */
  def createBranch(db: String, parent: String, name: String): Unit = synchronized {
    val p = branches.getOrElse((db, parent),
      throw new IllegalArgumentException(s"branch $db/$parent not found"))
    require(!branches.contains((db, name)), s"branch $db/$name already exists")
    branches((db, name)) = BranchState(
      mutable.Map(p.tables.map { case (t, vs) => t -> vs.clone() }.toSeq: _*))
    ftsDefs.toSeq.collect { case ((d, b, n), defn) if d == db && b == parent =>
      ftsDefs((d, name, n)) = defn
    }
    indexDefs.toSeq.collect { case ((d, b, n), defn) if d == db && b == parent =>
      indexDefs((d, name, n)) = defn
    }
    viewDefs.toSeq.collect { case ((d, b, n), sql) if d == db && b == parent =>
      viewDefs((d, name, n)) = sql
    }
    triggerDefs.toSeq.collect { case ((d, b, n), defn) if d == db && b == parent =>
      triggerDefs((d, name, n)) = defn
    }
    viewVersions((db, name)) = viewVersionCounter.incrementAndGet()
    // the new branch's manifest lands before the catalog lists it, so a
    // crash between the two writes never yields a listed-but-empty branch
    reviveBranchManifest(db, name)
    snapshotBranch(db, name)()
    persistCatalog()
  }

  /** Delete a branch (reference: database_branches CASCADE delete,
    * system_database.go:115-130). Data dirs it referenced stay until a
    * vacuumVersions pass finds them unreachable. */
  def dropBranch(db: String, branch: String): Unit = synchronized {
    require(branch != "main", "cannot drop the main branch")
    branches.remove((db, branch))
      .getOrElse(throw new IllegalArgumentException(s"branch $db/$branch not found"))
    ftsDefs.keys.toSeq.filter(k => k._1 == db && k._2 == branch).foreach(ftsDefs.remove)
    indexDefs.keys.toSeq.filter(k => k._1 == db && k._2 == branch).foreach(indexDefs.remove)
    viewDefs.keys.toSeq.filter(k => k._1 == db && k._2 == branch).foreach(viewDefs.remove)
    triggerDefs.keys.toSeq.filter(k => k._1 == db && k._2 == branch)
      .foreach(triggerDefs.remove)
    viewVersions.remove((db, branch))
    // drop the manifest file too, or a later branch of the same name could
    // resurrect this state if a crash lands between its two writes
    tombstoneBranchManifest(db, branch)
    persistCatalog()
  }

  // --- SQL views -----------------------------------------------------------

  // views version per branch: registerViews skips re-registering a
  // branch's SQL views when this hasn't moved (same skip tables get from
  // their committed-version key). Values come from a GLOBALLY monotonic
  // counter so a dropped-and-recreated branch can never replay an old
  // version number (ABA) and serve a stale registered view.
  private val viewVersions = mutable.Map[(String, String), Long]()
  private val viewVersionCounter = new java.util.concurrent.atomic.AtomicLong()

  def viewsVersion(db: String, branch: String): Long =
    synchronized(viewVersions.getOrElse((db, branch), 0L))

  def putView(db: String, branch: String, name: String, sql: String): Unit = {
    val w = synchronized {
      viewDefs((db, branch, name)) = sql
      viewVersions((db, branch)) = viewVersionCounter.incrementAndGet()
      snapshotBranch(db, branch)
    }
    w()
  }

  /** Views of db/branch in creation order. */
  def views(db: String, branch: String): Seq[(String, String)] = synchronized {
    viewDefs.toSeq.collect { case ((d, b, n), sql) if d == db && b == branch =>
      (n, sql)
    }
  }

  def viewDef(db: String, branch: String, name: String): Option[String] =
    synchronized(viewDefs.get((db, branch, name)))

  def dropView(db: String, branch: String, name: String): Boolean = {
    val (existed, w) = synchronized {
      val e = viewDefs.remove((db, branch, name)).isDefined
      if (e) viewVersions((db, branch)) = viewVersionCounter.incrementAndGet()
      (e, if (e) snapshotBranch(db, branch) else () => ())
    }
    w(); existed
  }

  // --- triggers ------------------------------------------------------------

  def putTrigger(db: String, branch: String, name: String,
      d: TriggerDef): Unit = {
    val w = synchronized {
      triggerDefs((db, branch, name)) = d
      snapshotBranch(db, branch)
    }
    w()
  }

  def triggerDef(db: String, branch: String, name: String): Option[TriggerDef] =
    synchronized(triggerDefs.get((db, branch, name)))

  /** Triggers of db/branch in creation order. */
  def triggers(db: String, branch: String): Seq[(String, TriggerDef)] =
    synchronized {
      triggerDefs.toSeq.collect {
        case ((d, b, n), defn) if d == db && b == branch => (n, defn)
      }
    }

  def dropTrigger(db: String, branch: String, name: String): Boolean = {
    val (existed, w) = synchronized {
      val e = triggerDefs.remove((db, branch, name)).isDefined
      (e, if (e) snapshotBranch(db, branch) else () => ())
    }
    w(); existed
  }

  // --- FTS index definitions (data lives in ordinary catalog tables) -------

  def putFtsIndex(db: String, branch: String, name: String,
      d: FtsIndexDef): Unit = {
    val w = synchronized {
      ftsDefs((db, branch, name)) = d; snapshotBranch(db, branch)
    }
    w()
  }

  def ftsIndex(db: String, branch: String, name: String): Option[FtsIndexDef] =
    synchronized(ftsDefs.get((db, branch, name)))

  /** All index defs over a given content table in db/branch: (name, def). */
  def ftsIndexesForTable(db: String, branch: String,
      table: String): Seq[(String, FtsIndexDef)] = synchronized {
    ftsDefs.toSeq.collect {
      case ((d, b, n), defn) if d == db && b == branch && defn.table == table =>
        (n, defn)
    }
  }

  def dropFtsIndex(db: String, branch: String, name: String): Boolean = {
    val (existed, w) = synchronized {
      val e = ftsDefs.remove((db, branch, name)).isDefined
      (e, if (e) snapshotBranch(db, branch) else () => ())
    }
    w(); existed
  }

  def branchState(db: String, branch: String): BranchState = synchronized {
    branches.getOrElse((db, branch),
      throw new IllegalArgumentException(s"branch $db/$branch not found"))
  }

  def tableNames(db: String, branch: String): Seq[String] = synchronized {
    branchState(db, branch).tables.keys.toSeq.sorted
  }

  def currentVersion(db: String, branch: String, table: String): Option[TableVersion] =
    synchronized { branchState(db, branch).tables.get(table).flatMap(_.lastOption) }

  /** Directories handed out for in-flight writes whose versions are not
    * yet committed: vacuum must treat them as reachable, or a concurrent
    * GC could delete a write between its parquet output and its
    * commitVersion. Entries clear on commit; a failed write's entry stays
    * until restart (its directory leaks either way and the next vacuum
    * after restart collects it). */
  private val pendingDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Forget in-flight dirs a rolled-back transaction created: their files
    * are deleted by the engine; keeping the entries would only grow the
    * vacuum reachability set unboundedly. */
  def releasePendingDirs(paths: Seq[String]): Unit =
    paths.foreach(pendingDirs.remove)

  /** Depth-first recursive delete, shared by vacuum and the engine's
    * transaction-dir cleanup. Missing paths are a no-op. */
  private[engine] def deleteTree(p: Path): Unit = Fs.deleteTree(p)

  /** Data directory for a new version's files. */
  def newVersionDir(db: String, branch: String, table: String, ts: Long): Path = {
    val p = root.resolve(db).resolve(branch).resolve(table).resolve(s"v$ts")
    Files.createDirectories(p.getParent)
    pendingDirs.add(p.toString)
    p
  }

  /** Commit a new version (append-only history). Returns the version. */
  def commitVersion(db: String, branch: String, table: String,
      v: TableVersion): TableVersion = {
    // the hot path: in-memory commit under the global lock, manifest IO
    // outside it — concurrent writers on other branches never wait on
    // this branch's file write
    val w = synchronized {
      branchState(db, branch).tables
        .getOrElseUpdate(table, mutable.ArrayBuffer()) += v
      v.paths.foreach(pendingDirs.remove)
      snapshotBranch(db, branch)
    }
    w()
    v
  }

  def dropTable(db: String, branch: String, table: String): Boolean = {
    val (existed, w) = synchronized {
      val e = branchState(db, branch).tables.remove(table).isDefined
      if (e) indexDefs.keys.toSeq
        .filter(k => k._1 == db && k._2 == branch &&
          indexDefs(k).table == table)
        .foreach(indexDefs.remove) // indexes cascade with their table
      if (e) triggerDefs.keys.toSeq // triggers cascade too (SQLite)
        .filter(k => k._1 == db && k._2 == branch &&
          triggerDefs(k).table == table)
        .foreach(triggerDefs.remove)
      (e, if (e) snapshotBranch(db, branch) else () => ())
    }
    w(); existed
  }

  def renameTable(db: String, branch: String, from: String, to: String): Unit = {
    val w = synchronized {
      val st = branchState(db, branch)
      st.tables.remove(from).foreach(vs => st.tables(to) = vs)
      indexDefs.toSeq.collect {
        case (k @ (d, b, _), defn) if d == db && b == branch && defn.table == from =>
          indexDefs(k) = defn.copy(table = to) // indexes follow a rename
      }
      triggerDefs.toSeq.collect { // triggers follow too (SQLite 3.25 ALTER)
        case (k @ (d, b, _), defn) if d == db && b == branch && defn.table == from =>
          triggerDefs(k) = defn.copy(table = to)
      }
      snapshotBranch(db, branch)
    }
    w()
  }

  // --- clustering-index definitions (SURVEY §2A row 2) ---------------------

  def putClusterIndex(db: String, branch: String, name: String,
      d: ClusterIndexDef): Unit = {
    val w = synchronized {
      indexDefs((db, branch, name)) = d; snapshotBranch(db, branch)
    }
    w()
  }

  def clusterIndex(db: String, branch: String, name: String): Option[ClusterIndexDef] =
    synchronized(indexDefs.get((db, branch, name)))

  /** The clustering order compaction applies to a table: the MOST RECENT
    * index on it (SQLite allows many indexes; physical layout can only
    * follow one — documented delta). */
  def clusterColsFor(db: String, branch: String, table: String): Seq[String] =
    clusterLayoutFor(db, branch, table)._1

  /** The physical layout compaction applies: (columns, isZorder) of the
    * MOST RECENT clustering index on the table. */
  def clusterLayoutFor(db: String, branch: String,
      table: String): (Seq[String], Boolean) = synchronized {
    indexDefs.toSeq.collect {
      case ((d, b, _), defn) if d == db && b == branch && defn.table == table &&
        defn.cols.nonEmpty => (defn.cols, defn.zorder)
    }.lastOption.getOrElse((Nil, false))
  }

  /** All recorded indexes on a table, insertion-ordered: (name, def). */
  def clusterIndexesForTable(db: String, branch: String,
      table: String): Seq[(String, ClusterIndexDef)] = synchronized {
    indexDefs.toSeq.collect {
      case ((d, b, n), defn) if d == db && b == branch && defn.table == table =>
        (n, defn)
    }
  }

  /** Follow a column rename into the index definitions (SQLite renames
    * the column inside its indexes). */
  def renameColumnInIndexes(db: String, branch: String, table: String,
      from: String, to: String): Unit = {
    val w = synchronized {
      val touched = indexDefs.toSeq.collect {
        case (k @ (d, b, _), defn)
            if d == db && b == branch && defn.table == table &&
              defn.cols.exists(_.equalsIgnoreCase(from)) =>
          indexDefs(k) = defn.copy(cols = defn.cols.map(c =>
            if (c.equalsIgnoreCase(from)) to else c))
      }
      if (touched.nonEmpty) snapshotBranch(db, branch) else () => ()
    }
    w()
  }

  /** Indexes that reference a column — DROP COLUMN refuses while any
    * exist, like SQLite's "cannot drop column: indexed". */
  def indexesOnColumn(db: String, branch: String, table: String,
      column: String): Seq[String] = synchronized {
    indexDefs.toSeq.collect {
      case ((d, b, n), defn)
          if d == db && b == branch && defn.table == table &&
            defn.cols.exists(_.equalsIgnoreCase(column)) => n
    }
  }

  def dropClusterIndex(db: String, branch: String, name: String): Boolean = {
    val (existed, w) = synchronized {
      val e = indexDefs.remove((db, branch, name)).isDefined
      (e, if (e) snapshotBranch(db, branch) else () => ())
    }
    w(); existed
  }

  /** Point-in-time restore: for every table, re-point at the latest version
    * with ts <= asOf, committed as NEW versions (history is preserved, like
    * the reference's rollback-log restore). Tables created after asOf are
    * dropped. */
  def restoreAsOf(db: String, branch: String, asOf: Long): Unit = synchronized {
    val st = branchState(db, branch)
    val newTs = nextVersionTs()
    val toDrop = mutable.ArrayBuffer[String]()
    st.tables.foreach { case (t, vs) =>
      vs.filter(_.ts <= asOf).lastOption match {
        case Some(old) => vs += old.copy(ts = newTs)
        case None => toDrop += t
      }
    }
    toDrop.foreach(st.tables.remove)
    snapshotBranch(db, branch)()
  }

  /** Version history (snapshot list) for a table: the restore points. */
  def versionHistory(db: String, branch: String, table: String): Seq[TableVersion] =
    synchronized {
      branchState(db, branch).tables.get(table).map(_.toSeq).getOrElse(Nil)
    }

  /** Version-retention GC (the reference's WAL-version GC, B14): trim each
    * table's history in db/branch to its most recent `retain` versions,
    * then delete data directories under this catalog root that no
    * surviving version — in ANY branch — and no backup references.
    * File-sets are shared by branch copies and backups, so reachability
    * is computed globally before anything is deleted. Returns the number
    * of directories removed. */
  def vacuumVersions(db: String, branch: String, retain: Int,
      extraReachable: Set[String] = Set.empty): Int = synchronized {
    require(retain >= 1, "retain must be >= 1")
    val st = branchState(db, branch)
    st.tables.foreach { case (_, vs) =>
      if (vs.length > retain) vs.remove(0, vs.length - retain)
    }
    val referenced: Set[String] =
      branches.values.flatMap(_.tables.values.flatMap(_.flatMap(_.paths))).toSet ++
        backups.values.flatMap(_.tables.values.flatMap(_.paths)) ++
        pendingDirs.asScala ++ // in-flight writes not yet committed
        extraReachable // open transactions' staged file-sets (engine-level)
    val rootAbs = root.toAbsolutePath.toString
    var deleted = 0
    // version dirs live at root/<db>/<branch>/<table>/v<ts>
    val stream = Files.walk(root, 4)
    try {
      stream.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("v") &&
          p.getParent != null && p.getParent.getParent != null &&
          p.getParent.getParent.getParent != null &&
          p.getParent.getParent.getParent.getParent != null &&
          p.getParent.getParent.getParent.getParent.toAbsolutePath.toString == rootAbs)
        .filterNot(p => referenced.contains(p.toString))
        .toSeq // materialize before mutating the tree under the walk
        .foreach { p =>
          deleteTree(p)
          deleted += 1
        }
    } finally stream.close()
    snapshotBranch(db, branch)()
    deleted
  }

  // --- backups (B19) -------------------------------------------------------

  case class Backup(id: String, db: String, branch: String,
      tables: Map[String, TableVersion], createdAt: Long)

  // lazy: loadManifest() runs from the constructor, before plain vals init
  private lazy val backups = mutable.LinkedHashMap[String, Backup]()

  /** Full backup: snapshot every table's current version under a backup
    * id. File-sets are immutable and never deleted here, so the manifest
    * snapshot alone is a complete zero-copy backup — the reference tars
    * its range files (pkg/backups/backup.go) because its storage mutates
    * in place. */
  def createBackup(db: String, branch: String): String = synchronized {
    val id = java.util.UUID.randomUUID().toString
    val tables = branchState(db, branch).tables.flatMap {
      case (t, vs) => vs.lastOption.map(t -> _)
    }.toMap
    backups(id) = Backup(id, db, branch, tables, System.currentTimeMillis())
    persistCatalog()
    id
  }

  def listBackups(db: String, branch: String): Seq[Backup] = synchronized {
    backups.values.filter(b => b.db == db && b.branch == branch).toSeq
  }

  /** Delete a backup record (reference DatabaseBackupDestroyController);
    * file-sets it pinned become vacuum-eligible. */
  def deleteBackup(backupId: String): Boolean = synchronized {
    val existed = backups.remove(backupId).isDefined
    if (existed) persistCatalog()
    existed
  }

  /** Restore a backup into a branch: every backed-up table re-points at
    * its backed-up version (committed as NEW versions, history preserved);
    * tables created after the backup are dropped — the same contract as
    * restoreAsOf / the reference's restore (pkg/backups/restore.go). */
  def restoreBackup(backupId: String): Unit = synchronized {
    val b = backups.getOrElse(backupId,
      throw new IllegalArgumentException(s"no backup $backupId"))
    val st = branchState(b.db, b.branch)
    val newTs = nextVersionTs()
    st.tables.keys.toSeq.filterNot(b.tables.contains).foreach(st.tables.remove)
    b.tables.foreach { case (t, v) =>
      st.tables.getOrElseUpdate(t, mutable.ArrayBuffer()) += v.copy(ts = newTs)
    }
    snapshotBranch(b.db, b.branch)()
  }
}
