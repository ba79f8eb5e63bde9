package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.RecursiveCte
import graft.queries.Q._

/** Remaining §2A surface: recursive CTEs (native + driver loop),
  * generators (json_each/explode), and the engine-dataflow demos that are
  * expressible as queries (statement classifier decision table). */
object Extras {

  /** WITH RECURSIVE, executed natively by Spark 4's recursive CTE support. */
  def q26RecursiveCte(s: SparkSession, dir: String): DataFrame =
    sql(s, dir,
      """WITH RECURSIVE seq(n, fib, prev) AS (
        |  SELECT 1, 1, 0
        |  UNION ALL
        |  SELECT n + 1, fib + prev, fib FROM seq WHERE n < 40
        |)
        |SELECT n, fib FROM seq ORDER BY n""".stripMargin)

  val q26Oracle: String =
    """WITH RECURSIVE seq(n, fib, prev) AS (
      |  SELECT 1, 1, 0
      |  UNION ALL
      |  SELECT n + 1, fib + prev, fib FROM seq WHERE n < 40
      |)
      |SELECT n, fib FROM seq ORDER BY n""".stripMargin

  /** Graph reachability via the driver-loop fixpoint: BFS over a functional
    * graph derived from nation keys (dst = (src*2+1) mod 25). The oracle is
    * the equivalent WITH RECURSIVE with a depth bound; min(depth) per node
    * equals BFS depth. */
  def q27RecursiveLoop(s: SparkSession, dir: String): DataFrame = {
    val edges = nation(s, dir).select(
      col("n_nationkey").cast("long").as("src"),
      ((col("n_nationkey") * 2 + 1) % 25).cast("long").as("dst"))
    val seed = s.range(1).select(lit(0L).as("node"), lit(0L).as("depth"))
    val reached = RecursiveCte.fixpoint(
      seed,
      frontier => frontier.join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node"), (col("depth") + 1).as("depth")),
      keyCols = Seq("node"))
    reached.select(col("node"), col("depth")).orderBy(col("node"))
  }

  val q27Oracle: String =
    """WITH RECURSIVE e AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS src,
      |         CAST((n_nationkey * 2 + 1) % 25 AS BIGINT) AS dst
      |  FROM nation),
      |r(node, depth) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |  UNION ALL
      |  SELECT e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.node
      |  WHERE r.depth < 30)
      |SELECT node, MIN(depth) AS depth FROM r GROUP BY node ORDER BY node""".stripMargin

  /** Generator / LATERAL: explode word arrays (the json_each shape:
    * SQLite's table-valued functions map onto Spark generators). */
  def f11Explode(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).filter(col("doc_id") < 20)
      .select(col("doc_id"),
        explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))
          .as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n") >= 5)
      .orderBy(col("word"))

  val f11Oracle: String =
    """SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
      |FROM (
      |  SELECT doc_id,
      |    unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS word
      |  FROM documents WHERE doc_id < 20) t
      |GROUP BY word HAVING COUNT(*) >= 5 ORDER BY word""".stripMargin

  /** The statement classifier (B1) as a decision table over a VALUES list —
    * oracle is the same prefix CASE in DuckDB, so the routing semantics are
    * themselves oracle-checked. */
  def e01Classifier(s: SparkSession, dir: String): DataFrame = {
    import graft.engine.Classifier
    val stmts = Seq(
      "SELECT * FROM t", "select count(*) from x", "INSERT INTO t VALUES (1)",
      "Update t set a=1", "DELETE FROM t WHERE 1", "CREATE TABLE t (a)",
      "DROP TABLE t", "ALTER TABLE t RENAME TO u", "PRAGMA table_info(t)",
      "VACUUM", "BEGIN", "BEGIN IMMEDIATE", "COMMIT", "END", "ROLLBACK",
      "WITH c AS (SELECT 1) SELECT * FROM c", "sel")
    import s.implicits._
    stmts.toDF("stmt")
      .withColumn("kind", {
        // same classification, expressed as a column for distributed use
        val st = col("stmt")
        when(lower(substring(st, 1, 6)) === "select", "dql")
          .when(lower(substring(st, 1, 6)) === "insert", "dml")
          .when(lower(substring(st, 1, 6)) === "update", "dml")
          .when(lower(substring(st, 1, 6)) === "delete", "dml")
          .when(lower(substring(st, 1, 6)) === "create", "ddl")
          .when(lower(substring(st, 1, 4)) === "drop" && length(st) >= 6, "ddl")
          .when(lower(substring(st, 1, 5)) === "alter" && length(st) >= 6, "ddl")
          .when(lower(substring(st, 1, 6)) === "pragma", "pragma")
          .when(lower(substring(st, 1, 6)) === "vacuum", "vacuum")
          .when(lower(substring(st, 1, 5)) === "begin", "begin")
          .when(lower(substring(st, 1, 8)) === "rollback", "rollback")
          .when(lower(substring(st, 1, 6)) === "commit" ||
            (lower(substring(st, 1, 3)) === "end" && length(st) >= 3), "commit")
          .otherwise("other")
      })
      .withColumn("is_write", col("kind").isin("dml", "ddl", "pragma"))
      .orderBy(col("stmt"))
  }

  val e01Oracle: String =
    """SELECT stmt,
      |  CASE WHEN lower(substr(stmt, 1, 6)) = 'select' THEN 'dql'
      |       WHEN lower(substr(stmt, 1, 6)) = 'insert' THEN 'dml'
      |       WHEN lower(substr(stmt, 1, 6)) = 'update' THEN 'dml'
      |       WHEN lower(substr(stmt, 1, 6)) = 'delete' THEN 'dml'
      |       WHEN lower(substr(stmt, 1, 6)) = 'create' THEN 'ddl'
      |       WHEN lower(substr(stmt, 1, 4)) = 'drop' AND length(stmt) >= 6 THEN 'ddl'
      |       WHEN lower(substr(stmt, 1, 5)) = 'alter' AND length(stmt) >= 6 THEN 'ddl'
      |       WHEN lower(substr(stmt, 1, 6)) = 'pragma' THEN 'pragma'
      |       WHEN lower(substr(stmt, 1, 6)) = 'vacuum' THEN 'vacuum'
      |       WHEN lower(substr(stmt, 1, 5)) = 'begin' THEN 'begin'
      |       WHEN lower(substr(stmt, 1, 8)) = 'rollback' THEN 'rollback'
      |       WHEN lower(substr(stmt, 1, 6)) = 'commit'
      |            OR (lower(substr(stmt, 1, 3)) = 'end' AND length(stmt) >= 3) THEN 'commit'
      |       ELSE 'other' END AS kind,
      |  CASE WHEN lower(substr(stmt, 1, 6)) = 'select' THEN FALSE
      |       WHEN lower(substr(stmt, 1, 6)) IN ('insert','update','delete','create','pragma') THEN TRUE
      |       WHEN lower(substr(stmt, 1, 4)) = 'drop' AND length(stmt) >= 6 THEN TRUE
      |       WHEN lower(substr(stmt, 1, 5)) = 'alter' AND length(stmt) >= 6 THEN TRUE
      |       ELSE FALSE END AS is_write
      |FROM (VALUES
      |  ('SELECT * FROM t'), ('select count(*) from x'), ('INSERT INTO t VALUES (1)'),
      |  ('Update t set a=1'), ('DELETE FROM t WHERE 1'), ('CREATE TABLE t (a)'),
      |  ('DROP TABLE t'), ('ALTER TABLE t RENAME TO u'), ('PRAGMA table_info(t)'),
      |  ('VACUUM'), ('BEGIN'), ('BEGIN IMMEDIATE'), ('COMMIT'), ('END'), ('ROLLBACK'),
      |  ('WITH c AS (SELECT 1) SELECT * FROM c'), ('sel')) AS v(stmt)
      |ORDER BY stmt""".stripMargin

  /** SQLite NULL ordering semantics (SURVEY §7.4 item 1): NULLs sort FIRST
    * ascending, LAST descending — Spark's default matches SQLite; DuckDB's
    * does not, so the oracle pins it explicitly. */
  def q28NullOrdering(s: SparkSession, dir: String): DataFrame =
    customer(s, dir).filter(col("c_custkey") < 40)
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nullable"))
      .orderBy(col("seg_nullable").asc_nulls_first, col("c_custkey"))

  val q28Oracle: String =
    """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg_nullable
      |FROM customer WHERE c_custkey < 40
      |ORDER BY seg_nullable ASC NULLS FIRST, c_custkey""".stripMargin

  /** R-Tree virtual-table surface (SURVEY §2A row 5): an R-tree query IS a
    * rectangle-overlap predicate (SQLite rtree docs); with Parquet min/max
    * stats + partition pruning the same predicate prunes file ranges the
    * way the R-tree prunes tree nodes. Both range filters reach the scan
    * as PushedFilters (verified in PlanAudit). */
  def q30RtreeBbox(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_extendedprice").between(20000.0, 30000.0) &&
        col("l_discount").between(0.02, 0.06))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_in_box"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))

  val q30Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n_in_box,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_extendedprice BETWEEN 20000.0 AND 30000.0
      |  AND l_discount BETWEEN 0.02 AND 0.06
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Geopoly virtual-table surface (§2A row 5): geopoly_contains_point for
    * a convex CCW polygon = every edge cross-product >= 0. Point =
    * (l_extendedprice, l_quantity); the polygon is a compile-time literal,
    * so the whole test is a codegen'd conjunction of arithmetic predicates
    * — no UDF, trivially partition-parallel. The oracle spells out the
    * identical edge tests (same literal deltas → identical IEEE ops). */
  def q31GeopolyContains(s: SparkSession, dir: String): DataFrame = {
    // pentagon vertices (x=price, y=qty), CCW; (dx, dy, x1, y1) per edge
    val edges = Seq(
      (40000.0, -3.0, 20000.0, 5.0), (40000.0, 18.0, 60000.0, 2.0),
      (-30000.0, 25.0, 100000.0, 20.0), (-40000.0, -5.0, 70000.0, 45.0),
      (-10000.0, -35.0, 30000.0, 40.0))
    val px = col("l_extendedprice")
    val py = col("l_quantity").cast("double")
    val inside = edges.map { case (dx, dy, x1, y1) =>
      (lit(dx) * (py - lit(y1)) - lit(dy) * (px - lit(x1))) >= 0.0
    }.reduce(_ && _)
    lineitem(s, dir).filter(inside)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_inside"), min(col("l_orderkey")).as("first_key"),
        max(col("l_orderkey")).as("last_key"))
      .orderBy(col("l_returnflag"))
  }

  val q31Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n_inside,
      |  MIN(l_orderkey) AS first_key, MAX(l_orderkey) AS last_key
      |FROM lineitem
      |WHERE 40000.0*(l_quantity - 5.0) - (-3.0)*(l_extendedprice - 20000.0) >= 0
      |  AND 40000.0*(l_quantity - 2.0) - 18.0*(l_extendedprice - 60000.0) >= 0
      |  AND (-30000.0)*(l_quantity - 20.0) - 25.0*(l_extendedprice - 100000.0) >= 0
      |  AND (-40000.0)*(l_quantity - 45.0) - (-5.0)*(l_extendedprice - 70000.0) >= 0
      |  AND (-10000.0)*(l_quantity - 40.0) - (-35.0)*(l_extendedprice - 30000.0) >= 0
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** NOCASE collation (SURVEY §7.4 item 1's last uncovered delta): SQLite
    * `COLLATE NOCASE` maps to Spark 4's UTF8_LCASE collation — ordering
    * and equality are case-folded natively (no lower() rewrite), with a
    * binary tiebreak pinned for determinism. Oracle uses DuckDB's NOCASE,
    * which agrees with UTF8_LCASE on ASCII. */
  def q32NocaseCollation(s: SparkSession, dir: String): DataFrame =
    part(s, dir).filter(col("p_partkey") < 100)
      .select(col("p_partkey"),
        when(col("p_partkey") % 2 === 0, upper(col("p_name")))
          .otherwise(col("p_name")).as("mixed"))
      .withColumn("eqfold",
        expr("CAST((collate(mixed, 'UTF8_LCASE') = upper(mixed)) AS BIGINT)"))
      .orderBy(expr("collate(mixed, 'UTF8_LCASE')"), col("mixed"), col("p_partkey"))

  val q32Oracle: String =
    """SELECT p_partkey, mixed,
      |  CAST((mixed COLLATE NOCASE = upper(mixed)) AS BIGINT) AS eqfold
      |FROM (SELECT p_partkey,
      |        CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS mixed
      |      FROM part WHERE p_partkey < 100)
      |ORDER BY mixed COLLATE NOCASE, mixed, p_partkey""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "q28_null_ordering" -> (q28NullOrdering _),
    "q30_rtree_bbox" -> (q30RtreeBbox _),
    "q31_geopoly_contains" -> (q31GeopolyContains _),
    "q32_nocase_collation" -> (q32NocaseCollation _),
    "q26_recursive_cte" -> (q26RecursiveCte _),
    "q27_recursive_loop" -> (q27RecursiveLoop _),
    "f11_explode" -> (f11Explode _),
    "e01_classifier" -> (e01Classifier _))

  val oracles: Map[String, String] = Map(
    "q28_null_ordering" -> q28Oracle,
    "q30_rtree_bbox" -> q30Oracle,
    "q31_geopoly_contains" -> q31Oracle,
    "q32_nocase_collation" -> q32Oracle,
    "q26_recursive_cte" -> q26Oracle,
    "q27_recursive_loop" -> q27Oracle,
    "f11_explode" -> f11Oracle,
    "e01_classifier" -> e01Oracle)
}
