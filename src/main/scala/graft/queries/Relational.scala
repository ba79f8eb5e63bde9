package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q._

/** Core relational operator coverage (SURVEY.md §2A rows 1-25): scan,
  * projection, filter, every join type, aggregation, windows, sort/limit,
  * set ops, subqueries, CTEs. All Spark-first DataFrame plans — Catalyst
  * handles pushdown/pruning/join strategy; small dims get broadcast hints.
  *
  * Reference behaviour being reproduced: the SQLite 3.49.1 SQL surface the
  * reference delegates to (litebase pkg/database/query.go:46-102 passes
  * statements unparsed to pkg/sqlite3/statement.go:71).
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan -> filter -> hash agg -> sort.
    * Partial aggregation (map-side combine) keeps the shuffle tiny: 4 groups
    * regardless of input scale. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        davg(col("l_quantity"), 2).as("avg_qty"),
        davg(col("l_extendedprice"), 2).as("avg_price"),
        davg(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style single-pass filtered aggregate; all predicates push to
    * the parquet scan (verified: PushedFilters in explain). */
  def q02FilterAgg(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
        count(lit(1)).as("n_items"))

  val q02Oracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q3-style 3-way join + agg + top-k. Customer filter applied before
    * the join so the build side stays small; AQE picks broadcast at low SF. */
  def q03TopUnshipped(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val l = lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp_ntz"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority").as("orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Oracle: String =
    """SELECT l_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  o_orderpriority AS orderpriority,
      |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** LEFT OUTER join preserving customers with zero matching orders. */
  def q04LeftJoin(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).filter(col("o_orderstatus") === "F")
    customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_f_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("f_total"))
      .orderBy(col("c_custkey"))
  }

  val q04Oracle: String =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_f_orders,
      |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS f_total
      |FROM customer LEFT JOIN orders
      |  ON c_custkey = o_custkey AND o_orderstatus = 'F'
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q5-style 6-way join: region/nation broadcast (tiny dims stay tiny
    * at any SF), fact-side joins shuffle on their keys. */
  def q05RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val r = region(s, dir).filter(col("r_name") === "ASIA")
    val n = nation(s, dir)
    val c = customer(s, dir)
    val o = orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val l = lineitem(s, dir)
    val sup = supplier(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q05Oracle: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** GROUP BY ... HAVING (post-aggregation filter). */
  def q06Having(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .filter(col("n_orders") >= 12)
      .orderBy(col("n_orders").desc, col("o_custkey"))

  val q06Oracle: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
      |ORDER BY n_orders DESC, o_custkey""".stripMargin

  /** SELECT DISTINCT (dedup via aggregate). */
  def q07Distinct(s: SparkSession, dir: String): DataFrame =
    customer(s, dir).select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  val q07Oracle: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** Left-semi join = EXISTS. */
  def q08SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).filter(col("o_orderstatus") === "O")
    customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q08Oracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join = NOT EXISTS. */
  def q09AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).filter(col("o_orderstatus") === "P")
    customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q09Oracle: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** FULL OUTER join of two aggregates (keys exist on one side only). */
  def q10FullOuter(s: SparkSession, dir: String): DataFrame = {
    val f = orders(s, dir).filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("fk")).agg(count(lit(1)).as("f_cnt"))
    val p = orders(s, dir).filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey").as("pk")).agg(count(lit(1)).as("p_cnt"))
    f.join(p, col("fk") === col("pk"), "full")
      .select(coalesce(col("fk"), col("pk")).as("custkey"),
        col("f_cnt"), col("p_cnt"))
      .orderBy(col("custkey"))
  }

  val q10Oracle: String =
    """SELECT COALESCE(f.fk, p.pk) AS custkey, f_cnt, p_cnt FROM
      |  (SELECT o_custkey AS fk, COUNT(*) AS f_cnt FROM orders WHERE o_orderstatus='F' GROUP BY 1) f
      |FULL JOIN
      |  (SELECT o_custkey AS pk, COUNT(*) AS p_cnt FROM orders WHERE o_orderstatus='P' GROUP BY 1) p
      |ON f.fk = p.pk
      |ORDER BY custkey""".stripMargin

  /** RIGHT OUTER join (kept as an explicit right join in the plan). */
  def q11RightJoin(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).filter(col("o_orderstatus") === "P")
    o.join(customer(s, dir), col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"), count(col("o_orderkey")).as("n_p_orders"))
      .orderBy(col("c_mktsegment"))
  }

  val q11Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_p_orders
      |FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      |RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** CROSS join (small × small). */
  def q12CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val st = orders(s, dir).select(col("o_orderstatus")).distinct()
    region(s, dir).crossJoin(st)
      .select(col("r_name"), col("o_orderstatus"),
        concat(col("r_name"), lit("/"), col("o_orderstatus")).as("combo"))
      .orderBy(col("r_name"), col("o_orderstatus"))
  }

  val q12Oracle: String =
    """SELECT r_name, o_orderstatus, r_name || '/' || o_orderstatus AS combo
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
      |ORDER BY r_name, o_orderstatus""".stripMargin

  /** UNION (distinct) of two key sets. */
  def q13Union(s: SparkSession, dir: String): DataFrame =
    customer(s, dir).select(col("c_nationkey").as("nk"))
      .union(supplier(s, dir).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy(col("nk"))

  val q13Oracle: String =
    """SELECT c_nationkey AS nk FROM customer
      |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin

  /** EXCEPT and INTERSECT (set semantics), tagged and unioned. */
  def q14ExceptIntersect(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir).select(col("c_nationkey").as("nk"))
    val sup = supplier(s, dir).select(col("s_nationkey").as("nk"))
    val onlyC = c.except(sup).withColumn("tag", lit("cust_only"))
    val both = c.intersect(sup).withColumn("tag", lit("both"))
    onlyC.unionByName(both).select(col("tag"), col("nk"))
      .orderBy(col("tag"), col("nk"))
  }

  val q14Oracle: String =
    """SELECT 'cust_only' AS tag, nk FROM
      |  (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'both' AS tag, nk FROM
      |  (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      |ORDER BY tag, nk""".stripMargin

  /** Ranking window functions: row_number / rank / dense_rank, top-3 per
    * partition. Total order inside the frame via (acctbal desc, custkey). */
  def q15WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, dir)
      // one projection -> one WindowExec for all three ranking functions
      .select(col("*"), row_number().over(w).as("rn"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  val q15Oracle: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal, rn, rnk, drnk FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
      |    RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
      |    DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk
      |  FROM customer) x
      |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin

  /** Analytic window functions: lag / lead / first_value / nth_value. */
  def q16WindowAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, dir).filter(col("o_custkey") < 50)
      // one projection -> one WindowExec for all analytic functions
      .select(col("*"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_price"))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_totalprice"), col("prev_price"), col("next_price"), col("first_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q16Oracle: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  o_totalprice,
      |  LAG(o_totalprice)  OVER w AS prev_price,
      |  LEAD(o_totalprice) OVER w AS next_price,
      |  FIRST_VALUE(o_totalprice) OVER w AS first_price
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Aggregates-as-window with ROWS frames: running sum + trailing-3 avg.
    * Exact decimal arithmetic inside the frame keeps both engines identical. */
  def q17WindowFrames(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    lineitem(s, dir)
      // both frames in ONE projection so they share a single WindowExec
      // (sequential withColumns leave a Project between the two Window
      // operators that blocks CollapseWindow)
      .select(col("*"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_qty"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .over(w.rowsBetween(-2, Window.currentRow)).cast("double")
          .as("trail3_qty"))
      .filter(col("l_quantity") > 47)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("running_qty"), col("trail3_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** GROUPS window frames (SURVEY §2A row 20's documented gap, closed):
    * SQLite 3.49.1 supports `GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW`;
    * Spark (and DuckDB) lack GROUPS mode. Emulation: dense_rank over the
    * frame's ORDER BY key gives each peer group an index, then a RANGE
    * frame over that index is exactly a GROUPS frame. Two window passes
    * over the same partitioning → one shuffle, second pass reuses the
    * sort. The oracle applies the identical rewrite in DuckDB. */
  def q29GroupsFrames(s: SparkSession, dir: String): DataFrame = {
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val dr = dense_rank().over(byFlag.orderBy(col("l_shipdate")))
    val groupsFrame = byFlag.orderBy(col("peer_idx")).rangeBetween(-1, 0)
    lineitem(s, dir).filter(col("l_orderkey") < 200)
      .withColumn("peer_idx", dr)
      .withColumn("grp_qty",
        sum(col("l_quantity").cast("decimal(18,2)")).over(groupsFrame)
          .cast("double"))
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("peer_idx").cast("long").as("peer_idx"),
        col("grp_qty"))
      .orderBy(col("l_returnflag"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))
  }

  val q29Oracle: String =
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_shipdate, peer_idx,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_returnflag ORDER BY peer_idx
      |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS DOUBLE) AS grp_qty
      |FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_shipdate, l_quantity,
      |    CAST(dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_shipdate) AS BIGINT) AS peer_idx
      |  FROM lineitem WHERE l_orderkey < 200)
      |ORDER BY l_returnflag, l_shipdate, l_orderkey, l_linenumber""".stripMargin

  /** Window frame EXCLUDE clause (SQLite 3.28 windowfunctions.html#exclude;
    * SURVEY §2A row 20's last documented gap, closed): Spark has no EXCLUDE
    * mode, so each variant is recomposed from sums Spark CAN express. Over
    * a RANGE frame, peer groups lie entirely inside or outside the frame
    * and the current group is always inside, so with
    *   full = sum over the frame,   grp = sum over the current peer group
    *   (RANGE BETWEEN CURRENT ROW AND CURRENT ROW), cur = this row's value:
    *   EXCLUDE CURRENT ROW = full - cur   (NULL when the frame was only
    *                                       this row — empty set sums NULL)
    *   EXCLUDE GROUP       = full - grp   (NULL when frame == group)
    *   EXCLUDE TIES        = full - grp + cur  (never empty)
    * All four window columns share one partitioning and ORDER BY → one
    * shuffle, one sort, one WindowExec after CollapseWindow. Exact decimal
    * arithmetic end-to-end; the oracle uses DuckDB's NATIVE EXCLUDE, so
    * this checks the emulation against a real implementation, not against
    * itself. */
  def q35ExcludeFrames(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast("decimal(18,2)")
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    val frame = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val grp = w.rangeBetween(Window.currentRow, Window.currentRow)
    lineitem(s, dir).filter(col("l_orderkey") < 200)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        sum(q).over(frame).as("__full"),
        count(lit(1)).over(frame).as("__cnt"),
        sum(q).over(grp).as("__gsum"),
        count(lit(1)).over(grp).as("__gcnt"))
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        when(col("__cnt") === 1, lit(null))
          .otherwise(col("__full") - q).cast("double").as("excl_cur"),
        when(col("__cnt") === col("__gcnt"), lit(null))
          .otherwise(col("__full") - col("__gsum")).cast("double").as("excl_grp"),
        (col("__full") - col("__gsum") + q).cast("double").as("excl_ties"))
      .orderBy(col("l_returnflag"), col("l_quantity"), col("l_orderkey"),
        col("l_linenumber"))
  }

  val q35Oracle: String =
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_returnflag ORDER BY l_quantity
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      |    EXCLUDE CURRENT ROW) AS DOUBLE) AS excl_cur,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_returnflag ORDER BY l_quantity
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      |    EXCLUDE GROUP) AS DOUBLE) AS excl_grp,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_returnflag ORDER BY l_quantity
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      |    EXCLUDE TIES) AS DOUBLE) AS excl_ties
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""".stripMargin

  val q17Oracle: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, running_qty, trail3_qty FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail3_qty
      |  FROM lineitem) x
      |WHERE l_quantity > 47
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** ntile / percent_rank / cume_dist over a total order. */
  def q18WindowDistribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, dir).filter(col("o_orderkey") < 200)
      // one projection -> one WindowExec (global window, bounded by the
      // filter; ntile/percent_rank semantics require the total order)
      .select(col("*"), ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"), cume_dist().over(w).as("cume"))
      .select(col("o_orderkey"), col("o_totalprice"),
        col("quartile"), col("pct_rank"), col("cume"))
      .orderBy(col("o_orderkey"))
  }

  val q18Oracle: String =
    """SELECT o_orderkey, o_totalprice,
      |  NTILE(4) OVER w AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM orders WHERE o_orderkey < 200
      |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** ORDER BY multi-key + LIMIT/OFFSET (top-k with pagination). */
  def q19TopKOffset(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .offset(5).limit(15)

  val q19Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 15 OFFSET 5""".stripMargin

  /** Scalar subquery (uncorrelated): orders above 2x the average price. */
  def q20ScalarSubquery(s: SparkSession, dir: String): DataFrame =
    sql(s, dir,
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)

  val q20Oracle: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** IN subquery (Catalyst rewrites to left-semi). */
  def q21InSubquery(s: SparkSession, dir: String): DataFrame =
    sql(s, dir,
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (
        |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |ORDER BY c_custkey""".stripMargin)

  val q21Oracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_nationkey IN (
      |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |ORDER BY c_custkey""".stripMargin

  /** Correlated EXISTS subquery with an extra predicate (decorrelated by
    * Catalyst into a semi join). */
  def q22CorrelatedExists(s: SparkSession, dir: String): DataFrame =
    sql(s, dir,
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey AND l_quantity > 49)
        |ORDER BY s_suppkey""".stripMargin)

  val q22Oracle: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey AND l_quantity > 49)
      |ORDER BY s_suppkey""".stripMargin

  /** Plain CTE reused twice in one query. */
  def q23Cte(s: SparkSession, dir: String): DataFrame =
    sql(s, dir,
      """WITH nat_cust AS (
        |  SELECT n_name, COUNT(*) AS n_cust
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, n_cust FROM nat_cust
        |WHERE n_cust > (SELECT CAST(SUM(n_cust) AS DOUBLE)/COUNT(*) FROM nat_cust)
        |ORDER BY n_cust DESC, n_name""".stripMargin)

  val q23Oracle: String =
    """WITH nat_cust AS (
      |  SELECT n_name, COUNT(*) AS n_cust
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT n_name, n_cust FROM nat_cust
      |WHERE n_cust > (SELECT CAST(SUM(n_cust) AS DOUBLE)/COUNT(*) FROM nat_cust)
      |ORDER BY n_cust DESC, n_name""".stripMargin

  /** VALUES inline table joined against a real table. */
  def q24Values(s: SparkSession, dir: String): DataFrame =
    sql(s, dir,
      """SELECT v.tag, n.n_name
        |FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS v(k, tag)
        |JOIN nation n ON n.n_nationkey = v.k
        |ORDER BY v.k""".stripMargin)

  val q24Oracle: String =
    """SELECT v.tag, n.n_name
      |FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS v(k, tag)
      |JOIN nation n ON n.n_nationkey = v.k
      |ORDER BY v.k""".stripMargin

  /** Join ... USING (shared column name merged to one output column). */
  def q25UsingJoin(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir).select(col("c_nationkey").as("nationkey"), col("c_custkey"))
    val n = nation(s, dir).select(col("n_nationkey").as("nationkey"), col("n_name"))
    c.join(broadcast(n), Seq("nationkey"))
      .groupBy(col("nationkey"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("nationkey"))
  }

  val q25Oracle: String =
    """SELECT nationkey, n_name, COUNT(*) AS n_cust
      |FROM (SELECT c_nationkey AS nationkey, c_custkey FROM customer) c
      |JOIN (SELECT n_nationkey AS nationkey, n_name FROM nation) n USING (nationkey)
      |GROUP BY nationkey, n_name ORDER BY nationkey""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_agg" -> (q02FilterAgg _),
    "q03_join_topk" -> (q03TopUnshipped _),
    "q04_left_join" -> (q04LeftJoin _),
    "q05_multi_join" -> (q05RegionRevenue _),
    "q06_having" -> (q06Having _),
    "q07_distinct" -> (q07Distinct _),
    "q08_semi_join" -> (q08SemiJoin _),
    "q09_anti_join" -> (q09AntiJoin _),
    "q10_full_outer" -> (q10FullOuter _),
    "q11_right_join" -> (q11RightJoin _),
    "q12_cross_join" -> (q12CrossJoin _),
    "q13_union" -> (q13Union _),
    "q14_except_intersect" -> (q14ExceptIntersect _),
    "q15_window_rank" -> (q15WindowRank _),
    "q16_window_analytic" -> (q16WindowAnalytic _),
    "q17_window_frames" -> (q17WindowFrames _),
    "q18_window_distribution" -> (q18WindowDistribution _),
    "q19_topk_offset" -> (q19TopKOffset _),
    "q20_scalar_subquery" -> (q20ScalarSubquery _),
    "q21_in_subquery" -> (q21InSubquery _),
    "q22_correlated_exists" -> (q22CorrelatedExists _),
    "q23_cte" -> (q23Cte _),
    "q24_values" -> (q24Values _),
    "q25_using_join" -> (q25UsingJoin _),
    "q29_groups_frames" -> (q29GroupsFrames _),
    "q35_exclude_frames" -> (q35ExcludeFrames _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Oracle,
    "q02_filter_agg" -> q02Oracle,
    "q03_join_topk" -> q03Oracle,
    "q04_left_join" -> q04Oracle,
    "q05_multi_join" -> q05Oracle,
    "q06_having" -> q06Oracle,
    "q07_distinct" -> q07Oracle,
    "q08_semi_join" -> q08Oracle,
    "q09_anti_join" -> q09Oracle,
    "q10_full_outer" -> q10Oracle,
    "q11_right_join" -> q11Oracle,
    "q12_cross_join" -> q12Oracle,
    "q13_union" -> q13Oracle,
    "q14_except_intersect" -> q14Oracle,
    "q15_window_rank" -> q15Oracle,
    "q16_window_analytic" -> q16Oracle,
    "q17_window_frames" -> q17Oracle,
    "q18_window_distribution" -> q18Oracle,
    "q19_topk_offset" -> q19Oracle,
    "q20_scalar_subquery" -> q20Oracle,
    "q21_in_subquery" -> q21Oracle,
    "q22_correlated_exists" -> q22Oracle,
    "q23_cte" -> q23Oracle,
    "q24_values" -> q24Oracle,
    "q25_using_join" -> q25Oracle,
    "q29_groups_frames" -> q29Oracle,
    "q35_exclude_frames" -> q35Oracle)
}
