package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Q._
import graft.functions.SqliteFunctions

/** Scalar-function surface (SURVEY.md §2A rows 26-30): the SQLite built-in
  * functions the reference delegates to, re-expressed with Spark's codegen'd
  * `functions._` (and our compat pack for the ones Spark lacks).
  *
  * Int-ish outputs are cast to long: Spark's length/instr return int32 while
  * DuckDB returns int64, and the driver compares values after a column-name
  * sort, so widths should agree.
  */
object Funcs {

  /** String functions: length, substr, upper, lower, trim, replace, instr,
    * reverse, lpad, repeat, split_part, hex (reference: SQLite core string
    * functions, SURVEY §2A row 26). */
  def f01Strings(s: SparkSession, dir: String): DataFrame =
    part(s, dir).filter(col("p_partkey") < 60)
      .select(
        col("p_partkey"),
        col("p_name"),
        length(col("p_name")).cast("long").as("name_len"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_name"), 2, 5).as("name_sub"),
        expr("replace(p_name, ' ', '_')").as("name_us"),
        instr(col("p_name"), "widget").cast("long").as("widget_at"),
        trim(lit(" x ")).as("trimmed"),
        reverse(col("p_brand")).as("brand_rev"),
        lpad(col("p_partkey").cast("string"), 6, "0").as("key_pad"),
        repeat(col("p_type"), 2).as("type_twice"),
        element_at(split(col("p_brand"), "#"), 2).as("brand_num"),
        lower(hex(col("p_name"))).as("name_hex"))
      .orderBy(col("p_partkey"))

  val f01Oracle: String =
    """SELECT p_partkey, p_name,
      |  length(p_name) AS name_len,
      |  upper(p_name) AS name_upper,
      |  lower(p_brand) AS brand_lower,
      |  substr(p_name, 2, 5) AS name_sub,
      |  replace(p_name, ' ', '_') AS name_us,
      |  instr(p_name, 'widget') AS widget_at,
      |  trim(' x ') AS trimmed,
      |  reverse(p_brand) AS brand_rev,
      |  lpad(CAST(p_partkey AS VARCHAR), 6, '0') AS key_pad,
      |  repeat(p_type, 2) AS type_twice,
      |  split_part(p_brand, '#', 2) AS brand_num,
      |  lower(hex(p_name)) AS name_hex
      |FROM part WHERE p_partkey < 60 ORDER BY p_partkey""".stripMargin

  /** LIKE / GLOB / BETWEEN / IN predicates (SQLite WHERE surface, §2A row 7).
    * GLOB goes through our compat translator (SqliteFunctions.glob). */
  def f02Patterns(s: SparkSession, dir: String): DataFrame =
    part(s, dir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
      .filter(col("p_name").like("%widget%") &&
        SqliteFunctions.glob(col("p_brand"), "Brand#1*") &&
        col("p_size").between(5, 30) &&
        col("p_type").isin("ECONOMY", "PROMO"))
      .orderBy(col("p_partkey"))

  val f02Oracle: String =
    """SELECT p_partkey, p_name, p_brand, p_size FROM part
      |WHERE p_name LIKE '%widget%' AND p_brand LIKE 'Brand#1%'
      |  AND p_size BETWEEN 5 AND 30 AND p_type IN ('ECONOMY','PROMO')
      |ORDER BY p_partkey""".stripMargin

  /** Date/time functions: strftime-style formatting, unixepoch, julianday,
    * date arithmetic (SQLite date functions, §2A row 28; our compat layer
    * maps strftime tokens onto date_format). */
  def f03Dates(s: SparkSession, dir: String): DataFrame =
    orders(s, dir).filter(col("o_orderkey") < 120)
      .select(
        col("o_orderkey"),
        SqliteFunctions.strftime("%Y-%m-%d %H:%M:%S", col("o_orderdate")).as("odate_str"),
        SqliteFunctions.strftime("%Y-%m", col("o_orderdate")).as("omonth"),
        SqliteFunctions.strftime("%w", col("o_orderdate")).as("wday"),
        SqliteFunctions.strftime("%j", col("o_orderdate")).as("yday"),
        SqliteFunctions.strftime("%H:%M:%f", col("o_orderdate")).as("tfrac"),
        year(col("o_orderdate")).cast("long").as("oyear"),
        month(col("o_orderdate")).cast("long").as("omonth_num"),
        dayofmonth(col("o_orderdate")).cast("long").as("oday"),
        SqliteFunctions.unixepoch(col("o_orderdate")).as("oepoch"),
        round(SqliteFunctions.julianday(col("o_orderdate")), 6).as("ojulian"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_95"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"))
      .orderBy(col("o_orderkey"))

  val f03Oracle: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate_str,
      |  strftime(o_orderdate, '%Y-%m') AS omonth,
      |  strftime(o_orderdate, '%w') AS wday,
      |  strftime(o_orderdate, '%j') AS yday,
      |  strftime(o_orderdate, '%H:%M:%S.%g') AS tfrac,
      |  EXTRACT(year FROM o_orderdate) AS oyear,
      |  EXTRACT(month FROM o_orderdate) AS omonth_num,
      |  EXTRACT(day FROM o_orderdate) AS oday,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS oepoch,
      |  round(epoch(o_orderdate)/86400.0 + 2440587.5, 6) AS ojulian,
      |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
      |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30
      |FROM orders WHERE o_orderkey < 120 ORDER BY o_orderkey""".stripMargin

  /** JSON1 surface (§2A row 29): json_extract -> get_json_object /
    * from_json; aggregates over extracted values. */
  def f04Json(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k2", from_json(col("props"), lit("k INT")).getField("k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k2")).as("max_k"),
        count(when(col("k") > 50, 1)).as("n_big"))
      .orderBy(col("event_type"))

  val f04Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_big
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Conditionals: coalesce / nullif / iif / CASE / greatest / least
    * (§2A row 30). */
  def f05Conditionals(s: SparkSession, dir: String): DataFrame =
    customer(s, dir).filter(col("c_custkey") < 80)
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<none>")).as("seg_or_none"),
        SqliteFunctions.iif(col("c_acctbal") > 5000, lit("hi"), lit("lo")).as("bal_band"),
        when(col("c_acctbal") < 1000, "low")
          .when(col("c_acctbal") < 7500, "mid")
          .otherwise("high").as("bal_case"),
        greatest(col("c_acctbal"), lit(5000.0)).as("bal_floor5k"),
        least(col("c_nationkey"), lit(10)).as("nk_cap10"),
        SqliteFunctions.likelihood(col("c_acctbal"), 0.9).as("bal_hint"),
        SqliteFunctions.sqliteVersion.as("dialect_ver"))
      .orderBy(col("c_custkey"))

  val f05Oracle: String =
    """SELECT c_custkey,
      |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<none>') AS seg_or_none,
      |  CASE WHEN c_acctbal > 5000 THEN 'hi' ELSE 'lo' END AS bal_band,
      |  CASE WHEN c_acctbal < 1000 THEN 'low'
      |       WHEN c_acctbal < 7500 THEN 'mid' ELSE 'high' END AS bal_case,
      |  GREATEST(c_acctbal, 5000.0) AS bal_floor5k,
      |  LEAST(c_nationkey, 10) AS nk_cap10,
      |  c_acctbal AS bal_hint,
      |  '3.49.1' AS dialect_ver
      |FROM customer WHERE c_custkey < 80 ORDER BY c_custkey""".stripMargin

  /** group_concat with deterministic (sorted) order — SQLite's group_concat
    * is unordered; we pin sort order on both sides (SURVEY §7.4 item 1). */
  def f06GroupConcat(s: SparkSession, dir: String): DataFrame =
    supplier(s, dir)
      .join(broadcast(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(SqliteFunctions.groupConcatOrdered(col("s_name"), ",").as("suppliers"),
        count(lit(1)).as("n_supp"))
      .orderBy(col("n_name"))

  val f06Oracle: String =
    """SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
      |  COUNT(*) AS n_supp
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Math / numeric ops: abs, ceil, floor, sign, %, integer division with
    * SQLite truncation semantics (§7.4 item 1: SQLite 1/2=0). */
  def f07Math(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir).filter(col("l_orderkey") < 60)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - 30000.0).as("abs_dev"),
        ceil(col("l_discount") * 100).cast("long").as("disc_pct_ceil"),
        floor(col("l_tax") * 100).cast("long").as("tax_pct_floor"),
        signum(col("l_extendedprice") - 30000.0).as("dev_sign"),
        (col("l_linenumber") % 3).cast("long").as("ln_mod3"),
        expr("CAST(l_quantity AS BIGINT) div 7").as("qty_div7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val f07Oracle: String =
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_extendedprice - 30000.0) AS abs_dev,
      |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
      |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
      |  CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS dev_sign,
      |  CAST(l_linenumber % 3 AS BIGINT) AS ln_mod3,
      |  CAST(trunc(l_quantity) AS BIGINT) // 7 AS qty_div7
      |FROM lineitem WHERE l_orderkey < 60 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Conditional aggregation: count/sum/avg over CASE (FILTER-style). */
  def f08ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        dsum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0)).as("open_total"),
        (dsum(when(col("o_totalprice") > 100000.0, col("o_totalprice")).otherwise(0.0)) /
          count(lit(1))).as("big_share"))
      .orderBy(col("o_orderpriority"))

  val f08Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS open_total,
      |  CAST(SUM(CAST(CASE WHEN o_totalprice > 100000.0 THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS big_share
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** DISTINCT aggregates: count(DISTINCT), sum(DISTINCT), typeof compat. */
  def f09DistinctAgg(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
        sum_distinct(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_dist_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val f09Oracle: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
      |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_dist_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Manual two-pass-free stddev/variance via exact decimal sums — shows
    * map-side partial aggregation staying deterministic (no float reorder). */
  def f10StatsManual(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("c_acctbal")).as("sum_bal"),
        // scale 2 keeps the decimal's scaled integer < 2^53, so the
        // decimal->double cast is exact on any engine
        dsum(col("c_acctbal") * col("c_acctbal"), 2).as("sum_bal_sq"))
      .select(
        col("c_mktsegment"), col("n"), col("sum_bal"),
        ((col("sum_bal_sq") - col("sum_bal") * col("sum_bal") / col("n")) /
          (col("n") - lit(1))).as("variance"))
      .orderBy(col("c_mktsegment"))

  val f10Oracle: String =
    """SELECT c_mktsegment, n, sum_bal,
      |  (sum_bal_sq - sum_bal*sum_bal/n) / (n-1) AS variance
      |FROM (
      |  SELECT c_mktsegment, COUNT(*) AS n,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
      |    CAST(SUM(CAST(c_acctbal*c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal_sq
      |  FROM customer GROUP BY c_mktsegment) x
      |ORDER BY c_mktsegment""".stripMargin

  /** SQLite date *modifiers* — the `date(x, '+3 days', 'start of month',
    * 'weekday 0', ...)` surface (§2A row 28) via SqliteFunctions.dateModify.
    * The oracle re-derives each modifier with DuckDB interval arithmetic. */
  def f12DateModifiers(s: SparkSession, dir: String): DataFrame = {
    import SqliteFunctions.dateModify
    orders(s, dir).filter(col("o_orderkey") < 150)
      .select(
        col("o_orderkey"),
        date_format(dateModify(col("o_orderdate"), "+3 days"),
          "yyyy-MM-dd HH:mm:ss").as("plus3d"),
        date_format(dateModify(col("o_orderdate"), "-2 months"),
          "yyyy-MM-dd").as("minus2m"),
        date_format(dateModify(col("o_orderdate"), "+12 hours", "+30 minutes"),
          "yyyy-MM-dd HH:mm:ss").as("plus_hm"),
        date_format(dateModify(col("o_orderdate"), "start of month"),
          "yyyy-MM-dd").as("som"),
        date_format(dateModify(col("o_orderdate"), "start of year"),
          "yyyy-MM-dd").as("soy"),
        date_format(dateModify(col("o_orderdate"), "weekday 0"),
          "yyyy-MM-dd").as("next_sun"),
        date_format(dateModify(col("o_orderdate"), "start of month", "+1 month", "-1 day"),
          "yyyy-MM-dd").as("eom"))
      .orderBy(col("o_orderkey"))
  }

  val f12Oracle: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate + INTERVAL 3 DAY, '%Y-%m-%d %H:%M:%S') AS plus3d,
      |  strftime(o_orderdate - INTERVAL 2 MONTH, '%Y-%m-%d') AS minus2m,
      |  strftime(o_orderdate + INTERVAL 12 HOUR + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus_hm,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS som,
      |  strftime(date_trunc('year', o_orderdate), '%Y-%m-%d') AS soy,
      |  strftime(o_orderdate + to_days(CAST((0 - dayofweek(o_orderdate) + 7) % 7 AS INT)), '%Y-%m-%d') AS next_sun,
      |  strftime(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 DAY, '%Y-%m-%d') AS eom
      |FROM orders WHERE o_orderkey < 150 ORDER BY o_orderkey""".stripMargin

  /** JSON construction (§2A row 29): json_object → to_json(struct),
    * json_array → to_json(array), json_array_length. Output strings are
    * byte-compared against DuckDB's json_object/json_array rendering, so
    * this pins the wire format too (no spaces, insertion-ordered keys). */
  def f13JsonConstruct(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("event_id") < 300)
      .select(
        col("event_id"),
        to_json(struct(col("event_type").as("t"), col("user_id").as("u"))).as("jo"),
        to_json(array(col("user_id"), col("event_id"))).as("ja"),
        json_array_length(to_json(array(col("user_id"), col("event_id"))))
          .cast("long").as("jlen"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .orderBy(col("event_id"))

  val f13Oracle: String =
    """SELECT event_id,
      |  CAST(json_object('t', event_type, 'u', user_id) AS VARCHAR) AS jo,
      |  CAST(json_array(user_id, event_id) AS VARCHAR) AS ja,
      |  CAST(json_array_length(json_array(user_id, event_id)) AS BIGINT) AS jlen,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin

  /** JSON aggregate construction: json_group_array (ordered) and
    * json_group_object (sorted keys) — SQLite JSON1 aggregates re-expressed
    * as to_json over collect_list / map_from_entries. Two-level agg: the
    * per-type counts aggregate map-side first, then a single tiny global
    * row builds the object — no wide shuffle. */
  def f15JsonGroup(s: SparkSession, dir: String): DataFrame = {
    val perType = events(s, dir).filter(col("event_id") < 100)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        to_json(sort_array(collect_list(col("user_id")))).as("users_json"))
    val obj = perType
      .agg(to_json(map_from_entries(sort_array(
        collect_list(struct(col("event_type"), col("n")))))).as("counts_json"))
    perType.crossJoin(obj)
      .select(col("event_type"), col("n"), col("users_json"), col("counts_json"))
      .orderBy(col("event_type"))
  }

  val f15Oracle: String =
    """WITH per_type AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(to_json(list(user_id ORDER BY user_id)) AS VARCHAR) AS users_json
      |  FROM events WHERE event_id < 100 GROUP BY event_type),
      |obj AS (
      |  SELECT CAST(to_json(map_from_entries(
      |    list(struct_pack(event_type := event_type, n := n) ORDER BY event_type)))
      |    AS VARCHAR) AS counts_json
      |  FROM per_type)
      |SELECT event_type, n, users_json, counts_json
      |FROM per_type CROSS JOIN obj ORDER BY event_type""".stripMargin

  /** String extras (§2A row 26): char/unicode (chr/ascii), printf
    * (format_string), quote, hex→unhex round trip. */
  def f14StringExtras(s: SparkSession, dir: String): DataFrame =
    part(s, dir).filter(col("p_partkey") < 80)
      .select(
        col("p_partkey"),
        expr("char(65 + p_partkey % 26)").as("key_char"),
        ascii(substring(col("p_name"), 1, 1)).cast("long").as("first_cp"),
        format_string("%03d|%s", col("p_partkey"), col("p_brand")).as("pf"),
        SqliteFunctions.quoteText(col("p_name")).as("quoted"),
        unhex(lower(hex(col("p_name")))).cast("string").as("hex_roundtrip"))
      .orderBy(col("p_partkey"))

  val f14Oracle: String =
    """SELECT p_partkey,
      |  chr(CAST(65 + p_partkey % 26 AS INT)) AS key_char,
      |  ascii(substr(p_name, 1, 1)) AS first_cp,
      |  printf('%03d|%s', p_partkey, p_brand) AS pf,
      |  '''' || replace(p_name, '''', '''''') || '''' AS quoted,
      |  CAST(unhex(lower(hex(p_name))) AS VARCHAR) AS hex_roundtrip
      |FROM part WHERE p_partkey < 80 ORDER BY p_partkey""".stripMargin

  /** SQLite scalar odds and ends (§2A rows 26-27, 30): negative-index
    * substr (counts from the end, lang_corefunc.html#substr), scalar
    * multi-arg min/max (least/greatest), nullif, sign, charset ltrim. */
  def f17ScalarEdge(s: SparkSession, dir: String): DataFrame =
    part(s, dir).filter(col("p_partkey") < 80)
      .select(
        col("p_partkey"),
        substring(col("p_name"), -5, 3).as("tail_sub"),
        least(col("p_partkey"), lit(10), lit(25)).as("min3"),
        greatest(col("p_partkey"), lit(10), lit(25)).as("max3"),
        nullif(col("p_partkey") % 10, lit(0)).as("nz"),
        signum(col("p_retailprice") - 1200.0).cast("long").as("sgn"),
        ltrim(col("p_brand"), "Brand#").as("brand_id"),
        abs(col("p_partkey") - lit(40)).as("dist40"))
      .orderBy(col("p_partkey"))

  val f17Oracle: String =
    """SELECT p_partkey,
      |  substring(p_name, -5, 3) AS tail_sub,
      |  least(p_partkey, 10, 25) AS min3,
      |  greatest(p_partkey, 10, 25) AS max3,
      |  nullif(p_partkey % 10, 0) AS nz,
      |  CAST(sign(p_retailprice - 1200.0) AS BIGINT) AS sgn,
      |  ltrim(p_brand, 'Brand#') AS brand_id,
      |  abs(p_partkey - 40) AS dist40
      |FROM part WHERE p_partkey < 80 ORDER BY p_partkey""".stripMargin

  /** JSON1 mutation surface (§2A row 29): json_set/remove/patch/type/
    * valid/quote via graft.functions.JsonFunctions (Jackson UDFs; the
    * extraction hot path stays native, f04). DuckDB mirrors: set/remove/
    * patch through json_merge_patch, type through a name mapping. */
  def f16JsonMutation(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.JsonFunctions._
    events(s, dir).filter(col("event_id") < 200)
      .select(
        col("event_id"),
        jsonSet(col("props"), "$.x", col("event_id").cast("string")).as("jset"),
        jsonRemove(col("props"), "$.k").as("jrm"),
        jsonPatch(col("props"), lit("""{"k":null,"y":2}""")).as("jpatch"),
        jsonType(col("props"), "$.k").as("jtype"),
        jsonValid(col("props")).as("jvalid"),
        jsonQuote(col("event_type")).as("jquote"))
      .orderBy(col("event_id"))
  }

  val f16Oracle: String =
    """SELECT event_id,
      |  CAST(json_merge_patch(props, json_object('x', event_id)) AS VARCHAR) AS jset,
      |  CAST(json_merge_patch(props, '{"k":null}') AS VARCHAR) AS jrm,
      |  CAST(json_merge_patch(props, '{"k":null,"y":2}') AS VARCHAR) AS jpatch,
      |  CASE WHEN json_type(props, '$.k') IN ('UBIGINT','BIGINT') THEN 'integer'
      |       WHEN json_type(props, '$.k') = 'DOUBLE' THEN 'real'
      |       WHEN json_type(props, '$.k') = 'VARCHAR' THEN 'text'
      |       ELSE lower(json_type(props, '$.k')) END AS jtype,
      |  CAST(json_valid(props) AS BIGINT) AS jvalid,
      |  CAST(to_json(event_type) AS VARCHAR) AS jquote
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "f16_json_mutation" -> (f16JsonMutation _),
    "f17_scalar_edge" -> (f17ScalarEdge _),
    "f12_date_modifiers" -> (f12DateModifiers _),
    "f13_json_construct" -> (f13JsonConstruct _),
    "f14_string_extras" -> (f14StringExtras _),
    "f15_json_group" -> (f15JsonGroup _),
    "f01_string_funcs" -> (f01Strings _),
    "f02_patterns" -> (f02Patterns _),
    "f03_date_funcs" -> (f03Dates _),
    "f04_json_funcs" -> (f04Json _),
    "f05_conditionals" -> (f05Conditionals _),
    "f06_group_concat" -> (f06GroupConcat _),
    "f07_math" -> (f07Math _),
    "f08_conditional_agg" -> (f08ConditionalAgg _),
    "f09_distinct_agg" -> (f09DistinctAgg _),
    "f10_stats_manual" -> (f10StatsManual _))

  val oracles: Map[String, String] = Map(
    "f16_json_mutation" -> f16Oracle,
    "f17_scalar_edge" -> f17Oracle,
    "f12_date_modifiers" -> f12Oracle,
    "f13_json_construct" -> f13Oracle,
    "f14_string_extras" -> f14Oracle,
    "f15_json_group" -> f15Oracle,
    "f01_string_funcs" -> f01Oracle,
    "f02_patterns" -> f02Oracle,
    "f03_date_funcs" -> f03Oracle,
    "f04_json_funcs" -> f04Oracle,
    "f05_conditionals" -> f05Oracle,
    "f06_group_concat" -> f06Oracle,
    "f07_math" -> f07Oracle,
    "f08_conditional_agg" -> f08Oracle,
    "f09_distinct_agg" -> f09Oracle,
    "f10_stats_manual" -> f10Oracle)
}
