package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query pack.
  *
  * Determinism rules (the driver hash-compares our parquet against DuckDB):
  *   - Sums over doubles are computed as exact decimal sums of per-row
  *     decimal casts (order-independent across partitions / engines), then
  *     cast back to double for a type both engines surface identically.
  *   - Averages are exact-decimal-sum / count performed in IEEE double.
  *   - Every query orders by a total (unique) key.
  *   - Timestamps in outputs are formatted to strings.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a double expression: per-row decimal
    * cast -> decimal sum -> double. DuckDB twin:
    * CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE). */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic average: exact decimal sum divided by count in double.
    * DuckDB twin: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)/COUNT(*). */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def events(s: SparkSession, dir: String): DataFrame = t(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")

  /** Un-spread loaders for the measured exceptions — see
    * [[graft.Tables.loadRaw]]: pipelines whose cost is exchanges, not
    * scan-side CPU, where the adaptive scan-spread exchange only adds
    * latency. */
  def eventsRaw(s: SparkSession, dir: String): DataFrame =
    graft.Tables.loadRaw(s, dir, "events")
  def documentsRaw(s: SparkSession, dir: String): DataFrame =
    graft.Tables.loadRaw(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")

  /** Run a SQL query with the corpus tables it references registered as
    * temp views. Only the referenced tables are loaded, so one broken
    * loader cannot cascade into unrelated SQL entries (r6 lesson) — a
    * query that truly needs the broken table still fails loudly at load. */
  def sql(s: SparkSession, dir: String, query: String): DataFrame = {
    graft.Tables.registerReferenced(s, dir, query)
    s.sql(query)
  }
}
