package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Extras, Funcs, Pipeline, Q, Relational, Temporal}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full oracle-checked operator inventory (SURVEY §2):
  *   q: relational surface (§2A rows 1-25)
  *   f: scalar/aggregate function surface (§2A rows 26-30)
  *   s, m: time windows + query-metrics dataflow (§2B B10-B12)
  *   p: training-data pipeline operators (dedup / ANN / text / multimodal)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-style 6-way join + aggregation. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Funcs.queries ++ Temporal.queries ++
      Pipeline.queries ++ Extras.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (minhash/simhash/LSH/IVF/stub
    * decode) get the driver's rows-only check; their exactness is asserted
    * in ScalaTest specs instead. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Funcs.oracles ++ Temporal.oracles ++
      Pipeline.oracles ++ Extras.oracles
}
