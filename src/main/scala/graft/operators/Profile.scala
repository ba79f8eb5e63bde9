package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the audit pass a pipeline runs before committing a
  * corpus to training: per column, row/null/distinct counts, lexical
  * min/max and total value length. One unpivot + one keyed aggregation
  * (a single shuffle for ALL columns together, not a scan per column).
  *
  * `exactDistinct = true` uses count(DISTINCT) — exact, oracle-checkable,
  * fine into the billions since the shuffle is keyed by (column, value)
  * partials; at extreme cardinalities flip it off for HyperLogLog
  * (`approx_count_distinct`, mergeable sketch, one pass) and accept ±2%.
  * Values profile through a canonical string cast so one schema covers
  * every column type (the lexical min/max this yields is the standard
  * profiler convention).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val pairs: Seq[Column] = cols.flatMap(c =>
      Seq(lit(c), col(c).cast("string")))
    val unpivoted = df.select(explode(map(pairs: _*)).as(Seq("col_name", "v")))
    val distinctAgg =
      if (exactDistinct) countDistinct(col("v")).as("n_distinct")
      else approx_count_distinct(col("v")).as("n_distinct")
    unpivoted.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      count(col("v")).as("n_nonnull"),
      distinctAgg,
      min(col("v")).as("min_str"),
      max(col("v")).as("max_str"),
      coalesce(sum(length(col("v"))), lit(0L)).as("total_len"))
  }
}
