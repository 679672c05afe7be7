package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Scans.queries ++ ops.Relational.queries ++ ops.Joins.queries ++
      ops.Aggregations.queries ++ ops.SetOps.queries ++ ops.Windows.queries ++
      ops.Scalars.queries ++ ops.TimeWindows.queries ++ ops.LlmText.queries ++
      ops.LlmVector.queries ++ ops.Advanced.queries ++ ops.Curation.queries ++
      ops.Graph.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Scans.oracle ++ ops.Relational.oracle ++ ops.Joins.oracle ++
      ops.Aggregations.oracle ++ ops.SetOps.oracle ++ ops.Windows.oracle ++
      ops.Scalars.oracle ++ ops.TimeWindows.oracle ++ ops.LlmText.oracle ++
      ops.LlmVector.oracle ++ ops.Advanced.oracle ++ ops.Curation.oracle ++
      ops.Graph.oracle
}
