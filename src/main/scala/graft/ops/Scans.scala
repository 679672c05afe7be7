package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Util._

/** SURVEY.md §2.1 — scans / file sources.
  *
  * Scale posture: both queries are pure parquet scans; Catalyst prunes the
  * read schema to the selected columns and `orderBy(...).limit(n)` plans as
  * `TakeOrderedAndProject` (per-partition top-k + single small reduce), so
  * neither performs a global sort at 100 TB.
  */
object Scans {

  /** Full-table scan + total order + limit (rules R1/R5). */
  def scanParquet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
    // (l_orderkey, l_linenumber) alone is not unique in this data (R1):
    // partkey+suppkey complete the row key.
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        $"l_quantity", $"l_extendedprice",
        date_format($"l_shipdate", "yyyy-MM-dd").as("ship_date"))
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .limit(100)
  }

  val scanParquetSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  l_quantity, l_extendedprice,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey
      |LIMIT 100""".stripMargin

  /** Multi-file scan as one relation (here: same file listed twice — the
    * multi-path API; a real deployment would glob a partitioned directory). */
  def scanUnionFiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = s.read.parquet(s"$dir/orders.parquet", s"$dir/orders.parquet")
    df.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sumMoney($"o_totalprice").as("sum_price"))
      .orderBy($"o_orderstatus")
  }

  val scanUnionFilesSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_parquet"     -> (scanParquet _),
    "q_scan_union_files" -> (scanUnionFiles _))

  def oracle: Map[String, String] = Map(
    "q_scan_parquet"     -> scanParquetSql,
    "q_scan_union_files" -> scanUnionFilesSql)
}
