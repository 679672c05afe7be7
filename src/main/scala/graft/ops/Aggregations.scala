package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Util._

/** SURVEY.md §2.4 — aggregations.
  *
  * All group-bys are plain hash aggregations: Catalyst splits them into
  * partial (map-side) + final phases automatically, so at 100 TB each
  * becomes one shuffle on the group keys with map-side combine — the
  * canonical scalable plan. No driver-side collection anywhere.
  */
object Aggregations {

  /** Flagship: TPC-H-Q1-style pricing summary over lineitem.
    * groupBy(returnflag, linestatus) — 4-6 groups, so the final agg is
    * tiny regardless of input scale; all heavy lifting is map-side. */
  def aggGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .filter($"l_shipdate" <= lit("2000-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
        sumMoney($"l_extendedprice").as("sum_base_price"),
        sum(dec2($"l_extendedprice") * (lit(1) - rate2($"l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec2($"l_extendedprice") * (lit(1) - rate2($"l_discount"))
          * (lit(1) + rate2($"l_tax"))).cast("double").as("sum_charge"),
        (sum(dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        avgMoney($"l_extendedprice").as("avg_price"),
        (sum(rate2($"l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val aggGroupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Ungrouped global aggregate — single-row result, pure map-side. */
  def aggGlobal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir).agg(
      count(lit(1)).as("n_rows"),
      sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
      min($"l_quantity").as("min_qty"),
      max($"l_quantity").as("max_qty"),
      (sum(dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
      sumMoney($"l_extendedprice").as("sum_price"),
      min(date_format($"l_shipdate", "yyyy-MM-dd")).as("min_ship"),
      max(date_format($"l_shipdate", "yyyy-MM-dd")).as("max_ship"))
  }

  val aggGlobalSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  MIN(strftime(l_shipdate, '%Y-%m-%d')) AS min_ship,
      |  MAX(strftime(l_shipdate, '%Y-%m-%d')) AS max_ship
      |FROM lineitem""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_group"  -> (aggGroup _),
    "q_agg_global" -> (aggGlobal _))

  def oracle: Map[String, String] = Map(
    "q_agg_group"  -> aggGroupSql,
    "q_agg_global" -> aggGlobalSql)
}
