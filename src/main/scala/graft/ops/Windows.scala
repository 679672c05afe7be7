package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Util._

/** SURVEY.md §2.5 — analytic window functions over bounded data (the batch
  * face of Flink's keyed-process TopN / rolling-agg / last-value patterns).
  *
  * Scale posture: every window partitions by a grouping key (customer /
  * user / status), so the physical plan is one hash shuffle on that key
  * followed by an in-partition sort — no global sort, no driver collection.
  * Skewed partition keys would be the bottleneck at 100 TB; these keys
  * (custkey, user_id) are high-cardinality/uniform in this schema.
  */
object Windows {

  /** Top-3 orders per customer by totalprice — the hot-items TopN classic.
    * rank() with a unique orderkey tiebreak keeps the cut deterministic. */
  def winRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    orders(s, dir)
      .withColumn("rk", rank().over(w))
      .where($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk", $"o_orderkey")
  }

  val winRankSql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk, o_orderkey""".stripMargin

  /** row_number top-2 per group with unique tiebreak. */
  def winRownumTopn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 2)
      .select($"o_custkey", $"rn", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"))
      .orderBy($"o_custkey", $"rn")
  }

  val winRownumTopnSql: String =
    """SELECT o_custkey, rn, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin

  /** dense_rank of price tiers inside each order status. */
  def winDenseRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    orders(s, dir)
      .withColumn("dr", dense_rank().over(w))
      .where($"dr" <= 5)
      .select($"o_orderstatus", $"dr", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderstatus", $"dr", $"o_orderkey")
  }

  val winDenseRankSql: String =
    """SELECT o_orderstatus, dr, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS dr
      |  FROM orders)
      |WHERE dr <= 5
      |ORDER BY o_orderstatus, dr, o_orderkey""".stripMargin

  /** Running (cumulative) sum/count per user ordered by event time — the
    * batch analog of Flink's keyBy().sum() continuous aggregation. Decimal
    * accumulation (R2) keeps the running sum exact in both engines. */
  def winRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("running_sum", sum(dec2($"value")).over(w).cast("double"))
      .withColumn("running_n", count(lit(1)).over(w))
      .select($"user_id", epochS($"ts").as("t"), $"event_id",
        $"running_sum", $"running_n")
      .orderBy($"user_id", $"t", $"event_id")
  }

  val winRunningSql: String =
    """SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_sum,
      |  COUNT(*) OVER w AS running_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, t, event_id""".stripMargin

  /** lag/lead: delta vs the user's previous event value (the state-backed
    * "previous record" pattern). Same-operand double subtraction is exact. */
  def winLagLead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(s, dir)
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .select($"user_id", epochS($"ts").as("t"), $"event_id", $"value",
        $"prev_value", ($"value" - $"prev_value").as("delta"), $"next_type")
      .orderBy($"user_id", $"t", $"event_id")
  }

  val winLagLeadSql: String =
    """SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, event_id, value,
      |  LAG(value, 1) OVER w AS prev_value,
      |  value - LAG(value, 1) OVER w AS delta,
      |  LEAD(event_type, 1) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, t, event_id""".stripMargin

  /** ntile quartiles + an explicit 3-row moving average frame (decimal sum /
    * frame count, R2 — avoids cross-engine fp averaging). */
  def winNtileFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val order = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val frame = order.rowsBetween(-2, 0)
    orders(s, dir)
      .withColumn("quartile", ntile(4).over(order))
      .withColumn("mov_avg",
        (sum(dec2($"o_totalprice")).over(frame).cast("double") /
          count(lit(1)).over(frame)))
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice",
        $"quartile", $"mov_avg")
      .orderBy($"o_orderstatus", $"o_totalprice".desc, $"o_orderkey")
  }

  val winNtileFrameSql: String =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  NTILE(4) OVER w AS quartile,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER f AS DOUBLE)
      |    / COUNT(*) OVER f AS mov_avg
      |FROM orders
      |WINDOW
      |  w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey),
      |  f AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
      |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank"        -> (winRank _),
    "q_win_rownum_topn" -> (winRownumTopn _),
    "q_win_dense_rank"  -> (winDenseRank _),
    "q_win_running"     -> (winRunning _),
    "q_win_lag_lead"    -> (winLagLead _),
    "q_win_ntile_frame" -> (winNtileFrame _))

  def oracle: Map[String, String] = Map(
    "q_win_rank"        -> winRankSql,
    "q_win_rownum_topn" -> winRownumTopnSql,
    "q_win_dense_rank"  -> winDenseRankSql,
    "q_win_running"     -> winRunningSql,
    "q_win_lag_lead"    -> winLagLeadSql,
    "q_win_ntile_frame" -> winNtileFrameSql)
}
