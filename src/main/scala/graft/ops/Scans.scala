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

  /** Z-order (Morton curve) layout profile — the multi-dimensional
    * data-skipping complement to bucketing (q_join_bucketed): interleave
    * the bits of two scan dimensions into one z-value and block the data
    * by z-prefix. Fixing all but the low 12 z-bits fixes all but the low
    * 6 bits of EACH dimension, so every block's min/max span is ≤ 63 on
    * BOTH dims — a mathematical guarantee (unit-asserted in SourcesSpec),
    * not a data accident. Sorting a 100 TB table by z before writing
    * parquet therefore makes row-group min/max statistics prune scans on
    * either dimension (a single-column sort layout prunes only its own
    * column; this is the Delta/Iceberg OPTIMIZE ZORDER rationale, built
    * from public bit arithmetic).
    *
    * The z-value is a 32-term unrolled shift/mask sum — pure codegen'd
    * integer arithmetic, no UDF; blocks come from the VALUE (z >> 12),
    * not from row_number, so there is no global sort and the profile
    * aggregates with ordinary map-side partials. The DuckDB oracle's
    * interleave expression is GENERATED from the same term list, so the
    * two engines cannot drift. */
  def layoutZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.LongType
    val x = ($"l_partkey" % 65536L).cast(LongType)
    val y = ($"l_suppkey" % 65536L).cast(LongType)
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    lineitem(s, dir)
      .select(x.as("x"), y.as("y"), z.as("z"))
      .groupBy(shiftright($"z", 12).as("zblock"))
      .agg(count(lit(1)).as("n"),
        min($"x").as("min_part"), max($"x").as("max_part"),
        min($"y").as("min_supp"), max($"y").as("max_supp"))
      .orderBy($"zblock")
  }

  val layoutZorderSql: String = {
    val terms = (0 until 16).map { i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH d AS (
      |  SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y FROM lineitem),
      |zt AS (SELECT x, y, $terms AS z FROM d)
      |SELECT z >> 12 AS zblock, COUNT(*) AS n,
      |  MIN(x) AS min_part, MAX(x) AS max_part,
      |  MIN(y) AS min_supp, MAX(y) AS max_supp
      |FROM zt GROUP BY zblock ORDER BY zblock""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_parquet"     -> (scanParquet _),
    "q_scan_union_files" -> (scanUnionFiles _),
    "q_layout_zorder"    -> (layoutZorder _))

  def oracle: Map[String, String] = Map(
    "q_scan_parquet"     -> scanParquetSql,
    "q_scan_union_files" -> scanUnionFilesSql,
    "q_layout_zorder"    -> layoutZorderSql)
}
