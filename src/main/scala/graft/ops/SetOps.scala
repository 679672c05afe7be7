package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** SURVEY.md §2.6 — sorts, limits, distinct, set operations.
  *
  * Scale posture: orderBy+limit plans as TakeOrderedAndProject (no global
  * sort); distinct/set ops are hash-aggregations on the full row key — one
  * shuffle each, partial map-side combine included.
  */
object SetOps {

  /** Multi-key mixed asc/desc total sort + top-k. */
  def sortMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // partkey+suppkey complete the unique tiebreak (R1).
    lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_quantity")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber",
        $"l_partkey", $"l_suppkey")
      .limit(50)
  }

  val sortMultiSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  l_extendedprice, l_quantity
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey
      |LIMIT 50""".stripMargin

  /** Row-level distinct over a low-cardinality projection. */
  def distinctRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus", $"l_quantity")
  }

  val distinctRowsSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus, l_quantity""".stripMargin

  private def nationKeys(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    (customer(s, dir).select($"c_nationkey".as("nk")),
      supplier(s, dir).select($"s_nationkey".as("nk")))
  }

  /** Bag union (UNION ALL), folded to counts for a stable small output. */
  def unionAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (c, su) = nationKeys(s, dir)
    c.unionByName(su).groupBy($"nk").agg(count(lit(1)).as("n")).orderBy($"nk")
  }

  val unionAllSql: String =
    """SELECT nk, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  UNION ALL SELECT s_nationkey FROM supplier)
      |GROUP BY nk ORDER BY nk""".stripMargin

  /** Set union (UNION = union + distinct). */
  def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (c, su) = nationKeys(s, dir)
    c.unionByName(su).distinct().orderBy($"nk")
  }

  val unionDistinctSql: String =
    """SELECT c_nationkey AS nk FROM customer
      |UNION SELECT s_nationkey FROM supplier
      |ORDER BY nk""".stripMargin

  /** Set intersection: nations having both customers and suppliers. */
  def intersectKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (c, su) = nationKeys(s, dir)
    c.intersect(su).orderBy($"nk")
  }

  val intersectSql: String =
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier
      |ORDER BY nk""".stripMargin

  /** Set difference: nations with customers but no suppliers. */
  def exceptKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (c, su) = nationKeys(s, dir)
    c.except(su).orderBy($"nk")
  }

  val exceptSql: String =
    """SELECT c_nationkey AS nk FROM customer
      |EXCEPT SELECT s_nationkey FROM supplier
      |ORDER BY nk""".stripMargin

  /** Multiset intersection (INTERSECT ALL): per key, min(multiplicity in
    * customer, multiplicity in supplier) — duplicates survive, unlike
    * [[intersectKeys]]. Folded to per-key counts so the multiplicity
    * arithmetic itself is what the oracle verifies. Plans as a single
    * hash aggregation per side + one shuffle on the row key — the same
    * scale shape as distinct, NOT a join. */
  def intersectAllKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (c, su) = nationKeys(s, dir)
    c.intersectAll(su).groupBy($"nk").agg(count(lit(1)).as("n")).orderBy($"nk")
  }

  val intersectAllSql: String =
    """SELECT nk, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  INTERSECT ALL SELECT s_nationkey FROM supplier)
      |GROUP BY nk ORDER BY nk""".stripMargin

  /** Multiset difference (EXCEPT ALL): per key, multiplicity in customer
    * minus multiplicity in supplier (floored at 0) — the "how many extra
    * copies does the left side have" semantics bag algebra defines and
    * [[exceptKeys]]'s set form cannot express. */
  def exceptAllKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (c, su) = nationKeys(s, dir)
    c.exceptAll(su).groupBy($"nk").agg(count(lit(1)).as("n")).orderBy($"nk")
  }

  val exceptAllSql: String =
    """SELECT nk, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  EXCEPT ALL SELECT s_nationkey FROM supplier)
      |GROUP BY nk ORDER BY nk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort_multi"      -> (sortMulti _),
    "q_distinct_rows"   -> (distinctRows _),
    "q_union_all"       -> (unionAll _),
    "q_union_distinct"  -> (unionDistinct _),
    "q_intersect"       -> (intersectKeys _),
    "q_except"          -> (exceptKeys _),
    "q_intersect_all"   -> (intersectAllKeys _),
    "q_except_all"      -> (exceptAllKeys _))

  def oracle: Map[String, String] = Map(
    "q_sort_multi"      -> sortMultiSql,
    "q_distinct_rows"   -> distinctRowsSql,
    "q_union_all"       -> unionAllSql,
    "q_union_distinct"  -> unionDistinctSql,
    "q_intersect"       -> intersectSql,
    "q_except"          -> exceptSql,
    "q_intersect_all"   -> intersectAllSql,
    "q_except_all"      -> exceptAllSql)
}
