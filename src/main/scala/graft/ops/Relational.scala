package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.tables.Tables._
import Util._

/** SURVEY.md §2.2 — projections, filters, row transforms (Flink map/filter/
  * flatMap analogs, expressed declaratively so Catalyst pushes predicates
  * and prunes columns into the parquet scan).
  */
object Relational {

  /** map → computed column: revenue = extendedprice * (1 - discount), in
    * exact decimal (R2) so both engines agree bit-for-bit. */
  def projectExpr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // (l_orderkey, l_linenumber) is NOT unique in this data — the full
    // unique key includes partkey+suppkey (verified at sf0.01), rule R1.
    lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        (dec2($"l_extendedprice") * (lit(1) - rate2($"l_discount")))
          .cast("double").as("revenue"))
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .limit(1000)
  }

  val projectExprSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey
      |LIMIT 1000""".stripMargin

  /** filter → compound predicate; all three conjuncts reach the parquet
    * reader as PushedFilters (decimal compare keeps 0.02 exact, R2). */
  def filterCompound(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .where($"l_quantity" >= 45 &&
        rate2($"l_discount") <= lit("0.02").cast(DecimalType(4, 2)) &&
        $"l_returnflag" === "R")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        $"l_quantity", $"l_discount", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
  }

  val filterCompoundSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  l_quantity, l_discount, l_returnflag
      |FROM lineitem
      |WHERE l_quantity >= 45
      |  AND CAST(l_discount AS DECIMAL(4,2)) <= CAST('0.02' AS DECIMAL(4,2))
      |  AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** flatMap → explode: the wordcount tokenizer (1 doc → N words). Shared
    * with q_text_wordcount (§2.9) — identical semantics by design. */
  def flatmapExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select(explode(split(trim($"text"), " ")).as("word"))
      .where(length($"word") > 0)
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word")
      .limit(20)
  }

  val flatmapExplodeSql: String =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents)
      |WHERE length(word) > 0
      |GROUP BY word
      |ORDER BY n DESC, word
      |LIMIT 20""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_project_expr"    -> (projectExpr _),
    "q_filter"          -> (filterCompound _),
    "q_flatmap_explode" -> (flatmapExplode _))

  def oracle: Map[String, String] = Map(
    "q_project_expr"    -> projectExprSql,
    "q_filter"          -> filterCompoundSql,
    "q_flatmap_explode" -> flatmapExplodeSql)
}
