package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Util._

/** SURVEY.md §2.3 — join family.
  *
  * Scale posture: fact⋈fact joins shuffle on the equi-key (sort-merge or
  * shuffled-hash, Catalyst + AQE choose); dimension joins broadcast the small
  * side (explicit hint in [[joinBroadcast]], size-based elsewhere). The
  * interval join keys on user_id first so the range predicate is evaluated
  * inside each hash-join group, never as a cartesian product.
  */
object Joins {

  /** Equi inner join fact ⋈ dim (orders ⋈ customer). */
  def joinInner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir).join(customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"o_totalprice", $"o_orderstatus")
      .orderBy($"o_orderkey")
      .limit(500)
  }

  val joinInnerSql: String =
    """SELECT o_orderkey, c_custkey, c_name, o_totalprice, o_orderstatus
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey
      |LIMIT 500""".stripMargin

  /** Left outer: keep customers with no orders (count 0, sum 0). */
  def joinLeft(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir).join(orders(s, dir), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(count($"o_orderkey").as("n_orders"),
        coalesce(sum(dec2($"o_totalprice")).cast("double"), lit(0.0)).as("sum_price"))
      .orderBy($"c_custkey")
  }

  val joinLeftSql: String =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
      |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0) AS sum_price
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin

  /** Full outer nation ⟗ supplier — nulls on either side survive; sort is
    * nulls-first on both engines (Spark's asc default, explicit in DuckDB). */
  def joinFull(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    nation(s, dir).join(supplier(s, dir), $"n_nationkey" === $"s_nationkey", "full")
      .select($"n_nationkey", $"n_name", $"s_suppkey", $"s_name")
      .orderBy(asc_nulls_first("n_nationkey"), asc_nulls_first("s_suppkey"))
  }

  val joinFullSql: String =
    """SELECT n_nationkey, n_name, s_suppkey, s_name
      |FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
      |ORDER BY n_nationkey NULLS FIRST, s_suppkey NULLS FIRST""".stripMargin

  /** Left-semi: customers having ≥1 order (EXISTS). */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir).join(orders(s, dir), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val joinSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti: customers with no orders (NOT EXISTS). */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir).join(orders(s, dir), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val joinAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Explicit broadcast of the 25-row nation dim: at 100 TB the fact side
    * never shuffles for this join — each task probes an in-memory hash map.
    * Result is identical to a plain join, which is what the oracle runs. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir).join(customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"), sumMoney($"o_totalprice").as("sum_price"))
      .orderBy($"n_name")
  }

  val joinBroadcastSql: String =
    """SELECT n_name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Cross join of the two tiny dims (5 × 25). */
  def joinCross(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    region(s, dir).crossJoin(nation(s, dir))
      .select($"r_name", $"n_name")
      .orderBy($"r_name", $"n_name")
  }

  val joinCrossSql: String =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  /** Interval join (Flink intervalJoin analog): signup followed by a purchase
    * from the same user within 10 minutes. Epoch-floor arithmetic (R3) keeps
    * the boundary identical across ns/µs timestamp precisions. */
  def joinInterval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val a = e.where($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"), epochS($"ts").as("t1"))
    val b = e.where($"event_type" === "purchase")
      .select($"user_id".as("u2"), $"event_id".as("purchase_id"), epochS($"ts").as("t2"))
    a.join(b, $"user_id" === $"u2" && $"t2" >= $"t1" && $"t2" <= $"t1" + 600L)
      .select($"user_id", $"signup_id", $"purchase_id", ($"t2" - $"t1").as("delta_s"))
      .orderBy($"user_id", $"signup_id", $"purchase_id")
  }

  val joinIntervalSql: String =
    """SELECT e1.user_id AS user_id, e1.event_id AS signup_id,
      |  e2.event_id AS purchase_id,
      |  CAST(FLOOR(epoch(e2.ts)) - FLOOR(epoch(e1.ts)) AS BIGINT) AS delta_s
      |FROM events e1
      |JOIN events e2 ON e1.user_id = e2.user_id
      |  AND e1.event_type = 'signup' AND e2.event_type = 'purchase'
      |  AND FLOOR(epoch(e2.ts)) >= FLOOR(epoch(e1.ts))
      |  AND FLOOR(epoch(e2.ts)) <= FLOOR(epoch(e1.ts)) + 600
      |ORDER BY user_id, signup_id, purchase_id""".stripMargin

  /** Pure time-range join, bucketed — NO equi key: every (signup, purchase)
    * pair across ALL users where the purchase lands within 60s of the
    * signup. Without a key, Catalyst can only plan a nested-loop join
    * (quadratic scans at 100 TB). The bucketed form manufactures the equi
    * key: bucket width = range width W, the left side keyed by
    * floor(t1/W), the right side replicated to its bucket and the one
    * before (a match's t2 ∈ [t1, t1+W] can only live in those two), then
    * a plain equi-join on the bucket + the exact range filter. Each
    * qualifying pair matches on exactly one replica (the two replicas
    * carry different bucket values), so no dedup is needed — results are
    * row-identical to the theta join the oracle runs. Shuffle is linear
    * in the inputs; replication factor is the constant 2. */
  def joinRangeBucket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = 60L
    val e = events(s, dir)
    val a = e.where($"event_type" === "signup")
      .select($"event_id".as("signup_id"), epochS($"ts").as("t1"))
      .withColumn("bucket", floor($"t1" / w))
    val b = e.where($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), epochS($"ts").as("t2"))
      .withColumn("bucket", explode(array(floor($"t2" / w), floor($"t2" / w) - 1)))
    a.join(b, Seq("bucket"))
      .where($"t2" >= $"t1" && $"t2" <= $"t1" + w)
      .select($"signup_id", $"purchase_id", ($"t2" - $"t1").as("delta_s"))
      .orderBy($"signup_id", $"purchase_id")
  }

  val joinRangeBucketSql: String =
    """SELECT e1.event_id AS signup_id, e2.event_id AS purchase_id,
      |  CAST(FLOOR(epoch(e2.ts)) - FLOOR(epoch(e1.ts)) AS BIGINT) AS delta_s
      |FROM events e1
      |JOIN events e2 ON e1.event_type = 'signup' AND e2.event_type = 'purchase'
      |  AND FLOOR(epoch(e2.ts)) >= FLOOR(epoch(e1.ts))
      |  AND FLOOR(epoch(e2.ts)) <= FLOOR(epoch(e1.ts)) + 60
      |ORDER BY signup_id, purchase_id""".stripMargin

  /** Right outer join: every nation kept, suppliers where present — the
    * mirror of q_join_left exercising the "right" join type (Table API
    * rightOuterJoin). Catalyst canonicalizes it to a left join with sides
    * swapped, so at scale the small preserved side still broadcasts. */
  def joinRight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    supplier(s, dir)
      .join(nation(s, dir), $"s_nationkey" === $"n_nationkey", "right")
      .select($"n_nationkey", $"n_name", $"s_suppkey", $"s_name")
      .orderBy($"n_nationkey", $"s_suppkey")
  }

  val joinRightSql: String =
    """SELECT n_nationkey, n_name, s_suppkey, s_name
      |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY n_nationkey, s_suppkey NULLS FIRST""".stripMargin

  /** Skew-safe salted join surfaced as a contract query: lineitem⋈supplier
    * on suppkey (few suppliers → the canonical hot-key shape at scale) runs
    * through tables.Layout.saltedJoin — content-hash salt on the fact side,
    * dim replicated per salt — then aggregates revenue per supplier. The
    * oracle is the PLAIN join+group: salting must be a pure physical
    * rewrite, row-identical to the unsalted join (that equality IS the
    * check). Money math through DECIMAL (rule R2) keeps the sum exact in
    * any salt-bucket order. */
  def joinSalted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = lineitem(s, dir).select($"l_suppkey", $"l_extendedprice")
    val dim = supplier(s, dir).select($"s_suppkey", $"s_name")
    graft.tables.Layout.saltedJoin(fact, dim, "l_suppkey", "s_suppkey", salts = 8)
      .groupBy($"s_name")
      .agg(count(lit(1)).as("n_items"), sumMoney($"l_extendedprice").as("revenue"))
      .orderBy($"s_name")
  }

  val joinSaltedSql: String =
    """SELECT s_name, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  /** Null-safe equality join (`<=>` / SQL `IS NOT DISTINCT FROM`): NULL
    * keys MATCH each other instead of silently dropping, the semantic a
    * pipeline needs when "unknown" is itself a join category (e.g. docs
    * with no detected language joined to per-language configs with a NULL
    * default row). Both sides derive a nullable key from lineitem
    * (`nullif(l_returnflag,'N')`), the right side being its distinct
    * image with a display label — so the NULL group's survival (it would
    * vanish under `===`, asserted in JoinsSpec) is exactly what the
    * oracle hash checks. Plans as a plain hash equi-join: Catalyst treats
    * `<=>` as an equality predicate, no nested-loop fallback. */
  def joinNullsafe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val left = lineitem(s, dir)
      .select(nullif($"l_returnflag", lit("N")).as("k"), $"l_quantity")
    val dim = left.select($"k").distinct()
      .select($"k".as("dk"), coalesce($"dk", lit("none")).as("flag_label"))
    left.join(dim, $"k" <=> $"dk")
      .groupBy($"flag_label")
      .agg(count(lit(1)).as("n"),
        sum(dec2($"l_quantity")).cast("double").as("sum_qty"))
      .orderBy($"flag_label")
  }

  val joinNullsafeSql: String =
    """WITH l AS (
      |  SELECT nullif(l_returnflag, 'N') AS k, l_quantity FROM lineitem),
      |d AS (
      |  SELECT k AS dk, coalesce(k, 'none') AS flag_label
      |  FROM (SELECT DISTINCT k FROM l))
      |SELECT flag_label, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM l JOIN d ON l.k IS NOT DISTINCT FROM d.dk
      |GROUP BY flag_label ORDER BY flag_label""".stripMargin

  /** Bucket-aligned co-located join — the shuffle-ELIMINATION layout for a
    * repeatedly-joined fact table. Both sides are written once as
    * bucketed+sorted managed tables on the join key
    * ([[graft.tables.Layout.writeBucketed]]); the equi-join then reads
    * co-located buckets, so the physical plan has NO Exchange under the
    * join (plan-asserted in PlanSpec). That is the 100 TB contract: the
    * bucketing write is the one-time layout cost a warehouse pays at
    * ingest, and every subsequent join on that key — the common case for
    * a fact table joined on the same key daily — is shuffle-free, where a
    * plain join would re-shuffle all 100 TB every run.
    *
    * Bucketing is a pure physical property, so the oracle is the PLAIN
    * join+group on the raw parquet. Within one JVM the bucketed copies are
    * written once per sf-dir and reused (the catalog check), keeping
    * repeated Bench/Verify invocations from re-paying the layout cost —
    * exactly like a real warehouse's ingest-once lifecycle. */
  def joinBucketed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sfx = dir.replaceAll("[^0-9A-Za-z]", "_")
    val (ot, ct) = (s"g_orders_bk$sfx", s"g_customer_bk$sfx")
    if (!s.catalog.tableExists(ot))
      graft.tables.Layout.writeBucketed(
        orders(s, dir).select($"o_custkey", $"o_totalprice"), ot, "o_custkey", 16)
    if (!s.catalog.tableExists(ct))
      graft.tables.Layout.writeBucketed(
        customer(s, dir).select($"c_custkey", $"c_mktsegment"), ct, "c_custkey", 16)
    graft.tables.Layout.bucketedJoin(s, ot, ct, "o_custkey", "c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sumMoney($"o_totalprice").as("sum_price"))
      .orderBy($"c_mktsegment")
  }

  val joinBucketedSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_bucketed"  -> (joinBucketed _),
    "q_join_nullsafe"  -> (joinNullsafe _),
    "q_join_range_bucket" -> (joinRangeBucket _),
    "q_join_salted"    -> (joinSalted _),
    "q_join_right"     -> (joinRight _),
    "q_join_inner"     -> (joinInner _),
    "q_join_left"      -> (joinLeft _),
    "q_join_full"      -> (joinFull _),
    "q_join_semi"      -> (joinSemi _),
    "q_join_anti"      -> (joinAnti _),
    "q_join_broadcast" -> (joinBroadcast _),
    "q_join_cross"     -> (joinCross _),
    "q_join_interval"  -> (joinInterval _))

  def oracle: Map[String, String] = Map(
    "q_join_bucketed"  -> joinBucketedSql,
    "q_join_nullsafe"  -> joinNullsafeSql,
    "q_join_salted"    -> joinSaltedSql,
    "q_join_right"     -> joinRightSql,
    "q_join_inner"     -> joinInnerSql,
    "q_join_left"      -> joinLeftSql,
    "q_join_full"      -> joinFullSql,
    "q_join_semi"      -> joinSemiSql,
    "q_join_anti"      -> joinAntiSql,
    "q_join_broadcast" -> joinBroadcastSql,
    "q_join_cross"     -> joinCrossSql,
    "q_join_interval"  -> joinIntervalSql,
    "q_join_range_bucket" -> joinRangeBucketSql)
}
