package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.tables.Tables._
import Util._

/** Advanced relational operators beyond the core inventory: as-of join,
  * pivot, exact statistical moments, and exact median — each with a DuckDB
  * oracle twin.
  */
object Advanced {

  /** Backward as-of join: each purchase matched to the user's latest signup
    * at-or-before it (DuckDB: native ASOF JOIN; Spark lacks the operator —
    * composed per SURVEY §4.2 preference (a): range join + keep-latest
    * window. At 100 TB the composition shuffles once on user_id and ranks
    * within the partition; the classic union-merge mapPartitions variant
    * is the fallback if the range-match blowup ever dominates (it is
    * bounded by signups-per-user here). */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), epochS($"ts").as("p_t"))
    val signups = e.where($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"event_id".as("signup_id"), epochS($"ts").as("s_t"))
    val w = Window.partitionBy($"purchase_id").orderBy($"s_t".desc, $"signup_id".desc)
    purchases
      .join(signups, $"user_id" === $"s_user" && $"s_t" <= $"p_t")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"purchase_id", $"p_t", $"signup_id", $"s_t",
        ($"p_t" - $"s_t").as("lag_s"))
      .orderBy($"user_id", $"purchase_id")
  }

  val joinAsofSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS p_t
      |  FROM events WHERE event_type = 'purchase'),
      |sg AS (
      |  SELECT user_id AS s_user, event_id AS signup_id,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS s_t
      |  FROM events WHERE event_type = 'signup')
      |SELECT user_id, purchase_id, p_t, signup_id, s_t, p_t - s_t AS lag_s
      |FROM (
      |  SELECT p.user_id, p.purchase_id, p.p_t, sg.signup_id, sg.s_t,
      |    ROW_NUMBER() OVER (PARTITION BY p.purchase_id
      |                       ORDER BY sg.s_t DESC, sg.signup_id DESC) AS rn
      |  FROM p JOIN sg ON p.user_id = sg.s_user AND sg.s_t <= p.p_t)
      |WHERE rn = 1
      |ORDER BY user_id, purchase_id""".stripMargin

  /** Pivot: event counts per user-activity weekday × type matrix. Column
    * names come from the pivoted values on both sides. */
  def pivotTypes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .withColumn("wd", pmod(epochDay($"ts"), lit(7)).cast(LongType))
      .groupBy($"wd")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"wd")
  }

  val pivotTypesSql: String =
    """SELECT CAST(FLOOR(epoch(ts)/86400) AS BIGINT) % 7 AS wd,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events
      |GROUP BY 1
      |ORDER BY wd""".stripMargin

  /** Statistical moments computed from EXACT decimal sums (Σx, Σx² stay in
    * decimal — 2dp inputs square to exact 4dp), so mean/variance/stddev are
    * derived by the same double formula in both engines instead of relying
    * on engine-internal (Welford vs two-pass) accumulation order. */
  def statsMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = dec2($"value")
    events(s, dir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("s1"),
        sum(x * x).cast("double").as("s2"))
      .select(
        $"event_type", $"n",
        ($"s1" / $"n").as("mean"),
        (($"s2" - $"s1" * $"s1" / $"n") / ($"n" - lit(1))).as("variance"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - lit(1))).as("stddev"))
      .orderBy($"event_type")
  }

  val statsMomentsSql: String =
    """WITH m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n,
      |  s1 / n AS mean,
      |  (s2 - s1 * s1 / n) / (n - 1) AS variance,
      |  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev
      |FROM m ORDER BY event_type""".stripMargin

  /** Exact median (lower discrete): the middle element by explicit position
    * — engine-agnostic by construction, unlike percentile built-ins whose
    * edge conventions differ.
    *
    * Scale design (r5 verdict): the obvious row_number-over-events window
    * sorts EVERY row of each event_type partition — with 5 distinct keys
    * that is five single-reducer sorts of ~20% of a 100 TB corpus each, a
    * low-cardinality-skew killer. Instead we exploit that `value` is a
    * 2-decimal price: the distinct-value domain is bounded (≤ ~49k values
    * here, and domain-bounded in general), so an exact VALUE HISTOGRAM
    * `groupBy(event_type, value).count` — a map-side-combining hash agg
    * whose output size is capped by the domain, not the corpus — followed
    * by a cumulative window over that tiny histogram selects the k-th
    * element exactly. The only sort touches ≤ |domain| rows per key.
    * The k-th row by (value, event_id) has the same VALUE as the k-th by
    * value alone (the tiebreak permutes rows within equal values only), so
    * the emitted median is identical to the oracle's row-positional one. */
  def medianValue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = events(s, dir)
      .groupBy($"event_type", $"value")
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"event_type").orderBy($"value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy($"event_type")
    hist
      .withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("n", sum($"cnt").over(wKey))
      .withColumn("k", (($"n" + lit(1)) / lit(2)).cast(LongType))
      .where($"cum" >= $"k" && ($"cum" - $"cnt") < $"k")
      .select($"event_type", $"n", $"value".as("median_lower"))
      .orderBy($"event_type")
  }

  val medianValueSql: String =
    """SELECT event_type, n, value AS median_lower
      |FROM (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |WHERE rn = (n + 1) // 2
      |ORDER BY event_type""".stripMargin

  /** Correlated scalar subquery: orders priced above their customer's own
    * average (Catalyst decorrelates into an aggregate + join —
    * RewriteCorrelatedScalarSubquery; no per-row re-execution). */
  def subqueryScalar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = orders(s, dir)
    o.createOrReplaceTempView("g_adv_orders")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM g_adv_orders a
        |WHERE o_totalprice > 2 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |  FROM g_adv_orders b WHERE b.o_custkey = a.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val subqueryScalarSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders a
      |WHERE o_totalprice > 2 * (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |  FROM orders b WHERE b.o_custkey = a.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** first_value / last_value over an explicit full-partition frame. */
  def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, dir)
      .select($"o_custkey", $"o_orderkey",
        first($"o_orderkey").over(w).as("first_order"),
        last($"o_orderkey").over(w).as("last_order"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val winFirstLastSql: String =
    """SELECT o_custkey, o_orderkey,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
      |  LAST_VALUE(o_orderkey) OVER w AS last_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** nth_value window function over an explicit full-partition frame: each
    * order annotated with its customer's 2nd-largest order price. The frame
    * must be explicit — the default RANGE..CURRENT ROW frame would make
    * nth_value a running value; unbounded-both-sides gives the per-partition
    * constant. Tie-broken by o_orderkey (rule R1) so "2nd" is engine-
    * identical under duplicate prices. */
  def winNthValue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        nth_value($"o_totalprice", 2).over(w).as("second_price"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val winNthValueSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Exact quartiles by explicit position — extends q_median to the
    * p25/p50/p75 family without percentile built-ins (whose interpolation
    * and boundary conventions differ per engine). The selected positions
    * are ceil(q·n): pure integer/IEEE arithmetic, engine-identical; the
    * emitted values are untouched input doubles.
    *
    * Same de-skewed shape as [[medianValue]]: an exact value histogram
    * (domain-bounded hash agg) + cumulative window over the histogram,
    * instead of sorting every raw row per event_type. Position rn falls in
    * bucket b iff cum(b) - cnt(b) < rn <= cum(b); values at that position
    * match the oracle's row-positional selection because the (value,
    * event_id) tiebreak never changes the value at a given rank. */
  def percentileExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = events(s, dir)
      .groupBy($"event_type", $"value")
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"event_type").orderBy($"value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy($"event_type")
    def atRank(q: Double) = {
      val k = ceil($"n" * q)
      max(when(k > $"cum" - $"cnt" && k <= $"cum", $"value"))
    }
    hist
      .withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("n", sum($"cnt").over(wKey))
      .groupBy($"event_type")
      .agg(atRank(0.25).as("p25"), atRank(0.50).as("p50"), atRank(0.75).as("p75"))
      .orderBy($"event_type")
  }

  val percentileExactSql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type,
      |  MAX(CASE WHEN rn = CEIL(n * 0.25) THEN value END) AS p25,
      |  MAX(CASE WHEN rn = CEIL(n * 0.50) THEN value END) AS p50,
      |  MAX(CASE WHEN rn = CEIL(n * 0.75) THEN value END) AS p75
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Market-basket co-occurrence: part pairs appearing together in ≥2
    * orders, top-100 — the frequent-itemset candidate-pair primitive. The
    * self-join goes through the order-as-basket inverted index, so work is
    * Σ C(items-per-order, 2) — bounded by basket size (≤7 here, small and
    * bounded in any real order table), never |parts|² — the same
    * index-bounded shape as the shingle Jaccard join. distinct() first so
    * repeat purchases of a part within one order count once. */
  def basketPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Basket-local pair generation instead of a self-join: collect_set per
    // order (one shuffle, dedups repeat purchases in the same pass), then
    // enumerate each basket's C(k,2) ordered pairs ROW-LOCALLY with two
    // Generate operators (posexplode → explode(slice)) — Slice is a
    // codegen'd expression, where the equivalent nested transform() HOFs
    // are interpreted (measured 2× slower on the 1.2M-pair expansion), and
    // the self-join form pays two extra full-table exchanges. Work is
    // Σ C(basket, 2) either way; sort_array gives the p1 < p2 orientation
    // for free. */
    val baskets = lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("ps"))
    baskets
      .select($"ps", posexplode($"ps").as(Seq("i", "p1")))
      .select($"p1", explode(expr("slice(ps, i + 2, size(ps))")).as("p2"))
      .groupBy($"p1", $"p2")
      .agg(count(lit(1)).as("n_orders"))
      .where($"n_orders" >= 2)
      .orderBy($"n_orders".desc, $"p1", $"p2")
      .limit(100)
  }

  val basketPairsSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
      |FROM items a JOIN items b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |ORDER BY n_orders DESC, p1, p2 LIMIT 100""".stripMargin

  /** Association rules (r12) — the step AFTER [[basketPairs]] finds
    * frequent pairs: score every directed rule ante→cons with confidence
    * (P(cons|ante)) and lift (P(cons|ante)/P(cons)), the market-basket
    * staple. Pair supports come from the STANDING co-purchase table
    * ([[graft.ops.Graph.copurchaseEdgeCounts]] — q_basket_pairs keeps
    * pricing discovery); this query prices rule scoring: per-item order
    * counts (one distinct+agg over the fact), a broadcast of the
    * |parts|-bounded item frame onto the pair list, exact integer
    * confidence/lift, top-50 under a total order.
    *
    * Exact integers (R2): conf_ppm = n_pair·10⁶ div n_ante, lift_x1e6 =
    * n_pair·N·10⁶ div (n_ante·n_cons) — int64 to n_pair·N ≲ 10¹²
    * (DECIMAL(38) past that). Lift > 10⁶ means the pair co-occurs more
    * than independence predicts — with only ~7-item baskets over 20k
    * parts, every surviving pair does. */
  def basketRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = lineitem(s, dir).select($"l_orderkey", $"l_partkey").distinct()
    val totals = items.agg(countDistinct($"l_orderkey").as("n_orders"))
    val itemN = items.groupBy($"l_partkey".as("p")).agg(count(lit(1)).as("n_p"))
    val e = graft.ops.Graph.copurchaseEdgeCounts(s, dir)
    val both = e.select($"pa".as("ante"), $"pb".as("cons"), $"n_ord")
      .unionByName(e.select($"pb".as("ante"), $"pa".as("cons"), $"n_ord"))
    both
      .join(broadcast(itemN.select($"p".as("ante"), $"n_p".as("n_ante"))), Seq("ante"))
      .join(broadcast(itemN.select($"p".as("cons"), $"n_p".as("n_cons"))), Seq("cons"))
      .crossJoin(broadcast(totals))
      .select($"ante", $"cons", $"n_ord".as("n_pair"),
        $"n_ante", $"n_cons", $"n_orders",
        expr("(n_ord * 1000000L) div n_ante").as("conf_ppm"),
        expr("(n_ord * n_orders * 1000000L) div (n_ante * n_cons)").as("lift_x1e6"))
      .orderBy($"lift_x1e6".desc, $"conf_ppm".desc, $"ante", $"cons")
      .limit(50)
  }

  val basketRulesSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
      |ic AS (SELECT l_partkey AS p, CAST(COUNT(*) AS BIGINT) AS n_p FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS n_ord
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |dirrules AS (
      |  SELECT pa AS ante, pb AS cons, n_ord FROM pairs
      |  UNION ALL SELECT pb AS ante, pa AS cons, n_ord FROM pairs)
      |SELECT b.ante, b.cons, b.n_ord AS n_pair, ia.n_p AS n_ante,
      |  ib.n_p AS n_cons, tot.n_orders,
      |  CAST((b.n_ord * 1000000) // ia.n_p AS BIGINT) AS conf_ppm,
      |  CAST((b.n_ord * tot.n_orders * 1000000) // (ia.n_p * ib.n_p) AS BIGINT) AS lift_x1e6
      |FROM dirrules b JOIN ic ia ON b.ante = ia.p JOIN ic ib ON b.cons = ib.p, tot
      |ORDER BY lift_x1e6 DESC, conf_ppm DESC, ante, cons LIMIT 50""".stripMargin

  /** Array aggregation: per-nation sorted list of supplier keys (sorted so
    * the array value is shuffle-order independent — determinism by
    * construction, not by engine accident). The list is serialized to a
    * '/'-joined string because the driver's comparator can't hash raw array
    * cells (pandas lexsort chokes on ndarray) — integer formatting is
    * identical across engines, so the string is hash-stable. */
  def arrayAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    supplier(s, dir)
      .groupBy($"s_nationkey")
      .agg(
        array_join(array_sort(collect_list($"s_suppkey")).cast("array<string>"), "/")
          .as("supp_keys"),
        count(lit(1)).as("n"))
      .orderBy($"s_nationkey")
  }

  val arrayAggSql: String =
    """SELECT s_nationkey,
      |  array_to_string(list_sort(list(s_suppkey)), '/') AS supp_keys,
      |  COUNT(*) AS n
      |FROM supplier
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** Ordered funnel: users whose first signup precedes their first click
    * precedes their first purchase — the sequence-pattern staple behind
    * conversion analytics (CEP followedBy chain, batch form). One hash
    * aggregate builds all three first-occurrence timestamps in a single
    * scan (min over a CASE), then a row-local ordering predicate — no
    * self-joins, so the plan is one shuffle at any scale. Times are
    * floor-epoch-seconds (rule R3). */
  def funnelOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir).groupBy($"user_id")
      .agg(
        min(when($"event_type" === "signup", epochS($"ts"))).as("t_signup"),
        min(when($"event_type" === "click", epochS($"ts"))).as("t_click"),
        min(when($"event_type" === "purchase", epochS($"ts"))).as("t_purchase"))
      .where($"t_signup" < $"t_click" && $"t_click" < $"t_purchase")
      .orderBy($"user_id")
  }

  val funnelOrderSql: String =
    """SELECT user_id,
      |  MIN(CASE WHEN event_type = 'signup'
      |    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t_signup,
      |  MIN(CASE WHEN event_type = 'click'
      |    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t_click,
      |  MIN(CASE WHEN event_type = 'purchase'
      |    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t_purchase
      |FROM events GROUP BY user_id
      |HAVING t_signup < t_click AND t_click < t_purchase
      |ORDER BY user_id""".stripMargin

  /** Cohort retention: users bucketed by first-activity week (the cohort),
    * counted as retained in each later week they appear. Two hash
    * aggregates — (user → cohort week) then (cohort, offset → distinct
    * users) — both shuffling on keys that scale with user count, never
    * with event count. Weeks are floor(epoch/604800): integer, engine-
    * identical, no calendar conventions involved. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weeks = events(s, dir)
      .select($"user_id", floor(epochS($"ts") / lit(604800.0)).cast(LongType).as("week"))
    val cohorts = weeks.groupBy($"user_id").agg(min($"week").as("cohort"))
    weeks.join(cohorts, "user_id")
      .groupBy($"cohort", ($"week" - $"cohort").as("offset_w"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort", $"offset_w")
  }

  val cohortRetentionSql: String =
    """WITH weeks AS (
      |  SELECT user_id,
      |    CAST(FLOOR(FLOOR(epoch(ts)) / 604800.0) AS BIGINT) AS week
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(week) AS cohort FROM weeks GROUP BY user_id)
      |SELECT cohort, week - cohort AS offset_w,
      |  COUNT(DISTINCT weeks.user_id) AS n_users
      |FROM weeks JOIN cohorts ON weeks.user_id = cohorts.user_id
      |GROUP BY cohort, week - cohort
      |ORDER BY cohort, offset_w""".stripMargin

  /** Changelog → SCD2 dimension build — the batch analog of Flink's
    * dynamic-table / retract-stream semantics: each user's event_type
    * stream (a changelog of their "current activity" attribute) collapses
    * into versioned validity intervals [valid_from, valid_to), the
    * type-2 slowly-changing-dimension a warehouse keeps for "what was
    * the attribute at time t" joins (which q_join_asof then answers).
    *
    * Shape: one shuffle on user_id; the run-collapse is lag→flag→running
    * count inside the per-user window, the interval close is a lead over
    * the ≤|runs| collapsed frame. Epoch-seconds arithmetic (R3) keeps
    * boundaries engine-exact; (ts, event_id) ordering is total so runs
    * are deterministic. At 100 TB: windows partition by user — millions
    * of small partitions, no global sort, no skew beyond the busiest
    * user's event count. */
  def cdcScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val runs = events(s, dir)
      .select($"user_id", $"event_id", $"event_type", epochS($"ts").as("t"))
      .withColumn("_chg",
        when(lag($"event_type", 1).over(wOrd).isNull ||
             lag($"event_type", 1).over(wOrd) =!= $"event_type", 1L).otherwise(0L))
      .withColumn("version", sum($"_chg").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"version")
      .agg(min($"event_type").as("event_type"), // constant within the run (min = any, deterministically)
        min($"t").as("valid_from"), count(lit(1)).as("n_events"))
    val wVer = Window.partitionBy($"user_id").orderBy($"version")
    runs
      .withColumn("valid_to", lead($"valid_from", 1).over(wVer))
      .withColumn("is_current", $"valid_to".isNull)
      .select($"user_id", $"version", $"event_type", $"valid_from",
        $"valid_to", $"n_events", $"is_current")
      .orderBy($"user_id", $"version")
  }

  val cdcScd2Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |                   OR lag(event_type) OVER w <> event_type
      |                 THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      |runs AS (
      |  SELECT user_id, event_type,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS version,
      |    t
      |  FROM flagged),
      |collapsed AS (
      |  SELECT user_id, CAST(version AS BIGINT) AS version,
      |    MIN(event_type) AS event_type,
      |    MIN(t) AS valid_from, COUNT(*) AS n_events
      |  FROM runs GROUP BY user_id, version)
      |SELECT user_id, version, event_type, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
      |  n_events,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
      |FROM collapsed
      |ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------- interval islands
  /** Gaps-and-islands interval merge (r11) — the batch face of session
    * windows when the input is INTERVALS rather than instants: each event
    * opens a 300 s activity interval [t, t+300), and overlapping/touching
    * intervals per user coalesce into islands. This is the classic
    * reservation-merge / uptime-stitching analytic (DuckDB blog's
    * gaps-and-islands, SQL cookbook staple) and differs from
    * q_session_window: a session closes on a GAP FROM THE LAST EVENT,
    * an island closes only when the cumulative max end-time is cleared —
    * a long interval can bridge events a session gap would split.
    *
    * Algorithm (identical in both engines): per user ordered by (t,
    * event_id), an island starts where t > max(end) over all PRECEDING
    * rows (cumulative-max window, ROWS UNBOUNDED PRECEDING..1 PRECEDING);
    * the running sum of starts numbers the islands; a hash agg collapses
    * each. Determinism: t is integer epoch seconds (R3), all comparisons
    * exact int64. Scale: one shuffle on user_id, in-partition sort shared
    * by both windows and the final agg keys prefix-match the sort — no
    * second exchange; nothing global, no driver state. */
  def intervalIslands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    events(s, dir)
      .select($"user_id", $"event_id", epochS($"ts").as("t"))
      .withColumn("prev_end", max($"t" + 300L).over(wPrev))
      .withColumn("starts",
        when($"prev_end".isNull || $"t" > $"prev_end", 1L).otherwise(0L))
      .withColumn("island",
        sum($"starts").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"island")
      .agg(min($"t").as("start_t"), max($"t" + 300L).as("end_t"),
        count(lit(1)).as("n_events"))
      .withColumn("span_s", $"end_t" - $"start_t")
      .orderBy($"user_id", $"island")
  }

  val intervalIslandsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
      |  FROM events),
      |marked AS (
      |  SELECT user_id, event_id, t,
      |    CASE WHEN MAX(t + 300) OVER (PARTITION BY user_id ORDER BY t, event_id
      |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |           OR t > MAX(t + 300) OVER (PARTITION BY user_id ORDER BY t, event_id
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS starts
      |  FROM e),
      |numbered AS (
      |  SELECT user_id, t,
      |    SUM(starts) OVER (PARTITION BY user_id ORDER BY t, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS island
      |  FROM marked)
      |SELECT user_id, CAST(island AS BIGINT) AS island,
      |  MIN(t) AS start_t, MAX(t + 300) AS end_t, COUNT(*) AS n_events,
      |  MAX(t + 300) - MIN(t) AS span_s
      |FROM numbered GROUP BY user_id, island
      |ORDER BY user_id, island""".stripMargin

  // ---------------------------------------------------------------- concurrency
  /** Open-interval concurrency census (r13) — the OVERLAP member of the
    * interval family: [[intervalIslands]] merges intervals into spans,
    * this counts how many are open AT ONCE — the server-load / concurrent-
    * sessions / license-seat question ("how many 300 s activity windows
    * overlap right now, and when is the daily peak?"). Per day: the peak
    * concurrency, the earliest minute it is reached, and the count of
    * minutes with any open interval.
    *
    * NOT a sweep line: the classic ±1-endpoint running sum orders EVERY
    * endpoint in one sequence — a raw-row window the scale rules ban.
    * Instead each interval [t, t+300) is sampled at the minute boundaries
    * it covers (m from (t+59) div 60 to (t+299) div 60 — pure int64
    * half-open arithmetic, ≤ 5 grid instants per interval), a map-side-
    * partial hash agg counts open intervals per minute, and the per-day
    * peak/argmin run as windows over the CALENDAR-bounded minute grid
    * (≤1440 rows/day), never event rows. The census is exact at minute
    * resolution — the resolution is part of the contract, the q_stats_ks
    * binning posture. Determinism: all int64; peak ties break on the
    * earliest minute (R1). Scale: explode ×5 then agg — linear, no
    * window touches unbounded rows; both windows share one day-keyed
    * sort over the ≤1440-row day frames. */
  def intervalConcurrency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = events(s, dir)
      .select(epochS($"ts").as("t"))
      .select(explode(sequence(expr("(t + 59L) div 60L"),
        expr("(t + 299L) div 60L"))).as("m"))
      .groupBy($"m").agg(count(lit(1)).as("n_open"))
    val wDay = Window.partitionBy($"day")
    val scored = grid
      .withColumn("day", expr("m div 1440L"))
      .withColumn("rn", row_number().over(
        wDay.orderBy($"n_open".desc, $"m")))
      .withColumn("active_minutes", count(lit(1)).over(wDay))
    scored.where($"rn" === 1)
      .select($"day", $"n_open".as("peak_open"), $"m".as("at_minute"),
        $"active_minutes")
      .orderBy($"day")
  }

  val intervalConcurrencySql: String =
    """WITH e AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS t FROM events),
      |g AS (
      |  SELECT UNNEST(generate_series((t + 59) // 60, (t + 299) // 60)) AS m
      |  FROM e),
      |grid AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n_open FROM g GROUP BY m),
      |scored AS (
      |  SELECT m // 1440 AS day, m, n_open,
      |    ROW_NUMBER() OVER (PARTITION BY m // 1440
      |                       ORDER BY n_open DESC, m) AS rn,
      |    COUNT(*) OVER (PARTITION BY m // 1440) AS active_minutes
      |  FROM grid)
      |SELECT day, n_open AS peak_open, m AS at_minute,
      |  CAST(active_minutes AS BIGINT) AS active_minutes
      |FROM scored WHERE rn = 1 ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- path mining
  /** Clickpath mining (r11) — the behavioral-sequence report funnel/CEP
    * queries summarize away: the full ordered prefix of each user's event
    * types as a path string ('signup>click>purchase…'), aggregated to the
    * top-25 most frequent paths. The path-frequency table is what product
    * analytics (and curriculum/trace mining over agent logs) actually
    * reads — q_funnel_order answers "did A<B<C happen", this answers
    * "WHICH orderings dominate".
    *
    * Per user the path is capped at the first 8 events (row_number ≤ 8):
    * the cap bounds the path string at any corpus scale — without it a
    * single hot user's path grows with the corpus and the path-string
    * domain explodes. Ordered aggregation is made deterministic by
    * collecting (rn, type) structs and array_sort-ing BEFORE the join —
    * collect_list's arrival order is partition-nondeterministic, the
    * sorted struct array is not (same discipline as q_array_agg).
    * Scale: shuffle 1 on user_id (window + agg share it), shuffle 2 on
    * the path string (bounded domain ≤ |types|^8), top-25 via
    * TakeOrderedAndProject — no global sort. */
  def pathMining(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    events(s, dir)
      .select($"user_id", $"event_id", $"event_type", epochS($"ts").as("t"))
      .withColumn("rn", row_number().over(wOrd))
      .where($"rn" <= 8)
      .groupBy($"user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"rn", $"event_type"))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy($"path")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"n_users".desc, $"path")
      .limit(25)
  }

  val pathMiningSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS rn
      |  FROM events),
      |paths AS (
      |  SELECT user_id,
      |    string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM e WHERE rn <= 8 GROUP BY user_id)
      |SELECT path, COUNT(*) AS n_users
      |FROM paths GROUP BY path
      |ORDER BY n_users DESC, path
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------- PIT join
  /** Point-in-time join (r11) — the "attribute AS OF the fact's time"
    * lookup the SCD2 dimension exists for: each purchase joined to the
    * user's activity-state version (the q_cdc_scd2 run table, built here
    * over NON-purchase events) valid at the purchase's timestamp:
    * valid_from ≤ t < valid_to (open-ended current version included).
    * This is the feature-store / training-data temporal-correctness
    * primitive — label rows must see dimension attributes as they were,
    * never leaked from the future — and the batch face of a Flink
    * temporal-table join (s_join_temporal's oracle-checked twin).
    *
    * Purchases before a user's first version left-join to NULL state (a
    * real pipeline's cold-start rows, kept visible rather than dropped).
    * Determinism: interval bounds are exact epoch seconds (R3); each
    * purchase matches at most ONE version (versions tile the timeline —
    * the q_cdc_scd2 invariant its spec asserts). Scale: dimension build =
    * one user_id shuffle (the cdcScd2 plan); the PIT match is a per-user
    * range join bounded by versions-per-user, followed by nothing — no
    * window over facts, no driver state. */
  def joinPit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val runs = events(s, dir)
      .where($"event_type" =!= "purchase")
      .select($"user_id", $"event_id", $"event_type", epochS($"ts").as("t"))
      .withColumn("_chg",
        when(lag($"event_type", 1).over(wOrd).isNull ||
             lag($"event_type", 1).over(wOrd) =!= $"event_type", 1L).otherwise(0L))
      .withColumn("version", sum($"_chg").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"version")
      .agg(min($"event_type").as("state"), min($"t").as("valid_from"))
    val wVer = Window.partitionBy($"user_id").orderBy($"version")
    val dim = runs
      .withColumn("valid_to", lead($"valid_from", 1).over(wVer))
      .select($"user_id".as("d_user"), $"version", $"state", $"valid_from", $"valid_to")
    val purchases = events(s, dir)
      .where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), epochS($"ts").as("p_t"))
    purchases
      .join(dim,
        $"user_id" === $"d_user" && $"p_t" >= $"valid_from" &&
          ($"valid_to".isNull || $"p_t" < $"valid_to"),
        "left")
      .select($"user_id", $"purchase_id", $"p_t", $"version", $"state",
        $"valid_from".as("state_since"))
      .orderBy($"user_id", $"purchase_id")
  }

  val joinPitSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
      |  FROM events WHERE event_type <> 'purchase'),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |                   OR lag(event_type) OVER w <> event_type
      |                 THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      |runs AS (
      |  SELECT user_id, event_type,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS version, t
      |  FROM flagged),
      |collapsed AS (
      |  SELECT user_id, CAST(version AS BIGINT) AS version,
      |    MIN(event_type) AS state, MIN(t) AS valid_from
      |  FROM runs GROUP BY user_id, version),
      |dim AS (
      |  SELECT user_id AS d_user, version, state, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
      |  FROM collapsed),
      |p AS (
      |  SELECT user_id, event_id AS purchase_id,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS p_t
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, p.purchase_id, p.p_t, dim.version, dim.state,
      |  dim.valid_from AS state_since
      |FROM p LEFT JOIN dim
      |  ON p.user_id = dim.d_user AND p.p_t >= dim.valid_from
      |  AND (dim.valid_to IS NULL OR p.p_t < dim.valid_to)
      |ORDER BY p.user_id, p.purchase_id""".stripMargin

  // ---------------------------------------------------------------- attribution
  /** Last-touch attribution (r11) — the conversion-credit report: each
    * purchase credits the user's LATEST non-purchase event within the
    * preceding 7 days (the marketing "channel" proxy: which activity
    * last preceded the conversion), aggregated to credits per channel
    * with integer ppm shares. Purchases with no touch in the lookback
    * credit the 'direct' bucket — conversions are conserved (spec
    * asserts Σ credits = |purchases|).
    *
    * Determinism: the latest-touch pick is a row_number over (t desc,
    * event_id desc) — total order; shares are exact int64 `div` (R2).
    * Scale: the touch match is the q_join_asof backward shape (per-user
    * range join bounded by events-per-user, keep-latest window on the
    * purchase key); the report agg is ≤|event types|+1 groups. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), epochS($"ts").as("p_t"))
    val touches = e.where($"event_type" =!= "purchase")
      .select($"user_id".as("t_user"), $"event_id".as("touch_id"),
        $"event_type".as("channel"), epochS($"ts").as("t_t"))
    val w = Window.partitionBy($"purchase_id").orderBy($"t_t".desc, $"touch_id".desc)
    val credited = purchases
      .join(touches,
        $"user_id" === $"t_user" && $"t_t" <= $"p_t" && $"t_t" > $"p_t" - 604800L,
        "left")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"purchase_id", coalesce($"channel", lit("direct")).as("channel"))
    // the total is a sum window over the PER-CHANNEL frame (≤|types|+1
    // rows) — a separate count agg cross-joined back would re-run the
    // whole touch join for the second consumer (no ReusedExchange across
    // differently-pruned subtrees; same lesson as q_search_bm25's df).
    credited.groupBy($"channel").agg(count(lit(1)).as("credits"))
      .withColumn("total", sum($"credits").over(Window.partitionBy()))
      .select($"channel", $"credits",
        expr("(credits * 1000000L) div total").as("share_ppm"))
      .orderBy($"channel")
  }

  val attributionSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS p_t
      |  FROM events WHERE event_type = 'purchase'),
      |tch AS (
      |  SELECT user_id AS t_user, event_id AS touch_id,
      |    event_type AS channel, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t_t
      |  FROM events WHERE event_type <> 'purchase'),
      |credited AS (
      |  SELECT purchase_id, COALESCE(channel, 'direct') AS channel
      |  FROM (
      |    SELECT p.purchase_id, tch.channel,
      |      ROW_NUMBER() OVER (PARTITION BY p.purchase_id
      |                         ORDER BY tch.t_t DESC, tch.touch_id DESC) AS rn
      |    FROM p LEFT JOIN tch
      |      ON p.user_id = tch.t_user AND tch.t_t <= p.p_t
      |      AND tch.t_t > p.p_t - 604800)
      |  WHERE rn = 1),
      |per AS (
      |  SELECT channel, CAST(COUNT(*) AS BIGINT) AS credits
      |  FROM credited GROUP BY channel)
      |SELECT channel, credits,
      |  (credits * 1000000) // CAST(SUM(credits) OVER () AS BIGINT) AS share_ppm
      |FROM per
      |ORDER BY channel""".stripMargin

  // ---------------------------------------------------------------- RFM
  /** RFM segmentation (r11) — the marketing-analytics staple: every
    * customer scored 1–5 on Recency (latest order day), Frequency (order
    * count), and Monetary (lifetime cents), 5 = best, segment code
    * r·100 + f·10 + m. The "which customers are champions vs churned"
    * census a CRM runs over the whole order history.
    *
    * Scale — NO global NTILE (a 10⁹-customer single-partition window is
    * the q_curriculum_order cliff): quintile THRESHOLDS come from value
    * histograms whose domains are RANGE-bounded, not customer-bounded —
    * recency days (date span), frequency (orders/customer), monetary in
    * 10-dollar buckets (price span; the q_stats_ks bound-is-the-value-
    * range posture). t_k = min value with 5·cum ≥ n·k (exact integer
    * cross-multiply, no ceil floats); scoring is then ROW-LOCAL against
    * the 12 collected threshold longs (bounded driver state, the
    * embed_outlier/PCA contract) — one orders scan + three bounded
    * histogram aggs, the customer frame never re-shuffles.
    *
    * Ties share a bucket (threshold semantics, not NTILE's positional
    * split) — deterministic and engine-identical, unlike NTILE whose
    * big-tiles-first assignment the oracle would have to replay rank by
    * rank. */
  def rfmSegment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.tables.Layout.materialize(
      orders(s, dir)
        .select($"o_custkey", epochS($"o_orderdate").as("ts"),
          round($"o_totalprice" * 100.0).cast(LongType).as("cents"))
        .select($"o_custkey", expr("ts div 86400L").as("day"), $"cents")
        .groupBy($"o_custkey")
        .agg(max($"day").as("r_day"), count(lit(1)).as("f_orders"),
          sum($"cents").as("m_cents"))
        .withColumn("m_bucket", expr("m_cents div 1000L")))
    // All THREE metrics' quintile thresholds in ONE job (r16): the three
    // per-metric histogram jobs each re-scanned the pinned frame and paid
    // a full job round-trip (3 actions ≈ the visible share of this query
    // at bench SF). Exploding (metric, value) rows first makes it one
    // histogram agg + one PARTITIONED cumulative window (also removing
    // the three single-partition global windows) + one collect. Per
    // metric the arithmetic is unchanged: 5·cum ≥ n·k is monotone in the
    // value, so min over qualifying rows is t_k.
    val wCum = Window.partitionBy($"met").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist3 = m.select(explode(array(
        struct(lit("r").as("met"), $"r_day".as("v")),
        struct(lit("f").as("met"), $"f_orders".as("v")),
        struct(lit("m").as("met"), $"m_bucket".as("v")))).as("x"))
      .select($"x.met".as("met"), $"x.v".as("v"))
      .groupBy($"met", $"v").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"met")))
    val thAggs = (1 to 4).map(k =>
      min(when($"cum" * 5 >= $"n" * lit(k.toLong), $"v")).as(s"t$k"))
    val thByMet = hist3.groupBy($"met").agg(thAggs.head, thAggs.tail: _*)
      .collect().map(r => r.getString(0) -> (1 to 4).map(i => r.getLong(i))).toMap
    val (rt, ft, mt) = (thByMet("r"), thByMet("f"), thByMet("m"))
    def score(c: org.apache.spark.sql.Column,
        ts: Seq[Long]): org.apache.spark.sql.Column =
      ts.map(t => when(c > t, 1).otherwise(0)).reduce(_ + _) + lit(1)
    m.select($"o_custkey",
        score($"r_day", rt).as("r_score"),
        score($"f_orders", ft).as("f_score"),
        score($"m_bucket", mt).as("m_score"))
      .withColumn("rfm", $"r_score" * 100 + $"f_score" * 10 + $"m_score")
      .orderBy($"o_custkey")
  }

  val rfmSegmentSql: String = {
    def hist(metric: String) =
      s"""SELECT $metric AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(COUNT(*)) OVER (ORDER BY $metric
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
         |  FROM m GROUP BY $metric""".stripMargin
    def th(h: String) =
      s"""SELECT k, MIN(v) AS t FROM $h, (VALUES (1),(2),(3),(4)) ks(k)
         |  WHERE cum * 5 >= n * k GROUP BY k""".stripMargin
    s"""WITH m AS (
       |  SELECT o_custkey,
       |    MAX(CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400) AS r_day,
       |    CAST(COUNT(*) AS BIGINT) AS f_orders,
       |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // 1000 AS m_bucket
       |  FROM orders GROUP BY o_custkey),
       |rh AS (${hist("r_day")}),
       |fh AS (${hist("f_orders")}),
       |mh AS (${hist("m_bucket")}),
       |rt AS (${th("rh")}),
       |ft AS (${th("fh")}),
       |mt AS (${th("mh")}),
       |sc AS (
       |  SELECT o_custkey,
       |    1 + (SELECT COUNT(*) FROM rt WHERE m.r_day    > rt.t) AS r_score,
       |    1 + (SELECT COUNT(*) FROM ft WHERE m.f_orders > ft.t) AS f_score,
       |    1 + (SELECT COUNT(*) FROM mt WHERE m.m_bucket > mt.t) AS m_score
       |  FROM m)
       |SELECT o_custkey, CAST(r_score AS INT) AS r_score,
       |  CAST(f_score AS INT) AS f_score, CAST(m_score AS INT) AS m_score,
       |  CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm
       |FROM sc ORDER BY o_custkey""".stripMargin
  }

  // ---------------------------------------------------------------- nearest asof
  /** Nearest-event join with tolerance (r13) — the BIDIRECTIONAL member
    * of the temporal-join family: [[joinAsof]] takes the latest earlier
    * row, [[joinPit]] the valid interval; this takes the CLOSEST row in
    * either direction within ±1 h (pandas `merge_asof(direction=
    * 'nearest', tolerance=...)`) — sensor alignment, price-mark matching,
    * "which click belongs to this purchase" when causality can run
    * either way. Each purchase matches its nearest same-user click by
    * |Δt|; ties break to the EARLIER click then event_id (R1); purchases
    * with no click inside the tolerance drop (inner semantics,
    * documented — the left variant adds one outer join).
    *
    * Scale: the candidate join is user-keyed with a ±3600 s band, so
    * work is per-user purchases × in-band clicks, never a cross of the
    * event table; the rn=1 cut is a CONSTANT rank over (purchase_id), so
    * WindowGroupLimit prunes map-side below the exchange (the joinAsof
    * plan). Exact epoch-second arithmetic throughout (R3). */
  def joinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), epochS($"ts").as("p_t"))
    val clicks = e.where($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        epochS($"ts").as("c_t"))
    val adist = abs($"p_t" - $"c_t")
    val w = Window.partitionBy($"purchase_id")
      .orderBy(adist.asc, $"c_t".asc, $"click_id".asc)
    purchases
      .join(clicks, $"user_id" === $"c_user" && adist <= 3600L)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"purchase_id", $"p_t", $"click_id", $"c_t",
        ($"p_t" - $"c_t").as("dt_s"))
      .orderBy($"user_id", $"purchase_id")
  }

  val joinAsofNearestSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS p_t
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id AS c_user, event_id AS click_id,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS c_t
      |  FROM events WHERE event_type = 'click')
      |SELECT user_id, purchase_id, p_t, click_id, c_t, p_t - c_t AS dt_s
      |FROM (
      |  SELECT p.user_id, p.purchase_id, p.p_t, c.click_id, c.c_t,
      |    ROW_NUMBER() OVER (PARTITION BY p.purchase_id
      |      ORDER BY ABS(p.p_t - c.c_t), c.c_t, c.click_id) AS rn
      |  FROM p JOIN c ON p.user_id = c.c_user AND ABS(p.p_t - c.c_t) <= 3600)
      |WHERE rn = 1 ORDER BY user_id, purchase_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_asof_nearest" -> (joinAsofNearest _),
    "q_rfm_segment"     -> (rfmSegment _),
    "q_cdc_scd2"        -> (cdcScd2 _),
    "q_funnel_order"    -> (funnelOrder _),
    "q_cohort_retention" -> (cohortRetention _),
    "q_win_nth_value"   -> (winNthValue _),
    "q_percentile_exact" -> (percentileExact _),
    "q_basket_pairs"    -> (basketPairs _),
    "q_basket_rules"    -> (basketRules _),
    "q_join_asof"       -> (joinAsof _),
    "q_pivot"           -> (pivotTypes _),
    "q_stats_moments"   -> (statsMoments _),
    "q_median"          -> (medianValue _),
    "q_subquery_scalar" -> (subqueryScalar _),
    "q_win_first_last"  -> (winFirstLast _),
    "q_array_agg"       -> (arrayAgg _),
    "q_interval_islands" -> (intervalIslands _),
    "q_interval_concurrency" -> (intervalConcurrency _),
    "q_path_mining"     -> (pathMining _),
    "q_join_pit"        -> (joinPit _),
    "q_attribution"     -> (attribution _))

  def oracle: Map[String, String] = Map(
    "q_join_asof_nearest" -> joinAsofNearestSql,
    "q_cdc_scd2"        -> cdcScd2Sql,
    "q_funnel_order"    -> funnelOrderSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_win_nth_value"   -> winNthValueSql,
    "q_percentile_exact" -> percentileExactSql,
    "q_basket_pairs"    -> basketPairsSql,
    "q_basket_rules"    -> basketRulesSql,
    "q_rfm_segment"     -> rfmSegmentSql,
    "q_join_asof"       -> joinAsofSql,
    "q_pivot"           -> pivotTypesSql,
    "q_stats_moments"   -> statsMomentsSql,
    "q_median"          -> medianValueSql,
    "q_subquery_scalar" -> subqueryScalarSql,
    "q_win_first_last"  -> winFirstLastSql,
    "q_array_agg"       -> arrayAggSql,
    "q_interval_islands" -> intervalIslandsSql,
    "q_interval_concurrency" -> intervalConcurrencySql,
    "q_path_mining"     -> pathMiningSql,
    "q_join_pit"        -> joinPitSql,
    "q_attribution"     -> attributionSql)
}
