package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
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

  /** Distinct count per group — the PV/UV classic. Catalyst expands the
    * distinct into a two-phase aggregate (Expand + partial/final). */
  def aggDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir).groupBy($"event_type")
      .agg(countDistinct($"user_id").as("uv"), count(lit(1)).as("pv"))
      .orderBy($"event_type")
  }

  val aggDistinctSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS uv, COUNT(*) AS pv
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Several distincts + a plain agg in one pass. */
  def aggMultiDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir).groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("uv"),
        countDistinct(epochDay($"ts")).as("active_days"),
        sum(dec2($"value")).cast("double").as("sum_value"))
      .orderBy($"event_type")
  }

  val aggMultiDistinctSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS uv,
      |  COUNT(DISTINCT CAST(FLOOR(epoch(ts)/86400) AS BIGINT)) AS active_days,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Hierarchical subtotals region → nation (ROLLUP). */
  def aggRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    region(s, dir).join(nation(s, dir), $"r_regionkey" === $"n_regionkey")
      .join(customer(s, dir), $"n_nationkey" === $"c_nationkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_cust"), sumMoney($"c_acctbal").as("sum_bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  val aggRollupSql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM region
      |JOIN nation ON r_regionkey = n_regionkey
      |JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** CUBE over event_type × epoch-weekday (epoch-day mod 7 avoids the
    * Spark/DuckDB dayofweek-origin mismatch, R3). */
  def aggCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .withColumn("wd", pmod(epochDay($"ts"), lit(7)).cast("long"))
      .cube($"event_type", $"wd")
      .agg(count(lit(1)).as("n"), sum(dec2($"value")).cast("double").as("sum_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("wd"))
  }

  val aggCubeSql: String =
    """SELECT event_type, wd, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM (SELECT event_type, CAST(FLOOR(epoch(ts)/86400) AS BIGINT) % 7 AS wd, value FROM events)
      |GROUP BY CUBE (event_type, wd)
      |ORDER BY event_type NULLS FIRST, wd NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS + grouping() markers. */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    nation(s, dir).join(customer(s, dir), $"n_nationkey" === $"c_nationkey")
      .groupingSets(
        Seq(Seq($"n_name"), Seq($"c_mktsegment"), Seq()),
        $"n_name", $"c_mktsegment")
      .agg(
        grouping($"n_name").cast("int").as("g_nation"),
        grouping($"c_mktsegment").cast("int").as("g_segment"),
        count(lit(1)).as("n_cust"),
        sumMoney($"c_acctbal").as("sum_bal"))
      .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
  }

  val aggGroupingSetsSql: String =
    """SELECT n_name, c_mktsegment,
      |  CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
      |  CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_segment,
      |  COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM nation JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
      |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin

  /** Post-aggregation filter (HAVING). */
  def aggHaving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir).groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), sumMoney($"o_totalprice").as("sum_price"))
      .where($"n_orders" >= 10)
      .orderBy($"o_custkey")
  }

  val aggHavingSql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY o_custkey
      |HAVING COUNT(*) >= 10
      |ORDER BY o_custkey""".stripMargin

  /** HLL approximate distinct — no oracle (sketches differ across engines);
    * the exact count rides along so the rows-only dump is self-describing
    * and the unit test can assert the ±5% envelope. */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir).groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("approx_uv"),
        countDistinct($"user_id").as("exact_uv"))
      .orderBy($"event_type")
  }

  /** First-class mergeable HLL distinct sketch (see
    * graft.functions.HllDistinct) — the persistable twin of
    * [[aggApproxDistinct]]'s engine-internal HLL++: per event type, the
    * sketch estimate of distinct users next to the exact count (so the
    * rows-only dump is self-describing and the spec can assert the 3σ
    * envelope). Register-max merge is associative/commutative/idempotent,
    * so the estimate is a pure function of the input SET — deterministic
    * across runs, merge trees, and layouts; `oracle: no` only because no
    * cross-engine SQL reproduces the register/estimator formula. */
  def aggDistinctSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hll = udaf(new graft.functions.HllDistinct(10))
    events(s, dir).groupBy($"event_type")
      .agg(hll($"user_id").as("sketch_uv"),
        countDistinct($"user_id").as("exact_uv"))
      .orderBy($"event_type")
  }

  /** Incremental aggregate maintenance (r11) — the materialized-view
    * delta-merge primitive, the AGGREGATION sibling of
    * q_dedup_incremental's index maintenance: a standing per-user spend
    * table (base = event_id below the ⌊max·4/5⌋ cut — ids are ingest
    * order, so the top 20% model "today's batch") absorbs the delta
    * WITHOUT re-aggregating history. Emits the refreshed rows for
    * exactly the users the delta touched — the upsert set a daily ledger
    * writes back.
    *
    * Why its own shape: count/sum/max are MERGEABLE aggregates, so
    * standing ⊕ delta is row-local per affected group. Work = one
    * delta-sized aggregation + one join against the (materialized-once;
    * in production: persisted, bucketed by user) standing table —
    * history is touched zero times per refresh. Cold-start users (in
    * delta, absent from base) coalesce from zero. The cut is a one-row
    * broadcast (the dedupIncremental pattern); all money math is exact
    * cents (R2), timestamps epoch seconds (R3). The oracle recomputes
    * the same rows from scratch restricted to delta-touched users —
    * maintenance must be indistinguishable from recomputation. */
  def aggIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r17: the standing per-user spend ledger is now a REAL standing table
    // (Layout.standing — the dedupClusterIncremental precedent), built once
    // per (dir, cut) and READ thereafter, so the query prices what its
    // scaladoc claims: "history is touched zero times per refresh". The
    // old shape re-aggregated the base side into a localCheckpoint on
    // every execution — the exact daily re-derivation this operator
    // exists to avoid. The cut is a driver scalar (it keys the standing
    // name — pipeline metadata in production), memoized per dir via
    // scalarOnce like the other incremental cuts. Results are
    // row-identical either way (deterministic build; same oracle).
    val cutV = graft.tables.Layout.scalarOnce(s"agginc_cut#$dir") {
      Option(events(s, dir).agg(expr("max(event_id) * 4 div 5")).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    }
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir#$cutV".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    def evs = events(s, dir)
      .select($"user_id", $"event_id",
        round($"value" * 100.0).cast(LongType).as("cents"),
        unix_timestamp($"ts").as("t"))
    val standing = graft.tables.Layout.standing(s, s"agginc_$key",
      evs.where($"event_id" < cutV)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_b"), sum($"cents").as("s_b"), max($"t").as("t_b")))
    evs.where($"event_id" >= cutV)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_d"), sum($"cents").as("s_d"), max($"t").as("t_d"))
      .join(standing, Seq("user_id"), "left")
      .select($"user_id",
        ($"n_d" + coalesce($"n_b", lit(0L))).as("n_events"),
        ($"s_d" + coalesce($"s_b", lit(0L))).as("sum_cents"),
        greatest($"t_d", coalesce($"t_b", lit(Long.MinValue))).as("last_t"))
      .orderBy($"user_id")
  }

  val aggIncrementalSql: String =
    """WITH cut AS (SELECT MAX(event_id) * 4 // 5 AS c FROM events),
      |touched AS (
      |  SELECT DISTINCT user_id FROM events
      |  WHERE event_id >= (SELECT c FROM cut))
      |SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(MAX(CAST(FLOOR(epoch(e.ts)) AS BIGINT)) AS BIGINT) AS last_t
      |FROM events e JOIN touched USING (user_id)
      |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin

  /** Audience-overlap via KMV/theta sketches (r11) — the SET-ALGEBRA
    * question the HLL family cannot answer: estimated |users(A) ∩
    * users(B)| for every event-type pair. HLL registers carry no sample,
    * so they union but never intersect; a KMV sketch IS a bottom-k
    * uniform sample of the hashed set ([[graft.functions.Kmv]]), so
    * intersections (audience overlap, segment Jaccard — the "how many
    * buyers also browsed" ledger question) estimate directly.
    *
    * ONE corpus pass builds a ≤4 KB sketch per type; every estimator
    * below runs on the 5-row sketch frame with BUILT-IN array functions
    * (array_intersect/filter/size over the sorted hash arrays — no UDF,
    * no driver math): θ_pair = min of the two PER-SIDE thetas, where a
    * partial/exact sketch's theta is 2⁶³ — so one full side still
    * scales by 2⁶³/θ_full (a partial∩full pair retains only hashes
    * below the full side's threshold), and only when BOTH sides are
    * partial does the factor collapse to 1 and the estimate become the
    * exact shared count — exactly [[graft.functions.Kmv.intersect]];
    * est = |A∩B below θ| · 2⁶³/θ.
    * Exact twin columns make the rows-only dump self-describing; the
    * spec asserts the (k=512, ~4.4% RSE) envelope and exact-mode
    * equality. Deterministic: merge is associative/commutative/
    * idempotent, arrays are sorted — a pure function of the input set. */
  def aggOverlapSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 512
    val kmv = udaf(new graft.functions.KmvSketch(k))
    val sketches = graft.tables.Layout.materialize(
      events(s, dir).groupBy($"event_type")
        .agg(kmv($"user_id").as("kmv"), countDistinct($"user_id").as("exact_uv")))
    val p263 = lit(math.pow(2.0, 63))
    val est = (arr: Column) => when(size(arr) < k, size(arr).cast(LongType))
      .otherwise(round((lit(k - 1).cast("double") * p263) /
        element_at(arr, k).cast("double")).cast(LongType))
    val a = sketches.select($"event_type".as("type_a"), $"kmv".as("kmv_a"),
      $"exact_uv".as("exact_a"))
    val b = sketches.select($"event_type".as("type_b"), $"kmv".as("kmv_b"),
      $"exact_uv".as("exact_b"))
    val exactPairs = {
      val u = events(s, dir).select($"event_type", $"user_id").distinct()
      val ua = u.select($"event_type".as("type_a"), $"user_id")
      val ub = u.select($"event_type".as("type_b"), $"user_id")
      ua.join(ub, Seq("user_id")).where($"type_a" < $"type_b")
        .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("exact_overlap"))
    }
    a.join(b, $"type_a" < $"type_b")
      .withColumn("theta_a",
        when(size($"kmv_a") < k, lit(Long.MaxValue)).otherwise(element_at($"kmv_a", k)))
      .withColumn("theta_b",
        when(size($"kmv_b") < k, lit(Long.MaxValue)).otherwise(element_at($"kmv_b", k)))
      .withColumn("theta_l", least($"theta_a", $"theta_b"))
      .withColumn("theta_d",
        when($"theta_l" === Long.MaxValue, p263).otherwise($"theta_l".cast("double")))
      .withColumn("n_shared",
        size(filter(array_intersect($"kmv_a", $"kmv_b"), x => x < $"theta_l")))
      .select($"type_a", $"type_b",
        est($"kmv_a").as("est_a"), est($"kmv_b").as("est_b"),
        round($"n_shared".cast("double") * p263 / $"theta_d").cast(LongType)
          .as("est_overlap"),
        $"exact_a", $"exact_b")
      .join(exactPairs, Seq("type_a", "type_b"), "left")
      .withColumn("exact_overlap", coalesce($"exact_overlap", lit(0L)))
      .orderBy($"type_a", $"type_b")
  }

  /** Sketch-merge rollup — the query-level PROOF of the HLL family's
    * mergeability (the reason a first-class sketch exists next to
    * `approx_count_distinct` at all): ONE corpus pass builds a 1 KB
    * register array per event type ([[graft.functions.HllRegisters]]),
    * and the global distinct-user estimate is produced by register-max
    * MERGING those five buffers ([[graft.functions.HllMerge]]) — the
    * corpus is never re-read for the total. At 100 TB this is the
    * daily-ledger pattern: persist one buffer per (day, shard), answer
    * any union (week, event-type family, whole corpus) sketch-side.
    * The leaf frame is [[graft.tables.Layout.materialize]]d because two
    * consumers (per-type rows, global merge) would otherwise each
    * recompute the corpus aggregation.
    *
    * The `exact_uv` twin column (self-description + the spec's envelope
    * anchor) necessarily re-touches the corpus — exact global distinct
    * is NOT derivable from per-group exact counts (users overlap types);
    * that one-pass rollup(grouping-sets) countDistinct is the cost the
    * sketch path avoids. `oracle: no` (estimator formula is
    * engine-specific); HllSketchSpec asserts the 3σ envelope per scope
    * AND that the merged global estimate is bitwise equal to a direct
    * single-sketch pass over all users (register merge loses nothing). */
  def aggDistinctSketchRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hllRegs  = udaf(new graft.functions.HllRegisters(10))
    val hllMerge = udaf(new graft.functions.HllMerge(10))
    val leaves = graft.tables.Layout.materialize(
      events(s, dir).groupBy($"event_type").agg(hllRegs($"user_id").as("regs")))
    val perType = leaves.groupBy($"event_type").agg(hllMerge($"regs").as("sketch_uv"))
      .select($"event_type".as("scope"), $"sketch_uv")
    val global = leaves.agg(hllMerge($"regs").as("sketch_uv"))
      .select(lit("<all>").as("scope"), $"sketch_uv")
    val exact = events(s, dir).rollup($"event_type")
      .agg(countDistinct($"user_id").as("exact_uv"),
        grouping($"event_type").as("_g"))
      .select(when($"_g" === 1, lit("<all>")).otherwise($"event_type").as("scope"),
        $"exact_uv")
    perType.unionByName(global).join(exact, "scope").orderBy($"scope")
  }

  /** Membership-ledger sketch (r9) — the Bloom member of the sketch
    * family at the query level, completing the quartet (KLL quantiles, MG
    * heavy hitters, HLL distinct, Bloom membership): ONE corpus pass
    * builds a persistable m-bit array per event type
    * ([[graft.functions.BloomBits]]); the global ledger is the bitwise OR
    * of the per-type arrays ([[graft.functions.BloomUnion]]) — sketch-
    * sized merge input, the corpus never re-read. Where HLL answers "how
    * many distinct", Bloom answers "is this key one of them" — the
    * primitive a dedup/decontamination gate probes (Layout.bloomPrefilter
    * serves exactly these bits row-locally). Per scope: fill level,
    * Swamidass-Baldi cardinality estimate, exact-distinct twin column
    * (self-describing rows, the envelope anchor — same pattern as
    * q_distinct_sketch_rollup). OR-merge is idempotent, so every output
    * bit (and both stats) is a pure function of the input set —
    * deterministic rows-only. */
  def aggMembershipSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (mBits, k) = graft.functions.Bloom.params(expectedItems = 2048, fpp = 0.01)
    val bits  = udaf(new graft.functions.BloomBits(mBits / 64, k))
    val union = udaf(new graft.functions.BloomUnion(mBits / 64))
    val leaves = graft.tables.Layout.materialize(
      events(s, dir).groupBy($"event_type").agg(bits($"user_id").as("bf")))
    val stats = (c: Column) => graft.functions.BloomFunctions.bloom_stats(c, k)
    val perType = leaves
      .select($"event_type".as("scope"), stats($"bf").as("st"))
    val global = leaves.agg(union($"bf").as("bf"))
      .select(lit("<all>").as("scope"), stats($"bf").as("st"))
    val exact = events(s, dir).rollup($"event_type")
      .agg(countDistinct($"user_id").as("exact_uv"),
        grouping($"event_type").as("_g"))
      .select(when($"_g" === 1, lit("<all>")).otherwise($"event_type").as("scope"),
        $"exact_uv")
    perType.unionByName(global)
      .select($"scope", $"st.bits_set".as("bits_set"), $"st.est_uv".as("est_uv"))
      .join(exact, "scope").orderBy($"scope")
  }

  /** Conditional (filtered) aggregation — several predicates folded in one
    * pass over the fact table (Flink SQL FILTER / Table API agg with CASE).
    * One scan + one hash-aggregate regardless of predicate count: the
    * alternative of N filtered subqueries would scan N times at 100 TB.
    * Money sums go through DECIMAL per rule R2; an all-null group (user
    * with no purchases) yields NULL in both engines. */
  def aggFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir).groupBy($"user_id")
      .agg(
        count(when($"event_type" === "error", 1)).as("n_err"),
        count(when($"event_type" === "purchase", 1)).as("n_buy"),
        sum(when($"event_type" === "purchase", dec2($"value")))
          .cast("double").as("buy_value"))
      .orderBy($"user_id")
  }

  val aggFilterSql: String =
    """SELECT user_id,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_buy,
      |  CAST(SUM(CASE WHEN event_type = 'purchase'
      |    THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS buy_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Boolean aggregates (Flink SQL EVERY/SOME): per event type, whether all
    * values are positive and whether any exceeds 900 — plus the count so
    * the result carries its evidence base. bool_and/bool_or are exact
    * (order-free) reductions in both engines. */
  def aggBool(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir).groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        bool_and($"value" > 0).as("all_positive"),
        bool_or($"value" > 900).as("any_large"))
      .orderBy($"event_type")
  }

  val aggBoolSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  BOOL_AND(value > 0) AS all_positive,
      |  BOOL_OR(value > 900) AS any_large
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Fixed-width histogram: value distribution per event type in width-50
    * buckets — the profiling aggregate behind data-quality dashboards.
    * Bucket = floor(value/50): IEEE division+floor on the same parquet
    * double is bit-deterministic in both engines; counts are exact. One
    * hash-aggregate pair, bucket cardinality is bounded by range/width
    * regardless of row count. */
  def aggHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"event_type",
        floor($"value" / lit(50.0)).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type", $"bucket")
  }

  val aggHistogramSql: String =
    """SELECT event_type, CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type, FLOOR(value / 50.0)
      |ORDER BY event_type, bucket""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_histogram"       -> (aggHistogram _),
    "q_agg_bool"            -> (aggBool _),
    "q_agg_filter"          -> (aggFilter _),
    "q_agg_group"           -> (aggGroup _),
    "q_agg_global"          -> (aggGlobal _),
    "q_agg_distinct"        -> (aggDistinct _),
    "q_agg_multi_distinct"  -> (aggMultiDistinct _),
    "q_agg_rollup"          -> (aggRollup _),
    "q_agg_cube"            -> (aggCube _),
    "q_agg_grouping_sets"   -> (aggGroupingSets _),
    "q_agg_having"          -> (aggHaving _),
    "q_agg_approx_distinct" -> (aggApproxDistinct _),
    "q_distinct_sketch"     -> (aggDistinctSketch _),
    "q_overlap_sketch"      -> (aggOverlapSketch _),
    "q_agg_incremental"     -> (aggIncremental _),
    "q_distinct_sketch_rollup" -> (aggDistinctSketchRollup _),
    "q_membership_sketch" -> (aggMembershipSketch _))

  def oracle: Map[String, String] = Map(
    "q_agg_histogram"      -> aggHistogramSql,
    "q_agg_incremental"    -> aggIncrementalSql,
    "q_agg_bool"           -> aggBoolSql,
    "q_agg_filter"         -> aggFilterSql,
    "q_agg_group"          -> aggGroupSql,
    "q_agg_global"         -> aggGlobalSql,
    "q_agg_distinct"       -> aggDistinctSql,
    "q_agg_multi_distinct" -> aggMultiDistinctSql,
    "q_agg_rollup"         -> aggRollupSql,
    "q_agg_cube"           -> aggCubeSql,
    "q_agg_grouping_sets"  -> aggGroupingSetsSql,
    "q_agg_having"         -> aggHavingSql)
}
