package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.tables.Tables._
import Util._

/** SURVEY.md §2.8 — event-time windowing, batch-equivalent form.
  *
  * The Dataflow equivalence: a windowed aggregation over a replayed finite
  * stream equals a batch group-by over window buckets, so each operator is
  * oracle-checked here in batch form and exercised as a real Structured
  * Streaming query in the streaming test suites (graft.streaming).
  *
  * All bucketing is epoch-second arithmetic (rule R3): the parquet source is
  * ns-precision, Spark holds µs, DuckDB holds ns — ≥1s buckets make every
  * engine agree. Spark's own `window()`/`session_window()` operators are used
  * (not hand-rolled buckets) so the physical plan is the same one a streaming
  * query gets.
  */
object TimeWindows {

  /** Tumbling 1-hour event-time window: events per (hour, type). */
  def tumbleWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(dec2($"value")).cast("double").as("sum_value"))
      .select(unix_timestamp($"window.start").as("win_start"), $"event_type",
        $"n", $"sum_value")
      .orderBy($"win_start", $"event_type")
  }

  val tumbleWindowSql: String =
    """SELECT CAST(FLOOR(epoch(ts)/3600) AS BIGINT) * 3600 AS win_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin

  /** Sliding (hopping) window, 1h size / 30m slide — every event lands in
    * exactly two windows. The oracle enumerates that assignment explicitly
    * as a UNION ALL of the two shifted 30-minute buckets. */
  def hopWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(dec2($"value")).cast("double").as("sum_value"))
      .select(unix_timestamp($"window.start").as("win_start"), $"event_type",
        $"n", $"sum_value")
      .orderBy($"win_start", $"event_type")
  }

  val hopWindowSql: String =
    """SELECT win_start, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT CAST(FLOOR(epoch(ts)/1800) AS BIGINT) * 1800 AS win_start, event_type, value FROM events
      |  UNION ALL
      |  SELECT (CAST(FLOOR(epoch(ts)/1800) AS BIGINT) - 1) * 1800 AS win_start, event_type, value FROM events)
      |GROUP BY win_start, event_type
      |ORDER BY win_start, event_type""".stripMargin

  /** Cumulative (expanding) windows — Flink's CUMULATE window TVF: within
    * each day, every hour step emits the running aggregate of the day SO
    * FAR ([day 00:00, hour+1)), the early-firing daily-total pattern a
    * dashboard reads ("today's count, updated hourly"). Spark has no
    * CUMULATE primitive; the scalable composition is hour-bucket hash agg
    * FIRST (map-side partials over raw events), then a running-sum window
    * over the ≤24 bucket rows per day — the window never sees raw events,
    * so the sort behind it is over day×24 rows, not the corpus. Steps
    * with no events emit no row (sparse form; the dense form is a
    * gap-fill join, q_gap_fill_daily's shape). Money math in DECIMAL
    * (R2), buckets by epoch arithmetic (R3). Bucketing uses Spark `pmod`
    * vs the oracle's `%`/`//`: these agree only for ts ≥ epoch (pmod(-100,
    * 86400)=86300 but DuckDB -100%86400=-100), so the R3 equivalence here
    * assumes post-1970 timestamps — true of the events table and of any
    * sane event-time corpus; pre-epoch data would need a floor-division
    * formulation on both sides. */
  def cumulateWindow(s: SparkSession, dir: String): DataFrame =
    cumulateOf(s, events(s, dir))

  /** The CUMULATE computation over an arbitrary bounded events frame —
    * shared seam with the streaming twin (StreamOps.cumulateCounts),
    * whose final frame must fold to exactly this result
    * (equivalence asserted in StreamingSpec's s_cumulate_window test). */
  def cumulateOf(s: SparkSession, ev: DataFrame): DataFrame = {
    import s.implicits._
    val hourly = ev
      .select((epochS($"ts") - pmod(epochS($"ts"), lit(86400L))).as("day_start"),
        floor(pmod(epochS($"ts"), lit(86400L)) / 3600L).cast(LongType).as("hr"),
        $"value")
      .groupBy($"day_start", $"hr")
      .agg(count(lit(1)).as("n"), sum(dec2($"value")).as("sv"))
    val w = Window.partitionBy($"day_start").orderBy($"hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .select($"day_start", ($"day_start" + ($"hr" + 1L) * 3600L).as("win_end"),
        sum($"n").over(w).as("n_cum"),
        sum($"sv").over(w).cast("double").as("sum_value_cum"))
      .orderBy($"day_start", $"win_end")
  }

  val cumulateWindowSql: String =
    """WITH e AS (
      |  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, value FROM events),
      |hourly AS (
      |  SELECT sec - (sec % 86400) AS day_start,
      |    (sec % 86400) // 3600 AS hr,
      |    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(12,2))) AS sv
      |  FROM e GROUP BY 1, 2)
      |SELECT day_start, day_start + (hr + 1) * 3600 AS win_end,
      |  CAST(SUM(n) OVER w AS BIGINT) AS n_cum,
      |  CAST(SUM(sv) OVER w AS DOUBLE) AS sum_value_cum
      |FROM hourly
      |WINDOW w AS (PARTITION BY day_start ORDER BY hr
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY day_start, win_end""".stripMargin

  /** Session windows per user, 30-minute inactivity gap, via Spark's native
    * session_window. Timestamps are floored to whole seconds FIRST so the
    * gap comparison is identical to the oracle's integer arithmetic (an
    * exactly-1800.xxx-second gap would otherwise split differently).
    * Oracle = gaps-and-islands: lag + cumulative new-session flag. */
  def sessionWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val secs = events(s, dir)
      .select($"user_id", timestamp_seconds(epochS($"ts")).as("tsec"), $"value")
    secs
      .groupBy(session_window($"tsec", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(dec2($"value")).cast("double").as("sum_value"))
      .select(unix_timestamp($"session_window.start").as("sess_start"),
        $"user_id", $"n_events", $"sum_value")
      .orderBy($"user_id", $"sess_start")
  }

  val sessionWindowSql: String =
    """WITH t AS (
      |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, value,
      |    LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER
      |      (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS prev_sec
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, sec, value,
      |    -- strictly greater: Spark's session_window merges an event at
      |    -- exactly last+gap into the session (inclusive end), verified
      |    -- empirically; >= here split one exact-1800s gap at sf0.1
      |    CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_sess
      |  FROM t),
      |numbered AS (
      |  SELECT user_id, sec, value,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged)
      |SELECT MIN(sec) AS sess_start, user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM numbered
      |GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin

  /** DYNAMIC-gap session windows — Flink's SessionWindowTimeGapExtractor
    * (per-event inactivity timeout): purchases keep a session alive for
    * 60 minutes, everything else 30 — the "a conversion buys you more
    * attention" sessionization rule. Spark's `session_window(ts, gapCol)`
    * takes the gap as an expression, so this stays one native session
    * aggregate: one shuffle on user_id, interval-merge inside the
    * aggregation, no self-join.
    *
    * Oracle is the gaps-and-islands form GENERALIZED: with variable gaps
    * the session end is the RUNNING MAX of (t + gap) over the session so
    * far (an early long-gap event can outlast later short-gap ones), not
    * lag(t) + constant — a new session starts when t exceeds that
    * running max (strictly: Spark merges an event landing exactly on the
    * session end, same inclusive boundary [[sessionWindow]] documented).
    * Seconds-floored timestamps (R3) keep every comparison integer. */
  def sessionDynamic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gap = when($"event_type" === "purchase", lit("60 minutes"))
      .otherwise(lit("30 minutes"))
    events(s, dir)
      .select($"user_id", $"event_type", timestamp_seconds(epochS($"ts")).as("tsec"))
      .groupBy(session_window($"tsec", gap), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when($"event_type" === "purchase", 1)).as("n_purchases"))
      .select(
        unix_timestamp($"session_window.start").as("sess_start"),
        unix_timestamp($"session_window.end").as("sess_end"),
        $"user_id", $"n_events", $"n_purchases")
      .orderBy($"user_id", $"sess_start")
  }

  val sessionDynamicSql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
      |    CASE WHEN event_type = 'purchase' THEN 3600 ELSE 1800 END AS gap
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, sec, gap, event_type,
      |    MAX(sec + gap) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM t),
      |f AS (
      |  SELECT user_id, event_id, sec, gap, event_type,
      |    CASE WHEN prev_end IS NULL OR sec > prev_end THEN 1 ELSE 0 END AS new_sess,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sec, event_id) AS rn
      |  FROM m),
      |n AS (
      |  SELECT user_id, sec, gap, event_type,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY rn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM f)
      |SELECT MIN(sec) AS sess_start,
      |  CAST(MAX(sec + gap) AS BIGINT) AS sess_end,
      |  user_id, COUNT(*) AS n_events,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
      |FROM n
      |GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin

  /** Keyed dedup, keep-first by event time: the ValueState "seen" pattern.
    * Batch form: row_number over (user, type) ordered by (sec, event_id).
    * Ranking floors ts to whole seconds BEFORE ordering (like sessionWindow
    * above): Spark sees µs-truncated timestamps while DuckDB reads the raw
    * ns values, so sub-second order can differ between engines — the
    * second+event_id key is the finest cross-engine-deterministic order
    * (rule R3). */
  def dedupKeepFirst(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy(epochS($"ts"), $"event_id")
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", epochS($"ts").as("t"))
      .orderBy($"user_id", $"event_type")
  }

  val dedupKeepFirstSql: String =
    """SELECT user_id, event_type, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
      |FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** Hot-items top-N: the canonical Flink-training example — per tumbling
    * 1-hour window, the 3 most frequent event types, ranked (count desc,
    * type asc). Batch-equivalent of streaming.HotItemsProcessor (same
    * window, same ranking — asserted equivalent in StreamingSpec). */
  def hotItems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = events(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("win_start"), $"event_type", $"n")
    val w = Window.partitionBy($"win_start").orderBy($"n".desc, $"event_type")
    counts.withColumn("rank", row_number().over(w).cast(LongType))
      .where($"rank" <= 3)
      .select($"win_start", $"rank", $"event_type", $"n")
      .orderBy($"win_start", $"rank")
  }

  val hotItemsSql: String =
    """WITH c AS (
      |  SELECT CAST(FLOOR(epoch(ts)/3600) AS BIGINT) * 3600 AS win_start,
      |    event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT win_start, event_type, n,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY win_start ORDER BY n DESC, event_type) AS BIGINT) AS rank
      |  FROM c)
      |SELECT win_start, rank, event_type, n
      |FROM r WHERE rank <= 3
      |ORDER BY win_start, rank""".stripMargin

  /** Count-based window, batch analog of Flink's keyedStream.countWindow(20):
    * per user, consecutive 20-event buckets in event-time order, aggregated
    * per bucket. Spark has no count-window primitive; the composition is
    * row_number → floor((rn−1)/20) bucket id → hash aggregate. Ordering is
    * on floor-epoch-seconds + event_id — a cross-engine total order (raw ts
    * ordering could disagree below microsecond precision). The streaming twin
    * is a ListState buffer flushed at n (streaming.Processors). */
  def countWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    events(s, dir)
      .select($"user_id", $"event_id", epochS($"ts").as("t"), $"value")
      .withColumn("win_id", floor((row_number().over(w) - 1) / lit(20.0)).cast(LongType))
      .groupBy($"user_id", $"win_id")
      .agg(count(lit(1)).as("n"), sumMoney($"value").as("sum_value"),
        min($"t").as("t_min"), max($"t").as("t_max"))
      .orderBy($"user_id", $"win_id")
  }

  val countWindowSql: String =
    """WITH r AS (
      |  SELECT user_id, value, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS rn
      |  FROM events)
      |SELECT user_id, CAST(FLOOR((rn - 1) / 20.0) AS BIGINT) AS win_id,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  MIN(t) AS t_min, MAX(t) AS t_max
      |FROM r GROUP BY user_id, FLOOR((rn - 1) / 20.0)
      |ORDER BY user_id, win_id""".stripMargin

  /** CEP batch analog of the login-fail classic (Pattern.begin.where.next
    * .within): per user, the 3rd error within a 24 h window — detected with
    * lag(t, 2) over the per-user error stream: if the error two-back is
    * within the horizon, this event completes a burst. One shuffle on
    * user_id, O(1) state per row — the same sliding-count idea the
    * streaming StatefulProcessor implements with ListState + timers. */
  def cepFailBurst(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    events(s, dir).where($"event_type" === "error")
      .select($"user_id", $"event_id", epochS($"ts").as("t"))
      .withColumn("t2back", lag($"t", 2).over(w))
      .where($"t2back".isNotNull && $"t" - $"t2back" <= 86400)
      .select($"user_id", $"event_id", $"t", ($"t" - $"t2back").as("span_s"))
      .orderBy($"user_id", $"t", $"event_id")
  }

  val cepFailBurstSql: String =
    """WITH r AS (
      |  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
      |    LAG(CAST(FLOOR(epoch(ts)) AS BIGINT), 2) OVER (PARTITION BY user_id
      |      ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS t2back
      |  FROM events WHERE event_type = 'error')
      |SELECT user_id, event_id, t, t - t2back AS span_s
      |FROM r WHERE t2back IS NOT NULL AND t - t2back <= 86400
      |ORDER BY user_id, t, event_id""".stripMargin

  /** Series decimation: every 10th event per user in event-time order —
    * the plot/preview downsampling primitive. One window pass; ordering on
    * floor-epoch-seconds + event_id (cross-engine total order). At scale
    * the modulo filter drops 90% of rows before anything downstream. */
  def timeDownsample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    events(s, dir)
      .select($"user_id", $"event_id", epochS($"ts").as("t"))
      .withColumn("rn", row_number().over(w))
      .where(pmod($"rn" - 1, lit(10)) === 0)
      .select($"user_id", $"event_id", $"t")
      .orderBy($"user_id", $"t", $"event_id")
  }

  val timeDownsampleSql: String =
    """SELECT user_id, event_id, t FROM (
      |  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS rn
      |  FROM events)
      |WHERE (rn - 1) % 10 = 0
      |ORDER BY user_id, t, event_id""".stripMargin

  /** Truncated exponentially-weighted moving average (r11) — the
    * time-series smoother between plain running means (q_win_running)
    * and gap-sensitive sessionization: per user, ordered by (ts,
    * event_id), s_t = Σ_{i=0..15} value_{t−i} · α(1−α)^i with α = ½.
    *
    * α = ½ is the trick that makes an EWMA EXACT: the weights are the
    * binary fractions 2^{-(i+1)}, so scaling by 2^16 turns every term
    * into an integer — ewma_x65536 = Σ cents_{t−i} · 2^{15−i} is exact
    * int64 (cents ≤ 10⁷ · 2^15 · 16 ≈ 5·10¹² « 2⁶³), order-free, and
    * drift-free across engines; the float `ewma` column is the division
    * by the CONSTANT 65536 — a power of two, so even that double is
    * exact, not rounded (the one place rule R4's "one rounded division"
    * can be tightened to zero roundings). The 16-term truncation bounds
    * state (residual weight 2^-16 of the tail — below cent resolution)
    * and is what makes the operator a fixed-width window instead of an
    * unbounded recursive scan: 16 lag() terms in ONE window pass,
    * whole-stage codegen, no recursion, no UDAF.
    *
    * Scale: one user_id shuffle serves the single window; each row's
    * cost is 16 codegen'd lag reads — constant. The streaming twin is a
    * transformWithState value-state register (s_agg_rolling's shape). */
  def tsEwma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val base = events(s, dir)
      .select($"user_id", $"event_id", epochS($"ts").as("t"),
        round($"value" * 100.0).cast(LongType).as("cents"))
    val terms = (0 until 16).map { i =>
      coalesce(lag($"cents", i).over(w), lit(0L)) * lit(1L << (15 - i))
    }.reduce(_ + _)
    base
      .withColumn("n_terms", least(row_number().over(w), lit(16)))
      .withColumn("ewma_x65536", terms)
      .select($"user_id", $"event_id", $"t", $"n_terms", $"ewma_x65536",
        ($"ewma_x65536".cast("double") / 65536.0).as("ewma_cents"))
      .orderBy($"user_id", $"t", $"event_id")
  }

  val tsEwmaSql: String = {
    val terms = (0 until 16).map { i =>
      s"COALESCE(LAG(cents, $i) OVER w, 0) * ${1L << (15 - i)}"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
       |    CAST(ROUND(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |sm AS (
       |  SELECT user_id, event_id, t,
       |    LEAST(ROW_NUMBER() OVER w, 16) AS n_terms,
       |    CAST($terms AS BIGINT) AS ewma_x65536
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
       |SELECT user_id, event_id, t, n_terms, ewma_x65536,
       |  CAST(ewma_x65536 AS DOUBLE) / 65536.0 AS ewma_cents
       |FROM sm ORDER BY user_id, t, event_id""".stripMargin
  }

  /** Sliding-window time-series similarity search (r11) — the distributed
    * motif/template query (EDBT'19 "Time Series Similarity Search for
    * Streaming Data" family): take the opening 8-value spend pattern of
    * the smallest user id as the TEMPLATE, slide an 8-wide window over
    * every OTHER user's series, and return the top-10 closest windows by
    * squared Euclidean distance — "whose spending opens like this
    * user's". Un-normalized distance on exact cents keeps the entire
    * query integer: dist² = Σ(w_k − t_k)² ≤ 8·(2·10⁷)² ≈ 3·10¹⁵ — no
    * float, no sqrt, rank ties broken by (user, t, event_id) (R1).
    *
    * Scale: the template is 8 collected longs (bounded driver state →
    * literals, the embed_outlier contract); candidate windows come from
    * 8 lag() reads in ONE window pass per user partition (the q_ts_ewma
    * shape) — no self-join, no cross-join; top-10 fuses to
    * TakeOrderedAndProject. At 100 TB: linear scan per template, the
    * batch analog of streaming template matching; the ANN/LSH families
    * are the multi-template index path. */
  def tsSimilarity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val base = events(s, dir)
      .select($"user_id", $"event_id", epochS($"ts").as("t"),
        round($"value" * 100.0).cast(LongType).as("cents"))
    // ONE driver action for template discovery (r16): the global
    // TakeOrdered by (user_id, t, event_id) yields exactly the min user's
    // first 8 events whenever that user has ≥ 8 (the require below guards
    // the degenerate case, as before) — fusing the old two jobs (min()
    // scan + filtered TakeOrdered scan) into one, so the query reads
    // events twice total (template + windows), not three times.
    val tplRows = base.orderBy($"user_id", $"t", $"event_id").limit(8)
      .select($"user_id", $"cents").collect()
    require(tplRows.length == 8 && tplRows.forall(_.getLong(0) == tplRows(0).getLong(0)),
      "template user has < 8 events")
    val tplUser = tplRows(0).getLong(0)
    val tpl = tplRows.map(_.getLong(1))
    // window row = the 8 values ending here, chronological w1..w8
    val dist2 = (0 until 8).map { k =>
      val d = coalesce(lag($"cents", 7 - k).over(w), lit(0L)) - lit(tpl(k))
      d * d
    }.reduce(_ + _)
    base
      .where($"user_id" =!= tplUser)
      .withColumn("rn", row_number().over(w))
      .withColumn("dist2", dist2)
      .where($"rn" >= 8)
      .select($"user_id", ($"rn" - 7).as("win_start_rn"), $"t".as("t_end"), $"dist2")
      .orderBy($"dist2", $"user_id", $"t_end", $"win_start_rn")
      .limit(10)
  }

  val tsSimilaritySql: String = {
    val tplCol = (k: Int) =>
      s"(SELECT cents FROM tpl WHERE rn = ${k + 1})"
    val dist = (0 until 8).map { k =>
      s"(COALESCE(LAG(cents, ${7 - k}) OVER w, 0) - ${tplCol(k)}) * " +
        s"(COALESCE(LAG(cents, ${7 - k}) OVER w, 0) - ${tplCol(k)})"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
       |    CAST(ROUND(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |tpl AS (
       |  SELECT cents, rn FROM (
       |    SELECT cents, ROW_NUMBER() OVER (ORDER BY t, event_id) AS rn
       |    FROM base WHERE user_id = (SELECT MIN(user_id) FROM base))
       |  WHERE rn <= 8),
       |wins AS (
       |  SELECT user_id, t,
       |    ROW_NUMBER() OVER w AS rn,
       |    CAST($dist AS BIGINT) AS dist2
       |  FROM base
       |  WHERE user_id <> (SELECT MIN(user_id) FROM base)
       |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
       |SELECT user_id, CAST(rn - 7 AS BIGINT) AS win_start_rn,
       |  t AS t_end, dist2
       |FROM wins WHERE rn >= 8
       |ORDER BY dist2, user_id, t_end, win_start_rn
       |LIMIT 10""".stripMargin
  }

  /** DAU / WAU census (r11) — daily and trailing-7-day distinct active
    * users per epoch-day: the engagement dashboard staple. The subtlety
    * is that rolling DISTINCT does not decompose — WAU is NOT a window
    * sum of DAUs (users repeat across days) — so the correct scalable
    * formulation is contribution-explode: each (user, day) activity
    * fact contributes to the 7 window-days [day, day+6], and WAU(d) is
    * a plain countDistinct per window-day. Work = 7× the distinct
    * activity facts (constant factor, shuffle on the window-day key,
    * map-side partial-distinct) — never a per-day set union, never a
    * driver bitmap. The KMV/HLL sketch families are the approximate
    * path when 7× is too dear; this is the exact contract-sized form.
    * Days are integer epoch-days (R3); trailing days beyond the
    * observed max are truncated. */
  def activeUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE pass (r17): each distinct (user, day) fact contributes to the 7
    // window-days with its offset; per window-day, WAU = countDistinct
    // over all contributions and DAU = the count of offset-0 facts (au is
    // already distinct, so that count IS the day's distinct users). Days
    // with no own activity (offset-0 count = 0) only existed as trailing
    // window rows and were dropped by the old dau⋈wau inner join — the
    // HAVING reproduces that. Replaces: the au pin (sole consumer now),
    // one aggregation exchange and the join. The max-day truncation bound
    // folds to a raw-events max — same value as over `au`, without
    // re-deriving the distinct (the old pin's second job).
    val au = events(s, dir)
      .select($"user_id", epochS($"ts").as("t"))
      .select($"user_id", expr("t div 86400L").as("day"))
      .distinct()
    val maxDay = events(s, dir)
      .select(epochS($"ts").as("t"))
      .select(expr("t div 86400L").as("d0"))
      .agg(max($"d0").as("mx"))
    au.select($"user_id", $"day",
        explode(sequence($"day", $"day" + 6L)).as("wday"))
      .crossJoin(broadcast(maxDay))
      .where($"wday" <= $"mx")
      .groupBy($"wday".as("day"))
      .agg(sum(when($"day" === $"wday", 1L).otherwise(0L)).as("dau"),
        countDistinct($"user_id").as("wau"))
      .where($"dau" > 0L)
      .orderBy($"day")
  }

  val activeUsersSql: String =
    """WITH au AS (
      |  SELECT DISTINCT user_id,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM au GROUP BY day),
      |wau AS (
      |  SELECT wday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau FROM (
      |    SELECT user_id, unnest(generate_series(day, day + 6)) AS wday FROM au)
      |  WHERE wday <= (SELECT MAX(day) FROM au)
      |  GROUP BY wday)
      |SELECT dau.day AS day, dau.dau, wau.wau
      |FROM dau JOIN wau ON wau.wday = dau.day
      |ORDER BY day""".stripMargin

  /** Iterative-condition CEP (r11) — maximal strictly-ASCENDING value
    * runs of length ≥ 4 per user: the Flink `IterativeCondition` shape
    * (each event's predicate references the PREVIOUS accepted event —
    * "keeps rising"), which the fixed-predicate pattern surface
    * (q_cep_pattern_seq's stages, q_cep_quantified's uniform Kleene)
    * cannot express. The monitoring staple behind "N consecutive
    * increases" alerts (s_process_timer_alert is its streaming timer
    * cousin with a wall-clock horizon instead of a count).
    *
    * Relational form: ascending flag via lag(), run ids via the
    * gaps-and-islands running sum over the flag's complement, then one
    * aggregate per run — maximality is structural (a run ends exactly
    * where the flag breaks), not search-based, so there is no greedy/
    * reluctant ambiguity to replicate cross-engine. Values compare as
    * exact cents (R2); order is (t, event_id) (R1). ONE user_id shuffle
    * serves the lag window, the run numbering, and the aggregate. */
  def cepAscending(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wSeq = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val wRun = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select($"user_id", $"event_id", epochS($"ts").as("t"),
        round($"value" * 100.0).cast(LongType).as("cents"))
      .withColumn("brk",
        when($"cents" > lag($"cents", 1).over(wSeq), lit(0L)).otherwise(lit(1L)))
      .withColumn("run_id", sum($"brk").over(wRun))
      .groupBy($"user_id", $"run_id")
      .agg(count(lit(1)).as("run_len"), min($"t").as("t_start"),
        max($"t").as("t_end"), min($"cents").as("cents_first"),
        max($"cents").as("cents_last"))
      .where($"run_len" >= 4)
      .select($"user_id", $"run_len", $"t_start", $"t_end",
        $"cents_first", $"cents_last")
      .orderBy($"user_id", $"t_start")
  }

  val cepAscendingSql: String =
    """WITH base AS (
      |  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
      |    CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, t, cents,
      |    CASE WHEN cents > LAG(cents) OVER w THEN 0 ELSE 1 END AS brk
      |  FROM base
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      |runs AS (
      |  SELECT user_id, t, cents,
      |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
      |  FROM flagged)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run_len,
      |  MIN(t) AS t_start, MAX(t) AS t_end,
      |  MIN(cents) AS cents_first, MAX(cents) AS cents_last
      |FROM runs GROUP BY user_id, run_id
      |HAVING COUNT(*) >= 4
      |ORDER BY user_id, t_start""".stripMargin

  /** Rolling band anomaly flags (r11) — Bollinger-style volatility bands,
    * the moving-STATS sibling of [[tsEwma]] (a moving MEAN): per user over
    * the trailing 20-event frame, is this value outside mean ± 2σ of its
    * own recent history? The "sudden spend spike vs normal volatility"
    * monitor; unlike q_anomaly_mad (global, per-type) the baseline here is
    * LOCAL — each event is judged against its own trailing window.
    *
    * Exactness: with s = Σcents, ss = Σcents² over the n-row frame (both
    * exact int64 window sums — cents² ≤ 10¹⁴, ×20 well inside range),
    * mean = s/n and σ² = (n·ss − s²)/n² are rational; the band test
    * (x−mean)² > 4σ² cross-multiplies to (x·n − s)² > 4·(n·ss − s²) —
    * pure int64 (LHS ≤ ~1.6·10¹⁷), NO division, NO float, same verdict in
    * any engine. The emitted columns are the exact integer window sums +
    * the flag; consumers derive display floats downstream.
    *
    * Scale: one user_id shuffle, both window sums + count share the single
    * sorted frame pass; arithmetic is whole-stage codegen. */
  def tsBollinger(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(-19, Window.currentRow)
    events(s, dir)
      .select($"user_id", $"event_id", epochS($"ts").as("t"),
        round($"value" * 100.0).cast(LongType).as("cents"))
      // all three frame aggregates in ONE select so CollapseWindow fuses
      // them into a single Window operator (withColumn chains interleave
      // Projects that block the fusion — plan-asserted in PlanSpec)
      .select($"user_id", $"event_id", $"t", $"cents",
        count(lit(1)).over(w).as("n_frame"),
        sum($"cents").over(w).as("sum_cents"),
        sum($"cents" * $"cents").over(w).as("sumsq_cents"))
      .withColumn("var_num", $"n_frame" * $"sumsq_cents" - $"sum_cents" * $"sum_cents")
      .withColumn("breach",
        ($"cents" * $"n_frame" - $"sum_cents") * ($"cents" * $"n_frame" - $"sum_cents")
          > lit(4L) * $"var_num")
      .select($"user_id", $"event_id", $"t", $"cents", $"n_frame",
        $"sum_cents", $"var_num", $"breach")
      .orderBy($"user_id", $"t", $"event_id")
  }

  val tsBollingerSql: String =
    """WITH base AS (
      |  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
      |    CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |fr AS (
      |  SELECT user_id, event_id, t, cents,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS n_frame,
      |    CAST(SUM(cents) OVER w AS BIGINT) AS sum_cents,
      |    CAST(SUM(cents * cents) OVER w AS BIGINT) AS sumsq_cents
      |  FROM base
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
      |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id, t, cents, n_frame, sum_cents,
      |  n_frame * sumsq_cents - sum_cents * sum_cents AS var_num,
      |  (cents * n_frame - sum_cents) * (cents * n_frame - sum_cents)
      |    > 4 * (n_frame * sumsq_cents - sum_cents * sum_cents) AS breach
      |FROM fr ORDER BY user_id, t, event_id""".stripMargin

  /** Longest consecutive-day activity streak per user (r11) — the
    * engagement metric gaps-and-islands answers on DAYS rather than
    * intervals (q_interval_islands merges second-resolution covers; a
    * streak is day-granular and breaks on any missing day, however small
    * the wall-clock gap). The day − row_number() grouping idiom: within a
    * user's DISTINCT active days in order, day minus its rank is constant
    * exactly along a consecutive run, so the difference IS the streak id.
    *
    * Exact throughout: days are integer epoch-days (rule R3 — floor
    * division of epoch seconds, no calendar/timezone conventions), the
    * idiom is integer subtraction, and the winning streak per user
    * tie-breaks to the EARLIEST start (R1). Scale: one user_id shuffle
    * serves the distinct, the rank window, and both aggregations — the
    * per-user day frame is bounded by the observation span. */
  def winStreak(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wRank = Window.partitionBy($"user_id").orderBy($"day")
    val days = events(s, dir)
      .select($"user_id", epochS($"ts").as("t"))
      .select($"user_id", expr("t div 86400L").as("day"))
      .distinct()
    days
      .withColumn("grp", $"day" - row_number().over(wRank))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"), min($"day").as("streak_start"),
        max($"day").as("streak_end"))
      .groupBy($"user_id")
      .agg(sum($"len").as("n_active_days"),
        max(struct($"len", (-$"streak_start").as("neg_start"),
          $"streak_start", $"streak_end")).as("best"))
      .select($"user_id", $"n_active_days", $"best.len".as("longest_streak"),
        $"best.streak_start", $"best.streak_end")
      .orderBy($"user_id")
  }

  val winStreakSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |runs AS (
      |  SELECT user_id,
      |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp,
      |    day
      |  FROM days),
      |streaks AS (
      |  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len,
      |    MIN(day) AS s_start, MAX(day) AS s_end
      |  FROM runs GROUP BY user_id, grp),
      |ranked AS (
      |  SELECT user_id, len, s_start, s_end,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY len DESC, s_start ASC) AS rn,
      |    CAST(SUM(len) OVER (PARTITION BY user_id) AS BIGINT) AS n_active_days
      |  FROM streaks)
      |SELECT user_id, n_active_days, len AS longest_streak,
      |  s_start AS streak_start, s_end AS streak_end
      |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Calendar gap-fill: daily order counts on a dense epoch-day spine with
    * zero-filled missing days — the densification step every time-series
    * consumer (charts, models, window functions over time) needs. The
    * spine generates from the observed min/max day (two-row broadcast),
    * so no external calendar table; days are integer epoch-days (rule R3,
    * no calendar/timezone conventions). */
  def gapFillDaily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = orders(s, dir)
      .groupBy(floor(epochS($"o_orderdate") / lit(86400.0)).cast(LongType).as("day"))
      .agg(count(lit(1)).as("n"))
    val spine = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select($"day", coalesce($"n", lit(0L)).as("n_orders"))
      .orderBy($"day")
  }

  val gapFillDailySql: String =
    """WITH daily AS (
      |  SELECT CAST(FLOOR(FLOOR(epoch(o_orderdate)) / 86400.0) AS BIGINT) AS day,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1),
      |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |spine AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b)
      |SELECT spine.day AS day, COALESCE(n, 0) AS n_orders
      |FROM spine LEFT JOIN daily ON spine.day = daily.day
      |ORDER BY day""".stripMargin

  /** Generic linear CEP as a batch contract query — the oracle-checked twin
    * of [[graft.streaming.PatternSequenceProcessor]], run through the
    * [[graft.streaming.Pattern]] builder + shared PatternMatcher core (the
    * special-cased processors login-fail/funnel already have batch twins;
    * this gives the GENERIC engine the same validation). Pattern:
    * signup → click → purchase within 24h per user, leftmost-greedy, no
    * event reuse, relaxed contiguity.
    *
    * Oracle: leftmost-greedy no-reuse matching is sequential, but with
    * DISTINCT stage types the per-stage picks are strictly increasing
    * across a user's successive matches (exchange argument: a smaller
    * unconsumed pick inside the current window would have been inside the
    * previous head's window too — cross-checked against a consumed-set
    * reference on 3000 random streams), so a recursive CTE carrying only
    * the last (head, stage-2, stage-3) picks replays the engine exactly.
    *
    * Scale: one shuffle on user_id; per-user sort+scan — the inherent
    * MATCH_RECOGNIZE partition contract (see Patterns.scala).
    * Times are engine-identical epoch ms: Spark truncates µs→ms via
    * Timestamp.getTime, DuckDB via epoch_ms — both floor positive epochs. */
  def cepPatternSeq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern
      .begin("signup")(_.event_type == "signup")
      .followedBy("click")(_.event_type == "click")
      .followedBy("purchase")(_.event_type == "purchase")
      .within(86400000L)
    val evs = events(s, dir)
      .where($"event_type".isin("signup", "click", "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepPatternSeqSql: String =
    """WITH RECURSIVE ev AS MATERIALIZED (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type
      |  FROM events WHERE event_type IN ('signup','click','purchase')),
      |m AS (
      |  SELECT user_id, 0 AS match_no,
      |    CAST(-9223372036854775808 AS BIGINT) AS h_t, CAST(-1 AS BIGINT) AS h_id,
      |    CAST(-9223372036854775808 AS BIGINT) AS b_t, CAST(-1 AS BIGINT) AS b_id,
      |    CAST(-9223372036854775808 AS BIGINT) AS c_t, CAST(-1 AS BIGINT) AS c_id
      |  FROM (SELECT DISTINCT user_id FROM ev)
      |  UNION ALL
      |  SELECT nxt.user_id, m.match_no + 1,
      |    nxt.h_t, nxt.h_id, nxt.b_t, nxt.b_id, nxt.c_t, nxt.c_id
      |  FROM m, LATERAL (
      |    SELECT e1.user_id, e1.t AS h_t, e1.event_id AS h_id,
      |           b2.t AS b_t, b2.id AS b_id, c3.t AS c_t, c3.id AS c_id
      |    FROM ev e1,
      |      LATERAL (
      |        SELECT e2.t, e2.event_id AS id FROM ev e2
      |        WHERE e2.user_id = e1.user_id AND e2.event_type = 'click'
      |          AND (e2.t > e1.t OR (e2.t = e1.t AND e2.event_id > e1.event_id))
      |          AND (e2.t > m.b_t OR (e2.t = m.b_t AND e2.event_id > m.b_id))
      |          AND e2.t <= e1.t + 86400000
      |        ORDER BY e2.t, e2.event_id LIMIT 1) b2,
      |      LATERAL (
      |        SELECT e3.t, e3.event_id AS id FROM ev e3
      |        WHERE e3.user_id = e1.user_id AND e3.event_type = 'purchase'
      |          AND (e3.t > b2.t OR (e3.t = b2.t AND e3.event_id > b2.id))
      |          AND (e3.t > m.c_t OR (e3.t = m.c_t AND e3.event_id > m.c_id))
      |          AND e3.t <= e1.t + 86400000
      |        ORDER BY e3.t, e3.event_id LIMIT 1) c3
      |    WHERE e1.user_id = m.user_id AND e1.event_type = 'signup'
      |      AND (e1.t > m.h_t OR (e1.t = m.h_t AND e1.event_id > m.h_id))
      |    ORDER BY e1.t, e1.event_id LIMIT 1) nxt)
      |SELECT user_id, h_t AS first_ms, c_t AS last_ms,
      |  CAST(h_id AS VARCHAR) || '/' || CAST(b_id AS VARCHAR) || '/'
      |    || CAST(c_id AS VARCHAR) AS ids
      |FROM m WHERE match_no >= 1
      |ORDER BY user_id, first_ms, ids""".stripMargin

  /** Guarded CEP batch contract (r6): signup NOT-followed-by error,
    * followed by click, within 24 h — the `notFollowedBy` modifier run
    * through the same builder + matcher core as q_cep_pattern_seq, with a
    * DuckDB oracle extending the recursive-CTE replay with the abort
    * semantics: a head matches iff its earliest unconsumed click exists in
    * the window AND no error lies strictly between head and that click in
    * (t, id) scan order.
    *
    * Oracle validity: the monotone-picks argument carries over with
    * guards — an aborted head consumes nothing, matched heads/clicks stay
    * strictly increasing (a click between head_k and b_k would have BEEN
    * b_k, so head_{k+1}'s earliest click is > b_k) — so the CTE's
    * last-pick state still replays the engine exactly; errors are never
    * consumed (guard-only type), so the NOT EXISTS scans the raw stream.
    * Cross-validated by PatternModifierSpec's independent anchors and the
    * randomized seal property. */
  /** The MATCH_RECOGNIZE-lite STRING surface as a first-class contract
    * query: the same guarded pattern as [[cepGuarded]], but compiled from
    * the `"signup !error click within 24h"` spec via
    * [[graft.streaming.Pattern.matchRecognize]] instead of the builder —
    * so the parser+compiler path (the Flink Table-API SQL analog) is
    * itself DuckDB-oracle-checked every round, not just unit-tested. The
    * oracle is cepGuarded's recursive CTE verbatim: if parse or compile
    * ever drifts from builder semantics, the hash gate goes red. */
  def cepMatchRecognize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern.matchRecognize("signup !error click within 24h")(
      "signup" -> ((e: Event) => e.event_type == "signup"),
      "error"  -> ((e: Event) => e.event_type == "error"),
      "click"  -> ((e: Event) => e.event_type == "click"))
    val evs = events(s, dir)
      .where($"event_type".isin("signup", "click", "error"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  def cepGuarded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern
      .begin("signup")(_.event_type == "signup")
      .notFollowedBy("err")(_.event_type == "error")
      .followedBy("click")(_.event_type == "click")
      .within(86400000L)
    val evs = events(s, dir)
      .where($"event_type".isin("signup", "click", "error"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepGuardedSql: String =
    """WITH RECURSIVE ev AS MATERIALIZED (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type
      |  FROM events WHERE event_type IN ('signup','click','error')),
      |m AS (
      |  SELECT user_id, 0 AS match_no,
      |    CAST(-9223372036854775808 AS BIGINT) AS h_t, CAST(-1 AS BIGINT) AS h_id,
      |    CAST(-9223372036854775808 AS BIGINT) AS b_t, CAST(-1 AS BIGINT) AS b_id
      |  FROM (SELECT DISTINCT user_id FROM ev)
      |  UNION ALL
      |  SELECT nxt.user_id, m.match_no + 1, nxt.h_t, nxt.h_id, nxt.b_t, nxt.b_id
      |  FROM m, LATERAL (
      |    SELECT e1.user_id, e1.t AS h_t, e1.event_id AS h_id,
      |           b2.t AS b_t, b2.id AS b_id
      |    FROM ev e1,
      |      LATERAL (
      |        SELECT e2.t, e2.event_id AS id FROM ev e2
      |        WHERE e2.user_id = e1.user_id AND e2.event_type = 'click'
      |          AND (e2.t > e1.t OR (e2.t = e1.t AND e2.event_id > e1.event_id))
      |          AND (e2.t > m.b_t OR (e2.t = m.b_t AND e2.event_id > m.b_id))
      |          AND e2.t <= e1.t + 86400000
      |        ORDER BY e2.t, e2.event_id LIMIT 1) b2
      |    WHERE e1.user_id = m.user_id AND e1.event_type = 'signup'
      |      AND (e1.t > m.h_t OR (e1.t = m.h_t AND e1.event_id > m.h_id))
      |      AND NOT EXISTS (
      |        SELECT 1 FROM ev x
      |        WHERE x.user_id = e1.user_id AND x.event_type = 'error'
      |          AND (x.t > e1.t OR (x.t = e1.t AND x.event_id > e1.event_id))
      |          AND (x.t < b2.t OR (x.t = b2.t AND x.event_id < b2.id))
      |          AND x.t <= e1.t + 86400000)
      |    ORDER BY e1.t, e1.event_id LIMIT 1) nxt)
      |SELECT user_id, h_t AS first_ms, b_t AS last_ms,
      |  CAST(h_id AS VARCHAR) || '/' || CAST(b_id AS VARCHAR) AS ids
      |FROM m WHERE match_no >= 1
      |ORDER BY user_id, first_ms, ids""".stripMargin

  /** QUANTIFIED MATCH_RECOGNIZE contract (r9): `signup click{1,3}` —
    * the `{a,b}` quantifier surface (Patterns.scala's times(from, to)
    * desugar to required + trailing-optional replicas) exercised by the
    * DuckDB hash gate, not just the unit layer. Greedy: a match consumes
    * the first one-to-three unconsumed clicks after its head inside the
    * 24 h window, completing short only at the window edge.
    *
    * Oracle validity extends the monotone-picks argument to the shared
    * stage TYPE: a match's click picks are CONSECUTIVE earliest-unconsumed
    * clicks in (t, id) scan order, so after match k every click in
    * (head_k, last_k] is consumed; head_{k+1} > head_k then forces
    * c1_{k+1} > last_k — the CTE carries only (last head, last consumed
    * click) and replays the engine exactly. c2/c3 need no consumed-check
    * at all: they are > c1 > last_k by construction. Optional fills map
    * to LEFT LATERAL picks; a head with no c1 matches nothing and
    * consumes nothing (skipped by the inner join), same as the engine. */
  def cepQuantified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern.matchRecognize("signup click{1,3} within 24h")(
      "signup" -> ((e: Event) => e.event_type == "signup"),
      "click"  -> ((e: Event) => e.event_type == "click"))
    val evs = events(s, dir)
      .where($"event_type".isin("signup", "click"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepQuantifiedSql: String =
    """WITH RECURSIVE ev AS MATERIALIZED (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type
      |  FROM events WHERE event_type IN ('signup','click')),
      |m AS (
      |  SELECT user_id, 0 AS match_no,
      |    CAST(-9223372036854775808 AS BIGINT) AS h_t, CAST(-1 AS BIGINT) AS h_id,
      |    CAST(-9223372036854775808 AS BIGINT) AS l_t, CAST(-1 AS BIGINT) AS l_id,
      |    CAST(NULL AS VARCHAR) AS ids
      |  FROM (SELECT DISTINCT user_id FROM ev)
      |  UNION ALL
      |  SELECT nxt.user_id, m.match_no + 1,
      |    nxt.h_t, nxt.h_id, nxt.l_t, nxt.l_id, nxt.ids
      |  FROM m, LATERAL (
      |    SELECT e1.user_id, e1.t AS h_t, e1.event_id AS h_id,
      |      COALESCE(c3.t, c2.t, c1.t) AS l_t,
      |      COALESCE(c3.id, c2.id, c1.id) AS l_id,
      |      CAST(e1.event_id AS VARCHAR) || '/' || CAST(c1.id AS VARCHAR)
      |        || COALESCE('/' || CAST(c2.id AS VARCHAR), '')
      |        || COALESCE('/' || CAST(c3.id AS VARCHAR), '') AS ids
      |    FROM ev e1
      |    JOIN LATERAL (
      |      SELECT c.t, c.event_id AS id FROM ev c
      |      WHERE c.user_id = e1.user_id AND c.event_type = 'click'
      |        AND (c.t > e1.t OR (c.t = e1.t AND c.event_id > e1.event_id))
      |        AND (c.t > m.l_t OR (c.t = m.l_t AND c.event_id > m.l_id))
      |        AND c.t <= e1.t + 86400000
      |      ORDER BY c.t, c.event_id LIMIT 1) c1 ON TRUE
      |    LEFT JOIN LATERAL (
      |      SELECT c.t, c.event_id AS id FROM ev c
      |      WHERE c.user_id = e1.user_id AND c.event_type = 'click'
      |        AND (c.t > c1.t OR (c.t = c1.t AND c.event_id > c1.id))
      |        AND c.t <= e1.t + 86400000
      |      ORDER BY c.t, c.event_id LIMIT 1) c2 ON TRUE
      |    LEFT JOIN LATERAL (
      |      SELECT c.t, c.event_id AS id FROM ev c
      |      WHERE c.user_id = e1.user_id AND c.event_type = 'click'
      |        AND c2.id IS NOT NULL
      |        AND (c.t > c2.t OR (c.t = c2.t AND c.event_id > c2.id))
      |        AND c.t <= e1.t + 86400000
      |      ORDER BY c.t, c.event_id LIMIT 1) c3 ON TRUE
      |    WHERE e1.user_id = m.user_id AND e1.event_type = 'signup'
      |      AND (e1.t > m.h_t OR (e1.t = m.h_t AND e1.event_id > m.h_id))
      |    ORDER BY e1.t, e1.event_id LIMIT 1) nxt)
      |SELECT user_id, h_t AS first_ms, l_t AS last_ms, ids
      |FROM m WHERE match_no >= 1
      |ORDER BY user_id, first_ms, ids""".stripMargin

  /** UNBOUNDED-KLEENE MATCH_RECOGNIZE contract (r14): `signup click+` —
    * flink-cep's `Pattern.oneOrMore()`, the most-exercised public
    * flink-cep construct not previously hash-checked. Unlike
    * [[cepQuantified]]'s bounded `{1,3}` desugar, the kleene stage has NO
    * replica bound: the matcher's pointer stays on the satisfied stage
    * and greedily consumes EVERY further in-window click.
    *
    * Oracle validity extends [[cepQuantified]]'s monotone-picks argument
    * to the unbounded tail: greedy consumption takes the first unconsumed
    * click c1 after the head, then — because every click matches the
    * kleene stage and nothing can advance past it — ALL clicks in
    * [c1, head+24h] in (t, id) order, so a match's consumed set is a
    * contiguous (t, id)-range of clicks and its last pick l is that
    * range's max, monotone across matches (c1_{k+1} > l_k).
    *
    * CLOSED FORM (r16, replacing the recursive-CTE replay — row-identical
    * at sf0.001/sf0.01/sf0.1, 45 s → 0.2 s at sf0.1): index clicks per
    * user by (t, id) rank cseq; the in-horizon clicks of a head form the
    * cseq-PREFIX ending at L = max in-horizon cseq (t ≤ horizon is
    * prefix-closed in cseq order). The consumed-click watermark after
    * head k is then w_k = max over j ≤ k of { L_j if L_j > hpos_j } where
    * hpos is the head's own click-rank position — BECAUSE whenever any
    * consumption happens its last pick IS L_j (the in-horizon max), and
    * an L_j ≤ w contributes nothing to a max. That makes w a plain
    * windowed running MAX over heads in (t, id) order — no recursion —
    * and each match's consumed range is (greatest(hpos, w_prev), L],
    * nonempty iff L clears it (the engine's has-available-click test).
    * DuckDB 1.0.0 re-iterated the old CTE's lateral probes once per match
    * per user; the closed form is three hash joins and a window. */
  def cepKleene(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern.matchRecognize("signup click+ within 24h")(
      "signup" -> ((e: Event) => e.event_type == "signup"),
      "click"  -> ((e: Event) => e.event_type == "click"))
    val evs = events(s, dir)
      .where($"event_type".isin("signup", "click"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepKleeneSql: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type
      |  FROM events WHERE event_type IN ('signup','click')),
      |clk AS MATERIALIZED (
      |  SELECT user_id, event_id, t,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t, event_id) AS cseq
      |  FROM ev WHERE event_type = 'click'),
      |heads AS (
      |  SELECT user_id, event_id AS h_id, t AS h_t, t + 86400000 AS horizon
      |  FROM ev WHERE event_type = 'signup'),
      |hl AS (
      |  SELECT h.user_id, h.h_id, h.h_t,
      |    COALESCE(MAX(c.cseq), 0) AS l_cseq,
      |    COALESCE(MAX(CASE WHEN c.t < h.h_t OR (c.t = h.h_t AND c.event_id < h.h_id)
      |      THEN c.cseq END), 0) AS hpos
      |  FROM heads h LEFT JOIN clk c ON c.user_id = h.user_id AND c.t <= h.horizon
      |  GROUP BY 1, 2, 3),
      |rng AS (
      |  SELECT user_id, h_id, h_t, l_cseq,
      |    GREATEST(hpos, COALESCE(MAX(CASE WHEN l_cseq > hpos THEN l_cseq END)
      |      OVER (PARTITION BY user_id ORDER BY h_t, h_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS start_cseq
      |  FROM hl),
      |agg AS (
      |  SELECT r.user_id, r.h_id,
      |    string_agg(CAST(c.event_id AS VARCHAR), '/' ORDER BY c.cseq) AS idl,
      |    MAX(c.t) AS lst_t
      |  FROM rng r JOIN clk c ON c.user_id = r.user_id
      |    AND c.cseq > r.start_cseq AND c.cseq <= r.l_cseq
      |  GROUP BY 1, 2)
      |SELECT r.user_id AS user_id, r.h_t AS first_ms,
      |  a.lst_t AS last_ms,
      |  CAST(r.h_id AS VARCHAR) || '/' || a.idl AS ids
      |FROM rng r JOIN agg a ON a.user_id = r.user_id AND a.h_id = r.h_id
      |ORDER BY r.user_id, first_ms, ids""".stripMargin

  /** ZERO-OR-MORE KLEENE contract (r15, closing the last grammar gap vs
    * public flink-cep): `signup click*` — flink's `oneOrMore().optional()`
    * composition / SQL PATTERN `*`. Unlike [[cepKleene]]'s `click+`, a
    * signup whose window holds NO available click still completes: the
    * star stage contributes nothing and the match is the head alone
    * (first_ms = last_ms = head ts, ids = head id) — so EVERY signup
    * emits exactly one match.
    *
    * Oracle validity is [[cepKleene]]'s contiguous-range argument with
    * head-only rows spliced in: once entered, the star consumes the first
    * available click c1 after the head and then ALL clicks in
    * [c1, head+24h] (every click matches the star stage and nothing can
    * advance past it), so a non-empty match's consumed set is a
    * contiguous (t, id)-range of clicks whose max l is MONOTONE across
    * matches (for any earlier match k, c1 ≥ c1_k by unconsumed-then ∧
    * after-h_k, and c1 ≤ l_k would put c1 inside match k's consumed
    * range — so c1 > l_k). A head-only match consumes no click and
    * leaves the watermark where it was.
    *
    * CLOSED FORM (r16): [[cepKleeneSql]]'s running-max watermark argument
    * verbatim — the star only changes emission (every head emits, the
    * consumed range may be empty ⇒ LEFT join, ids/last fall back to the
    * head) while the watermark algebra is untouched (a head-only match
    * has L ≤ max(hpos, w_prev), which contributes nothing to the running
    * max). Row-identical at sf0.001/sf0.01/sf0.1; 477 s → 0.2 s at sf0.1
    * (this single oracle was ~40% of the r15 sweep's CEP tail). */
  def cepKleeneStar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern.matchRecognize("signup click* within 24h")(
      "signup" -> ((e: Event) => e.event_type == "signup"),
      "click"  -> ((e: Event) => e.event_type == "click"))
    val evs = events(s, dir)
      .where($"event_type".isin("signup", "click"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepKleeneStarSql: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type
      |  FROM events WHERE event_type IN ('signup','click')),
      |clk AS MATERIALIZED (
      |  SELECT user_id, event_id, t,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t, event_id) AS cseq
      |  FROM ev WHERE event_type = 'click'),
      |heads AS (
      |  SELECT user_id, event_id AS h_id, t AS h_t, t + 86400000 AS horizon
      |  FROM ev WHERE event_type = 'signup'),
      |hl AS (
      |  SELECT h.user_id, h.h_id, h.h_t,
      |    COALESCE(MAX(c.cseq), 0) AS l_cseq,
      |    COALESCE(MAX(CASE WHEN c.t < h.h_t OR (c.t = h.h_t AND c.event_id < h.h_id)
      |      THEN c.cseq END), 0) AS hpos
      |  FROM heads h LEFT JOIN clk c ON c.user_id = h.user_id AND c.t <= h.horizon
      |  GROUP BY 1, 2, 3),
      |rng AS (
      |  SELECT user_id, h_id, h_t, l_cseq,
      |    GREATEST(hpos, COALESCE(MAX(CASE WHEN l_cseq > hpos THEN l_cseq END)
      |      OVER (PARTITION BY user_id ORDER BY h_t, h_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS start_cseq
      |  FROM hl),
      |agg AS (
      |  SELECT r.user_id, r.h_id,
      |    string_agg(CAST(c.event_id AS VARCHAR), '/' ORDER BY c.cseq) AS idl,
      |    MAX(c.t) AS lst_t
      |  FROM rng r JOIN clk c ON c.user_id = r.user_id
      |    AND c.cseq > r.start_cseq AND c.cseq <= r.l_cseq
      |  GROUP BY 1, 2)
      |SELECT r.user_id AS user_id, r.h_t AS first_ms,
      |  COALESCE(a.lst_t, r.h_t) AS last_ms,
      |  CAST(r.h_id AS VARCHAR) || COALESCE('/' || a.idl, '') AS ids
      |FROM rng r LEFT JOIN agg a ON a.user_id = r.user_id AND a.h_id = r.h_id
      |ORDER BY r.user_id, first_ms, ids""".stripMargin

  /** STRICT-CONTIGUITY CEP contract (r14 second batch): flink-cep
    * `Pattern.begin("signup").next("purchase")` — `next` demands the
    * match be the IMMEDIATELY following event of that user (no event of
    * ANY type in between), vs `followedBy`'s relaxed skip-over. The feed
    * is deliberately unfiltered: every event type participates, so an
    * intervening view/click/error breaks adjacency exactly as in
    * flink-cep.
    *
    * Oracle validity (simpler than the recursive-CTE family — strictness
    * collapses the search): a signup matches iff its lead() event (full
    * per-user (t, id) order) is an in-window purchase. Consumption cannot
    * perturb this: heads are tried in (t, id) order, and for a consumed
    * event to hide between a later head and its successor, an earlier
    * match would need to span an unconsumed signup — but the earlier
    * head's own strict successor would then have been that signup
    * (aborting it), never a purchase beyond it. So engine available-
    * successor ≡ raw lead() here, and the oracle needs no recursion. */
  def cepNext(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern
      .begin("signup")((e: Event) => e.event_type == "signup")
      .next("purchase")((e: Event) => e.event_type == "purchase")
      .within(3600000L)
    val evs = events(s, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepNextSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type FROM events),
      |led AS (
      |  SELECT user_id, event_id, t, event_type,
      |    lead(event_type) OVER w AS nxt_type,
      |    lead(t) OVER w AS nxt_t,
      |    lead(event_id) OVER w AS nxt_id
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
      |SELECT user_id, t AS first_ms, nxt_t AS last_ms,
      |  CAST(event_id AS VARCHAR) || '/' || CAST(nxt_id AS VARCHAR) AS ids
      |FROM led
      |WHERE event_type = 'signup' AND nxt_type = 'purchase'
      |  AND nxt_t <= t + 3600000
      |ORDER BY user_id, first_ms, ids""".stripMargin

  /** NON-DETERMINISTIC CEP contract (r14 second batch): flink-cep
    * `Pattern.begin("signup").followedByAny("purchase")` under the
    * NO_SKIP all-matches surface ([[graft.streaming.PatternMatcher
    * .sealAll]]) — EVERY in-window purchase after EVERY signup is its own
    * match, events freely shared across matches. This is the emission
    * contract the greedy consumed-set surface cannot express, and it is
    * exactly SQL-expressible: the match set IS the windowed self-join, so
    * the oracle needs no recursion and no consumption state at all. */
  def cepAny(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern
      .begin("signup")((e: Event) => e.event_type == "signup")
      .followedByAny("purchase")((e: Event) => e.event_type == "purchase")
      .within(86400000L)
    val evs = events(s, dir)
      .where($"event_type".isin("signup", "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatchAll(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepAnySql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type
      |  FROM events WHERE event_type IN ('signup','purchase'))
      |SELECT s.user_id, s.t AS first_ms, p.t AS last_ms,
      |  CAST(s.event_id AS VARCHAR) || '/' || CAST(p.event_id AS VARCHAR) AS ids
      |FROM ev s JOIN ev p
      |  ON p.user_id = s.user_id AND p.event_type = 'purchase'
      | AND (p.t > s.t OR (p.t = s.t AND p.event_id > s.event_id))
      | AND p.t <= s.t + 86400000
      |WHERE s.event_type = 'signup'
      |ORDER BY s.user_id, first_ms, ids""".stripMargin

  /** NON-GREEDY (reluctant) KLEENE contract (r14 second batch): `signup
    * click+` under the NO_SKIP all-matches surface — flink-cep's DEFAULT
    * oneOrMore emission, where every repetition count is its own match
    * (vs [[cepKleene]]'s single greedy-maximal match on the consumed-set
    * surface). With no consumption, every signup heads its full prefix
    * family: the k-th match takes the first k in-window clicks after the
    * head in (t, id) order.
    *
    * Oracle validity: repetitions extend deterministically (first
    * matching event per state), and every click matches the kleene stage,
    * so head h's k-th match consumes exactly the first k clicks in
    * (h, h+24h] — a plain windowed join with a cumulative string_agg
    * window frame replays the engine with no recursion. */
  def cepReluctant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern
      .begin("signup")((e: Event) => e.event_type == "signup")
      .followedBy("click")((e: Event) => e.event_type == "click")
      .oneOrMore
      .within(86400000L)
    val evs = events(s, dir)
      .where($"event_type".isin("signup", "click"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatchAll(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepReluctantSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type
      |  FROM events WHERE event_type IN ('signup','click')),
      |j AS (
      |  SELECT s.user_id, s.t AS h_t, s.event_id AS h_id,
      |    c.t AS c_t, c.event_id AS c_id
      |  FROM ev s JOIN ev c
      |    ON c.user_id = s.user_id AND c.event_type = 'click'
      |   AND (c.t > s.t OR (c.t = s.t AND c.event_id > s.event_id))
      |   AND c.t <= s.t + 86400000
      |  WHERE s.event_type = 'signup')
      |SELECT user_id, h_t AS first_ms, c_t AS last_ms,
      |  CAST(h_id AS VARCHAR) || '/' ||
      |    string_agg(CAST(c_id AS VARCHAR), '/')
      |      OVER (PARTITION BY user_id, h_id ORDER BY c_t, c_id
      |            ROWS UNBOUNDED PRECEDING) AS ids
      |FROM j
      |ORDER BY user_id, first_ms, ids""".stripMargin

  /** ALTERNATION MATCH_RECOGNIZE contract (r11): `signup (click|view)
    * purchase` — the SQL PATTERN `(A|B)` construct (flink-cep: a stage
    * with an OR'd simple condition), compiled from the string surface via
    * the `(a|b)` group grammar. The group desugars to ONE stage whose
    * predicate is the OR of the member DEFINEs, so matcher semantics
    * (greedy, no-reuse, relaxed contiguity) are untouched.
    *
    * Oracle validity: the monotone-picks exchange argument of
    * [[cepPatternSeq]] needs each stage's ACCEPTED SET to be disjoint
    * from every other stage's — it never needs one accepted TYPE per
    * stage. {click,view} ∩ {signup} = {click,view} ∩ {purchase} = ∅, so
    * the recursive CTE replays the engine with the middle pick's type
    * test widened to `IN ('click','view')` — the only change vs the
    * 3-stage sequence oracle. */
  def cepAlternation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern.matchRecognize("signup (click|view) purchase within 24h")(
      "signup"   -> ((e: Event) => e.event_type == "signup"),
      "click"    -> ((e: Event) => e.event_type == "click"),
      "view"     -> ((e: Event) => e.event_type == "view"),
      "purchase" -> ((e: Event) => e.event_type == "purchase"))
    val evs = events(s, dir)
      .where($"event_type".isin("signup", "click", "view", "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepAlternationSql: String =
    """WITH RECURSIVE ev AS MATERIALIZED (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type
      |  FROM events WHERE event_type IN ('signup','click','view','purchase')),
      |m AS (
      |  SELECT user_id, 0 AS match_no,
      |    CAST(-9223372036854775808 AS BIGINT) AS h_t, CAST(-1 AS BIGINT) AS h_id,
      |    CAST(-9223372036854775808 AS BIGINT) AS b_t, CAST(-1 AS BIGINT) AS b_id,
      |    CAST(-9223372036854775808 AS BIGINT) AS c_t, CAST(-1 AS BIGINT) AS c_id
      |  FROM (SELECT DISTINCT user_id FROM ev)
      |  UNION ALL
      |  SELECT nxt.user_id, m.match_no + 1,
      |    nxt.h_t, nxt.h_id, nxt.b_t, nxt.b_id, nxt.c_t, nxt.c_id
      |  FROM m, LATERAL (
      |    SELECT e1.user_id, e1.t AS h_t, e1.event_id AS h_id,
      |           b2.t AS b_t, b2.id AS b_id, c3.t AS c_t, c3.id AS c_id
      |    FROM ev e1,
      |      LATERAL (
      |        SELECT e2.t, e2.event_id AS id FROM ev e2
      |        WHERE e2.user_id = e1.user_id AND e2.event_type IN ('click','view')
      |          AND (e2.t > e1.t OR (e2.t = e1.t AND e2.event_id > e1.event_id))
      |          AND (e2.t > m.b_t OR (e2.t = m.b_t AND e2.event_id > m.b_id))
      |          AND e2.t <= e1.t + 86400000
      |        ORDER BY e2.t, e2.event_id LIMIT 1) b2,
      |      LATERAL (
      |        SELECT e3.t, e3.event_id AS id FROM ev e3
      |        WHERE e3.user_id = e1.user_id AND e3.event_type = 'purchase'
      |          AND (e3.t > b2.t OR (e3.t = b2.t AND e3.event_id > b2.id))
      |          AND (e3.t > m.c_t OR (e3.t = m.c_t AND e3.event_id > m.c_id))
      |          AND e3.t <= e1.t + 86400000
      |        ORDER BY e3.t, e3.event_id LIMIT 1) c3
      |    WHERE e1.user_id = m.user_id AND e1.event_type = 'signup'
      |      AND (e1.t > m.h_t OR (e1.t = m.h_t AND e1.event_id > m.h_id))
      |    ORDER BY e1.t, e1.event_id LIMIT 1) nxt)
      |SELECT user_id, h_t AS first_ms, c_t AS last_ms,
      |  CAST(h_id AS VARCHAR) || '/' || CAST(b_id AS VARCHAR) || '/'
      |    || CAST(c_id AS VARCHAR) AS ids
      |FROM m WHERE match_no >= 1
      |ORDER BY user_id, first_ms, ids""".stripMargin

  /** PERMUTE MATCH_RECOGNIZE contract (r11): SQL PATTERN
    * `PERMUTE(click, purchase)` within 24 h per user — one click and one
    * purchase in EITHER order, earliest-head greedy, no event reuse
    * (AFTER MATCH SKIP PAST LAST ROW), via [[graft.streaming.Pattern
    * .permute]]'s member-set semantics (for type-disjoint members this
    * coincides with the standard's orderings-alternation — each event can
    * extend a match exactly one way; deviation documented in
    * PatternMatcher.sealPermute).
    *
    * Oracle validity (monotone-picks, extended to mixed head types): the
    * engine consumes each member TYPE in strictly increasing (t, id)
    * order across a user's matches — a smaller unconsumed event of the
    * same type would have been picked earlier (as the earlier head's
    * partner, or as an earlier head) — and a failed head is dead forever
    * (partners must FOLLOW their head; every later head is later than the
    * failed one). So a recursive CTE carrying only (last head, last click
    * pick, last purchase pick) and jumping to the earliest head whose
    * complementary partner exists replays the engine exactly.
    * Cross-checked against the consumed-set reference on 3000 random
    * streams (PropertySpec) plus the incremental ≡ one-shot seal
    * property. */
  def cepPermute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{Event, Pattern}
    val pat = Pattern.permute(
      "click"    -> ((e: Event) => e.event_type == "click"),
      "purchase" -> ((e: Event) => e.event_type == "purchase"))
      .within(86400000L)
    val evs = events(s, dir)
      .where($"event_type".isin("click", "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    pat.matchBatch(evs)
      .map(m => (m.user_id, m.first_ms, m.last_ms, m.event_ids.mkString("/")))
      .toDF("user_id", "first_ms", "last_ms", "ids")
      .orderBy($"user_id", $"first_ms", $"ids")
  }

  val cepPermuteSql: String =
    """WITH RECURSIVE ev AS MATERIALIZED (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type
      |  FROM events WHERE event_type IN ('click','purchase')),
      |m AS (
      |  SELECT user_id, 0 AS match_no,
      |    CAST(-9223372036854775808 AS BIGINT) AS h_t, CAST(-1 AS BIGINT) AS h_id,
      |    CAST(-9223372036854775808 AS BIGINT) AS a_t, CAST(-1 AS BIGINT) AS a_id,
      |    CAST(-9223372036854775808 AS BIGINT) AS b_t, CAST(-1 AS BIGINT) AS b_id,
      |    CAST(-1 AS BIGINT) AS p_t, CAST(-1 AS BIGINT) AS p_id
      |  FROM (SELECT DISTINCT user_id FROM ev)
      |  UNION ALL
      |  SELECT nxt.user_id, m.match_no + 1,
      |    nxt.h_t, nxt.h_id,
      |    CASE WHEN nxt.h_type = 'click' THEN nxt.h_t ELSE nxt.p_t END,
      |    CASE WHEN nxt.h_type = 'click' THEN nxt.h_id ELSE nxt.p_id END,
      |    CASE WHEN nxt.h_type = 'click' THEN nxt.p_t ELSE nxt.h_t END,
      |    CASE WHEN nxt.h_type = 'click' THEN nxt.p_id ELSE nxt.h_id END,
      |    nxt.p_t, nxt.p_id
      |  FROM m, LATERAL (
      |    SELECT e1.user_id, e1.t AS h_t, e1.event_id AS h_id,
      |           e1.event_type AS h_type, p2.t AS p_t, p2.id AS p_id
      |    FROM ev e1,
      |      LATERAL (
      |        SELECT p.t, p.event_id AS id FROM ev p
      |        WHERE p.user_id = e1.user_id
      |          AND p.event_type = (CASE WHEN e1.event_type = 'click'
      |                                   THEN 'purchase' ELSE 'click' END)
      |          AND (p.t > e1.t OR (p.t = e1.t AND p.event_id > e1.event_id))
      |          AND (CASE WHEN p.event_type = 'click'
      |                THEN (p.t > m.a_t OR (p.t = m.a_t AND p.event_id > m.a_id))
      |                ELSE (p.t > m.b_t OR (p.t = m.b_t AND p.event_id > m.b_id)) END)
      |          AND p.t <= e1.t + 86400000
      |        ORDER BY p.t, p.event_id LIMIT 1) p2
      |    WHERE e1.user_id = m.user_id
      |      AND (e1.t > m.h_t OR (e1.t = m.h_t AND e1.event_id > m.h_id))
      |      AND (CASE WHEN e1.event_type = 'click'
      |            THEN (e1.t > m.a_t OR (e1.t = m.a_t AND e1.event_id > m.a_id))
      |            ELSE (e1.t > m.b_t OR (e1.t = m.b_t AND e1.event_id > m.b_id)) END)
      |    ORDER BY e1.t, e1.event_id LIMIT 1) nxt)
      |SELECT user_id, h_t AS first_ms, p_t AS last_ms,
      |  CAST(h_id AS VARCHAR) || '/' || CAST(p_id AS VARCHAR) AS ids
      |FROM m WHERE match_no >= 1
      |ORDER BY user_id, first_ms, ids""".stripMargin

  // ---------------------------------------------------------------- ACF
  /** Lag-k autocorrelation of the hourly event-count series (r12) — the
    * seasonality/self-similarity detector next to [[tsEwma]] (smoothing)
    * and q_ts_bollinger (envelope): acf(k) for k = 1..6 over the
    * zero-filled hourly census. The n²-scaled cross-multiplication keeps
    * the whole statistic EXACT until one final rounded division:
    * dev_t = n·x_t − Σx (so no rational mean ever exists), num(k) =
    * Σ dev_t·dev_{t+k}, den = Σ dev_t² — acf = num/den rounded 6
    * through identical double paths (R4). The quadratic terms are
    * DECIMAL(38,0) from CONSTRUCTION (r14, the q_stats_psi pattern):
    * den ≲ n³·max(x)² outgrows int64 past ~4,500 hourly buckets at 10⁴
    * events/hr, where ANSI Spark (the 4.x default) would ERROR and
    * non-ANSI would wrap silently — the decimal lift keeps the statistic
    * exact to ~10³⁸ instead. The emitted num_xn2/den_xn2 diagnostics
    * stay int64 (contract schema); past THEIR bound the final cast fails
    * loudly under ANSI while acf itself — computed from the wide
    * intermediates — stays correct (near-bound behavior planted in
    * DecimalBoundSpec via [[tsAcfFromHist]]).
    *
    * Scale: the series frame is the HOURLY HISTOGRAM — bounded by the
    * time span, not the row count (the q_stats_ks posture), zero-filled
    * via one sequence explode so gaps don't silently shift lags; all six
    * leads come from ONE window pass over that bounded frame; the event
    * scan is one map-side-combined hash agg. */
  def tsAcf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = events(s, dir)
      .select(expr("CAST(unix_timestamp(ts) div 3600 AS BIGINT)").as("h"))
      .groupBy($"h").agg(count(lit(1)).as("x"))
    tsAcfFromHist(s, hist)
      .select($"lag", $"num".cast(LongType).as("num_xn2"),
        $"den".cast(LongType).as("den_xn2"), $"acf")
      .orderBy($"lag")
  }

  /** [[tsAcf]] core over an (h, x) hourly histogram — the DECIMAL(38,0)
    * wide path, exposed (wide `num`/`den` uncast) so DecimalBoundSpec can
    * plant a near-int64-bound series and prove acf stays exact where the
    * old int64 arithmetic wrapped/errored. */
  private[graft] def tsAcfFromHist(s: SparkSession,
      hist: DataFrame): DataFrame = {
    import s.implicits._
    val full = hist.agg(min($"h").as("h0"), max($"h").as("h1"))
      .select(explode(sequence($"h0", $"h1")).as("h"))
      .join(hist, Seq("h"), "left")
      .select($"h", coalesce($"x", lit(0L)).as("x"))
    val wAll = Window.partitionBy()
    val w = Window.orderBy($"h")
    // dev lifts to DECIMAL(38,0) at construction: n·x is the first
    // product that can leave int64, so the lift happens BEFORE it forms.
    val withDev = full
      .withColumn("dev", count(lit(1)).over(wAll).cast("decimal(38,0)") * $"x"
        - sum($"x").over(wAll))
    val withLeads = (1 to 6).foldLeft(withDev) { (df, k) =>
      df.withColumn(s"dev_$k", lead($"dev", k).over(w)) }
    val agg = withLeads.agg(
      sum($"dev" * $"dev").as("den"),
      (1 to 6).map(k => sum($"dev" * col(s"dev_$k")).as(s"num_$k")): _*)
    agg.select($"den", explode(array((1 to 6).map(k =>
        struct(lit(k.toLong).as("lag"), col(s"num_$k").as("num"))): _*)).as("kv"))
      .select($"kv.lag".as("lag"),
        $"kv.num".cast("decimal(38,0)").as("num"),
        $"den".cast("decimal(38,0)").as("den"),
        round($"kv.num".cast("double") / $"den".cast("double"), 6).as("acf"))
  }

  val tsAcfSql: String = {
    val leadCols = (1 to 6).map(k =>
      s"LEAD(dev, $k) OVER (ORDER BY h) AS d$k").mkString(",\n      |    ")
    // HUGEINT twin of the Spark DECIMAL(38,0) wide path: the quadratic
    // sums stay int128 until the final BIGINT-cast diagnostics.
    val numCols = (1 to 6).map(k =>
      s"CAST(SUM(dev * d$k) AS HUGEINT) AS num_$k").mkString(",\n      |    ")
    val rows = (1 to 6).map(k => s"SELECT $k AS lag, num_$k AS num FROM a").mkString("\n      |  UNION ALL ")
    s"""WITH hist AS (
      |  SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h, COUNT(*) AS x
      |  FROM events GROUP BY 1),
      |b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hist),
      |f AS (
      |  SELECT gs.h, COALESCE(hist.x, 0) AS x
      |  FROM (SELECT UNNEST(generate_series(b.h0, b.h1)) AS h FROM b) gs
      |  LEFT JOIN hist ON gs.h = hist.h),
      |d AS (
      |  SELECT h, CAST(COUNT(*) OVER () * x - SUM(x) OVER () AS HUGEINT) AS dev
      |  FROM f),
      |l AS (
      |  SELECT dev,
      |    $leadCols
      |  FROM d),
      |a AS (
      |  SELECT CAST(SUM(dev * dev) AS HUGEINT) AS den,
      |    $numCols
      |  FROM l),
      |u AS ($rows)
      |SELECT CAST(u.lag AS BIGINT) AS lag, CAST(u.num AS BIGINT) AS num_xn2,
      |  CAST(a.den AS BIGINT) AS den_xn2,
      |  ROUND(CAST(u.num AS DOUBLE) / CAST(a.den AS DOUBLE), 6) AS acf
      |FROM u, a ORDER BY lag""".stripMargin
  }

  // ---------------------------------------------------------------- seasonal anomaly
  /** Seasonal anomaly census (r12) — the SEASONAL sibling of
    * q_anomaly_mad (global robust gate) and [[tsAcf]] (detects that
    * seasonality exists): each (day, hour-of-day) cell of the event
    * census scored against ITS OWN hour-of-day baseline across the
    * observed days, so a spike at 3am is judged against other 3ams, not
    * against noon. The grid is zero-filled (a silent outage IS the
    * anomaly the zero-filled cell catches).
    *
    * Exact integers end to end (R2): res_xn = n_days·x − Σ_days x(hd)
    * (the n-scaled residual, same trick as [[tsAcf]]); the gate is a
    * mean-absolute-deviation cross-multiply — flag ⇔ n_days·|res_xn| >
    * 3·Σ_days|res_xn| — so no rational mean or float threshold exists.
    * Output is the full scored grid (days×24 rows, bounded by the
    * calendar, not the row count), flag included, so the anomaly rate
    * itself is auditable.
    *
    * Scale: one scan → (day, hd) hash agg bounded by span×24; baseline
    * sums are windows over the per-hd slice of that bounded frame; the
    * zero-fill is one sequence explode. */
  def anomalySeasonal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = events(s, dir)
      .select(expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").as("day"),
        expr("CAST((unix_timestamp(ts) div 3600) % 24 AS BIGINT)").as("hd"))
      .groupBy($"day", $"hd").agg(count(lit(1)).as("x"))
    val grid = cells.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
      .crossJoin(s.range(0, 24).select($"id".as("hd")))
      .join(cells, Seq("day", "hd"), "left")
      .select($"day", $"hd", coalesce($"x", lit(0L)).as("x"))
    val wHd = Window.partitionBy($"hd")
    val scored = grid
      .withColumn("res_xn",
        count(lit(1)).over(wHd) * $"x" - sum($"x").over(wHd))
    scored
      .withColumn("sum_abs_xn", sum(abs($"res_xn")).over(wHd))
      .withColumn("flag",
        count(lit(1)).over(wHd) * abs($"res_xn") > lit(3L) * $"sum_abs_xn")
      .select($"day", $"hd", $"x", $"res_xn", $"sum_abs_xn", $"flag")
      .orderBy($"day", $"hd")
  }

  val anomalySeasonalSql: String =
    """WITH cells AS (
      |  SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) % 24 AS hd,
      |    COUNT(*) AS x
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM cells),
      |grid AS (
      |  SELECT ds.day, hs.hd, COALESCE(cells.x, 0) AS x
      |  FROM (SELECT UNNEST(generate_series(b.d0, b.d1)) AS day FROM b) ds
      |  CROSS JOIN (SELECT UNNEST(generate_series(0, 23)) AS hd) hs
      |  LEFT JOIN cells ON ds.day = cells.day AND hs.hd = cells.hd),
      |scored AS (
      |  SELECT day, hd, x,
      |    CAST(COUNT(*) OVER (PARTITION BY hd) * x
      |         - SUM(x) OVER (PARTITION BY hd) AS BIGINT) AS res_xn
      |  FROM grid)
      |SELECT day, hd, x, res_xn,
      |  CAST(SUM(ABS(res_xn)) OVER (PARTITION BY hd) AS BIGINT) AS sum_abs_xn,
      |  COUNT(*) OVER (PARTITION BY hd) * ABS(res_xn)
      |    > 3 * SUM(ABS(res_xn)) OVER (PARTITION BY hd) AS flag
      |FROM scored ORDER BY day, hd""".stripMargin

  // ---------------------------------------------------------------- fill forward
  /** Forward-fill / LOCF enrichment (r13) — the imputation primitive
    * (pandas `ffill`, Flink's keyed ValueState enrichment): every event
    * carries the user's last-observed purchase amount at that point in
    * the stream, NULL before the first purchase. The "attach the latest
    * known attribute" shape that q_cdc_scd2 answers with an interval
    * table and q_join_asof with a per-probe rank — here as one window
    * pass, the right plan when EVERY row needs the carried value.
    *
    * Row-level core shared with the streaming twin ([[tsFillForwardRows]]:
    * `last(pc, ignoreNulls)` over (t, event_id) rows-unbounded — exactly
    * a keyed ValueState replay, which is what s_ts_fill_forward runs);
    * the contract row aggregates it to a per-user census (events total,
    * cold-start rows before any observation, carried rows, exact cent
    * sum of the filled series) so the oracle frame stays user-sized.
    *
    * Determinism: cents are exact int64, (t, event_id) is a total order
    * (R1), and the census sums are order-free. Scale: ONE user_id
    * shuffle serves the fill window AND the census agg (same key);
    * per-user state in the window pass is one long — the streaming twin
    * holds the identical one-value state. */
  def tsFillForwardRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select($"user_id", epochS($"ts").as("t"), $"event_id",
      when($"event_type" === "purchase",
        floor($"value" * 100).cast(LongType)).as("pc"))
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn("filled_c", last($"pc", ignoreNulls = true).over(w))
  }

  def tsFillForward(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tsFillForwardRows(s, dir)
      .groupBy($"user_id").agg(
        count(lit(1)).as("n_events"),
        sum(when($"filled_c".isNull, 1L).otherwise(0L)).as("n_cold"),
        sum(when($"pc".isNull && $"filled_c".isNotNull, 1L).otherwise(0L))
          .as("n_carried"),
        sum(coalesce($"filled_c", lit(0L))).as("sum_filled_c"))
      .orderBy($"user_id")
  }

  val tsFillForwardSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, event_id,
      |    CASE WHEN event_type = 'purchase'
      |         THEN CAST(FLOOR(value * 100) AS BIGINT) END AS pc
      |  FROM events),
      |f AS (
      |  SELECT user_id, pc,
      |    last_value(pc IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY t, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_c
      |  FROM ev)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN filled_c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cold,
      |  CAST(SUM(CASE WHEN pc IS NULL AND filled_c IS NOT NULL THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_carried,
      |  CAST(SUM(COALESCE(filled_c, 0)) AS BIGINT) AS sum_filled_c
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- cusum
  /** One-sided CUSUM drift detector (r13) — the SEQUENTIAL member of the
    * anomaly family: q_anomaly_mad flags individual outlier VALUES,
    * q_anomaly_seasonal flags cells against a periodic baseline, CUSUM
    * flags a SUSTAINED LEVEL SHIFT — many small same-direction deviations
    * that no per-point gate sees (Page 1954, the change-point detector
    * every ingest-volume monitor runs). Per event_type over the
    * zero-filled daily census: S_d = max(0, S_{d-1} + (x_d − mean)),
    * alarm where S clears 4× the mean absolute deviation.
    *
    * The recurrence is NONLINEAR (the max-with-0 clamp), so it does not
    * window directly — but it has the exact closed form S_d = P_d −
    * min(0, min_{j≤d} P_j) for P = prefix sums of the deviations, which
    * turns the scan into two cumulative windows (sum, then min) over the
    * calendar grid. Both engines evaluate the identical closed form.
    *
    * Determinism: deviations are n-scaled (res_xn = x·N − T, the
    * [[tsAcf]]/[[anomalySeasonal]] trick), so prefixes, minima, and the
    * CUSUM are pure int64; the alarm gate cross-multiplies — N·S >
    * 4·Σ|res_xn| ⇔ S/N > 4·(Σ|res|/N)/N — no rational mean or float
    * threshold anywhere. Int64 bound (the [[tsAcf]] documentation
    * discipline): every intermediate is ≤ 2·N²·T for N grid days and T
    * per-type total events, safe while T < 2⁶²/N² — at a year's grid
    * (N=365) that is ~3·10¹³ events/type, comfortably past the 100 TB
    * daily-census regime; a decade-grid ultra-high-volume type should
    * pre-aggregate to weeks (N↓49) or lift to DECIMAL(38). Scale: one
    * scan → (type, day) hash agg bounded
    * by |types|·span; the spine explode and all four windows run over
    * that calendar-bounded frame, never event rows. */
  def anomalyCusum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // |types|·span rows, materialized once — three consumers (bounds,
    // type spine, left join) would each re-run the event scan otherwise
    // (the q_search_bm25 ReusedExchange lesson)
    val daily = graft.tables.Layout.materialize(events(s, dir)
      .select($"event_type", expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("x")))
    val grid = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
      .crossJoin(daily.select($"event_type").distinct())
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"x", lit(0L)).as("x"))
    val wT = Window.partitionBy($"event_type")
    val wCum = wT.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("res_xn", count(lit(1)).over(wT) * $"x" - sum($"x").over(wT))
      .withColumn("sum_abs_xn", sum(abs($"res_xn")).over(wT))
      .withColumn("nd", count(lit(1)).over(wT))
      .withColumn("pref", sum($"res_xn").over(wCum))
      .withColumn("cusum_xn", $"pref" - least(lit(0L), min($"pref").over(wCum)))
      .withColumn("alarm", $"nd" * $"cusum_xn" > lit(4L) * $"sum_abs_xn")
      .select($"event_type", $"day", $"x", $"res_xn", $"cusum_xn", $"alarm")
      .orderBy($"event_type", $"day")
  }

  val anomalyCusumSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |grid AS (
      |  SELECT t.event_type, ds.day, COALESCE(daily.x, 0) AS x
      |  FROM (SELECT DISTINCT event_type FROM daily) t
      |  CROSS JOIN (SELECT UNNEST(generate_series(b.d0, b.d1)) AS day FROM b) ds
      |  LEFT JOIN daily ON t.event_type = daily.event_type AND ds.day = daily.day),
      |scored AS (
      |  SELECT event_type, day, x,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) * x
      |         - SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS res_xn,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
      |  FROM grid),
      |pfx AS (
      |  SELECT event_type, day, x, res_xn, nd,
      |    CAST(SUM(ABS(res_xn)) OVER (PARTITION BY event_type) AS BIGINT) AS sum_abs_xn,
      |    CAST(SUM(res_xn) OVER (PARTITION BY event_type ORDER BY day
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pref
      |  FROM scored),
      |cus AS (
      |  SELECT event_type, day, x, res_xn, nd, sum_abs_xn,
      |    pref - LEAST(0, MIN(pref) OVER (PARTITION BY event_type ORDER BY day
      |                                    ROWS UNBOUNDED PRECEDING)) AS cusum_xn
      |  FROM pfx)
      |SELECT event_type, day, x, res_xn, CAST(cusum_xn AS BIGINT) AS cusum_xn,
      |  nd * cusum_xn > 4 * sum_abs_xn AS alarm
      |FROM cus ORDER BY event_type, day""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ts_fill_forward"   -> (tsFillForward _),
    "q_anomaly_cusum"     -> (anomalyCusum _),
    "q_anomaly_seasonal"  -> (anomalySeasonal _),
    "q_ts_acf"            -> (tsAcf _),
    "q_cep_permute"       -> (cepPermute _),
    "q_cep_alternation"   -> (cepAlternation _),
    "q_cep_quantified"    -> (cepQuantified _),
    "q_cep_kleene"        -> (cepKleene _),
    "q_cep_kleene_star"   -> (cepKleeneStar _),
    "q_cep_next"          -> (cepNext _),
    "q_cep_any"           -> (cepAny _),
    "q_cep_reluctant"     -> (cepReluctant _),
    "q_cep_guarded"       -> (cepGuarded _),
    "q_cep_match_recognize" -> (cepMatchRecognize _),
    "q_cumulate_window"   -> (cumulateWindow _),
    "q_cep_pattern_seq"   -> (cepPatternSeq _),
    "q_time_downsample"   -> (timeDownsample _),
    "q_ts_ewma"           -> (tsEwma _),
    "q_ts_bollinger"      -> (tsBollinger _),
    "q_win_streak"        -> (winStreak _),
    "q_cep_ascending"     -> (cepAscending _),
    "q_active_users"      -> (activeUsers _),
    "q_ts_similarity"     -> (tsSimilarity _),
    "q_gap_fill_daily"    -> (gapFillDaily _),
    "q_count_window"      -> (countWindow _),
    "q_cep_fail_burst"    -> (cepFailBurst _),
    "q_tumble_window"     -> (tumbleWindow _),
    "q_hop_window"        -> (hopWindow _),
    "q_session_window"    -> (sessionWindow _),
    "q_session_dynamic"   -> (sessionDynamic _),
    "q_dedup_keep_first"  -> (dedupKeepFirst _),
    "q_hot_items"         -> (hotItems _))

  def oracle: Map[String, String] = Map(
    "q_ts_fill_forward"  -> tsFillForwardSql,
    "q_anomaly_cusum"    -> anomalyCusumSql,
    "q_cep_permute"      -> cepPermuteSql,
    "q_cep_alternation"  -> cepAlternationSql,
    "q_cep_quantified"   -> cepQuantifiedSql,
    "q_cep_kleene"       -> cepKleeneSql,
    "q_cep_kleene_star"  -> cepKleeneStarSql,
    "q_cep_next"         -> cepNextSql,
    "q_cep_any"          -> cepAnySql,
    "q_cep_reluctant"    -> cepReluctantSql,
    "q_cep_guarded"      -> cepGuardedSql,
    "q_cep_match_recognize" -> cepGuardedSql,
    "q_cumulate_window"  -> cumulateWindowSql,
    "q_cep_pattern_seq"  -> cepPatternSeqSql,
    "q_time_downsample"  -> timeDownsampleSql,
    "q_ts_ewma"          -> tsEwmaSql,
    "q_ts_acf"           -> tsAcfSql,
    "q_anomaly_seasonal" -> anomalySeasonalSql,
    "q_ts_bollinger"     -> tsBollingerSql,
    "q_win_streak"       -> winStreakSql,
    "q_cep_ascending"    -> cepAscendingSql,
    "q_active_users"     -> activeUsersSql,
    "q_ts_similarity"    -> tsSimilaritySql,
    "q_gap_fill_daily"   -> gapFillDailySql,
    "q_count_window"     -> countWindowSql,
    "q_cep_fail_burst"   -> cepFailBurstSql,
    "q_tumble_window"    -> tumbleWindowSql,
    "q_hop_window"       -> hopWindowSql,
    "q_session_window"   -> sessionWindowSql,
    "q_session_dynamic"  -> sessionDynamicSql,
    "q_dedup_keep_first" -> dedupKeepFirstSql,
    "q_hot_items"        -> hotItemsSql)
}
