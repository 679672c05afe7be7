package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.tables.Tables._
import Util._

/** Training-data-curation operator extensions (round 2): PII masking,
  * deterministic sampling, skew-salted aggregation, distribution window
  * functions, exact closed-form correlation, n-gram frequency analysis,
  * and a bounded top-k aggregate. Each row is declared in SURVEY.md §2.9's
  * extension table with the same key/oracle mechanics as round 1.
  *
  * Scale posture: everything here is a single declarative plan (scan →
  * narrow transforms → hash agg / window), no driver collects; the salted
  * aggregate and the top-k Aggregator exist precisely because their naive
  * forms (hot-key groupBy, window-rank full sort) are the two classic
  * 100 TB bottlenecks.
  */
object Curation {

  // ---------------------------------------------------------------- skew diagnose
  /** Join-key skew profiler (r9) — the measurement that DECIDES between the
    * plans this engine already carries: q_join_salted / q_agg_salted exist
    * for hot keys, AQE's skew-join split for runtime surprises, and plain
    * hash partitioning for uniform keys; this report says which applies,
    * per key. For the events fact's user_id: the top-20 heaviest keys with
    * their exact row count, corpus share (ppm), multiple of the mean key
    * size (×100), and a `hot` verdict at ≥2× mean — the table an operator
    * reads before picking a salt factor (a key at 50× mean needs ~50
    * salts; a top key at 1.2× mean needs none).
    *
    * Determinism: all columns are exact integer arithmetic — shares use
    * integral `div`, never float division (R2); ties in the top-20 cut
    * break on user_id. Scale: ONE map-side-partial hash agg over the fact
    * table; the totals are a one-row broadcast (never a window over raw
    * rows); top-20 via TakeOrderedAndProject. The report costs a fraction
    * of any join it tunes. */
  def skewDiagnose(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perKey = events(s, dir).groupBy($"user_id").agg(count(lit(1)).as("cnt"))
    skewDiagnoseFromCounts(s, perKey)
  }

  /** [[skewDiagnose]] core over a (user_id, cnt) frame — exposed for
    * DecimalBoundSpec's past-int64 plant. r16, the int64-audit
    * follow-through: the r9 form's int64 cross-products wrap silently at
    * fact scales this profiler exists FOR — cnt·10⁶ past ~9·10¹² rows on
    * one key, and cnt·100·n_keys past ~10¹⁹ (a 10⁸-row hot key in a
    * 10⁹-key fact — exactly the skew the report should flag loudest).
    * Both products lift to DECIMAL(38,0) before they form; the integral
    * `div` quotients are int64-safe by construction (share_ppm ≤ 10⁶,
    * vs_mean_x100 ≤ 100·n_keys since cnt ≤ total). */
  private[graft] def skewDiagnoseFromCounts(s: SparkSession, perKey: DataFrame): DataFrame = {
    import s.implicits._
    val totals = perKey.agg(
      sum($"cnt").as("total"), count(lit(1)).as("n_keys"))
    perKey.crossJoin(broadcast(totals))
      .select($"user_id", $"cnt",
        expr("CAST(cnt AS DECIMAL(38,0)) * 1000000 div total").as("share_ppm"),
        expr("CAST(cnt AS DECIMAL(38,0)) * 100 * n_keys div total").as("vs_mean_x100"))
      .withColumn("hot", $"vs_mean_x100" >= 200L)
      .orderBy($"cnt".desc, $"user_id")
      .limit(20)
  }

  val skewDiagnoseSql: String =
    """WITH k AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_keys FROM k)
      |SELECT user_id, cnt,
      |  (cnt * 1000000) // total AS share_ppm,
      |  (cnt * 100 * n_keys) // total AS vs_mean_x100,
      |  (cnt * 100 * n_keys) // total >= 200 AS hot
      |FROM k CROSS JOIN tot
      |ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- pii mask
  /** PII-style redaction: digit runs (≥3) in customer names → '<ID>'.
    * Regex replacement is global in both engines (Spark by default, DuckDB
    * via the 'g' flag — the oracle must say so explicitly). */
  def piiMask(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .select(
        $"c_custkey",
        regexp_replace($"c_name", "[0-9]{3,}", "<ID>").as("name_masked"),
        length($"c_name").cast(LongType).as("len_orig"),
        length(regexp_replace($"c_name", "[0-9]{3,}", "<ID>")).cast(LongType)
          .as("len_masked"))
      .orderBy($"c_custkey")
  }

  val piiMaskSql: String =
    """SELECT c_custkey,
      |  regexp_replace(c_name, '[0-9]{3,}', '<ID>', 'g') AS name_masked,
      |  CAST(LENGTH(c_name) AS BIGINT) AS len_orig,
      |  CAST(LENGTH(regexp_replace(c_name, '[0-9]{3,}', '<ID>', 'g')) AS BIGINT) AS len_masked
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- sampling
  /** Deterministic 1/16 corpus sample: keep docs whose content-md5 starts
    * with hex '0'. Content-hash sampling (vs rand()) is reproducible across
    * runs, engines, and partitionings — the only sampling a training-data
    * pipeline should use for held-out splits. md5 is bit-identical in both
    * engines, so this is fully oracle-checkable. */
  def sampleHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .where(substring(md5($"text".cast("binary")), 1, 1) === "0")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  val sampleHashSql: String =
    """SELECT doc_id, lang, source, n_chars
      |FROM documents
      |WHERE substring(md5(text), 1, 1) = '0'
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- weighted sample
  /** Deterministic IMPORTANCE sampling: keep each doc with probability
    * proportional to its length (the "sample long documents more" mixing
    * rule), using a content-hash uniform draw — u = first 24 md5 bits /
    * 2²⁴ — instead of rand(), so the sample is reproducible across runs,
    * engines, and partitionings (same contract as q_sample_hash, which is
    * the UNIFORM twin). The normalizing max(n_chars) is a one-row
    * aggregate broadcast to the filter — the only global state, O(1) at
    * any corpus size. u and the threshold are computed from exact
    * integers via identical operand paths in both engines, so the float
    * comparison is bit-identical. */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mx = documents(s, dir).agg(max($"n_chars").cast("double").as("mx"))
    documents(s, dir)
      .crossJoin(broadcast(mx))
      .withColumn("u",
        conv(substring(md5($"text".cast("binary")), 1, 6), 16, 10).cast(LongType)
          / lit(16777216.0))
      .where($"u" < $"n_chars" / $"mx")
      .select($"doc_id", $"lang", $"n_chars", round($"n_chars" / $"mx", 6).as("p"))
      .orderBy($"doc_id")
  }

  val sampleWeightedSql: String =
    """WITH mx AS (SELECT CAST(MAX(n_chars) AS DOUBLE) AS mx FROM documents)
      |SELECT doc_id, lang, n_chars, ROUND(n_chars / mx, 6) AS p
      |FROM documents, mx
      |WHERE CAST(('0x' || substring(md5(text), 1, 6)) AS BIGINT) / 16777216.0
      |      < n_chars / mx
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ratio split
  /** Deterministic train/val/test split, 90/5/5 by content hash — the
    * ratio-based sibling of [[sampleHash]] (membership twin) and
    * [[sampleWeighted]] (importance twin): each doc's 24-bit md5 prefix is
    * a uniform draw u ∈ [0, 2²⁴), and the split is the interval u falls in.
    * Content-hash assignment is reproducible across runs, engines, and
    * partitionings, and stable under corpus append (a doc's split never
    * changes when other docs arrive) — the properties a held-out split
    * must have or eval contaminates train on the next ingest. The
    * interval test is pure integer arithmetic (h·20 < 18·2²⁴ ⇔ h/2²⁴ <
    * 0.90 exactly), so no float boundary can disagree between engines.
    * Hash uniformity is lang-independent, so each lang splits ~90/5/5
    * without stratified bookkeeping; the emitted per-(lang, split) counts
    * are the audit a pipeline runs to confirm that. One map-side-combined
    * aggregation over the corpus — nothing here is harder at 100 TB. */
  def sampleSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = conv(substring(md5($"text".cast("binary")), 1, 6), 16, 10).cast(LongType)
    documents(s, dir)
      .select($"lang", $"n_chars",
        when(h * 20L < lit(18L * 16777216L), "train")
          .when(h * 20L < lit(19L * 16777216L), "val")
          .otherwise("test").as("split"))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
      .orderBy($"lang", $"split")
  }

  val sampleSplitSql: String =
    """WITH d AS (
      |  SELECT lang, n_chars,
      |    CAST(('0x' || substring(md5(text), 1, 6)) AS BIGINT) AS h
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN h * 20 < 18 * 16777216 THEN 'train'
      |       WHEN h * 20 < 19 * 16777216 THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |FROM d
      |GROUP BY lang, split
      |ORDER BY lang, split""".stripMargin

  // ---------------------------------------------------------------- salted agg
  /** Skew-safe aggregation as a contract query: two-phase salted sum over
    * lineitem (the hot-key pattern from tables.Layout) must equal the
    * direct GROUP BY — exactly, because the value is summed as DECIMAL
    * (addition-order-free), so the salt layout cannot perturb the result. */
  def aggSalted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = lineitem(s, dir).select(
      $"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
      dec2($"l_extendedprice").as("v"))
    graft.tables.Layout.saltedSum(base, "l_returnflag", "v", salts = 8)
      .select($"l_returnflag", $"sum_v".cast("double").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  val aggSaltedSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- cume dist
  /** Distribution window functions: percent_rank + cume_dist of each order
    * within its customer, ordered by (totalprice, orderkey). Both are
    * small-integer ratios ((rank−1)/(n−1), rank/n) — IEEE division of
    * identical integers is bit-identical across engines. */
  def winCumeDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
    orders(s, dir)
      .select($"o_orderkey", $"o_custkey",
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy($"o_orderkey")
  }

  val winCumeDistSql: String =
    """SELECT o_orderkey, o_custkey,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- corr
  /** Exact Pearson correlation of (quantity, discount) per returnflag via
    * the closed form over exact DECIMAL power sums — NOT the built-in
    * corr() (whose streaming covariance accumulates doubles in shuffle
    * order, unstable across engines/partitionings). All five sums are
    * exact decimals small enough to cast to double losslessly (< 2⁵³ as
    * scaled ints), so the final double formula sees bit-identical operands
    * on both sides. */
  def statsCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = dec2($"l_quantity")
    val y = rate2($"l_discount")
    val agg = lineitem(s, dir).groupBy($"l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(x).cast("double").as("sx"),
      sum(y).cast("double").as("sy"),
      sum(x * y).cast("double").as("sxy"),
      sum(x * x).cast("double").as("sxx"),
      sum(y * y).cast("double").as("syy"))
    agg.select($"l_returnflag", $"n",
      round(
        ($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") * sqrt($"n" * $"syy" - $"sy" * $"sy")),
        6).as("corr_qd"))
      .orderBy($"l_returnflag")
  }

  val statsCorrSql: String =
    """WITH a AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ROUND((n * sxy - sx * sy) /
      |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qd
      |FROM a
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- ngram freq
  /** Top-5 token bigrams per language — corpus n-gram frequency analysis.
    * Bigrams are formed ROW-LOCALLY with `explode(arrays_zip(slice, slice))`
    * — the same shape as LlmText.shinglesOf — so the token stream is never
    * shuffled: a posexplode + lead() window would sort the ENTIRE corpus
    * token stream by doc_id before aggregating, an O(corpus-tokens) exchange
    * that dies at 100 TB. Here the only shuffle is the (lang, bigram) count
    * aggregate, with map-side partials. Rank ties broken by bigram text for
    * an R1 total order. */
  def ngramFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigrams = documents(s, dir)
      .select($"lang", split(trim($"text"), " ").as("tk"))
      .withColumn("nt", size($"tk"))
      .where($"nt" >= 2)
      .select($"lang", explode(arrays_zip(
        slice($"tk", lit(1), $"nt" - 1),
        slice($"tk", lit(2), $"nt" - 1))).as("z"))
      .select($"lang", concat_ws(" ", $"z.0", $"z.1").as("bigram"))
    val counts = bigrams.groupBy($"lang", $"bigram").agg(count(lit(1)).as("n"))
    val wRank = Window.partitionBy($"lang").orderBy($"n".desc, $"bigram")
    counts.withColumn("rk", row_number().over(wRank))
      .where($"rk" <= 5)
      .select($"lang", $"rk".cast(LongType).as("rk"), $"bigram", $"n")
      .orderBy($"lang", $"rk")
  }

  val ngramFreqSql: String =
    """WITH tk AS (
      |  SELECT doc_id, lang, string_split(trim(text), ' ') AS t FROM documents),
      |bg AS (
      |  SELECT lang,
      |    unnest(list_transform(generate_series(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1])) AS bigram
      |  FROM tk),
      |c AS (
      |  SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram),
      |r AS (
      |  SELECT lang, bigram, n,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
      |  FROM c)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, bigram, n
      |FROM r WHERE rk <= 5
      |ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------- topk agg
  /** Exact per-customer top-3 orders via the bounded TopKKeys Aggregator
    * (O(k) state per group; see graft.functions.TopKAgg for why this beats
    * window-rank at scale). Oracle = DuckDB's ordered list aggregate,
    * sliced to 3. */
  def topkAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top3 = udaf(new graft.functions.TopKKeys(3))
    orders(s, dir)
      .groupBy($"o_custkey")
      .agg(top3($"o_totalprice", $"o_orderkey").as("top_orders"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_custkey")
  }

  val topkAggSql: String =
    """SELECT o_custkey,
      |  array_to_string(list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey)[1:3], '/') AS top_orders,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- range frame
  /** Trailing-7-day windowed sum per customer over pre-aggregated daily
    * totals — a RANGE frame (value-based: includes ALL rows within the
    * day-distance, regardless of row count), which is semantically distinct
    * from the ROWS frames in q_win_ntile_frame. Day is an epoch-day long
    * (rule R3), the total an exact decimal (R2). */
  def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = orders(s, dir)
      .groupBy($"o_custkey", epochDay($"o_orderdate").as("day"))
      .agg(sum(dec2($"o_totalprice")).as("tot"))
    val w = Window.partitionBy($"o_custkey").orderBy($"day").rangeBetween(-6, 0)
    daily
      .select($"o_custkey", $"day",
        sum($"tot").over(w).cast("double").as("trail7"))
      .orderBy($"o_custkey", $"day")
  }

  val winRangeFrameSql: String =
    """WITH d AS (
      |  SELECT o_custkey, CAST(FLOOR(epoch(o_orderdate)/86400) AS BIGINT) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS tot
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_custkey, day,
      |  CAST(SUM(tot) OVER (PARTITION BY o_custkey ORDER BY day
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail7
      |FROM d
      |ORDER BY o_custkey, day""".stripMargin

  // ---------------------------------------------------------------- unpivot
  /** Unpivot (melt): wide → long, the inverse of q_pivot. Both numeric
    * columns are pre-cast to a common double type (unpivot requires it;
    * the values are exact small ints / 2dp, so the cast is lossless). */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .select($"event_id", $"value".cast("double").as("value"),
        $"user_id".cast("double").as("user_d"))
      .unpivot(Array($"event_id"), Array($"value", $"user_d"), "metric", "val")
      .orderBy($"event_id", $"metric")
  }

  val unpivotMetricsSql: String =
    """SELECT event_id, metric, val FROM (
      |  SELECT event_id, CAST(value AS DOUBLE) AS value,
      |    CAST(user_id AS DOUBLE) AS user_d
      |  FROM events
      |) UNPIVOT (val FOR metric IN (value, user_d))
      |ORDER BY event_id, metric""".stripMargin

  // ---------------------------------------------------------------- quantize
  /** Int8-style embedding quantization — per-vector min/max affine scale to
    * [0,255], the storage-compression step of an embedding pipeline. Bucket
    * assignment uses floor (tie-free, unlike round-half conventions that
    * differ per engine); min/max are order-independent reductions emitted
    * UNROUNDED — float→double widening is exact and bit-identical in both
    * engines, whereas round(double, n) conventions differ — and the
    * checksum is an integer sum (exact in any order). The full quantized
    * vector is checksummed rather than emitted (array cells break the
    * driver comparator). The oracle's sum is CAST to BIGINT: DuckDB's
    * list_aggregate 'sum' over BIGINT[] returns HUGEINT, which pandas-side
    * fetches render as float64 ("16320.0" vs Spark's int64 "16320") — a
    * type-level hash mismatch invisible to value-equality checks; this was
    * the sole cross-engine divergence in a full result-type audit. */
  def embedQuantize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = $"embedding".cast("array<double>")
    val mn = array_min(e)
    val mx = array_max(e)
    val scale = (mx - mn) / lit(255.0)
    embeddings(s, dir)
      .select(
        $"vec_id",
        mn.as("mn"),
        mx.as("mx"),
        when(mx > mn,
          aggregate(
            transform(e, x => least(floor((x - mn) / scale), lit(255.0)).cast(LongType)),
            lit(0L), (acc, q) => acc + q))
          .otherwise(lit(0L)).as("qsum"))
      .orderBy($"vec_id")
  }

  val embedQuantizeSql: String =
    """SELECT vec_id,
      |  list_min(CAST(embedding AS DOUBLE[])) AS mn,
      |  list_max(CAST(embedding AS DOUBLE[])) AS mx,
      |  CAST(CASE WHEN list_max(CAST(embedding AS DOUBLE[])) > list_min(CAST(embedding AS DOUBLE[]))
      |    THEN list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(LEAST(floor((x - list_min(CAST(embedding AS DOUBLE[]))) /
      |        ((list_max(CAST(embedding AS DOUBLE[])) - list_min(CAST(embedding AS DOUBLE[]))) / 255.0)), 255) AS BIGINT)), 'sum')
      |    ELSE 0 END AS BIGINT) AS qsum
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- mode
  /** Statistical mode per group: the most frequent order priority per
    * status (ties broken by priority text — R1). Expressed as count + rank
    * rather than any built-in mode() so both engines resolve ties
    * identically. */
  def aggMode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = orders(s, dir)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"o_orderstatus").orderBy($"n".desc, $"o_orderpriority")
    counts.withColumn("rk", row_number().over(w))
      .where($"rk" === 1)
      .select($"o_orderstatus", $"o_orderpriority".as("mode_priority"), $"n")
      .orderBy($"o_orderstatus")
  }

  val aggModeSql: String =
    """WITH c AS (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |r AS (
      |  SELECT o_orderstatus, o_orderpriority, n,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY n DESC, o_orderpriority) AS rk
      |  FROM c)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority, n
      |FROM r WHERE rk = 1
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- regex extract
  /** Structured extraction via regex capture groups — pulling typed fields
    * out of semi-structured text, a staple of log/corpus normalization.
    * Group 1 = the word stem, group 2 = the numeric id (cast BIGINT on
    * both sides). */
  def regexExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .select(
        $"c_custkey",
        regexp_extract($"c_name", "([A-Za-z]+)#([0-9]+)", 1).as("name_part"),
        regexp_extract($"c_name", "([A-Za-z]+)#([0-9]+)", 2).cast(LongType).as("id_part"))
      .orderBy($"c_custkey")
  }

  val regexExtractSql: String =
    """SELECT c_custkey,
      |  regexp_extract(c_name, '([A-Za-z]+)#([0-9]+)', 1) AS name_part,
      |  CAST(regexp_extract(c_name, '([A-Za-z]+)#([0-9]+)', 2) AS BIGINT) AS id_part
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- approx quantile
  /** Sketch-based quantiles (Greenwald-Khanna via percentile_approx) per
    * returnflag — rows-only like q_agg_approx_distinct: the sketch's merge
    * result is engine-specific, so there is no cross-engine oracle; the
    * unit layer bounds it against the exact window-position percentile
    * instead. Deterministic for the driver's repeat-run check because the
    * same data + same partitioning merge the same summaries. */
  def aggApproxQuantile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("p50"),
        percentile_approx($"l_extendedprice", lit(0.95), lit(1000)).as("p95"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  // ---------------------------------------------------------------- quantile sketch
  /** Mergeable KLL-style quantile sketch as a typed Aggregator (see
    * graft.functions.QuantileSketch for the algorithm and determinism
    * notes) — the first-class replacement for [[aggApproxQuantile]]'s
    * engine-opaque GK summary: partial sketches build map-side, merge
    * associatively across partitions/days, and only sketch-sized state
    * ever moves or lives on the driver. `oracle: no` like every sketch
    * (merge-order wiggle within the rank-ε bound); QuantileSketchSpec
    * bounds every estimate's true rank within ε=0.05 of its target and
    * asserts exactness for below-capacity groups; PlanSpec asserts the
    * map-side partial_quantilesketch. */
  def quantileSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sk = udaf(new graft.functions.QuantileSketch(128))
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(sk($"l_extendedprice").as("q"), count(lit(1)).as("n"))
      .select($"l_returnflag", $"q.p50".as("p50"), $"q.p90".as("p90"),
        $"q.p99".as("p99"), $"n")
      .orderBy($"l_returnflag")
  }

  // ---------------------------------------------------------------- heavy hitters
  /** Mergeable Misra-Gries heavy-hitters per language over whitespace
    * tokens (see graft.functions.HeavyHitters for the algorithm and the
    * n/(k+1) error envelope) — the frequent-items member of the sketch
    * family (HLL/Bloom/KLL/MG), and the bounded-state alternative to the
    * exact q_ngram_freq count-then-rank when the vocabulary itself is too
    * large to aggregate exactly: state is ≤ k counters per group however
    * many distinct tokens flow by. `oracle: no` (counter set is
    * merge-tree-dependent within the envelope); HeavyHittersSpec asserts
    * the presence + estimate guarantees against exact counts and PlanSpec
    * the map-side partials. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hh = udaf(new graft.functions.HeavyHitters(32, 5))
    documents(s, dir)
      .select($"lang", explode(split(trim($"text"), " ")).as("tok"))
      .groupBy($"lang")
      .agg(hh($"tok").as("top_tokens"), count(lit(1)).as("n_tokens"))
      .orderBy($"lang")
  }

  // ---------------------------------------------------------------- c4 gate
  /** C4-style quality rule battery (r11) — the second classic rule set
    * next to [[qualityGopher]]'s Gopher battery, re-parameterized to rules
    * that genuinely fire on this corpus (the C4 paper's literal rules —
    * terminal punctuation, curly braces, "javascript"/"lorem ipsum" — are
    * constant on punctuation-free synthetic text and would gate nothing):
    * ≥3 twelve-word sentence-proxies (n ≥ 36, C4's ≥3-sentence rule); no
    * in-doc duplicate word trigram (C4's repeated-span dedup at trigram
    * granularity, row-local); filler-token density 'a' ≤ 5% (boilerplate
    * density rule); absolute vocabulary ≥ 20 distinct words. Measured
    * firing rates at sf0.01: 357/473/400/376 of 500 pass per rule, 270
    * admitted — every rule decides real rows.
    *
    * Determinism: rules compare exact integers (density cross-multiplied:
    * n_a·20 ≤ n), trigram strings are exact joins of exact tokens (R1).
    * Scale: map-only over the scan — the trigram array is row-local
    * (bounded by doc length), no shuffle below the output sort, no UDF. */
  def qualityC4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Three-stage projection so each expensive array is built ONCE per row
    // (r16): with `split(trim(text))` inlined everywhere, the row paid ~6
    // splits (one per consuming column) plus — the quadratic part — 3
    // element_at(tk,·) re-splits PER TRIGRAM inside the interpreted
    // transform lambda (array HOFs have no doGenCode; an interpreted
    // lambda re-evaluates its whole body per element). Now: stage 1
    // tokenizes once; stage 2 windows over the tk ATTRIBUTE (per-trigram
    // work = 3 array reads) and folds each scalar once; stage 3 compares
    // integers. CollapseProject cannot re-inline either array — tk and
    // tris are each consumed ≥2× and non-cheap. Same columns, same values.
    val tk = $"tk"
    val n = size(tk).cast(LongType)
    val nA = size(filter(tk, x => x === "a")).cast(LongType)
    val nu = size(array_distinct(tk)).cast(LongType)
    val tris = when(n >= 3L,
      transform(sequence(lit(1), (n - 2L).cast("int")),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2))))
      .otherwise(array().cast("array<string>"))
    val nTri = size($"tris").cast(LongType)
    val uTri = size(array_distinct($"tris")).cast(LongType)
    val okSpan = $"n_words" >= 36L
    val okTri = $"dup_trigrams" === 0L
    val okFiller = $"n_filler" * 20L <= $"n_words"
    val okVocab = $"n_vocab" >= 20L
    documents(s, dir)
      .select($"doc_id", split(trim($"text"), " ").as("tk"))
      .select($"doc_id", n.as("n_words"), tris.as("tris"),
        nA.as("n_filler"), nu.as("n_vocab"))
      .select($"doc_id", $"n_words", (nTri - uTri).as("dup_trigrams"),
        $"n_filler", $"n_vocab")
      .select(
        $"doc_id", $"n_words", $"dup_trigrams",
        $"n_filler", $"n_vocab",
        okSpan.as("ok_span"), okTri.as("ok_trigram"),
        okFiller.as("ok_filler"), okVocab.as("ok_vocab"),
        (okSpan && okTri && okFiller && okVocab).as("keep"))
      .orderBy($"doc_id")
  }

  val qualityC4Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(tk) AS BIGINT) AS n,
      |    CAST(len(list_filter(tk, w -> w = 'a')) AS BIGINT) AS n_a,
      |    CAST(len(list_distinct(tk)) AS BIGINT) AS nu,
      |    list_transform(range(1, len(tk) - 1),
      |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS tris
      |  FROM t),
      |r AS (
      |  SELECT doc_id, n, n_a, nu,
      |    CAST(len(tris) AS BIGINT) AS n_tri,
      |    CAST(len(list_distinct(tris)) AS BIGINT) AS u_tri
      |  FROM m)
      |SELECT doc_id, n AS n_words, n_tri - u_tri AS dup_trigrams,
      |  n_a AS n_filler, nu AS n_vocab,
      |  (n >= 36) AS ok_span, (u_tri = n_tri) AS ok_trigram,
      |  (n_a * 20 <= n) AS ok_filler, (nu >= 20) AS ok_vocab,
      |  ((n >= 36) AND (u_tri = n_tri) AND (n_a * 20 <= n) AND (nu >= 20)) AS keep
      |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- entropy
  /** Per-language token Shannon entropy (r11) — the corpus-diversity
    * scalar next to q_text_perplexity's per-doc fluency: H = −Σ p·ln p
    * over the language's unigram distribution, with n_tokens and vocab.
    * Low entropy per source/language = template/boilerplate collapse; the
    * number a mixing pipeline tracks per shard before weighting.
    *
    * Determinism (the perplexityModel discipline): p = cf/tot is one
    * correctly-rounded IEEE division of exact int64s; ln is the SINGLE
    * transcendental, immediately floor(·1e6)-quantized to int64; the
    * entropy sum Σ cf·lq is then EXACT integer arithmetic (|Σ| ≤
    * tot·14e6 ≪ 2^63), so shuffle order cannot move the result. h_nats
    * divides the exact sum back out with one division per group (R4
    * rounding at the boundary only). Scale: one token pass (map-side
    * partial counts), per-lang totals via a window over the VOCAB frame
    * (|langs|·|vocab| rows, never raw tokens), final agg on ≤|langs|
    * groups. */
  def statsEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wl = Window.partitionBy($"lang")
    documents(s, dir)
      .select($"lang", explode(split(trim($"text"), " ")).as("w"))
      .where(length($"w") > 0)
      .groupBy($"lang", $"w").agg(count(lit(1)).as("cf"))
      .withColumn("tot", sum($"cf").over(wl))
      .withColumn("lq",
        floor(log($"cf".cast("double") / $"tot".cast("double")) * 1000000.0).cast(LongType))
      .groupBy($"lang")
      .agg(max($"tot").as("n_tokens"), count(lit(1)).as("vocab"),
        (lit(0L) - sum($"cf" * $"lq")).as("h_q"))
      .select($"lang", $"n_tokens".cast(LongType).as("n_tokens"), $"vocab", $"h_q",
        round($"h_q".cast("double") / $"n_tokens" / 1000000.0, 4).as("h_nats"))
      .orderBy($"lang")
  }

  val statsEntropySql: String =
    """WITH w AS (
      |  SELECT lang, unnest(string_split(trim(text), ' ')) AS w FROM documents),
      |t AS (SELECT lang, w FROM w WHERE length(w) > 0),
      |cf AS (SELECT lang, w, COUNT(*) AS cf FROM t GROUP BY lang, w),
      |m AS (SELECT lang, cf, CAST(SUM(cf) OVER (PARTITION BY lang) AS BIGINT) AS tot FROM cf),
      |q AS (
      |  SELECT lang, cf, tot,
      |    CAST(FLOOR(ln(CAST(cf AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000.0) AS BIGINT) AS lq
      |  FROM m)
      |SELECT lang, MAX(tot) AS n_tokens, COUNT(*) AS vocab,
      |  0 - CAST(SUM(cf * lq) AS BIGINT) AS h_q,
      |  ROUND((0 - CAST(SUM(cf * lq) AS DOUBLE)) / MAX(tot) / 1000000.0, 4) AS h_nats
      |FROM q GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- reservoir
  /** Stratified priority-sampling reservoir (r11) — weighted top-k
    * sampling without order statistics on floats: Duffield–Lund–Thorup
    * priority sampling with priority = w/u for u uniform in (0,1],
    * keeping the k=100 highest priorities per language. The third member
    * of the sampling family: q_sample_hash (uniform membership),
    * q_sample_weighted (Bernoulli importance), this (FIXED-SIZE weighted
    * without replacement — the shard-budget shape: "100 docs per
    * language, long docs favored, reproducible").
    *
    * Determinism: u is the 24-bit md5 content prefix + 1 (content-keyed,
    * layout/engine-independent — the q_sample_hash contract), and the
    * priority is computed as EXACT integer division (w·10^12 div u, max
    * ~5.5e14 ≪ 2^63) — no float priority, no transcendental, so the
    * ranking and the cut are bit-identical in any engine. Ties broken by
    * doc_id. Scale: the rank ≤ 100 filter plans as WindowGroupLimit —
    * each input partition forwards at most 100 rows per language to the
    * shuffle, so the reservoir never materializes a stratum. */
  def sampleReservoir(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"prio".desc, $"doc_id")
    documents(s, dir)
      .withColumn("u",
        conv(substring(md5($"text".cast("binary")), 1, 6), 16, 10).cast(LongType) + 1L)
      .withColumn("prio", expr("(n_chars * 1000000000000L) div u"))
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= 100)
      .select($"lang", $"rk", $"doc_id", $"n_chars", $"prio")
      .orderBy($"lang", $"rk")
  }

  val sampleReservoirSql: String =
    """WITH s AS (
      |  SELECT lang, doc_id, n_chars,
      |    CAST(('0x' || substring(md5(text), 1, 6)) AS BIGINT) + 1 AS u
      |  FROM documents),
      |p AS (
      |  SELECT lang, doc_id, n_chars,
      |    (n_chars * 1000000000000) // u AS prio
      |  FROM s),
      |r AS (
      |  SELECT lang, doc_id, n_chars, prio,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY prio DESC, doc_id) AS rk
      |  FROM p)
      |SELECT lang, rk, doc_id, n_chars, CAST(prio AS BIGINT) AS prio
      |FROM r WHERE rk <= 100
      |ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------- KS drift
  /** Two-sample Kolmogorov–Smirnov drift statistic (r11) — the NUMERIC
    * sibling of q_corpus_drift's token-distribution monitor: how far the
    * event-value distribution moved between the older and newer ingest
    * half (event_id cut, the same append-only proxy), as the max ECDF
    * gap. The one-number answer to "did the value distribution shift?"
    * a pipeline checks before mixing snapshots.
    *
    * Binned KS: values bucket at integer floor (≤ ~500 buckets on this
    * data — the ECDF is evaluated at bucket edges, a standard binned KS;
    * the bound is the VALUE RANGE, not the row count, the q_median
    * histogram-trick posture). Determinism: the statistic's core is
    * EXACT integer arithmetic — gap(b) = |cumA(b)·nB − cumB(b)·nA| on
    * int64 (cross-multiplied, no float ECDFs), argmax ties break on the
    * smaller bucket; only the final ks = gap/(nA·nB) is one
    * correctly-rounded double division (R4 rounding at the boundary).
    * The cross-products (gap ~ n², and the nA·nB divisor) are
    * DECIMAL(38,0) from CONSTRUCTION (r14, the q_stats_psi/acf/auc lift
    * completing the int64 audit — gap would wrap past ~3·10⁹ events
    * silently in non-ANSI mode, error under ANSI; HUGEINT twins in the
    * oracle): the statistic stays exact to ~10³⁸ events, and the
    * decimal gap_num orders/emits exactly. DecimalBoundSpec plants a
    * histogram whose gap exceeds Long.MaxValue and checks against
    * independent BigInt arithmetic.
    * Scale: one map-side-partial hash agg to the bucket histogram, the
    * cumulative window runs over ≤500 HISTOGRAM rows (never raw events),
    * totals broadcast one-row. */
  def statsKs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    // append-only ingest proxy: older vs newer half of event_ids. The
    // cut rides a one-row broadcast consts frame instead of a driver
    // .head() scalar — the whole query stays ONE job (the pagerank /
    // aggIncremental precedent; a driver cut job costs ~50-150 ms of
    // fixed overhead × 2 bench executions, and a round-trip per query
    // at cluster scale).
    val cut = e.agg(expr("max(event_id) div 2").as("cut"))
    val hist = e.crossJoin(broadcast(cut))
      .select(floor($"value").cast(LongType).as("bucket"),
        when($"event_id" <= $"cut", 1L).otherwise(0L).as("is_a"))
      .groupBy($"bucket")
      .agg(sum($"is_a").as("ca"), sum(lit(1L) - $"is_a").as("cb"))
    statsKsInt64(s, hist)
  }

  /** [[statsKs]]'s contract-schema projection: gap_num int64 (the statsAuc
    * discipline). The narrowing guard is ANSI-INDEPENDENT: non-ANSI
    * decimal→long overflow would silently NULL the contract column, so a
    * past-bound gap raises explicitly instead (DuckDB's HUGEINT→BIGINT
    * cast errors the same way); ks — computed from the wide intermediates
    * — stays correct right up to the raise. Exposed so DecimalBoundSpec
    * can plant a past-bound histogram and assert the raise. */
  private[graft] def statsKsInt64(s: SparkSession, hist: DataFrame): DataFrame = {
    import s.implicits._
    statsKsFromHist(s, hist)
      .select($"ks_bucket", $"na", $"nb",
        when($"gap_num" > lit(Long.MaxValue).cast("decimal(38,0)"),
            raise_error(concat(lit("q_stats_ks: gap_num exceeds the int64 "
              + "contract column (use statsKsFromHist for the wide path): "),
              $"gap_num".cast("string"))))
          .otherwise($"gap_num".cast(LongType)).as("gap_num"), $"ks")
  }

  /** [[statsKs]] core over a (bucket, ca, cb) histogram — the DECIMAL(38,0)
    * wide path, exposed (gap_num uncast) so DecimalBoundSpec can drive it
    * past the int64 bound directly (the statsAucFromHist pattern). */
  private[graft] def statsKsFromHist(s: SparkSession, hist: DataFrame): DataFrame = {
    import s.implicits._
    // totals are sum windows over the SAME ≤500-row histogram frame — a
    // separate agg cross-joined back would re-run the event scan for the
    // second consumer (the q_search_bm25 ReusedExchange lesson).
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum_a", sum($"ca").over(wCum))
      .withColumn("cum_b", sum($"cb").over(wCum))
      .withColumn("na", sum($"ca").over(wAll))
      .withColumn("nb", sum($"cb").over(wAll))
      // lift BEFORE the cross-product forms, not after it wraps
      .select($"bucket", $"na", $"nb",
        abs($"cum_a".cast("decimal(38,0)") * $"nb" -
            $"cum_b".cast("decimal(38,0)") * $"na").as("gap_num"))
      .orderBy($"gap_num".desc, $"bucket")
      .limit(1)
      .select($"bucket".as("ks_bucket"), $"na", $"nb", $"gap_num",
        round($"gap_num".cast("double") /
            expr("CAST(nullif(CAST(na AS DECIMAL(38,0)) * nb, 0) AS DOUBLE)"),
          6).as("ks"))
  }

  val statsKsSql: String =
    """WITH cut AS (SELECT CAST(MAX(event_id) AS BIGINT) // 2 AS c FROM events),
      |hist AS (
      |  SELECT CAST(FLOOR(value) AS BIGINT) AS bucket,
      |    SUM(CASE WHEN event_id <= cut.c THEN 1 ELSE 0 END) AS ca,
      |    SUM(CASE WHEN event_id <= cut.c THEN 0 ELSE 1 END) AS cb
      |  FROM events, cut GROUP BY bucket),
      |cum AS (
      |  SELECT bucket,
      |    CAST(SUM(ca) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
      |    CAST(SUM(cb) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b,
      |    CAST(SUM(ca) OVER () AS BIGINT) AS na,
      |    CAST(SUM(cb) OVER () AS BIGINT) AS nb
      |  FROM hist)
      |SELECT bucket AS ks_bucket, na, nb,
      |  CAST(ABS(CAST(cum_a AS HUGEINT) * nb - CAST(cum_b AS HUGEINT) * na) AS BIGINT) AS gap_num,
      |  ROUND(CAST(ABS(CAST(cum_a AS HUGEINT) * nb - CAST(cum_b AS HUGEINT) * na) AS DOUBLE)
      |        / CAST(NULLIF(CAST(na AS HUGEINT) * nb, 0) AS DOUBLE), 6) AS ks
      |FROM cum
      |ORDER BY gap_num DESC, bucket LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- PSI drift
  /** Population Stability Index (r13) — the DRIFT-MAGNITUDE member of the
    * drift family: [[statsKs]] answers "did the distribution move?" with
    * a max-ECDF-gap test statistic, PSI answers "by HOW MUCH, and where"
    * — the banded score (<0.1 stable / 0.1–0.25 drifting / >0.25 shifted)
    * model-risk teams threshold on every feature before retraining. Per
    * event_type between the older and newer ingest half (event_id cut,
    * the statsKs append-only proxy): PSI = Σ_buckets (pa−pb)·ln(pa/pb)
    * over the integer-floor value buckets, Laplace-smoothed (+1 per
    * bucket) so empty-on-one-side buckets contribute finitely.
    *
    * Determinism — the [[statsEntropy]] single-transcendental discipline:
    * the ONLY float op is one ln per bucket, immediately floor-quantized
    * to int64 millionths (lq = ⌊ln(xa/xb)·10⁶⌋ where xa = (ca+1)(nb+B),
    * xb = (cb+1)(na+B) — the ratio is pa/pb exactly, cross-multiplied so
    * no intermediate float division exists); each term (xa−xb)·lq is ≥ 0
    * by construction (diff and log share sign; floor keeps the product
    * nonnegative); xa, xb, the term sum, and the final denominator are
    * all DECIMAL(38,0) from CONSTRUCTION (HUGEINT twin — the q_stats_gini
    * precedent): xa ~ n² per type wraps int64 silently at ~3·10⁹
    * events/type in non-ANSI Spark while DuckDB errors, so the lift
    * happens before any product, not just at the sum (r13 session-2
    * hardening — the q_sample_temperature advice class); psi_ppm returns
    * to int64 via one integral division by (na+B)(nb+B). Scale: one scan →
    * (type, bucket) hash agg with map-side partials; every window runs
    * over the ≤ |types|·range histogram frame, never event rows. */
  def statsPsi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    // append-only ingest proxy: the cut rides a one-row broadcast consts
    // frame (pagerank precedent — whole query ONE job, no driver cut
    // round-trip); coalesce-guarded like statsTtest so an empty table
    // stays NPE-free.
    val cut = e.agg(expr("coalesce(max(event_id), 0) div 2").as("cut"))
    val wT = Window.partitionBy($"event_type")
    e.crossJoin(broadcast(cut))
      .select($"event_type", floor($"value").cast(LongType).as("bucket"),
        when($"event_id" <= $"cut", 1L).otherwise(0L).as("ia"))
      .groupBy($"event_type", $"bucket")
      .agg(sum($"ia").as("ca"), sum(lit(1L) - $"ia").as("cb"))
      .withColumn("na", sum($"ca").over(wT))
      .withColumn("nb", sum($"cb").over(wT))
      .withColumn("bk", count(lit(1)).over(wT))
      // xa/xb ~ n² per type: DECIMAL(38,0) from CONSTRUCTION, not just the
      // sum — an int64 product overflows at ~3·10⁹ events/type; that
      // overflow wraps silently in non-ANSI mode and ERRORS under ANSI
      // (the Spark 4 default this build runs), so without the lift the
      // query would fail outright at scale rather than return wrong
      // numbers (the r12 q_sample_temperature advice class). Values at
      // test SF are identical either way (< 2⁵³, so even the double
      // casts feeding lq are exact).
      .withColumn("xa",
        ($"ca" + lit(1L)).cast("decimal(38,0)") * ($"nb" + $"bk"))
      .withColumn("xb",
        ($"cb" + lit(1L)).cast("decimal(38,0)") * ($"na" + $"bk"))
      .withColumn("lq",
        floor(log($"xa".cast("double") / $"xb".cast("double")) * 1000000.0)
          .cast(LongType))
      .groupBy($"event_type")
      .agg(max($"na").as("na"), max($"nb").as("nb"),
        max($"bk").as("n_buckets"),
        sum(($"xa" - $"xb") * $"lq").as("psi_num"))
      .select($"event_type", $"na", $"nb", $"n_buckets",
        expr("""CAST(psi_num div (CAST(na + n_buckets AS DECIMAL(38,0))
               |                  * (nb + n_buckets))
               |     AS BIGINT)""".stripMargin).as("psi_ppm"))
      .orderBy($"event_type")
  }

  val statsPsiSql: String =
    """WITH cut AS (
      |  SELECT COALESCE(CAST(MAX(event_id) AS BIGINT), 0) // 2 AS c FROM events),
      |hist AS (
      |  SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS bucket,
      |    SUM(CASE WHEN event_id <= cut.c THEN 1 ELSE 0 END) AS ca,
      |    SUM(CASE WHEN event_id <= cut.c THEN 0 ELSE 1 END) AS cb
      |  FROM events, cut GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, ca, cb,
      |    CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS na,
      |    CAST(SUM(cb) OVER (PARTITION BY event_type) AS BIGINT) AS nb,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS bk
      |  FROM hist),
      |q AS (
      |  SELECT event_type, na, nb, bk,
      |    CAST(ca + 1 AS HUGEINT) * (nb + bk) AS xa,
      |    CAST(cb + 1 AS HUGEINT) * (na + bk) AS xb,
      |    CAST(FLOOR(ln(CAST(CAST(ca + 1 AS HUGEINT) * (nb + bk) AS DOUBLE)
      |                  / CAST(CAST(cb + 1 AS HUGEINT) * (na + bk) AS DOUBLE))
      |               * 1000000.0)
      |         AS BIGINT) AS lq
      |  FROM m)
      |SELECT event_type, MAX(na) AS na, MAX(nb) AS nb, MAX(bk) AS n_buckets,
      |  CAST(SUM((xa - xb) * lq)
      |       // (CAST(MAX(na) + MAX(bk) AS HUGEINT) * (MAX(nb) + MAX(bk)))
      |       AS BIGINT) AS psi_ppm
      |FROM q GROUP BY event_type ORDER BY event_type""".stripMargin
  /** Median-absolute-deviation anomaly gate (r11) — the robust outlier
    * detector a data-quality pipeline runs per segment: per event_type,
    * the exact median and MAD of the value distribution and the count of
    * values beyond median + 5·MAD (the robust z-score gate; MAD is
    * immune to the outliers it hunts, unlike stddev-based gates —
    * q_stats_moments' variance is exactly what a heavy tail corrupts).
    *
    * Exactness: values are 2dp money — scaled to EXACT int64 cents
    * (round(v·100); doubles storing 2dp are within 1e-10 of the integer,
    * so rounding can never sit on a .5 boundary), after which median,
    * MAD, threshold, and the gate are pure integer arithmetic. Medians
    * use the VALUE-HISTOGRAM selection (the q_percentile_exact shape):
    * rank k = (n+1) div 2 located in the cumulative window over DISTINCT
    * values, never a per-row window. Scale: ONE event scan builds the
    * (type, cents) histogram (map-side partials), materialized once (the
    * q_search_bm25 ReusedExchange lesson — three consumers would re-run
    * the scan); everything downstream runs over histogram-sized frames
    * (≤ distinct values per type). */
  def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h1 = graft.tables.Layout.materialize(
      events(s, dir)
        .select($"event_type", round($"value" * 100.0).cast(LongType).as("cents"))
        .groupBy($"event_type", $"cents").agg(count(lit(1)).as("cnt")))
    def histMedian(hist: DataFrame, valCol: String): DataFrame = {
      val wCum = Window.partitionBy($"event_type").orderBy(col(valCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wKey = Window.partitionBy($"event_type")
      hist
        .withColumn("cum", sum($"cnt").over(wCum))
        .withColumn("n", sum($"cnt").over(wKey))
        .withColumn("k", expr("(n + 1L) div 2L"))
        .groupBy($"event_type")
        .agg(max(when($"k" > $"cum" - $"cnt" && $"k" <= $"cum", col(valCol))).as("m"),
          max($"n").as("n"))
    }
    val med = histMedian(h1, "cents")
      .select($"event_type".as("m_type"), $"m".as("med"), $"n")
    val devHist = h1.join(broadcast(med), $"event_type" === $"m_type")
      .select($"event_type", abs($"cents" - $"med").as("dv"), $"cnt")
      .groupBy($"event_type", $"dv").agg(sum($"cnt").as("cnt"))
    val mad = histMedian(devHist.withColumnRenamed("dv", "cents"), "cents")
      .select($"event_type".as("d_type"), $"m".as("mad"))
    h1.join(broadcast(med), $"event_type" === $"m_type")
      .join(broadcast(mad), $"event_type" === $"d_type")
      .withColumn("thr", $"med" + lit(5L) * $"mad")
      .groupBy($"event_type")
      .agg(max($"n").as("n"), max($"med").as("med_cents"),
        max($"mad").as("mad_cents"), max($"thr").as("thr_cents"),
        coalesce(sum(when($"cents" > $"thr", $"cnt")), lit(0L)).as("n_outliers"),
        max(when($"cents" > $"thr", $"cents")).as("max_outlier_cents"))
      .orderBy($"event_type")
  }

  val anomalyMadSql: String =
    """WITH h1 AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY event_type, cents),
      |st AS (
      |  SELECT event_type, cents, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
      |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM h1),
      |med AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN (n+1)//2 > cum - cnt AND (n+1)//2 <= cum THEN cents END) AS med,
      |    MAX(n) AS n
      |  FROM st GROUP BY event_type),
      |dev AS (
      |  SELECT h1.event_type, ABS(h1.cents - med.med) AS dv,
      |    CAST(SUM(h1.cnt) AS BIGINT) AS cnt
      |  FROM h1 JOIN med ON h1.event_type = med.event_type
      |  GROUP BY h1.event_type, dv),
      |sd AS (
      |  SELECT event_type, dv, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY dv
      |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM dev),
      |mad AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN (n+1)//2 > cum - cnt AND (n+1)//2 <= cum THEN dv END) AS mad
      |  FROM sd GROUP BY event_type)
      |SELECT h1.event_type AS event_type, MAX(m.n) AS n, MAX(m.med) AS med_cents,
      |  MAX(d.mad) AS mad_cents, MAX(m.med + 5 * d.mad) AS thr_cents,
      |  COALESCE(CAST(SUM(CASE WHEN h1.cents > m.med + 5 * d.mad THEN h1.cnt END) AS BIGINT), 0) AS n_outliers,
      |  MAX(CASE WHEN h1.cents > m.med + 5 * d.mad THEN h1.cents END) AS max_outlier_cents
      |FROM h1 JOIN med m ON h1.event_type = m.event_type
      |JOIN mad d ON h1.event_type = d.event_type
      |GROUP BY h1.event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- chi2 drift
  /** Chi-squared independence census (r11) — the CATEGORICAL sibling of
    * q_stats_ks (numeric ECDF drift) and q_corpus_drift (token-mass
    * drift): is documents.lang independent of documents.source, cell by
    * cell? Per (lang, source): observed count, expected count in exact
    * ppm, the cell's χ² contribution in exact ppb, and the global χ² in
    * ppb — the "did this source's language mix shift" gate a corpus
    * refresh runs before mixing.
    *
    * Exactness: χ² = Σ (O−E)²/E with E = row·col/N is rational in the
    * counts. Cross-multiplying clears every denominator: diff = O·N −
    * row·col, contrib_ppb = (diff²·10⁹) div (N·row·col). The oracle
    * mirrors with HUGEINT. NO float exists anywhere; the statistic ships
    * as exact ppb integers. Every cross-product is DECIMAL(38,0) FROM
    * CONSTRUCTION — see [[statsChi2FromCells]] for the admissible-domain
    * contract and the two loud ceilings.
    *
    * Scale: ONE scan → hash agg to the (lang, source) cell frame; row/
    * col/N totals are window sums OVER THE CELL FRAME (≤ |lang|·|source|
    * rows — bounded by label domains, never by corpus size; the same
    * bounded-frame posture as q_corpus_mix). */
  def statsChi2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = documents(s, dir)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("n_obs"))
    statsChi2FromCells(s, cells)
  }

  /** [[statsChi2]] core over a (lang, source, n_obs) cell frame — exposed
    * so DecimalBoundSpec can plant past-int64 cells (the statsKsFromHist
    * pattern). r16, the int64-audit follow-through: the r11 form computed
    * exp_ppm's numerator, diff, and the n·row·col divisor on int64, which
    * wraps silently WELL inside the ppb contract's admissible domain —
    * the divisor at N ≈ 3·10⁶ documents with near-uniform marginals
    * (N³/4 > 2⁶³), exp_ppm's numerator at ≈ 3·10⁶, diff at N ≈ 3·10⁹.
    * All three now lift to DECIMAL(38,0) BEFORE the product forms (the
    * q_stats_ks discipline). Two representability ceilings remain, both
    * RAISED loudly instead of wrapping/NULLing:
    *   - N > 9 223 372 036: contrib_ppb is bounded by N·10⁹ (χ² cell ≤ N),
    *     so past this N the int64 contract columns cannot hold the bound;
    *   - |diff| > 316 227 766 016 837 (= ⌊√(10³⁸⁄10⁹)⌋): diff²·10⁹
    *     exceeds DECIMAL(38,0) — non-ANSI Spark would silently NULL the
    *     product, and the DuckDB oracle's HUGEINT square hits its own
    *     ~1.7·10³⁸ wall at nearly the same point, so past it NO engine
    *     holds the exact-ppb form and the honest move is the error. */
  private[graft] def statsChi2FromCells(s: SparkSession, cells: DataFrame): DataFrame = {
    import s.implicits._
    val wRow = Window.partitionBy($"lang")
    val wCol = Window.partitionBy($"source")
    val wAll = Window.partitionBy()
    val nCeil = 9223372036L
    val diffCeil = 316227766016837L
    cells
      .withColumn("row_tot", sum($"n_obs").over(wRow))
      .withColumn("col_tot", sum($"n_obs").over(wCol))
      .withColumn("n",
        when(sum($"n_obs").over(wAll) > nCeil,
          raise_error(concat(lit("q_stats_chi2: N exceeds the ppb contract "
              + s"ceiling $nCeil (contrib_ppb is bounded by N*10^9): N = "),
            sum($"n_obs").over(wAll).cast("string"))))
        .otherwise(sum($"n_obs").over(wAll)))
      .withColumn("exp_ppm", expr(
        "CAST(row_tot AS DECIMAL(38,0)) * col_tot * 1000000 div n"))
      .withColumn("diff", expr(
        "CAST(n_obs AS DECIMAL(38,0)) * n - CAST(row_tot AS DECIMAL(38,0)) * col_tot"))
      .withColumn("contrib_ppb",
        when(abs($"diff") > lit(diffCeil).cast("decimal(38,0)"),
          raise_error(concat(lit("q_stats_chi2: |diff| exceeds the "
              + s"DECIMAL(38,0) square ceiling $diffCeil: "),
            $"diff".cast("string"))))
        .otherwise(expr("""diff * diff * CAST(1000000000 AS DECIMAL(38,0))
                        |div (CAST(n AS DECIMAL(38,0)) * row_tot * col_tot)"""
          .stripMargin)))
      .withColumn("chi2_dec", sum($"contrib_ppb".cast("decimal(38,0)")).over(wAll))
      .withColumn("chi2_ppb",
        when($"chi2_dec" > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(concat(
            lit("q_stats_chi2: chi2_ppb exceeds the int64 contract column: "),
            $"chi2_dec".cast("string"))))
        .otherwise($"chi2_dec".cast(LongType)))
      .select($"lang", $"source", $"n_obs", $"exp_ppm", $"contrib_ppb", $"chi2_ppb")
      .orderBy($"lang", $"source")
  }

  val statsChi2Sql: String =
    """WITH cells AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_obs
      |  FROM documents GROUP BY lang, source),
      |tot AS (
      |  SELECT lang, source, n_obs,
      |    CAST(SUM(n_obs) OVER (PARTITION BY lang) AS BIGINT) AS row_tot,
      |    CAST(SUM(n_obs) OVER (PARTITION BY source) AS BIGINT) AS col_tot,
      |    CAST(SUM(n_obs) OVER () AS BIGINT) AS n
      |  FROM cells),
      |c AS (
      |  SELECT lang, source, n_obs,
      |    (row_tot * col_tot * 1000000) // n AS exp_ppm,
      |    CAST((CAST(n_obs * n - row_tot * col_tot AS HUGEINT)
      |          * CAST(n_obs * n - row_tot * col_tot AS HUGEINT)
      |          * 1000000000)
      |         // CAST(n * row_tot * col_tot AS HUGEINT) AS BIGINT) AS contrib_ppb
      |  FROM tot)
      |SELECT lang, source, n_obs, exp_ppm, contrib_ppb,
      |  CAST(SUM(contrib_ppb) OVER () AS BIGINT) AS chi2_ppb
      |FROM c ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- profiler
  /** Table profiler (r11) — the ANALYZE-style column census (deequ/dbt
    * profiling staple): per lineitem column, row count, null count, and
    * EXACT distinct cardinality. The report a pipeline materializes
    * before trusting a new snapshot; the approximate twin at scale is
    * the HLL family (q_distinct_sketch) — this is the exact
    * contract-sized form.
    *
    * Scale note: one narrow aggregate per column, each a column-pruned
    * scan (columnar formats price a per-column pass the same as one wide
    * pass + an 11-way Expand for the multi-countDistinct plan Spark
    * would otherwise run; the union-of-aggs form keeps every distinct
    * count a plain two-phase agg with map-side partials). Column list is
    * the static schema — the op is schema-bounded, not data-bounded. */
  def schemaProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, dir)
    li.columns.toSeq.map { c =>
      li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column"), $"n_rows", $"n_nulls", $"n_distinct")
    }.reduce(_ unionByName _)
      .orderBy($"column")
  }

  val schemaProfileSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    cols.map { c =>
      s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stats_linreg"   -> (statsLinreg _),
    "q_stats_gini"     -> (statsGini _),
    "q_stats_benford"  -> (statsBenford _),
    "q_sample_balanced" -> (sampleBalanced _),
    "q_mix_rebalance"  -> (mixRebalance _),
    "q_sample_temperature" -> (sampleTemperature _),
    "q_shuffle_epoch"  -> (shuffleEpoch _),
    "q_stats_auc"      -> (statsAuc _),
    "q_stats_ttest"    -> (statsTtest _),
    "q_heavy_hitters"   -> (heavyHitters _),
    "q_quantile_sketch" -> (quantileSketch _),
    "q_skew_diagnose"  -> (skewDiagnose _),
    "q_text_pii_mask"  -> (piiMask _),
    "q_sample_hash"    -> (sampleHash _),
    "q_sample_weighted" -> (sampleWeighted _),
    "q_sample_split"   -> (sampleSplit _),
    "q_agg_salted"     -> (aggSalted _),
    "q_win_cume_dist"  -> (winCumeDist _),
    "q_stats_corr"     -> (statsCorr _),
    "q_ngram_freq"     -> (ngramFreq _),
    "q_topk_agg"       -> (topkAgg _),
    "q_win_range_frame" -> (winRangeFrame _),
    "q_unpivot"        -> (unpivotMetrics _),
    "q_embed_quantize" -> (embedQuantize _),
    "q_agg_mode"       -> (aggMode _),
    "q_agg_approx_quantile" -> (aggApproxQuantile _),
    "q_quality_gopher" -> (qualityGopher _),
    "q_curriculum_order" -> (curriculumOrder _),
    "q_regex_extract"  -> (regexExtract _),
    "q_quality_c4"     -> (qualityC4 _),
    "q_stats_entropy"  -> (statsEntropy _),
    "q_sample_reservoir" -> (sampleReservoir _),
    "q_stats_ks"       -> (statsKs _),
    "q_stats_psi"      -> (statsPsi _),
    "q_stats_chi2"     -> (statsChi2 _),
    "q_anomaly_mad"    -> (anomalyMad _),
    "q_schema_profile" -> (schemaProfile _))

  // ---------------------------------------------------------------- gopher gate
  /** Composite quality GATE (r10) — the Gopher-/RefinedWeb-style rule
    * battery as one row-local pass: per doc, four independent rules and
    * the conjunction that decides admission to the training mix. The
    * per-signal scores exist elsewhere (q_text_quality, q_quality_*);
    * this is the DECISION table a curation pipeline actually materializes
    * — which rule killed a doc, so the corpus loss is attributable per
    * rule, not just a survivor list.
    *
    * Rules (thresholds sit inside this data's real spread, so each rule
    * genuinely fires): word count in [30,90]; mean word length in
    * [3.8,5.2]; unique-word ratio ≥ 0.35; contains the stopword "the".
    * Every gate compares EXACT INTEGERS (the ratio thresholds are
    * cross-multiplied: swl·10 ≥ n·38, nu·100 ≥ n·35) — no float
    * equality at a rule boundary can flip between engines (R2
    * discipline applied to booleans). Scale: map-only over the scan —
    * no shuffle, no UDF; the only exchange is the output sort. */
  def qualityGopher(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tk = split(trim($"text"), " ")
    val n = size(tk).cast(LongType)
    val swl = length(trim($"text")).cast(LongType) - (n - lit(1)) // Σ word chars
    val nu = size(array_distinct(tk)).cast(LongType)
    val okWords = n >= 30L && n <= 90L
    val okLen = swl * 10L >= n * 38L && swl * 10L <= n * 52L
    val okUniq = nu * 100L >= n * 35L
    val okStop = array_contains(tk, "the")
    documents(s, dir).select(
      $"doc_id", n.as("n_words"),
      round(swl.cast("double") / n, 4).as("avg_word_len"),
      round(nu.cast("double") / n, 4).as("uniq_ratio"),
      okWords.as("ok_words"), okLen.as("ok_word_len"),
      okUniq.as("ok_uniq"), okStop.as("ok_stopword"),
      (okWords && okLen && okUniq && okStop).as("keep"))
      .orderBy($"doc_id")
  }

  val qualityGopherSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS tk,
      |    CAST(LENGTH(trim(text)) AS BIGINT) AS lt
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
      |    lt - (CAST(len(tk) AS BIGINT) - 1) AS swl,
      |    CAST(len(list_distinct(tk)) AS BIGINT) AS nu,
      |    list_contains(tk, 'the') AS has_stop
      |  FROM t)
      |SELECT doc_id, n AS n_words,
      |  ROUND(CAST(swl AS DOUBLE) / n, 4) AS avg_word_len,
      |  ROUND(CAST(nu AS DOUBLE) / n, 4) AS uniq_ratio,
      |  (n >= 30 AND n <= 90) AS ok_words,
      |  (swl * 10 >= n * 38 AND swl * 10 <= n * 52) AS ok_word_len,
      |  (nu * 100 >= n * 35) AS ok_uniq,
      |  has_stop AS ok_stopword,
      |  ((n >= 30 AND n <= 90) AND (swl * 10 >= n * 38 AND swl * 10 <= n * 52)
      |    AND (nu * 100 >= n * 35) AND has_stop) AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- curriculum
  /** Quality-curriculum schedule (r10): order the corpus for training so
    * every consecutive block of 10 steps carries one doc from each quality
    * decile (anti-curriculum mixing — the standard defense against
    * early-training distribution skew when data is quality-sorted).
    * decile = NTILE(10) by (score desc, doc_id); step interleaves
    * round-robin across deciles: step = (rank_in_decile − 1)·10 + decile.
    *
    * Scale shape — NO single-partition window: a global NTILE is a total
    * order, and the naive plan (empty PARTITION BY) collapses the corpus
    * into one reducer. The score here is DOMAIN-BOUNDED (score = n_words −
    * n_stopwords, an exact int ≤ ~100), so global rank decomposes exactly
    * the same way q_median's histogram selection does: ONE map-side-
    * partial hash agg builds the ≤100-row score histogram, the driver
    * prefix-sums it into per-score rank bases (bounded driver state,
    * aggregate-step contract), and each row's global rank = base(score) +
    * row_number within its score partition. NTILE's big-tiles-first
    * arithmetic ((q+1)-sized tiles for the first n mod 10, q-sized after)
    * is then row-local integer math on that rank — bit-identical to the
    * window NTILE the oracle runs. Residual skew is bounded by the score
    * DOMAIN (≥ ~90 partitions), not by the corpus; finer scores widen it.
    *
    * Determinism: rank ties cannot exist (doc_id breaks them inside each
    * score partition); all steps are exact ints (R1/R2). */
  def curriculumOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tk = split(trim($"text"), " ")
    val n = size(tk).cast(LongType)
    val stop = size(filter(tk, x => x === "the" || x === "a")).cast(LongType)
    val scored = documents(s, dir).select($"doc_id", (n - stop).as("score"))
    val histDf = scored.groupBy($"score").agg(count(lit(1)).as("c"))
    // Driver-CASE branch budget (ADVICE r10 #3): the ~100-score domain is
    // a property of THIS corpus, not of the operator — a long-doc corpus
    // inflates driver state and codegen CASE size without bound. Above the
    // cap (test-overridable), the same rank decomposition runs with the
    // bases joined in instead of compiled in.
    val domainCap = sys.props.get("graft.curriculum.maxCaseBranches")
      .map(_.toInt).getOrElse(512)
    // limit(cap+1): the collect stays bounded even when the domain isn't
    val hist = histDf.limit(domainCap + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    val wScore = Window.partitionBy($"score").orderBy($"doc_id")
    val (ranked, total) =
      if (hist.isEmpty) { // empty corpus: empty schedule, same schema
        (scored.select($"doc_id", $"score", lit(0L).as("rnk")), 0L)
      } else if (hist.length <= domainCap) {
        // ≤ |score domain| rows: exact histogram → driver prefix sums, the
        // bases compiled into one bounded CASE (codegen, no join).
        val bases: Map[Long, Long] =
          hist.scanLeft((Long.MaxValue, 0L)) { case ((_, acc), (sc, c)) =>
            (sc, acc + c)
          }.sliding(2).collect { case Array((_, b), (sc, _)) => sc -> b }
            .toMap // score -> # docs with strictly higher score
        val baseCase = hist.map(_._1).tail.foldLeft(
          when($"score" === hist.head._1, lit(bases(hist.head._1)))) {
          case (acc, sc) => acc.when($"score" === sc, lit(bases(sc)))
        }
        val rnk = (baseCase + row_number().over(wScore)).cast(LongType).as("rnk")
        (scored.select($"doc_id", $"score", rnk), hist.map(_._2).sum)
      } else {
        // domain exceeded the driver budget: identical rank decomposition,
        // bases from a prefix-sum window over the HISTOGRAM relation
        // (|distinct scores| rows through one reducer — bounded by the
        // domain, never the corpus) joined back on score.
        val wHist = Window.orderBy($"score".desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val bases = histDf
          .withColumn("base", coalesce(sum($"c").over(wHist), lit(0L)))
          .select($"score", $"base")
        (scored.join(bases, Seq("score"))
          .select($"doc_id", $"score",
            ($"base" + row_number().over(wScore)).cast(LongType).as("rnk")),
          scored.count())
      }
    if (total == 0L)
      return ranked.select($"doc_id", $"score",
        lit(0L).as("decile"), lit(0L).as("step"))
        .orderBy($"step", $"doc_id")
    val q = total / 10L; val m = total % 10L
    // NTILE big-tiles-first arithmetic as row-local integer `div` (never
    // Column./, which is double division). q = 0 (fewer rows than tiles)
    // degenerates to tile = rank, matching window NTILE.
    val tile =
      if (q == 0L) expr("rnk")
      else expr(s"CASE WHEN rnk <= ${(q + 1L) * m} THEN (rnk - 1) div ${q + 1L} + 1" +
        s" ELSE $m + (rnk - 1 - ${(q + 1L) * m}) div $q + 1 END")
    val tileStart =
      if (q == 0L) expr("decile")
      else expr(s"CASE WHEN decile <= $m THEN (decile - 1) * ${q + 1L} + 1" +
        s" ELSE ${m * (q + 1L)} + (decile - 1 - $m) * $q + 1 END")
    ranked.withColumn("decile", tile.cast(LongType))
      .withColumn("step", ($"rnk" - tileStart) * 10L + $"decile")
      .select($"doc_id", $"score", $"decile", $"step")
      .orderBy($"step", $"doc_id")
  }

  val curriculumOrderSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(len(tk) AS BIGINT)
      |      - CAST(len(list_filter(tk, x -> x = 'the' OR x = 'a')) AS BIGINT)
      |      AS score
      |  FROM t),
      |d AS (
      |  SELECT doc_id, score,
      |    NTILE(10) OVER (ORDER BY score DESC, doc_id) AS decile
      |  FROM sc),
      |r AS (
      |  SELECT doc_id, score, CAST(decile AS BIGINT) AS decile,
      |    ROW_NUMBER() OVER (PARTITION BY decile ORDER BY score DESC, doc_id)
      |      AS rid
      |  FROM d)
      |SELECT doc_id, score, decile, (rid - 1) * 10 + decile AS step
      |FROM r ORDER BY step, doc_id""".stripMargin

  // ---------------------------------------------------------------- mix rebalance
  /** Corpus-mix rebalancer (r12) — the step AFTER q_corpus_mix measures:
    * downsample every language to the char mass of the SMALLEST one (the
    * "balance domains before training" rule), deterministically. Keep
    * rate per lang r = C_min/C_lang; a doc survives iff its 24-bit md5
    * draw falls in the keep interval — h·C_lang < C_min·2²⁴ (exact
    * integers; the min lang satisfies it for every h, so min(1,·) needs
    * no branch). Same content-hash-draw contract as q_sample_hash /
    * q_sample_split: reproducible across runs, engines, partitionings,
    * and stable under corpus append within a lang's mass.
    *
    * Output is the per-lang audit a mixing pipeline materializes: in/kept
    * docs + chars, the applied rate (ppm), and the before/after char
    * shares (ppm) — after-shares should flatten toward uniform. Exact
    * int64 throughout (bound: h·C_lang < 2²⁴·C_lang ≈ 10²⁶ needs only
    * C_lang ≲ 5·10¹¹ chars/lang in int64; above that, lift the draw to
    * DECIMAL(38) — same op shape). Scale: one map-side-combined hash agg
    * for the lang frame (|langs| rows, broadcast back), one filtered agg
    * for the kept frame; share windows run over the ≤|langs|-row report
    * frame, never raw rows. */
  def mixRebalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perLang = documents(s, dir).groupBy($"lang").agg(
      count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
    val minChars = perLang.agg(min($"chars").as("c_min"))
    val h = conv(substring(md5($"text".cast("binary")), 1, 6), 16, 10).cast(LongType)
    val kept = documents(s, dir)
      .join(broadcast(perLang.select($"lang", $"chars".as("l_chars"))), "lang")
      .crossJoin(broadcast(minChars))
      .where(h * $"l_chars" < $"c_min" * lit(16777216L))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("chars_kept"))
    val wAll = Window.partitionBy()
    perLang.join(kept, Seq("lang"), "left")
      .crossJoin(broadcast(minChars))
      .select($"lang", $"n_docs", $"chars",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"chars_kept", lit(0L)).as("chars_kept"),
        least(lit(1000000L), expr("(c_min * 1000000L) div chars")).as("rate_ppm"))
      .withColumn("tot_chars", sum($"chars").over(wAll))
      .withColumn("tot_kept", sum($"chars_kept").over(wAll))
      .select($"lang", $"n_docs", $"chars", $"n_kept", $"chars_kept", $"rate_ppm",
        expr("(chars * 1000000L) div tot_chars").as("share_before_ppm"),
        expr("(chars_kept * 1000000L) div tot_kept").as("share_after_ppm"))
      // asc_nulls_first + NULLS FIRST in the twin: Spark defaults NULLS FIRST
      // ascending, DuckDB NULLS LAST — pin both so a null lang can't diverge (R1)
      .orderBy($"lang".asc_nulls_first)
  }

  val mixRebalanceSql: String =
    """WITH pl AS (
      |  SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY lang),
      |mn AS (SELECT MIN(chars) AS c_min FROM pl),
      |k AS (
      |  SELECT d.lang, COUNT(*) AS n_kept, CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
      |  FROM documents d JOIN pl ON d.lang = pl.lang, mn
      |  WHERE CAST(('0x' || substring(md5(d.text), 1, 6)) AS BIGINT) * pl.chars
      |        < mn.c_min * 16777216
      |  GROUP BY d.lang)
      |SELECT pl.lang, pl.n_docs, pl.chars,
      |  COALESCE(k.n_kept, 0) AS n_kept,
      |  COALESCE(k.chars_kept, 0) AS chars_kept,
      |  CAST(LEAST(1000000, (mn.c_min * 1000000) // pl.chars) AS BIGINT) AS rate_ppm,
      |  CAST((pl.chars * 1000000) // (SUM(pl.chars) OVER ()) AS BIGINT) AS share_before_ppm,
      |  CAST((COALESCE(k.chars_kept, 0) * 1000000)
      |    // (SUM(COALESCE(k.chars_kept, 0)) OVER ()) AS BIGINT) AS share_after_ppm
      |FROM pl LEFT JOIN k ON pl.lang = k.lang, mn
      |ORDER BY pl.lang NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- temperature mix
  /** Temperature-based mixture sampling (r12), T = 2 — the standard
    * multilingual rebalancing between [[mixRebalance]]'s hard flatten
    * (T → ∞) and proportional sampling (T = 1): target share ∝
    * chars^(1/T), realized by downsampling at the largest mass that
    * keeps every rate ≤ 1. For T = 2 the algebra collapses beautifully:
    * p_l ∝ √C_l and k = min_m C_m/p_m give rate_l = k·p_l/C_l =
    * √(C_min·C_l)/C_l = √(C_min/C_l) — the normalizer Σ√C CANCELS, so
    * no float sum over languages ever exists, and the keep test
    * h/2²⁰ < √(C_min/C_l) squares to **h²·C_l < C_min·2⁴⁰ — exact
    * integers** (h is a 20-bit md5 draw; the product runs in DECIMAL(38)
    * / HUGEINT since r13 — int64 capped out at ~8·10⁶ chars/lang, one
    * order above sf0.1 — giving ~10²⁴ chars/lang of headroom, far past
    * any 100 TB corpus). Every engine-visible number is
    * an integer; the only square root in the OUTPUT is pre-squared
    * (rate2_x1e12 = C_min·10¹²  div C_l, the rate's exact square).
    *
    * Between the three samplers the mixing knob is now spanned: T=1
    * keep-everything (shares as measured, q_corpus_mix), T=2 soften
    * (this op — en keeps √(19525/64437) ≈ 55% here vs the hard 30%),
    * T=∞ flatten ([[mixRebalance]]). Same content-hash-draw contract;
    * same one-agg + broadcast + report-frame-window scale shape. */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perLang = documents(s, dir).groupBy($"lang").agg(
      count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
    val minChars = perLang.agg(min($"chars").as("c_min"))
    val h = conv(substring(md5($"text".cast("binary")), 1, 5), 16, 10).cast(LongType)
    // DECIMAL(38) keep test (r13): h ≤ 2²⁰ so h²·C_l overflows int64 at only
    // ~8.4M chars/lang — within one order of sf0.1. Decimal operands give the
    // same exact-integer decision with ~10²⁴ chars/lang headroom (HUGEINT twin
    // on the DuckDB side); decimal(19,0)² → decimal(38,0), scale 0 throughout.
    val hDec = h.cast(DecimalType(19, 0))
    val kept = documents(s, dir)
      .join(broadcast(perLang.select($"lang", $"chars".as("l_chars"))), "lang")
      .crossJoin(broadcast(minChars))
      .where(hDec * hDec * $"l_chars" <
        $"c_min".cast(DecimalType(19, 0)) * lit(1099511627776L)) // 2^40
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("chars_kept"))
    val wAll = Window.partitionBy()
    perLang.join(kept, Seq("lang"), "left")
      .crossJoin(broadcast(minChars))
      .select($"lang", $"n_docs", $"chars",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"chars_kept", lit(0L)).as("chars_kept"),
        expr("(c_min * 1000000000000L) div chars").as("rate2_x1e12"))
      .withColumn("tot_kept", sum($"chars_kept").over(wAll))
      .select($"lang", $"n_docs", $"chars", $"n_kept", $"chars_kept", $"rate2_x1e12",
        expr("(chars_kept * 1000000L) div tot_kept").as("share_after_ppm"))
      .orderBy($"lang".asc_nulls_first) // pinned null order, see mixRebalance
  }

  val sampleTemperatureSql: String =
    """WITH pl AS (
      |  SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY lang),
      |mn AS (SELECT MIN(chars) AS c_min FROM pl),
      |k AS (
      |  SELECT d.lang, COUNT(*) AS n_kept, CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
      |  FROM documents d JOIN pl ON d.lang = pl.lang, mn
      |  WHERE CAST(CAST(('0x' || substring(md5(d.text), 1, 5)) AS BIGINT) AS HUGEINT)
      |        * CAST(('0x' || substring(md5(d.text), 1, 5)) AS BIGINT)
      |        * pl.chars < CAST(mn.c_min AS HUGEINT) * 1099511627776
      |  GROUP BY d.lang)
      |SELECT pl.lang, pl.n_docs, pl.chars,
      |  COALESCE(k.n_kept, 0) AS n_kept,
      |  COALESCE(k.chars_kept, 0) AS chars_kept,
      |  CAST((mn.c_min * 1000000000000) // pl.chars AS BIGINT) AS rate2_x1e12,
      |  CAST((COALESCE(k.chars_kept, 0) * 1000000)
      |    // (SUM(COALESCE(k.chars_kept, 0)) OVER ()) AS BIGINT) AS share_after_ppm
      |FROM pl LEFT JOIN k ON pl.lang = k.lang, mn
      |ORDER BY pl.lang NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- epoch shuffle
  /** Deterministic training-order shuffle (r12) — the last step before a
    * corpus feeds a trainer: each epoch is an independent pseudo-random
    * permutation, materialized as SHARDED ordered runs (shard file +
    * position within shard), which is how a data loader actually consumes
    * order at scale — no single global sequence number exists anywhere.
    * The sort key is the md5 of "epoch:doc_id", so epoch 0 and epoch 1
    * orders are uncorrelated, reproducible across runs/engines, and
    * adding a doc perturbs only its own placement.
    *
    * Shard = first md5 byte mod 8 (uniform by construction); pos =
    * row_number within (epoch, shard) ordered by the full hash — the
    * window partitions by (epoch, shard), so parallelism = epochs×shards
    * and no partition exceeds ~n/8 rows (at 100 TB raise the shard count;
    * the op is shape-invariant). Tie-break doc_id is unreachable for md5
    * but pins determinism formally (R1). */
  def shuffleEpoch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"epoch", $"shard").orderBy($"h", $"doc_id")
    documents(s, dir)
      .select($"doc_id", $"source",
        explode(array(lit(0L), lit(1L))).as("epoch"))
      .withColumn("h",
        md5(concat($"epoch".cast("string"), lit(":"), $"doc_id".cast("string"))))
      .withColumn("shard",
        conv(substring($"h", 1, 2), 16, 10).cast(LongType) % 8L)
      .select($"epoch", $"shard",
        row_number().over(w).cast(LongType).as("pos"),
        $"doc_id", $"source")
      .orderBy($"epoch", $"shard", $"pos")
  }

  val shuffleEpochSql: String =
    """WITH e AS (
      |  SELECT doc_id, source, epoch,
      |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents, (SELECT UNNEST([0, 1]) AS epoch)),
      |s AS (
      |  SELECT epoch, CAST(('0x' || substring(h, 1, 2)) AS BIGINT) % 8 AS shard,
      |    h, doc_id, source
      |  FROM e)
      |SELECT epoch, shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS pos,
      |  doc_id, source
      |FROM s ORDER BY epoch, shard, pos""".stripMargin

  // ---------------------------------------------------------------- Welch t
  /** Welch two-sample t statistic (r12) — the MEAN-shift sibling of
    * q_stats_ks (which detects any distribution change) and q_corpus_drift:
    * did the average event value move between the older and newer ingest
    * halves? The same append-only split as q_stats_ks (one collected
    * scalar, bounded driver state). The moment sums are EXACT integers
    * over cent-quantized values: Σc stays int64 (c ≤ 10⁴, safe to ~10¹⁴
    * rows) while Σc² lifts to DECIMAL(38,0) FROM CONSTRUCTION (r16,
    * completing this row's own "past ~10¹⁰ rows" scaladoc note under the
    * q_stats_ks/auc/psi audit — int64 Σc² errors under ANSI / wraps
    * non-ANSI past ~10¹⁰ rows while the oracle's HUGEINT keeps going);
    * means/variances/t are derived from those exact integers through an
    * IDENTICAL double operand path in both engines (the q_sample_weighted
    * float-compare discipline), so the rounded outputs agree bitwise. The
    * emitted s2a/s2b diagnostics stay int64 (contract schema) behind an
    * ANSI-independent raise — the statsKsInt64 discipline.
    *
    * Scale: ONE scan, one map-side-combined global aggregate — six
    * integer partials, no window, no shuffle beyond the one-row final
    * merge. */
  def statsTtest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    // The cut rides a one-row broadcast consts frame (pagerank precedent —
    // whole query ONE job, no driver round-trip); coalesce keeps an empty
    // events table at cut=0 instead of NULL.
    val cut = e.agg(expr("coalesce(max(event_id), 0) div 2").as("cut"))
    statsTtestFromParts(s,
      e.crossJoin(broadcast(cut))
        .select(floor($"value" * 100).cast(LongType).as("c"),
          when($"event_id" <= $"cut", 1L).otherwise(0L).as("ia"))
        .agg(
          sum($"ia").as("n_a"), sum(lit(1L) - $"ia").as("n_b"),
          sum($"c" * $"ia").as("s1a"), sum($"c" * (lit(1L) - $"ia")).as("s1b"),
          // lift BEFORE the per-row square joins the sum, not after the
          // int64 accumulator wraps
          sum(($"c" * $"c").cast("decimal(38,0)") * $"ia").as("s2a_w"),
          sum(($"c" * $"c").cast("decimal(38,0)") * (lit(1L) - $"ia")).as("s2b_w")))
  }

  /** [[statsTtest]]'s contract projection over the one-row wide partials
    * (n_a, n_b, s1a, s1b, s2a_w, s2b_w): s2a/s2b narrow to the int64
    * contract columns behind an ANSI-independent raise (non-ANSI
    * decimal→long overflow would silently NULL them; DuckDB's
    * HUGEINT→BIGINT cast errors the same way), while the t statistic is
    * computed from the WIDE Σc² so it stays exact-sum-derived right up to
    * the raise — and past it when only `t` is selected (the raise prunes
    * away with its column). Exposed so DecimalBoundSpec can plant
    * past-bound partials. */
  private[graft] def statsTtestFromParts(s: SparkSession, parts: DataFrame): DataFrame = {
    import s.implicits._
    // Degenerate-split guard (r13, the q_stats_auc NULLIF discipline): if either
    // half has 0 or 1 events, (n-1) or n hits zero — Spark double division would
    // yield Infinity/NaN where DuckDB yields NULL, so every divisor is
    // nullif(...,0) in BOTH engines and a degenerate split is NULL t in both.
    def nz(c: org.apache.spark.sql.Column) = nullif(c, lit(0L))
    def i64(c: org.apache.spark.sql.Column, name: String) =
      when(c > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(concat(lit(s"q_stats_ttest: $name exceeds the int64 "
            + "contract column (select t alone for the wide path): "),
            c.cast("string"))))
        .otherwise(c.cast(LongType)).as(name)
    parts
      .select($"n_a", $"n_b", $"s1a", $"s1b",
        i64($"s2a_w", "s2a"), i64($"s2b_w", "s2b"),
        round($"s1a".cast("double") / nz($"n_a"), 6).as("mean_a_c"),
        round($"s1b".cast("double") / nz($"n_b"), 6).as("mean_b_c"),
        round(
          ($"s1a".cast("double") / nz($"n_a") - $"s1b".cast("double") / nz($"n_b")) /
          sqrt(
            (($"s2a_w".cast("double") - $"s1a".cast("double") * $"s1a".cast("double") / nz($"n_a"))
              / nz($"n_a" - 1L) / nz($"n_a")) +
            (($"s2b_w".cast("double") - $"s1b".cast("double") * $"s1b".cast("double") / nz($"n_b"))
              / nz($"n_b" - 1L) / nz($"n_b"))), 4).as("t"))
  }

  val statsTtestSql: String =
    """WITH cut AS (SELECT CAST(MAX(event_id) AS BIGINT) // 2 AS c FROM events),
      |m AS (
      |  SELECT CAST(FLOOR(value * 100) AS BIGINT) AS c,
      |    CASE WHEN event_id <= cut.c THEN 1 ELSE 0 END AS ia
      |  FROM events, cut),
      |a AS (
      |  SELECT CAST(SUM(ia) AS BIGINT) AS n_a, CAST(SUM(1 - ia) AS BIGINT) AS n_b,
      |    CAST(SUM(c * ia) AS BIGINT) AS s1a, CAST(SUM(c * (1 - ia)) AS BIGINT) AS s1b,
      |    CAST(SUM(c * c * ia) AS BIGINT) AS s2a, CAST(SUM(c * c * (1 - ia)) AS BIGINT) AS s2b
      |  FROM m)
      |SELECT n_a, n_b, s1a, s1b, s2a, s2b,
      |  ROUND(CAST(s1a AS DOUBLE) / NULLIF(n_a, 0), 6) AS mean_a_c,
      |  ROUND(CAST(s1b AS DOUBLE) / NULLIF(n_b, 0), 6) AS mean_b_c,
      |  ROUND(
      |    (CAST(s1a AS DOUBLE) / NULLIF(n_a, 0) - CAST(s1b AS DOUBLE) / NULLIF(n_b, 0)) /
      |    SQRT(
      |      ((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / NULLIF(n_a, 0))
      |        / NULLIF(n_a - 1, 0) / NULLIF(n_a, 0)) +
      |      ((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / NULLIF(n_b, 0))
      |        / NULLIF(n_b - 1, 0) / NULLIF(n_b, 0))), 4) AS t
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- AUC
  /** Rank-based AUC (r12) — does `value` separate purchases from
    * non-purchases? The Mann–Whitney/AUC census every model-quality or
    * feature-screening pipeline runs, decomposed to scale: AUC compares
    * every (positive, negative) pair, but grouped by score it collapses
    * to one pass over the SCORE HISTOGRAM — U·2 = Σ_b np(b)·(2·negs
    * below b + nn(b)), ties counting ½ (hence the ×2 to stay integral).
    * Scores quantized to cents (floor(value·100): the histogram bound is
    * the VALUE RANGE ×100 ≤ ~10⁴ buckets — the q_stats_ks posture, one
    * resolution notch finer), so the cumulative window runs over the
    * bounded histogram frame, never raw rows.
    *
    * Output: one row — n_pos, n_neg, u_x2 (exact), auc_x1e6 = U·10⁶ div
    * (n_pos·n_neg) (exact integer; ≈ 500000 for this data's independent
    * value draw), auc rounded 6 for readability. The pair-mass terms
    * (u_x2, n_pos·n_neg) are DECIMAL(38,0) from CONSTRUCTION (r14, the
    * q_stats_psi pattern): past ~10¹² pos·neg pairs the int64 forms
    * would error under ANSI Spark (4.x default) / wrap in non-ANSI — the
    * lift keeps the statistic exact to ~10³⁸. The emitted u_x2
    * diagnostic stays int64 (contract schema); past ITS bound the final
    * cast fails loudly while auc/auc_x1e6 — computed from the wide
    * intermediates — stay correct (planted near-bound proof in
    * DecimalBoundSpec via [[statsAucFromHist]]). */
  def statsAuc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = events(s, dir)
      .select(floor($"value" * 100).cast(LongType).as("b"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("is_p"))
      .groupBy($"b")
      .agg(sum($"is_p").as("np"), sum(lit(1L) - $"is_p").as("nn"))
    statsAucFromHist(s, hist)
      .select($"n_pos", $"n_neg", $"u_x2".cast(LongType).as("u_x2"),
        $"auc_x1e6", $"auc")
  }

  /** [[statsAuc]] core over a (b, np, nn) score histogram — the
    * DECIMAL(38,0) wide path, exposed (u_x2 uncast) so DecimalBoundSpec
    * can plant a near-int64-bound histogram and prove auc stays exact
    * where int64 pair mass wrapped/errored. */
  private[graft] def statsAucFromHist(s: SparkSession,
      hist: DataFrame): DataFrame = {
    import s.implicits._
    val wCum = Window.orderBy($"b").rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cum_nn", coalesce(sum($"nn").over(wCum), lit(0L)))
      // the per-bucket product is the first pair-mass term — lift BEFORE
      // it forms, not at the sum
      .agg(sum($"np".cast("decimal(38,0)") * ($"cum_nn" * 2L + $"nn")).as("u_x2"),
        sum($"np").as("n_pos"), sum($"nn").as("n_neg"))
      .select($"n_pos", $"n_neg", $"u_x2".cast("decimal(38,0)").as("u_x2"),
        // NULLIF keeps the degenerate one-class census (no positives or
        // no negatives) a NULL in BOTH engines — DuckDB's integer // 0
        // ERRORS where Spark's div returns null, so the guard is what
        // makes the twin queries agree, not decoration. The divisor
        // lifts to DECIMAL too (n_pos·n_neg is itself pair mass).
        expr("""(CAST(u_x2 AS DECIMAL(38,0)) * 500000L)
               | div nullif(CAST(n_pos AS DECIMAL(38,0)) * n_neg, 0)"""
          .stripMargin).as("auc_x1e6"),
        round($"u_x2".cast("double") /
            expr("CAST(nullif(CAST(n_pos AS DECIMAL(38,0)) * n_neg * 2, 0) AS DOUBLE)"),
          6).as("auc"))
  }

  val statsAucSql: String =
    """WITH h AS (
      |  SELECT CAST(FLOOR(value * 100) AS BIGINT) AS b,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS nn
      |  FROM events GROUP BY b),
      |c AS (
      |  SELECT np, nn,
      |    COALESCE(SUM(nn) OVER (ORDER BY b
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
      |  FROM h)
      |SELECT CAST(SUM(np) AS BIGINT) AS n_pos, CAST(SUM(nn) AS BIGINT) AS n_neg,
      |  CAST(SUM(CAST(np AS HUGEINT) * (cum_nn * 2 + nn)) AS BIGINT) AS u_x2,
      |  CAST((SUM(CAST(np AS HUGEINT) * (cum_nn * 2 + nn)) * 500000)
      |    // NULLIF(CAST(SUM(np) AS HUGEINT) * SUM(nn), 0) AS BIGINT) AS auc_x1e6,
      |  ROUND(CAST(SUM(CAST(np AS HUGEINT) * (cum_nn * 2 + nn)) AS DOUBLE)
      |        / CAST(NULLIF(CAST(SUM(np) AS HUGEINT) * SUM(nn) * 2, 0) AS DOUBLE), 6) AS auc
      |FROM c""".stripMargin

  // ---------------------------------------------------------------- linreg
  /** Per-type OLS trend (r13) — the TREND sibling of the drift family:
    * q_corpus_drift / q_stats_ks ask "did the distribution move between
    * two snapshots"; this asks "is the daily volume per event type
    * systematically rising or falling over the whole span" — the
    * capacity-planning / ingest-monitoring regression every pipeline
    * dashboard fits. Closed-form least squares over the ZERO-FILLED
    * (type, day) census: slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) with
    * x = day − d0 (centering keeps products small).
    *
    * Determinism: the five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    * are exact int64 (day counts × span-bounded x: n·Σxy ≲ 10¹³ at
    * sf0.1, ~10¹⁶ at 1000× — far inside int64); slope/intercept emit as
    * ROUND(num/den, 6) — one correctly-rounded double division of two
    * exact integers, identical in both engines (R4), NULLIF-guarded for
    * a single-day span (the q_stats_auc degenerate-census discipline).
    * Zero-fill matters: missing (type, day) cells read as y=0, not as
    * absent x positions that would silently shift the fit.
    *
    * Scale: the regression frame is the (type, day) HISTOGRAM — bounded
    * by |types|·span, never event rows (q_stats_ks posture); day bounds
    * ride a one-row broadcast (sample_weighted contract); one map-side-
    * partial hash agg over the fact table, everything after runs on the
    * bounded frame. */
  def statsLinreg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select($"event_type",
      floor(epochS($"ts") / 86400L).cast(LongType).as("day"))
    val bounds = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val daily = ev.groupBy($"event_type", $"day").agg(count(lit(1)).as("y"))
    val spine = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(sequence($"d0", $"d1")).as("day"), $"d0")
    val sums = spine.join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", ($"day" - $"d0").as("x"),
        coalesce($"y", lit(0L)).as("y"))
      .groupBy($"event_type").agg(
        count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
    sums.select($"event_type", $"n", $"sy".as("total"),
        expr("n * sxy - sx * sy").as("s_num"),
        expr("nullif(n * sxx - sx * sx, 0L)").as("s_den"))
      .select($"event_type", $"n", $"total", $"s_num",
        coalesce($"s_den", lit(0L)).as("s_den"),
        round($"s_num".cast("double") / $"s_den".cast("double"), 6)
          .as("slope"))
      .orderBy($"event_type")
  }

  val statsLinregSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(FLOOR(FLOOR(epoch(ts)) / 86400) AS BIGINT) AS day
      |  FROM events),
      |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
      |daily AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS y
      |          FROM ev GROUP BY 1, 2),
      |spine AS (
      |  SELECT t.event_type, unnest(generate_series(b.d0, b.d1)) AS day, b.d0
      |  FROM (SELECT DISTINCT event_type FROM daily) t, b),
      |f AS (
      |  SELECT spine.event_type, spine.day - spine.d0 AS x, COALESCE(y, 0) AS y
      |  FROM spine LEFT JOIN daily
      |    ON spine.event_type = daily.event_type AND spine.day = daily.day),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM f GROUP BY 1)
      |SELECT event_type, n, sy AS total,
      |  n * sxy - sx * sy AS s_num,
      |  COALESCE(NULLIF(n * sxx - sx * sx, 0), 0) AS s_den,
      |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
      |        / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6) AS slope
      |FROM m ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- gini
  /** Revenue-concentration Gini (r13) — the INEQUALITY census next to
    * q_skew_diagnose (key skew) and q_rfm_segment (per-customer scoring):
    * one number answering "how concentrated is revenue across customers",
    * the whale-dependence metric every marketplace tracks. Per-customer
    * revenue quantized to exact k$ units (DECIMAL cent sums → integer
    * div; the statistic is DEFINED at k$ resolution — the q_stats_ks
    * integer-binning posture, so the histogram bound is the VALUE RANGE
    * in k$, constant in corpus size).
    *
    * Grouped exact form: over ascending distinct values v with counts c
    * and B = customers strictly below, Σᵢ i·yᵢ = Σ v·(c·B + c(c+1)/2),
    * and G = (2T − S(n+1)) / (nS) — a SINGLE division (a difference of
    * two floored divisions would not telescope). The pair-mass terms are
    * DECIMAL(38,0) from CONSTRUCTION (r14, completing the r13 lift that
    * covered only the scaled numerator): T ~ v·n² leaves int64 around
    * 10× sf0.1, where ANSI Spark (4.x default) errors / non-ANSI wraps —
    * the lift happens before the first v·c·B product forms, using
    * 2T = Σ v·c·(2B + c + 1) (every term even, so T = Σ/2 is exact).
    * The emitted t diagnostic stays int64 (contract schema); past ITS
    * bound the final cast fails loudly while gini_ppm — computed from
    * the wide intermediates — stays correct (planted near-bound proof in
    * DecimalBoundSpec via [[statsGiniFromHist]]).
    *
    * Scale: customer-keyed agg with map-side partials → k$ histogram
    * (range-bounded) → cumulative window over the bounded frame → one
    * row. Nothing is ranked per customer; the sort cost is the
    * histogram's, not the population's. */
  def statsGini(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = orders(s, dir)
      .groupBy($"o_custkey").agg(sum(dec2($"o_totalprice")).as("rev"))
      .select(expr("cast(floor(rev / 1000) as bigint)").as("v"))
      .groupBy($"v").agg(count(lit(1)).as("c"))
    statsGiniFromHist(s, hist)
      .select($"n", $"s", $"t".cast(LongType).as("t"), $"gini_ppm")
  }

  /** [[statsGini]] core over a (v, c) value histogram — the DECIMAL(38,0)
    * wide path, exposed (wide t uncast) so DecimalBoundSpec can plant a
    * near-int64-bound histogram and prove gini_ppm stays exact where the
    * int64 form wrapped/errored. */
  private[graft] def statsGiniFromHist(s: SparkSession,
      hist: DataFrame): DataFrame = {
    import s.implicits._
    val wB = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("b", coalesce(sum($"c").over(wB), lit(0L)))
      // t2 = 2T = Σ v·c·(2B + c + 1); v lifts BEFORE the product forms
      .agg(sum($"c").as("n"), sum($"v" * $"c").as("s"),
        sum($"v".cast("decimal(38,0)") * $"c" * ($"b" * 2L + $"c" + 1L)).as("t2"))
      .select($"n", $"s",
        expr("CAST(t2 / 2 AS DECIMAL(38,0))").as("t"),
        expr("""CAST(((t2 - CAST(s AS DECIMAL(38,0)) * (n + 1L)) * 1000000L)
               |     div nullif(CAST(n AS DECIMAL(38,0)) * s, 0) AS BIGINT)"""
          .stripMargin).as("gini_ppm"))
  }

  val statsGiniSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2))) / 1000) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM rev GROUP BY 1),
      |cum AS (
      |  SELECT v, c, COALESCE(SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
      |  FROM h),
      |m AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(v * c) AS BIGINT) AS s,
      |    SUM(CAST(v AS HUGEINT) * c * (2 * b + c + 1)) AS t2
      |  FROM cum)
      |SELECT n, s, CAST(t2 // 2 AS BIGINT) AS t,
      |  CAST(((t2 - CAST(s AS HUGEINT) * (n + 1)) * 1000000)
      |       // NULLIF(CAST(n AS HUGEINT) * s, 0) AS BIGINT) AS gini_ppm
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- benford
  /** Benford first-digit census (r13) — the forensic data-quality gate:
    * naturally-grown multiplicative quantities (prices, populations,
    * transaction amounts) follow log₁₀(1+1/d) first-digit frequencies;
    * fabricated or truncated feeds don't. Per first significant digit of
    * floor(o_totalprice): observed count, observed ppm, the Benford
    * expectation ppm, and the signed deviation — the 9-row report an
    * ingest monitor thresholds.
    *
    * Determinism: the digit is the first character of the INTEGER cast
    * to string (no float log10 anywhere; totalprice ≥ 1 in this schema,
    * so a leading-zero branch never arises); observed ppm is exact int64
    * cross-multiplication; the expected ppm values are the same 9
    * integer literals in both engines (pre-rounded log₁₀(1+1/d)·10⁶ —
    * constants, not computed, so no libm variance). Scale: ONE map-side-
    * partial hash agg to ≤9 rows; the share window runs over that
    * 9-row frame. */
  def statsBenford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val expPpm = expr(
      """CASE digit WHEN 1 THEN 301030L WHEN 2 THEN 176091L WHEN 3 THEN 124939L
        |  WHEN 4 THEN 96910L WHEN 5 THEN 79181L WHEN 6 THEN 66947L
        |  WHEN 7 THEN 57992L WHEN 8 THEN 51153L ELSE 45757L END""".stripMargin)
    val wAll = Window.partitionBy()
    orders(s, dir)
      .select(substring(floor($"o_totalprice").cast(LongType).cast("string"), 1, 1)
        .cast(LongType).as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
      .withColumn("total", sum($"n").over(wAll))
      .select($"digit", $"n",
        expr("(n * 1000000L) div total").as("obs_ppm"),
        expPpm.as("exp_ppm"))
      .withColumn("dev_ppm", $"obs_ppm" - $"exp_ppm")
      .orderBy($"digit")
  }

  val statsBenfordSql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
      |              AS BIGINT) AS digit
      |  FROM orders),
      |h AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
      |t AS (SELECT digit, n, CAST(SUM(n) OVER () AS BIGINT) AS total FROM h)
      |SELECT digit, n, (n * 1000000) // total AS obs_ppm,
      |  CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
      |    WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
      |    WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END AS exp_ppm,
      |  (n * 1000000) // total
      |    - (CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
      |         WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
      |         WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END) AS dev_ppm
      |FROM t ORDER BY digit""".stripMargin

  // ---------------------------------------------------------------- balanced sample
  /** Class-balanced downsample (r13) — the label-equalization sampler
    * completing the family: stratified keeps a FIXED k per class,
    * temperature/rebalance reweight by softened shares; this one caps
    * every language at the MINORITY class count (the classifier-training
    * "undersample the majority" staple), keeping the first `cap` docs
    * per language in content-hash order so the draw is reproducible
    * under any partitioning or ingest order (sample_hash contract).
    *
    * Determinism: selection order is (md5(text), doc_id) — content-keyed
    * with a unique tiebreak (R1); the cap is a one-row broadcast of the
    * min class count. Emits the kept (lang, rk, doc_id, h) rows — the
    * actual sample, so the oracle hashes WHICH docs were chosen, not
    * just how many.
    *
    * Scale: the rank window partitions by lang with a data-dependent cap,
    * so no constant-k WindowGroupLimit applies; the per-class sort is
    * bounded by the largest class. At 100 TB the two-pass refinement
    * (hash-prefix histogram → per-class threshold → row-local filter,
    * the curriculumOrder fallback shape) replaces the full per-class
    * sort; at contract scale the direct rank is the honest spelling. */
  def sampleBalanced(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir).select($"lang", $"doc_id", md5($"text").as("h"))
    val cap = docs.groupBy($"lang").agg(count(lit(1)).as("cnt"))
      .agg(min($"cnt").as("cap"))
    val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
    docs.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(cap))
      .where($"rk" <= $"cap")
      .select($"lang", $"rk", $"doc_id", $"h")
      .orderBy($"lang", $"rk")
  }

  val sampleBalancedSql: String =
    """WITH cap AS (
      |  SELECT MIN(cnt) AS cap FROM (
      |    SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1)),
      |r AS (
      |  SELECT lang, doc_id, md5(text) AS h,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
      |  FROM documents)
      |SELECT lang, rk, doc_id, h FROM r, cap WHERE rk <= cap.cap
      |ORDER BY lang, rk""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_stats_linreg"   -> statsLinregSql,
    "q_stats_gini"     -> statsGiniSql,
    "q_stats_benford"  -> statsBenfordSql,
    "q_sample_balanced" -> sampleBalancedSql,
    "q_mix_rebalance"  -> mixRebalanceSql,
    "q_sample_temperature" -> sampleTemperatureSql,
    "q_shuffle_epoch"  -> shuffleEpochSql,
    "q_stats_auc"      -> statsAucSql,
    "q_stats_ttest"    -> statsTtestSql,
    "q_quality_gopher" -> qualityGopherSql,
    "q_curriculum_order" -> curriculumOrderSql,
    "q_skew_diagnose"  -> skewDiagnoseSql,
    "q_text_pii_mask"  -> piiMaskSql,
    "q_sample_hash"    -> sampleHashSql,
    "q_sample_weighted" -> sampleWeightedSql,
    "q_sample_split"   -> sampleSplitSql,
    "q_agg_salted"     -> aggSaltedSql,
    "q_win_cume_dist"  -> winCumeDistSql,
    "q_stats_corr"     -> statsCorrSql,
    "q_ngram_freq"     -> ngramFreqSql,
    "q_topk_agg"       -> topkAggSql,
    "q_win_range_frame" -> winRangeFrameSql,
    "q_unpivot"        -> unpivotMetricsSql,
    "q_embed_quantize" -> embedQuantizeSql,
    "q_agg_mode"       -> aggModeSql,
    "q_regex_extract"  -> regexExtractSql,
    "q_quality_c4"     -> qualityC4Sql,
    "q_stats_entropy"  -> statsEntropySql,
    "q_sample_reservoir" -> sampleReservoirSql,
    "q_stats_ks"       -> statsKsSql,
    "q_stats_psi"      -> statsPsiSql,
    "q_stats_chi2"     -> statsChi2Sql,
    "q_anomaly_mad"    -> anomalyMadSql,
    "q_schema_profile" -> schemaProfileSql)
}
