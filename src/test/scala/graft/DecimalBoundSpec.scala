package graft

import graft.ops.{Curation, TimeWindows}

/** Planted near-int64-bound proofs for the DECIMAL(38,0)-at-construction
  * lifts (VERDICT r13 #2): q_ts_acf, q_stats_auc, q_stats_gini, and
  * (r14 second batch, closing the audit) q_stats_ks.
  *
  * Each test injects a histogram whose quadratic terms EXCEED
  * Long.MaxValue (asserted explicitly, so the plant really is past the
  * bound the old int64 arithmetic had — where ANSI Spark 4 errored and
  * non-ANSI wrapped silently), runs the wide core, and compares every
  * wide value and derived statistic against exact BigInt arithmetic
  * computed independently here. The contract-facing queries themselves
  * stay hash-checked at all SFs by the driver oracle; these specs cover
  * the region the test corpus cannot reach.
  */
class DecimalBoundSpec extends SparkTestBase {

  private def assertDec(actual: java.math.BigDecimal, expected: BigInt,
      clue: String): Unit = {
    assert(actual != null, clue)
    // compareTo, not equals: equals is scale-sensitive and the wire scale
    // is a plan detail
    assert(actual.compareTo(new java.math.BigDecimal(expected.bigInteger)) == 0,
      s"$clue: $actual != $expected")
  }

  private def round6(num: BigInt, den: BigInt): Double = {
    // the engines' shared path: one double division of the exact wide
    // integers (decimal→double casts are correctly rounded at any size),
    // then round-half-up at 6
    val d = num.toDouble / den.toDouble
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("ts_acf: den > int64 — decimal path matches exact BigInt arithmetic") {
    import spark.implicits._
    // 10 hourly buckets with multi-billion counts (so every lag 1..6 has
    // pairs): dev_t = n·x_t − Σx, den = Σ dev² ≈ 10²² — far past int64.
    val xs = Seq(0L, 4000000000L, 0L, 8000000000L, 0L,
      2000000000L, 0L, 6000000000L, 0L, 1000000000L)
    val hist = xs.zipWithIndex.map { case (x, h) => (h.toLong, x) }
      .toDF("h", "x")
    val n = BigInt(xs.size)
    val sx = xs.map(BigInt(_)).sum
    val dev = xs.map(x => n * x - sx)
    val den = dev.map(d => d * d).sum
    assert(den > BigInt(Long.MaxValue), "plant must exceed the int64 bound")
    val nums = (1 to 6).map { k =>
      k.toLong -> dev.dropRight(k).zip(dev.drop(k)).map { case (a, b) => a * b }.sum
    }.toMap
    val rows = TimeWindows.tsAcfFromHist(spark, hist)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === (1L to 6L).toSet)
    (1L to 6L).foreach { k =>
      val r = rows(k)
      assertDec(r.getDecimal(1), nums(k), s"num lag $k")
      assertDec(r.getDecimal(2), den, s"den lag $k")
      assert(r.getDouble(3) === round6(nums(k), den), s"acf lag $k")
    }
  }

  test("stats_auc: pair mass > int64 — decimal path matches exact BigInt arithmetic") {
    import spark.implicits._
    // two score buckets, ~5·10⁹ rows per class: n_pos·n_neg = 2.5·10¹⁹
    // and u_x2 = 10¹⁹ — both past int64.
    val hist = Seq((1L, 4000000000L, 1000000000L), (2L, 1000000000L, 4000000000L))
      .toDF("b", "np", "nn")
    val nPos = BigInt(5000000000L)
    val nNeg = BigInt(5000000000L)
    // u_x2 = Σ np·(2·cum_nn + nn) over ascending b
    val uX2 = BigInt(4000000000L) * (2 * BigInt(0) + BigInt(1000000000L)) +
      BigInt(1000000000L) * (2 * BigInt(1000000000L) + BigInt(4000000000L))
    assert(uX2 > BigInt(Long.MaxValue), "plant must exceed the int64 bound")
    assert(nPos * nNeg > BigInt(Long.MaxValue))
    val r = Curation.statsAucFromHist(spark, hist).collect().head
    assert(r.getLong(0) === nPos.toLong)
    assert(r.getLong(1) === nNeg.toLong)
    assertDec(r.getDecimal(2), uX2, "u_x2")
    assert(r.getLong(3) === ((uX2 * 500000) / (nPos * nNeg)).toLong, "auc_x1e6")
    assert(r.getDouble(4) === round6(uX2, nPos * nNeg * 2), "auc")
  }

  test("stats_gini: T > int64 — decimal path matches exact BigInt arithmetic") {
    import spark.implicits._
    // two k$ values with billions of customers each: T ~ v·n² ≈ 3.5·10²⁴
    val hist = Seq((1L, 3000000000L), (1000000L, 1000000000L)).toDF("v", "c")
    // t2 = Σ v·c·(2B + c + 1), ascending v, B = customers strictly below
    val t2 = BigInt(1) * BigInt(3000000000L) * (2 * BigInt(0) + BigInt(3000000000L) + 1) +
      BigInt(1000000L) * BigInt(1000000000L) * (2 * BigInt(3000000000L) + BigInt(1000000000L) + 1)
    val n = BigInt(4000000000L)
    val s = BigInt(1) * BigInt(3000000000L) + BigInt(1000000L) * BigInt(1000000000L)
    assert(t2 / 2 > BigInt(Long.MaxValue), "plant must exceed the int64 bound")
    val r = Curation.statsGiniFromHist(spark, hist).collect().head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === s.toLong)
    assertDec(r.getDecimal(2), t2 / 2, "wide T")
    // gini_ppm = (2T − S(n+1))·10⁶ div (n·S), floored integral division
    val expectedPpm = ((t2 - s * (n + 1)) * 1000000) / (n * s)
    assert(r.getLong(3) === expectedPpm.toLong, "gini_ppm")
  }

  test("stats_ks: gap > int64 — decimal path matches exact BigInt arithmetic") {
    import spark.implicits._
    // two buckets, billions per side: at bucket 1, cum_a·nb ≈ 3.2·10¹⁹
    // and the gap ≈ 2.8·10¹⁹ — past int64.
    val hist = Seq((1L, 4000000000L, 1000000000L), (2L, 1000000000L, 4000000000L))
      .toDF("bucket", "ca", "cb")
    val na = BigInt(5000000000L)
    val nb = BigInt(5000000000L)
    // argmax gap is at bucket 1: |cum_a·nb − cum_b·na|
    val gap1 = (BigInt(4000000000L) * nb - BigInt(1000000000L) * na).abs
    val gap2 = (na * nb - nb * na).abs // bucket 2 closes both ECDFs: 0
    assert(gap1 > BigInt(Long.MaxValue), "plant must exceed the int64 bound")
    assert(gap2 < gap1)
    val r = Curation.statsKsFromHist(spark, hist).collect().head
    assert(r.getLong(0) === 1L, "ks_bucket argmax")
    assert(r.getLong(1) === na.toLong)
    assert(r.getLong(2) === nb.toLong)
    assertDec(r.getDecimal(3), gap1, "gap_num")
    assert(r.getDouble(4) === round6(gap1, na * nb), "ks")
  }

  test("stats_ks: past-bound gap RAISES on the int64 contract projection " +
      "(ANSI-independent — non-ANSI would otherwise silently NULL)") {
    import spark.implicits._
    val hist = Seq((1L, 4000000000L, 1000000000L), (2L, 1000000000L, 4000000000L))
      .toDF("bucket", "ca", "cb")
    val ex = intercept[Exception] {
      Curation.statsKsInt64(spark, hist).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("gap_num exceeds the int64")),
      s"want the explicit raise, got: $ex")
    // and an in-bound histogram still projects cleanly to int64
    val small = Seq((1L, 40L, 10L), (2L, 10L, 40L)).toDF("bucket", "ca", "cb")
    val ok = Curation.statsKsInt64(spark, small).collect().head
    assert(ok.getLong(3) === (BigInt(40) * 50 - BigInt(10) * 50).abs.toLong)
  }

  test("stats_ttest: Σc² > int64 — wide t matches exact arithmetic; contract " +
      "projection raises past bound and stays clean in-bound") {
    import org.apache.spark.sql.functions.{expr, lit}
    // planted one-row partials: 2·10¹² rows per side at ~5000 cents →
    // Σc² ≈ 6·10¹⁹, past int64 (the region the r16 decimal lift opens)
    val nA = 2000000000000L; val nB = 2000000000000L
    val s1A = 10000500000000000L; val s1B = 10000000000000000L
    val s2A = BigInt("60000000000000000000")
    val s2B = BigInt("55000000000000000000")
    assert(s2A > BigInt(Long.MaxValue) && s2B > BigInt(Long.MaxValue),
      "plant must exceed the int64 bound")
    val parts = spark.range(1).select(
      lit(nA).as("n_a"), lit(nB).as("n_b"),
      lit(s1A).as("s1a"), lit(s1B).as("s1b"),
      expr(s"CAST('$s2A' AS DECIMAL(38,0))").as("s2a_w"),
      expr(s"CAST('$s2B' AS DECIMAL(38,0))").as("s2b_w"))
    // the engines' shared double path, operand-for-operand
    def round(d: Double, sc: Int): Double =
      BigDecimal(d).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (naD, nbD) = (nA.toDouble, nB.toDouble)
    val (s1aD, s1bD) = (s1A.toDouble, s1B.toDouble)
    val s2aD = new java.math.BigDecimal(s2A.bigInteger).doubleValue
    val s2bD = new java.math.BigDecimal(s2B.bigInteger).doubleValue
    val expectedT = round(
      (s1aD / naD - s1bD / nbD) /
      math.sqrt((s2aD - s1aD * s1aD / naD) / (nA - 1L).toDouble / naD +
                (s2bD - s1bD * s1bD / nbD) / (nB - 1L).toDouble / nbD), 4)
    // selecting t alone prunes the raise-guarded diagnostics away — the
    // wide path keeps working past the contract columns' bound
    val wide = Curation.statsTtestFromParts(spark, parts)
      .select("mean_a_c", "mean_b_c", "t").collect().head
    assert(wide.getDouble(0) === round(s1aD / naD, 6), "mean_a_c")
    assert(wide.getDouble(1) === round(s1bD / nbD, 6), "mean_b_c")
    assert(wide.getDouble(2) === expectedT, "t")
    // the full contract projection raises loudly instead of NULLing s2a
    val ex = intercept[Exception] {
      Curation.statsTtestFromParts(spark, parts).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("s2a exceeds the int64")),
      s"want the explicit raise, got: $ex")
    // in-bound partials still project cleanly to the int64 diagnostics
    val small = spark.range(1).select(
      lit(4L).as("n_a"), lit(4L).as("n_b"),
      lit(400L).as("s1a"), lit(440L).as("s1b"),
      expr("CAST(40400 AS DECIMAL(38,0))").as("s2a_w"),
      expr("CAST(48500 AS DECIMAL(38,0))").as("s2b_w"))
    val ok = Curation.statsTtestFromParts(spark, small).collect().head
    assert(ok.getLong(4) === 40400L && ok.getLong(5) === 48500L)
    val expectedSmallT = round(
      (100.0 - 110.0) /
      math.sqrt((40400.0 - 400.0 * 400.0 / 4.0) / 3.0 / 4.0 +
                (48500.0 - 440.0 * 440.0 / 4.0) / 3.0 / 4.0), 4)
    assert(ok.getDouble(8) === expectedSmallT, "in-bound t")
  }

  private def exactChi2(m: Map[(String, String), BigInt])
      : (BigInt, Map[(String, String), (BigInt, BigInt)], BigInt) = {
    val n = m.values.sum
    def row(l: String) = m.collect { case ((a, _), v) if a == l => v }.sum
    def col(c: String) = m.collect { case ((_, b), v) if b == c => v }.sum
    val per = m.map { case ((l, c), o) =>
      val diff = o * n - row(l) * col(c)
      ((l, c), (row(l) * col(c) * 1000000 / n,
        diff * diff * BigInt(1000000000L) / (n * row(l) * col(c))))
    }
    (n, per, per.values.map(_._2).sum)
  }

  test("stats_chi2: n*row*col and O*N > int64 — decimal path matches exact " +
      "BigInt arithmetic") {
    import spark.implicits._
    // near-balanced 2×2 at N = 8·10⁹: the divisor n·row·col = 1.28·10²⁹,
    // exp_ppm's numerator 1.6·10²⁵, and O·N ≈ 1.6·10¹⁹ all exceed int64
    // (the r11 form wrapped every one of them silently), while the ±1000
    // imbalance keeps |diff| = 8·10¹² inside the DECIMAL(38,0) square
    // ceiling so the exact-ppb contract is still representable.
    val a = 2000001000L; val b = 1999999000L
    val cells = Seq(
      ("en", "web", a), ("en", "book", b),
      ("de", "web", b), ("de", "book", a)).toDF("lang", "source", "n_obs")
    val m = Map[(String, String), BigInt](
      ("en", "web") -> BigInt(a), ("en", "book") -> BigInt(b),
      ("de", "web") -> BigInt(b), ("de", "book") -> BigInt(a))
    val (n, per, chi2) = exactChi2(m)
    assert(BigInt(a) * n > BigInt(Long.MaxValue), "O*N plant must exceed int64")
    assert(n * (n / 2) * (n / 2) > BigInt(Long.MaxValue), "divisor plant must exceed int64")
    assert(chi2 > 0, "plant must not be exactly independent")
    val rows = Curation.statsChi2FromCells(spark, cells).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(3) === per(k)._1.toLong, s"exp_ppm $k")
      assert(r.getLong(4) === per(k)._2.toLong, s"contrib_ppb $k")
      assert(r.getLong(5) === chi2.toLong, s"chi2_ppb $k")
    }
  }

  test("stats_chi2: past-ceiling plants RAISE instead of wrapping/NULLing") {
    import spark.implicits._
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    // |diff| past ⌊√(10³⁸/10⁹)⌋: an unbalanced billions-scale table whose
    // diff ≈ 10¹⁹ would make diff²·10⁹ exceed DECIMAL(38,0) — non-ANSI
    // Spark would NULL the product and sum a silently-wrong chi2
    val unbalanced = Seq(
      ("en", "web", 3000000000L), ("en", "book", 1000000000L),
      ("de", "web", 1000000000L), ("de", "book", 4000000000L))
      .toDF("lang", "source", "n_obs")
    val ex1 = intercept[Exception] {
      Curation.statsChi2FromCells(spark, unbalanced).collect()
    }
    assert(messages(ex1).exists(_.contains("DECIMAL(38,0) square ceiling")),
      s"want the diff-ceiling raise, got: $ex1")
    // N past the ppb contract ceiling (contrib_ppb bound N·10⁹ > int64)
    val tooBig = Seq(
      ("en", "web", 5000000000L), ("en", "book", 5000000000L))
      .toDF("lang", "source", "n_obs")
    val ex2 = intercept[Exception] {
      Curation.statsChi2FromCells(spark, tooBig).collect()
    }
    assert(messages(ex2).exists(_.contains("ppb contract ceiling")),
      s"want the N-ceiling raise, got: $ex2")
  }

  test("skew_diagnose: cnt*1e6 and cnt*100*n_keys > int64 — decimal path " +
      "matches exact BigInt arithmetic") {
    import spark.implicits._
    // two 10¹³-row hot keys in a 10002-key fact: cnt·10⁶ = 10¹⁹ and
    // cnt·100·n_keys ≈ 10¹⁹ both exceed int64 (the r9 form wrapped both —
    // on exactly the keys the profiler exists to flag loudest)
    val hot = Seq((1L, 10000000000000L), (2L, 10000000000000L))
    val cold = (3L until 10003L).map(k => (k, 1000000L))
    val perKey = (hot ++ cold).toDF("user_id", "cnt")
    val total = BigInt(2) * BigInt(10000000000000L) + BigInt(10000) * 1000000
    val nKeys = BigInt(10002)
    assert(BigInt(10000000000000L) * 1000000 > BigInt(Long.MaxValue))
    assert(BigInt(10000000000000L) * 100 * nKeys > BigInt(Long.MaxValue))
    val rows = Curation.skewDiagnoseFromCounts(spark, perKey).collect()
    assert(rows.length === 20)
    // the two hot keys lead (cnt DESC), then cold ties break on user_id
    assert(rows.take(2).map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows.drop(2).map(_.getLong(0)).toSeq === (3L until 21L).toSeq)
    val hotRow = rows.head
    assert(hotRow.getLong(2) === (BigInt(10000000000000L) * 1000000 / total).toLong,
      "share_ppm")
    assert(hotRow.getLong(3) === (BigInt(10000000000000L) * 100 * nKeys / total).toLong,
      "vs_mean_x100")
    assert(hotRow.getBoolean(4), "a ~5000x-mean key must read hot")
    val coldRow = rows.last
    assert(coldRow.getLong(2) === (BigInt(1000000L) * 1000000 / total).toLong)
    assert(!coldRow.getBoolean(4))
  }
}
