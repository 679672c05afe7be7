package graft

import graft.ops.{Advanced, Aggregations, Curation, Joins, LlmText, LlmVector, TimeWindows}

/** Semantic checks for the round-4 operator additions (count window, CEP
  * burst, funnel, cohort, conditional agg, right join, tf-idf, normalize,
  * stratified sample, centroid) on the real sf0.001 data — each assertion
  * recomputes the property a different way than the operator does. */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._
  private val dir = sf("sf0.001")

  test("q_ts_fill_forward: census recomputes from a driver-side LOCF replay") {
    val rows = TimeWindows.tsFillForward(spark, dir)
      .select("user_id", "n_events", "n_cold", "n_carried", "sum_filled_c")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"),
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect()
    val expect = evs.groupBy(_._1).map { case (u, es) =>
      var lastC: Option[Long] = None
      var (cold, carried, sum) = (0L, 0L, 0L)
      es.sortBy(e => (e._3, e._2)).foreach { case (_, _, _, typ, v) =>
        val pc = if (typ == "purchase") Some(math.floor(v * 100).toLong) else None
        pc.foreach(c => lastC = Some(c))
        lastC match {
          case None => cold += 1
          case Some(c) => if (pc.isEmpty) carried += 1; sum += c
        }
      }
      u -> ((es.length.toLong, cold, carried, sum))
    }
    assert(rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap === expect)
    // every user partitions into cold + first-observation rows + carried
    rows.foreach { case (u, n, cold, carried, _) =>
      assert(cold + carried <= n, s"user $u: census exceeds events") }
  }

  test("q_text_keywords: exactly ≤3 per doc, scores recompute from tf/df, rank order total") {
    val rows = LlmText.textKeywords(spark, dir)
      .select("doc_id", "rk", "token", "tf", "df", "score")
      .as[(Long, Int, String, Long, Long, Long)].collect().toSeq
    // driver-side tf/df recompute
    val docs = graft.tables.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tf = docs.flatMap { case (id, t) =>
      t.trim.split(" ").map(tok => (id, tok)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (id, rk, tok, tfv, dfv, score) =>
      assert(tfv === tf((id, tok)), s"doc $id $tok tf")
      assert(dfv === df(tok), s"doc $id $tok df")
      assert(score === tfv * 1000000L / dfv, s"doc $id $tok score")
      assert(rk >= 1 && rk <= 3)
    }
    // per-doc: ranks are 1..k and scores non-increasing with token tiebreak
    rows.groupBy(_._1).foreach { case (id, ks) =>
      val sorted = ks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._6 > b._6 || (a._6 === b._6 && a._3 < b._3),
            s"doc $id: rank order violated")
        case _ => ()
      }
      // top-1 really is the max score over the doc's full vocabulary
      val docBest = tf.collect { case ((d, tok), v) if d == id =>
        (v * 1000000L / df(tok), tok) }
      assert(sorted.head._6 === docBest.map(_._1).max, s"doc $id: top-1 not max")
    }
    assert(rows.map(_._1).distinct.length.toLong === docs.length.toLong,
      "every doc gets keywords")
  }

  test("q_join_asof_nearest: each match is the true |Δt|-closest in-band click") {
    val rows = Advanced.joinAsofNearest(spark, dir)
      .select("user_id", "purchase_id", "p_t", "click_id", "c_t", "dt_s")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"),
        $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val clicks = evs.filter(_._4 == "click").groupBy(_._1)
    val purchases = evs.filter(_._4 == "purchase")
    val expect = purchases.flatMap { case (u, pid, pt, _) =>
      val cand = clicks.getOrElse(u, Array.empty[(Long, Long, Long, String)])
        .filter(c => math.abs(pt - c._3) <= 3600L)
      if (cand.isEmpty) None
      else {
        val best = cand.minBy(c => (math.abs(pt - c._3), c._3, c._2))
        Some((u, pid, pt, best._2, best._3, pt - best._3))
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(rows === expect)
    assert(rows.forall(r => math.abs(r._6) <= 3600L), "tolerance violated")
    // both directions must occur on real data (nearest, not backward-only)
    assert(rows.exists(_._6 > 0) && rows.exists(_._6 < 0),
      "data exercises only one direction — tolerance too tight")
  }

  test("q_count_window: per-user buckets are consecutive, full except the last") {
    val rows = TimeWindows.countWindow(spark, dir)
      .select("user_id", "win_id", "n").as[(Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (user, buckets) =>
      val sorted = buckets.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong),
        s"user $user: bucket ids not consecutive from 0")
      sorted.init.foreach { case (_, w, n) =>
        assert(n === 20L, s"user $user bucket $w not full") }
      assert(sorted.last._3 <= 20L && sorted.last._3 >= 1L)
    }
  }

  test("q_cep_fail_burst: matches brute-force recompute of 3-in-horizon errors") {
    val errors = graft.tables.Tables.events(spark, dir)
      .where($"event_type" === "error")
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"))
      .as[(Long, Long, Long)].collect()
    val expected = errors.groupBy(_._1).toSeq.flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      sorted.sliding(3).collect {
        case Array(a, _, c) if c._3 - a._3 <= 86400 => (user, c._2)
      }
    }.toSet
    val got = TimeWindows.cepFailBurst(spark, dir)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("q_funnel_order: every returned user's stamps are strictly ordered and first-occurrence") {
    val rows = Advanced.funnelOrder(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val firsts = graft.tables.Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type")
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.unix_timestamp($"ts")).as("t"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(x => x._2 -> x._3).toMap }
    rows.foreach { case (u, ts, tc, tp) =>
      assert(ts < tc && tc < tp)
      assert(firsts(u)("signup") === ts && firsts(u)("click") === tc &&
        firsts(u)("purchase") === tp)
    }
  }

  test("q_cohort_retention: offset-0 cells account for every user exactly once") {
    val rows = Advanced.cohortRetention(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.forall(_._2 >= 0), "negative week offset")
    val usersInCohort0 = rows.filter(_._2 == 0L).map(_._3).sum
    val totalUsers = graft.tables.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(usersInCohort0 === totalUsers,
      "every user appears in its own cohort's offset-0 cell")
  }

  test("q_agg_filter: conditional counts recompute via plain filters (spot user)") {
    val df = Aggregations.aggFilter(spark, dir)
    val u = df.select("user_id").as[Long].head()
    val row = df.where($"user_id" === u).head()
    val e = graft.tables.Tables.events(spark, dir).where($"user_id" === u)
    assert(row.getLong(1) === e.where($"event_type" === "error").count())
    assert(row.getLong(2) === e.where($"event_type" === "purchase").count())
  }

  test("q_join_right: preserves all nations; equals mirrored left join") {
    val r = Joins.joinRight(spark, dir)
    assert(r.select("n_nationkey").distinct().count() === 25L)
    val l = graft.tables.Tables.nation(spark, dir)
      .join(graft.tables.Tables.supplier(spark, dir),
        $"s_nationkey" === $"n_nationkey", "left")
      .select($"n_nationkey", $"n_name", $"s_suppkey", $"s_name")
    assert(r.count() === l.count())
    assert(r.exceptAll(l).count() === 0L)
  }

  test("q_text_tfidf: df ≤ tf, df ≤ corpus size, tf non-increasing") {
    val rows = LlmText.textTfidf(spark, dir)
      .select("tf", "df").as[(Long, Long)].collect()
    assert(rows.length === 20)
    rows.foreach { case (tf, df) => assert(df <= tf && df <= 500L && df >= 1L) }
    assert(rows.map(_._1).toSeq === rows.map(_._1).sortBy(-_).toSeq)
  }

  test("q_text_normalize: canonical forms never exceed docs; punctuation-only diffs collapse") {
    LlmText.textNormalize(spark, dir)
      .select("n_docs", "n_canonical").as[(Long, Long)].collect()
      .foreach { case (n, c) => assert(c <= n && c >= 1L) }
    // literal check: two docs differing only in case/punct share a canon hash
    val two = Seq((1L, "Hello, World!"), (2L, "hello world")).toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    two.createOrReplaceTempView("graft_norm_two")
    import org.apache.spark.sql.functions._
    val canon = regexp_replace(
      regexp_replace(lower(trim($"text")), "[^a-z0-9 ]", ""), " +", " ")
    assert(two.select(md5(canon).as("c")).distinct().count() === 1L)
  }

  test("q_sample_stratified: exactly 5 per language with rn 1..5") {
    val rows = LlmText.sampleStratified(spark, dir)
      .select("lang", "rn").as[(String, Int)].collect()
    rows.groupBy(_._1).foreach { case (lang, xs) =>
      assert(xs.map(_._2).sorted.toSeq === Seq(1, 2, 3, 4, 5), s"lang $lang") }
  }

  test("q_agg_histogram: bucket counts partition the rows exactly") {
    val rows = Aggregations.aggHistogram(spark, dir)
      .select("n").as[Long].collect()
    val total = graft.tables.Tables.events(spark, dir).count()
    assert(rows.sum === total, "histogram buckets must sum to the row count")
  }

  test("q_percentile_exact: quartiles are ordered members of each group") {
    val rows = Advanced.percentileExact(spark, dir)
      .as[(String, Double, Double, Double)].collect()
    assert(rows.length === 5)
    val byType = graft.tables.Tables.events(spark, dir)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (t, p25, p50, p75) =>
      assert(p25 <= p50 && p50 <= p75, s"$t quartiles out of order")
      assert(byType(t).contains(p25) && byType(t).contains(p50) && byType(t).contains(p75),
        s"$t: exact percentiles must be members of the group")
    }
  }

  test("q_basket_rules: confidence and lift recompute exactly from driver-side basket counts") {
    val dir = sf("sf0.001")
    val rows = graft.ops.Advanced.basketRules(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 50)
    val items = graft.tables.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val nOrders = items.map(_._1).distinct.length.toLong
    val itemN = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = items.groupBy(_._1).values
      .flatMap(b => b.map(_._2).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSeq.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (ante, cons, nPair, nAnte, nCons, n, conf, lift) =>
      val key = if (ante < cons) (ante, cons) else (cons, ante)
      assert(n === nOrders)
      assert(nPair === pairN(key), s"rule $ante→$cons: pair support drifted")
      assert((nAnte, nCons) === ((itemN(ante), itemN(cons))), s"rule $ante→$cons: item counts drifted")
      assert(conf === nPair * 1000000L / nAnte && conf <= 1000000L)
      assert(lift === nPair * nOrders * 1000000L / (nAnte * nCons))
      assert(lift > 1000000L, "a >=2-support pair in 7-item baskets must show positive lift")
    }
  }

  test("q_basket_pairs: pair counts recompute from driver-side basket fold (spot top pair)") {
    val top = Advanced.basketPairs(spark, dir).head()
    val (p1, p2, n) = (top.getLong(0), top.getLong(1), top.getLong(2))
    val recount = graft.tables.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .groupBy(_._1).count { case (_, items) =>
        val set = items.map(_._2).toSet; set.contains(p1) && set.contains(p2) }
    assert(n === recount.toLong)
  }

  test("q_time_downsample: keeps exactly ceil(k/10) events per user, first always kept") {
    val kept = graft.ops.TimeWindows.timeDownsample(spark, dir)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    val all = graft.tables.Tables.events(spark, dir)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    all.foreach { case (u, k) =>
      assert(kept(u) === (k + 9) / 10, s"user $u: ${kept(u)} of $k") }
  }

  test("q_gap_fill_daily: dense day spine, counts conserved, gaps are zero") {
    val rows = graft.ops.TimeWindows.gapFillDaily(spark, dir)
      .as[(Long, Long)].collect()
    val days = rows.map(_._1)
    assert(days.toSeq === (days.min to days.max).toSeq, "spine must be dense")
    assert(rows.map(_._2).sum === graft.tables.Tables.orders(spark, dir).count())
    assert(rows.exists(_._2 == 0L), "expect at least one zero-filled gap day")
  }

  test("q_embed_centroid: totals recompute from a driver-side fold") {
    val got = LlmVector.embedCentroid(spark, dir)
      .select("label", "n", "s_d1").as[(Int, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val raw = graft.tables.Tables.embeddings(spark, dir)
      .select($"label", $"embedding").as[(Int, Array[Float])].collect()
    val exp = raw.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.length.toLong,
        xs.map(x => math.floor(x._2(0).toDouble * 1000000.0).toLong).sum)
    }
    assert(got === exp)
  }

  test("q_quality_repetition: signal bounds, and the flag follows the UNROUNDED share") {
    val rows = LlmText.qualityRepetition(spark, dir)
      .select("doc_id", "n_words", "n_uniq", "top_n", "dup_ratio", "top_share",
        "flag_repetitive")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nWords, nUniq, topN, dup, share, flag) =>
      assert(nUniq >= 1 && nUniq <= nWords, s"doc $id: uniq outside [1, n_words]")
      assert(topN >= 1 && topN <= nWords, s"doc $id: top_n outside [1, n_words]")
      assert(dup >= 0.0 && dup < 1.0, s"doc $id: dup_ratio out of range: $dup")
      assert(share > 0.0 && share <= 1.0, s"doc $id: top_share out of range: $share")
      assert(flag === (topN.toDouble / nWords > 0.2),
        s"doc $id: flag diverges from unrounded top-share")
    }
    // every doc with a non-empty token list is present (no silent drops)
    val expected = graft.tables.Tables.documents(spark, dir)
      .where(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.trim($"text")) > 0).count()
    assert(rows.length.toLong === expected)
  }

  test("q_corpus_mix: shares sum to 1 and char mass reconciles with documents") {
    val rows = LlmText.corpusMix(spark, dir)
      .select("lang", "source", "n_docs", "chars", "share_chars")
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-3,
      "per-cell shares must sum to ~1 (up to 6dp rounding per cell)")
    val totalChars = graft.tables.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.sum($"n_chars")).as[Long].head()
    assert(rows.map(_._4).sum === totalChars, "char mass lost between cells")
    val totalDocs = graft.tables.Tables.documents(spark, dir).count()
    assert(rows.map(_._3).sum === totalDocs, "doc mass lost between cells")
  }

  test("q_cdc_scd2: versioned intervals tile each user's timeline exactly") {
    val rows = Advanced.cdcScd2(spark, dir)
      .select("user_id", "version", "event_type", "valid_from", "valid_to", "n_events", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5), r.getBoolean(6)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.length), s"user $u: versions not 1..n")
      // intervals abut: valid_to == next valid_from; exactly one open (current)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $u v${a._2}: interval gap")
          assert(a._3 != b._3, s"user $u v${a._2}: adjacent runs share event_type — not collapsed")
        case _ => ()
      }
      assert(sorted.count(_._7) === 1 && sorted.last._7, s"user $u: current-row flag wrong")
    }
    // no event lost: run sizes sum to the user's event count
    val counts = graft.tables.Tables.events(spark, dir)
      .groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    byUser.foreach { case (u, ivs) =>
      assert(ivs.map(_._6).sum === counts(u), s"user $u: events lost in run collapse") }
  }

  test("q_corpus_drift: score arithmetic is exact, signs follow the imbalance, top-50 is the true cut") {
    val rows = LlmText.corpusDrift(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    rows.foreach { case (w, cfA, cfB, lr, score) =>
      assert(score === (cfA + cfB) * math.abs(lr), s"$w: drift_score inconsistent")
      // add-1 smoothing: a token seen only in B must drift negative, only in A positive
      if (cfA == 0L) assert(lr < 0L, s"$w: A-absent token with non-negative lr")
      if (cfB == 0L) assert(lr > 0L, s"$w: B-absent token with non-positive lr")
      assert(cfA + cfB > 0L, s"$w: token in neither snapshot")
    }
    // the emitted 50 really are the global maxima: recompute the full
    // frame without the limit and compare the boundary
    val cut = graft.tables.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.max($"doc_id")).head().getLong(0) / 2
    val full = graft.tables.Tables.documents(spark, dir)
      .select($"doc_id", org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim($"text"), " ")).as("w"))
      .where(org.apache.spark.sql.functions.length($"w") > 0)
      .as[(Long, String)].collect()
    val cfA = full.filter(_._1 <= cut).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cfB = full.filter(_._1 > cut).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val vocab = (cfA.keySet ++ cfB.keySet).toSeq
    val (na, nb, v) = (cfA.values.sum, cfB.values.sum, vocab.size.toLong)
    val scores = vocab.map { w =>
      val (a, b) = (cfA.getOrElse(w, 0L), cfB.getOrElse(w, 0L))
      val lr = math.floor(math.log(((a + 1) * (nb + v)).toDouble /
        ((b + 1) * (na + v)).toDouble) * 1e6).toLong
      (w, (a + b) * math.abs(lr))
    }.sortBy { case (w, sc) => (-sc, w) }
    assert(rows.length === math.min(50, vocab.size),
      s"expected min(50, |vocab|) rows, got ${rows.length}")
    assert(rows.map(_._1).toSeq === scores.take(50).map(_._1),
      "top-50 disagrees with the driver-side recompute")
  }

  test("q_skew_diagnose: exact shares, verdict at 2x mean, top-20 is the true heavy cut") {
    val rows = graft.ops.Curation.skewDiagnose(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val perKey = graft.tables.Tables.events(spark, dir)
      .groupBy($"user_id").count().as[(Long, Long)].collect()
    assert(rows.length === math.min(20, perKey.length))
    val total = perKey.map(_._2).sum
    val nk = perKey.length.toLong
    val want = perKey.sortBy { case (u, c) => (-c, u) }.take(20)
    assert(rows.map(r => (r._1, r._2)).toSeq === want.toSeq,
      "top-20 keys disagree with a direct recount")
    rows.foreach { case (u, cnt, ppm, x100, hot) =>
      assert(ppm === cnt * 1000000L / total, s"key $u: share_ppm not exact")
      assert(x100 === cnt * 100L * nk / total, s"key $u: vs_mean_x100 not exact")
      assert(hot === (x100 >= 200L), s"key $u: hot verdict inconsistent")
    }
  }

  test("q_layout_compaction: groups fill to target in size-desc order and conserve bytes") {
    val rows = graft.ops.Scans.layoutCompaction(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val target = 256L * 1024L
    rows.groupBy(_._1).foreach { case (et, files) =>
      // replay the sequential size-desc packing and compare group ids
      val ordered = files.sortBy { case (_, day, _, bytes, _, _, _) => (-bytes, day) }
      var cum = 0L
      ordered.foreach { case (_, day, _, bytes, grp, _, _) =>
        assert(grp === cum / target, s"$et day $day: grp != prefix div target")
        cum += bytes
      }
      // per-group stats reconcile
      files.groupBy(_._5).foreach { case (g, members) =>
        assert(members.map(_._6).distinct === Array(members.length.toLong),
          s"$et grp $g: grp_files wrong")
        assert(members.map(_._7).distinct === Array(members.map(_._4).sum),
          s"$et grp $g: grp_bytes wrong")
      }
      // every group except the last closed at or above target
      val lastGrp = files.map(_._5).max
      files.groupBy(_._5).filter(_._1 < lastGrp).foreach { case (g, members) =>
        val upTo = ordered.takeWhile(_._5 <= g).map(_._4).sum
        assert(upTo >= (g + 1) * target,
          s"$et grp $g closed before reaching the target")
      }
    }
    // byte conservation vs the raw stats
    val raw = graft.tables.Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg((org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.octet_length($"props").cast("bigint")) +
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)) * 48L).as("b"))
      .as[(String, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (et, files) =>
      assert(files.map(_._4).sum === raw(et), s"$et: manifest bytes drifted") }
  }

  test("q_interval_islands: islands are maximal merged covers — no gap inside, real gap between") {
    val rows = Advanced.intervalIslands(spark, dir)
      .select("user_id", "island", "start_t", "end_t", "n_events", "span_s")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val events = graft.tables.Tables.events(spark, dir)
      .select($"user_id", org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.groupBy(_._1).foreach { case (u, isles) =>
      val sorted = isles.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.length), s"user $u: island ids not 1..n")
      sorted.foreach { case (_, _, s0, e0, _, span) =>
        assert(span === e0 - s0 && span >= 300L, s"user $u: span arithmetic wrong") }
      // islands are disjoint with a REAL gap between them (else they'd merge)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 > a._4, s"user $u: islands ${a._2},${b._2} overlap/touch — not maximal")
        case _ => ()
      }
      // event conservation + in-island coverage: every event t falls inside exactly one island,
      // and no within-island gap exceeds the 300 s interval length
      assert(sorted.map(_._5).sum === events(u).length, s"user $u: events lost")
      events(u).foreach { t =>
        assert(sorted.exists(i => t >= i._3 && t + 300 <= i._4), s"user $u: event $t uncovered") }
      sorted.foreach { case (_, i, s0, e0, _, _) =>
        val inIsle = events(u).filter(t => t >= s0 && t <= e0 - 300)
        inIsle.sliding(2).foreach {
          case Array(x, y) => assert(y - x <= 300, s"user $u island $i: internal gap > interval — should have split")
          case _ => ()
        }
      }
    }
  }

  test("q_graph_pagerank: ranks recompute exactly via reference integer iteration") {
    val rows = graft.ops.Graph.graphPagerank(spark, dir)
      .select("node_type", "node_key", "rank_q").as[(String, Long, Long)].collect()
    assert(rows.length === 20)
    assert(rows.map(_._3).toSeq === rows.map(_._3).sortBy(-_).toSeq, "not rank-ordered")
    // reference: same quantized arithmetic, plain Scala maps
    val li = graft.tables.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey").as[(Long, Long)].collect()
    val ords = graft.tables.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val fwd = li.flatMap { case (ok, sk) => ords.get(ok).map(ck => (ck * 2, sk * 2 + 1)) }.distinct
    val edges = (fwd ++ fwd.map(e => (e._2, e._1))).toSeq
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.map(_._1).distinct
    val nn = nodes.size.toLong
    var r = nodes.map(v => v -> 1000000000000L / nn).toMap
    for (_ <- 1 to 5) {
      val base = 150000000000L / nn
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => (r(u) / deg(u)) * 85L / 100L }.sum).toMap
      r = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    val expect = r.toSeq
      .map { case (v, rv) => (if (v % 2 == 0) "cust" else "supp", v / 2, rv) }
      .sortBy { case (t, k, rv) => (-rv, t, k) }.take(20)
    assert(rows.toSeq === expect, "engine ranks diverged from reference integer iteration")
  }

  test("q_join_pit: every purchase matches the version valid at its time (brute-force recompute)") {
    val rows = Advanced.joinPit(spark, dir)
      .select("user_id", "purchase_id", "p_t", "version", "state", "state_since")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4))))
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"))
      .as[(Long, Long, String, Long)].collect()
    val purchases = evs.filter(_._3 == "purchase")
    assert(rows.length === purchases.length, "purchase rows not conserved")
    assert(rows.map(_._2).distinct.length === rows.length, "a purchase matched two versions")
    val byUser = evs.filterNot(_._3 == "purchase").groupBy(_._1)
    rows.foreach { case (u, pid, pt, ver, state) =>
      // the state at pt = the type of the latest non-purchase event at/before pt
      val latest = byUser.getOrElse(u, Array.empty)
        .filter(e => e._4 <= pt).sortBy(e => (e._4, e._2)).lastOption
      (latest, state) match {
        case (None, None) => () // cold start: correctly NULL
        case (Some(l), Some(st)) => assert(st === l._3,
          s"user $u purchase $pid: state $st != latest prior event type ${l._3}")
        case other => fail(s"user $u purchase $pid: presence mismatch $other")
      }
      assert(ver.isEmpty === state.isEmpty)
    }
  }

  test("q_attribution: conversions are conserved and credits recompute brute-force") {
    val rows = Advanced.attribution(spark, dir)
      .select("channel", "credits", "share_ppm").as[(String, Long, Long)].collect()
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"))
      .as[(Long, Long, String, Long)].collect()
    val purchases = evs.filter(_._3 == "purchase")
    assert(rows.map(_._2).sum === purchases.length, "credits not conserved")
    val byUser = evs.filterNot(_._3 == "purchase").groupBy(_._1)
    val expect = purchases.map { case (u, _, _, pt) =>
      byUser.getOrElse(u, Array.empty)
        .filter(e => e._4 <= pt && e._4 > pt - 604800L)
        .sortBy(e => (-e._4, -e._2)).headOption.map(_._3).getOrElse("direct")
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === expect, "per-channel credits drifted")
    val total = rows.map(_._2).sum
    rows.foreach { case (ch, c, ppm) =>
      assert(ppm === c * 1000000L / total, s"$ch: share_ppm arithmetic") }
  }

  test("q_stats_ks: binned KS recomputes brute-force; statistic in [0,1]") {
    // gap_num is DECIMAL(38,0) since the r14 wide lift — decode exactly
    val Array((bucket, na, nb, gapDec, ks)) = Curation.statsKs(spark, dir)
      .select("ks_bucket", "na", "nb", "gap_num", "ks")
      .as[(Long, Long, Long, java.math.BigDecimal, Double)].collect()
    val gapNum = gapDec.longValueExact()
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"event_id", $"value").as[(Long, Double)].collect()
    val cut = evs.map(_._1).max / 2
    val a = evs.filter(_._1 <= cut).map(e => math.floor(e._2).toLong)
    val b = evs.filter(_._1 > cut).map(e => math.floor(e._2).toLong)
    assert(na === a.length.toLong && nb === b.length.toLong)
    val buckets = (a ++ b).distinct.sorted
    val gaps = buckets.map { x =>
      val ca = a.count(_ <= x).toLong; val cb = b.count(_ <= x).toLong
      (x, math.abs(ca * nb - cb * na))
    }
    val (expB, expG) = gaps.maxBy { case (x, g) => (g, -x) }
    assert(gapNum === expG, "max ECDF gap numerator drifted")
    assert(bucket === expB, "argmax bucket drifted (tie-break?)")
    assert(ks >= 0.0 && ks <= 1.0)
    assert(math.abs(ks - expG.toDouble / (na.toDouble * nb.toDouble)) < 1e-6)
  }

  test("q_chunk_sliding: chunks tile each doc with stride-30 overlap and content hashes recompute") {
    val rows = LlmText.chunkSliding(spark, dir)
      .select("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk_hash")
      .as[(Long, Long, Long, Long, String)].collect()
    val texts = graft.tables.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val ws = texts(id).trim.split(" ", -1)
      val n = ws.length
      val expectNc = if (n <= 40) 1L else 1L + (n - 40 + 29) / 30
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2) === (0L until expectNc), s"doc $id: chunk ids not 0..${expectNc - 1}")
      sorted.foreach { case (_, cid, start, nt, hash) =>
        assert(start === cid * 30, s"doc $id chunk $cid: start_tok")
        assert(nt === math.min(40L, n - cid * 30), s"doc $id chunk $cid: n_tokens")
        val slice = ws.slice((cid * 30).toInt, (cid * 30).toInt + 40).mkString(" ")
        assert(hash === md5hex(slice), s"doc $id chunk $cid: content hash drifted")
      }
      // coverage: the last chunk reaches the end of the doc; every non-last
      // chunk is full-width so consecutive chunks overlap by exactly 10
      assert(sorted.last._3 + sorted.last._4 === n.toLong, s"doc $id: tail tokens uncovered")
      sorted.init.foreach { c => assert(c._4 === 40L, s"doc $id chunk ${c._2}: non-tail chunk not full") }
    }
  }

  test("q_rank_fusion: RRF arithmetic recomputes from ranks; semantic ranks match brute-force cosine") {
    val fused = LlmText.rankFusion(spark, dir)
      .select("doc_id", "lex_rank", "sem_rank", "rrf").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3)))
    assert(fused.length <= 20 && fused.nonEmpty)
    fused.foreach { case (id, ra, rb, rrf) =>
      assert(ra.nonEmpty || rb.nonEmpty, s"doc $id: retrieved by neither ranker")
      val expect = ra.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rb.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 5e-7, s"doc $id: rrf drifted from rank arithmetic")
      ra.foreach(r => assert(r >= 1 && r <= 50)); rb.foreach(r => assert(r >= 1 && r <= 50))
    }
    assert(fused.map(_._4).toSeq === fused.map(_._4).sortBy(-_).toSeq, "not rrf-ordered")
    // semantic side cross-check: brute-force cosine to probe vec 0, top-50 rank
    val embs = graft.tables.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val pe = embs.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val semRanks = embs.map { case (id, v) => (id, cos(pe, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(50).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    fused.foreach { case (id, _, rb, _) =>
      assert(rb === semRanks.get(id), s"doc $id: sem_rank disagrees with brute-force cosine") }
  }

  test("q_path_mining: top-25 cut is the true frequency cut and paths recompute brute-force") {
    val rows = Advanced.pathMining(spark, dir)
      .select("path", "n_users").as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq, "not frequency-ordered")
    // brute-force recompute: first-8 event types per user, ordered by (t, event_id)
    val paths = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"))
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).map { case (_, es) =>
        es.sortBy(e => (e._4, e._2)).take(8).map(_._3).mkString(">") }
    val freq = paths.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (p, n) => assert(freq(p) === n, s"path $p: count drifted") }
    // the cut is genuine: everything outside the 25 has freq <= the last kept row
    val kept = rows.map(_._1).toSet
    val cut = rows.last._2
    freq.filterNot(kv => kept(kv._1)).foreach { case (p, n) =>
      assert(n <= cut, s"path $p (n=$n) wrongly excluded from top-25 (cut=$cut)") }
  }

  test("q_graph_degree_profile: histogram conserves nodes and edge mass; types partition") {
    val dir = sf("sf0.001")
    val rows = graft.ops.Graph.graphDegreeProfile(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    val edges = graft.ops.Graph.tradingEdges(spark, dir)
    val nNodes = edges.select("src").distinct().count()
    val nDirected = edges.count()
    rows.foreach { case (d, nc, ns, nn) =>
      assert(nc + ns === nn, s"degree $d: type split does not partition")
      assert(d >= 1, "degree 0 node cannot appear in an edge list")
    }
    assert(rows.map(_._4).sum === nNodes, "histogram does not conserve nodes")
    assert(rows.map(r => r._1 * r._4).sum === nDirected,
      "Σ d·n_nodes must equal the directed edge count (handshake)")
  }

  test("q_graph_triangles: degree-oriented enumeration == brute-force triple scan") {
    val rows = graft.ops.Graph.graphTriangles(spark, dir)
      .select("p_a", "p_b", "p_c").as[(Long, Long, Long)].collect().toSeq
    // brute force: edge set in plain Scala, then check every output triple
    // and every reference triple both ways
    val li = graft.tables.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keySet
    val byNode = edges.toSeq.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val expect = (for {
      (a, nbrs) <- byNode.toSeq
      b <- nbrs if a < b
      c <- byNode(b) if b < c && nbrs(c)
    } yield (a, b, c)).sorted
    assert(rows === expect, "triangle set diverged from brute-force enumeration")
    assert(rows.nonEmpty, "no triangles at this SF — spec lost its teeth")
  }

  test("q_dedup_containment: pairs and shared counts recompute from raw shingle sets") {
    val rows = LlmText.dedupContainment(spark, dir)
      .select("doc_a", "doc_b", "n_shared").as[(Long, Long, Long)].collect().toSeq
    val docs = graft.tables.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val sh = docs.map { case (id, t) =>
      id -> t.trim.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val expect = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a != b
      ns = (sa & sb).size.toLong
      if ns * 5 >= sa.size.toLong * 4
    } yield (a, b, ns)).sorted
    assert(rows.sorted === expect, "containment pairs diverged from raw shingle recompute")
    assert(rows.nonEmpty, "no containment pairs at this SF — spec lost its teeth")
    // direction semantics: the reported ratio is vs the CONTAINED side's
    // own set size — a mutual pair carries two different denominators
    val nsh = sh.view.mapValues(_.size.toLong).toMap
    rows.foreach { case (a, b, ns) =>
      assert(ns * 5 >= nsh(a) * 4 && ns <= math.min(nsh(a), nsh(b)),
        s"pair ($a,$b): containment bound violated vs raw set sizes")
    }
  }

  test("q_stats_chi2: exact ppm/ppb cells recompute with BigInt; chi2 matches float recompute") {
    val rows = Curation.statsChi2(spark, dir)
      .select("lang", "source", "n_obs", "exp_ppm", "contrib_ppb", "chi2_ppb")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val docs = graft.tables.Tables.documents(spark, dir)
      .select("lang", "source").as[(String, String)].collect()
    val obs = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val row = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val col = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    assert(rows.map(r => (r._1, r._2)).toSet === obs.keySet, "cell census incomplete")
    rows.foreach { case (l, src, o, ppm, ppb, _) =>
      assert(o === obs((l, src)), s"($l,$src): observed")
      assert(ppm === row(l) * col(src) * 1000000L / n, s"($l,$src): expected ppm")
      val diff = BigInt(o) * n - BigInt(row(l)) * col(src)
      assert(BigInt(ppb) === diff * diff * 1000000000L / (BigInt(n) * row(l) * col(src)),
        s"($l,$src): contribution ppb")
    }
    // the ppb total is one statistic repeated on every row, and it agrees
    // with the standard float formula to quantization error
    assert(rows.map(_._6).distinct.length === 1)
    val chi2Float = obs.map { case ((l, src), o) =>
      val e = row(l).toDouble * col(src) / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(rows.head._6 / 1e9 - chi2Float) < 1e-3,
      "exact ppb chi2 drifted from float recompute beyond quantization")
  }

  test("q_ts_bollinger: frame sums and band verdicts recompute from trailing-20 slices") {
    val rows = TimeWindows.tsBollinger(spark, dir)
      .select("user_id", "event_id", "cents", "n_frame", "sum_cents", "var_num", "breach")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === evs.length, "row conservation")
    val byKey = rows.map(r => (r._1, r._2) -> r).toMap
    evs.groupBy(_._1).foreach { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2)).map(e => (e._2, math.round(e._4 * 100.0)))
      ordered.zipWithIndex.foreach { case ((eid, c), i) =>
        val frame = ordered.slice(math.max(0, i - 19), i + 1).map(_._2)
        val (n, s, ss) = (frame.length.toLong, frame.sum, frame.map(x => x * x).sum)
        val vn = n * ss - s * s
        val r = byKey((u, eid))
        assert(r._3 === c && r._4 === n && r._5 === s && r._6 === vn,
          s"user $u event $eid: frame stats drifted")
        assert(r._7 === ((c * n - s) * (c * n - s) > 4 * vn),
          s"user $u event $eid: band verdict drifted")
        // the cross-multiplied verdict IS the float band test (guard vs n=1 frames)
        if (n > 1) {
          val mean = s.toDouble / n
          val sigma2 = vn.toDouble / (n * n)
          val floatVerdict = (c - mean) * (c - mean) > 4 * sigma2
          assert(r._7 === floatVerdict, s"user $u event $eid: integer form != float band test")
        }
      }
    }
    assert(rows.exists(_._7) && rows.exists(!_._7), "data must exercise both verdicts")
  }

  test("q_embed_outlier: quantized distances recompute brute-force; top-20 is the true cut") {
    val rows = graft.ops.LlmVector.embedOutlier(spark, dir)
      .select("vec_id", "label", "dist2_q").as[(Long, Int, Long)].collect().toSeq
    assert(rows.length === 20)
    val vecs = graft.tables.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding".cast("array<double>"))
      .as[(Long, Int, Seq[Double])].collect()
    val q = vecs.map { case (id, l, v) =>
      (id, l, v.map(x => math.floor(x * 1e6).toLong)) }
    val dims = q.head._3.length
    val n = q.length.toLong
    // centroid: per-dim integer division, truncation toward zero (both engines)
    val cent = (0 until dims).map { d => q.map(_._3(d)).sum / n }
    val dist = q.map { case (id, l, v) =>
      (id, l, v.zip(cent).map { case (x, c) => (x - c) * (x - c) }.sum) }
    val expect = dist.sortBy(t => (-t._3, t._1)).take(20).toSeq
    assert(rows === expect, "top-20 outliers diverged from brute-force recompute")
    // the cut is genuine: everything outside has dist2 <= the last kept
    val cut = expect.last._3
    val kept = expect.map(_._1).toSet
    dist.filterNot(t => kept(t._1)).foreach { t =>
      assert(t._3 <= cut, s"vec ${t._1} wrongly excluded") }
  }

  test("q_ts_similarity: top-10 window distances recompute brute-force; the cut is genuine") {
    val rows = TimeWindows.tsSimilarity(spark, dir)
      .select("user_id", "win_start_rn", "t_end", "dist2")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.length === 10)
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    val series = evs.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._3, e._2)).map(e => (e._3, math.round(e._4 * 100.0)))).toMap
    val tplUser = series.keys.min
    val tpl = series(tplUser).take(8).map(_._2)
    val all = series.filterNot(_._1 == tplUser).toSeq.flatMap { case (u, sv) =>
      sv.sliding(8).zipWithIndex.filter(_._1.length == 8).map { case (win, i) =>
        val d = win.map(_._2).zip(tpl).map { case (a, b) => (a - b) * (a - b) }.sum
        (u, i + 1L, win.last._1, d)
      }
    }
    val expect = all.sortBy(t => (t._4, t._1, t._3, t._2)).take(10)
    assert(rows === expect, "top-10 windows diverged from brute-force scan")
    val cut = expect.last._4
    assert(all.count(_._4 < cut) < 10, "a closer window was wrongly excluded")
  }

  test("q_active_users: DAU and trailing-7-day WAU recompute from raw day sets") {
    val rows = TimeWindows.activeUsers(spark, dir)
      .select("day", "dau", "wau").as[(Long, Long, Long)].collect().toSeq
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"))
      .as[(Long, Long)].collect()
    val au = evs.map { case (u, t) => (u, t / 86400L) }.distinct
    val days = au.map(_._2).distinct.sorted
    assert(rows.map(_._1) === days, "day census incomplete")
    rows.foreach { case (d, dau, wau) =>
      assert(dau === au.count(_._2 == d).toLong, s"day $d: DAU")
      val win = au.filter(x => x._2 >= d - 6 && x._2 <= d).map(_._1).distinct
      assert(wau === win.length.toLong, s"day $d: WAU")
      assert(wau >= dau, s"day $d: WAU below DAU — impossible")
    }
    // the distinction is real in the data: some WAU strictly exceeds its DAU
    assert(rows.exists(r => r._3 > r._2), "WAU == DAU everywhere — window never mattered")
  }

  test("q_cep_ascending: runs recompute brute-force and are maximal") {
    val rows = TimeWindows.cepAscending(spark, dir)
      .select("user_id", "run_len", "t_start", "t_end", "cents_first", "cents_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val seq = es.sortBy(e => (e._3, e._2)).map(e => (e._3, math.round(e._4 * 100.0)))
      // split into maximal ascending runs
      val runs = seq.foldLeft(List.empty[List[(Long, Long)]]) {
        case (acc, x) if acc.nonEmpty && x._2 > acc.head.head._2 => (x :: acc.head) :: acc.tail
        case (acc, x) => List(x) :: acc
      }.map(_.reverse).reverse
      runs.filter(_.length >= 4).map { r =>
        (u, r.length.toLong, r.head._1, r.last._1, r.head._2, r.last._2)
      }
    }.sortBy(t => (t._1, t._3))
    assert(rows === expect, "ascending runs diverged from brute-force fold")
    assert(rows.nonEmpty, "no qualifying runs at this SF — spec lost its teeth")
    // maximality: first value of each run is NOT an ascent over its
    // predecessor (it's a break or the partition head) — structural in
    // the fold above, asserted via the recompute equality
  }

  test("q_sql_recursive: UnionLoop BFS == brute-force breadth-first over the same edges") {
    val rows = graft.ops.Scalars.sqlRecursive(spark, dir)
      .select("part", "min_hops").as[(Long, Long)].collect().toSeq.sorted
    // brute force: same edge derivation, plain BFS
    val li = graft.tables.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keySet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val root = adj.keys.min
    val dist = scala.collection.mutable.Map(root -> 0L)
    var frontier = Set(root)
    for (hop <- 1L to 3L) {
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      frontier.foreach(dist(_) = hop)
    }
    assert(rows === dist.toSeq.sorted, "recursive CTE reachability diverged from BFS")
    assert(rows.map(_._2).max === 3L, "recursion never reached the hop bound — spec lost its teeth")
  }

  test("q_join_lateral: correlated-LIMIT lateral == the window-rank formulation") {
    val rows = graft.ops.Scalars.joinLateral(spark, dir)
      .select("o_orderkey", "cents", "l_linenumber", "l_partkey")
      .as[(Long, Long, Int, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_orderkey")
      .orderBy($"cents".desc, $"l_linenumber", $"l_partkey", $"l_suppkey")
    val viaWindow = graft.tables.Tables.lineitem(spark, dir)
      .select($"l_orderkey", org.apache.spark.sql.functions.round($"l_extendedprice" * 100.0)
        .cast("long").as("cents"), $"l_linenumber", $"l_partkey", $"l_suppkey")
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .where($"rk" <= 2)
      .join(graft.tables.Tables.orders(spark, dir).where($"o_totalprice" > 200000.0)
        .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
      .select("o_orderkey", "cents", "l_linenumber", "l_partkey")
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(rows.sorted === viaWindow.sorted,
      "lateral top-2 diverged from the window-rank formulation")
    assert(rows.nonEmpty)
  }

  test("q_mm_patch_grid: grids recompute from byte counts; batches respect the patch budget") {
    val rows = graft.ops.LlmVector.mmPatchGrid(spark, dir)
      .select("doc_id", "img_w", "img_h", "pw", "ph", "n_patches", "seq_len", "part", "batch_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val docs = graft.tables.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(rows.length === docs.length)
    val byId = rows.map(r => r._1 -> r).toMap
    docs.foreach { case (id, text) =>
      val nb = text.getBytes("UTF-8").length.toLong
      val (w, h) = (64 + nb % 193, 64 + (nb * 7) % 149)
      val (pw, ph) = ((w + 15) / 16, (h + 15) / 16)
      val r = byId(id)
      assert((r._2, r._3, r._4, r._5, r._6, r._7) === (w, h, pw, ph, pw * ph, pw * ph + 1),
        s"doc $id: grid arithmetic drifted")
      assert(r._8 === id % 32, s"doc $id: stream assignment")
    }
    // batch packing: within each stream, batch ids are non-decreasing in
    // doc order and each batch's pre-assignment cum stays under budget
    rows.groupBy(_._8).foreach { case (part, rs) =>
      val ordered = rs.sortBy(_._1)
      var cum = 0L
      ordered.foreach { r =>
        assert(r._9 === cum / 4096, s"stream $part doc ${r._1}: batch id != cum-div-budget")
        cum += r._6
      }
      assert(ordered.map(_._9).toSeq === ordered.map(_._9).sorted, s"stream $part: batch ids regressed")
    }
  }

  test("q_sim_filtered_topk: every neighbor honors the predicate; top-5 matches brute force") {
    val rows = graft.ops.LlmVector.simFilteredTopk(spark, dir)
      .select("probe_id", "rk", "vec_id").as[(Long, Int, Long)].collect().toSeq
    val vecs = graft.tables.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding".cast("array<double>"))
      .as[(Long, Int, Seq[Double])].collect()
    val byId = vecs.map(v => v._1 -> v).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probes = vecs.filter(_._1 < 5)
    assert(rows.groupBy(_._1).keySet === probes.map(_._1).toSet)
    probes.foreach { case (pid, pl, pv) =>
      val got = rows.filter(_._1 == pid).sortBy(_._2).map(_._3)
      assert(got.size === 5 && got.forall(byId(_)._2 != pl),
        s"probe $pid: a neighbor shares the excluded label")
      val expect = vecs.filter(_._2 != pl)
        .map(v => (v._1, cos(pv, v._3)))
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got === expect.toSeq, s"probe $pid: filtered top-5 diverged from brute force")
    }
  }

  test("q_agg_incremental: delta merge == from-scratch recompute on exactly the touched users") {
    val rows = Aggregations.aggIncremental(spark, dir)
      .select("user_id", "n_events", "sum_cents", "last_t")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    val cut = evs.map(_._2).max * 4 / 5
    val touched = evs.filter(_._2 >= cut).map(_._1).toSet
    assert(rows.map(_._1).toSet === touched, "output must be exactly the delta-touched users")
    assert(touched.size < evs.map(_._1).distinct.length || touched.size == evs.map(_._1).distinct.length,
      "sanity")
    rows.foreach { case (u, n, sc, lt) =>
      val mine = evs.filter(_._1 == u)
      assert(n === mine.length.toLong, s"user $u: merged count != full recompute")
      assert(sc === mine.map(e => math.round(e._4 * 100.0)).sum, s"user $u: merged sum")
      assert(lt === mine.map(_._3).max, s"user $u: merged last_t")
    }
    // the merge genuinely exercises both sides: some touched user has
    // base history (n_events > delta-only count)
    val deltaOnly = evs.filter(_._2 >= cut).groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(rows.exists { case (u, n, _, _) => n > deltaOnly(u) },
      "no touched user had standing history — the standing join is untested")
  }

  test("q_rfm_segment: threshold quintiles recompute brute-force; ties share buckets") {
    val rows = Advanced.rfmSegment(spark, dir)
      .select("o_custkey", "r_score", "f_score", "m_score", "rfm")
      .as[(Long, Int, Int, Int, Int)].collect().toSeq
    val ords = graft.tables.Tables.orders(spark, dir)
      .select($"o_custkey", org.apache.spark.sql.functions.unix_timestamp($"o_orderdate").as("ts"),
        $"o_totalprice")
      .as[(Long, Long, Double)].collect()
    val m = ords.groupBy(_._1).view.mapValues { os =>
      (os.map(_._2 / 86400L).max, os.length.toLong,
        os.map(o => math.round(o._3 * 100.0)).sum / 1000L)
    }.toMap
    assert(rows.map(_._1).toSet === m.keySet, "customer census incomplete")
    def thresholds(vs: Seq[Long]): Seq[Long] = {
      val n = vs.length.toLong
      val sorted = vs.sorted
      (1 to 4).map { k =>
        // min v with 5*cum(v) >= n*k, cum = count of values <= v
        sorted.find(v => 5L * sorted.count(_ <= v) >= n * k).get
      }
    }
    val rt = thresholds(m.values.map(_._1).toSeq)
    val ft = thresholds(m.values.map(_._2).toSeq)
    val mt = thresholds(m.values.map(_._3).toSeq)
    def score(v: Long, ts: Seq[Long]): Int = 1 + ts.count(v > _)
    rows.foreach { case (c, r, f, mo, seg) =>
      val (rv, fv, mv) = m(c)
      assert(r === score(rv, rt), s"cust $c: recency score")
      assert(f === score(fv, ft), s"cust $c: frequency score")
      assert(mo === score(mv, mt), s"cust $c: monetary score")
      assert(seg === r * 100 + f * 10 + mo, s"cust $c: segment code")
    }
    // quintiles are real: at least 4 distinct classes on each axis
    assert(rows.map(_._2).distinct.size >= 4 && rows.map(_._4).distinct.size >= 4,
      "score axes degenerate — thresholds collapsed")
  }

  test("q_win_streak: longest consecutive-day runs recompute from raw day sets") {
    val rows = TimeWindows.winStreak(spark, dir)
      .select("user_id", "n_active_days", "longest_streak", "streak_start", "streak_end")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"))
      .as[(Long, Long)].collect()
    val byUser = evs.groupBy(_._1).view.mapValues(_.map(_._2 / 86400L).distinct.sorted.toSeq).toMap
    assert(rows.map(_._1).toSet === byUser.keySet, "user census incomplete")
    rows.foreach { case (u, nDays, len, s0, e0) =>
      val days = byUser(u)
      assert(nDays === days.length.toLong, s"user $u: active days")
      // runs: split where the day gap exceeds 1
      val runs = days.foldLeft(List.empty[List[Long]]) {
        case (acc, d) if acc.nonEmpty && d == acc.head.head + 1 => (d :: acc.head) :: acc.tail
        case (acc, d) => List(d) :: acc
      }.map(_.reverse).reverse
      val best = runs.map(r => (r.length.toLong, r.head, r.last))
        .sortBy(t => (-t._1, t._2)).head
      assert((len, s0, e0) === best, s"user $u: winning streak drifted")
    }
    assert(rows.map(_._3).distinct.length > 1, "streak lengths degenerate — spec lost its teeth")
  }

  test("q_quality_boilerplate: shingle-df mass recomputes brute-force; flag is the exact half cut") {
    val rows = LlmText.qualityBoilerplate(spark, dir)
      .select("doc_id", "n_sh", "n_boiler", "flag_boilerplate")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val docs = graft.tables.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val sh = docs.map { case (id, t) =>
      id -> t.trim.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val df = sh.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(_._1).toSet === sh.keySet, "doc census incomplete")
    rows.foreach { case (id, nSh, nB, flag) =>
      val mine = sh(id)
      assert(nSh === mine.size.toLong, s"doc $id: shingle count")
      assert(nB === mine.count(s => df(s) >= 3).toLong, s"doc $id: boilerplate count")
      assert(flag === (nB * 2 >= nSh), s"doc $id: flag")
    }
    assert(rows.exists(_._4) && rows.exists(!_._4), "data must exercise both verdicts")
  }

  test("q_ts_ewma: scaled integer EWMA recomputes from per-user lag lists; /65536 is exact") {
    val rows = TimeWindows.tsEwma(spark, dir)
      .select("user_id", "event_id", "n_terms", "ewma_x65536", "ewma_cents")
      .as[(Long, Long, Int, Long, Double)].collect().toSeq
    val evs = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_timestamp($"ts").as("t"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === evs.length, "row conservation")
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
        .map(e => (e._2, math.round(e._4 * 100.0)))
      ordered.zipWithIndex.toSeq.map { case ((eid, _), i) =>
        val s = (0 until math.min(16, i + 1)).map { k =>
          ordered(i - k)._2 * (1L << (15 - k))
        }.sum
        (u, eid) -> ((math.min(16, i + 1), s))
      }
    }.toMap
    rows.foreach { case (u, eid, nt, sc, dbl) =>
      val (en, es) = expect((u, eid))
      assert(nt === en, s"user $u event $eid: n_terms")
      assert(sc === es, s"user $u event $eid: scaled EWMA")
      assert(dbl === sc.toDouble / 65536.0 && dbl * 65536.0 === sc.toDouble,
        s"user $u event $eid: /2^16 must be exact in binary")
    }
  }

  test("q_anomaly_seasonal: planted spike AND outage flag against their own hour-of-day baseline") {
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("graft_sea").toString
    // 10 days × 24 hours, 4 events per cell; (day 5, hd 3) spikes to 40,
    // (day 7, hd 10) is a total outage (zero events — the cell only
    // exists through the zero-fill)
    def cellCount(d: Int, hd: Int): Int =
      if (d == 5 && hd == 3) 40 else if (d == 7 && hd == 10) 0 else 4
    var id = 0L
    val evs = for {
      d <- 0 until 10; hd <- 0 until 24; i <- 0 until cellCount(d, hd)
    } yield { id += 1; (id, new Timestamp((d * 86400L + hd * 3600L + i) * 1000L), 1L, "view", 1.0, "{}") }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(tmp + "/events.parquet")
    val rows = graft.ops.TimeWindows.anomalySeasonal(spark, tmp)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.length === 240, "grid must be days × 24, zero-filled")
    val flagged = rows.filter(_._6).map(r => (r._1, r._2, r._3)).toSet
    assert(flagged === Set((5L, 3L, 40L), (7L, 10L, 0L)),
      s"exactly the spike and the outage must flag, got $flagged")
    // exact n-scaled residuals: spike hd → S=76, res=324; outage hd → S=36, res=-36
    val spike = rows.find(r => r._1 == 5L && r._2 == 3L).get
    assert((spike._4, spike._5) === ((324L, 648L)))
    val outage = rows.find(r => r._1 == 7L && r._2 == 10L).get
    assert((outage._4, outage._5) === ((-36L, 72L)))
  }

  test("q_ts_acf: planted period-3 series peaks at lag 3; moments recompute exactly; gaps zero-fill") {
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("graft_acf").toString
    // 30 hours of counts 5,1,1,5,1,1,… with hour 7 MISSING entirely (its
    // zero must enter the series, shifting nothing) — strong period 3
    val counts = (0 until 30).map(h => if (h % 3 == 0) 5 else 1)
      .zipWithIndex.map { case (c, h) => h -> (if (h == 7) 0 else c) }.toMap
    val evs = for {
      (h, c) <- counts.toSeq; i <- 0 until c
    } yield (h.toLong * 100 + i, new Timestamp(h * 3600000L + i * 1000L), 1L, "view", 1.0, "{}")
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(tmp + "/events.parquet")
    val rows = graft.ops.TimeWindows.tsAcf(spark, tmp)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // brute-force the exact n²-scaled moments over the zero-filled series
    val xs = (0 until 30).map(h => counts(h).toLong)
    val n = xs.length.toLong; val s1 = xs.sum
    val dev = xs.map(x => n * x - s1)
    val den = dev.map(d => d * d).sum
    for (k <- 1 to 6) {
      val num = (0 until 30 - k).map(t => dev(t) * dev(t + k)).sum
      val r = rows(k - 1)
      assert((r._2, r._3) === ((num, den)), s"lag $k: exact moments drifted")
      assert(math.abs(r._4 - num.toDouble / den) < 1e-6)
    }
    // the period shows: acf(3) is the maximum and strongly positive
    assert(rows(2)._4 > 0.5, s"period-3 signal missing: ${rows(2)._4}")
    assert(rows.map(_._4).max === rows(2)._4, "lag 3 is not the ACF peak")
  }

  test("q_anomaly_cusum: closed form equals the clamp recurrence; planted level shift alarms") {
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    // 'view': 10 days at 4/day then 10 days at 10/day — a sustained shift no
    // single day would flag; 'click': constant 3/day (dev ≡ 0, never alarms);
    // 'ping': constant except day 5 has ZERO events (the cell must exist via
    // the zero-fill — and the outage legitimately seeds a slow post-outage
    // CUSUM climb, since it drags the mean below every normal day)
    def cellCount(t: String, d: Int): Int =
      if (t == "view") { if (d < 10) 4 else 10 }
      else if (t == "click") 3
      else { if (d == 5) 0 else 3 }
    var id = 0L
    val evs = for {
      t <- Seq("view", "click", "ping"); d <- 0 until 20; i <- 0 until cellCount(t, d)
    } yield { id += 1; (id, new Timestamp((d * 86400L + i) * 1000L), 1L, t, 1.0, "{}") }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(tmp + "/events.parquet")
    val rows = graft.ops.TimeWindows.anomalyCusum(spark, tmp)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.length === 60, "grid must be types × 20 days, zero-filled")
    // brute-force: the DIRECT clamp recurrence S_d = max(0, S_{d-1} + dev)
    // on the n-scaled deviations — the closed form must equal it exactly
    for (t <- Seq("view", "click", "ping")) {
      val xs = (0 until 20).map(d => cellCount(t, d).toLong)
      val n = xs.length.toLong; val tot = xs.sum
      val dev = xs.map(x => n * x - tot)
      val sumAbs = dev.map(math.abs).sum
      var s = 0L
      val expect = dev.map { d => s = math.max(0L, s + d); s }
      val got = rows.filter(_._1 == t).sortBy(_._2)
      assert(got.map(_._2) === (0L until 20L), s"$t: day spine not dense")
      assert(got.map(_._3).toSeq === xs, s"$t: zero-filled daily census drifted")
      assert(got.map(_._4).toSeq === dev, s"$t: n-scaled residuals drifted")
      assert(got.map(_._5).toSeq === expect,
        s"$t: closed-form CUSUM != direct clamp recurrence")
      assert(got.map(_._6).toSeq === expect.map(sv => n * sv > 4L * sumAbs),
        s"$t: alarm gate drifted")
    }
    // the shift DOES alarm (late view days), the truly-flat type never does,
    // and the outage day is present as a zero-filled cell
    assert(rows.exists(r => r._1 == "view" && r._6), "level shift missed")
    assert(!rows.exists(r => r._1 == "click" && r._6), "flat series false alarm")
    assert(rows.exists(r => r._1 == "ping" && r._2 == 5L && r._3 == 0L),
      "outage day must enter the series via the zero-fill")
  }

  test("q_interval_concurrency: minute census recomputes brute-force on real data") {
    val rows = Advanced.intervalConcurrency(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ts = graft.tables.Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.unix_timestamp($"ts"))
      .as[Long].collect()
    val perMinute = ts.flatMap(t => ((t + 59) / 60) to ((t + 299) / 60))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = perMinute.keys.groupBy(_ / 1440).toSeq.map { case (day, ms) =>
      val peak = ms.map(perMinute).max
      val at = ms.filter(m => perMinute(m) == peak).min
      (day, peak, at, ms.size.toLong)
    }.sortBy(_._1)
    assert(rows === expect, "per-day concurrency census drifted from brute force")
    rows.foreach { case (_, peak, _, _) => assert(peak >= 1L) }
  }

  test("q_stats_psi: identical halves score 0; planted shift clears the 0.25 band; exact recompute") {
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("graft_psi").toString
    // global cut = max(event_id)/2 = 40. 'stable' holds ids 1..20 and
    // 41..60 with IDENTICAL value histograms each side → every bucket has
    // ca=cb and na=nb, so xa=xb, ln=0, PSI exactly 0. 'shift' moves mass
    // entirely: first half ~10.x, second half ~50.x.
    val evs =
      (1 to 20).map(i => (i.toLong, new Timestamp(i * 1000L), 1L, "stable", (i % 4) + 1.5, "{}")) ++
      (41 to 60).map(i => (i.toLong, new Timestamp(i * 1000L), 1L, "stable", (i % 4) + 1.5, "{}")) ++
      (21 to 40).map(i => (i.toLong, new Timestamp(i * 1000L), 1L, "shift", 10.0 + (i % 3), "{}")) ++
      (61 to 80).map(i => (i.toLong, new Timestamp(i * 1000L), 1L, "shift", 50.0 + (i % 3), "{}"))
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(tmp + "/events.parquet")
    val rows = graft.ops.Curation.statsPsi(spark, tmp)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rows("stable") === ((20L, 20L, 4L, 0L)),
      "identical half-histograms must score PSI exactly 0")
    // brute-force the shifted type with the same integer discipline
    val shiftEvs = evs.filter(_._4 == "shift")
    val hist = shiftEvs.groupBy(e => math.floor(e._5).toLong).toSeq.map { case (b, es) =>
      (b, es.count(_._1 <= 40L).toLong, es.count(_._1 > 40L).toLong)
    }
    val (na, nb) = (hist.map(_._2).sum, hist.map(_._3).sum)
    val bk = hist.size.toLong
    val num = hist.map { case (_, ca, cb) =>
      val xa = BigInt((ca + 1) * (nb + bk)); val xb = BigInt((cb + 1) * (na + bk))
      val lq = BigInt(math.floor(math.log(xa.toDouble / xb.toDouble) * 1000000.0).toLong)
      (xa - xb) * lq
    }.sum
    val expPpm = (num / BigInt((na + bk) * (nb + bk))).toLong
    assert(rows("shift") === ((na, nb, bk, expPpm)), "shifted-type PSI ppm drifted")
    assert(expPpm > 250000L, "a full mass move must clear the 0.25 'shifted' band")
  }
}
