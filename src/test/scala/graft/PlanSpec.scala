package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Automated guards for the physical-plan properties PLANS.md documents —
  * the scale-critical shapes, asserted so a refactor can't silently
  * regress them: filter pushdown into the parquet scan, broadcast join
  * selection, partial+final aggregation, map-side top-k partials,
  * TakeOrderedAndProject fusion, and the materialize-once self-join input.
  */
class PlanSpec extends SparkTestBase {
  private val dir = sf("sf0.001")

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q_filter: predicates reach the parquet scan as PushedFilters") {
    val p = planOf(SparkEntry.queries("q_filter")(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull"), "no pushed filters in scan")
    assert(p.contains("GreaterThanOrEqual"), "range predicate not pushed")
  }

  test("q_scan_parquet: column pruning — ReadSchema is a strict subset") {
    val p = planOf(SparkEntry.queries("q_project_expr")(spark, dir))
    // lineitem has 11 columns; the projection reads fewer
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.nonEmpty && read.count(_ == ',') < 10, s"scan not pruned: $read")
  }

  test("q_join_broadcast: dims build broadcast hash maps, fact never shuffles for the join") {
    val p = planOf(SparkEntry.queries("q_join_broadcast")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "broadcast join not selected")
    assert(!p.contains("SortMergeJoin"), "dim join degenerated to sort-merge")
  }

  test("q_agg_group: two-phase aggregation — partial before the exchange") {
    val p = planOf(SparkEntry.queries("q_agg_group")(spark, dir))
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("q_topk_agg: bounded top-k aggregates map-side (ObjectHashAggregate partials)") {
    val p = planOf(SparkEntry.queries("q_topk_agg")(spark, dir))
    assert(p.contains("ObjectHashAggregate"), "Aggregator not planned as object hash agg")
    assert(p.contains("partial_topkkeys"), "no partial top-k before the shuffle")
  }

  test("q_sort_multi: order+limit fuse into TakeOrderedAndProject") {
    val p = planOf(SparkEntry.queries("q_sort_multi")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), "global sort not fused with limit")
  }

  test("q_win_rank: rank filter plans WindowGroupLimit (no full-partition materialize)") {
    val p = planOf(SparkEntry.queries("q_win_rank")(spark, dir))
    assert(p.contains("WindowGroupLimit"), "top-n window filter not pushed into the sort")
  }

  test("q_join_range_bucket: keyless range join plans as an equi-join, not nested-loop") {
    val p = planOf(SparkEntry.queries("q_join_range_bucket")(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "bucketing failed to manufacture an equi key")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), "no hash/merge equi-join in plan")
  }

  test("q_dedup_ngram_jaccard: both self-join sides read the materialized relation") {
    val p = planOf(SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir))
    assert(p.contains("ExistingRDD"), "signature relation not materialized pre-self-join")
  }

  test("q_agg_filter: all conditional aggregates fold into ONE aggregate pair (single scan)") {
    val p = planOf(SparkEntry.queries("q_agg_filter")(spark, dir))
    // formatted explain lists each operator twice (tree + detail header);
    // count the "(n) HashAggregate" detail headers = actual operator count
    assert(p.linesIterator.count(_.matches("""\(\d+\) HashAggregate.*""")) == 2,
      "conditional agg should be one partial+final pair, not N filtered subplans")
    assert(p.contains("partial_count"), "no map-side partials")
  }

  test("q_funnel_order: single scan + one aggregate pair, no self-joins") {
    val p = planOf(SparkEntry.queries("q_funnel_order")(spark, dir))
    assert(!p.contains("Join"), "funnel should not self-join per stage")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*""")) == 1,
      "funnel should read events exactly once")
  }

  test("q_join_right: preserved-side join still broadcasts the small relation") {
    val p = planOf(SparkEntry.queries("q_join_right")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "right join degenerated to shuffle join")
  }

  test("q_cep_fail_burst: filter pushed below the window sort") {
    val p = planOf(SparkEntry.queries("q_cep_fail_burst")(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]"),
      "event-type filter not pushed to the scan — window would sort all events")
  }

  test("q_embed_centroid: quantized sums aggregate partially map-side") {
    val p = planOf(SparkEntry.queries("q_embed_centroid")(spark, dir))
    assert(p.contains("partial_sum"), "centroid accumulation must combine map-side")
  }

  /** Map of formatted-explain node ids ("(7) Exchange …") per operator name.
    * Node ids follow execution order (leaves lowest), so id comparisons
    * assert operator ORDER, not just presence. */
  private def nodeIds(p: String, op: String): Seq[Int] =
    s"""\\((\\d+)\\) $op""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq

  test("q_ngram_freq: bigrams form row-locally — partial aggregate BEFORE the first exchange") {
    val p = planOf(SparkEntry.queries("q_ngram_freq")(spark, dir))
    // the pre-round-5 lead()-window shape shuffled the whole token stream
    // by doc_id before any aggregation; the arrays_zip shape has no window
    // below the count and its first Exchange sits above a partial agg
    assert(!p.contains("lead("), "token stream flows through a lead() window again")
    val aggs = nodeIds(p, "HashAggregate")
    val exs = nodeIds(p, "Exchange")
    assert(aggs.nonEmpty && exs.nonEmpty, s"unexpected plan: $p")
    assert(aggs.min < exs.min,
      s"Exchange(${exs.min}) precedes the partial HashAggregate(${aggs.min}) — token stream shuffles raw")
    assert(p.contains("partial_count"), "no map-side combine on the bigram count")
  }

  test("q_basket_pairs: row-local double-Generate pair expansion, no self-join") {
    val p = planOf(SparkEntry.queries("q_basket_pairs")(spark, dir))
    assert(nodeIds(p, "Generate").size == 2,
      "pair expansion should be posexplode + explode(slice), exactly two Generates")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("CartesianProduct"),
      "basket pairs degenerated to a self-join")
  }

  test("q_gap_fill_daily: spine join broadcasts — the daily aggregate never re-shuffles") {
    val p = planOf(SparkEntry.queries("q_gap_fill_daily")(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      "spine ⋈ daily should be a broadcast hash join")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "gap-fill join degenerated")
  }

  test("q_median / q_percentile_exact: window sorts the bounded value histogram, not raw rows") {
    // r5 verdict: the old row_number-over-events shape was five single-
    // reducer sorts of ~20% of the corpus each (event_type has 5 values).
    // The de-skewed shape aggregates to a domain-bounded (event_type,
    // value) histogram FIRST; the only Window/Sort sits above that
    // HashAggregate, so its input is capped by the value domain.
    for (q <- Seq("q_median", "q_percentile_exact")) {
      val p = planOf(SparkEntry.queries(q)(spark, dir))
      val aggs = nodeIds(p, "HashAggregate")
      val wins = nodeIds(p, "Window")
      assert(aggs.nonEmpty && wins.nonEmpty, s"$q: unexpected plan: $p")
      assert(aggs.min < wins.min,
        s"$q: Window(${wins.min}) runs below the histogram HashAggregate(${aggs.min}) — raw rows sort per key")
      assert(!p.contains("row_number("),
        s"$q: raw-row row_number window is back")
    }
  }

  test("q_decontaminate: existence test plans as a semi-join on the hashed gram with partial aggregation") {
    val p = planOf(SparkEntry.queries("q_decontaminate")(spark, dir))
    assert(p.contains("LeftSemi"), "eval-overlap must be a semi-join, not inner+distinct")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "gram join degenerated to O(n²)")
    assert(p.contains("partial_count"), "no map-side partial on the per-doc gram count")
    // the semi-join key must be the 8-byte xxhash64(gram), and the gram
    // string must be projected away before the exchange: the join/exchange
    // key lines mention ghash, and no exchange hashes the raw gram column
    assert(p.contains("xxhash64"), "gram join key is not hashed")
    val keyLines = p.linesIterator.filter(l =>
      l.contains("hashpartitioning") || l.contains("LeftSemi")).toSeq
    assert(keyLines.exists(_.contains("ghash")),
      s"semi-join/exchange not keyed on ghash:\n${keyLines.mkString("\n")}")
    assert(!keyLines.exists(_.contains("gram#")),
      s"raw gram string still shuffles:\n${keyLines.mkString("\n")}")
  }

  test("q_pack_sequences: running sum partitions by (lang, stream) — never a single reducer") {
    val p = planOf(SparkEntry.queries("q_pack_sequences")(spark, dir))
    val winLine = p.linesIterator.find(l => l.contains("Arguments") && l.contains("windowspecdefinition"))
    assert(!p.contains("Exchange SinglePartition"),
      "packing window collapsed to one partition")
    assert(winLine.exists(l => l.contains("lang") && l.contains("part")),
      s"window not partitioned by (lang, part): ${winLine.getOrElse("<none>")}")
  }

  test("q_dedup_embed_banded: candidates come from the band join, never a cartesian") {
    val p = planOf(graft.ops.LlmVector.dedupEmbedBanded(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "banded dedup must not plan an O(n²) join")
    assert(p.contains("ExistingRDD"), "band table not materialized pre-self-join")
  }

  test("q_dedup_embed_banded_prod: band join only, no cartesian; band table pinned (r15)") {
    val p = planOf(graft.ops.LlmVector.dedupEmbedBandedProd(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "prod banded dedup must not plan an O(n²) join")
    assert(p.contains("ExistingRDD"), "prod band table not materialized pre-self-join")
  }

  test("q_graph_pagerank: pinned edges carry their declared hash layout — no per-round " +
      "edge-side exchange (r15)") {
    val p = planOf(SparkEntry.queries("q_graph_pagerank")(spark, dir))
    // every ShuffledHashJoin consumes the pinned edge RDD DIRECTLY: an
    // Exchange whose immediate child is the ExistingRDD scan means the
    // declared layout was lost (the AQE-hides-checkpoint-partitioning
    // regression this pin exists to prevent)
    val lines = p.linesIterator.toSeq
    val rddExchanged = lines.sliding(2).exists(w =>
      w.head.trim.matches(".*- Exchange.*") && w.last.contains("Scan ExistingRDD"))
    assert(!rddExchanged, "pinned edge RDD is re-exchanged — declared layout lost")
  }

  // ---- declared-layout pin regression guards (r16, VERDICT r15 #6): the
  // AQE-hides-checkpoint-partitioning bug was found by measurement at 300×;
  // these keep every materializeHashPartitioned consumer red in CI if a
  // Spark upgrade changes the checkpoint/AQE interplay, instead of 2× at
  // scale. One test per call site: pagerank (above), the CC loop's
  // adjacency (Graph.scala), sql_recursive's edge view (Scalars.scala),
  // and the banded band table (LlmVector.scala).

  private def rddDirectlyExchanged(p: String): Boolean =
    p.linesIterator.toSeq.sliding(2).exists(w =>
      w.head.trim.matches(".*- Exchange.*") && w.last.contains("Scan ExistingRDD"))

  test("cc-loop round join: pinned adjacency carries its declared dst layout — " +
      "only the label side exchanges (r16)") {
    // replicates the hash-min round join Graph.connectedComponents builds
    // (adj pinned on dst, labels plainly materialized): the adj side must
    // consume its pinned blocks directly; exactly the label side shuffles.
    // Auto-broadcast disabled: at sf0.001 the label side would broadcast
    // and the shuffled-join shape this pin exists for would be moot.
    import spark.implicits._
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
    val pairs = graft.ops.Graph.copurchaseEdges(spark, dir)
    val adj = graft.tables.Layout.materializeHashPartitioned(
      pairs.select($"pa".as("src"), $"pb".as("dst"))
        .unionByName(pairs.select($"pb".as("src"), $"pa".as("dst"))), Seq("dst"))
    val labels = graft.tables.Layout.materialize(
      adj.groupBy($"src").agg(org.apache.spark.sql.functions.min($"dst").as("_m"))
        .select($"src".as("vertex"), $"_m".as("component")))
    val round = adj.join(labels, adj("dst") === labels("vertex"))
    val p = planOf(round)
    val exchanges = p.linesIterator.count(_.trim.matches(".*- Exchange.*"))
    assert(exchanges === 1,
      s"round join must exchange ONLY the label side (got $exchanges exchanges):\n$p")
    // negative control: an UNdeclared pin re-exchanges — proves the
    // declared layout (not AQE mood) is what removes the exchange
    val undeclared = graft.tables.Layout.materialize(
      pairs.select($"pa".as("src"), $"pb".as("dst")))
    val ctrl = planOf(undeclared.join(labels, undeclared("dst") === labels("vertex")))
    assert(ctrl.linesIterator.count(_.trim.matches(".*- Exchange.*")) === 2,
      "control: undeclared pin should need both sides exchanged — assertion harness broken?")
    } finally spark.conf.set(key, prev)
  }

  test("GraftBridge.withHashPartitioning keeps its single sanctioned caller (r16, VERDICT r15 #2)") {
    // The rewrap's correctness precondition — the declared layout must be
    // the physical truth — is enforced structurally ONLY because the sole
    // caller, Layout.materializeHashPartitioned, performs the
    // repartition(n, cols) itself. A second direct call site would be a
    // silent-wrong-results hazard (co-partitioned joins dropping matches),
    // so this guard fails the build if one appears.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filter { p =>
        val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        body.contains("withHashPartitioning") &&
          !p.toString.endsWith("org/apache/spark/sql/GraftBridge.scala") &&
          !p.toString.endsWith("graft/tables/Layout.scala")
      }.map(_.toString).toList
    assert(offenders.isEmpty,
      s"withHashPartitioning called outside Layout.materializeHashPartitioned: $offenders")
  }

  test("q_sql_recursive: pinned edge view feeds the UnionLoop without per-iteration re-exchange (r16)") {
    val p = planOf(SparkEntry.queries("q_sql_recursive")(spark, dir))
    assert(!rddDirectlyExchanged(p),
      "pinned g_rec_edges relation is re-exchanged inside the recursion — declared layout lost")
  }

  test("q_dedup_embed_banded: pinned band table self-joins exchange-free (r16)") {
    val p = planOf(graft.ops.LlmVector.dedupEmbedBanded(spark, dir))
    assert(!rddDirectlyExchanged(p),
      "pinned band table is re-exchanged for its self-join — declared layout lost")
  }

  test("q_cep_kleene_star: one scan, one key shuffle, no joins (r15)") {
    val p = planOf(SparkEntry.queries("q_cep_kleene_star")(spark, dir))
    assert(nodeIds(p, "Scan parquet").size === 1, "star pattern should scan events once")
    assert(nodeIds(p, "Join").isEmpty, "the matcher is per-key linear — no join belongs here")
  }

  test("q_join_nullsafe: <=> plans as a hash equi-join, not nested-loop") {
    val p = planOf(SparkEntry.queries("q_join_nullsafe")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "null-safe equality fell back to a nested-loop join")
    assert(p.contains("HashJoin"), "null-safe join not planned as a hash join")
  }

  test("q_quality_repetition: both aggregations have map-side partials") {
    val p = planOf(SparkEntry.queries("q_quality_repetition")(spark, dir))
    assert(p.contains("partial_count"), "no partial on the (doc, word) count")
    assert(p.contains("partial_sum"), "no partial on the per-doc fold")
    assert(!p.contains("CartesianProduct"), "repetition scoring must stay linear")
  }

  test("q_join_bucketed: co-located buckets — the join itself shuffles NEITHER side") {
    // Disable auto-broadcast to expose the fact⋈fact shape bucketing is
    // for (at sf0.001 the dim side would otherwise broadcast and the
    // bucket layout would be moot).
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = planOf(SparkEntry.queries("q_join_bucketed")(spark, dir))
      assert(p.contains("SortMergeJoin"), "bucketed equi-join not planned as sort-merge")
      assert(p.split("Bucketed: true", -1).length - 1 == 2, "both scans must read bucketed layout")
      // in the plan tree, everything printed BELOW the join line is its
      // subtree (agg/sort exchanges sit above it) — the join's inputs must
      // go scan→join with no Exchange between
      val treeEnd = p.indexOf("\n\n")
      val tree = if (treeEnd < 0) p else p.take(treeEnd)
      val below = tree.substring(tree.indexOf("SortMergeJoin"))
      assert(!below.contains("Exchange"), s"a join input re-shuffled — bucket co-location lost:\n$below")
    } finally spark.conf.set(key, prev)
  }

  test("q_ann_pq: ADC shortlist rank plans WindowGroupLimit — no corpus-sized full sort per probe") {
    val p = planOf(SparkEntry.queries("q_ann_pq")(spark, dir))
    // two rank filters (ark<=50 shortlist over corpus×probes, rk<=5 re-rank
    // over the 50-row shortlist) — both must push into the sort as group
    // limits, the shortlist one is the scale claim
    assert(nodeIds(p, "WindowGroupLimit").size >= 2,
      "ADC shortlist / re-rank row_number filters not planned as WindowGroupLimit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "probe attach degenerated to a nested-loop join")
  }

  test("q_ann_ivf_pq: broadcast cell prune + WindowGroupLimit ranks — no nested loop, no corpus sort") {
    val p = planOf(SparkEntry.queries("q_ann_ivf_pq")(spark, dir))
    // probe→cell attach must be a broadcast hash join on cent_id (the
    // coarse prune), never a nested-loop / cartesian probe fan-out
    assert(p.contains("BroadcastHashJoin"), "probe-bucket attach lost its broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "cell prune degenerated to a nested-loop join")
    // three rank filters (per-cell 50, per-probe 50, exact top-5) — all
    // must plan as group limits; the per-cell one is the scale claim (no
    // partition ever sorts more than one invlist's candidates)
    assert(nodeIds(p, "WindowGroupLimit").size >= 3,
      "cell/shortlist/re-rank row_number filters not planned as WindowGroupLimit")
  }

  test("q_text_perplexity: model fit aggregates map-side; the global-N window reads only the vocab frame") {
    val p = planOf(SparkEntry.queries("q_text_perplexity")(spark, dir))
    // token frequencies must partial-aggregate before their shuffle — the
    // corpus-sized explode never crosses the wire raw for the model fit
    assert(p.contains("partial_count") || p.contains("Partial"),
      "token-frequency agg lost its map-side partial")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "token->model join degenerated to a nested loop")
    // the single-reducer Exchange for global N must read the ALREADY-
    // AGGREGATED vocab frame, never raw exploded tokens: in formatted mode
    // the partitioning lives in the detail block ("Arguments:
    // SinglePartition"), and node ids number bottom-up, so the exchange's
    // direct child (id−1) must be the vocab HashAggregate
    val blocks = p.split("""\n\n""")
    val spx = blocks.find(b =>
      b.matches("""(?s)\(\d+\) Exchange.*""") && b.contains("SinglePartition"))
    assert(spx.isDefined, "global-N window lost (plan shape changed?)")
    val id = """\((\d+)\)""".r.findFirstMatchIn(spx.get).get.group(1).toInt
    assert(blocks.exists(_.startsWith(s"(${id - 1}) HashAggregate")),
      "SinglePartition exchange feeds raw rows, not the aggregated vocab frame")
  }

  test("q_cdc_scd2: one hash shuffle on user_id serves both windows and the run collapse") {
    val p = planOf(SparkEntry.queries("q_cdc_scd2")(spark, dir))
    // formatted mode puts the partitioning in the "(n) Exchange" detail
    // block's Arguments line, not on the tree line — count detail blocks
    val hashEx = p.split("""\n\n""").count(b =>
      b.matches("""(?s)\(\d+\) Exchange.*""") && b.contains("hashpartitioning"))
    assert(hashEx == 1,
      s"expected exactly 1 hashpartitioning Exchange (user_id reused by lag/sum windows, groupBy, lead window); got $hashEx")
    assert(!p.contains("Exchange SinglePartition"), "a stage collapsed to one reducer")
  }

  test("q_decontaminate_bloom: Bloom probe filters the train side BELOW its shuffle") {
    val p = planOf(SparkEntry.queries("q_decontaminate_bloom")(spark, dir))
    assert(p.contains("LeftSemi"), "exactness verify must stay a semi-join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "gram join degenerated")
    // the bloom gate is a Filter (r9: the graft_bloom_might_contain codegen
    // expression, no longer a Scala UDF); its node id must precede every
    // Exchange id ABOVE it on the train branch — i.e. the smallest Exchange
    // id in the plan is still larger than the gate's id (leaves number first)
    val bloomFilter = """\((\d+)\) Filter""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val gateIds = p.split("""\n\n""").toSeq.collect {
      case block if block.matches("""(?s)\(\d+\) Filter.*""") &&
          block.contains("graft_bloom_might_contain") =>
        """\((\d+)\)""".r.findFirstMatchIn(block).get.group(1).toInt
    }
    val exs = nodeIds(p, "Exchange")
    assert(bloomFilter.nonEmpty && gateIds.nonEmpty, s"no bloom-gate Filter block found:\n$p")
    assert(exs.nonEmpty && gateIds.min < exs.min,
      s"bloom Filter(${gateIds.headOption}) does not precede the first Exchange(${exs.headOption}) — non-matches shuffle")
    assert(!p.contains("UDF"), "a UDF reappeared in the decontamination hot path")
  }

  test("q_cumulate_window: running sum windows over hour buckets, never raw events") {
    val p = planOf(SparkEntry.queries("q_cumulate_window")(spark, dir))
    val aggs = nodeIds(p, "HashAggregate")
    val wins = nodeIds(p, "Window")
    assert(aggs.nonEmpty && wins.nonEmpty, s"unexpected plan: $p")
    assert(aggs.min < wins.min,
      s"Window(${wins.min}) runs below the bucket HashAggregate(${aggs.min}) — the expanding sum would sort raw events")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "hour bucketing has no map-side partials")
    assert(!p.contains("Exchange SinglePartition"), "day window collapsed to one reducer")
  }

  test("q_layout_zorder: z-blocks come from the value — no window, no corpus sort below the agg") {
    val p = planOf(SparkEntry.queries("q_layout_zorder")(spark, dir))
    assert(nodeIds(p, "Window").isEmpty && !p.contains("row_number("),
      "block assignment regressed to a row_number layout (global sort)")
    val aggs = nodeIds(p, "HashAggregate")
    val sorts = nodeIds(p, "Sort")
    assert(aggs.nonEmpty, s"unexpected plan: $p")
    assert(sorts.forall(_ > aggs.min),
      s"a Sort(${sorts.filter(_ < aggs.min)}) runs below the profile aggregate — corpus-wide sort")
    assert(p.contains("partial_min") || p.contains("partial_count"), "no map-side partials on the profile")
  }

  test("q_quantile_sketch: partial sketches build map-side before the shuffle") {
    val p = planOf(SparkEntry.queries("q_quantile_sketch")(spark, dir))
    assert(p.contains("ObjectHashAggregate"), "sketch not planned as object hash agg")
    assert(p.contains("partial_quantilesketch"),
      "no map-side partial sketch — raw rows would shuffle")
  }

  test("q_heavy_hitters: partial MG summaries build map-side before the shuffle") {
    val p = planOf(SparkEntry.queries("q_heavy_hitters")(spark, dir))
    assert(p.contains("ObjectHashAggregate"), "MG not planned as object hash agg")
    assert(p.contains("partial_heavyhitters"),
      "no map-side partial summary — raw tokens would shuffle")
  }

  test("q_join_asof: range-match runs as an equi-join on user, keep-latest as WindowGroupLimit") {
    val p = planOf(SparkEntry.queries("q_join_asof")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of composition degenerated to a nested-loop join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), "user equality not driving a hash/merge join")
    assert(p.contains("WindowGroupLimit"),
      "keep-latest rank not pushed into the sort — full match set would materialize per purchase")
  }

  test("q_session_dynamic: one shuffle on user — interval merge runs inside the session aggregate") {
    val p = planOf(SparkEntry.queries("q_session_dynamic")(spark, dir))
    val hashEx = p.split("""\n\n""").count(b =>
      b.matches("""(?s)\(\d+\) Exchange.*""") && b.contains("hashpartitioning"))
    assert(hashEx == 1,
      s"expected exactly 1 hashpartitioning Exchange (user_id drives the session merge); got $hashEx")
    assert(!p.contains("Exchange SinglePartition"), "session merge collapsed to one reducer")
    assert(!p.contains("Join"), "dynamic sessions must not plan a self-join")
  }

  test("q_distinct_sketch: partial HLL registers build map-side before the shuffle") {
    val p = planOf(SparkEntry.queries("q_distinct_sketch")(spark, dir))
    assert(p.contains("partial_hlldistinct"),
      "no map-side partial HLL — raw rows would shuffle")
  }

  test("q_distinct_sketch_rollup: leaf registers build map-side; merge side reads the " +
       "materialized sketch frame, not the corpus") {
    // the leaf pass materializes (localCheckpoint) before the final frame
    // is planned, so its shape is asserted on an identically-built frame
    import org.apache.spark.sql.functions.udaf
    val hllRegs = udaf(new graft.functions.HllRegisters(10))
    val leaf = graft.tables.Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(hllRegs(org.apache.spark.sql.functions.col("user_id")).as("regs"))
    assert(planOf(leaf).contains("partial_hllregisters"),
      "no map-side partial register build — raw rows would shuffle")
    val p = planOf(SparkEntry.queries("q_distinct_sketch_rollup")(spark, dir))
    assert(p.contains("hllmerge"), "global row is not produced by sketch merge")
    assert(p.contains("ExistingRDD"),
      "leaf sketch frame not materialized — both consumers would re-scan the corpus")
  }

  test("q_dedup_incremental: delta probes the shared materialized index — equi-join, no base×base") {
    val p = planOf(SparkEntry.queries("q_dedup_incremental")(spark, dir))
    assert(p.contains("ExistingRDD"), "shingle table not materialized once for both sides")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation degenerated to O(n²)")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), "shingle probe is not an equi-join")
  }

  test("q_corpus_drift: vocab counts partial-aggregate; totals broadcast as one row; top-50 fuses") {
    val p = planOf(SparkEntry.queries("q_corpus_drift")(spark, dir))
    assert(p.contains("partial_count"),
      "per-token snapshot counts lost their map-side partials — raw tokens would shuffle")
    // the (na, nb, v) totals attach via a 1-row broadcast, never a shuffle
    // of the vocab frame against itself and never a window over raw rows
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "totals attach lost its broadcast")
    assert(!p.contains("SortMergeJoin"), "1-row totals degenerated to a sort-merge join")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 not fused — a global sort of the vocab frame")
  }

  test("q_skew_diagnose: one partial-agg pass over the fact; 1-row totals broadcast; top-20 fuses") {
    val p = planOf(SparkEntry.queries("q_skew_diagnose")(spark, dir))
    assert(p.contains("partial_count"), "per-key counts lost their map-side partials")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "totals attach lost its broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 not fused — a global sort of the key frame")
  }

  test("report totals branches reuse the vocab/key shuffle — the corpus is scanned once") {
    // ReusedExchange only materializes in the AQE final plan, so this
    // asserts on the executed plan after an action: the (na, nb, v) /
    // (total, n_keys) branch must read the per-token/per-key partials
    // back from the first aggregation's shuffle, not re-scan the corpus.
    for (q <- Seq("q_corpus_drift", "q_skew_diagnose")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val ex = df.queryExecution.executedPlan.toString
      assert(ex.contains("ReusedExchange"),
        s"$q: totals branch re-scans the corpus instead of reusing the key shuffle")
    }
  }

  test("q_layout_compaction: packing windows run over the file manifest, never raw events") {
    val p = planOf(SparkEntry.queries("q_layout_compaction")(spark, dir))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "file stats lost their map-side partials")
    val aggs = nodeIds(p, "HashAggregate")
    val wins = nodeIds(p, "Window")
    assert(aggs.nonEmpty && wins.nonEmpty, s"unexpected plan: $p")
    assert(aggs.min < wins.min,
      s"Window(${wins.min}) below the stats HashAggregate(${aggs.min}) — packing would sort raw events")
    assert(!p.contains("Exchange SinglePartition"),
      "packing collapsed to one reducer — it must stay per-partition")
  }

  test("q_quality_gopher: the gate is map-only — no shuffle below the output sort") {
    val p = planOf(SparkEntry.queries("q_quality_gopher")(spark, dir))
    assert(nodeIds(p, "Window").isEmpty && nodeIds(p, "HashAggregate").isEmpty,
      "a per-doc rule battery needs no aggregation or window")
    // the output total-order sort is the ONLY exchange
    val exs = nodeIds(p, "Exchange")
    assert(exs.size <= 1, s"gate plan shuffles more than the output sort:\n$p")
    assert(!p.contains("UDF"), "rule evaluation fell out of codegen")
  }

  test("q_curriculum_order: global NTILE decomposes — no single-partition window") {
    val p = planOf(SparkEntry.queries("q_curriculum_order")(spark, dir))
    assert(!p.contains("Exchange SinglePartition"),
      "curriculum rank collapsed the corpus into one reducer — the histogram " +
        "decomposition must keep the window partitioned by score")
    assert(p.contains("ntile") == false, "NTILE must be row-local rank arithmetic here")
    val wins = nodeIds(p, "Window")
    assert(wins.nonEmpty, s"expected the per-score row_number window:\n$p")
  }

  test("q_scan_partition_prune: the lang filter prunes at file-listing time, not row time") {
    val p = planOf(SparkEntry.queries("q_scan_partition_prune")(spark, dir))
    assert(p.contains("PartitionFilters"), s"scan has no partition filters:\n$p")
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("lang"), s"lang filter did not reach PartitionFilters: $pf")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "aggregate lost its map-side partials")
  }

  test("q_search_bm25: query-term filter below the tf aggregate; top-20 fuses; stats broadcast") {
    val p = planOf(SparkEntry.queries("q_search_bm25")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      "ranked top-20 must fuse — a global Sort over scored docs appeared")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "tf/score aggregation lost its map-side partials")
    // the IN-list gate must run in the same stage as the explode (below
    // any Exchange): only query-term rows may shuffle
    val gen = nodeIds(p, "Generate")
    val exs = nodeIds(p, "Exchange")
    assert(gen.nonEmpty && exs.nonEmpty && gen.min < exs.min,
      s"explode(Generate ${gen.headOption}) not below the first Exchange(${exs.headOption})")
    assert(nodeIds(p, "BroadcastExchange").nonEmpty,
      "df/totals stats must broadcast, never shuffle the scored side")
  }

  test("q_embed_pca: serving is row-local — projection plan has no join, no agg, one sort exchange") {
    val p = planOf(SparkEntry.queries("q_embed_pca")(spark, dir))
    assert(nodeIds(p, "Join").isEmpty && !p.contains("Join"),
      "projection must not join components to vectors — they are literals")
    assert(nodeIds(p, "HashAggregate").isEmpty,
      "projection must not aggregate — training already happened in its own pass")
    val exs = nodeIds(p, "Exchange")
    assert(exs.size <= 1, s"projection shuffles beyond the output sort:\n$p")
  }

  test("q_chunk_sliding: chunk expansion is map-only — codegen sequence+explode, no shuffle below the sort") {
    val p = planOf(SparkEntry.queries("q_chunk_sliding")(spark, dir))
    assert(nodeIds(p, "Generate").nonEmpty, "chunk explode missing")
    val exs = nodeIds(p, "Exchange")
    assert(exs.size <= 1, s"chunking shuffles beyond the output sort:\n$p")
    assert(nodeIds(p, "HashAggregate").isEmpty && !p.contains("Join"),
      "row-local chunking must not aggregate or join")
  }

  test("q_rank_fusion: one corpus explode; both candidate lists fuse to TakeOrderedAndProject") {
    val p = planOf(SparkEntry.queries("q_rank_fusion")(spark, dir))
    assert(nodeIds(p, "Generate").size == 1,
      "corpus exploded more than once — df window rewrite regressed")
    // three TakeOrderedAndProject: lex top-50, sem top-50, fused top-20
    assert(nodeIds(p, "TakeOrderedAndProject").size == 3,
      "a candidate list or the fusion lost its sort+limit fusion")
    assert(!p.contains("CartesianProduct"), "fusion join degenerated")
  }

  test("q_join_pit: one user_id shuffle builds the dimension; PIT match joins without cartesian") {
    val p = planOf(SparkEntry.queries("q_join_pit")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "PIT range join degenerated to nested-loop")
    val hashEx = p.split("""\n\n""").count(b =>
      b.matches("""(?s)\(\d+\) Exchange.*""") && b.contains("hashpartitioning"))
    assert(hashEx <= 2, s"dim build + join should need at most 2 hash exchanges; got $hashEx")
    assert(!p.contains("SinglePartition"), "a stage collapsed to one reducer")
  }

  test("q_attribution: single touch join; latest-touch cut applied map-side; totals over the channel frame") {
    val p = planOf(SparkEntry.queries("q_attribution")(spark, dir))
    val joins = p.split("""\n\n""").count(b => b.matches("""(?s)\(\d+\) \w*Join.*"""))
    assert(joins == 1, s"touch join re-ran for the totals branch (got $joins joins)")
    val wgl = nodeIds(p, "WindowGroupLimit")
    val exs = nodeIds(p, "Exchange")
    assert(wgl.nonEmpty && exs.nonEmpty && wgl.min < exs.min,
      "latest-touch rn=1 cut not applied map-side")
  }

  test("q_stats_ks: cut probe broadcast in-plan — cum/total windows run over the bucket histogram frame") {
    val p = planOf(SparkEntry.queries("q_stats_ks")(spark, dir))
    val scans = p.split("""\n\n""").count(b => b.trim.matches("""(?s)\(\d+\) Scan parquet.*"""))
    // 2 scans since r14: the one-row cut probe (pruned to event_id, rides
    // a BroadcastExchange) + the histogram scan — same IO as the old
    // driver .head() cut job, but the whole query is ONE job now
    assert(scans == 2, s"expected histogram scan + in-plan cut probe (got $scans scans)")
    assert(p.contains("BroadcastExchange"), "cut consts frame not broadcast")
    assert(p.contains("partial_sum"), "bucket histogram lost map-side partials")
    // the SinglePartition exchange must consume the AGGREGATED histogram
    val blocks = p.split("""\n\n""")
    val spx = blocks.find(b =>
      b.matches("""(?s)\(\d+\) Exchange.*""") && b.contains("SinglePartition"))
    assert(spx.isDefined, "cumulative window lost")
    val id = """\((\d+)\)""".r.findFirstMatchIn(spx.get).get.group(1).toInt
    assert(blocks.exists(_.startsWith(s"(${id - 1}) HashAggregate")),
      "SinglePartition exchange feeds raw events, not the histogram")
  }

  test("q_quality_c4: the rule battery is map-only — no shuffle below the output sort") {
    val p = planOf(SparkEntry.queries("q_quality_c4")(spark, dir))
    val exs = nodeIds(p, "Exchange")
    assert(exs.size <= 1, s"rule battery shuffles beyond the output sort:\n$p")
    assert(nodeIds(p, "HashAggregate").isEmpty && !p.contains("Join"),
      "row-local rules must not aggregate or join")
  }

  test("q_stats_entropy: token counts aggregate map-side; lang window runs over the vocab frame") {
    val p = planOf(SparkEntry.queries("q_stats_entropy")(spark, dir))
    assert(p.contains("partial_count"), "token counting lost its map-side partials")
    assert(!p.contains("SinglePartition"), "a stage collapsed to one reducer")
    // the per-lang totals window must consume the AGGREGATED vocab frame:
    // its Exchange (lang) sits above the (lang, w) count agg, never raw tokens
    val gen = nodeIds(p, "Generate")
    val aggs = nodeIds(p, "HashAggregate")
    assert(gen.nonEmpty && aggs.nonEmpty && gen.min < aggs.min,
      "explode must feed the count agg directly")
  }

  test("q_sample_reservoir: the k=100 cut runs map-side (WindowGroupLimit below the shuffle)") {
    val p = planOf(SparkEntry.queries("q_sample_reservoir")(spark, dir))
    val wgl = nodeIds(p, "WindowGroupLimit")
    val exs = nodeIds(p, "Exchange")
    assert(wgl.nonEmpty && exs.nonEmpty && wgl.min < exs.min,
      s"reservoir cut not applied map-side: WindowGroupLimit $wgl vs Exchange $exs")
    assert(!p.contains("SinglePartition"), "a stage collapsed to one reducer")
  }

  test("q_interval_islands: one user_id hash shuffle serves both windows AND the island collapse") {
    val p = planOf(SparkEntry.queries("q_interval_islands")(spark, dir))
    val hashEx = p.split("""\n\n""").count(b =>
      b.matches("""(?s)\(\d+\) Exchange.*""") && b.contains("hashpartitioning"))
    assert(hashEx == 1,
      s"expected exactly 1 hashpartitioning Exchange (cummax window, island sum, groupBy all keyed on user_id); got $hashEx")
    assert(!p.contains("SinglePartition"), "a stage collapsed to one reducer")
  }

  test("q_stats_chi2: one documents scan; SinglePartition exchanges consume the cell frame, not the corpus") {
    val p = planOf(SparkEntry.queries("q_stats_chi2")(spark, dir))
    val scans = p.split("""\n\n""").count(b => b.trim.matches("""(?s)\(\d+\) Scan parquet.*"""))
    assert(scans == 1, s"documents scan re-ran for a totals branch (got $scans scans)")
    assert(p.contains("partial_count"), "cell census lost map-side partials")
    // every SinglePartition exchange must sit above the first HashAggregate
    // (the ≤|lang|·|source| cell frame), never on raw documents
    val blocks = p.split("""\n\n""")
    val aggIds = nodeIds(p, "HashAggregate")
    for (b <- blocks if b.matches("""(?s)\(\d+\) Exchange.*""") && b.contains("SinglePartition")) {
      val id = """\((\d+)\)""".r.findFirstMatchIn(b).get.group(1).toInt
      // formatted-explain numbers children SMALLER: an aggregate must sit
      // BELOW (smaller id than) every SinglePartition exchange
      assert(aggIds.exists(_ < id), s"SinglePartition exchange $id below the cell aggregate")
    }
  }

  test("q_dedup_containment: prefix-index candidate join is an equi hash join — no cartesian, no nested loop") {
    val p = planOf(SparkEntry.queries("q_dedup_containment")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "containment filter-verify degenerated to an all-pairs join")
    // candidate dedup is a two-phase aggregate (partial below its exchange;
    // the counted column is pruned, so no named partial_count survives)
    assert(nodeIds(p, "HashAggregate").size >= 2, "candidate dedup lost its partial phase")
  }

  test("q_graph_triangles: wedge and closing joins are equi joins — no cartesian, no nested loop") {
    val p = planOf(SparkEntry.queries("q_graph_triangles")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "triangle enumeration degenerated to an all-pairs join")
  }

  test("q_ts_bollinger: both frame sums share ONE window pass over one user_id shuffle") {
    val p = planOf(SparkEntry.queries("q_ts_bollinger")(spark, dir))
    val scans = p.split("""\n\n""").count(b => b.trim.matches("""(?s)\(\d+\) Scan parquet.*"""))
    assert(scans == 1, s"event scan re-ran (got $scans scans)")
    assert(nodeIds(p, "Window").size == 1,
      "count/sum/sumsq split into multiple Window operators — frame pass not shared")
    assert(!p.contains("SinglePartition"), "a stage collapsed to one reducer")
  }

  test("q_ts_ewma: 16 lag terms + rank share ONE window pass; no extra exchange") {
    val p = planOf(SparkEntry.queries("q_ts_ewma")(spark, dir))
    assert(nodeIds(p, "Window").size == 1,
      "lag terms and row_number split into multiple Window operators")
    assert(!p.contains("SinglePartition"), "a stage collapsed to one reducer")
  }

  test("q_win_streak: day-distinct partitioning is reused by the run aggregation — no extra exchange") {
    val p = planOf(SparkEntry.queries("q_win_streak")(spark, dir))
    val scans = p.split("""\n\n""").count(b => b.trim.matches("""(?s)\(\d+\) Scan parquet.*"""))
    assert(scans == 1, s"event scan re-ran (got $scans scans)")
    // hash(user_id) from the rank window satisfies groupBy(user_id, grp)
    // and groupBy(user_id): at most the distinct, window, and output-sort
    // exchanges may appear
    assert(nodeIds(p, "Exchange").size <= 3,
      s"streak aggregation re-shuffled beyond distinct/window/sort:\n$p")
  }

  test("q_ts_similarity: candidate windows come from ONE window pass — no self-join; top-10 fuses") {
    val p = planOf(SparkEntry.queries("q_ts_similarity")(spark, dir))
    assert(nodeIds(p, "Window").size == 1,
      "the 8 lag reads + rank split into multiple Window operators")
    assert(!p.contains("Join"), "template matching joined instead of sliding row-locally")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 did not fuse — a global Sort over all windows appeared")
  }

  test("q_active_users: WAU explode feeds a two-phase distinct — no cartesian, no driver set union") {
    val p = planOf(SparkEntry.queries("q_active_users")(spark, dir))
    // the one-row max-day frame rides a BroadcastNestedLoopJoin (the
    // corpus_drift one-row-totals pattern) — only a true cartesian is wrong
    assert(!p.contains("CartesianProduct"), "DAU/WAU degenerated to an all-pairs plan")
    assert(nodeIds(p, "Generate").nonEmpty, "contribution explode missing")
    assert(nodeIds(p, "HashAggregate").size >= 4,
      "distinct/count aggregates lost their partial phases")
  }

  test("q_rfm_segment: scoring is row-local against literals — the customer frame never re-shuffles") {
    val p = planOf(SparkEntry.queries("q_rfm_segment")(spark, dir))
    // the metric frame reads from the standing-state parquet or checkpoint;
    // scoring adds no join and no window over customers — one output sort
    assert(!p.contains("Join"), "threshold scoring joined instead of using literals")
    assert(nodeIds(p, "Window").isEmpty,
      "a window appeared in the scoring plan — quintiles must come from collected thresholds")
  }

  test("q_join_lateral: correlated LIMIT decorrelates to a Window — no nested loop per outer row") {
    val p = planOf(SparkEntry.queries("q_join_lateral")(spark, dir))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "lateral subquery executed as a per-row nested loop")
    assert(nodeIds(p, "Window").nonEmpty,
      "correlated LIMIT did not decorrelate to the window-rank form")
  }

  test("q_graph_pagerank: 5 unrolled join+agg rounds over the pinned edge RDD — no per-round re-derivation") {
    val p = planOf(SparkEntry.queries("q_graph_pagerank")(spark, dir))
    // exactly one join per damped iteration — a 6th join or a dropped one
    // means the unrolled loop shape changed
    val joins = nodeIds(p, "SortMergeJoin") ++ nodeIds(p, "ShuffledHashJoin") ++
      nodeIds(p, "BroadcastHashJoin")
    assert(joins.size === 5, s"expected 5 per-round joins, found ${joins.size}")
    // every edge reference bottoms out in the SAME pinned standing-edge RDD:
    // a parquet scan here would mean some round re-derives the graph
    assert(!p.contains("Scan parquet"),
      "pagerank plan re-reads parquet — rounds are not served from the pinned edges")
    assert(nodeIds(p, "Scan ExistingRDD").size >= 5,
      "fewer pinned-edge scans than rounds — loop shape changed")
    // per-round Exchange growth (the 9.6s-class re-pricing signature) would
    // blow well past the unrolled plan's constant ~1 exchange/round + final
    // sort + the r13 single-job consts frame (one SinglePartition agg + one
    // one-row BroadcastExchange replacing the old driver count() action)
    val exch = nodeIds(p, "Exchange") ++ nodeIds(p, "BroadcastExchange")
    assert(exch.size <= 14, s"exchange count grew to ${exch.size} — per-round re-pricing returned")
  }

  test("q_sql_recursive: UnionLoop body is ONE frontier join against the hoisted edge RDD") {
    val p = planOf(SparkEntry.queries("q_sql_recursive")(spark, dir))
    assert(p.contains("UnionLoop") && p.contains("UnionLoopRef"),
      "recursive CTE no longer executes through UnionLoop")
    // the loop body must contain exactly one Join (frontier x edges) and no
    // edge re-derivation: edges arrive as the pre-materialized LogicalRDD,
    // never as parquet relations or an in-loop pair aggregation
    assert(nodeIds(p, "Join").size === 1,
      s"loop body should hold ONE frontier join, found ${nodeIds(p, "Join").size}")
    assert(!p.contains("Scan parquet") && !p.toLowerCase.contains("lineitem"),
      "edge derivation leaked back inside the recursive loop")
    assert(nodeIds(p, "Aggregate").size === 1,
      "only the seed MIN aggregate belongs inside the loop — edge agg re-derivation returned")
  }

  test("q_dedup_cluster: prices CC + report over the standing pair graph — no pair re-discovery") {
    val p = planOf(SparkEntry.queries("q_dedup_cluster")(spark, dir))
    // the shingle pipeline (explode + codegen intersect) must NOT appear:
    // pairs come from the standing table, labels from the completed CC loop
    assert(nodeIds(p, "Generate").isEmpty,
      "a shingle/token explode appeared — pair discovery re-priced inside the cluster query")
    assert(!p.contains("sorted_intersect"),
      "the verify kernel appeared — pair verification re-priced inside the cluster query")
    // exactly one parquet scan: documents (canonical-pick text length)
    assert(nodeIds(p, "Scan parquet").size === 1,
      "unexpected parquet scans — report should read documents once, pairs from the CC output")
  }

  test("q_path_mining: first-8 cap runs map-side (WindowGroupLimit below the shuffle); top-25 fuses") {
    val p = planOf(SparkEntry.queries("q_path_mining")(spark, dir))
    // Spark pushes the rn<=8 filter to a partial WindowGroupLimit BEFORE the
    // user_id Exchange — only 8 rows per user per input partition shuffle.
    val wgl = nodeIds(p, "WindowGroupLimit")
    val exs = nodeIds(p, "Exchange")
    assert(wgl.nonEmpty && exs.nonEmpty && wgl.min < exs.min,
      s"path cap not applied map-side: WindowGroupLimit $wgl vs Exchange $exs")
    assert(p.contains("TakeOrderedAndProject"),
      "top-25 paths must fuse — a global Sort over the path table appeared")
    assert(!p.contains("SinglePartition"), "a stage collapsed to one reducer")
  }

  test("q_shuffle_epoch: permutation windows partition by (epoch, shard) — no single global sequence") {
    val p = planOf(SparkEntry.queries("q_shuffle_epoch")(spark, dir))
    // parallelism = epochs×shards: the row_number window must carry both keys
    assert(p.linesIterator.exists(l =>
      l.contains("row_number()") && l.contains("epoch") && l.contains("shard")),
      "pos window not partitioned by (epoch, shard)")
    assert(!p.contains("SinglePartition"),
      "a global sequence stage appeared — the no-global-rownumber contract broke")
    // hash + shard derivation are map-side: exactly one Exchange feeds the
    // window (the output order sort is a rangepartitioning exchange)
    assert(p.contains("hashpartitioning(epoch"), "window input not hash-partitioned on epoch")
  }

  test("q_stats_auc: one event scan, partial agg before the exchange, window over the bounded histogram only") {
    val df = SparkEntry.queries("q_stats_auc")(spark, dir)
    val p = planOf(df)
    assert(nodeIds(p, "Scan parquet").size === 1, "AUC should read events exactly once")
    assert(p.contains("partial_sum"), "histogram agg lost its map-side partial")
    // the SinglePartition stage must sit ABOVE the bucket aggregation
    // (bounded-histogram frame), never over raw event rows
    val aggEx = p.linesIterator.zipWithIndex.collectFirst {
      case (l, i) if l.contains("hashpartitioning(b#") => i }
    val single = p.linesIterator.zipWithIndex.collectFirst {
      case (l, i) if l.contains("SinglePartition") => i }
    assert(aggEx.nonEmpty && single.nonEmpty,
      "expected a bucket exchange and a bounded-frame single partition")
    assert(aggEx.get < single.get,
      "single-partition stage sits below the bucket exchange — window over raw event rows")
  }

  test("q_text_keywords: tf materialized once, constant top-3 prunes map-side") {
    val p = planOf(SparkEntry.queries("q_text_keywords")(spark, dir))
    // the tf relation feeds the df fold AND the join probe: both sides must
    // read the checkpointed RDD, never re-run the corpus explode
    assert(nodeIds(p, "Scan ExistingRDD").size >= 2,
      "tf relation recomputed — materialize-once lost")
    assert(nodeIds(p, "Generate").isEmpty,
      "corpus explode appears in the serving plan — should be behind the checkpoint")
    assert(p.contains("WindowGroupLimit"),
      "constant rank-3 cut lost its map-side WindowGroupLimit")
  }

  test("q_ts_fill_forward: ONE user shuffle serves fill window and census agg") {
    val p = planOf(SparkEntry.queries("q_ts_fill_forward")(spark, dir))
    // window partition key == agg key, so a single hash exchange on
    // user_id feeds both; the only other exchange is the final ORDER BY
    val hashEx = p.linesIterator.filter(_.contains("hashpartitioning(user_id")).size
    assert(hashEx === 1, s"expected exactly one user_id exchange, saw $hashEx")
    assert(nodeIds(p, "Scan parquet").size === 1, "events read more than once")
  }

  test("q_stats_linreg / q_stats_gini: regression and Lorenz frames are bounded histograms") {
    val lr = planOf(SparkEntry.queries("q_stats_linreg")(spark, dir))
    // the day census aggregates map-side before any exchange; the spine
    // bounds ride a one-row broadcast, never a corpus-wide join shuffle
    assert(lr.contains("partial_count"), "daily census lost its map-side partial")
    assert(lr.contains("BroadcastExchange") || lr.contains("BroadcastNestedLoopJoin"),
      "day bounds not broadcast")
    val g = planOf(SparkEntry.queries("q_stats_gini")(spark, dir))
    // SinglePartition only ABOVE the k$-histogram aggregation (the AUC rule)
    val aggEx = g.linesIterator.zipWithIndex.collectFirst {
      case (l, i) if l.contains("hashpartitioning(v#") => i }
    val single = g.linesIterator.zipWithIndex.collectFirst {
      case (l, i) if l.contains("SinglePartition") => i }
    assert(aggEx.nonEmpty && single.nonEmpty && aggEx.get < single.get,
      "Lorenz cumulative window must run over the bounded value histogram")
  }

  test("q_join_asof_nearest: user-banded join, rn=1 cut prunes map-side") {
    val p = planOf(SparkEntry.queries("q_join_asof_nearest")(spark, dir))
    assert(p.contains("WindowGroupLimit"), "nearest cut lost its WindowGroupLimit")
    assert(!p.contains("CartesianProduct"), "candidate join degenerated to a cartesian")
  }

  test("q_mix_rebalance: lang frame and min broadcast to the keep filter — the corpus never shuffles for them") {
    val p = planOf(SparkEntry.queries("q_mix_rebalance")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "per-lang totals not broadcast to the doc filter")
    assert(!p.contains("SortMergeJoin"),
      "the lang frame degenerated to a sort-merge join against the corpus")
  }

  test("q_text_bpe_merge: pair census aggregates map-side; top-20 fuses to TakeOrderedAndProject") {
    val p = planOf(SparkEntry.queries("q_text_bpe_merge")(spark, dir))
    assert(p.contains("partial_count"),
      "pair census has no map-side partial — the shuffle carries raw char positions")
    assert(p.contains("TakeOrderedAndProject"), "top-20 runs as a global sort, not top-k")
    assert(nodeIds(p, "Scan parquet").size === 1, "documents scanned more than once")
  }

  test("q_stats_psi: cut probe broadcast in-plan; window and final agg share the event_type exchange") {
    val df = SparkEntry.queries("q_stats_psi")(spark, dir)
    val p = planOf(df)
    // 2 scans since r14: the one-row cut probe + the histogram scan (the
    // q_stats_ks note) — one job, no driver cut round-trip
    assert(nodeIds(p, "Scan parquet").size === 2,
      "expected histogram scan + in-plan cut probe")
    assert(p.contains("BroadcastExchange"), "cut consts frame not broadcast")
    assert(p.contains("partial_sum"), "histogram build has no map-side partial")
    // exchanges: histogram agg, window-by-type, final display sort, plus
    // the cut probe's one-row partial→final merge (carries ~|partitions|
    // rows — job-overhead-free since r14, not data) — nothing between the
    // totals window and the per-type reduction (partitioning reuse)
    val ex = nodeIds(p, "Exchange").size
    assert(ex <= 4, s"expected ≤4 shuffles (agg, window, sort, cut merge) — got $ex:\n$p")
  }

  test("q_anomaly_cusum: daily census materialized once — three cached consumers, all joins broadcast") {
    val p = planOf(SparkEntry.queries("q_anomaly_cusum")(spark, dir))
    assert(nodeIds(p, "Scan ExistingRDD").size === 3,
      "the (type, day) census is not served to all three consumers from one materialization")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "grid assembly degenerated from broadcast joins")
    assert(nodeIds(p, "Scan parquet").isEmpty,
      "a consumer re-scans events instead of reading the materialized census")
  }

  test("q_interval_concurrency: minute census aggregates map-side; windows run on the day grid only") {
    val p = planOf(SparkEntry.queries("q_interval_concurrency")(spark, dir))
    assert(p.contains("partial_count"),
      "minute census has no map-side partial — the shuffle carries raw grid instants")
    assert(nodeIds(p, "Scan parquet").size === 1, "events scanned more than once")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "concurrency census should join nothing — sweep-line shapes are banned here")
  }

  test("r14 CEP rows (next/any/reluctant): one key shuffle, one scan, no joins — " +
       "the MATCH_RECOGNIZE partition contract") {
    // both matcher surfaces plan identically: scan → shuffle on user_id →
    // per-key sort + linear matcher (flatMapGroups) → global order. The
    // per-key state never crosses keys, so 1000 executors split by user
    // with zero driver involvement; the one Exchange before the final
    // sort is the inherent partition contract, not overhead.
    Seq("q_cep_next", "q_cep_any", "q_cep_reluctant").foreach { k =>
      val p = planOf(SparkEntry.queries(k)(spark, dir))
      assert(nodeIds(p, "Scan parquet").size === 1, s"$k: events scanned more than once")
      assert(!p.contains("Join"), s"$k: the matcher must not plan joins")
      val exs = nodeIds(p, "Exchange")
      assert(exs.size <= 2, s"$k: more than (key shuffle + output sort) exchanges:\n$p")
    }
  }
}
