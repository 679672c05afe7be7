package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gradable bounds for the rows-only queries (VERDICT r10 #2).
  *
  * The 20 `oracle: no` keys in SURVEY §2 are sketch/ANN/layout operators
  * whose exact output is engine-specific by design, so the DuckDB compare
  * reports them `no_oracle` every round. This module re-measures, on the
  * SAME sfDir the driver verifies at, the quantitative bounds their specs
  * assert (recall@5 for the ANN family, rank-ε for KLL, the 3σ envelope
  * for HLL, the n/(k+1) envelope for Misra-Gries, fp envelope for Bloom,
  * precision/recall vs the exact twin for banded embedding dedup, and
  * double-run determinism for the layout/fingerprint/LSH rows) and emits
  * one pass/fail record per key — an auditable artifact instead of a
  * silent `no_oracle`.
  *
  * Thresholds mirror the spec assertions 1:1 (MiniOpsSpec, VectorDedupSpec,
  * HllSketchSpec, QuantileSketchSpec, HeavyHittersSpec, BloomSketchSpec,
  * CurationSpec, PcaSpec) — if a spec bound changes, change it here too.
  *
  * Scale note: every `.collect()` below is bounded by design — query
  * outputs are ≤ a few thousand summary rows, and the reference sets
  * (brute-force top-k, exact dup pairs) are the same driver-side sets the
  * specs already materialize at test SFs. This is verification tooling; it
  * runs at verification SFs, never on the 100 TB path.
  */
object Invariants {

  /** One measured bound: pass iff `value cmp threshold`. */
  final case class Check(name: String, value: Double, threshold: Double, cmp: String) {
    def pass: Boolean = cmp match {
      case "<=" => value <= threshold
      case ">=" => value >= threshold
      case _    => value == threshold
    }
  }

  private def bool(b: Boolean): Double = if (b) 1.0 else 0.0

  /** Row-identical across two full executions (the rows-only determinism
    * contract: same data + same plan → same rows, every run). */
  private def determinism(spark: SparkSession, dir: String, key: String): Check = {
    def dump(): Seq[String] =
      SparkEntry.queries(key)(spark, dir).collect().map(_.toString).toSeq.sorted
    Check("double_run_deterministic", bool(dump() == dump()), 1.0, ">=")
  }

  /** recall@5 of an ANN query vs the brute-force twin q_sim_cosine_topk:
    * the pooled recall (the r10 bound) PLUS the per-probe minimum (r15,
    * VERDICT r14 #4 — a mean can hide one probe whose IVF probe set
    * missed entirely; the worst probe is what a user of any single query
    * experiences). */
  private def annRecall(spark: SparkSession, dir: String, key: String): Seq[Check] = {
    def pairs(k: String): Set[(Long, Long)] =
      SparkEntry.queries(k)(spark, dir).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = pairs("q_sim_cosine_topk")
    val approx = pairs(key)
    val perProbe = exact.groupBy(_._1).map { case (p, ex) =>
      (ex intersect approx).size.toDouble / ex.size
    }
    Seq(
      Check("recall_at_5",
        (exact intersect approx).size.toDouble / math.max(1, exact.size), 0.8, ">="),
      Check("worst_probe_recall_at_5",
        if (perProbe.isEmpty) 0.0 else perProbe.min, 0.4, ">="))
  }

  /** Exact-duplicate text pairs (same `text`, different doc_id, a<b). Any
    * sound near-dup candidate generator must surface every one of them. */
  private def exactDupPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = graft.tables.Tables.documents(spark, dir).select($"doc_id", $"text")
    d.as("x").join(d.as("y"), $"x.text" === $"y.text" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
  }

  def compute(spark: SparkSession, dir: String): Seq[(String, Seq[Check])] = {
    import spark.implicits._

    val out = Seq.newBuilder[(String, Seq[Check])]
    def add(key: String)(checks: => Seq[Check]): Unit =
      out += key -> (try checks catch {
        case e: Throwable => Seq(Check(s"computation_failed: ${e.getClass.getSimpleName}", 0.0, 1.0, ">="))
      })

    // -------------------------------------------------- approx aggregates
    add("q_agg_approx_distinct") {
      // MiniOpsSpec: per-group HLL++ relative error ≤ 5%
      val rows = SparkEntry.queries("q_agg_approx_distinct")(spark, dir).collect()
      val maxRel = rows.map { r =>
        val (a, e) = (r.getAs[Long]("approx_uv").toDouble, r.getAs[Long]("exact_uv").toDouble)
        math.abs(a - e) / math.max(1.0, e)
      }.max
      Seq(Check("max_rel_err", maxRel, 0.05, "<="))
    }

    add("q_agg_approx_quantile") {
      // CurationSpec: p50/p95 within 2% of exact percentiles (exact via
      // Spark's exact `percentile` aggregate — one pass, no driver sort)
      val approx = SparkEntry.queries("q_agg_approx_quantile")(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val exact = graft.tables.Tables.table(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("ps"))
        .collect().map(r => r.getString(0) -> {
          val s = r.getSeq[Double](1); (s(0), s(1))
        }).toMap
      val maxRel = exact.map { case (f, (e50, e95)) =>
        val (a50, a95) = approx(f)
        math.max(math.abs(a50 - e50) / e50, math.abs(a95 - e95) / e95)
      }.max
      Seq(Check("max_rel_err_p50_p95", maxRel, 0.02, "<="))
    }

    add("q_overlap_sketch") {
      // KmvSketchSpec: overlap/distinct estimates vs the exact twin
      // columns within the 3×RSE envelope (k=512 → 14%); exact-mode rows
      // (sketch not full) must match exactly, which this bound subsumes.
      val rows = SparkEntry.queries("q_overlap_sketch")(spark, dir).collect()
      val maxRel = rows.map { r =>
        val relO = math.abs(r.getAs[Long]("est_overlap") - r.getAs[Long]("exact_overlap")).toDouble /
          math.max(1.0, r.getAs[Long]("exact_overlap").toDouble)
        val relA = math.abs(r.getAs[Long]("est_a") - r.getAs[Long]("exact_a")).toDouble /
          math.max(1.0, r.getAs[Long]("exact_a").toDouble)
        math.max(relO, relA)
      }.max
      Seq(Check("max_rel_err_vs_exact_twin", maxRel, 0.14, "<="),
        determinism(spark, dir, "q_overlap_sketch"))
    }

    // -------------------------------------------------- ANN family
    Seq("q_ann_ivf", "q_ann_ivf_incremental", "q_ann_pq", "q_ann_ivf_pq")
      .foreach(k => add(k) { annRecall(spark, dir, k) })

    // -------------------------------------------------- embedding dedup
    add("q_dedup_embed_banded") {
      // VectorDedupSpec: precision exactly 1 vs the exact twin; recall
      // bound raised 0.7 → 0.8 (r16, VERDICT r15 #4 — measured 0.857 at
      // sf0.01; the old bound left a 15-point silent-regression window)
      def pairSet(k: String): Set[(Long, Long)] =
        SparkEntry.queries(k)(spark, dir).select($"vec_a", $"vec_b")
          .as[(Long, Long)].collect().toSet
      val exact = pairSet("q_dedup_embed_cosine")
      val banded = pairSet("q_dedup_embed_banded")
      // Planted near-threshold adversaries (r16, the minhash discipline):
      // per base vector (150 lowest ids) two deterministic truncations —
      // `hi` (+10⁹, first 20 of 64 dims kept → cos ≈ √(20/64) ≈ 0.56) and
      // `lo` (+2·10⁹, first 8 kept → ≈ 0.35). True cosine is MEASURED per
      // pair (same double fold as the engine), never trusted from the
      // construction: pairs classify hi iff cos ≥ 0.5, lo iff ≤ 0.40, the
      // dead zone is excluded. hi pairs must be FOUND by the banding
      // (expected per-pair detection 1−(1−p⁴)¹² ≈ 0.95 at cos 0.56);
      // measured-lo pairs must never be EMITTED — the row's exact-cosine
      // gate makes that structural, and the check pins the
      // filter-before-round order a refactor could silently break.
      val base = graft.tables.Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding").orderBy($"vec_id").limit(150)
        .as[(Long, Seq[Float])].collect()
      def trunc(v: Seq[Float], keep: Int): Seq[Float] =
        v.zipWithIndex.map { case (x, i) => if (i < keep) x else 0f }
      def cosd(a: Seq[Float], b: Seq[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < math.min(a.length, b.length)) {
          val (x, y) = (a(i).toDouble, b(i).toDouble)
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val plantedRows = base.flatMap { case (id, v) =>
        Seq((id, v), (id + 1000000000L, trunc(v, 20)), (id + 2000000000L, trunc(v, 8)))
      }.toSeq
      val cand = graft.ops.LlmVector
        .embedBandedPairsOf(spark, spark.createDataset(plantedRows)
          .toDF("vec_id", "embedding")
          .select($"vec_id", $"embedding".cast("array<float>").as("embedding")))
        .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
      val measured = base.flatMap { case (id, v) =>
        Seq((id, id + 1000000000L, cosd(v, trunc(v, 20))),
          (id, id + 2000000000L, cosd(v, trunc(v, 8))))
      }
      val hi = measured.filter(_._3 >= 0.5).map(p => (p._1, p._2))
      val lo = measured.filter(_._3 <= 0.40).map(p => (p._1, p._2))
      Seq(
        Check("precision_vs_exact_twin",
          if (banded.isEmpty) 1.0 else (banded intersect exact).size.toDouble / banded.size, 1.0, ">="),
        Check("recall_vs_exact_twin",
          (banded intersect exact).size.toDouble / math.max(1, exact.size), 0.8, ">="),
        Check("planted_hi_pairs_present", hi.size.toDouble, 1.0, ">="),
        Check("planted_lo_pairs_present", lo.size.toDouble, 1.0, ">="),
        Check("planted_hi_recall", hi.count(cand).toDouble / math.max(1, hi.size), 0.8, ">="),
        Check("planted_lo_emitted", lo.count(cand).toDouble, 0.0, "<="))
    }

    add("q_dedup_embed_banded_prod") {
      // r15 (VERDICT r14 #1): the production-threshold sibling — cos ≥ 0.85,
      // 24×16-bit bands — graded against its own exact brute-force twin over
      // the planted-duplicate corpus. exact_twin_nonempty guards against the
      // vacuous-recall trap (the raw corpus has NO 0.85-pairs, so a grading
      // that silently fell back to it would pass on an empty set).
      def pairSet(df: DataFrame): Set[(Long, Long)] =
        df.select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
      val exact = pairSet(graft.ops.LlmVector.prodExactPairs(spark, dir))
      val banded = pairSet(SparkEntry.queries("q_dedup_embed_banded_prod")(spark, dir))
      Seq(
        Check("exact_twin_nonempty", exact.size.toDouble, 1.0, ">="),
        Check("precision_vs_exact_twin",
          if (banded.isEmpty) 1.0 else (banded intersect exact).size.toDouble / banded.size, 1.0, ">="),
        Check("recall_vs_exact_twin",
          (banded intersect exact).size.toDouble / math.max(1, exact.size), 0.8, ">="),
        determinism(spark, dir, "q_dedup_embed_banded_prod"))
    }

    add("q_dedup_embed_cluster") {
      val rows = SparkEntry.queries("q_dedup_embed_cluster")(spark, dir).collect()
      val medoidMember = rows.forall { r =>
        r.getAs[String]("members").split("/").map(_.toLong)
          .contains(r.getAs[Long]("canonical_vec"))
      }
      Seq(
        Check("medoid_is_member", bool(medoidMember), 1.0, ">="),
        determinism(spark, dir, "q_dedup_embed_cluster"))
    }

    // -------------------------------------------------- text near-dup
    // recall vs the ORACLE-CHECKED exact twin q_dedup_ngram_jaccard (the
    // verified Jaccard ≥ 0.5 pair set) — the banded-family grading the
    // embedding dedup already gets (VERDICT r12 #5). Candidate generators
    // are graded on recall only: banding deliberately over-generates and a
    // downstream verify (q_dedup_cluster's pipeline) prices precision.

    // Planted-adversary corpus (r15, VERDICT r14 #4): the organic corpus
    // only exercises J = 1 duplicates, so the near-threshold behavior of
    // the banding was ungraded. Per base doc (30 lowest-id docs with ≥ 40
    // tokens) build deterministic variants with controlled token overlap:
    // `hi` (+10⁹, last ~10% of tokens replaced by globally-unique junk →
    // J ≈ 0.8), `lo` (+2·10⁹, 75% replaced → J ≈ 0.14), `one` (+3·10⁹,
    // exactly one token replaced → SimHash hamming usually ≤ 3). True
    // similarity is MEASURED per pair (shingle sets / signatures), never
    // trusted from the construction.
    lazy val planted: (DataFrame, Seq[Long]) = {
      val base = graft.tables.Tables.documents(spark, dir)
        .select($"doc_id", $"text")
        .where(size(split(trim($"text"), " ")) >= 40)
        .orderBy($"doc_id").limit(30)
        .as[(Long, String)].collect()
      def variant(id: Long, toks: Array[String], keep: Int, tag: String): (Long, String) =
        (id, toks.zipWithIndex.map { case (t, i) =>
          if (i < keep) t else s"zq${tag}_${id}_$i"
        }.mkString(" "))
      val rows: Seq[(Long, String)] = base.toSeq.flatMap { case (id, text) =>
        val toks = text.trim.split(" ")
        val n = toks.length
        Seq((id, text),
          variant(id + 1000000000L, toks, n - math.max(1, n / 10), "hi"),
          variant(id + 2000000000L, toks, n / 4, "lo"),
          variant(id + 3000000000L, toks, n - 1, "one"))
      }
      (spark.createDataset(rows).toDF("doc_id", "text"), base.map(_._1).toSeq)
    }
    def jaccardTwinRecall(key: String): Check = {
      import spark.implicits._
      def pairSet(k: String): Set[(Long, Long)] =
        SparkEntry.queries(k)(spark, dir).select($"doc_a", $"doc_b")
          .as[(Long, Long)].collect().toSet
      val exact = pairSet("q_dedup_ngram_jaccard")
      val cand = pairSet(key)
      Check("recall_vs_exact_jaccard_twin",
        (cand intersect exact).size.toDouble / math.max(1, exact.size), 0.8, ">=")
    }

    add("q_dedup_minhash") {
      // MiniOpsSpec: identical content ⇒ identical signature ⇒ collides in
      // every band, so every exact-dup pair must be a candidate
      val missed = exactDupPairs(spark, dir)
        .join(SparkEntry.queries("q_dedup_minhash")(spark, dir),
          Seq("doc_a", "doc_b"), "left_anti").count()
      // planted near-threshold adversaries (r15): hi pairs (measured
      // J ≈ 0.8, per-pair banding detection 1−(1−J⁴)⁴ ≈ 0.88) must be
      // found; lo pairs (J ≈ 0.14, detection ≈ 0.2%) must not flood in —
      // the SELECTIVITY side the organic J=1 duplicates never graded.
      // planted_separation proves the two populations are measurably
      // disjoint, so the other two bounds cannot pass vacuously.
      val (pd, baseIds) = planted
      val shingleSets = graft.ops.LlmText.shinglesOf(pd)
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (d, xs) => d -> xs.map(_._2).toSet }
      def jac(a: Long, b: Long): Double = {
        val (sa, sb) = (shingleSets(a), shingleSets(b))
        (sa intersect sb).size.toDouble / (sa union sb).size
      }
      val cand = graft.ops.LlmText.dedupMinhashOf(pd)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val hi = baseIds.map(id => (id, id + 1000000000L))
      val lo = baseIds.map(id => (id, id + 2000000000L))
      val (hiJ, loJ) = (hi.map(p => jac(p._1, p._2)), lo.map(p => jac(p._1, p._2)))
      Seq(Check("exact_dup_pairs_missed", missed.toDouble, 0.0, "<="),
        jaccardTwinRecall("q_dedup_minhash"), // measured 1.00 at sf0.01 (r13)
        Check("planted_separation", bool(hiJ.min > loJ.max), 1.0, ">="),
        Check("planted_hi_recall", hi.count(cand).toDouble / hi.size, 0.7, ">="),
        Check("planted_lo_admit_rate", lo.count(cand).toDouble / lo.size, 0.1, "<="),
        determinism(spark, dir, "q_dedup_minhash"))
    }

    add("q_dedup_simhash") {
      val rows = SparkEntry.queries("q_dedup_simhash")(spark, dir).collect()
      val maxHam = if (rows.isEmpty) 0L else rows.map(_.getAs[Long]("hamming")).max
      val missed = exactDupPairs(spark, dir)
        .join(SparkEntry.queries("q_dedup_simhash")(spark, dir),
          Seq("doc_a", "doc_b"), "left_anti").count()
      // planted near-boundary adversaries (r15): with 4×16-bit bands,
      // hamming ≤ 3 GUARANTEES a clean band (pigeonhole — a deterministic
      // theorem about the implementation, graded as such), while pairs
      // past the hamming-8 contract line must never be emitted even when
      // they collide in a band. Buckets come from MEASURED hamming of the
      // planted pairs (one-token edits land ≤ 3 on these doc lengths;
      // 75%-replaced variants land far past 8); the *_present checks keep
      // both buckets non-vacuous.
      val (pd, baseIds) = planted
      val sig = pd.select($"doc_id",
          graft.functions.TextSketchFunctions.simhash64($"text").as("s"))
        .as[(Long, Long)].collect().toMap
      def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(sig(a) ^ sig(b))
      val cand = graft.ops.LlmText.dedupSimhashOf(pd)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val plantedPairs = baseIds.flatMap(id =>
        Seq(id + 1000000000L, id + 2000000000L, id + 3000000000L).map(v => (id, v)))
      val h3 = plantedPairs.filter(p => ham(p._1, p._2) <= 3)
      val far = plantedPairs.filter(p => ham(p._1, p._2) > 8)
      Seq(
        Check("max_candidate_hamming", maxHam.toDouble, 8.0, "<="),
        Check("exact_dup_pairs_missed", missed.toDouble, 0.0, "<="),
        jaccardTwinRecall("q_dedup_simhash"), // measured 0.92 at sf0.01 (r13)
        Check("planted_h3_pairs_present", h3.size.toDouble, 1.0, ">="),
        Check("planted_h3_missed", h3.count(p => !cand(p)).toDouble, 0.0, "<="),
        Check("planted_beyond8_pairs_present", far.size.toDouble, 1.0, ">="),
        Check("planted_beyond8_emitted", far.count(cand).toDouble, 0.0, "<="))
    }

    add("q_text_fingerprint") {
      // content-identical docs get equal fingerprints (rolling hash is a
      // pure function of the token stream), plus double-run determinism
      val fp = SparkEntry.queries("q_text_fingerprint")(spark, dir)
      val unequal = exactDupPairs(spark, dir)
        .join(fp.select($"doc_id".as("doc_a"), $"fingerprint".as("fp_a")), Seq("doc_a"))
        .join(fp.select($"doc_id".as("doc_b"), $"fingerprint".as("fp_b")), Seq("doc_b"))
        .where($"fp_a" =!= $"fp_b").count()
      Seq(Check("identical_text_fp_mismatches", unequal.toDouble, 0.0, "<="),
        determinism(spark, dir, "q_text_fingerprint"))
    }

    // -------------------------------------------------- sketches
    def hllEnvelope(key: String): Seq[Check] = {
      // HllSketchSpec: |est − exact| ≤ max(1, 10%·exact) per scope (3σ)
      val rows = SparkEntry.queries(key)(spark, dir).collect()
      val worst = rows.map { r =>
        val (est, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
        math.abs(est - exact) / math.max(1.0, 0.10 * exact)
      }.max
      Seq(Check("max_envelope_ratio_3sigma", worst, 1.0, "<="))
    }
    add("q_distinct_sketch") { hllEnvelope("q_distinct_sketch") }
    add("q_distinct_sketch_rollup") {
      val rows = SparkEntry.queries("q_distinct_sketch_rollup")(spark, dir).collect()
      hllEnvelope("q_distinct_sketch_rollup") :+
        Check("global_rollup_row_present", bool(rows.exists(_.getString(0) == "<all>")), 1.0, ">=")
    }

    add("q_quantile_sketch") {
      // QuantileSketchSpec: each estimate's true rank within ε=0.05 of its
      // target. True ranks via conditional sums — one pass over lineitem.
      val eps = 0.05
      val rows = SparkEntry.queries("q_quantile_sketch")(spark, dir).collect()
      val li = graft.tables.Tables.table(spark, dir, "lineitem")
      val errs = rows.flatMap { r =>
        val flag = r.getString(0)
        Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3)).map {
          case (q, v) =>
            val c = li.where($"l_returnflag" === flag).agg(
              count(lit(1)).as("n"),
              sum(when($"l_extendedprice" < v, 1L).otherwise(0L)).as("lt"),
              sum(when($"l_extendedprice" <= v, 1L).otherwise(0L)).as("lte")).head()
            val n = c.getLong(0).toDouble
            val (below, atOrBelow) = (c.getLong(1) / n, c.getLong(2) / n)
            math.max(0.0, math.max(below - q, q - atOrBelow))
        }
      }
      Seq(Check("max_rank_err", if (errs.isEmpty) 0.0 else errs.max, eps, "<="))
    }

    add("q_heavy_hitters") {
      // HeavyHittersSpec: every emitted top token truly occurs in its lang;
      // the reported token count is exact
      val rows = SparkEntry.queries("q_heavy_hitters")(spark, dir).collect()
      val exactN = graft.tables.Tables.documents(spark, dir)
        .select($"lang", explode(split(trim($"text"), " ")).as("tok"))
        .groupBy($"lang").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val emitted = rows.flatMap { r =>
        r.getString(1).split('\u001E').map(t => (r.getString(0), t.split('\u001F')(0)))
      }
      val occurring = graft.tables.Tables.documents(spark, dir)
        .select($"lang", explode(split(trim($"text"), " ")).as("tok"))
        .distinct().as[(String, String)].collect().toSet
      val ghost = emitted.count(p => !occurring.contains(p))
      val nMismatch = rows.count(r => exactN.getOrElse(r.getString(0), -1L) != r.getLong(2))
      Seq(
        Check("emitted_tokens_never_occurring", ghost.toDouble, 0.0, "<="),
        Check("token_count_mismatches", nMismatch.toDouble, 0.0, "<="))
    }

    add("q_membership_sketch") {
      // BloomSketchSpec: per-scope |est − exact| ≤ max(2, 15%·exact);
      // the global row is the OR of the leaves so its fill dominates
      val rows = SparkEntry.queries("q_membership_sketch")(spark, dir).collect()
      val worst = rows.map { r =>
        val (est, exact) = (r.getAs[Long]("est_uv").toDouble, r.getAs[Long]("exact_uv").toDouble)
        math.abs(est - exact) / math.max(2.0, 0.15 * exact)
      }.max
      val all = rows.find(_.getAs[String]("scope") == "<all>").map(_.getAs[Long]("bits_set"))
      val leavesOk = all.exists(a =>
        rows.filter(_.getAs[String]("scope") != "<all>").forall(_.getAs[Long]("bits_set") <= a))
      Seq(
        Check("max_envelope_ratio", worst, 1.0, "<="),
        Check("global_or_dominates_leaves", bool(leavesOk), 1.0, ">="))
    }

    // -------------------------------------------------- vectors / layout
    add("q_embed_pca") {
      // PcaSpec: projections centered, Var(PC1) ≥ Var(PC2); deterministic
      val p = SparkEntry.queries("q_embed_pca")(spark, dir)
        .as[(Long, Double, Double)].collect()
      val n = p.length.toDouble
      val (m1, m2) = (p.map(_._2).sum / n, p.map(_._3).sum / n)
      val v1 = p.map(r => (r._2 - m1) * (r._2 - m1)).sum / n
      val v2 = p.map(r => (r._3 - m2) * (r._3 - m2)).sum / n
      Seq(
        Check("max_abs_projection_mean", math.max(math.abs(m1), math.abs(m2)), 1e-3, "<="),
        Check("pc1_dominates_pc2", bool(v1 >= v2 - 1e-9), 1.0, ">="),
        determinism(spark, dir, "q_embed_pca"))
    }

    add("q_sim_lsh_bucket") {
      // bucket_size must equal the realized bucket population (the window
      // and a groupBy recount agree), and the layout is deterministic
      val q = SparkEntry.queries("q_sim_lsh_bucket")(spark, dir)
      val recount = q.groupBy($"bucket").agg(count(lit(1)).as("n2"))
      val bad = q.join(recount, Seq("bucket")).where($"bucket_size" =!= $"n2").count()
      Seq(Check("bucket_size_mismatches", bad.toDouble, 0.0, "<="),
        determinism(spark, dir, "q_sim_lsh_bucket"))
    }

    add("q_mm_decode_stub") {
      // stub decode contract: dims in [64,128), n_bytes = payload length,
      // deterministic (the codec slot must be reproducible plumbing)
      val rows = SparkEntry.queries("q_mm_decode_stub")(spark, dir).collect()
      val badDims = rows.count { r =>
        val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
        w < 64 || w >= 128 || h < 64 || h >= 128 || r.getAs[Int]("n_bytes") < 0
      }
      Seq(Check("rows_outside_stub_contract", badDims.toDouble, 0.0, "<="),
        determinism(spark, dir, "q_mm_decode_stub"))
    }

    out.result()
  }

  def toJson(sfDir: String, results: Seq[(String, Seq[Check])]): String = {
    def jnum(v: Double): String =
      if (v == v.toLong.toDouble) v.toLong.toString else f"$v%.6f"
    val keys = results.map { case (k, checks) =>
      val cs = checks.map(c =>
        s"""{"name":"${c.name}","value":${jnum(c.value)},"threshold":${jnum(c.threshold)},"cmp":"${c.cmp}","pass":${c.pass}}""")
        .mkString("[", ",", "]")
      s""""$k":{"pass":${checks.forall(_.pass)},"checks":$cs}"""
    }.mkString(",")
    val allPass = results.forall(_._2.forall(_.pass))
    s"""{"sf":"$sfDir","all_pass":$allPass,"n_keys":${results.size},"keys":{$keys}}"""
  }

  /** Standalone entry: args = (sfDir, outPath). */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outPath = if (args.length > 1) args(1) else "INVARIANTS.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempDirs.warehouse("invariants"))
      .config("spark.local.dir", TempDirs.localDir("invariants"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val json = toJson(sfDir, compute(spark, sfDir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
  }
}
