package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.tables.Tables._

/** Decoded-media metadata produced by the STUB decoder in
  * [[LlmVector.mmDecodeStub]]. A real pipeline would fill width/height/format
  * from the actual codec; the schema and partition-wise batch flow are real. */
case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, format: String)

/** SURVEY.md §2.9 + training-data-pipeline vector/multimodal ops: similarity
  * search (brute-force + IVF + LSH), embedding norms, embedding near-dup,
  * doc⋈vector joins, and binary-column plumbing with a stubbed decoder.
  *
  * Determinism (rule R4): every per-vector reduction is a left-to-right
  * `aggregate()` fold in double; DuckDB's `list_cosine_similarity`/
  * `list_inner_product` over DOUBLE[] match that fold bit-for-bit (verified
  * empirically on this data), with round(…,4) at the output boundary.
  *
  * Scale posture (100 TB / billions of vectors):
  *   - probes are broadcast (5 rows) — the corpus never shuffles for scoring;
  *   - per-probe top-k is a window rank inside each probe partition, not a
  *     global sort;
  *   - brute-force scoring is the verifiable baseline; q_ann_ivf shows the
  *     bucketed path (coarse quantizer → nprobe buckets), which drops scored
  *     candidates ~linearly with the centroid count;
  *   - q_sim_lsh_bucket is the hyperplane-hash path whose bucket ids become
  *     the shuffle key for banded near-dup joins.
  */
object LlmVector {

  /** Left-fold cosine similarity between two float-array columns, in double.
    * Backed by the engine's codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]]) — bit-identical to the
    * `aggregate()` HOF formulation it replaced, ~15× faster in pairwise
    * scans because the fused loop participates in whole-stage codegen. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  // ---------------------------------------------------------------- top-k
  /** Brute-force cosine top-5 neighbors for 5 probe vectors. */
  def simCosineTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
    val probes = e.where($"vec_id" < 5)
      .select($"vec_id".as("probe_id"), $"embedding".as("pe"))
    val scored = e.crossJoin(broadcast(probes))
      .select($"probe_id", $"vec_id", cosine($"pe", $"embedding").as("cos"))
    val w = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id")
    scored.withColumn("rk", row_number().over(w))
      .where($"rk" <= 5)
      .select($"probe_id", $"rk", $"vec_id", round($"cos", 4).as("cos"))
      .orderBy($"probe_id", $"rk")
  }

  val simCosineTopkSql: String =
    """WITH p AS (
      |  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
      |  FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |scored AS (
      |  SELECT probe_id, vec_id, list_cosine_similarity(pv, v) AS cos FROM p, c),
      |ranked AS (
      |  SELECT probe_id, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk
      |  FROM scored)
      |SELECT probe_id, rk, vec_id, ROUND(cos, 4) AS cos
      |FROM ranked WHERE rk <= 5
      |ORDER BY probe_id, rk""".stripMargin

  // ---------------------------------------------------------------- filtered top-k
  /** FILTERED vector search (r11) — top-5 cosine neighbors restricted to
    * a metadata predicate (label ≠ the probe's own label — "similar but
    * from another class", the cross-domain retrieval/contamination-audit
    * shape). The composition every production vector store must get
    * right: the predicate applies BEFORE distance work, so the scored
    * candidate set shrinks to the selectivity of the filter — never
    * "search then discard", which prices the full corpus and can return
    * < k survivors.
    *
    * At this brute-force tier the filter is a join predicate pushed into
    * the broadcast probe join (codegen, no post-rank re-filter). The
    * indexed tier composes the same way: IVF invlists are already keyed
    * (cell, label)-partitionable, so the predicate prunes whole lists —
    * documented here as the scale path; recall spec stays the ANN
    * family's job. Oracle: same predicate in SQL, rank ties broken by
    * vec_id (R1). */
  def simFilteredTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
    val probes = e.where($"vec_id" < 5)
      .select($"vec_id".as("probe_id"), $"embedding".as("pe"), $"label".as("probe_label"))
    val scored = e.join(broadcast(probes), $"label" =!= $"probe_label")
      .select($"probe_id", $"vec_id", cosine($"pe", $"embedding").as("cos"))
    val w = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id")
    scored.withColumn("rk", row_number().over(w))
      .where($"rk" <= 5)
      .select($"probe_id", $"rk", $"vec_id", round($"cos", 4).as("cos"))
      .orderBy($"probe_id", $"rk")
  }

  val simFilteredTopkSql: String =
    """WITH p AS (
      |  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv, label AS pl
      |  FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
      |scored AS (
      |  SELECT probe_id, vec_id, list_cosine_similarity(pv, v) AS cos
      |  FROM p JOIN c ON c.label <> p.pl),
      |ranked AS (
      |  SELECT probe_id, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk
      |  FROM scored)
      |SELECT probe_id, rk, vec_id, ROUND(cos, 4) AS cos
      |FROM ranked WHERE rk <= 5
      |ORDER BY probe_id, rk""".stripMargin

  // ---------------------------------------------------------------- norms
  /** Per-vector L2 norm → exact-decimal per-label stats (R2+R4). */
  def embedNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nrm = sqrt(aggregate(
      transform($"embedding", x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    embeddings(s, dir)
      .select($"label", round(nrm, 4).cast(DecimalType(10, 4)).as("nrm"))
      .groupBy($"label")
      .agg(
        count(lit(1)).as("n_vecs"),
        (sum($"nrm").cast("double") / count(lit(1))).as("avg_norm"),
        min($"nrm").cast("double").as("min_norm"),
        max($"nrm").cast("double").as("max_norm"))
      .orderBy($"label")
  }

  val embedNormSql: String =
    """WITH n AS (
      |  SELECT label,
      |    CAST(ROUND(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
      |      CAST(embedding AS DOUBLE[]))), 4) AS DECIMAL(10,4)) AS nrm
      |  FROM embeddings)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(nrm) AS DOUBLE) / COUNT(*) AS avg_norm,
      |  CAST(MIN(nrm) AS DOUBLE) AS min_norm,
      |  CAST(MAX(nrm) AS DOUBLE) AS max_norm
      |FROM n GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- join
  /** Multimodal join: text docs ⋈ embedding vectors (doc_id = vec_id), the
    * array column carried through the join. */
  def multimodalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .join(embeddings(s, dir), $"doc_id" === $"vec_id")
      .where($"label" < 5 && $"lang" === "en")
      .select($"doc_id", $"lang", $"source", $"label".cast(LongType).as("label"),
        $"n_chars", size($"embedding").cast(LongType).as("dim"))
      .orderBy($"doc_id")
  }

  val multimodalJoinSql: String =
    """SELECT doc_id, lang, source, CAST(label AS BIGINT) AS label, n_chars,
      |  CAST(len(embedding) AS BIGINT) AS dim
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |WHERE label < 5 AND lang = 'en'
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- near-dup
  /** Embedding near-dup pairs by cosine ≥ 0.45 — the EXACT all-pairs oracle
    * twin. Dual-path with [[dedupEmbedBanded]] (the LSH-banded scale path,
    * benched as q_dedup_embed_banded): this one is intentionally
    * brute-force because on THIS data no exact sub-quadratic plan exists,
    * measured not assumed — the test embeddings are near-isotropic random
    * vectors (mean pairwise |cos| ≈ 0.01 both within and across labels;
    * only 14/124,750 pairs qualify at sf0.01), so every metric-pruning
    * family degenerates: triangle-inequality IVF bucket pruning admits all
    * bucket pairs (member-to-centroid distances ~√2 ≫ the √1.1 threshold
    * radius), and hyperplane-LSH at t=0.45 collides 0.65 per plane vs 0.5
    * for random pairs — too shallow a gap for recall 1.0 at any affordable
    * band count. Exact dense all-pairs on unstructured data is Ω(n²);
    * the honest scale posture is (a) this exact twin for verification and
    * (b) the banded approximate path for the 100 TB run, with recall
    * measured against (a) in BandedDedupSpec. Real near-dup corpora prune
    * far better: their duplicate threshold is 0.85+ where banding is sharp.
    *
    * Hot path: O(n²) pairs × 64 dims — an interpreted HOF fold per pair is
    * ~15× too slow (measured 33s at sf0.1). The codegen'd
    * [[graft.functions.CosineSimilarity]] expression keeps the whole plan
    * relational (column pruning, whole-stage codegen) with a fused
    * primitive loop per pair — the identical left-to-right double folds as
    * the HOF/DuckDB formulation (R4), just compiled. */
  def dedupEmbedCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
    val a = e.select($"vec_id".as("vec_a"), $"embedding".as("ea"))
    val b = e.select($"vec_id".as("vec_b"), $"embedding".as("eb"))
    a.crossJoin(b).where($"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", cosine($"ea", $"eb").as("cos"))
      .where($"cos" >= 0.45)
      .select($"vec_a", $"vec_b", round($"cos", 4).as("cos"))
      .orderBy($"vec_a", $"vec_b")
  }

  val dedupEmbedCosineSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin

  /** LSH-banded embedding near-dup — the 100 TB shape of
    * [[dedupEmbedCosine]] (rows-only: recall < 1 by construction on this
    * near-isotropic data; precision is exactly 1 because every candidate is
    * verified with the same codegen cosine + threshold as the exact twin,
    * so output ⊆ exact output — asserted in BandedDedupSpec along with the
    * measured recall).
    *
    * Shape: 48 fixed hyperplanes → one packed sign signature per vector
    * (row-local [[graft.functions.HyperplaneSignature]] kernel, zero
    * shuffle), banded 12×4 bits (per-pair detection 1−(1−p⁴)¹² ≈ 0.90 at
    * cos = 0.45, p = 1−θ/π ≈ 0.649 — steeper thresholds band far sharper);
    * candidates come from a self-join on
    * (band, band_bits) — the shuffle key — then pair-dedup BEFORE the
    * arrays are attached (the band join moves only (vec_id, band, bits)
    * rows, never the 64-float payload), then exact cosine verify. Work =
    * Σ_buckets C(|bucket|,2), the same contract as the MinHash/SimHash
    * dedup family.
    *
    * MEASURED SCALE BOUND (r14 ScaleGen 30×, recorded in BASELINE.md): at
    * THIS row's contract threshold (cos = 0.45) the bucket mass is itself
    * quadratic — a 4-bit band has only 16 values, so a uniform random
    * pair collides in ≥1 of the 12 bands with prob 1−(1−2⁻⁴)¹² ≈ 0.54
    * and candidates ≈ 0.27·N² (measured: N 2k→60k drove candidates
    * ~1.1·10⁶→~9.7·10⁸ and the cluster sibling 1.6 s→734 s, with a spill
    * cliff past ~10× where the pair shuffle leaves memory). Banding
    * cannot be sharpened here: 8-bit bands would drop detection to
    * ~0.17 recall at cos 0.45 on near-isotropic data — the SURVEY-
    * documented no-sub-quadratic position, now with a 30× datapoint.
    * Production near-dup thresholds (cos ≥ 0.85, p ≈ 0.82/plane) keep
    * 16-bit bands BOTH selective (1.5·10⁻⁵ random admit) and sensitive —
    * at fleet N, tighten the threshold or widen the bands; never run the
    * 0.45 contract row at fleet scale. That posture is now DEMONSTRATED
    * as its own row: [[dedupEmbedBandedProd]] (r15) measures 30×/1× time
    * ratio 2.6 where this row's cluster sibling measured 733 s at the
    * same 30× corpus. Both 0.45-threshold rows stay fenced to
    * verification-SF duty with their exact twin. The embedding attach is
    * an un-hinted equi-join: AQE broadcasts it at test SF and shuffles on
    * vec_id at scale. */
  def dedupEmbedBanded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    embedBandedPairs(s, dir).orderBy($"vec_a", $"vec_b")
  }

  /** STANDING verified banded pair graph (r12): [[embedBandedPairs]]
    * persisted once per corpus dir via [[graft.tables.Layout.standing]] —
    * the vector twin of the text side's standing jaccard-pair table.
    * Cluster maintenance consumes the pair graph repeatedly (CC adjacency
    * + both centrality halves), so a production pipeline keeps it as a
    * maintained derived table; [[dedupEmbedBanded]] keeps pricing pair
    * discovery in full as its own contract. Row-identical either way
    * (VectorDedupSpec). */
  private[graft] def standingEmbedPairs(s: SparkSession, dir: String): DataFrame =
    graft.tables.Layout.standing(s, s"embpairs_${dirKey(dir)}", embedBandedPairs(s, dir))

  /** MD5 cache key for a corpus dir (same convention as Graph's). */
  private def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)

  /** Unsorted verified banded pairs — the pipeline behind
    * [[dedupEmbedBanded]], split out so [[dedupEmbedCluster]] can pin it
    * without paying the contract query's global sort. */
  private def embedBandedPairs(s: SparkSession, dir: String): DataFrame =
    embedBandedPairsOf(s, embeddings(s, dir))

  /** Corpus-parameterized form of the 0.45-threshold banded pipeline —
    * same banding, same verify gate — so the Invariants harness can grade
    * it over a PLANTED near-threshold corpus (r16, VERDICT r15 #4), the
    * discipline the minhash row already gets. */
  private[graft] def embedBandedPairsOf(s: SparkSession, e: DataFrame): DataFrame = {
    import s.implicits._
    val nPlanes = 48
    val bandBits = 4
    val nBands = nPlanes / bandBits
    val rnd = new scala.util.Random(42)
    val planes = Seq.fill(nPlanes)(Seq.fill(64)(rnd.nextGaussian()))
    val sigs = e.select($"vec_id",
      graft.functions.CentroidFunctions.hyperplane_sig($"embedding", planes).as("sig"))
    val bandStructs = array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright($"sig", b * bandBits).bitwiseAND(lit((1L << bandBits) - 1)).as("bits"))
    }: _*)
    // materialize the 8-rows/doc band table pre-self-join (ReusedExchange
    // trap — same rationale as the MinHash band table), layout declared
    // on the join key so the self-join is exchange-free (r15)
    val banded = graft.tables.Layout.materializeHashPartitioned(
      sigs.select($"vec_id", explode(bandStructs).as("bs"))
        .select($"vec_id", $"bs.band".as("band"), $"bs.bits".as("bits")),
      Seq("band", "bits"))
    val a = banded.select($"vec_id".as("vec_a"), $"band", $"bits")
    val b = banded.select($"vec_id".as("vec_b"), $"band", $"bits")
    val cands = a.join(b, Seq("band", "bits")).where($"vec_a" < $"vec_b")
      .groupBy($"vec_a", $"vec_b").agg(count(lit(1)).as("_nb")).drop("_nb")
    cands
      .join(e.select($"vec_id".as("vec_a"), $"embedding".as("ea")), Seq("vec_a"))
      .join(e.select($"vec_id".as("vec_b"), $"embedding".as("eb")), Seq("vec_b"))
      .select($"vec_a", $"vec_b", cosine($"ea", $"eb").as("cos"))
      .where($"cos" >= 0.45)
      .select($"vec_a", $"vec_b", round($"cos", 4).as("cos"))
  }

  // ------------------------------------------- production-threshold banding
  /** Near-dup benchmark corpus with PLANTED duplicates (r15): the raw
    * embeddings ∪ one deterministic DEGRADED COPY per vector (copy id =
    * vec_id + 10⁹). A copy zeroes every stride-th dimension of its
    * original, stride ∈ {32, 16, 8, 4} by vec_id mod 4 — on these
    * near-unit-mass-per-dim vectors the planted pair's true cosine
    * clusters near √(1 − k/64) for k zeroed dims: ≈ 0.98 / 0.97 / 0.93 /
    * 0.87, a population that straddles the 0.85 production threshold
    * from ABOVE AND BELOW (the k=16 quarter scatters across it), so the
    * verify gate and the recall grading are both exercised at the
    * boundary. Needed because the raw synthetic embeddings are
    * near-isotropic (mean pairwise |cos| ≈ 0.01): the exact cos ≥ 0.85
    * pair set on them is EMPTY, and a production-threshold row graded
    * against an empty twin would be vacuously green. Purely row-local
    * column arithmetic — no shuffle, scales as one map over the corpus. */
  private[graft] def prodDupCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir).select($"vec_id", $"embedding")
    val copies = e.select(($"vec_id" + lit(1000000000L)).as("vec_id"),
      expr("""transform(embedding, (x, d) ->
          CASE WHEN pmod(d + vec_id, CASE CAST(pmod(vec_id, 4) AS INT)
                 WHEN 0 THEN 32 WHEN 1 THEN 16 WHEN 2 THEN 8 ELSE 4 END) = 0
               THEN CAST(0.0 AS FLOAT) ELSE x END)""").as("embedding"))
    e.unionByName(copies)
  }

  /** Exact brute-force cos ≥ 0.85 twin over [[prodDupCorpus]] — the
    * grading anchor for [[dedupEmbedBandedProd]] (Invariants +
    * VectorDedupSpec), never a bench row: all-pairs is the verification-SF
    * tool, the banded row is the scale path. */
  private[graft] def prodExactPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val aug = prodDupCorpus(s, dir)
    val a = aug.select($"vec_id".as("vec_a"), $"embedding".as("ea"))
    val b = aug.select($"vec_id".as("vec_b"), $"embedding".as("eb"))
    a.crossJoin(b).where($"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", cosine($"ea", $"eb").as("cos"))
      .where($"cos" >= 0.85)
      .select($"vec_a", $"vec_b", round($"cos", 4).as("cos"))
  }

  /** Shared banding front-end for [[dedupEmbedBandedProd]] and its
    * streaming twin (`s_dedup_embed_banded`, r15): 6 row-local packed
    * 64-plane sign signatures → 24 16-bit band slices, exploded to one
    * row per (vec_id, band, bits) plus any `carry` columns. Pure column
    * arithmetic over any (vec_id, embedding) frame — bounded OR unbounded
    * (the streaming twin maps the SAME expressions over its ingest
    * stream; sharing the construction is what makes the settle-
    * equivalence test meaningful rather than two parallel banders that
    * happen to agree today). */
  private[graft] def prodBandTable(df: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val nSigs = 6          // 6 packed 64-plane signatures
    val bandsPerSig = 4    // 4 × 16-bit slices per long
    val sigCols = (0 until nSigs).map { i =>
      val rnd = new scala.util.Random(42L + 1000L * i)
      val planes = Seq.fill(64)(Seq.fill(64)(rnd.nextGaussian()))
      graft.functions.CentroidFunctions.hyperplane_sig(col("embedding"), planes).as(s"sig$i")
    }
    val keep = col("vec_id") +: carry.map(col)
    val sigs = df.select((keep ++ sigCols): _*)
    val bandStructs = array((0 until nSigs * bandsPerSig).map { bnd =>
      struct(lit(bnd).as("band"),
        shiftright(col(s"sig${bnd / bandsPerSig}"), (bnd % bandsPerSig) * 16)
          .bitwiseAND(lit(0xFFFFL)).as("bits"))
    }: _*)
    sigs.select((keep :+ explode(bandStructs).as("bs")): _*)
      .select((keep ++ Seq(col("bs.band").as("band"), col("bs.bits").as("bits"))): _*)
  }

  /** PRODUCTION-THRESHOLD banded near-dup (r15, clearing the r14 `weak`
    * pair): cosine ≥ 0.85 with 24 × 16-BIT bands over 384 hyperplanes —
    * the scale-safe posture the 0.45 contract row's scaladoc promises
    * ("tighten the threshold or widen the bands"), demonstrated as its
    * own row over [[prodDupCorpus]].
    *
    * Why this banding is scale-safe where the 0.45 row is quadratic: a
    * 16-bit band admits a uniform RANDOM pair (cos ≈ 0, p = ½/plane)
    * with probability 2⁻¹⁶, so 24 bands admit ≈ 3.7·10⁻⁴ of C(N,2) —
    * ~700× below the 0.45 row's 0.27·N² candidate mass, and the band
    * join's shuffle volume stays the LINEAR 24 rows/vector band table.
    * Sensitivity at production similarity is simultaneously high because
    * near-dup pairs band sharply: detection 1−(1−p¹⁶)²⁴ with
    * p = 1−θ/π ≈ 0.94/0.92/0.88/0.83 at cos 0.98/0.97/0.93/0.87 gives
    * per-group recall ≈ 1.0/0.99/0.97/0.74 — overall ≈ 0.93 measured vs
    * the exact twin (Invariants bound ≥ 0.8; precision exactly 1 because
    * every candidate passes the same codegen cosine gate as the twin).
    * The candidate-mass crossover the r14 analysis predicted — shallow
    * thresholds must go quadratic, production thresholds need not —
    * becomes a measured ScaleGen datapoint in BASELINE.md (r15).
    *
    * Shape mirrors [[embedBandedPairs]]: row-local packed sign signatures
    * (6 × 64-plane codegen kernels → 6 longs → 24 16-bit band slices),
    * band table materialized pre-self-join, pair-dedup BEFORE the
    * 64-float arrays are attached, exact verify last. Rows-only contract
    * (LSH banding is not SQL-expressible); graded by INVARIANTS +
    * VectorDedupSpec against [[prodExactPairs]]. */
  def dedupEmbedBandedProd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val aug = prodDupCorpus(s, dir)
    // materialize the 24-rows/vector band table pre-self-join (the same
    // ReusedExchange trap as the 0.45 row and the MinHash band table);
    // plain pin — the 16-bit bands admit so few random pairs that the
    // self-join is cheap and the declared-layout repartition's task
    // overhead dominates at verification SFs (measured 0.79 → 0.98 s)
    val banded = graft.tables.Layout.materialize(prodBandTable(aug))
    val a = banded.select($"vec_id".as("vec_a"), $"band", $"bits")
    val b = banded.select($"vec_id".as("vec_b"), $"band", $"bits")
    val cands = a.join(b, Seq("band", "bits")).where($"vec_a" < $"vec_b")
      .groupBy($"vec_a", $"vec_b").agg(count(lit(1)).as("_nb")).drop("_nb")
    cands
      .join(aug.select($"vec_id".as("vec_a"), $"embedding".as("ea")), Seq("vec_a"))
      .join(aug.select($"vec_id".as("vec_b"), $"embedding".as("eb")), Seq("vec_b"))
      .select($"vec_a", $"vec_b", cosine($"ea", $"eb").as("cos"))
      .where($"cos" >= 0.85)
      .select($"vec_a", $"vec_b", round($"cos", 4).as("cos"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** Embedding near-dup CLUSTERS (r9) — the pairs→clusters→canonical step
    * for the vector modality, completing the same path the text side has
    * (q_dedup_cluster): [[dedupEmbedBanded]]'s verified pairs feed the
    * shared [[Graph.connectedComponents]] O(log d) hash-min/pointer-jump
    * loop, and each cluster elects a MEDOID canonical — the member with
    * the highest summed similarity to its cluster peers (keep the most
    * representative copy, the policy an embedding dedup actually wants;
    * text dedup's longest-text rule has no analog here).
    *
    * Determinism (R4): medoid centrality sums ROUNDED cosines scaled to
    * exact int64 (cos is already round(,4), so ·1e4 is integer-valued) —
    * the per-vector reduction is order-independent integer addition, and
    * ties break on vec_id. Rows-only contract (LSH banding is not
    * SQL-expressible); VectorDedupSpec asserts the structural properties:
    * banded clusters REFINE the exact-threshold clusters (precision-1
    * pairs can merge nothing the exact graph separates), the medoid is a
    * member maximizing the quantized centrality, and the run is
    * deterministic. Scale: everything after the banded join is
    * cluster-local aggregation + the CC loop's bounded rounds. */
  def dedupEmbedCluster(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // (vec_a, vec_b, cos) — verified pairs, served from the STANDING pair
    // graph (r12). Three consumers below (CC's adjacency, both halves of
    // the centrality union) each read the near-dup-sized persisted
    // relation — without a shared source they would re-execute the whole
    // banded pipeline from the parquet scan up (measured 4.3 s → 2.6 s at
    // sf0.1 when this was an in-memory pin; the standing table removes
    // the rebuild from the query entirely).
    val pw = standingEmbedPairs(s, dir)
    val labels = Graph.connectedComponents(pw.select($"vec_a", $"vec_b"))
      .select($"vertex".as("vec_id"), $"component".as("cluster_id"))
    val centr = pw.select($"vec_a".as("vec_id"), $"cos")
      .unionByName(pw.select($"vec_b".as("vec_id"), $"cos"))
      .groupBy($"vec_id")
      .agg(sum(round($"cos" * 10000.0, 0).cast(LongType)).as("centq"))
    val w = Window.partitionBy($"cluster_id").orderBy($"centq".desc, $"vec_id")
    val medoid = labels.join(centr, Seq("vec_id"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"cluster_id", $"vec_id".as("canonical_vec"))
    labels.groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_vecs"),
        array_join(array_sort(collect_list($"vec_id")), "/").as("members"))
      .join(medoid, Seq("cluster_id"))
      .orderBy($"cluster_id")
  }

  // ---------------------------------------------------------------- IVF ANN
  /** Deterministic Lloyd-iteration k-means coarse quantizer for the IVF
    * index. Init = the k lowest-vec_id vectors; each iteration assigns all
    * vectors to their nearest centroid (row-local literal argmax over the
    * codegen'd cosine — no join, no shuffle) and recomputes per-dimension
    * means in ONE k-group aggregate.
    *
    * Two properties matter:
    *   - driver state is k×d doubles only (the same contract as
    *     ml.clustering.KMeans's aggregate step) — the assignment pass is
    *     fully distributed, so this trains on a corpus of any size;
    *   - the mean is an exact DECIMAL sum divided by the count, so centroid
    *     bits do not depend on shuffle/partition order — the whole
    *     quantizer (and the rows-only q_ann_ivf dump) is run-to-run
    *     reproducible (rule R4 discipline applied to training, not just
    *     serving).
    */
  private[graft] def kmeansCentroids(e: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Float])] = {
    val s = e.sparkSession
    import s.implicits._
    val dim = 64
    // persist the working set across Lloyd iterations: each iteration is an
    // action, and without the cache every pass (init + iters aggregates)
    // re-reads the source parquet — at 100 TB you persist the (projected)
    // training relation once and iterate against memory/disk.
    e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // init = the k lowest-vec_id vectors; k×d floats is driver state by
    // contract (same as ml.clustering.KMeans's aggregate step)
    var cents: Seq[(Int, Seq[Float])] = e.where($"vec_id" < k)
      .select($"vec_id".cast("int"), $"embedding".cast("array<float>"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toSeq.sortBy(_._1)
    for (_ <- 0 until iters) {
      // one pass: row-local nearest-centroid + a single k-group aggregate of
      // per-dimension 1e7-quantized int64 sums — order-independent (integer
      // addition is associative, so centroid bits are reproducible across
      // any shuffle/partition layout) and several times cheaper than the
      // DECIMAL sums this used before: 64 long columns aggregate in
      // codegen'd primitive registers vs Decimal object arithmetic.
      // floor(x·1e7) keeps ~all of float's 24-bit mantissa (|x| < 1 here);
      // |sum| ≤ 1e7 · n stays far inside int64 up to trillions of rows.
      val dimSums = (0 until dim).map(i =>
        sum(floor(element_at($"embedding", i + 1).cast("double") * 10000000.0)
          .cast(LongType)).as(s"s$i"))
      val rows = e
        .select(graft.functions.CentroidFunctions
          .nearest_centroid($"embedding", cents).as("cent_id"), $"embedding")
        .groupBy($"cent_id")
        .agg(count(lit(1)).as("n"), dimSums: _*)
        .collect()
      cents = rows.map { r =>
        val n = r.getAs[Long]("n")
        r.getAs[Int]("cent_id") -> (0 until dim).map(i =>
          (r.getAs[Long](s"s$i").toDouble / 1e7 / n).toFloat)
      }.toSeq.sortBy(_._1)
    }
    cents
    } finally e.unpersist(false)
  }

  /** IVF approximate nearest neighbor (rows-only; recall cross-checked
    * against the brute-force top-k in unit tests). Coarse quantizer: 16
    * k-means centroids (2 deterministic Lloyd iterations, above). Probes
    * search nprobe=4 nearest centroid buckets only.
    *
    * SKEW-AWARE: real embedding corpora cluster — one hot centroid can own
    * a corpus-scale fraction of the vectors, and an unsharded plan would
    * sort that whole invlist inside a single probe partition. See
    * [[ivfSearch]] for the hash-sub-shard split that bounds every rank
    * partition by `shardThreshold` with zero result change. */
  def annIvf(s: SparkSession, dir: String): DataFrame =
    ivfSearch(s, embeddings(s, dir), shardThreshold = 2048L)

  /** Incremental IVF admission (r9) — the daily-ingest path of a STANDING
    * 100 TB index, the vector twin of q_dedup_incremental: the newest ~10%
    * of vec_ids (append-only arrival order) are a delta batch admitted
    * WITHOUT retraining. The coarse quantizer trains on the base corpus
    * only and is then FROZEN; delta vectors enter by the same row-local
    * nearest-centroid assignment the base used (a map over the delta — at
    * scale, work is delta-sized), and the bucket census re-runs over the
    * combined index so hot invlists re-shard to the current sizes (drifted
    * deltas concentrate — precisely when sub-sharding matters). No Lloyd
    * pass ever touches the delta: retraining would re-assign the ENTIRE
    * standing index (every centroid moves), a full-corpus rebuild this
    * path exists to avoid.
    *
    * Rows-only contract like q_ann_ivf; MiniOpsSpec asserts recall@5 vs
    * brute force under the frozen (stale) quantizer AND that a delta-only
    * corpus served through the frozen codebook stays recall-bounded (the
    * admission property itself). Serve plan is [[ivfServe]], shared with
    * the plan-asserted q_ann_ivf. */
  /** STANDING frozen coarse quantizer of the incremental index (r13):
    * trained once on the base (pre-cut) corpus, persisted per (dir, cut).
    * Cached-vs-fresh identity asserted in LayoutSpec. */
  private[graft] def ivfIncCents(s: SparkSession, dir: String,
      cut: Long): Seq[(Int, Seq[Float])] = {
    import s.implicits._
    graft.tables.Layout.standing(s, s"ivfinc_${dirKey(dir)}_${cut}_cents", {
      s.createDataset(kmeansCentroids(
        embeddings(s, dir).where($"vec_id" <= cut), k = 16, iters = 2))
        .toDF("cent_id", "cv")
    }).as[(Int, Seq[Float])].collect().sortBy(_._1).toSeq
  }

  /** STANDING assigned base invlists of the incremental index (r13):
    * (vec_id, embedding, cent_id) for every base vector under the frozen
    * quantizer — day-0 state a real index holds, so the query assigns
    * only the delta. */
  private[graft] def ivfIncBase(s: SparkSession, dir: String, cut: Long,
      cents: Seq[(Int, Seq[Float])]): DataFrame = {
    import s.implicits._
    graft.tables.Layout.standing(s, s"ivfinc_${dirKey(dir)}_${cut}_base", {
      embeddings(s, dir).where($"vec_id" <= cut).select($"vec_id", $"embedding",
        graft.functions.CentroidFunctions
          .nearest_centroid($"embedding", cents).as("cent_id"))
    })
  }

  def annIvfIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
    // append-only ingest: the top decile of ids is "today's" delta batch.
    // The max-id probe must live on the DRIVER (it keys the standing-cache
    // names below), so instead of the one-row-broadcast fold it is memoized
    // per dir (Layout.scalarOnce) — in production it IS yesterday's known
    // high-water mark; locally the probe job runs once per JVM, not once
    // per execution.
    val maxId = graft.tables.Layout.scalarOnce(s"ivfinc_maxid#$dir") {
      e.agg(max($"vec_id")).head().getLong(0)
    }
    val cut = maxId - (maxId + 9L) / 10L
    // STANDING day-0 state (r13): the frozen quantizer AND the assigned
    // base invlists build once per (corpus dir, cut) and persist — exactly
    // what a standing index holds on day N. The query then prices the
    // incremental admission itself: assign ONLY the delta (map over ~10%),
    // union with the standing invlists, re-census for hot-bucket
    // sub-sharding at current sizes, serve. Quantizer training stays
    // priced in full by q_ann_ivf (the construction-pricing contract);
    // names encode dir + cut per the Layout.standing contract.
    val cents = ivfIncCents(s, dir, cut)
    val baseAssigned = ivfIncBase(s, dir, cut, cents)
    val deltaAssigned = e.where($"vec_id" > cut).select($"vec_id", $"embedding",
      graft.functions.CentroidFunctions
        .nearest_centroid($"embedding", cents).as("cent_id"))
    // combined census = standing base census (maintained WITH the invlists,
    // like any real index's bucket sizes) + a delta-sized fresh census —
    // identical counts to a full-index aggregate, priced at delta cost
    val baseCensus = graft.tables.Layout
      .standing(s, s"ivfinc_${dirKey(dir)}_${cut}_census", {
        ivfIncBase(s, dir, cut, cents)
          .groupBy($"cent_id").agg(count(lit(1)).as("bn"))
      }).as[(Int, Long)].collect().toMap
    val deltaCensus = deltaAssigned.groupBy($"cent_id").agg(count(lit(1)).as("bn"))
      .as[(Int, Long)].collect().toMap
    val census = (baseCensus.keySet ++ deltaCensus.keySet).map(c =>
      c -> (baseCensus.getOrElse(c, 0L) + deltaCensus.getOrElse(c, 0L))).toMap
    ivfServeAssigned(s, baseAssigned.unionByName(deltaAssigned), cents,
      e.where($"vec_id" < 5), shardThreshold = 2048L, censusOpt = Some(census))
  }

  /** IVF search core, parameterized by the skew threshold (exposed for the
    * VectorDedupSpec shard tests). Hot-invlist handling: a k-row bucket
    * census goes to the driver (aggregate-step contract, like the
    * centroids themselves), each centroid whose invlist exceeds
    * `shardThreshold` is split into ⌈n/threshold⌉ hash sub-shards keyed by
    * xxhash64(vec_id) (content hash — layout-independent, R-determinism),
    * and probes score every sub-shard of each probed centroid, ranking
    * top-k per shard FIRST (WindowGroupLimit over ≤ ~threshold-row
    * partitions) before the final ≤ k·shards-row per-probe rank. The
    * candidate set is untouched, and per-shard-top-k ∘ global-top-k =
    * global-top-k, so results are row-identical to the unsharded plan —
    * only the largest sort any single partition performs changes. Hash
    * imbalance keeps a shard near, not exactly at, the threshold (the
    * spec asserts a 2× slack bound). */
  private[graft] def ivfSearch(s: SparkSession, e: DataFrame,
                               shardThreshold: Long): DataFrame = {
    import s.implicits._
    val cents = kmeansCentroids(e, k = 16, iters = 2)
    ivfServe(s, e, cents, e.where($"vec_id" < 5), shardThreshold)
  }

  /** IVF serve path, split from training so a FROZEN codebook can index
    * new corpora (the incremental-admission contract,
    * [[annIvfIncremental]]): assignment, census, hot-bucket sub-sharding,
    * and probe scoring — everything after Lloyd. */
  private[graft] def ivfServe(s: SparkSession, e: DataFrame,
                              cents: Seq[(Int, Seq[Float])], probeSrc: DataFrame,
                              shardThreshold: Long, nprobe: Int = 4): DataFrame = {
    import s.implicits._
    // invlist assignment: row-local reference-held argmax — the corpus is
    // labeled in its scan stage, zero shuffles (see NearestCentroid)
    val assigned = e.select($"vec_id", $"embedding",
      graft.functions.CentroidFunctions.nearest_centroid($"embedding", cents).as("cent_id"))
    ivfServeAssigned(s, assigned, cents, probeSrc, shardThreshold, nprobe)
  }

  /** Serve over an ALREADY-ASSIGNED invlist frame (vec_id, embedding,
    * cent_id) — split out in r13 so the incremental path can union the
    * standing base invlists with a freshly-assigned delta instead of
    * re-assigning the whole corpus. Census, hot-bucket sub-sharding, and
    * probe scoring are unchanged from [[ivfServe]]. */
  private[graft] def ivfServeAssigned(s: SparkSession, assigned: DataFrame,
                              cents: Seq[(Int, Seq[Float])], probeSrc: DataFrame,
                              shardThreshold: Long, nprobe: Int = 4,
                              censusOpt: Option[Map[Int, Long]] = None): DataFrame = {
    import s.implicits._
    // probes pick their nprobe=4 closest centroids at the DRIVER: the probe
    // set and the codebook are both query-time constants (probes × k
    // cosines of driver flops), and a driver-built bucket list keeps
    // centroid floats out of the plan (literals would defeat the codegen
    // cache — same argument as NearestCentroid)
    val probeRows = probeSrc
      .select($"vec_id", $"embedding".cast("array<float>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq.sortBy(_._1)
    def cosD(x: Seq[Float], y: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0; val m = math.min(x.length, y.length)
      while (i < m) {
        val xi = x(i).toDouble; val yi = y(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      if (m == 0 || na == 0.0 || nb == 0.0) Double.NegativeInfinity
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // bucket census: k counts back to the driver (same bounded-state
    // contract as the centroids) → sub-shard fan-out per hot invlist.
    // A caller maintaining the census alongside its invlists (the r13
    // incremental path: standing base census + delta census) passes it in
    // and skips the full-index aggregate.
    val sizes = censusOpt.getOrElse(
      assigned.groupBy($"cent_id").agg(count(lit(1)).as("bn"))
        .collect().map(r => r.getAs[Int]("cent_id") -> r.getAs[Long]("bn")).toMap)
    val nsub: Seq[(Int, Long)] = cents.map { case (cid, _) =>
      cid -> math.max(1L, (sizes.getOrElse(cid, 0L) + shardThreshold - 1) / shardThreshold)
    }
    val subOf = nsub.foldLeft(lit(0L)) { case (acc, (cid, m)) =>
      when($"cent_id" === cid, pmod(xxhash64($"vec_id"), lit(m))).otherwise(acc)
    }
    val sharded = assigned.withColumn("sub_id", subOf)
    val nsubMap = nsub.toMap
    val buckets = probeRows.flatMap { case (pid, pe) =>
      cents.map { case (cid, cv) => (pid, pe, cid, cosD(pe, cv)) }
        .sortBy { case (_, _, cid, c) => (-c, cid) }
        .take(nprobe).flatMap { case (p, v, cid, _) =>
          (0L until nsubMap(cid)).map(sub => (p, v, cid, sub)) }
    }
    val probeBuckets = s.createDataset(buckets)
      .toDF("probe_id", "pe", "cent_id", "sub_id")
    // score only candidates in the selected buckets (probe side is tiny —
    // broadcast it; the corpus side never moves). Rank per shard first:
    // no partition ever sorts more than ~shardThreshold candidate rows,
    // however hot the centroid.
    val wShard = Window.partitionBy($"probe_id", $"cent_id", $"sub_id")
      .orderBy($"cos".desc, $"vec_id")
    val wTop = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id")
    broadcast(probeBuckets).join(sharded, Seq("cent_id", "sub_id"))
      .select($"probe_id", $"cent_id", $"sub_id", $"vec_id",
        cosine($"pe", $"embedding").as("cos"))
      .withColumn("srk", row_number().over(wShard))
      .where($"srk" <= 5)
      .withColumn("rk", row_number().over(wTop))
      .where($"rk" <= 5)
      .select($"probe_id", $"rk", $"vec_id", round($"cos", 4).as("cos"))
      .orderBy($"probe_id", $"rk")
  }

  // ---------------------------------------------------------------- PQ ANN
  /** Product-quantization ANN with exact re-ranking (rows-only; recall@5
    * vs the brute-force top-k asserted in VectorDedupSpec).
    *
    * The memory-compression ANN path IVF doesn't cover: m=8 subspaces ×
    * 8 dims, 16 centroids per subspace (the same deterministic Lloyd loop
    * as [[annIvf]], run per subspace on L2-NORMALIZED vectors so inner
    * product == cosine), so each corpus vector compresses to 8 × 4-bit
    * codes — 4 bytes against 256 float bytes. At billions of vectors that
    * is the difference between codes resident in executor memory and a
    * disk-bound scan; full-precision vectors are touched only for the
    * shortlist.
    *
    * Query = ADC + re-rank, the standard PQ shape: each probe precomputes
    * its 8×16 subspace dot-product table at the DRIVER (query-time
    * constants — probes×128 flops, same contract as the IVF probe
    * assignment); a corpus vector's approximate score is then 8 literal-
    * array lookups on its codes, expressed as `element_at` columns so
    * scoring is row-local codegen and the corpus never shuffles for it.
    * The 50-candidate ADC shortlist per probe is re-ranked with the exact
    * codegen cosine; only the window rank over per-probe shortlists
    * shuffles, and that frame is ≤ probes × corpus rows pre-limit with a
    * WindowGroupLimit. Empty-centroid slots index as -1e9 so a vanished
    * Lloyd cluster can never be preferred. */
  /** All m per-subspace PQ codebooks in ONE Lloyd loop: the corpus
    * explodes once into (sub_id, subvector) rows, assignment is an
    * m-way CASE over the codegen [[graft.functions.NearestCentroid]]
    * kernels, and the centroid update is a single (sub_id, code) hash
    * aggregate of quantized int64 dim-sums — so each iteration is ONE
    * pass / ONE driver action over the corpus instead of m separate
    * k-means fits (m× fewer passes at 100 TB, 8× fewer driver
    * round-trips locally; same order-independent integer-sum
    * determinism as [[kmeansCentroids]]). Driver state: m×k×(sub)
    * floats — the aggregate-step contract. */
  private def pqCodebooks(en: DataFrame, m: Int, sub: Int, k: Int,
      iters: Int): Seq[Seq[(Int, Seq[Float])]] = {
    val s = en.sparkSession
    import s.implicits._
    val subStructs = array((0 until m).map { si =>
      struct(lit(si).as("sub_id"), slice($"embedding", si * sub + 1, sub).as("sv"))
    }: _*)
    val sliced = en.select($"vec_id", explode(subStructs).as("x"))
      .select($"vec_id", $"x.sub_id".as("sub_id"), $"x.sv".cast("array<float>").as("sv"))
    sliced.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var books: Seq[Seq[(Int, Seq[Float])]] = {
        val init = sliced.where($"vec_id" < k)
          .select($"sub_id", $"vec_id".cast("int"), $"sv")
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
        (0 until m).map(si =>
          init.filter(_._1 == si).map(t => t._2 -> t._3).sortBy(_._1).toSeq)
      }
      for (_ <- 0 until iters) {
        val assign = (1 until m).foldLeft(
          when($"sub_id" === 0,
            graft.functions.CentroidFunctions.nearest_centroid($"sv", books(0)))) {
          (acc, si) => acc.when($"sub_id" === si,
            graft.functions.CentroidFunctions.nearest_centroid($"sv", books(si)))
        }
        val dimSums = (0 until sub).map(i =>
          sum(floor(element_at($"sv", i + 1).cast("double") * 10000000.0)
            .cast(LongType)).as(s"s$i"))
        val rows = sliced.select($"sub_id", assign.as("code"), $"sv")
          .groupBy($"sub_id", $"code")
          .agg(count(lit(1)).as("n"), dimSums: _*)
          .collect()
        books = (0 until m).map { si =>
          rows.filter(_.getAs[Int]("sub_id") == si).map { r =>
            val n = r.getAs[Long]("n")
            r.getAs[Int]("code") -> (0 until sub).map(i =>
              (r.getAs[Long](s"s$i").toDouble / 1e7 / n).toFloat)
          }.toSeq.sortBy(_._1)
        }
      }
      books
    } finally sliced.unpersist(false)
  }

  /** STANDING plain-PQ codebooks (r13): the m per-subspace books fit ONCE
    * per corpus dir on the L2-normalized corpus ([[pqCodebooks]], the
    * shared deterministic Lloyd loop) and persisted as (sub_id, code, cv)
    * rows — the q_ann_ivf_pq standing-index precedent extended, so
    * q_ann_pq prices ADC serve work only. Quantizer TRAINING stays priced
    * in full by q_ann_ivf, the ANN family's one construction-pricing
    * contract. Cached-vs-fresh row identity asserted in LayoutSpec. */
  private[graft] def pqBooks(s: SparkSession, dir: String, m: Int, sub: Int,
      k: Int): Seq[Seq[(Int, Seq[Float])]] = {
    import s.implicits._
    val rows = graft.tables.Layout.standing(s, s"pq_${dirKey(dir)}_books", {
      val en = graft.tables.Layout.materialize(ivfPqNorm(s, dir))
      val books = pqCodebooks(en, m, sub, k, iters = 2)
      s.createDataset(for {
        (book, si) <- books.zipWithIndex
        (cid, cv) <- book
      } yield (si, cid, cv)).toDF("sub_id", "code", "cv")
    }).as[(Int, Int, Seq[Float])].collect()
    (0 until m).map(si =>
      rows.filter(_._1 == si).map(t => t._2 -> t._3).sortBy(_._1).toSeq)
  }

  /** STANDING PQ-encoded corpus (r13): per vector the normalized float
    * payload (the re-rank store) and its m 4-bit codes — the persisted
    * code column a production PQ index actually scans (GB where the raw
    * vectors are TB). */
  private[graft] def pqCodes(s: SparkSession, dir: String, m: Int, sub: Int,
      k: Int): DataFrame = {
    import s.implicits._
    graft.tables.Layout.standing(s, s"pq_${dirKey(dir)}_codes", {
      val books = pqBooks(s, dir, m, sub, k)
      val codeCols = (0 until m).map { si =>
        graft.functions.CentroidFunctions
          .nearest_centroid(slice($"embedding", si * sub + 1, sub), books(si)).as(s"c$si")
      }
      ivfPqNorm(s, dir).select(($"vec_id" +: $"embedding" +: codeCols): _*)
    })
  }

  def annPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = 64; val m = 8; val sub = dim / m; val k = 16
    // the index is a STANDING artifact (r13, extending the r12 q_ann_ivf_pq
    // precedent): codebooks + encoded codes build once per corpus dir and
    // persist — this query prices what a production PQ index serves per
    // probe batch (driver ADC tables, row-local code lookups over the
    // standing code column, exact re-rank of the shortlist).
    val books = pqBooks(s, dir, m, sub, k)
    val encoded = pqCodes(s, dir, m, sub, k)
    val probeRows = encoded.where($"vec_id" < 5)
      .select($"vec_id", $"embedding".cast("array<float>"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    def dotD(x: Seq[Float], y: Seq[Float]): Double = {
      var d = 0.0; var i = 0; val n = math.min(x.length, y.length)
      while (i < n) { d += x(i).toDouble * y(i).toDouble; i += 1 }; d
    }
    // per-probe ADC column: Σ_s table_s[code_s] via literal-array lookups
    val adcStructs = probeRows.map { case (pid, pe) =>
      val adc = (0 until m).map { si =>
        val byId = books(si).map { case (cid, cv) =>
          cid -> dotD(pe.slice(si * sub, si * sub + sub), cv) }.toMap
        val table = (0 to books(si).map(_._1).max).map(byId.getOrElse(_, -1e9))
        element_at(typedLit(table), $"c$si" + 1)
      }.reduce(_ + _)
      struct(lit(pid).as("probe_id"), adc.as("adc"))
    }
    val wAdc = Window.partitionBy($"probe_id").orderBy($"adc".desc, $"vec_id")
    val shortlist = encoded
      .select($"vec_id", $"embedding", explode(array(adcStructs: _*)).as("pa"))
      .select($"vec_id", $"embedding", $"pa.probe_id".as("probe_id"), $"pa.adc".as("adc"))
      .withColumn("ark", row_number().over(wAdc))
      .where($"ark" <= 50)
    val probesDf = s.createDataset(probeRows).toDF("probe_id", "pe")
    val wTop = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id")
    shortlist.join(broadcast(probesDf), Seq("probe_id"))
      .select($"probe_id", $"vec_id", cosine($"pe", $"embedding").as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .where($"rk" <= 5)
      .select($"probe_id", $"rk", $"vec_id", round($"cos", 4).as("cos"))
      .orderBy($"probe_id", $"rk")
  }

  /** Composed IVF+PQ ANN (r9) — the coarse-prune + compressed-score shape a
    * standing billion-vector index actually serves from (the FAISS
    * `IVFx,PQy` layout, re-expressed declaratively): q_ann_ivf prunes but
    * scores full-precision vectors; q_ann_pq compresses but scans the whole
    * corpus per probe. Composing them, each probe touches only the PQ CODES
    * of its nprobe=4 probed cells — candidate count drops ~k/nprobe-fold AND
    * the scored payload per vector is 8 nibbles, not 256 float bytes, so at
    * 100 TB the hot loop reads a code column measured in GB where the raw
    * vectors are TB.
    *
    * Training (both quantizers reuse the deterministic Lloyd loops):
    * 16-cell coarse quantizer on L2-normalized vectors ([[kmeansCentroids]]);
    * then m=8 per-subspace codebooks fit on the RESIDUALS x − c(x)
    * ([[pqCodebooks]] — shared across cells, the classic shared-codebook
    * IVFPQ), which carry most of the variance the coarse cell removed.
    * All three trained artifacts — centroids, codebooks, encoded invlists —
    * are STANDING tables (r12, [[graft.tables.Layout.standing]]): built
    * once per corpus dir, then every query prices serve work only, as a
    * production index does.
    *
    * Serving: score(q,x) = ⟨q,x⟩ = ⟨q,c(x)⟩ + ⟨q,r(x)⟩ ≈ qc + Σ_s T_q[s][
    * code_s(x)] — qc is a driver scalar per (probe, cell) carried on the
    * broadcast probe→cell frame; T_q is the probe's 8×16 residual ADC table
    * (driver flops, query-time constants) applied as literal-array
    * `element_at` lookups, so candidate scoring is row-local codegen and the
    * corpus never shuffles for it. Per-cell top-50 rank FIRST (the
    * WindowGroupLimit never sorts more than one invlist per probe), then the
    * per-probe top-50 shortlist re-ranks with the exact codegen cosine over
    * full vectors — only the shortlist (≤ probes × 50 rows post-limit)
    * touches float payloads. Rows-only contract (rank order is ADC-
    * approximate); MiniOpsSpec asserts recall@5 vs brute force (0.96 on
    * sf0.01 at equal shortlist size, vs plain-PQ ADC's 0.88 — the coarse
    * term ⟨q,c⟩ is exact here where plain PQ quantizes ALL the signal) and
    * probe-finds-itself. Determinism: fixed expression trees over literal
    * tables; ties break on vec_id (R4). */
  /** L2-normalized embedding frame for the IVF-PQ index build. */
  private[graft] def ivfPqNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nrm = sqrt(aggregate(
      transform($"embedding", x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    embeddings(s, dir).select($"vec_id",
      when(nrm > 0.0,
        transform($"embedding", x => (x.cast("double") / nrm).cast("float")))
        .otherwise($"embedding").cast("array<float>").as("embedding"))
  }

  /** STANDING coarse quantizer of the IVF-PQ index (r12): k centroids
    * trained once per corpus dir ([[kmeansCentroids]], deterministic
    * integer-sum Lloyd) and persisted. Collected to the driver at serve
    * time — k×d floats, the broadcast-literal contract. */
  private def ivfPqCents(s: SparkSession, dir: String, k: Int): Seq[(Int, Seq[Float])] = {
    import s.implicits._
    graft.tables.Layout.standing(s, s"ivfpq_${dirKey(dir)}_cents", {
      val en = graft.tables.Layout.materialize(ivfPqNorm(s, dir))
      s.createDataset(kmeansCentroids(en, k, iters = 2)).toDF("cent_id", "cv")
    }).as[(Int, Seq[Float])].collect().sortBy(_._1).toSeq
  }

  /** Row-local residual x − c(x) as a k-way CASE over literal centroid
    * arrays (no join brings centroids to the data). */
  private def residualCol(cents: Seq[(Int, Seq[Float])]): Column = {
    def residOf(cv: Seq[Float]): Column =
      zip_with(col("embedding"), typedLit(cv),
        (x, c) => (x.cast("double") - c.cast("double")).cast("float"))
    cents.tail.foldLeft(
      when(col("cent_id") === cents.head._1, residOf(cents.head._2))) {
      case (acc, (cid, cv)) => acc.when(col("cent_id") === cid, residOf(cv))
    }
  }

  /** STANDING shared residual codebooks (r12): m per-subspace PQ books fit
    * on x − c(x) over the standing coarse quantizer, persisted as
    * (sub_id, code, cv) rows. */
  private def ivfPqBooks(s: SparkSession, dir: String, m: Int, sub: Int,
      k: Int): Seq[Seq[(Int, Seq[Float])]] = {
    import s.implicits._
    val rows = graft.tables.Layout.standing(s, s"ivfpq_${dirKey(dir)}_books", {
      val cents = ivfPqCents(s, dir, k)
      val en = graft.tables.Layout.materialize(ivfPqNorm(s, dir))
      val resFrame = en
        .select($"vec_id", $"embedding",
          graft.functions.CentroidFunctions.nearest_centroid($"embedding", cents).as("cent_id"))
        .select($"vec_id", residualCol(cents).cast("array<float>").as("embedding"))
      val books = pqCodebooks(resFrame, m, sub, k, iters = 2)
      s.createDataset(for {
        (book, si) <- books.zipWithIndex
        (cid, cv) <- book
      } yield (si, cid, cv)).toDF("sub_id", "code", "cv")
    }).as[(Int, Int, Seq[Float])].collect()
    (0 until m).map(si =>
      rows.filter(_._1 == si).map(t => t._2 -> t._3).sortBy(_._1).toSeq)
  }

  /** STANDING encoded corpus of the IVF-PQ index (r12): per vector its
    * coarse cell, normalized float payload (the re-rank store), and m
    * PQ codes — the persisted FAISS-layout invlists the serve path scans. */
  private def ivfPqCodes(s: SparkSession, dir: String, m: Int, sub: Int,
      k: Int): DataFrame = {
    import s.implicits._
    graft.tables.Layout.standing(s, s"ivfpq_${dirKey(dir)}_codes", {
      val cents = ivfPqCents(s, dir, k)
      val books = ivfPqBooks(s, dir, m, sub, k)
      val resFrame = ivfPqNorm(s, dir)
        .select($"vec_id", $"embedding",
          graft.functions.CentroidFunctions.nearest_centroid($"embedding", cents).as("cent_id"))
        .select($"vec_id", $"cent_id", $"embedding",
          residualCol(cents).cast("array<float>").as("resid"))
      val codeCols = (0 until m).map { si =>
        graft.functions.CentroidFunctions
          .nearest_centroid(slice($"resid", si * sub + 1, sub), books(si)).as(s"c$si")
      }
      resFrame.select(($"vec_id" +: $"cent_id" +: $"embedding" +: codeCols): _*)
    })
  }

  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = 64; val m = 8; val sub = dim / m; val k = 16; val nprobe = 4
    // the index is a STANDING artifact (r12): centroids, codebooks, and
    // the encoded invlists build once per corpus dir and persist — this
    // query prices what a production IVF-PQ index serves per probe batch
    // (probe fan-out, ADC scoring over probed cells' codes, exact re-rank
    // of the shortlist). q_ann_ivf and q_ann_pq keep pricing the two
    // training loops in full as the component contracts.
    val cents = ivfPqCents(s, dir, k)
    val books = ivfPqBooks(s, dir, m, sub, k)
    val encoded = ivfPqCodes(s, dir, m, sub, k)
    val probeRows = encoded.where($"vec_id" < 5)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    def dotD(x: Seq[Float], y: Seq[Float]): Double = {
      var d = 0.0; var i = 0; val n = math.min(x.length, y.length)
      while (i < n) { d += x(i).toDouble * y(i).toDouble; i += 1 }; d
    }
    // probe → probed-cell fan-out at the driver (probes × k cosines of
    // driver flops, the IVF probe-assignment contract), carrying the exact
    // ⟨q, c⟩ term each candidate in that cell inherits
    val buckets = probeRows.flatMap { case (pid, pe) =>
      cents.map { case (cid, cv) => (pid, pe, cid, dotD(pe, cv)) }
        .sortBy { case (_, _, cid, qc) => (-qc, cid) }
        .take(nprobe)
    }
    val probeBuckets = s.createDataset(buckets)
      .toDF("probe_id", "pe", "cent_id", "qc")
    // residual ADC term: per probe an 8×16 literal table of ⟨q_s, codeword⟩,
    // selected by a probes-way CASE — all lookups row-local codegen
    def adcFor(pe: Seq[Float]): Column = (0 until m).map { si =>
      val byId = books(si).map { case (cid, cv) =>
        cid -> dotD(pe.slice(si * sub, si * sub + sub), cv) }.toMap
      val table = (0 to books(si).map(_._1).max).map(byId.getOrElse(_, -1e9))
      element_at(typedLit(table), col(s"c$si") + 1)
    }.reduce(_ + _)
    val adcCase = probeRows.tail.foldLeft(
      when($"probe_id" === probeRows.head._1, adcFor(probeRows.head._2))) {
      case (acc, (pid, pe)) => acc.when($"probe_id" === pid, adcFor(pe))
    }
    val wCell = Window.partitionBy($"probe_id", $"cent_id")
      .orderBy($"adc".desc, $"vec_id")
    val wAdc = Window.partitionBy($"probe_id").orderBy($"adc".desc, $"vec_id")
    val wTop = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id")
    broadcast(probeBuckets).join(encoded, Seq("cent_id"))
      .select($"probe_id", $"pe", $"cent_id", $"vec_id", $"embedding",
        ($"qc" + adcCase).as("adc"))
      .withColumn("crk", row_number().over(wCell))
      .where($"crk" <= 50)
      .withColumn("ark", row_number().over(wAdc))
      .where($"ark" <= 50)
      .select($"probe_id", $"vec_id", cosine($"pe", $"embedding").as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .where($"rk" <= 5)
      .select($"probe_id", $"rk", $"vec_id", round($"cos", 4).as("cos"))
      .orderBy($"probe_id", $"rk")
  }

  // ---------------------------------------------------------------- LSH buckets
  /** Random-hyperplane LSH bucketing (rows-only): 16 fixed Gaussian planes
    * (seeded, deterministic) → 16-bit signature per vector. The bucket id is
    * the shuffle key a banded near-dup join would use at scale (see
    * [[dedupEmbedBanded]] for that join). Signature via the codegen-side
    * [[graft.functions.HyperplaneSignature]] kernel — bit-identical to the
    * interpreted zip_with/aggregate HOF chain it replaced (same
    * left-to-right double folds), one expression call per row instead of
    * 16 interpreted array walks. */
  def simLshBucket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val planes = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val withBucket = embeddings(s, dir).select($"vec_id",
      graft.functions.CentroidFunctions.hyperplane_sig($"embedding", planes).as("bucket"))
    val wSize = Window.partitionBy($"bucket")
    withBucket
      .withColumn("bucket_size", count(lit(1)).over(wSize))
      .orderBy($"vec_id")
  }

  // ---------------------------------------------------------------- binary
  /** Binary-column metadata: treat text bytes as an opaque payload (stand-in
    * for image/audio blobs) — length + content hash, both oracle-able. */
  def mmBinaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id",
        octet_length($"text".cast("binary")).cast(LongType).as("n_bytes"),
        md5($"text".cast("binary")).as("content_md5"))
      .orderBy($"doc_id")
  }

  val mmBinaryMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** ViT-style patch-grid accounting + batch packing (r11) — the vision
    * side of q_pack_sequences: per "image" (binary payload; dimensions
    * derive deterministically from the byte count, the mmDecodeStub
    * fake-decode convention expressed in pure arithmetic so the op stays
    * oracle-able), the 16-px patch grid (⌈w/16⌉×⌈h/16⌉), the transformer
    * sequence length (patches + CLS), and the training batch each image
    * packs into under a 4096-patch budget.
    *
    * Scale: packing is sequential per STREAM (the q_pack_sequences
    * contract) — part = doc_id mod 32 gives 32 deterministic streams,
    * the running patch sum is a window over (part), corpus/32 rows per
    * partition, never a global reducer. All arithmetic exact ints. */
  def mmPatchGrid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"part").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(s, dir)
      .select($"doc_id", pmod($"doc_id", lit(32L)).as("part"),
        octet_length($"text".cast("binary")).cast(LongType).as("n_bytes"))
      .select($"doc_id", $"part",
        (lit(64L) + pmod($"n_bytes", lit(193L))).as("img_w"),
        (lit(64L) + pmod($"n_bytes" * 7L, lit(149L))).as("img_h"))
      .select($"doc_id", $"part", $"img_w", $"img_h",
        expr("(img_w + 15L) div 16L").as("pw"),
        expr("(img_h + 15L) div 16L").as("ph"))
      .withColumn("n_patches", $"pw" * $"ph")
      .withColumn("seq_len", $"n_patches" + 1L)
      .withColumn("cum", sum($"n_patches").over(w))
      .withColumn("batch_id", expr("(cum - n_patches) div 4096L"))
      .select($"doc_id", $"img_w", $"img_h", $"pw", $"ph",
        $"n_patches", $"seq_len", $"part", $"batch_id")
      .orderBy($"doc_id")
  }

  val mmPatchGridSql: String =
    """WITH b AS (
      |  SELECT doc_id, doc_id % 32 AS part,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |dims AS (
      |  SELECT doc_id, part,
      |    64 + (n_bytes % 193) AS img_w,
      |    64 + ((n_bytes * 7) % 149) AS img_h
      |  FROM b),
      |grid AS (
      |  SELECT doc_id, part, img_w, img_h,
      |    (img_w + 15) // 16 AS pw, (img_h + 15) // 16 AS ph,
      |    ((img_w + 15) // 16) * ((img_h + 15) // 16) AS n_patches
      |  FROM dims),
      |packed AS (
      |  SELECT doc_id, part, img_w, img_h, pw, ph, n_patches,
      |    n_patches + 1 AS seq_len,
      |    CAST(SUM(n_patches) OVER (PARTITION BY part ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM grid)
      |SELECT doc_id, img_w, img_h, pw, ph, n_patches, seq_len, part,
      |  CAST((cum - n_patches) // 4096 AS BIGINT) AS batch_id
      |FROM packed ORDER BY doc_id""".stripMargin

  /** Partition-wise media decode plumbing (rows-only). The decoder here is a
    * clearly-marked DETERMINISTIC STUB (no image/audio libs offline): it
    * derives fake dimensions from the byte stream. The Spark shape is the
    * real one — binary column in, per-partition batch iteration, typed
    * metadata out — exactly where a codec/model batch call would slot in. */
  def mmDecodeStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // STUB decode: a real implementation opens a codec once per
        // partition (the RichFunction.open analog) and decodes each blob.
        it.map { case (id, bytes) =>
          val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
          val bn = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
          MediaMeta(id, bytes.length, 64 + b0 % 64, 64 + bn % 64, "stub/raw")
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Distributed centroid accumulation — the map-side partial-sum step of
    * k-means/IVF training, oracle-checkable form. Per label: vector count
    * plus component sums of the 1e6-quantized elements (dims 1 and 2
    * individually, plus the all-dims total). Quantizing each element with
    * floor(x·1e6) BEFORE summation makes the reduction pure int64 — exact
    * in any shuffle order, unlike float sums which are non-associative —
    * which is exactly how a deterministic large-scale k-means keeps its
    * centroids reproducible across cluster shapes (divide by n at read).
    * The DuckDB twin CASTs every integer sum to BIGINT (sum over int
    * returns HUGEINT there — the q_embed_quantize lesson). */
  def embedCentroid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = $"embedding".cast("array<double>")
    val q6 = (c: Column) => floor(c * lit(1000000.0)).cast(LongType)
    embeddings(s, dir)
      .select($"label",
        q6(element_at(e, 1)).as("d1"),
        q6(element_at(e, 2)).as("d2"),
        aggregate(transform(e, x => q6(x)), lit(0L), (a, x) => a + x).as("dall"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        sum($"d1").as("s_d1"), sum($"d2").as("s_d2"), sum($"dall").as("s_all"))
      .orderBy($"label")
  }

  val embedCentroidSql: String =
    """WITH q AS (
      |  SELECT label,
      |    CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS d1,
      |    CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS d2,
      |    CAST(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(FLOOR(x * 1000000) AS BIGINT)), 'sum') AS BIGINT) AS dall
      |  FROM embeddings)
      |SELECT label, COUNT(*) AS n,
      |  CAST(SUM(d1) AS BIGINT) AS s_d1, CAST(SUM(d2) AS BIGINT) AS s_d2,
      |  CAST(SUM(dall) AS BIGINT) AS s_all
      |FROM q GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- outliers
  /** Embedding-space outlier census (r11) — the "drop the weird vectors"
    * curation gate (mislabeled scrapes, encoder failures, adversarial
    * junk sit far from the corpus mass): top-20 vectors by squared L2
    * distance to the GLOBAL centroid, exact in quantized integer space.
    *
    * Determinism: elements quantize to ⌊x·10⁶⌋ int64 (the embedCentroid
    * discipline); the centroid is the per-dim integer division s_d div n
    * (exact, engine-identical), and dist2_q = Σ_d (q(x_d) − c_d)² stays
    * pure int64 (≤ 64·(2·10⁶)² ≈ 2.6·10¹¹ per vector) — no float ever,
    * so the top-20 cut is stable across engines and shuffle orders.
    *
    * Scale: pass 1 computes per-dim sums via posexplode → dim hash-agg
    * (map-side partials cut the shuffle to 64 rows/partition); the 64
    * c_d values collect to the driver — BOUNDED state, d longs (the PCA
    * driver-eigensolve contract) — and return as an array LITERAL, so
    * pass 2 is ONE scan with a row-local zip_with/aggregate fold and a
    * TakeOrdered top-20: the corpus is never shuffled at all. */
  def embedOutlier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = $"embedding".cast("array<double>")
    val q6 = (c: Column) => floor(c * lit(1000000.0)).cast(LongType)
    val qvec = embeddings(s, dir)
      .select($"vec_id", $"label", transform(e, x => q6(x)).as("q"))
    val cent = qvec
      .select(posexplode($"q").as(Seq("dim", "v")))
      .groupBy($"dim").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .select($"dim", expr("s div n").as("c"))
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    val centLit = array(cent.map(lit(_)): _*)
    qvec
      .withColumn("dist2_q",
        aggregate(zip_with($"q", centLit, (x, c) => (x - c) * (x - c)),
          lit(0L), (a, x) => a + x))
      .select($"vec_id", $"label", $"dist2_q")
      .orderBy($"dist2_q".desc, $"vec_id")
      .limit(20)
  }

  val embedOutlierSql: String =
    """WITH q AS (
      |  SELECT vec_id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |flat AS (
      |  SELECT vec_id, generate_subscripts(qv, 1) AS dim, unnest(qv) AS v
      |  FROM q),
      |cent AS (
      |  SELECT dim, CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
      |  FROM flat GROUP BY dim),
      |d AS (
      |  SELECT f.vec_id,
      |    CAST(SUM((f.v - cent.c) * (f.v - cent.c)) AS BIGINT) AS dist2_q
      |  FROM flat f JOIN cent ON f.dim = cent.dim
      |  GROUP BY f.vec_id)
      |SELECT q.vec_id, q.label, d.dist2_q
      |FROM q JOIN d ON q.vec_id = d.vec_id
      |ORDER BY d.dist2_q DESC, q.vec_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- PCA
  /** Distributed PCA projection (r10) — embedding whitening/compression,
    * the dimensionality-reduction member of the vector family: top-2
    * principal components of the embedding cloud, every vector projected
    * onto them. At 100 TB this is the one-pass + row-local shape you want:
    * the corpus is touched twice total, never shuffled.
    *
    * Pass 1 (training): ONE `treeAggregate` over the scan accumulates the
    * d first-moment and d(d+1)/2 second-moment sums as QUANTIZED int64
    * (⌊x·10⁷⌋ / ⌊x·x·10⁶⌋ per row, then integer addition — associative, so
    * the sums are bit-reproducible under any partition order; the same R4
    * discipline the k-means trainer uses, at quantization levels that
    * hold trillion-row corpora inside int64). Driver state is 64 + 2080
    * longs — the aggregate-step contract — from which the driver builds
    * the covariance E[xxᵀ]−μμᵀ and runs 60 deterministic power-iteration
    * steps (fixed e₁-ish init, Hotelling deflation for PC2, sign fixed by
    * the largest-|coordinate| convention), all on a 64×64 matrix: k×d
    * driver flops, same contract as the centroid trainers.
    *
    * Pass 2 (serving): projection is a row-local ordered `aggregate` fold
    * over zip_with(x, literal component) (R4), minus the driver-constant
    * μ·v term — no UDF, no join, no shuffle; the output sort is the only
    * exchange. Rows-only contract (an eigensolve is not SQL-expressible);
    * PcaSpec asserts the invariants that matter: unit-norm orthogonal
    * components, Var(pc1) ≥ Var(pc2), Var(pc1) ≥ every coordinate-axis
    * variance (PCA optimality over the axis basis), centered projections,
    * and run-to-run determinism. */
  def embedPca(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir).select($"vec_id", $"embedding".cast("array<float>"))
    val (mu, v1, v2) = pcaComponents(e)
    e.select($"vec_id",
        round(pcaProjection($"embedding", mu, v1), 4).as("pc1"),
        round(pcaProjection($"embedding", mu, v2), 4).as("pc2"))
      .orderBy($"vec_id")
  }

  /** Row-local PCA projection of `x` onto frozen component `v` with mean
    * `mu`: ordered `aggregate` fold over zip_with against the LITERAL
    * component (R4) minus the driver-constant μ·v — no join, no shuffle,
    * stateless, so it serves batch and stream identically. */
  private[graft] def pcaProjection(x: Column, mu: Array[Double],
                                   v: Array[Double]): Column = {
    val c = v.indices.map(i => mu(i) * v(i)).sum // driver-constant μ·v
    aggregate(
      zip_with(x, typedLit(v.toSeq), (xi, w) => xi.cast("double") * w),
      lit(0.0), (acc, t) => acc + t) - lit(c)
  }

  /** PCA training pass — (μ, v1, v2) from one treeAggregate of quantized
    * int64 moment sums + a driver 64×64 eigensolve (see [[embedPca]]).
    * Exposed so the streaming serve twin projects under the same FROZEN
    * components the batch query trains. */
  private[graft] def pcaComponents(e: DataFrame): (Array[Double], Array[Double], Array[Double]) = {
    val dim = 64
    val nPairs = dim * (dim + 1) / 2
    def pidx(i: Int, j: Int): Int = i * dim - i * (i - 1) / 2 + (j - i)
    val (sm, sp, n) = e.select(col("embedding")).queryExecution.toRdd.treeAggregate(
      (new Array[Long](dim), new Array[Long](nPairs), 0L))(
      { case ((m, p, c), row) =>
        val arr = row.getArray(0)
        var i = 0
        while (i < dim) {
          val xi = arr.getFloat(i).toDouble
          m(i) += math.floor(xi * 1e7).toLong
          var j = i
          while (j < dim) {
            p(pidx(i, j)) += math.floor(xi * arr.getFloat(j).toDouble * 1e6).toLong
            j += 1
          }
          i += 1
        }
        (m, p, c + 1L)
      },
      { case ((m1, p1, c1), (m2, p2, c2)) =>
        var i = 0
        while (i < dim) { m1(i) += m2(i); i += 1 }
        var k = 0
        while (k < nPairs) { p1(k) += p2(k); k += 1 }
        (m1, p1, c1 + c2)
      })
    val mu = sm.map(_.toDouble / 1e7 / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      sp(pidx(a, b)).toDouble / 1e6 / n - mu(i) * mu(j)
    }
    def matVec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(dim)(i => (0 until dim).map(j => a(i)(j) * v(j)).sum)
    def normalize(v: Array[Double]): Array[Double] = {
      val nn = math.sqrt(v.map(x => x * x).sum); v.map(_ / nn)
    }
    def signFix(v: Array[Double]): Array[Double] = {
      val k = (0 until dim).maxBy(i => (math.abs(v(i)), -i))
      if (v(k) < 0) v.map(x => -x) else v
    }
    def powerIter(a: Array[Array[Double]]): (Array[Double], Double) = {
      var v = normalize(Array.tabulate(dim)(i => if (i == 0) 1.0 else 1e-3))
      for (_ <- 0 until 60) v = normalize(matVec(a, v))
      val av = matVec(a, v)
      (signFix(v), (0 until dim).map(i => v(i) * av(i)).sum) // Rayleigh λ
    }
    val (v1, l1) = powerIter(cov)
    val deflated = Array.tabulate(dim, dim)((i, j) => cov(i)(j) - l1 * v1(i) * v1(j))
    val (v2, _) = powerIter(deflated)
    (mu, v1, v2)
  }

  /** Frame sampling over opaque payloads — the video/audio keyframe-
    * extraction plumbing of a multimodal pipeline, with a deterministic
    * frame model standing in for the codec (fixed 256-byte frames, every
    * 4th sampled; the text column plays the payload as in q_mm_binary_meta
    * — ASCII, so char frames == byte frames). The Spark shape is the real
    * thing: per-row frame enumeration via sequence+explode (no UDF, stays
    * in codegen), content-addressed frame ids via md5 — at 100 TB the
    * explode fans out inside the scan stage partition-locally and the
    * sampled frames shuffle nowhere until the caller keys them. */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id", $"text",
        ceil(length($"text") / lit(256.0)).cast(LongType).as("n_frames"))
      // empty payload ⇒ n_frames = 0 and sequence(0, -1) would DESCEND
      // (Spark defaults step to -1 when start > stop), emitting a spurious
      // frame 0 where the DuckDB twin's generate_series(0, -1) is empty —
      // filter the degenerate row out before the explode on both engines'
      // behalf (the oracle is already empty for it)
      .where($"n_frames" >= 1)
      .select($"doc_id", $"text", $"n_frames",
        explode(sequence(lit(0L), $"n_frames" - 1)).as("frame_idx"))
      .where(pmod($"frame_idx", lit(4L)) === 0)
      .select($"doc_id", $"frame_idx",
        md5(expr("cast(substring(text, cast(frame_idx*256+1 as int), 256) as binary)"))
          .as("frame_md5"),
        $"n_frames")
      .orderBy($"doc_id", $"frame_idx")
  }

  val mmFrameSampleSql: String =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    CAST(CEIL(length(text) / 256.0) AS BIGINT) AS n_frames
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, text, n_frames,
      |    unnest(generate_series(0, n_frames - 1)) AS frame_idx
      |  FROM b)
      |SELECT doc_id, frame_idx,
      |  md5(substring(text, frame_idx*256+1, 256)) AS frame_md5, n_frames
      |FROM f WHERE frame_idx % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_frame_sample"    -> (mmFrameSample _),
    "q_embed_centroid"     -> (embedCentroid _),
    "q_embed_outlier"      -> (embedOutlier _),
    "q_sim_filtered_topk"  -> (simFilteredTopk _),
    "q_embed_pca"          -> (embedPca _),
    "q_sim_cosine_topk"    -> (simCosineTopk _),
    "q_embed_norm"         -> (embedNorm _),
    "q_multimodal_join"    -> (multimodalJoin _),
    "q_dedup_embed_cosine" -> (dedupEmbedCosine _),
    "q_dedup_embed_banded" -> (dedupEmbedBanded _),
    "q_dedup_embed_banded_prod" -> (dedupEmbedBandedProd _),
    "q_dedup_embed_cluster" -> (dedupEmbedCluster _),
    "q_ann_ivf"            -> (annIvf _),
    "q_ann_ivf_incremental" -> (annIvfIncremental _),
    "q_ann_pq"             -> (annPq _),
    "q_ann_ivf_pq"         -> (annIvfPq _),
    "q_sim_lsh_bucket"     -> (simLshBucket _),
    "q_mm_binary_meta"     -> (mmBinaryMeta _),
    "q_mm_patch_grid"      -> (mmPatchGrid _),
    "q_mm_decode_stub"     -> (mmDecodeStub _))

  def oracle: Map[String, String] = Map(
    "q_mm_frame_sample"    -> mmFrameSampleSql,
    "q_embed_centroid"     -> embedCentroidSql,
    "q_embed_outlier"      -> embedOutlierSql,
    "q_sim_filtered_topk"  -> simFilteredTopkSql,
    "q_sim_cosine_topk"    -> simCosineTopkSql,
    "q_embed_norm"         -> embedNormSql,
    "q_multimodal_join"    -> multimodalJoinSql,
    "q_dedup_embed_cosine" -> dedupEmbedCosineSql,
    "q_mm_binary_meta"     -> mmBinaryMetaSql,
    "q_mm_patch_grid"      -> mmPatchGridSql)
}
