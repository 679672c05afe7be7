package graft

import org.apache.spark.sql.functions._
import graft.ops.{LlmText, LlmVector}

/** Engine-side invariants on the real sf0.001 data: minhash collisions for
  * exact dups, cosine identity, IVF recall vs brute force, HLL envelope. */
class MiniOpsSpec extends SparkTestBase {
  import spark.implicits._
  private val dir = sf("sf0.001")

  test("minhash: an exact duplicate collides in every band (planted dup)") {
    // plant a dup by unioning documents with a copy of doc 0 under new id
    val docs = graft.tables.Tables.documents(spark, dir)
    val dup = docs.where($"doc_id" === 0)
      .withColumn("doc_id", lit(100000L))
    val planted = docs.unionByName(dup)
    planted.createOrReplaceTempView("graft_minhash_planted")
    // run the engine's own shingle pipeline on the planted frame
    val sh = LlmText.shinglesOf(planted)
    val perms = (0 until 16).map(i => min(xxhash64($"shingle", lit(i))).as(s"m$i"))
    val sig = sh.groupBy($"doc_id").agg(perms.head, perms.tail: _*)
    val s0 = sig.where($"doc_id" === 0).drop("doc_id").head()
    val sDup = sig.where($"doc_id" === 100000L).drop("doc_id").head()
    assert(s0 === sDup, "identical content must produce identical minhash signatures")
  }

  test("q_dedup_substring: planted verbatim spans recovered exactly; unique docs absent") {
    // docs 1/2 share one 15-token verbatim span inside disjoint filler
    // alphabets (windows straddling a span boundary differ between docs,
    // so the recovered interval is EXACTLY the planted span); docs 4/5
    // share two separated spans (12 + 11 tokens); doc 3 is unique.
    val span  = (1 to 15).map(i => s"s$i").mkString(" ")
    val spanX = (1 to 12).map(i => s"x$i").mkString(" ")
    val spanY = (1 to 11).map(i => s"y$i").mkString(" ")
    def f(p: String, r: Range) = r.map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, s"${f("a", 1 to 20)} $span ${f("a", 21 to 25)}", "en", "s", 1L),
      (2L, s"${f("b", 1 to 10)} $span ${f("b", 11 to 30)}", "en", "s", 1L),
      (3L, f("u", 1 to 30), "en", "s", 1L),
      (4L, s"${f("c", 1 to 8)} $spanX ${f("c", 9 to 18)} $spanY ${f("c", 19 to 23)}", "en", "s", 1L),
      (5L, s"${f("d", 1 to 5)} $spanX ${f("d", 6 to 12)} $spanY ${f("d", 13 to 15)}", "en", "s", 1L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_substr").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp + "/documents.parquet")
    val rows = LlmText.dedupSubstring(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // (doc_id, n_tokens, n_spans, dup_tokens)
    assert(rows === Seq(
      (1L, 40L, 1L, 15L),
      (2L, 45L, 1L, 15L),
      (4L, 46L, 2L, 23L),
      (5L, 38L, 2L, 23L)),
      "planted span extents not recovered (or a unique doc leaked in)")
  }

  test("cosine: self-similarity 1, symmetry (via the contract query path)") {
    val topk = LlmVector.simCosineTopk(spark, dir).collect()
    // each probe's rank-1 neighbor is itself with cosine 1.0
    val rank1 = topk.filter(_.getAs[Int]("rk") == 1)
    assert(rank1.length === 5)
    rank1.foreach { r =>
      assert(r.getAs[Long]("probe_id") === r.getAs[Long]("vec_id"))
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9)
    }
  }

  test("ann ivf: recall@5 >= 0.8 vs brute force (trained quantizer, nprobe=4 of 16)") {
    val exact = LlmVector.simCosineTopk(spark, dir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val approx = LlmVector.annIvf(spark, dir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 0.92 measured with the 2-iteration Lloyd quantizer (was 0.44 with
    // the untrained first-k-vectors stand-in)
    assert(recall >= 0.8, s"IVF recall too low: $recall")
    // and the probe itself (cos=1) is always found: its bucket is its nearest centroid's
    val self = exact.filter { case (p, v) => p == v }
    assert(self.subsetOf(approx))
  }

  test("ann ivf incremental: frozen-quantizer recall@5 >= 0.8; all-list delta-only " +
       "serve == brute force (admission completeness)") {
    // sf0.01: 500 vectors, delta = top-decile ids (50) — big enough that
    // the delta has structure and the frozen quantizer is genuinely stale
    val d = sf("sf0.01")
    val exact = LlmVector.simCosineTopk(spark, d).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val approx = SparkEntry.queries("q_ann_ivf_incremental")(spark, d).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"incremental IVF recall@5 = $recall%.3f")
    assert(recall >= 0.8, s"stale-quantizer recall collapsed: $recall")

    // the admission property itself: vectors the quantizer NEVER saw,
    // served through the frozen codebook, are COMPLETELY retrievable —
    // with every invlist probed, the delta-only served index must equal
    // brute-force top-5 over the delta exactly (admission/census/reshard
    // plumbing loses or duplicates nothing; at nprobe=4 a 50-vector
    // corpus scattering over 16 lists makes partial recall structural,
    // not a bug, so the bound there is the full-index assertion above)
    val e = graft.tables.Tables.embeddings(spark, d)
    val maxId = e.agg(max($"vec_id")).head().getLong(0)
    val cut = maxId - (maxId + 9L) / 10L
    val base = e.where($"vec_id" <= cut)
    val delta = e.where($"vec_id" > cut)
    val cents = LlmVector.kmeansCentroids(base, k = 16, iters = 2)
    val servedDelta = LlmVector.ivfServe(spark, delta, cents,
        e.where($"vec_id" < 5), shardThreshold = 2048L, nprobe = 16).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val probes = e.where($"vec_id" < 5)
      .select($"vec_id", $"embedding".cast("array<float>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val deltaVecs = delta.select($"vec_id", $"embedding".cast("array<float>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(deltaVecs.length >= 20, "delta too small for a meaningful bound")
    def cosD(x: Seq[Float], y: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i); na += x(i).toDouble * x(i); nb += y(i).toDouble * y(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exactDelta = probes.flatMap { case (pid, pv) =>
      deltaVecs.map { case (vid, vv) => (pid, vid, cosD(pv, vv)) }
        .sortBy { case (_, vid, c) => (-c, vid) }.take(5).map(t => (t._1, t._2))
    }.toSet
    val missed = exactDelta diff servedDelta
    assert(missed.isEmpty,
      s"all-list probe of the admitted delta missed true neighbors: $missed")
  }

  test("ann ivf skew shards: forced sub-sharding returns row-identical results") {
    val e = graft.tables.Tables.embeddings(spark, dir)
    def run(t: Long): Seq[(Long, Int, Long, Double)] =
      LlmVector.ivfSearch(spark, e, t).collect().toSeq
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rk"),
          r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    // threshold 20 forces every 16-centroid invlist of the ~100-vector
    // corpus to split; per-shard-top-k ∘ global-top-k must not change rows
    assert(run(20L) === run(Long.MaxValue),
      "sub-sharding altered the top-k — it may only change partition sizes")
  }

  test("ann ivf skew shards: no scoring shard exceeds 2x the threshold") {
    val e = graft.tables.Tables.embeddings(spark, dir)
    val t = 20L
    // recompute the shard layout from the same public pieces the engine
    // uses (content-hash sub_id over ceil(n/t) shards per invlist) and
    // bound the realized sizes: hash imbalance may overshoot the expected
    // n/ceil(n/t) <= t rows per shard, but never past 2x at these counts
    val cents = LlmVector.kmeansCentroids(e, k = 16, iters = 2)
    val assigned = e.select($"vec_id",
      graft.functions.CentroidFunctions.nearest_centroid($"embedding", cents).as("cent_id"))
    val sizes = assigned.groupBy($"cent_id").agg(count(lit(1)).as("bn"))
      .collect().map(r => r.getAs[Int]("cent_id") -> r.getAs[Long]("bn")).toMap
    val nsub = cents.map { case (cid, _) =>
      cid -> math.max(1L, (sizes.getOrElse(cid, 0L) + t - 1) / t) }
    assert(nsub.exists(_._2 > 1L), "threshold failed to force any split — test is vacuous")
    val subOf = nsub.foldLeft(lit(0L)) { case (acc, (cid, m)) =>
      when($"cent_id" === cid, pmod(xxhash64($"vec_id"), lit(m))).otherwise(acc) }
    val shardMax = assigned.withColumn("sub_id", subOf)
      .groupBy($"cent_id", $"sub_id").agg(count(lit(1)).as("n"))
      .agg(max($"n")).head().getLong(0)
    assert(shardMax <= 2 * t, s"hot shard of $shardMax rows exceeds 2x threshold $t")
  }

  test("ann pq: ADC shortlist + exact re-rank recall@5 >= 0.8 vs brute force (sf0.01: shortlist = 10% of corpus)") {
    // sf0.01 deliberately: 500 vectors vs the 50-candidate shortlist — at
    // sf0.001 the shortlist covers the whole corpus and recall is trivially 1
    val d = sf("sf0.01")
    val exact = LlmVector.simCosineTopk(spark, d).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val approx = LlmVector.annPq(spark, d).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"PQ recall@5 = $recall%.3f")
    assert(recall >= 0.8, s"PQ recall too low: $recall")
    // the probe itself survives ADC + re-rank: its codes ARE its own
    // nearest-centroid codes, so its ADC self-score is maximal
    val self = exact.filter { case (p, v) => p == v }
    assert(self.subsetOf(approx), "a probe failed to find itself")
  }

  test("ann ivf+pq: coarse-pruned residual-ADC recall@5 >= 0.8 vs brute force (sf0.01)") {
    // sf0.01 for the same reason as the plain-PQ test: a 50-row shortlist
    // must be a real subset of the corpus for recall to mean anything.
    val d = sf("sf0.01")
    val exact = LlmVector.simCosineTopk(spark, d).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val approx = LlmVector.annIvfPq(spark, d).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"IVF+PQ recall@5 = $recall%.3f")
    assert(recall >= 0.8, s"IVF+PQ recall too low: $recall")
    // every probe emits a full top-5 frame: the probed cells always hold at
    // least the probe's own cell, which at 16 cells over 500 vectors has
    // >= 5 members on this data
    val approxRows = LlmVector.annIvfPq(spark, d).collect()
    assert(approxRows.groupBy(_.getAs[Long]("probe_id")).forall(_._2.length == 5))
    // the probe finds itself: its own cell is always probed (qc is maximal
    // at its assigned centroid's cell among... its own), and its residual
    // ADC self-score is the max over its cell
    val self = exact.filter { case (p, v) => p == v }
    assert(self.subsetOf(approx), "a probe failed to find itself")
  }

  test("approx_count_distinct within 5% of exact on events") {
    val rows = graft.ops.Aggregations.aggApproxDistinct(spark, dir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_uv").toDouble
      val exact = r.getAs[Long]("exact_uv").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"HLL error >5%: approx=$approx exact=$exact")
    }
  }

  test("exact dedup: survivors unique by content hash; idempotent") {
    val docs = graft.tables.Tables.documents(spark, dir)
    val dedup1 = docs.dropDuplicates("text")
    val dedup2 = dedup1.dropDuplicates("text")
    assert(dedup1.count() === dedup2.count())
    assert(dedup1.select(md5($"text".cast("binary"))).distinct().count() === dedup1.count())
  }

  test("near-dup clustering: transitive chain merges; canonical = longest text then min doc_id") {
    // planted graph: 1~2 (J=2/3), 2~3 (J=0.5), but 1~3 scores 0.25 — only
    // connectivity, not pairwise similarity, puts all three in one cluster.
    // 10 and 11 are exact dups; 5 is a singleton (must not appear).
    val tmp = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    Seq(
      (1L, "a b c d", "en", "s", 7L),
      (2L, "a b c d e", "en", "s", 9L),
      (3L, "b c d e f", "en", "s", 9L),
      (5L, "x y z", "en", "s", 5L),
      (10L, "p q r s", "en", "s", 7L),
      (11L, "p q r s", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp + "/documents.parquet")
    val rows = LlmText.dedupCluster(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    // cluster 1 = {1,2,3}: canonical is doc 2 (len 9 ties with 3, min id wins)
    assert(rows === Seq((1L, 3L, "1/2/3", 2L), (10L, 2L, "10/11", 10L)))
  }

  test("incremental clustering: delta bridges merge base components; output = full recluster") {
    // ids 1..11 → cut = 8: base = {1..4}, delta = {9, 10, 11}.
    // Base state: {1,2} and {3,4} are separate components — J(2,3) = 1/5
    // (shingles {abc,bcd,cde} vs {cde,def,efg}), under the 0.5 gate.
    // Delta doc 9 = "a b c d e f g" (shingles = the union, 5) bridges
    // them: J(9,2) = J(9,3) = 3/5 — a base⇝base merge through a delta
    // doc, the case a naive "attach delta to nearest base cluster" scheme
    // gets wrong. 10/11 are exact dups of each other only (a pure
    // delta×delta pair).
    val tmp = java.nio.file.Files.createTempDirectory("graft_inc_cluster").toString
    Seq(
      (1L, "a b c d", "en", "s", 7L),
      (2L, "a b c d e", "en", "s", 9L),
      (3L, "c d e f g", "en", "s", 9L),
      (4L, "c d e f", "en", "s", 7L),
      (9L, "a b c d e f g", "en", "s", 13L),
      (10L, "p q r s", "en", "s", 7L),
      (11L, "p q r s", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp + "/documents.parquet")
    val inc = LlmText.dedupClusterIncremental(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    val full = LlmText.dedupCluster(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(inc === full, "incremental maintenance drifted from the full recluster")
    // the bridge really merged the two base components
    val bridged = inc.find(_._1 === 1L).getOrElse(fail("cluster 1 missing"))
    assert(bridged._3.split("/").toSet === Set("1", "2", "3", "4", "9"),
      s"base components not merged through the delta bridge: ${bridged._3}")
  }

  test("incremental clustering on the corpus: hash-identical to the full recluster") {
    val inc = LlmText.dedupClusterIncremental(spark, dir).collect().map(_.toString).toSeq
    val full = LlmText.dedupCluster(spark, dir).collect().map(_.toString).toSeq
    assert(inc === full)
  }

  test("incremental clustering: distributed merge branch == driver union-find on the same edges") {
    // The hybrid merge normally takes the driver union-find below 100k
    // reduced edges, so the distributed CC branch would never execute at
    // any test SF. Forcing the bound to -1 routes the SAME reduced graph
    // through Graph.connectedComponents; labels must be identical.
    val driverPath = LlmText.dedupClusterIncremental(spark, dir).collect().map(_.toString).toSeq
    System.setProperty("graft.incremental.uf.maxEdges", "-1")
    // and force the SHARED primitive's distributed loop too (r16): without
    // this the merge branch's Graph.connectedComponents call would take
    // its own driver union-find fast path and the loop would go uncovered
    System.setProperty("graft.cc.uf.maxEdges", "-1")
    try {
      val distributed = LlmText.dedupClusterIncremental(spark, dir).collect().map(_.toString).toSeq
      assert(distributed === driverPath,
        "distributed reduced-graph merge drifted from the driver union-find")
    } finally {
      System.clearProperty("graft.incremental.uf.maxEdges")
      System.clearProperty("graft.cc.uf.maxEdges")
    }
  }

  test("simhash: identical docs get hamming distance 0 (planted)") {
    val pairs = LlmText.dedupSimhash(spark, dir).collect()
    // sanity only: every emitted candidate pair has hamming <= 8 and a<b
    pairs.foreach { r =>
      assert(r.getAs[Long]("hamming") <= 8L)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("q_graph_cc: census equals a driver union-find over the same edges") {
    val edges = graft.ops.Graph.copurchaseEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    // canonical label = min vertex id per component (the CC contract)
    val minOf = parent.keys.groupBy(find).map { case (_, vs) => (find(vs.head), vs.min) }
    val nodes = parent.keys.groupBy(v => minOf(find(v))).map { case (c, vs) => (c, vs.size.toLong) }
    val edgec = edges.groupBy { case (a, _) => minOf(find(a)) }
      .map { case (c, es) => (c, es.length.toLong) }
    val expected = nodes.map { case (c, n) => (c, n, edgec(c)) }.toSeq
      .sortBy { case (c, n, _) => (-n, c) }
    val got = graft.ops.Graph.graphCc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected, "CC census drifted from independent driver union-find")
    // same census through the DISTRIBUTED convergence-asserted loop (cap
    // forced to -1 routes past the driver union-find) — the equality that
    // lets the DuckDB oracle transitively check the iterative path
    System.setProperty("graft.graphcc.uf.maxEdges", "-1")
    // also disable the shared-primitive fast path (r16) so the inner
    // Graph.connectedComponents call truly runs the distributed loop
    System.setProperty("graft.cc.uf.maxEdges", "-1")
    try {
      val loop = graft.ops.Graph.graphCc(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(loop === expected, "distributed CC loop census drifted from union-find")
    } finally {
      System.clearProperty("graft.graphcc.uf.maxEdges")
      System.clearProperty("graft.cc.uf.maxEdges")
    }
  }

  test("q_text_bpe_merge: pair census recomputes brute-force; round-1 merge winner is the top pair") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    // 'll' dominates by construction; 'Hello'/'hello' must pool after
    // lowercasing; the double space yields an empty token (dropped by the
    // len>=2 gate, like the 1-char word 'a')
    val texts = Seq(
      (1L, "Hello hello yellow fellow", "en", "s", 25L),
      (2L, "ball  bell a ill", "en", "s", 16L),
      (3L, "llll", "en", "s", 4L))
    texts.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp + "/documents.parquet")
    val got = graft.ops.LlmText.textBpeMerge(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val counts = texts.flatMap(_._2.toLowerCase.trim.split(" ", -1))
      .filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expect = counts.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(got === expect, "pair census drifted from driver brute force")
    assert(got.head._1 === "ll", "round-1 BPE merge winner must be 'll'")
    // 'll' count: hello×2 + yellow + fellow + ball + bell + ill + llll(3 overlapping) = 10
    assert(got.head._2 === 10L, "overlapping pairs must each count ('llll' has 3)")
  }
}
