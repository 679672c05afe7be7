package graft

import org.apache.spark.sql.functions._
import graft.functions.CentroidFunctions
import graft.ops.LlmVector

/** The LSH-banded embedding near-dup path (q_dedup_embed_banded) against
  * its exact brute-force twin (q_dedup_embed_cosine), plus the
  * HyperplaneSignature kernel vs the interpreted HOF chain it replaced.
  * Everything here is deterministic: fixed data, fixed seeded planes. */
class VectorDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("hyperplane_sig kernel is bit-identical to the zip_with/aggregate HOF formulation") {
    val rnd = new scala.util.Random(42)
    val planes = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    // the exact pre-round-5 q_sim_lsh_bucket formulation (interpreted HOFs)
    val hofBucket = planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with($"embedding", typedlit(p), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val cmp = graft.tables.Tables.embeddings(spark, sf("sf0.01"))
      .select($"vec_id",
        CentroidFunctions.hyperplane_sig($"embedding", planes).as("kernel"),
        hofBucket.as("hof"))
    assert(cmp.count() > 0)
    val diff = cmp.where($"kernel" =!= $"hof").count()
    assert(diff === 0L, "kernel signature shifted vs the HOF formulation — rows-only contract broken")
  }

  test("q_dedup_embed_banded: precision exactly 1 vs the exact twin; recall measured") {
    val dir = sf("sf0.01")
    val exact = LlmVector.dedupEmbedCosine(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val banded = LlmVector.dedupEmbedBanded(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "no qualifying pairs at sf0.01 — test data changed?")
    // precision == 1: every banded pair is re-verified with the same codegen
    // cosine + threshold, so banded ⊆ exact must hold exactly
    assert(banded.subsetOf(exact), s"banded emitted non-qualifying pairs: ${banded -- exact}")
    // recall: deterministic on this fixed data + seeded planes (measured
    // 12/14 = 0.857). Theoretical per-pair detection at cos = 0.45 is
    // 1-(1-p^4)^12 ≈ 0.90 with p = 1-acos(0.45)/π ≈ 0.649; the floor below
    // is slack for the tiny (14-pair) population — it guards against the
    // banding silently degrading, not against LSH being approximate
    // (which is the point).
    val recall = banded.size.toDouble / exact.size
    info(f"banded recall = $recall%.3f (${banded.size}/${exact.size})")
    assert(recall >= 0.7, f"recall $recall%.3f collapsed — banding layout broken?")
  }

  test("q_dedup_embed_banded_prod: planted corpus straddles 0.85; precision 1; recall >= 0.8 " +
      "(r15 — the production-threshold posture clearing the 0.45 rows' weak mark)") {
    val dir = sf("sf0.01")
    val exact = LlmVector.prodExactPairs(spark, dir)
      .select($"vec_a", $"vec_b", $"cos").as[(Long, Long, Double)].collect()
    val exactPairs = exact.map(r => (r._1, r._2)).toSet
    // the planted population must be non-vacuous AND straddle the threshold:
    // some degraded copies fall below 0.85 (the k=16 quarter), so the exact
    // twin must be strictly smaller than the plant count
    val nVecs = graft.tables.Tables.embeddings(spark, dir).count()
    assert(exactPairs.nonEmpty, "planted corpus produced no 0.85-pairs — plant broken?")
    assert(exactPairs.size < nVecs,
      "every planted copy qualified — the population no longer straddles the threshold")
    // planted pairs dominate: accidental (non-planted) qualifying pairs ~ 0
    val planted = exactPairs.count { case (a, b) => b - a == 1000000000L }
    assert(planted.toDouble / exactPairs.size >= 0.99,
      s"unexpected accidental 0.85-pairs: ${exactPairs.size - planted}")
    val banded = LlmVector.dedupEmbedBandedProd(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(exactPairs),
      s"banded emitted non-qualifying pairs: ${(banded -- exactPairs).take(5)}")
    val recall = banded.size.toDouble / exactPairs.size
    info(f"prod banded recall = $recall%.3f (${banded.size}/${exactPairs.size})")
    // deterministic on fixed data + seeded planes (measured 0.965 at sf0.01);
    // the 0.8 floor matches the Invariants bound
    assert(recall >= 0.8, f"recall $recall%.3f collapsed — prod banding layout broken?")
  }

  test("Graph.connectedComponents clusters the banded embedding pairs (shared CC primitive)") {
    val pairs = LlmVector.dedupEmbedBanded(spark, sf("sf0.01")).select("vec_a", "vec_b")
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(edges.nonEmpty)
    val got = graft.ops.Graph.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // reference union-find over the collected (tiny) edge list
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical min-id per component
    val minOf = verts.groupBy(find).map { case (r, vs) => r -> vs.min }
    val expected = verts.map(v => v -> minOf(find(v))).toMap
    assert(got === expected)
  }

  test("q_dedup_embed_cluster: banded clusters refine the exact clusters; medoid is the max-centrality member; deterministic") {
    val dir = sf("sf0.01")
    val out = LlmVector.dedupEmbedCluster(spark, dir).collect()
    assume(out.nonEmpty)
    // 1. refinement: banded pairs ⊆ exact pairs (precision 1), so no banded
    //    cluster may contain two vecs the exact-threshold graph separates
    val exactEdges = LlmVector.dedupEmbedCosine(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    exactEdges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb }
    out.foreach { r =>
      val members = r.getAs[String]("members").split("/").map(_.toLong)
      val roots = members.map(find).distinct
      assert(roots.length == 1,
        s"banded cluster ${r.getAs[Long]("cluster_id")} merges exact components: ${members.mkString(",")}")
      assert(members.contains(r.getAs[Long]("canonical_vec")), "medoid not a member")
      assert(r.getAs[Long]("n_vecs") == members.length)
    }
    // 2. medoid = argmax of quantized centrality (tie → min vec_id),
    //    recomputed scala-side from the banded pair list
    val pw = LlmVector.dedupEmbedBanded(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        math.round(r.getAs[Double]("cos") * 10000.0)))
    val cent = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pw.foreach { case (a, b, q) => cent(a) += q; cent(b) += q }
    out.foreach { r =>
      val members = r.getAs[String]("members").split("/").map(_.toLong)
      val best = members.minBy(v => (-cent(v), v))
      assert(r.getAs[Long]("canonical_vec") == best,
        s"cluster ${r.getAs[Long]("cluster_id")}: medoid ${r.getAs[Long]("canonical_vec")} != expected $best")
    }
    // 3. deterministic: a second full run is row-identical
    val again = LlmVector.dedupEmbedCluster(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq, "run-to-run drift")
  }

  test("Graph.connectedComponents: chain + seeded random graphs vs union-find (multi-round convergence)") {
    import spark.implicits._
    // a 10-vertex chain needs ~9 propagate-only rounds; the 100-vertex path
    // (diameter 99) would abort a pure hash-min loop at maxRounds=25 — it
    // passes only because pointer jumping makes rounds O(log diameter)
    val chain = (0L until 9L).map(i => (i, i + 1))
    val longPath = (0L until 99L).map(i => (i, i + 1))
    val rnd = new scala.util.Random(7)
    val cases = Seq(chain, longPath) ++ (1 to 4).map { _ =>
      val n = 2 + rnd.nextInt(14)
      (0 until (1 + rnd.nextInt(20)))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
    }.filter(_.nonEmpty)
    cases.foreach { edges =>
      // default path (r16: the driver union-find fast path below the cap)
      val got = graft.ops.Graph.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      // forced DISTRIBUTED loop — the cap at -1 disables the fast path, so
      // the O(log d) propagate+jump iteration keeps real coverage and must
      // be bit-identical to the fast path (both appear here vs the
      // reference union-find)
      System.setProperty("graft.cc.uf.maxEdges", "-1")
      val gotLoop = try {
        graft.ops.Graph.connectedComponents(edges.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
      } finally System.clearProperty("graft.cc.uf.maxEdges")
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val minOf = verts.groupBy(find).map { case (r, vs) => r -> vs.min }
      val want = verts.map(v => v -> minOf(find(v))).toMap
      assert(got === want, s"fast path drifted: edges=$edges")
      assert(gotLoop === want, s"distributed loop drifted: edges=$edges")
    }
  }
}
