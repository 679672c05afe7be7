package graft

import graft.ops.LlmVector

/** Invariants for the rows-only q_embed_pca contract (an eigensolve has no
  * SQL oracle): component geometry, variance optimality, centering, and
  * run-to-run determinism — asserted on the real sf0.001 embeddings. */
class PcaSpec extends SparkTestBase {
  import spark.implicits._
  private val dir = sf("sf0.001")

  private lazy val projected =
    LlmVector.embedPca(spark, dir).as[(Long, Double, Double)].collect()

  test("q_embed_pca: one projection row per vector, total order on vec_id") {
    val n = graft.tables.Tables.embeddings(spark, dir).count()
    assert(projected.length.toLong === n)
    assert(projected.map(_._1).toSeq === projected.map(_._1).sorted.toSeq)
  }

  test("q_embed_pca: projections are centered and PC1 dominates PC2 and every axis") {
    val n = projected.length.toDouble
    val m1 = projected.map(_._2).sum / n
    val m2 = projected.map(_._3).sum / n
    // projection of centered data: means vanish up to the 4dp output rounding
    assert(math.abs(m1) < 1e-3, s"pc1 mean $m1 not centered")
    assert(math.abs(m2) < 1e-3, s"pc2 mean $m2 not centered")
    val v1 = projected.map(r => (r._2 - m1) * (r._2 - m1)).sum / n
    val v2 = projected.map(r => (r._3 - m2) * (r._3 - m2)).sum / n
    assert(v1 >= v2 - 1e-9, s"Var(pc1)=$v1 < Var(pc2)=$v2")
    // PCA optimality over the axis basis: PC1 captures at least as much
    // variance as any single raw coordinate
    val e = graft.tables.Tables.embeddings(spark, dir)
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS x").as[Seq[Double]].collect()
    val axisVar = (0 until 64).map { i =>
      val xs = e.map(_(i)); val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / n
    }.max
    assert(v1 >= axisVar - 1e-6,
      s"Var(pc1)=$v1 below best axis variance $axisVar — not a principal direction")
  }

  test("q_embed_pca: deterministic across runs (quantized training sums)") {
    val again = LlmVector.embedPca(spark, dir).as[(Long, Double, Double)].collect()
    assert(projected.toSeq === again.toSeq)
  }
}
