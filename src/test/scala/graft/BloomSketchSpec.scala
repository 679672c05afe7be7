package graft

import graft.functions.Bloom

/** Bloom membership-sketch invariants: the no-false-negative guarantee, the
  * fpp envelope, set-function determinism of the OR algebra (mirror of
  * HllSketchSpec), and the q_membership_sketch ledger query's estimates. */
class BloomSketchSpec extends SparkTestBase {

  private val (mBits, k) = Bloom.params(expectedItems = 2048, fpp = 0.01)

  private def fold(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(new Array[Long](mBits / 64))((w, x) => Bloom.insert(w, x, k))

  test("no false negatives ever; false-positive rate within 3x the sized fpp") {
    val members = (1L to 2000L).map(i => i * 2654435761L)
    val words = fold(members)
    members.foreach(x =>
      assert(Bloom.contains(words, x, k), s"false negative for $x"))
    val nonMembers = (1L to 20000L).map(i => -i * 40503L - 7L)
    val fp = nonMembers.count(Bloom.contains(words, _, k))
    val rate = fp.toDouble / nonMembers.size
    info(f"fp rate = $rate%.4f (sized for 0.01 at n=2048, filled n=2000)")
    assert(rate <= 0.03, f"fp rate $rate%.4f blew the envelope")
  }

  test("bit array is a pure function of the input SET: order, chunking, duplication irrelevant") {
    val xs = (1L to 5000L).map(i => i * 2654435761L % 100000L)
    val a = fold(xs)
    val b = fold(xs.reverse)
    val chunked = xs.grouped(613).map(fold).reduce(Bloom.or)
    val duplicated = Bloom.or(fold(xs ++ xs), a)
    for (other <- Seq(b, chunked, duplicated))
      assert(java.util.Arrays.equals(a, other), "OR algebra not set-deterministic")
    // serialization round-trips bitwise
    assert(java.util.Arrays.equals(a, Bloom.fromBytes(Bloom.toBytes(a))))
  }

  test("q_membership_sketch: per-scope estimates inside a 15% envelope; global = OR of leaves") {
    val rows = SparkEntry.queries("q_membership_sketch")(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (est, exact) = (r.getAs[Long]("est_uv"), r.getAs[Long]("exact_uv"))
      assert(math.abs(est - exact) <= math.max(2L, (0.15 * exact).toLong),
        s"${r.getAs[String]("scope")}: estimate $est vs exact $exact out of envelope")
    }
    val scopes = rows.map(_.getAs[String]("scope"))
    assert(scopes.contains("<all>"), "global ledger row missing")
    // the global fill can never be below any single leaf's fill (OR grows)
    val all = rows.find(_.getAs[String]("scope") == "<all>").get.getAs[Long]("bits_set")
    rows.filterNot(_.getAs[String]("scope") == "<all>").foreach { r =>
      assert(r.getAs[Long]("bits_set") <= all, "a leaf outgrew the OR of all leaves")
    }
    // deterministic rows-only contract: a second run is row-identical
    val again = SparkEntry.queries("q_membership_sketch")(spark, sf("sf0.001")).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq, "run-to-run drift")
  }

  test("probe expression agrees with the aggregator's bits end-to-end (the prefilter contract)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val build = (1L to 500L).map(i => i * 7919L).toDF("key")
    val probeHit = (1L to 500L).map(i => i * 7919L).toDF("key")
    val kept = graft.tables.Layout
      .bloomPrefilter(probeHit, build, "key", expectedItems = 512, fpp = 0.01)
      .count()
    assert(kept == 500L, s"prefilter dropped members: kept $kept/500 (false negative!)")
  }
}
