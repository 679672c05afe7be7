package graft

import graft.functions.{HeavyHitters, MGBuf}

/** Misra-Gries guarantees against exact counts: presence of every true
  * heavy hitter, the n/(k+1) estimate envelope, and merge-tree
  * robustness — the properties that make map-side partials sound. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 32

  /** Exact token counts per lang over the sf0.001 documents. */
  private def exactCounts(): Map[String, Map[String, Long]] =
    graft.tables.Tables.documents(spark, sf("sf0.001"))
      .select($"lang", org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim($"text"), " ")).as("tok"))
      .as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap

  private def foldChunks(agg: HeavyHitters, toks: Seq[String], chunk: Int): MGBuf =
    toks.grouped(chunk).map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)

  test("every token above the n/(k+1) envelope is present; estimates inside [true - n/(k+1), true]") {
    val agg = new HeavyHitters(k, 5)
    for ((lang, counts) <- exactCounts()) {
      val toks = counts.toSeq.sortBy(_._1).flatMap { case (t, c) => Seq.fill(c.toInt)(t) }
      val n = toks.size.toLong
      val env = n / (k + 1L)
      val buf = foldChunks(agg, toks, 1000)
      for ((t, c) <- counts if c > env)
        assert(buf.items.contains(t), s"$lang: heavy hitter '$t' (count $c > $env) missing")
      for ((t, est) <- buf.items) {
        val truth = counts.getOrElse(t, 0L)
        assert(est <= truth && est >= truth - env,
          s"$lang: estimate $est for '$t' outside [${truth - env}, $truth]")
      }
    }
  }

  test("merge trees differ, guarantees hold: reversed chunk order keeps the envelope") {
    val agg = new HeavyHitters(k, 5)
    val (lang, counts) = exactCounts().maxBy(_._2.values.sum)
    val toks = counts.toSeq.sortBy(_._1).flatMap { case (t, c) => Seq.fill(c.toInt)(t) }
    val n = toks.size.toLong
    val env = n / (k + 1L)
    val rev = foldChunks(agg, toks.reverse, 700)
    for ((t, c) <- counts if c > env)
      assert(rev.items.contains(t), s"$lang reversed: heavy hitter '$t' missing")
    for ((t, est) <- rev.items)
      assert(est <= counts.getOrElse(t, 0L) && est >= counts.getOrElse(t, 0L) - env)
  }

  test("q_heavy_hitters: one summary row per language; top tokens are true heavy hitters") {
    val rows = SparkEntry.queries("q_heavy_hitters")(spark, sf("sf0.001")).collect()
    val exact = exactCounts()
    assert(rows.length === exact.size)
    for (r <- rows) {
      val lang = r.getString(0)
      val counts = exact(lang)
      val n = counts.values.sum
      val env = n / (k + 1L)
      val top = r.getString(1).split('\u001E').map(_.split('\u001F')(0))
      assert(top.nonEmpty)
      // every emitted top token's TRUE count clears the envelope's floor:
      // MG can only surface tokens whose estimate (≤ true count) survived
      for (t <- top)
        assert(counts.getOrElse(t, 0L) > 0L, s"$lang: emitted token '$t' never occurs")
      assert(r.getLong(2) === n, s"$lang token count")
    }
  }
}
