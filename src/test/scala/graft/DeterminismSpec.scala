package graft

/** SURVEY.md §5.4 — the determinism audit: every declared contract query is
  * executed twice at sf0.001 and must be value-identical with itself
  * including row order (guards rules R1–R5 mechanically: a nondeterministic
  * sort or float reduction shows up here before the driver's hash compare).
  * Also asserts every oracleSql key refers to a declared query. */
class DeterminismSpec extends SparkTestBase {
  private val dir = sf("sf0.001")

  test("oracleSql keys ⊆ queries keys; flagship entry returns rows") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"determinism: $name is self-identical across two runs") {
      val a = fn(spark, dir).collect()
      val b = fn(spark, dir).collect()
      assert(a.length === b.length, s"$name row count differs")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra === rb, s"$name differs at row $i")
      }
    }
  }
}
