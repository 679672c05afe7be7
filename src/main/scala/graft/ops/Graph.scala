package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup family.
  *
  * [[connectedComponents]] is the pairs→clusters step shared by every
  * near-dup path (text jaccard, banded embeddings, minhash/simhash): any
  * pair relation clusters the same way, so the iteration lives here once
  * and `q_dedup_cluster` / library callers pass their own edges.
  */
object Graph {

  /** Connected components by iterative hash-min label propagation — the
    * GraphX/Pregel CC shape without a graph library: every vertex starts
    * labeled min(self, min neighbor) (round 1 fused into the seed), then
    * each round takes the min of its neighbors' labels, converging in
    * O(component diameter) rounds. Near-dup families are shallow, so
    * rounds stay single-digit at any corpus size.
    *
    * Scale: per round one shuffle join + one hash agg; no driver-side
    * graph state — the driver sees only the changed COUNT per round
    * (MLlib iteration contract). Labels are [[graft.tables.Layout
    * .materialize]]d per round to cut the growing lineage. Convergence is
    * detected from a `_chg` flag computed IN the label-update join (a
    * vertex changed iff a neighbor label undercut its own), so the check
    * is a count over the already-materialized round output — no extra
    * next⋈cur join, no extra shuffle.
    *
    * @param pairs two numeric columns naming an undirected edge each
    *              (column names are taken positionally)
    * @return (`vertex`, `component`) — component = min vertex id reachable;
    *         only vertices with ≥1 edge appear
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val Seq(ca, cb) = pairs.columns.toSeq.take(2).map(col)
    val adj = graft.tables.Layout.materialize(
      pairs.select(ca.as("src"), cb.as("dst"))
        .unionByName(pairs.select(cb.as("src"), ca.as("dst"))))
    var labels = adj.groupBy(col("src")).agg(min(col("dst")).as("_m"))
      .select(col("src").as("vertex"), least(col("src"), col("_m")).as("component"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val cur = graft.tables.Layout.materialize(labels)
      val nbrMin = adj.join(cur, adj("dst") === cur("vertex"))
        .groupBy(col("src")).agg(min(col("component")).as("_nbr"))
      val next = graft.tables.Layout.materialize(
        cur.join(nbrMin, cur("vertex") === nbrMin("src"), "left")
          .select(cur("vertex"),
            least(cur("component"), coalesce(col("_nbr"), cur("component"))).as("component"),
            (coalesce(col("_nbr"), cur("component")) < cur("component")).as("_chg")))
      changed = next.where(col("_chg")).count()
      labels = next.drop("_chg")
      rounds += 1
    }
    require(changed == 0, s"label propagation did not converge in $rounds rounds")
    labels
  }
}
