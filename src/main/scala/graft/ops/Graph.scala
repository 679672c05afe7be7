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

  /** Connected components in O(log diameter) rounds: iterative hash-min
    * label propagation with a pointer-jumping (path compression) step
    * fused into every round — the Shiloach-Vishkin shortcut expressed on
    * the label RELATION, no graph library.
    *
    * Each round has two halves:
    *   A. propagate: label(v) ← min(label(v), min over neighbors u of
    *      label(u)) — one edge⋈label join + hash agg, exactly the
    *      hash-min step. Alone this converges in O(diameter) rounds,
    *      which on a 100 TB corpus with templated-drift chains (daily
    *      boilerplate mutations chaining A~B~C without A~C) can be
    *      deep enough to matter.
    *   B. jump: label(v) ← label(label(v)) — one label⋈label self-join.
    *      Labels always name vertices that hold labels themselves (the
    *      seed takes minima over adjacent vertices and both steps only
    *      ever assign existing label values), so the inner self-join is
    *      total. Jumping halves every pointer chain, so A+B together
    *      converge in O(log diameter) rounds: `maxRounds = 25` now covers
    *      diameters past 2^25 rather than aborting at 25 hops, and the
    *      terminal `require` is a genuine safety net, not a scale cliff.
    *
    * Scale: per round two shuffle joins + one hash agg; no driver-side
    * graph state — the driver sees only the changed COUNT per half-round
    * (MLlib iteration contract). Labels are [[graft.tables.Layout
    * .materialize]]d per half-round to cut the growing lineage.
    * Convergence is detected from a `_chg` flag computed IN each updating
    * join (a label changed iff the incoming value undercut it), so the
    * check is a count over the already-materialized output — no extra
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
    var labels = graft.tables.Layout.materialize(
      adj.groupBy(col("src")).agg(min(col("dst")).as("_m"))
        .select(col("src").as("vertex"), least(col("src"), col("_m")).as("component")))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      // A. hash-min propagate one hop along edges
      val prop = graft.tables.Layout.materialize(
        labels.join(
          adj.join(labels, adj("dst") === labels("vertex"))
            .groupBy(adj("src")).agg(min(col("component")).as("_nbr")),
          labels("vertex") === col("src"), "left")
          .select(labels("vertex"),
            least(labels("component"), coalesce(col("_nbr"), labels("component"))).as("component"),
            (coalesce(col("_nbr"), labels("component")) < labels("component")).as("_chg")))
      // B. pointer jump through the label relation (label values are
      // vertices, so the inner self-join keeps every row). The propagate
      // half's change flag rides through the jump join, so ONE count per
      // round detects convergence of both halves — each count is a full
      // job, and on shallow graphs (2-3 rounds typical for near-dup
      // clusters) the driver round-trips are a visible share of the query.
      val byVertex = prop.select(col("vertex").as("_jv"), col("component").as("_jc"))
      val jumped = graft.tables.Layout.materialize(
        prop.join(byVertex, prop("component") === col("_jv"))
          .select(prop("vertex"), col("_jc").as("component"),
            (prop("_chg") || (col("_jc") < prop("component"))).as("_chg")))
      changed = jumped.where(col("_chg")).count()
      // round n's labels are fully copied into `jumped`, so round n-1's
      // pinned relations (prior labels + this round's propagate half) are
      // dead — release their block-storage before the next round so the
      // loop holds O(1) materialized relations, not O(rounds)
      graft.tables.Layout.unpersistMaterialized(labels)
      graft.tables.Layout.unpersistMaterialized(prop)
      labels = jumped.drop("_chg")
      rounds += 1
    }
    require(changed == 0, s"label propagation did not converge in $rounds rounds")
    graft.tables.Layout.unpersistMaterialized(adj)
    labels
  }
}
