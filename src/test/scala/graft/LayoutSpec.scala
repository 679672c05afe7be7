package graft

import org.apache.spark.sql.functions._
import graft.tables.{Layout, Tables}

/** 100 TB layout posture: bucketed tables join without a shuffle, salted
  * aggregation matches the direct result. Plan-level assertions — this is
  * the "would it hold at 1000×" evidence, not a row-count check. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed co-located join plans with no shuffle Exchange") {
    val dir = sf("sf0.001")
    Layout.writeBucketed(Tables.lineitem(spark, dir), "g_lineitem_b", "l_orderkey", 8)
    Layout.writeBucketed(Tables.orders(spark, dir), "g_orders_b", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.bucketedJoin(spark, "g_orders_b", "g_lineitem_b",
        "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
      // and it still computes the right thing
      val direct = Tables.orders(spark, dir).join(Tables.lineitem(spark, dir),
        $"o_orderkey" === $"l_orderkey").count()
      assert(joined.count() === direct)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("unbucketed version of the same join DOES shuffle (control)") {
    val dir = sf("sf0.001")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Tables.orders(spark, dir).join(Tables.lineitem(spark, dir),
        $"o_orderkey" === $"l_orderkey").queryExecution.executedPlan.toString()
      assert(plan.contains("Exchange"), "control: plain join should shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted aggregation equals direct aggregation (exact types)") {
    // skewed frame: one hot key with 10k rows, long values (exact sums)
    val hot = spark.range(0, 10000).select(lit("hot").as("k"), $"id".as("v"))
    val cold = spark.range(0, 100).select(concat(lit("c"), $"id").as("k"), $"id".as("v"))
    val df = hot.unionByName(cold)
    val salted = Layout.saltedSum(df, "k", "v", salts = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = df.groupBy($"k").agg(sum($"v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
    assert(salted("hot") === (0L until 10000L).sum)
  }

  test("salted join equals plain join, spreads the hot key over salts") {
    // fact: one hot key (5k rows) + a cold tail; dim: 50 keys
    val fact = spark.range(0, 5000).select(lit(7L).as("fk"), $"id".as("v"))
      .unionByName(spark.range(0, 200).select(($"id" % 50).as("fk"), $"id".as("v")))
    val dim = spark.range(0, 50).select($"id".as("dk"), concat(lit("d"), $"id").as("name"))
    val salted = Layout.saltedJoin(fact, dim, "fk", "dk", salts = 8)
      .select($"fk", $"v", $"name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = fact.join(dim, $"fk" === $"dk")
      .select($"fk", $"v", $"name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(salted.count(_._1 == 7L) === 5000)
  }

  test("materialize: same rows, lineage cut to a scanned relation (the persisted-table seam)") {
    // Layout.materialize is the single seam where the local eager
    // localCheckpoint stands in for the persisted intermediate a cluster
    // run would use — consumers must see identical rows and a plan that
    // SCANS the materialized relation instead of recomputing the producer.
    val src = spark.range(0, 100).select($"id", ($"id" * 2).as("v"))
    val mat = Layout.materialize(src)
    assert(mat.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === src.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val plan = mat.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("Scan"),
      s"materialize did not cut lineage: $plan")
  }

  test("materialize: reliable mode checkpoints to the configured dir and survives conf reset") {
    // the opt-in cluster mode: spark.graft.materialize.mode=reliable routes
    // the same seam through a reliable checkpoint (HDFS/object store on a
    // real cluster) so the CC loop's truncated lineage survives executor
    // loss. Same rows, same lineage-cut contract as local mode.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.materialize.mode", "reliable")
    try {
      val src = spark.range(0, 100).select($"id", ($"id" * 3).as("v"))
      val mat = Layout.materialize(src)
      assert(mat.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        === src.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      val plan = mat.queryExecution.executedPlan.toString
      assert(plan.contains("ExistingRDD") || plan.contains("Scan"),
        s"reliable materialize did not cut lineage: $plan")
      // the checkpoint physically landed in the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset("spark.graft.materialize.mode")
  }

  test("salted join resolves same-name join keys unambiguously") {
    val fact = spark.range(0, 100).select(($"id" % 10).as("k"), $"id".as("v"))
    val dim = spark.range(0, 10).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    val salted = Layout.saltedJoin(fact, dim, "k", "k", salts = 4)
      .select($"v", $"name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = fact.join(dim, fact("k") === dim("k"))
      .select($"v", $"name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
  }

  test("standing(): second call serves the persisted copy; cached == fresh build row-identically") {
    var builds = 0
    def build() = { builds += 1; spark.range(0, 1000).select($"id", ($"id" * 3).as("v")) }
    val name = s"layoutspec_${System.nanoTime()}"
    val first = Layout.standing(spark, name, build()).collect().map(_.toString).sorted
    val second = Layout.standing(spark, name, build()).collect().map(_.toString).sorted
    assert(builds === 1, "standing() rebuilt on the second call — cache not serving")
    assert(first.toSeq === second.toSeq, "cached read diverged from the build")
    // the graph standing tables: cached copurchase edges == a fresh derivation
    val dir = sf("sf0.001")
    val standingEdges = graft.ops.Graph.copurchaseEdges(spark, dir)
      .as[(Long, Long)].collect().toSet
    val fresh = {
      val li = graft.tables.Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
      li.groupBy(_._1).values.flatMap { b =>
        val ps = b.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }.toSeq.groupBy(identity).filter(_._2.size >= 2).keySet
    }
    assert(standingEdges === fresh, "standing co-purchase edges != fresh brute-force derivation")
  }

  test("r12 standing text/vector indexes: cached copy == fresh in-query derivation, row-identically") {
    val dir = sf("sf0.001")
    // shingle table vs a direct (uncached) rebuild of the same expression
    val fresh = graft.tables.Tables.documents(spark, dir)
      .select($"doc_id",
        graft.functions.TextSketchFunctions.shingle_hashes($"text", 3).as("sh_arr"))
      .where(size($"sh_arr") > 0)
      .select($"doc_id", size($"sh_arr").cast("long").as("n_sh"), $"sh_arr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    val standing = graft.ops.LlmText.standingDocShingles(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    assert(standing === fresh, "standing shingle table != fresh derivation")
    // pair graph vs the full-price contract query (same rows, different sort)
    val freshPairs = graft.ops.LlmText.dedupNgramJaccard(spark, dir)
      .collect().map(_.toString).toSet
    val standingPairs = graft.ops.LlmText.standingJaccardPairs(spark, dir)
      .collect().map(_.toString).toSet
    assert(standingPairs === freshPairs, "standing jaccard pair graph != contract query rows")
    // embed pair graph vs the banded contract query
    val freshEmb = graft.ops.LlmVector.dedupEmbedBanded(spark, dir)
      .collect().map(_.toString).toSet
    val standingEmb = graft.ops.LlmVector.standingEmbedPairs(spark, dir)
      .collect().map(_.toString).toSet
    assert(standingEmb === freshEmb, "standing embed pair graph != contract query rows")
    // gram postings vs the decontaminate-side derivation: bloom output ==
    // plain decontaminate output (exactness through the standing postings)
    val plain = graft.ops.LlmText.decontaminate(spark, dir)
      .collect().map(_.toString).toSeq
    val bloom = graft.ops.LlmText.decontaminateBloom(spark, dir)
      .collect().map(_.toString).toSeq
    assert(bloom === plain, "standing-postings bloom decontamination != full-price decontaminate")
  }

  test("r13 standing ANN artifacts: cached copy == fresh derivation, row-identically") {
    val dir = sf("sf0.001")
    val m = 8; val sub = 8; val k = 16
    // plain-PQ encoded corpus: standing table vs a fresh (uncached)
    // re-encode of the normalized corpus under the standing books
    val books = graft.ops.LlmVector.pqBooks(spark, dir, m, sub, k)
    val standingCodes = graft.ops.LlmVector.pqCodes(spark, dir, m, sub, k)
      .collect().map(_.toString).toSet
    val codeCols = (0 until m).map { si =>
      graft.functions.CentroidFunctions
        .nearest_centroid(slice($"embedding", si * sub + 1, sub), books(si)).as(s"c$si")
    }
    val freshCodes = graft.ops.LlmVector.ivfPqNorm(spark, dir)
      .select(($"vec_id" +: $"embedding" +: codeCols): _*)
      .collect().map(_.toString).toSet
    assert(standingCodes === freshCodes, "standing PQ codes != fresh encode")
    // IVF-incremental day-0 state: frozen quantizer == a fresh Lloyd run on
    // the base corpus; standing base invlists == a fresh assignment under it
    val e = Tables.embeddings(spark, dir)
    val maxId = e.agg(max($"vec_id")).head().getLong(0)
    val cut = maxId - (maxId + 9L) / 10L
    val cents = graft.ops.LlmVector.ivfIncCents(spark, dir, cut)
    val freshCents = graft.ops.LlmVector.kmeansCentroids(
      e.where($"vec_id" <= cut), k = 16, iters = 2)
    assert(cents === freshCents, "standing frozen quantizer != fresh training")
    val standingBase = graft.ops.LlmVector.ivfIncBase(spark, dir, cut, cents)
      .collect().map(_.toString).toSet
    val freshBase = e.where($"vec_id" <= cut).select($"vec_id", $"embedding",
      graft.functions.CentroidFunctions.nearest_centroid($"embedding", cents).as("cent_id"))
      .collect().map(_.toString).toSet
    assert(standingBase === freshBase, "standing IVF base invlists != fresh assignment")
  }
}
