package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** The native AsOfJoinExec: semantics pinned on a literal example, plan
  * shape verified, and full equivalence against the composed window-rank
  * formulation (q_join_asof) on real data. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("literal example: latest at-or-before match; unmatched lefts drop") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 8L, "q_a"), (1L, 15L, "q_b"), (1L, 25L, "q_c"),
      (3L, 1L, "q_x"))
      .toDF("qk", "qt", "quote")
    val out = AsOf.join(spark, trades, quotes,
      trades("k"), trades("t"), quotes("qk"), quotes("qt"))
      .select($"trade", $"quote").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // t1@10 → q_a@8; t2@20 → q_b@15; t3 (key 2) has no quote → dropped
    assert(out === Set(("t1", "q_a"), ("t2", "q_b")))
  }

  test("physical plan uses AsOfJoinExec with one shuffle+sort per side") {
    val l = spark.range(10).select($"id".as("k"), ($"id" * 2).as("t"))
    val r = spark.range(10).select($"id".as("rk"), $"id".as("rt"))
    val df = AsOf.join(spark, l, r, l("k"), l("t"), r("rk"), r("rt"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfJoin"), plan) // SparkPlan nodeName strips "Exec"
    assert("Exchange".r.findAllIn(plan).size <= 2, s"at most one shuffle per side:\n$plan")
  }

  test("equivalent to the composed range-join + keep-latest-rank form") {
    val dir = sf("sf0.001")
    val e = graft.tables.Tables.events(spark, dir)
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
        unix_timestamp($"ts").as("p_t"))
    val signups = e.where($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"event_id".as("signup_id"),
        unix_timestamp($"ts").as("s_t"))
    val native = AsOf.join(spark, purchases, signups,
      purchases("user_id"), purchases("p_t"), signups("s_user"), signups("s_t"))
      .select($"user_id", $"purchase_id", $"signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val composed = graft.ops.Advanced.joinAsof(spark, dir)
      .select($"user_id", $"purchase_id", $"signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native === composed)
    assert(native.nonEmpty, "test data should produce at least one as-of match")
  }
}
