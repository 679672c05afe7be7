package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative contract queries so
  * scale-critical properties can be audited: parquet PushedFilters /
  * ReadSchema pruning, broadcast vs shuffle join selection, partial+final
  * aggregation, TakeOrderedAndProject, WholeStageCodegen spans.
  * Usage: tools/run.sh graft.ExplainAudit [sfDir] [queryKey…]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_filter", "q_agg_group", "q_join_broadcast", "q_join_inner",
        "q_scan_parquet", "q_sim_cosine_topk", "q_tumble_window",
        "q_topk_agg", "q_agg_salted", "q_dedup_ngram_jaccard")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n======== $k ========")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
