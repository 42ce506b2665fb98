package graft.app

import org.apache.spark.sql.SparkSession

/** Plan inspection: prints the formatted physical plan of selected
  * SparkEntry queries — used to keep pushdown/broadcast/codegen honest
  * (PushedFilters reaching the parquet scan, BroadcastHashJoin on dims,
  * WholeStageCodegen spans over the column math).
  *
  * Usage: runMain graft.app.ExplainDump [sfDir] [query ...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "j5_multijoin_revenue", "s4_substring_search",
        "ann_brute_topk", "dedup_ngram_jaccard", "w2_topk_per_group",
        // kg_onehop: the pred filter must show as PartitionFilters on the
        // triples scan (pred is the partition column) + broadcast rehydrate
        "kg_onehop",
        // the optimizer-rewritten naive interval join: the SMJ keys must
        // include __graft_range_bucket (the rewrite fired) and no
        // BroadcastNestedLoop may appear
        "ev_range_join_sql_ts")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
