package graft.app

import org.apache.spark.sql.SparkSession

/** Proves the spark.sql.extensions injection path (the way a cluster job
  * would load the Graft SQL functions at submit time, as opposed to the
  * in-process GraftFunctions.register the specs use). Must run in a fresh
  * JVM — extensions only apply at session construction. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      "SELECT graft_token_sort_ratio('new york mets', 'mets new york') AS tsr, " +
        "graft_lev_ratio('kitten', 'sitting') AS lr").head()
    println(f"graft_token_sort_ratio=${row.getDouble(0)}%.4f graft_lev_ratio=${row.getDouble(1)}%.4f")
    assert(row.getDouble(0) == 1.0 && math.abs(row.getDouble(1) - (1.0 - 3.0 / 7.0)) < 1e-15)

    // the injected OPTIMIZER rule path: injectOptimizerRule places
    // RangeJoinRewrite inside the operator-optimization fixpoint (a
    // different batch than the register() path the specs pin), so the
    // firing + semantics are asserted HERE, in the injected environment —
    // a naive interval join must carry the bucket keys and return the
    // exact brute-force pair count
    spark.sql("SELECT * FROM VALUES (1, 1, 100L), (2, 1, 150L), (3, 1, 9999L) " +
      "AS t(event_id, user_id, tus)").createOrReplaceTempView("ext_clicks")
    spark.sql("SELECT * FROM VALUES (1, 90L, 1.0), (1, 160L, 2.0), (1, 5000L, 3.0) " +
      "AS t(user_id, tus, value)").createOrReplaceTempView("ext_views")
    val joined = spark.sql(
      """SELECT c.event_id, v.tus FROM ext_clicks c JOIN ext_views v
        |  ON c.user_id = v.user_id
        | AND v.tus >= c.tus - 100 AND v.tus <= c.tus""".stripMargin)
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains(graft.plans.RangeJoinRewrite.bucketName),
      s"injected RangeJoinRewrite did not fire:\n$plan")
    // brute pairs: click100 matches view90; click150 matches view90+view160? 160>150 no -> view90 only
    // (150-100=50 <= 90 <= 150 yes); click9999 matches nothing in [9899, 9999]
    val got = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((1, 90L), (2, 90L)), got.toString)
    println("spark.sql.extensions injection OK (functions + optimizer rule)")
    spark.stop()
  }
}
