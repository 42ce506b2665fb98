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
    println("spark.sql.extensions injection OK")
    spark.stop()
  }
}
