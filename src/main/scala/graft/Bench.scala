package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times plus the
  * north-star KG throughput (triples/sec end-to-end, timed as its own
  * first measurement before the per-query loop warms any caches). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // north-star: KG pipeline end-to-end (mentions -> blocked scoring ->
    // decisions -> CC -> triples), materialized by the triples count
    val tKg0 = System.nanoTime()
    val nTriples = SparkEntry.kg(spark, sfDir).triples.count()
    val kgWall = (System.nanoTime() - tKg0) / 1e9

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = kgWall + results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","kg_triples":$nTriples,"kg_wall_sec":$kgWall%.3f,"kg_triples_per_sec":${nTriples / kgWall}%.1f}""")
    spark.stop()
  }
}
