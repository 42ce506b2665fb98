package graft

import org.apache.spark.sql.SparkSession

/** Measurement-only harness for optimization work (guide §1) — SEPARATE from
  * the frozen driver contract in Bench.scala, which it never touches.
  *
  * For each named query (or all of them):
  *  - times `repeats` noop-sink materializations (guide §1.4: every column of
  *    every row computed, no sink cost, no count-prune) with the job labelled
  *    (§1.5);
  *  - optionally dumps .explain("formatted") to $SPARK_GRAFT_PLAN_DIR.
  *
  * Shared per-session memos (shingle sets, LSH pairs, IVF index, kg run) are
  * built by whichever query touches them first — run 1 is "cold within this
  * session", later runs isolate the query's own plan. Prints one JSON line
  * per query: {"q": name, "runs": [sec, ...]}.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *        runjava graft.BenchExtra [repeats] [query ...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val repeats = args.headOption.map(_.toInt).getOrElse(2)
    val wanted = args.drop(1).toSet

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    planDir.foreach(d => new java.io.File(d).mkdirs())

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    qs.foreach { case (name, fn) =>
      val runs = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"$name run $i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      planDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/$name.txt"), plan)
      }
      println(s"""{"q":"$name","runs":[${runs.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
