package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times plus the
  * north-star KG throughput and the north_rule scaling evidence.
  *
  * KG throughput is reported twice:
  *  - cold: first run in the JVM (codegen + dictionary fixed costs included);
  *  - warm: a second run of the full pipeline after `clearKg` dropped every
  *    cached stage — same work, JVM/codegen warm. This is the sustained
  *    number comparable with BASELINE.md.
  *
  * Scaling (north_rule: efficiency >= 0.8 from N to 4N executors): the same
  * kg job re-run in fresh Spark contexts at local[2] / local[8] / local[32],
  * reading a pre-written parquet corpus of >= 800k turns (driver-side fixture
  * generation excluded — it is serial and identical at every core count, so
  * including it would only dilute the signal; the corpus floor keeps parallel
  * work, not session fixed cost, dominant). efficiency(N->4N) =
  * tps(4N) / (4 * tps(N)). The host VM is linear only to ~8 threads
  * (~14.5 effective cores; pure-ALU ceiling 8->32 = 0.47 — BASELINE.md
  * "host envelope"), so 1->4 is the in-envelope pair and 8->32 is reported
  * against that ceiling.
  *
  * Query failures are NOT swallowed: they surface in an "errors" object and
  * on stderr (a broken query must never read as a fast success).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    def newSession(cores: String): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    val spark = newSession(cpus)

    def timedKg(s: SparkSession): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.kg(s, sfDir).triples.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    // north-star: KG pipeline end-to-end (mentions -> blocked scoring ->
    // decisions -> CC -> triples), materialized by the triples count
    val (nTriples, kgCold) = timedKg(spark)

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] query $name FAILED: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // warm second run: caches dropped, JVM/codegen hot => sustained tps
    SparkEntry.clearKg(spark, sfDir)
    val (_, kgWarm) = timedKg(spark)

    // scaling corpus: parquet-fed, >= 800k turns (see scaladoc); generated
    // once with the main session, reused byte-identically per core count
    val scaleSpec = graft.fixtures.Synth.Spec(
      nConv = math.max(SparkEntry.specFor(sfDir).nConv, 80000))
    val scalePath = s"/tmp/graft_bench_scale_${scaleSpec.nConv}"
    if (!new java.io.File(scalePath).exists()) {
      val dict = graft.fixtures.Synth.dictionary(scaleSpec)
      graft.pipeline.TranscriptSource.write(
        graft.pipeline.TranscriptSource.fromSeq(
          spark, graft.fixtures.Synth.transcripts(scaleSpec, dict)), scalePath)
    }
    spark.stop()

    // scaling pairs in fresh contexts (one JVM, sequential, exclusive);
    // 1->4 is the host's linear region (the pair that can evidence >= 0.8),
    // 8->32 is reported against the host's own 0.47 ALU ceiling. Fail-soft:
    // a broken scaling run must not cost the whole bench line.
    val scalingCores = Seq(1, 4, 8, 32)
    val scaling = scala.collection.mutable.LinkedHashMap[Int, Double]()
    scalingCores.foreach { c =>
      try {
        val s = newSession(c.toString)
        try {
          val turns = graft.pipeline.TranscriptSource.read(s, scalePath)
          val dict = graft.fixtures.Synth.dictionary(scaleSpec)
          val t0 = System.nanoTime()
          val n = graft.pipeline.KgPipeline
            .run(s, turns, dict, graft.core.GraftConfig.default).triples.count()
          scaling(c) = n / ((System.nanoTime() - t0) / 1e9)
        } finally s.stop()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scaling local[$c] FAILED: ${e.getMessage}")
        errors(s"scaling_local_$c") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    def eff(a: Int, b: Int): Double =
      if (scaling.contains(a) && scaling.contains(b)) scaling(b) / ((b / a) * scaling(a))
      else -1.0

    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jq(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jq(k) + ":" + jq(v) }.mkString("{", ",", "}")
    val scalingJson = scaling.map { case (c, t) => f""""local_$c":$t%.1f""" }.mkString("{", ",", "}")
    val total = kgCold + results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","n_errors":${errors.size},"errors":$errJson,"kg_triples":$nTriples,"kg_wall_cold_sec":$kgCold%.3f,"kg_wall_warm_sec":$kgWarm%.3f,"kg_triples_per_sec":${nTriples / kgWarm}%.1f,"kg_triples_per_sec_cold":${nTriples / kgCold}%.1f,"scaling_turns":${scaleSpec.nConv * scaleSpec.turnsPerConv},"scaling_tps":$scalingJson,"scaling_efficiency_1_4":${eff(1, 4)}%.3f,"scaling_efficiency_8_32":${eff(8, 32)}%.3f}""")
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed")
  }
}
