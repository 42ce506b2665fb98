package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.pipeline.{KgPipeline, TranscriptSource}

/** The beyond-broadcast tier, engaged NATURALLY: a dictionary far above
  * `broadcastSweepMaxDict` (default 10k) runs the blocked candidate join the
  * way a 100 TB deployment would — no GRAFT_SWEEP_MAX forcing — and is
  * refereed on the SAME input by the exact broadcast sweep (which is
  * spec-pinned bit-exact vs the brute-force oracle), raising the sweep cap
  * for the referee run only. Output: one JSON line with both walls,
  * throughputs, and the blocked tier's triple-level P/R vs exact.
  *
  * This answers the question the small-dictionary benches can't: does
  * blocking recall hold when the dictionary is 1000x the fixture — where the
  * type channel is join-capped out (7 types x thousands of members each >
  * blockJoinMaxDf, the effective type ceiling), alias surfaces collide
  * tens-deep, and the lex/join df caps actually bite?
  *
  * Usage: runMain graft.app.MegaDictBench [cores] [nConv] [nDictBase]
  */
object MegaDictBench {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(32)
    val nConv = args.lift(1).map(_.toInt).getOrElse(10000)
    val nDict = args.lift(2).map(_.toInt).getOrElse(30000)

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-megadict-$nDict")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // GRAFT_PROFILE=1: per-stage wall + task time (same listener as
    // ScalingBench) to attribute mega-dict cost to pipeline stages
    if (sys.env.get("GRAFT_PROFILE").contains("1")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
          System.err.println(f"[stage ${si.stageId}%4d] tasks=${si.numTasks}%4d wall=${wall / 1000.0}%7.2fs taskTime=${si.taskMetrics.executorRunTime / 1000.0}%8.2fs ${si.name.takeWhile(_ != '\n').take(70)}")
        }
      })
    }

    val dict = Synth.megaDictionary(nDict)
    val spec = Synth.Spec(nConv = nConv)
    val inputPath = s"/tmp/graft-megadict-$nConv-$nDict/transcripts"
    if (!new java.io.File(inputPath).exists()) {
      TranscriptSource.write(
        TranscriptSource.fromSeq(spark, Synth.transcripts(spec, dict)), inputPath)
    }
    val turns = TranscriptSource.read(spark, inputPath)
    val nTurns = turns.count() // warm FS cache, excluded from timing

    def timedRun(cfg: GraftConfig, sinkSuffix: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val out = KgPipeline.run(spark, turns, dict, cfg)
      val sink = s"/tmp/graft-megadict-$nConv-$nDict/triples-$sinkSuffix"
      graft.pipeline.TripleEmitter.write(out.triples, sink)
      val wall = (System.nanoTime() - t0) / 1e9
      val n = spark.read.parquet(sink).count()
      out.release()
      (n, wall)
    }

    // natural blocked tier: default cfg, dict >> broadcastSweepMaxDict
    require(dict.size > GraftConfig.default.broadcastSweepMaxDict,
      s"dictionary ${dict.size} does not exceed the sweep cap — not a mega-dict run")
    val (nBlocked, wBlocked) = timedRun(GraftConfig.default, "blocked")
    // referee: exact sweep on the same input (cap raised for this run only)
    val (nExact, wExact) =
      timedRun(GraftConfig.default.copy(broadcastSweepMaxDict = dict.size + 1L), "exact")

    val b = spark.read.parquet(s"/tmp/graft-megadict-$nConv-$nDict/triples-blocked")
      .select("subj", "pred", "obj").distinct()
    val e = spark.read.parquet(s"/tmp/graft-megadict-$nConv-$nDict/triples-exact")
      .select("subj", "pred", "obj").distinct()
    val hits = b.join(e, Seq("subj", "pred", "obj")).count()
    val nB = b.count()
    val nE = e.count()
    val p = hits.toDouble / math.max(nB, 1L)
    val r = hits.toDouble / math.max(nE, 1L)

    println(f"""{"bench":"kg_megadict","cores":$cores,"dict_entities":${dict.size},"turns":$nTurns,"blocked":{"triples":$nBlocked,"wall_sec":$wBlocked%.2f,"triples_per_sec":${nBlocked / wBlocked}%.1f},"exact_sweep":{"triples":$nExact,"wall_sec":$wExact%.2f,"triples_per_sec":${nExact / wExact}%.1f},"triple_precision":$p%.6f,"triple_recall":$r%.6f}""")
    spark.stop()
  }
}
