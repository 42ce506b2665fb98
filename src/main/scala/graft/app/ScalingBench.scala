package graft.app

import org.apache.spark.sql.SparkSession
import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.pipeline.{KgPipeline, TranscriptSource, TripleEmitter}

/** Scaling-efficiency evidence for the north_rule criterion (throughput
  * efficiency >= 0.8 from N to 4N executors): runs the SAME end-to-end KG
  * job — parquet transcripts in, pred-partitioned parquet triples out — at a
  * given core count, printing one JSON line with wall time and triples/sec.
  *
  * The sandbox has no multi-executor cluster, so N vs 4N executors is
  * evidenced as local[N] vs local[4N] on the same input (per task
  * instructions). Input generation and write are excluded from the timed
  * window; the timed window is exactly the pipeline DAG: mention detection,
  * blocking join, fused scoring, decisions, connected components, triple
  * emission, and the partitioned sink write.
  *
  * Usage: runMain graft.app.ScalingBench [cores] [nConv] [inputDir?]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(32)
    val nConv = args.lift(1).map(_.toInt).getOrElse(5000)
    val workDir = args.lift(2).getOrElse(s"/tmp/graft-scaling-$nConv")

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional stage-level profile (GRAFT_PROFILE=1): wall + summed task
    // time per stage, to find serial bottlenecks and skew
    if (sys.env.get("GRAFT_PROFILE").contains("1")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
          System.err.println(f"[stage ${si.stageId}%4d] tasks=${si.numTasks}%4d wall=${wall / 1000.0}%7.2fs taskTime=${si.taskMetrics.executorRunTime / 1000.0}%8.2fs gc=${si.taskMetrics.jvmGCTime / 1000.0}%6.2fs ${si.name.takeWhile(_ != '\n').take(80)}")
        }
      })
    }

    // GRAFT_EMB_DIM overrides the embedding dimension (1024 = reference
    // parity, settings.py:106) to quantify the dim-scaling cost;
    // GRAFT_SWEEP_MAX=0 forces the blocked-join tier (the beyond-broadcast
    // mega-dict scale path) so its throughput is benchable at volume
    val cfg = GraftConfig.default.copy(
      embeddingDim = sys.env.get("GRAFT_EMB_DIM").map(_.toInt).getOrElse(64),
      broadcastSweepMaxDict = sys.env.get("GRAFT_SWEEP_MAX").map(_.toLong).getOrElse(10000L))
    val spec = Synth.Spec(nConv = nConv)
    // GRAFT_CORPUS=zh: the unsegmented zh/en mixed corpus — per-character
    // Han tokenization multiplies detection positions per byte, so zh
    // throughput is its own number, not derivable from the Latin row
    val zhCorpus = sys.env.get("GRAFT_CORPUS").contains("zh")
    val dict = if (zhCorpus) Synth.zhDictionary(spec) else Synth.dictionary(spec)

    // input corpus: generate once per nConv, reuse across core counts so
    // both measurements read the identical parquet bytes
    val inputPath = if (zhCorpus) s"$workDir/transcripts-zh" else s"$workDir/transcripts"
    if (!new java.io.File(inputPath).exists()) {
      val seq = if (zhCorpus) Synth.zhTranscripts(spec, dict) else Synth.transcripts(spec, dict)
      TranscriptSource.write(TranscriptSource.fromSeq(spark, seq), inputPath)
    }
    val turns = TranscriptSource.read(spark, inputPath)
    val nTurns = turns.count() // warm FS cache; excluded from timing

    def timed[T](f: => T): (T, Double) = {
      val t = System.nanoTime(); val r = f; (r, (System.nanoTime() - t) / 1e9)
    }

    val t0 = System.nanoTime()
    val out = KgPipeline.run(spark, turns, dict, cfg)
    // stage boundaries materialized so the per-stage split is visible
    val (_, tMentions) = timed(out.mentions.persist().count())
    val (_, tDecisions) = timed(out.decisions.persist().count())
    val (_, tComponents) = timed(out.components.persist().count())
    val (_, tWrite) = timed(TripleEmitter.write(out.triples, s"$workDir/triples-$cores"))
    val wall = (System.nanoTime() - t0) / 1e9
    val nTriples = spark.read.parquet(s"$workDir/triples-$cores").count()

    val corpusTag = if (zhCorpus) "zh" else "latin"
    println(f"""{"bench":"kg_scaling","corpus":"$corpusTag","cores":$cores,"conversations":$nConv,"turns":$nTurns,"triples":$nTriples,"wall_sec":$wall%.2f,"triples_per_sec":${nTriples / wall}%.1f,"turns_per_sec":${nTurns / wall}%.1f,"stage_sec":{"mentions":$tMentions%.2f,"score_decide":$tDecisions%.2f,"components":$tComponents%.2f,"triples_write":$tWrite%.2f}}""")
    spark.stop()
  }
}
