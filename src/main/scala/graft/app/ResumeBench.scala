package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.pipeline.{Checkpoints, KgPipeline, MentionStage, TranscriptSource, TripleEmitter}

/** Checkpoint-resume parity AT BLOCKED-TIER SCALE (north_rule: "resumable
  * from checkpoint with per-partition lineage"): the Checkpoints machinery
  * was spec-gated on small fixtures only — no measured run had ever killed
  * the mega-dict pipeline mid-stage and resumed it (round-4 directive #5).
  *
  * Protocol (one JVM, two SparkContexts — the second context is the
  * process-restart analog: no cached frame, no codegen'd plan, no memoized
  * stage survives into the resume):
  *
  *  1. session A: clean uninterrupted pipeline run (no checkpoints) over a
  *     parquet corpus of >= 100k turns with a beyond-broadcast dictionary
  *     (the blocked tier, naturally engaged) -> triples sink "clean".
  *  2. session A, "crash": run ONLY the mentions stage through the SAME
  *     `Checkpoints.stage("mentions")` call the pipeline makes, then stop
  *     the context. On-disk state is exactly what a kill between the
  *     mentions and decisions stages leaves: mentions parquet + manifest
  *     done, nothing else.
  *  3. session B (fresh): `KgPipeline.run(checkpointRoot)` — asserts the
  *     mentions manifest is seen (stage skipped, parquet read back) and the
  *     pipeline completes from there -> triples sink "resumed".
  *  4. Parity: the two triple sets must be IDENTICAL — counts equal and
  *     except() empty both directions over (subj, pred, obj,
  *     sorted(map_entries(props))) (set comparison: sinks differ only in
  *     partitioning/row order; map columns can't except() directly).
  *
  * Usage: runMain graft.app.ResumeBench [cores] [nConv] [nDictBase]
  * Defaults: 32 cores, 12500 convs (125k turns), 30k-entity dictionary.
  */
object ResumeBench {

  private def newSession(cores: Int, tag: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-resume-$tag")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Comparable projection: map props flattened to a sorted entry array. */
  private def comparable(triples: DataFrame): DataFrame =
    triples.select(col("subj"), col("pred"), col("obj"),
      array_sort(map_entries(col("props"))).as("props_entries"))

  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(32)
    val nConv = args.lift(1).map(_.toInt).getOrElse(12500)
    val nDict = args.lift(2).map(_.toInt).getOrElse(30000)

    val root = s"/tmp/graft-resume-$nConv-$nDict"
    // fresh checkpoint/sink state per invocation — a stale manifest would
    // turn the "clean" run into a resume and void the comparison
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete(); ()
    }
    rm(new java.io.File(s"$root/cp")); rm(new java.io.File(s"$root/triples-clean"))
    rm(new java.io.File(s"$root/triples-resumed"))

    val dict = Synth.megaDictionary(nDict)
    val cfg = GraftConfig.default
    require(dict.size > cfg.broadcastSweepMaxDict,
      s"dictionary ${dict.size} does not engage the blocked tier")
    val spec = Synth.Spec(nConv = nConv)
    val inputPath = s"$root/transcripts"

    // ---- session A: corpus write, clean run, then the "crash"
    val sA = newSession(cores, "clean")
    if (!new java.io.File(inputPath).exists()) {
      TranscriptSource.write(
        TranscriptSource.fromSeq(sA, Synth.transcripts(spec, dict)), inputPath)
    }
    val turnsA = TranscriptSource.read(sA, inputPath)
    val nTurns = turnsA.count()

    val t0 = System.nanoTime()
    val clean = KgPipeline.run(sA, turnsA, dict, cfg)
    TripleEmitter.write(clean.triples, s"$root/triples-clean")
    val cleanWall = (System.nanoTime() - t0) / 1e9
    val nClean = sA.read.parquet(s"$root/triples-clean").count()
    clean.release()

    // the "crash": the pipeline's own first checkpointed stage, then stop.
    // Identical stage name + compute => byte-identical on-disk state to a
    // KgPipeline.run(checkpointRoot) killed right after this stage.
    val tA = System.nanoTime()
    val cpA = new Checkpoints(sA, Some(s"$root/cp"), "run_crash")
    cpA.stage("mentions") { MentionStage.detect(sA, turnsA, dict).toDF() }
    val mentionsWall = (System.nanoTime() - tA) / 1e9
    sA.stop()

    // ---- session B: fresh context, resume from the manifest
    val sB = newSession(cores, "resume")
    val cpB = new Checkpoints(sB, Some(s"$root/cp"), "run_resume")
    require(cpB.isDone("mentions"), "mentions manifest not visible to the resume")
    val turnsB = TranscriptSource.read(sB, inputPath)
    val t1 = System.nanoTime()
    val resumed = KgPipeline.run(sB, turnsB, dict, cfg,
      checkpointRoot = Some(s"$root/cp"), runId = "run_resume")
    TripleEmitter.write(resumed.triples, s"$root/triples-resumed")
    val resumeWall = (System.nanoTime() - t1) / 1e9
    val nResumed = sB.read.parquet(s"$root/triples-resumed").count()
    resumed.release()

    // ---- parity: set equality over the comparable projection
    val c = comparable(sB.read.parquet(s"$root/triples-clean"))
    val r = comparable(sB.read.parquet(s"$root/triples-resumed"))
    val onlyClean = c.except(r).count()
    val onlyResumed = r.except(c).count()
    val identical = nClean == nResumed && onlyClean == 0 && onlyResumed == 0

    println(
      f"""{"bench":"kg_resume","cores":$cores,"turns":$nTurns,"dict_entities":${dict.size},"clean_wall_sec":$cleanWall%.2f,"mentions_stage_sec":$mentionsWall%.2f,"resume_wall_sec":$resumeWall%.2f,"triples_clean":$nClean,"triples_resumed":$nResumed,"only_clean":$onlyClean,"only_resumed":$onlyResumed,"identical":$identical}""")
    sB.stop()
    if (!identical) sys.exit(1)
  }
}
