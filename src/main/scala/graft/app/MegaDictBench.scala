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
  * Referee modes (4th arg): `full` (default) re-runs the whole pipeline
  * under the exact sweep and compares triple sets; `sample` runs the exact
  * sweep on a 5% mention sample only and reports decision-level agreement —
  * the affordable check at dictionaries where a full sweep referee run
  * would dwarf the measured tier.
  *
  * Usage: runMain graft.app.MegaDictBench [cores] [nConv] [nDictBase] [full|sample]
  */
object MegaDictBench {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(32)
    val nConv = args.lift(1).map(_.toInt).getOrElse(10000)
    val nDict = args.lift(2).map(_.toInt).getOrElse(30000)
    val referee = args.lift(3).getOrElse("full")

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

    def timedRun(cfg: GraftConfig, sinkSuffix: String): (Long, Double, KgPipeline.Outputs) = {
      val t0 = System.nanoTime()
      val out = KgPipeline.run(spark, turns, dict, cfg)
      val sink = s"/tmp/graft-megadict-$nConv-$nDict/triples-$sinkSuffix"
      graft.pipeline.TripleEmitter.write(out.triples, sink)
      val wall = (System.nanoTime() - t0) / 1e9
      val n = spark.read.parquet(sink).count()
      (n, wall, out)
    }

    // natural blocked tier: default cfg, dict >> broadcastSweepMaxDict.
    // GRAFT_JOIN_MAXDF overrides blockJoinMaxDf — the knob whose default
    // (256) is tuned for <= ~100k-entity collision profiles; at 300k+ the
    // mid-df keys it drops start carrying real recall (see BASELINE.md)
    val baseCfg = GraftConfig.default.copy(
      blockJoinMaxDf = sys.env.get("GRAFT_JOIN_MAXDF").map(_.toLong)
        .getOrElse(GraftConfig.default.blockJoinMaxDf))
    require(dict.size > baseCfg.broadcastSweepMaxDict,
      s"dictionary ${dict.size} does not exceed the sweep cap — not a mega-dict run")

    // mode "triangle": no pipeline run at all — decide a 5% mention sample
    // under BOTH referees (exact sweep and reference-faithful retrieval) and
    // report their mutual agreement. This calibrates the other modes: when
    // the two ORACLES disagree at rate x, a blocked-tier agreement of ~x is
    // the corpus' near-threshold noise floor, not a retrieval defect.
    if (referee == "triangle") {
      val cfg = GraftConfig.default
      val entities = graft.pipeline.EntityStore.prepare(spark, dict, cfg)
      val mentions = graft.pipeline.MentionStage.detect(spark, turns, dict).toDF()
      val prep = graft.pipeline.Scorer.prepareMentions(mentions, cfg)
        .select(graft.pipeline.Scorer.mentionPrepCols.map(col): _*)
        .filter(pmod(xxhash64(col("mention_id")), lit(20)) === 0)
        .persist()
      val sweep = graft.pipeline.Scorer.decideBest(spark, prep, None, entities, cfg)
        .select(col("mention_id"), col("decision").as("d_sweep"),
          col("resolved_id").as("r_sweep"))
      val dictSides = graft.core.Candidates.prep(dict, cfg)
      val topk = graft.pipeline.Scorer.topKBroadcast(spark, prep, dictSides, cfg)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("mention_id").orderBy(col("final_score").desc, col("rank").asc)
      val refBest = topk.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .join(prep.select("mention_id", "surface"), "mention_id")
        .select(col("mention_id"), col("surface"),
          col("entity_id").as("best_id"), col("final_score"))
      val refDec = graft.pipeline.Scorer.decideFromBest(
          refBest.withColumn("conv_id", lit("")).withColumn("turn_idx", lit(0))
            .withColumn("offset", lit(0))
            .withColumn("bge_score", lit(0.0)).withColumn("cross_encoder_score", lit(0.0))
            .withColumn("fuzz_score", lit(0.0)).withColumn("levenshtein_score", lit(0.0)),
          cfg)
        .select(col("mention_id"), col("decision").as("d_ref"),
          col("resolved_id").as("r_ref"))
      val joined = sweep.join(refDec, "mention_id")
        .select((col("d_sweep") === col("d_ref") &&
            (col("r_sweep") <=> col("r_ref"))).cast("long").as("agree"))
        .agg(count(lit(1)).as("n"), sum(col("agree")).as("ok")).head()
      prep.unpersist(false)
      println(s"""{"bench":"kg_megadict_triangle","cores":$cores,"dict_entities":${dict.size},"turns":$nTurns,"sampled_mentions":${joined.getLong(0)},"sweep_vs_reference_agreement":${joined.getLong(1).toDouble / math.max(joined.getLong(0), 1L)}}""")
      spark.stop()
      return
    }

    val (nBlocked, wBlocked, outBlocked) = timedRun(baseCfg, "blocked")
    val blockedJson =
      f""""blocked":{"triples":$nBlocked,"wall_sec":$wBlocked%.2f,"triples_per_sec":${nBlocked / wBlocked}%.1f}"""

    val refJson = referee match {
      case "full" =>
        outBlocked.release()
        // referee: exact sweep on the same input (cap raised for this run only)
        val (nExact, wExact, outExact) =
          timedRun(GraftConfig.default.copy(broadcastSweepMaxDict = dict.size + 1L), "exact")
        outExact.release()
        val b = spark.read.parquet(s"/tmp/graft-megadict-$nConv-$nDict/triples-blocked")
          .select("subj", "pred", "obj").distinct()
        val e = spark.read.parquet(s"/tmp/graft-megadict-$nConv-$nDict/triples-exact")
          .select("subj", "pred", "obj").distinct()
        val hits = b.join(e, Seq("subj", "pred", "obj")).count()
        val p = hits.toDouble / math.max(b.count(), 1L)
        val r = hits.toDouble / math.max(e.count(), 1L)
        f""""exact_sweep":{"triples":$nExact,"wall_sec":$wExact%.2f,"triples_per_sec":${nExact / wExact}%.1f},"triple_precision":$p%.6f,"triple_recall":$r%.6f"""
      case "sample" =>
        // exact sweep on a deterministic 5% mention sample, compared against
        // the blocked run's own decisions by (decision, resolved_id) — the
        // affordable referee when a full sweep pipeline would dwarf the run
        val cfg = GraftConfig.default
        val entities = graft.pipeline.EntityStore.prepare(spark, dict, cfg)
        val mentions = graft.pipeline.MentionStage.detect(spark, turns, dict).toDF()
        val prep = graft.pipeline.Scorer.prepareMentions(mentions, cfg)
          .select(graft.pipeline.Scorer.mentionPrepCols.map(col): _*)
          .filter(pmod(xxhash64(col("mention_id")), lit(20)) === 0)
        val t0 = System.nanoTime()
        val sweep = graft.pipeline.Scorer.decideBest(spark, prep, None, entities, cfg)
          .select(col("mention_id"), col("decision").as("d_sweep"),
            col("resolved_id").as("r_sweep"))
        val blockedDec = outBlocked.decisions
          .select(col("mention_id"), col("decision").as("d_blk"),
            col("resolved_id").as("r_blk"))
        val joined = sweep.join(blockedDec, "mention_id")
          .select((col("d_sweep") === col("d_blk") &&
              (col("r_sweep") <=> col("r_blk"))).cast("long").as("agree"))
          .agg(count(lit(1)).as("n"), sum(col("agree")).as("ok")).head()
        val wSample = (System.nanoTime() - t0) / 1e9
        val n = joined.getLong(0)
        val ok = joined.getLong(1)
        outBlocked.release()
        f""""sample_referee":{"sampled_mentions":$n,"decision_agreement":${ok.toDouble / math.max(n, 1L)}%.6f,"wall_sec":$wSample%.2f}"""
      case "reference" =>
        // reference-faithful referee: the reference resolves a record via
        // match_candidates (EXACT embedding top-k over the whole index +
        // type branch, then comprehensive scoring) and auto_decide takes the
        // best candidate by final score (disambiguation.py:146-149). The
        // exact SWEEP is a strictly stronger oracle (it maximizes the
        // combined score over every entity; the reference only scores the
        // retrieval set), so at noise-dominated mega dictionaries
        // sweep-agreement understates reference parity — this mode measures
        // the question that matters to a reference user switching engines.
        val cfg = GraftConfig.default
        val entities = graft.pipeline.EntityStore.prepare(spark, dict, cfg)
        val mentions = graft.pipeline.MentionStage.detect(spark, turns, dict).toDF()
        val prep = graft.pipeline.Scorer.prepareMentions(mentions, cfg)
          .select(graft.pipeline.Scorer.mentionPrepCols.map(col): _*)
          .filter(pmod(xxhash64(col("mention_id")), lit(20)) === 0)
          .persist()
        val t0 = System.nanoTime()
        val dictSides = graft.core.Candidates.prep(dict, cfg)
        val topk = graft.pipeline.Scorer.topKBroadcast(spark, prep, dictSides, cfg)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("mention_id").orderBy(col("final_score").desc, col("rank").asc)
        val refBest = topk.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .join(prep.select("mention_id", "surface"), "mention_id")
          .select(col("mention_id"), col("surface"),
            col("entity_id").as("best_id"), col("final_score"))
        val refDec = graft.pipeline.Scorer.decideFromBest(
            refBest.withColumn("conv_id", lit("")).withColumn("turn_idx", lit(0))
              .withColumn("offset", lit(0))
              .withColumn("bge_score", lit(0.0)).withColumn("cross_encoder_score", lit(0.0))
              .withColumn("fuzz_score", lit(0.0)).withColumn("levenshtein_score", lit(0.0)),
            cfg)
          .select(col("mention_id"), col("decision").as("d_ref"),
            col("resolved_id").as("r_ref"))
        val blockedDec = outBlocked.decisions
          .select(col("mention_id"), col("decision").as("d_blk"),
            col("resolved_id").as("r_blk"))
        val joined = refDec.join(blockedDec, "mention_id")
          .select((col("d_ref") === col("d_blk") &&
              (col("r_ref") <=> col("r_blk"))).cast("long").as("agree"))
          .agg(count(lit(1)).as("n"), sum(col("agree")).as("ok")).head()
        val wRef = (System.nanoTime() - t0) / 1e9
        prep.unpersist(false)
        val n = joined.getLong(0)
        val ok = joined.getLong(1)
        outBlocked.release()
        f""""reference_referee":{"sampled_mentions":$n,"decision_agreement":${ok.toDouble / math.max(n, 1L)}%.6f,"wall_sec":$wRef%.2f}"""
      case _ =>
        outBlocked.release()
        "\"referee\":\"none\""
    }

    println(s"""{"bench":"kg_megadict","cores":$cores,"dict_entities":${dict.size},"turns":$nTurns,$blockedJson,$refJson}""")
    spark.stop()
  }
}
