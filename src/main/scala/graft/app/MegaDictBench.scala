package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.pipeline.{KgPipeline, Scorer, TranscriptSource}

/** The beyond-broadcast tier, engaged NATURALLY: a dictionary far above
  * `broadcastSweepMaxDict` (default 10k) runs the blocked candidate join the
  * way a 100 TB deployment would — no GRAFT_SWEEP_MAX forcing — and is
  * refereed on the SAME input by stronger retrieval schemes.
  *
  * This answers the question the small-dictionary benches can't: does
  * blocking recall hold when the dictionary is 1000x the fixture — where the
  * type channel is join-capped out (7 types x thousands of members each >
  * blockJoinMaxDf, the effective type ceiling), alias surfaces collide
  * tens-deep, and the lex/join df caps actually bite?
  *
  * Referee modes (4th arg — anything else fails fast):
  *  - `full` (default): re-run the whole pipeline under the exact sweep and
  *    compare triple sets (P/R).
  *  - `sample`: exact sweep on a deterministic 5% mention sample, decision
  *    agreement vs the blocked run — affordable when a full referee run
  *    would dwarf the measured tier.
  *  - `reference`: the reference's own retrieval semantics (exact embedding
  *    top-k + type branch, then best-by-final — auto_decide,
  *    disambiguation.py:146-149) on the sample, vs the blocked run. The
  *    exact sweep is a strictly STRONGER oracle (it maximizes the combined
  *    score over every entity; the reference only scores its retrieval
  *    set), so sweep agreement understates reference parity.
  *  - `triangle`: no pipeline run — the two ORACLES against each other on
  *    the sample. Calibrates the other modes: when the oracles disagree at
  *    rate x, a blocked-tier agreement near x is the corpus' near-threshold
  *    noise floor, not a retrieval defect.
  *
  * Usage: runMain graft.app.MegaDictBench [cores] [nConv] [nDictBase] [full|sample|reference|triangle]
  */
object MegaDictBench {

  /** Deterministic 5% mention sample, prepared for the scorer; persisted —
    * caller unpersists. */
  private def samplePrep(mentionsDf: DataFrame, cfg: GraftConfig): DataFrame =
    Scorer.prepareMentions(mentionsDf, cfg)
      .select(Scorer.mentionPrepCols.map(col): _*)
      .filter(pmod(xxhash64(col("mention_id")), lit(20)) === 0)
      .persist()

  /** Reference-faithful decisions over prepared mentions: matchCandidates
    * retrieval (shared core) via topKBroadcast, best by (final desc, rank
    * asc) — the reference's stable sort keeps merge order on ties — then
    * the threshold projection. */
  private def referenceDecisions(
      spark: SparkSession, prep: DataFrame,
      dict: Seq[graft.model.EntityRecord], cfg: GraftConfig): DataFrame = {
    val dictSides = graft.core.Candidates.prep(dict, cfg)
    val topk = Scorer.topKBroadcast(spark, prep, dictSides, cfg)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("mention_id").orderBy(col("final_score").desc, col("rank").asc)
    val refBest = topk.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(prep.select("mention_id", "surface"), "mention_id")
      .select(col("mention_id"), col("surface"),
        col("entity_id").as("best_id"), col("final_score"))
    // decideFromBest's pass-through columns, zero-filled: only decision /
    // resolved_id are consumed by the referees
    Scorer.decideFromBest(
      refBest.withColumn("conv_id", lit("")).withColumn("turn_idx", lit(0))
        .withColumn("offset", lit(0))
        .withColumn("bge_score", lit(0.0)).withColumn("cross_encoder_score", lit(0.0))
        .withColumn("fuzz_score", lit(0.0)).withColumn("levenshtein_score", lit(0.0)),
      cfg)
  }

  /** (n, agreeing) over (decision, resolved_id) per mention_id. */
  private def agreement(a: DataFrame, b: DataFrame): (Long, Long) = {
    val joined = a.toDF("mention_id", "d_a", "r_a")
      .join(b.toDF("mention_id", "d_b", "r_b"), "mention_id")
      .select((col("d_a") === col("d_b") && (col("r_a") <=> col("r_b")))
        .cast("long").as("agree"))
      .agg(count(lit(1)).as("n"), sum(col("agree")).as("ok")).head()
    (joined.getLong(0), joined.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(32)
    val nConv = args.lift(1).map(_.toInt).getOrElse(10000)
    val nDict = args.lift(2).map(_.toInt).getOrElse(30000)
    val referee = args.lift(3).getOrElse("full")
    require(Set("full", "sample", "reference", "triangle")(referee),
      s"unknown referee mode '$referee' (full|sample|reference|triangle)")

    // GRAFT_SHUFFLE_PARTITIONS: partitions default to cores, but at the
    // memory envelope (corpus x dictionary working set vs the fixed 8g
    // heap) RAISING them shrinks each task's slice — the knob a real
    // cluster turns instead of buying bigger executors
    val shufflePartitions =
      sys.env.get("GRAFT_SHUFFLE_PARTITIONS").map(_.toInt).getOrElse(cores)
    // GRAFT_CODEC: shuffle/spill block compression codec (default lz4).
    // zstd trades ~free CPU here for ~2x the compression ratio on the
    // text-ish pair exchanges — the knob that matters when the envelope is
    // aggregate SPILL DISK, not heap (the 4M-turn cell, BASELINE.md)
    val codec = sys.env.getOrElse("GRAFT_CODEC", "lz4")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-megadict-$nDict")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // AQE picks the real width DOWN from a high starting point: the
      // session-width exchanges outside the pair DAG (mention prep, corpus
      // ordering) sized per-task slices by `cores` alone, which blew
      // execution memory at 8M turns × 32 tasks while width 128 completed
      // — exactly the class of fixed-width failure the pair DAG's derived
      // width already solves. A high initialPartitionNum + AQE coalesce is
      // the no-knob spelling: big exchanges keep many small slices, small
      // exchanges coalesce back to ~cores, and the 8M cell passes at
      // DEFAULTS.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(shufflePartitions * 8, 256).toString)
      .config("spark.io.compression.codec", codec)
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
    // corpus family: the historical driver-side Seq up to 4M turns (byte-
    // stable vs earlier BASELINE cells), the DISTRIBUTED generator beyond —
    // an 8g driver cannot hold an 8M-turn Vector (measured OOM before Spark
    // saw a row), and at 10^12 turns only distributed generation exists.
    // GRAFT_GEN=dist|driver overrides.
    val gen = sys.env.getOrElse("GRAFT_GEN",
      if (nConv > 400000) "dist" else "driver")
    if (!new java.io.File(inputPath).exists()) {
      TranscriptSource.write(
        if (gen == "dist")
          TranscriptSource.stableOrder(Synth.transcriptsDistributed(spark, spec, dict))
        else TranscriptSource.fromSeq(spark, Synth.transcripts(spec, dict)),
        inputPath)
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

    if (referee == "triangle") {
      val entities = graft.pipeline.EntityStore.prepare(spark, dict, baseCfg)
      val mentions = graft.pipeline.MentionStage.detect(spark, turns, dict).toDF()
      val prep = samplePrep(mentions, baseCfg)
      val sweep = Scorer.decideBest(spark, prep, None, entities, baseCfg)
        .select(col("mention_id"), col("decision"), col("resolved_id"))
      val ref = referenceDecisions(spark, prep, dict, baseCfg)
        .select(col("mention_id"), col("decision"), col("resolved_id"))
      val (n, ok) = agreement(sweep, ref)
      // disagreement anatomy: counts by (sweep decision -> reference
      // decision) among disagreeing mentions — near-threshold noise shows
      // up as ambiguous<->create/merge band flips, retrieval misses as
      // merge->create with different resolved ids
      val flips = sweep.toDF("mention_id", "d_a", "r_a")
        .join(ref.toDF("mention_id", "d_b", "r_b"), "mention_id")
        .filter(!(col("d_a") === col("d_b") && (col("r_a") <=> col("r_b"))))
        .groupBy("d_a", "d_b").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc)
        .collect()
        .map(r => s""""${r.getString(0)}->${r.getString(1)}":${r.getLong(2)}""")
        .mkString("{", ",", "}")
      prep.unpersist(false)
      println(s"""{"bench":"kg_megadict_triangle","cores":$cores,"gen":"$gen","dict_entities":${dict.size},"turns":$nTurns,"sampled_mentions":$n,"sweep_vs_reference_agreement":${ok.toDouble / math.max(n, 1L)},"disagreement_flips":$flips}""")
      spark.stop()
      return
    }

    val (nBlocked, wBlocked, outBlocked) = timedRun(baseCfg, "blocked")
    val blockedJson =
      f""""blocked":{"triples":$nBlocked,"wall_sec":$wBlocked%.2f,"triples_per_sec":${nBlocked / wBlocked}%.1f}"""

    val refJson = referee match {
      case "full" =>
        outBlocked.release()
        // referee: exact sweep on the same input — baseCfg with only the
        // sweep cap raised, so the two runs differ in the decide tier alone
        val (nExact, wExact, outExact) =
          timedRun(baseCfg.copy(broadcastSweepMaxDict = dict.size + 1L), "exact")
        outExact.release()
        val b = spark.read.parquet(s"/tmp/graft-megadict-$nConv-$nDict/triples-blocked")
          .select("subj", "pred", "obj").distinct()
        val e = spark.read.parquet(s"/tmp/graft-megadict-$nConv-$nDict/triples-exact")
          .select("subj", "pred", "obj").distinct()
        val hits = b.join(e, Seq("subj", "pred", "obj")).count()
        val p = hits.toDouble / math.max(b.count(), 1L)
        val r = hits.toDouble / math.max(e.count(), 1L)
        f""""exact_sweep":{"triples":$nExact,"wall_sec":$wExact%.2f,"triples_per_sec":${nExact / wExact}%.1f},"triple_precision":$p%.6f,"triple_recall":$r%.6f"""
      case mode @ ("sample" | "reference") =>
        // reuse the blocked run's own (persisted) mentions — no re-detection;
        // the sample prep is materialized BEFORE the timed referee window
        val entities = graft.pipeline.EntityStore.prepare(spark, dict, baseCfg)
        val prep = samplePrep(outBlocked.mentions, baseCfg)
        prep.count()
        val t0 = System.nanoTime()
        val oracle =
          if (mode == "sample")
            Scorer.decideBest(spark, prep, None, entities, baseCfg)
              .select(col("mention_id"), col("decision"), col("resolved_id"))
          else
            referenceDecisions(spark, prep, dict, baseCfg)
              .select(col("mention_id"), col("decision"), col("resolved_id"))
        val blockedDec = outBlocked.decisions
          .select(col("mention_id"), col("decision"), col("resolved_id"))
        val (n, ok) = agreement(oracle, blockedDec)
        val wall = (System.nanoTime() - t0) / 1e9
        prep.unpersist(false)
        outBlocked.release()
        val label = if (mode == "sample") "sample_referee" else "reference_referee"
        f""""$label":{"sampled_mentions":$n,"decision_agreement":${ok.toDouble / math.max(n, 1L)}%.6f,"wall_sec":$wall%.2f}"""
    }

    println(s"""{"bench":"kg_megadict","cores":$cores,"gen":"$gen","dict_entities":${dict.size},"turns":$nTurns,$blockedJson,$refJson}""")
    spark.stop()
  }
}
