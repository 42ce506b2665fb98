package graft.app

import org.apache.spark.sql.SparkSession

/** Measurement-only probe (guide §1): attribute the kg() memo build wall —
  * fixture generation, dataset creation, raw pipeline run + triples count
  * (no checkpointing), then the checkpointed SparkEntry.kg path, cold and
  * warm, in one JVM.
  */
object KgColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kgprobe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val spec = graft.SparkEntry.specFor(sfDir)
    val dict = t("dictionary")(graft.fixtures.Synth.dictionary(spec))
    val turnsSeq = t("transcripts (driver gen)")(graft.fixtures.Synth.transcripts(spec, dict))
    val turns = t("fromSeq (encode+stableOrder plan)")(
      graft.pipeline.TranscriptSource.fromSeq(spark, turnsSeq))
    val out = t("pipeline run + triples.count (raw)") {
      val o = graft.pipeline.KgPipeline.run(spark, turns, dict, graft.core.GraftConfig.default)
      o.triples.count()
      o
    }
    t("decisionStats count (incremental)")(out.decisionStats.count())
    out.release()
    // second raw run, warm JVM
    val out2 = t("raw run 2 (warm jvm)") {
      val turns2 = graft.pipeline.TranscriptSource.fromSeq(
        spark, graft.fixtures.Synth.transcripts(spec, dict))
      val o = graft.pipeline.KgPipeline.run(spark, turns2, dict, graft.core.GraftConfig.default)
      o.triples.count()
      o
    }
    out2.release()
    // the SparkEntry.kg path (checkpointOutputs) — cold memo, warm JVM
    t("SparkEntry.kg (checkpointed) r1")(
      graft.SparkEntry.kg(spark, sfDir).triples.count())
    t("SparkEntry.clearKg")(graft.SparkEntry.clearKg(spark, sfDir))
    t("SparkEntry.kg (checkpointed) r2")(
      graft.SparkEntry.kg(spark, sfDir).triples.count())
    // stage attribution on a fresh raw run (persisted stages, sequential
    // counts so each wall lands on the stage that computes it)
    val turns3 = graft.pipeline.TranscriptSource.fromSeq(
      spark, graft.fixtures.Synth.transcripts(spec, dict))
    val o3 = graft.pipeline.KgPipeline.run(spark, turns3, dict, graft.core.GraftConfig.default)
    t("stage mentions")(o3.mentions.count())
    t("stage decisions")(o3.decisions.count())
    t("stage components")(o3.components.count())
    t("stage triples")(o3.triples.count())
    o3.release()
    spark.stop()
  }
}
