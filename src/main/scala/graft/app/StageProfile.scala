package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.pipeline._

/** Diagnostic: materialize each KG pipeline stage separately and print its
  * incremental wall time — attributes the end-to-end cost to stages so
  * optimization targets the right pass (the aggregate job view can't
  * distinguish a cached-reuse from a recompute).
  * Usage: runMain graft.app.StageProfile [cores] [nConv] [inputDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(32)
    val nConv = args.lift(1).map(_.toInt).getOrElse(40000)
    val workDir = args.lift(2).getOrElse(s"/tmp/graft-scale-$nConv")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = GraftConfig.default
    val spec = Synth.Spec(nConv = nConv)
    val dict = Synth.dictionary(spec)
    val inputPath = s"$workDir/transcripts"
    if (!new java.io.File(inputPath).exists())
      TranscriptSource.write(TranscriptSource.fromSeq(spark, Synth.transcripts(spec, dict)), inputPath)
    val turns = TranscriptSource.read(spark, inputPath)

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }

    val entities = t("entities.prepare+cache")(EntityStore.prepare(spark, dict, cfg).cache())
    val entityB = t("entityBlocks")(Blocking.entityBlocks(entities, cfg).cache())
    t("entityB.count")(entityB.count())
    val mentions = t("mentions.detect")(MentionStage.detect(spark, turns, dict).toDF().persist())
    t("mentions.count")(mentions.count())
    val mentionsPrep = t("mentionsPrep")(Scorer.prepareMentions(mentions, cfg)
      .select(Scorer.mentionPrepCols.map(col): _*).cache())
    t("mentionsPrep.count")(mentionsPrep.count())
    val mentionB = t("mentionBlocks")(Blocking.mentionBlocks(mentionsPrep, cfg).persist())
    t("mentionB.count")(mentionB.count())
    val hot = t("hotKeySketch")(Blocking.hotKeySketch(mentionB, math.max(mentions.count() / 100, 100L)))
    val pairs = t("candidatePairs")(Blocking.candidatePairs(spark, mentionB, entityB, cfg, hot).persist())
    t("pairs.count")(pairs.count())
    val decisions = t("decideBest")(
      Scorer.decideBest(spark, mentionsPrep, Some(pairs), entities, cfg).persist())
    t("decisions.count")(decisions.count())
    val components = t("components")({
      val edges = Scorer.entityDupEdges(entityB, entities, cfg)
      val vertices = entities.select(col("id"))
        .union(decisions.filter(col("resolved_id").isNotNull).select(col("resolved_id").as("id")))
        .distinct()
      ConnectedComponents.run(vertices, edges).persist()
    })
    t("components.count")(components.count())
    val triples = t("triples.build")(TripleEmitter.all(entities, decisions, components))
    t("triples.count")(triples.count())
    spark.stop()
  }
}
