package graft.app

import org.apache.spark.sql.SparkSession
import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.model.Triple
import graft.oracle.Oracle
import graft.pipeline.{KgPipeline, TranscriptSource}

/** CLI surface: run the Spark KG pipeline over the deterministic fixtures
  * and report triple P/R vs the no-Spark golden oracle (north_rule target
  * >= 0.95). Usage: runMain graft.app.PipelineDemo [nConv] [cores] */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val nConv = args.lift(0).map(_.toInt).getOrElse(100)
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // GRAFT_EMB_DIM overrides the embedding dimension (e.g. 1024 for the
    // reference-parity run, settings.py:106); oracle and engine share cfg
    val cfg = GraftConfig.default.copy(
      embeddingDim = sys.env.get("GRAFT_EMB_DIM").map(_.toInt).getOrElse(64))
    val spec = Synth.Spec(nConv = nConv)
    val dict = Synth.dictionary(spec)
    val turns = Synth.transcripts(spec, dict)

    val t0 = System.nanoTime()
    val out = KgPipeline.run(spark, TranscriptSource.fromSeq(spark, turns), dict, cfg)
    val engineTriples = out.triples
      .select("subj", "pred", "obj").as[Triple].collect().toSet
    val secs = (System.nanoTime() - t0) / 1e9

    val golden = Oracle.run(turns, dict, cfg)
    val (p, r) = Oracle.precisionRecall(engineTriples, golden.triples)

    println(s"turns=${turns.size} mentions=${out.mentions.count()} " +
      s"engineTriples=${engineTriples.size} oracleTriples=${golden.triples.size}")
    out.decisionStats.orderBy("decision").collect()
      .foreach(row => println(s"  decision ${row.getString(0)}: ${row.getLong(1)}"))
    println(f"P=$p%.4f R=$r%.4f wall=${secs}%.1fs triples/sec=${engineTriples.size / secs}%.0f")
    if (p < 0.95 || r < 0.95) {
      val missing = golden.triples.diff(engineTriples).take(5)
      val extra = engineTriples.diff(golden.triples).take(5)
      println(s"MISSING(sample): $missing")
      println(s"EXTRA(sample): $extra")
    }
    spark.stop()
  }
}
