package graft.app

import org.apache.spark.sql.SparkSession
import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.oracle.Oracle
import graft.pipeline.{KgPipeline, TranscriptSource}

/** Diagnostic: per-mention decision diff between the Spark engine and the
  * golden oracle — pinpoints blocking-recall misses. */
object DiffDebug {
  def main(args: Array[String]): Unit = {
    val nConv = args.lift(0).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = GraftConfig.default
    val spec = Synth.Spec(nConv = nConv)
    val dict = Synth.dictionary(spec)
    val turns = Synth.transcripts(spec, dict)
    val out = KgPipeline.run(spark, TranscriptSource.fromSeq(spark, turns), dict, cfg)
    val eng = out.decisions.select("mention_id", "surface", "decision", "match_id", "final_score")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), Option(r.getString(3)), r.getDouble(4))).toMap
    val golden = Oracle.run(turns, dict, cfg)
    val orc = golden.decisions.map(d => d.mention_id -> (d.surface, d.decision, d.match_id, d.final_score)).toMap
    val keys = (eng.keySet ++ orc.keySet).toSeq.sorted
    var diffs = 0
    for (k <- keys) {
      (eng.get(k), orc.get(k)) match {
        case (Some(e), Some(o)) if e != o =>
          diffs += 1
          println(s"DIFF $k engine=$e oracle=$o")
        case (None, Some(o)) => diffs += 1; println(s"MISSING-IN-ENGINE $k oracle=$o")
        case (Some(e), None) => diffs += 1; println(s"EXTRA-IN-ENGINE $k engine=$e")
        case _ =>
      }
    }
    println(s"total mentions=${keys.size} diffs=$diffs")
    spark.stop()
  }
}
