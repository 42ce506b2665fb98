package graft.app

import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.oracle.Oracle

/** CLI surface for the no-Spark semantic core: synthesizes the deterministic
  * fixture corpus, runs the golden oracle, prints the decision distribution
  * and a triple sample. Usage: runMain graft.app.OracleDemo [nConv] [seed] */
object OracleDemo {
  def main(args: Array[String]): Unit = {
    val nConv = args.lift(0).map(_.toInt).getOrElse(50)
    val seed = args.lift(1).map(_.toLong).getOrElse(42L)
    val spec = Synth.Spec(nConv = nConv, seed = seed)
    val dict = Synth.dictionary(spec)
    val turns = Synth.transcripts(spec, dict)
    val r = Oracle.run(turns, dict, GraftConfig.default)
    val dist = r.decisions.groupBy(_.decision).view.mapValues(_.size).toMap
    println(s"dict=${dict.size} turns=${turns.size} mentions=${r.mentions.size}")
    println(s"decisions=$dist sameAs=${r.sameAs.size} triples=${r.triples.size}")
    println("sample decisions:")
    r.decisions.take(5).foreach(d =>
      println(f"  ${d.mention_id}%-16s ${d.surface}%-22s ${d.decision}%-9s final=${d.final_score}%.4f match=${d.match_id.getOrElse("-")}"))
    println("sample triples:")
    r.triples.toSeq.sortBy(t => (t.pred, t.subj, t.obj)).take(8).foreach(t =>
      println(s"  (${t.subj}, ${t.pred}, ${t.obj})"))
  }
}
