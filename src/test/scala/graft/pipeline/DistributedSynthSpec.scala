package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.Synth

/** The distributed transcript generator: per-conversation seeding must make
  * generation deterministic at ANY parallelism, and the content model must
  * match the sequential family (same schema, same timestamp formula, same
  * role rotation, mentions actually planted). The two families are NOT
  * byte-equal (different random stream positions) — that non-claim is part
  * of the contract and is pinned here too. */
class DistributedSynthSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val spec = Synth.Spec(nConv = 40)
  private lazy val dict = Synth.dictionary(spec)

  test("deterministic across parallelism: 4-way run == 1-way run, row for row") {
    val a = Synth.transcriptsDistributed(spark, spec, dict)
      .collect().map(t => (t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts.getTime)).toSet
    val one = spark.range(1) // unused; just documents intent
    val b = {
      val s2 = spec.copy() // same seed
      Synth.transcriptsDistributed(spark, s2, dict).coalesce(1)
        .collect().map(t => (t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts.getTime)).toSet
    }
    assert(a == b && a.nonEmpty)
  }

  test("content model matches the sequential family; streams differ by design") {
    val seqT = Synth.transcripts(spec, dict)
    val distT = Synth.transcriptsDistributed(spark, spec, dict).collect()
    assert(distT.length == seqT.length, "same turn count")
    assert(distT.map(_.conv_id).toSet == seqT.map(_.conv_id).toSet, "same conversations")
    // identical deterministic skeleton: role rotation and timestamp formula
    // don't consume randomness, so they agree turn-for-turn
    val byKey = seqT.map(t => (t.conv_id, t.turn_idx) -> t).toMap
    distT.foreach { t =>
      val s = byKey((t.conv_id, t.turn_idx))
      assert(t.role == s.role && t.ts == s.ts, s"skeleton diverged at ${t.conv_id}#${t.turn_idx}")
    }
    // both families plant real dictionary mentions (the pipeline has work)
    val names = dict.map(_.name).toSet
    def plantRate(ts: Seq[graft.model.Turn]): Double =
      ts.count(t => names.exists(t.text.contains)).toDouble / ts.size
    assert(plantRate(distT.toSeq) > 0.2, "distributed corpus plants mentions")
    // and the text streams are different families, not a silent copy
    assert(distT.map(_.text).toSeq != seqT.map(_.text), "streams must differ")
  }
}
