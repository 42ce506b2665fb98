package graft.oracle

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.model.Decisions

class OracleSpec extends AnyFunSuite {
  val cfg = GraftConfig.default
  val spec = Synth.Spec(nConv = 30, turnsPerConv = 8)
  lazy val dict = Synth.dictionary(spec)
  lazy val turns = Synth.transcripts(spec, dict)

  test("fixtures are deterministic") {
    assert(Synth.dictionary(spec) == dict)
    assert(Synth.transcripts(spec, dict) == turns)
    assert(dict.nonEmpty && turns.size == spec.nConv * spec.turnsPerConv)
  }

  test("oracle run is deterministic and produces mentions/decisions/triples") {
    val r1 = Oracle.run(turns, dict, cfg)
    val r2 = Oracle.run(turns, dict, cfg)
    assert(r1.decisions == r2.decisions)
    assert(r1.triples == r2.triples)
    assert(r1.mentions.nonEmpty)
    assert(r1.decisions.size == r1.mentions.size)
    assert(r1.triples.nonEmpty)
  }

  test("fixtures exercise all three decision branches") {
    val r = Oracle.run(turns, dict, cfg)
    val byKind = r.decisions.groupBy(_.decision).view.mapValues(_.size).toMap
    withClue(s"decision distribution: $byKind") {
      assert(byKind.getOrElse(Decisions.Merge, 0) > 0)
      assert(byKind.getOrElse(Decisions.Create, 0) > 0)
      assert(byKind.getOrElse(Decisions.Ambiguous, 0) > 0)
    }
  }

  test("near-duplicate dictionary entities canonicalize via same_as") {
    val r = Oracle.run(turns, dict, cfg)
    withClue(s"sameAs: ${r.sameAs.take(5)}") {
      assert(r.sameAs.nonEmpty) // dup_* clones should connect to their base
    }
    // canonical ids are stable minima: canonical never appears as a dup
    val canons = r.sameAs.map(_._2).toSet
    val dups = r.sameAs.map(_._1).toSet
    assert(canons.intersect(dups).isEmpty)
  }

  test("mention triples reference canonical ids and carry conv#turn subjects") {
    val r = Oracle.run(turns, dict, cfg)
    val mentionTriples = r.triples.filter(_.pred == "mentions")
    assert(mentionTriples.nonEmpty)
    val dups = r.sameAs.map(_._1).toSet
    assert(mentionTriples.forall(t => !dups.contains(t.obj)))
    assert(mentionTriples.forall(_.subj.matches("conv_\\d+#\\d+")))
  }

  test("union-find connected components") {
    val cc = Oracle.connectedComponents(
      Seq("a", "b", "c", "d", "e"), Seq(("b", "a"), ("c", "b"), ("e", "d")))
    assert(cc("a") == "a" && cc("b") == "a" && cc("c") == "a")
    assert(cc("d") == "d" && cc("e") == "d")
  }
}
