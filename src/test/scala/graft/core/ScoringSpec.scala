package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Decisions, EntityRecord, Mention}

class ScoringSpec extends AnyFunSuite {
  val cfg = GraftConfig.default

  test("decision thresholds: boundary semantics (>= high merges, <= low creates)") {
    assert(Scoring.decide(0.72, cfg) == Decisions.Merge)
    assert(Scoring.decide(0.7200001, cfg) == Decisions.Merge)
    assert(Scoring.decide(0.60, cfg) == Decisions.Create)
    assert(Scoring.decide(0.61, cfg) == Decisions.Ambiguous)
    assert(Scoring.decide(0.719, cfg) == Decisions.Ambiguous)
  }

  test("force_decision splits the ambiguous band at the midpoint 0.66 (strict >)") {
    val f = cfg.copy(forceDecision = true)
    assert(Scoring.decide(0.661, f) == Decisions.Merge)
    // fp artifact faithfully cloned: in float64 (Python and JVM alike)
    // 0.66 > (0.72+0.6)/2 is TRUE, so exactly-0.66 force-merges
    assert(Scoring.decide(0.66, f) == Decisions.Merge)
    assert(Scoring.decide(0.6599999, f) == Decisions.Create)
    assert(Scoring.decide(0.65, f) == Decisions.Create)
  }

  test("type multiplier: 1.0 match, 0.1 mismatch, 1.0 when either missing") {
    assert(Scoring.typeMultiplier(Some("a"), Some("a"), cfg) == 1.0)
    assert(Scoring.typeMultiplier(Some("a"), Some("b"), cfg) == 0.1)
    assert(Scoring.typeMultiplier(None, Some("b"), cfg) == 1.0)
    assert(Scoring.typeMultiplier(Some("a"), None, cfg) == 1.0)
    assert(Scoring.typeMultiplier(None, None, cfg) == 1.0)
  }

  test("weighted sum uses 0.4/0.3/0.2/0.1 and applies multiplier last") {
    // identical name/aliases/text => bge=1, ce=1, fuzz=1, lev=1 => final = 1.0
    val emb = TextSim.embed("abc ctx", cfg.embeddingDim)
    val s = Scoring.pairScore("abc", Nil, Some("t"), "abc ctx", emb,
      "abc", Nil, Some("t"), "abc ctx", emb, cfg)
    assert(math.abs(s.final_score - 1.0) < 1e-9)
    val s2 = Scoring.pairScore("abc", Nil, Some("t1"), "abc ctx", emb,
      "abc", Nil, Some("t2"), "abc ctx", emb, cfg)
    assert(math.abs(s2.final_score - 0.1) < 1e-9)
  }

  test("scoring text X1 excludes attributes; embedding text X2 includes them") {
    val x1 = Scoring.scoringText("n", Seq("a1", "a2"), Some("def"))
    assert(x1 == "n a1 a2 def")
    val x2 = Scoring.embeddingText("n", Seq("a1"), Some("def"), Map("k" -> Seq("v1", "v2")))
    assert(x2 == "n a1 def k: v1, v2")
  }

  test("createdId is deterministic and case-insensitive on surface") {
    assert(Scoring.createdId("Foo") == Scoring.createdId("foo"))
    assert(Scoring.createdId("foo") != Scoring.createdId("bar"))
  }

  test("decideMention with no candidates creates with confidence 1.0") {
    val m = Mention("c#0#0", "c", 0, "widget", 0, None, "ctx")
    val d = Scoring.decideMention(m, None, cfg)
    assert(d.decision == Decisions.Create)
    assert(d.final_score == 1.0)
    assert(d.resolved_id.contains(Scoring.createdId("widget")))
    assert(d.match_id.isEmpty)
  }

  test("match_id only set on merge") {
    val m = Mention("c#0#0", "c", 0, "abc", 0, Some("t"), "abc ctx")
    val e = EntityRecord("e1", "abc", Some("t"), Nil, Some("abc ctx"), Map.empty, None, None)
    val emb = TextSim.embed(Scoring.embeddingText("abc", Nil, Some("abc ctx"), Map.empty), cfg.embeddingDim)
    val score = Scoring.pairScore("abc", Nil, Some("t"), "abc abc ctx", emb,
      "abc", Nil, Some("t"), "abc abc ctx", emb, cfg)
    val d = Scoring.decideMention(m, Some((e, score)), cfg)
    assert(d.decision == Decisions.Merge)
    assert(d.match_id.contains("e1"))
    assert(d.resolved_id.contains("e1"))
  }
}
