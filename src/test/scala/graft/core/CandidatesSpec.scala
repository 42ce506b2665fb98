package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.model.EntityRecord

/** Pins the reference's _smart_search_similar_entities merge semantics
  * (disambiguation.py:168-224) on hand-built dictionaries:
  * F2 cosine floor on the type branch, F4 first-wins NAME dedup with
  * type-branch priority, over-fetch truncation, stable final-desc rank. */
class CandidatesSpec extends AnyFunSuite {
  val cfg = GraftConfig.default

  def ent(id: String, name: String, tpe: Option[String], defn: String = ""): EntityRecord =
    EntityRecord(id, name, tpe, Nil, Some(defn).filter(_.nonEmpty), Map.empty, None, None)

  def query(name: String, tpe: Option[String], dict: Seq[EntityRecord],
            k: Int = 10): Seq[Candidates.Ranked] = {
    val c = cfg.copy(topK = k)
    val prepped = Candidates.prep(dict, c)
    val tf = TextSim.tfVector(Scoring.scoringText(name, Nil, None))
    val emb = TextSim.embed(Scoring.embeddingText(name, Nil, None, Map.empty), c.embeddingDim)
    Candidates.matchCandidates(name, Nil, tpe, tf, emb, prepped, c)
  }

  test("F4: two same-NAME entities yield one candidate; type-branch owner wins") {
    // e_typed shares the query's type (type branch), e_other does not —
    // both carry the identical name, so the merged list must keep only the
    // type-branch one (it is prepended, first-wins on name)
    val dict = Seq(
      ent("b_other", "Alpha Beta", Some("drug"), "unrelated words entirely"),
      ent("a_typed", "Alpha Beta", Some("disease"), "unrelated words entirely"))
    val got = query("Alpha Beta", Some("disease"), dict)
    assert(got.map(_.entityId) == Seq("a_typed"),
      s"expected the type-branch owner only, got $got")
  }

  test("F4 without a query type: vector order decides, still one per name") {
    val dict = Seq(
      ent("x1", "Gamma", Some("drug")),
      ent("x2", "Gamma", Some("disease")))
    val got = query("Gamma", None, dict)
    assert(got.size == 1)
  }

  test("F2: type-branch candidates at cosine <= floor are dropped from the type branch") {
    // orthogonal text => cosine ~0 vs the query; same type. It must NOT get
    // type-branch priority — it can only appear via the vector branch.
    val sameName = ent("v1", "Delta", Some("disease"))
    val lowCos = ent("t1", "Zzz Qqq Www", Some("disease"), "xxyyzz aabbcc")
    val got = query("Delta", Some("disease"), Seq(lowCos, sameName), k = 1)
    // with top_k=1 the truncation keeps only the head of the merged list;
    // were lowCos floored INTO the type branch it could displace sameName
    assert(got.map(_.entityId) == Seq("v1"))
  }

  test("over-fetch truncation: at most top_k candidates, ranks 1..n, final desc") {
    val dict = (1 to 30).map(i => ent(f"e$i%02d", s"Epsilon $i", Some("gene")))
    val got = query("Epsilon", Some("gene"), dict, k = 7)
    assert(got.size == 7)
    assert(got.map(_.rank) == (1 to 7))
    assert(got.sliding(2).forall {
      case Seq(a, b) => a.score.final_score >= b.score.final_score
      case _         => true
    })
  }

  test("deterministic: identical inputs give identical ranked lists") {
    val dict = (1 to 20).map(i => ent(s"d$i", s"Zeta ${i % 3}", Some("organ")))
    val a = query("Zeta", Some("organ"), dict)
    val b = query("Zeta", Some("organ"), dict)
    assert(a == b)
  }
}
