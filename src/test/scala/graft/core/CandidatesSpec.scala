package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.model.EntityRecord

/** Pins the reference's _smart_search_similar_entities merge semantics
  * (disambiguation.py:168-224) on hand-built dictionaries:
  * F2 cosine floor on the type branch, F4 first-wins NAME dedup with
  * type-branch priority (merge path only — the no-type path returns raw
  * vector hits with NO dedup, :217-218), over-fetch truncation, and rank
  * assigned 1-based in MERGE order (enumerate, :238 — match_candidates
  * never re-sorts by final score). */
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

  test("no query type: raw vector hits, NO name dedup (reference :217-218)") {
    val dict = Seq(
      ent("x1", "Gamma", Some("drug")),
      ent("x2", "Gamma", Some("disease")))
    val got = query("Gamma", None, dict)
    assert(got.size == 2, s"the no-type path must not dedup names: $got")
  }

  test("query type with zero same-type entities: merge path skipped, no dedup") {
    // reference gates the merge on `if type_entities:` (:181) — a typed query
    // against a dictionary with no entity of that type falls through to the
    // raw vector return, name dedup and all
    val dict = Seq(
      ent("y1", "Theta", Some("drug")),
      ent("y2", "Theta", Some("gene")))
    val got = query("Theta", Some("organ"), dict)
    assert(got.size == 2, s"expected both same-name vector hits, got $got")
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

  test("over-fetch truncation: top_k candidates, rank = 1-based MERGE order") {
    val dict = (1 to 30).map(i => ent(f"e$i%02d", s"Epsilon $i", Some("gene")))
    val got = query("Epsilon", Some("gene"), dict, k = 7)
    assert(got.size == 7)
    assert(got.map(_.rank) == (1 to 7))
    // rank follows the type-branch cosine-desc order, NOT final-score order:
    // recompute the expected merge order independently
    val c = cfg.copy(topK = 7)
    val prepped = Candidates.prep(dict, c)
    val qEmb = TextSim.embed(Scoring.embeddingText("Epsilon", Nil, None, Map.empty), c.embeddingDim)
    val withCos = prepped.map(e => (e.id, TextSim.cosine(qEmb, e.emb)))
    val typeBranch = withCos.filter(_._2 > c.cosineFloor).sortBy(-_._2)
    val vector = withCos.sortBy(-_._2).take(c.topK * 2)
    val expected = (typeBranch ++ vector).map(_._1).distinct.take(7)
    assert(got.map(_.entityId) == expected,
      s"rank must be retrieval-merge (cosine-desc) order, not final-desc")
  }

  test("deterministic: identical inputs give identical ranked lists") {
    val dict = (1 to 20).map(i => ent(s"d$i", s"Zeta ${i % 3}", Some("organ")))
    val a = query("Zeta", Some("organ"), dict)
    val b = query("Zeta", Some("organ"), dict)
    assert(a == b)
  }
}
