package graft.core

import graft.model.{EntityRecord, EntityScore}

/** Reference-faithful candidate retrieval for the match-candidates surface
  * (POST /match-candidates): the `_smart_search_similar_entities` merge
  * semantics (/root/reference/services/disambiguation.py:168-224) followed by
  * comprehensive scoring + 1-based rank (:226-257).
  *
  * Pure Scala, ORACLE-SHARED: the Spark top-k query runs this inside a UDF
  * against the broadcast dictionary, the no-Spark oracle and the GraftApi
  * veneer call it directly — all three produce bit-identical rows.
  *
  * Exact reference semantics cloned:
  *  - vector branch: exact retrieval over the whole dictionary, over-fetched
  *    to 2*top_k (disambiguation.py:172; FAISS IndexFlatIP is exact search,
  *    vectorization.py:516-519 — the engine standardizes on cosine, SURVEY X4);
  *  - type branch (F1): taken only when the query HAS a type AND the
  *    dictionary contains at least one entity of that type (the reference
  *    gates the merge on `if type_entities:`, :181); every same-type entity
  *    is cosine-scored (:183-191) and kept only above the similarity floor
  *    cosine > 0.1 (F2, :193-194), sorted by cosine desc (:197);
  *  - merge (F4): type-branch candidates FIRST, then vector hits, dedup
  *    first-wins keyed on entity NAME — not id (:199-213) — truncated to
  *    top_k (:215). When the type branch is NOT taken the reference returns
  *    the raw vector hits truncated to top_k with NO name dedup (:217-218);
  *  - the survivors get the full 4-way comprehensive score, and rank is
  *    assigned 1-based IN MERGE ORDER (`enumerate(similar_entities, 1)`,
  *    :238) — match_candidates never re-sorts by final score (the
  *    final-desc sort at :146 belongs to auto_decide, a different endpoint).
  *
  * Scale note: per-query work is O(|dict|) against a broadcast dictionary —
  * the same shape as the reference's per-request exact scan, and the right
  * plan while dictionaries are broadcastable (MBs even at huge corpus size).
  * For dictionaries beyond executor memory the blocked candidate join
  * (pipeline.Blocking + Scorer.scorePairs/topK) remains the scale path.
  */
object Candidates {

  /** One dictionary entity with its derived scoring sides precomputed. */
  final case class PreppedEntity(
      id: String,
      name: String,
      etype: Option[String],
      aliases: Seq[String],
      tf: TextSim.TfVec,
      emb: Array[Float]) {
    // squared L2 norm hoisted out of the per-pair cosine: dupEdges touches
    // O(|dict|^2) pairs and matchCandidates |dict| per query — recomputing
    // the invariant entity-side norm per pair tripled the dot-loop flops
    val embSq: Double = TextSim.sqNorm(emb)
  }

  /** Prep + deterministic order (sorted by id): ties in any later stable
    * sort resolve by dictionary id order on every JVM / partition layout. */
  def prep(dict: Seq[EntityRecord], cfg: GraftConfig): IndexedSeq[PreppedEntity] =
    dict.sortBy(_.id).map { e =>
      PreppedEntity(
        e.id, e.name, e.entity_type, e.aliases,
        TextSim.tfVector(Scoring.scoringText(e.name, e.aliases, e.definition)),
        TextSim.embed(
          Scoring.embeddingText(e.name, e.aliases, e.definition, e.attributes),
          cfg.embeddingDim))
    }.toIndexedSeq

  final case class Ranked(entityId: String, score: EntityScore, rank: Int)

  /** Dictionary self-dedup edges: ALL entity pairs scoring >= the merge
    * threshold — the canonicalization input. Exact over all i<j pairs via
    * the same branch-and-bound the decision sweep uses (fuzz/lev <= 1, so
    * pairs whose cheap-component bound cannot reach the threshold skip the
    * edit-distance cross-products). Shared verbatim by the no-Spark oracle
    * and the pipeline's broadcast-tier driver path, so engine and oracle
    * canonicalize from identical edges by construction. Dictionary-scale
    * only (O(|dict|^2) cheap flops): the blocked entity self-join
    * (Scorer.entityDupEdges) is the beyond-broadcast path. */
  def dupEdges(prepped: IndexedSeq[PreppedEntity], cfg: GraftConfig): Seq[(String, String)] = {
    val maxRest = cfg.fuzzWeight + cfg.levenshteinWeight
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < prepped.length) {
      val a = prepped(i)
      var j = i + 1
      while (j < prepped.length) {
        val b = prepped(j)
        val bge =
          if (a.emb.length == b.emb.length)
            TextSim.cosinePrenorm(a.emb, b.emb, a.embSq, b.embSq)
          else TextSim.cosine(a.emb, b.emb)
        val ce = TextSim.tfCosine(a.tf, b.tf)
        val mult = Scoring.typeMultiplier(a.etype, b.etype, cfg)
        val bound = (cfg.bgeWeight * bge + cfg.crossEncoderWeight * ce + maxRest) * mult
        if (bound >= cfg.highThreshold) {
          val s = Scoring.pairScorePrepped(
            a.name, a.aliases, a.etype, a.tf, a.emb,
            b.name, b.aliases, b.etype, b.tf, b.emb, cfg)
          if (s.final_score >= cfg.highThreshold) out += ((a.id, b.id))
        }
        j += 1
      }
      i += 1
    }
    out.result()
  }

  /** Top-k candidates for one query side. `excludeId` skips a self-match
    * (the API veneer's input entity may itself be in the dictionary). */
  def matchCandidates(
      name: String,
      aliases: Seq[String],
      qType: Option[String],
      qTf: TextSim.TfVec,
      qEmb: Array[Float],
      dict: IndexedSeq[PreppedEntity],
      cfg: GraftConfig,
      excludeId: Option[String] = None): Seq[Ranked] = {
    val pool = excludeId match {
      case Some(x) => dict.filterNot(_.id == x)
      case None    => dict
    }
    val qSq = TextSim.sqNorm(qEmb)
    val withCos = pool.map { e =>
      (e, if (qEmb.length == e.emb.length)
            TextSim.cosinePrenorm(qEmb, e.emb, qSq, e.embSq)
          else TextSim.cosine(qEmb, e.emb))
    }
    // vector branch: exact top 2*top_k by embedding similarity (stable sort —
    // ties keep the id-sorted dictionary order from `prep`)
    val vector = withCos.sortBy(-_._2).take(cfg.topK * 2)
    // the merge path runs only when the query has a type AND at least one
    // same-type entity exists (reference `if type_entities:` gate, :181)
    val typeEntities = qType match {
      case Some(t) => withCos.filter { case (e, _) => e.etype.contains(t) }
      case None    => IndexedSeq.empty
    }
    val merged =
      if (typeEntities.nonEmpty) {
        // type branch: same-type entities above the cosine floor (F1 + F2)
        val typeBranch = typeEntities.filter(_._2 > cfg.cosineFloor).sortBy(-_._2)
        // F4: first-wins dedup on entity NAME, type branch first, truncate
        val seen = scala.collection.mutable.HashSet[String]()
        (typeBranch ++ vector).filter { case (e, _) => seen.add(e.name) }.take(cfg.topK)
      } else {
        // no type branch: raw vector hits, truncated, NO name dedup (:217-218)
        vector.take(cfg.topK)
      }
    // comprehensive scoring; rank = 1-based merge order (no re-sort — the
    // reference's enumerate(similar_entities, 1), :238)
    merged.zipWithIndex.map { case ((e, _), i) =>
      Ranked(e.id, Scoring.pairScorePrepped(
        name, aliases, qType, qTf, qEmb,
        e.name, e.aliases, e.etype, e.tf, e.emb, cfg), i + 1)
    }
  }
}
