package graft.oracle

import graft.core.{GraftConfig, MentionDetector, Scoring, TextSim}
import graft.model._

/** No-Spark golden oracle: the reference pipeline math executed brute-force
  * over in-memory fixtures. The Spark engine's decisions and (subj,pred,obj)
  * triples are compared against this at P/R >= 0.95 (BASELINE.json
  * north_rule; target 1.0 on deterministic fixtures).
  *
  * Brute force = every mention scored against EVERY dictionary entity (the
  * honest analog of the reference's exact IndexFlatIP retrieval,
  * /root/reference/services/vectorization.py:516-519: exact search, no
  * approximation) — the engine's blocked candidate join must approximate
  * this top-1.
  */
object Oracle {

  final case class Result(
      mentions: Seq[Mention],
      decisions: Seq[Decision],
      sameAs: Seq[(String, String)], // (dup, canonical)
      triples: Set[Triple])

  def run(turns: Seq[Turn], dict: Seq[EntityRecord], cfg: GraftConfig): Result = {
    val idx = MentionDetector.buildIndex(dict)
    val mentions = turns.sortBy(t => (t.conv_id, t.turn_idx)).flatMap(MentionDetector.detect(_, idx))

    // precompute entity-side texts + embeddings
    val entX1 = dict.map(e => e.id -> Scoring.scoringText(e.name, e.aliases, e.definition)).toMap
    val entEmb = dict.map { e =>
      e.id -> TextSim.embed(
        Scoring.embeddingText(e.name, e.aliases, e.definition, e.attributes), cfg.embeddingDim)
    }.toMap

    val decisions = mentions.map { m =>
      val mX1 = Scoring.mentionScoringText(m)
      val mEmb = TextSim.embed(Scoring.mentionEmbeddingText(m), cfg.embeddingDim)
      val scored = dict.map { e =>
        val s = Scoring.pairScore(
          m.surface, Nil, m.mention_type, mX1, mEmb,
          e.name, e.aliases, e.entity_type, entX1(e.id), entEmb(e.id), cfg)
        (e, s)
      }
      val best = scored.sortBy { case (e, s) => (-s.final_score, e.id) }.headOption
      Scoring.decideMention(m, best, cfg)
    }

    // dictionary self-dedup edges: entity pairs scoring >= HIGH threshold
    val dupEdges = for {
      (a, i) <- dict.zipWithIndex
      b <- dict.drop(i + 1)
      s = Scoring.pairScore(
        a.name, a.aliases, a.entity_type, entX1(a.id), entEmb(a.id),
        b.name, b.aliases, b.entity_type, entX1(b.id), entEmb(b.id), cfg)
      if s.final_score >= cfg.highThreshold
    } yield (a.id, b.id)

    val canon = connectedComponents(
      dict.map(_.id) ++ decisions.flatMap(_.resolved_id), dupEdges)
    val sameAs = canon.toSeq.filter { case (n, c) => n != c }.sorted

    val triples = Set.newBuilder[Triple]
    for (e <- dict) {
      e.entity_type.foreach(t => triples += Triple(e.id, "type", t))
      e.aliases.foreach(a => triples += Triple(e.id, "alias", a))
      for ((k, vs) <- e.attributes; v <- vs) triples += Triple(e.id, s"attr:$k", v)
      e.source.foreach(s => triples += Triple(e.id, "source", s))
    }
    for ((dup, c) <- sameAs) triples += Triple(dup, "same_as", c)
    for (d <- decisions; r <- d.resolved_id)
      triples += Triple(d.mention_id.split("#").take(2).mkString("#"), "mentions",
        canon.getOrElse(r, r))

    Result(mentions, decisions, sameAs, triples.result())
  }

  /** Union-find connected components; canonical = lexicographic min id.
    * (Shared implementation with the pipeline's driver-local CC fast path.) */
  def connectedComponents(nodes: Seq[String], edges: Seq[(String, String)]): Map[String, String] =
    graft.core.UnionFind.components(nodes, edges)

  def precisionRecall[T](engine: Set[T], oracle: Set[T]): (Double, Double) = {
    val inter = engine.intersect(oracle).size.toDouble
    val p = if (engine.isEmpty) 1.0 else inter / engine.size
    val r = if (oracle.isEmpty) 1.0 else inter / oracle.size
    (p, r)
  }
}
