package graft.oracle

import java.util.Locale

import graft.core.{Candidates, GraftConfig, MentionDetector, Scoring, TextSim}
import graft.model._

/** No-Spark golden oracle: the reference pipeline math executed brute-force
  * over in-memory fixtures. The Spark engine's decisions and (subj,pred,obj)
  * triples are compared against this at P/R >= 0.95 (BASELINE.json
  * north_rule; target 1.0 on deterministic fixtures), and the driver's
  * correctness gate hash-compares the engine's kg_* query outputs against
  * this oracle's rows materialized as parquet (Verify).
  *
  * Brute force = every mention scored against EVERY dictionary entity (the
  * honest analog of the reference's exact IndexFlatIP retrieval,
  * /root/reference/services/vectorization.py:516-519: exact search, no
  * approximation) — the engine's blocked candidate join must approximate
  * this top-1. The top-k candidates surface instead clones the reference's
  * retrieval merge exactly (over-fetch + type-branch floor + name dedup +
  * truncate) via the shared core.Candidates.matchCandidates.
  */
object Oracle {

  /** One kg_candidates_topk row. */
  final case class CandidateRow(
      mention_id: String, entity_id: String, rank: Int, final_score: Double)

  final case class Result(
      mentions: Seq[Mention],
      decisions: Seq[Decision],
      forcedDecisions: Seq[Decision], // same best, forceDecision=true (X11)
      sameAs: Seq[(String, String)], // (dup, canonical)
      triples: Set[Triple],
      candidatesTopK: Seq[CandidateRow])

  def run(turns: Seq[Turn], dict: Seq[EntityRecord], cfg: GraftConfig): Result = {
    val idx = MentionDetector.buildIndex(dict)
    val mentions = turns.sortBy(t => (t.conv_id, t.turn_idx)).flatMap(MentionDetector.detect(_, idx))

    // entity sides prepped once (TF vector of X1, embedding of X2) — the
    // identical code path the Spark pipeline broadcasts
    val prepped = Candidates.prep(dict, cfg)
    val byId = dict.map(e => e.id -> e).toMap

    val perMention = mentions.map { m =>
      val mTf = TextSim.tfVector(Scoring.mentionScoringText(m))
      val mEmb = TextSim.embed(Scoring.mentionEmbeddingText(m), cfg.embeddingDim)
      val scored = prepped.map { e =>
        e -> Scoring.pairScorePrepped(
          m.surface, Nil, m.mention_type, mTf, mEmb,
          e.name, e.aliases, e.etype, e.tf, e.emb, cfg)
      }
      val best = scored.sortBy { case (e, s) => (-s.final_score, e.id) }.headOption
        .map { case (e, s) => (byId(e.id), s) }
      val decision = Scoring.decideMention(m, best, cfg)
      // forced twin: identical best candidate, force_decision=true resolves
      // the ambiguous band at the midpoint (disambiguation.py:403-407)
      val forced = Scoring.decideMention(m, best, cfg.copy(forceDecision = true))
      val topk = Candidates
        .matchCandidates(m.surface, Nil, m.mention_type, mTf, mEmb, prepped, cfg)
        .map(r => CandidateRow(m.mention_id, r.entityId, r.rank, r.score.final_score))
      (decision, forced, topk)
    }
    val decisions = perMention.map(_._1)
    val forcedDecisions = perMention.map(_._2)
    val candidatesTopK = perMention.flatMap(_._3)

    // dictionary self-dedup edges: entity pairs scoring >= HIGH threshold
    // (Candidates.dupEdges — the identical code the pipeline's broadcast
    // tier runs, bound-pruned but exact over all pairs)
    val dupEdges = Candidates.dupEdges(prepped, cfg)

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

    Result(mentions, decisions, forcedDecisions, sameAs, triples.result(), candidatesTopK)
  }

  /** (turn_subj, canonical_obj, n) mention-edge multiplicities — the props
    * twin of the engine's `mentions` triples (props["n"]): how many times a
    * turn mentions the same canonical entity (the information a bare
    * distinct triple discards). */
  def mentionPropCounts(r: Result): Seq[(String, String, Long)] = {
    val canon = r.sameAs.toMap
    r.decisions
      .flatMap(d => d.resolved_id.map(rid =>
        (d.mention_id.split("#").take(2).mkString("#"), canon.getOrElse(rid, rid))))
      .groupBy(identity).toSeq
      .map { case ((s, o), xs) => (s, o, xs.size.toLong) }
      .sortBy(x => (x._1, x._2))
  }

  /** (id, component) labeling over dict ids + created ids — the oracle twin
    * of the pipeline's kg_components output. */
  def components(dict: Seq[EntityRecord], r: Result): Seq[(String, String)] = {
    val nodes = (dict.map(_.id) ++ r.decisions.flatMap(_.resolved_id)).distinct
    val canon = r.sameAs.toMap
    nodes.map(n => n -> canon.getOrElse(n, n)).sorted
  }

  /** (decision, n, n_recent, recent_rate) — twin of
    * KgPipeline.decisionStats: totals plus the trailing-`recentN` window
    * (reference "last 1000" stats, disambiguation.py:487-509). `decisions`
    * must be in (conv_id, turn_idx, offset) order, which `run` guarantees. */
  def decisionStats(
      decisions: Seq[Decision], recentN: Int = 1000): Seq[(String, Long, Long, Double)] = {
    val all = decisions.groupBy(_.decision).view.mapValues(_.size.toLong).toMap
    val recent = decisions.takeRight(recentN)
    val rc = recent.groupBy(_.decision).view.mapValues(_.size.toLong).toMap
    val rt = recent.size
    all.toSeq.sortBy(_._1).map { case (d, n) =>
      val nr = rc.getOrElse(d, 0L)
      (d, n, nr, nr.toDouble / rt)
    }
  }

  /** (mention_id, decision, similarity_details, reasoning) — twin of the
    * kg_decisions_explained query; same shared templates, same
    * Locale.US Formatter semantics as Spark's format_string. */
  def explained(d: Decision, cfg: GraftConfig): (String, String, String, String) = {
    val details = String.format(Locale.US, Scoring.detailsTemplate(cfg),
      Double.box(d.bge_score), Double.box(d.cross_encoder_score),
      Double.box(d.fuzz_score), Double.box(d.levenshtein_score),
      Double.box(d.final_score))
    val reasoning = d.decision match {
      case Decisions.Merge =>
        String.format(Locale.US, Scoring.mergeReasonTemplate(cfg),
          Double.box(d.final_score), Double.box(cfg.highThreshold), d.match_id.orNull)
      case Decisions.Create =>
        String.format(Locale.US, Scoring.createReasonTemplate(cfg),
          Double.box(d.final_score), Double.box(cfg.lowThreshold))
      case _ =>
        String.format(Locale.US, Scoring.ambiguousReasonTemplate(cfg),
          Double.box(d.final_score))
    }
    (d.mention_id, d.decision, details, reasoning)
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
