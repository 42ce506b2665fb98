package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, size => asize}

import graft.core.{Candidates, GraftConfig, Scoring, TextSim}
import graft.model.{Decisions, EntityRecord, EntityScore}
import graft.pipeline.{DbRouter, KgPipeline}

/** Single-record API veneer (SURVEY.md §7.2 M5) mirroring the reference's
  * request/response surface (/root/reference/main.py POST /auto-decide and
  * POST /match-candidates) over the engine's exact scoring semantics.
  *
  * One input entity against a dictionary is record-at-a-time work — no
  * cluster needed — so this is pure Scala sharing the same `core` functions
  * the Spark pipeline and the oracle run; a service front-end would hold the
  * dictionary (and its prepped sides) in memory exactly like the engine
  * broadcasts it. Retrieval is exact over the whole dictionary, matching
  * the reference's IndexFlatIP exact search.
  */
object GraftApi {

  /** Reference CandidateMatch analog: candidate + scores + 1-based rank. */
  final case class Candidate(entity: EntityRecord, score: EntityScore, rank: Int,
      similarityDetails: String)

  /** Reference DisambiguationResult analog. */
  final case class Result(
      decision: String,
      matchId: Option[String],
      matchEntity: Option[EntityRecord],
      score: EntityScore,
      confidence: Double,
      reasoning: String)

  /** Prepped dictionary side, built once and reused across requests. */
  final class Dictionary(val entities: Seq[EntityRecord], cfg: GraftConfig) {
    private[api] val prepped = entities.map { e =>
      val x1 = Scoring.scoringText(e.name, e.aliases, e.definition)
      val emb = TextSim.embed(
        Scoring.embeddingText(e.name, e.aliases, e.definition, e.attributes), cfg.embeddingDim)
      (e, TextSim.tfVector(x1), emb)
    }
    private[api] val candSides = Candidates.prep(entities, cfg)
    private[api] val byId = entities.map(e => e.id -> e).toMap
  }

  private def scored(input: EntityRecord, dict: Dictionary, cfg: GraftConfig): Seq[(EntityRecord, EntityScore)] = {
    val x1 = Scoring.scoringText(input.name, input.aliases, input.definition)
    val tf = TextSim.tfVector(x1)
    val emb = TextSim.embed(
      Scoring.embeddingText(input.name, input.aliases, input.definition, input.attributes),
      cfg.embeddingDim)
    dict.prepped
      .filter { case (e, _, _) => e.id != input.id } // never match self
      .map { case (e, etf, eemb) =>
        e -> Scoring.pairScorePrepped(
          input.name, input.aliases, input.entity_type, tf, emb,
          e.name, e.aliases, e.entity_type, etf, eemb, cfg)
      }
      .sortBy { case (e, s) => (-s.final_score, e.id) }
  }

  private def details(s: EntityScore, typeMatch: Boolean): String =
    f"bge=${s.bge_score}%.4f cross=${s.cross_encoder_score}%.4f " +
      f"fuzz=${s.fuzz_score}%.4f lev=${s.levenshtein_score}%.4f " +
      f"final=${s.final_score}%.4f typeMatch=$typeMatch"

  /** POST /match-candidates analog: the reference's retrieval merge
    * (vector over-fetch + type-branch cosine floor F2 + first-wins name
    * dedup F4 on the merge path only + truncate, disambiguation.py:168-224)
    * then comprehensive scoring with rank assigned in merge order (:238) —
    * via the shared core.Candidates path the Spark kg_candidates_topk query
    * and the oracle also run. */
  def matchCandidates(input: EntityRecord, dict: Dictionary,
      cfg: GraftConfig = GraftConfig.default, topK: Int = 10): Seq[Candidate] = {
    val x1 = Scoring.scoringText(input.name, input.aliases, input.definition)
    val tf = TextSim.tfVector(x1)
    val emb = TextSim.embed(
      Scoring.embeddingText(input.name, input.aliases, input.definition, input.attributes),
      cfg.embeddingDim)
    Candidates.matchCandidates(
        input.name, input.aliases, input.entity_type, tf, emb,
        dict.candSides, cfg.copy(topK = topK), excludeId = Some(input.id))
      .map { r =>
        val e = dict.byId(r.entityId)
        Candidate(e, r.score, r.rank,
          details(r.score, input.entity_type.isDefined && input.entity_type == e.entity_type))
      }
  }

  /** POST /auto-decide analog: best candidate -> threshold decision.
    * No candidates => create with confidence 1.0 (disambiguation.py:126-135). */
  def autoDecide(input: EntityRecord, dict: Dictionary,
      cfg: GraftConfig = GraftConfig.default): Result =
    scored(input, dict, cfg).headOption match {
      case None =>
        Result(Decisions.Create, None, None, EntityScore(0, 0, 0, 0, 0), 1.0,
          "no candidates: create new entity")
      case Some((best, s)) =>
        val d = Scoring.decide(s.final_score, cfg)
        // shared templates (Scoring.*ReasonTemplate) keep this surface
        // byte-identical with kg_decisions_explained and the oracle
        val reasoning = d match {
          case Decisions.Merge =>
            String.format(java.util.Locale.US, Scoring.mergeReasonTemplate(cfg),
              Double.box(s.final_score), Double.box(cfg.highThreshold), best.id)
          case Decisions.Create =>
            String.format(java.util.Locale.US, Scoring.createReasonTemplate(cfg),
              Double.box(s.final_score), Double.box(cfg.lowThreshold))
          case _ =>
            String.format(java.util.Locale.US, Scoring.ambiguousReasonTemplate(cfg),
              Double.box(s.final_score))
        }
        Result(d,
          if (d == Decisions.Merge) Some(best.id) else None,
          if (d == Decisions.Merge) Some(best) else None,
          s, s.final_score, reasoning)
    }

  // ------------------------------------------------- read endpoints (veneer)
  // The reference also serves GET /history, /stats and /databases
  // (/root/reference/main.py:218-297) — metadata reads over the stores. The
  // engine's frames already exist (decisions table, DbRouter); these are the
  // one-line wrappers that complete endpoint parity, sharing the exact code
  // the driver-gated queries run so the surfaces can never diverge.

  /** GET /history analog (main.py:218-234): the most recent `limit`
    * decisions. The reference orders by wall-clock insert time; the engine's
    * deterministic total order is (ts, conv_id, turn_idx, offset) when the
    * decisions frame carries the turn timestamp, else (conv_id, turn_idx,
    * offset) — the same recency order decisionStats' trailing window uses.
    * NOTE: the conv_id leg is a LEXICOGRAPHIC desc; it equals recency only
    * for fixed-width (zero-padded) conv ids like the engine's fixtures.
    * External corpora with unpadded ids ("conv_9" > "conv_10") should carry
    * `ts` so the timestamp leg defines the window. */
  def history(decisions: DataFrame, limit: Int = 50): DataFrame = {
    val base = Seq(col("conv_id").desc, col("turn_idx").desc, col("offset").desc)
    val order =
      if (decisions.columns.contains("ts")) col("ts").desc +: base else base
    decisions
      .orderBy(order: _*)
      .limit(limit)
      .select("mention_id", "surface", "decision", "match_id", "resolved_id", "final_score")
  }

  /** GET /stats analog (main.py:272-297): decision totals + the trailing
    * recent-window counts/rates — the identical frame the kg_decision_stats
    * driver query gates (KgPipeline.decisionStats). */
  def stats(decisions: DataFrame, recentN: Int = 1000): DataFrame =
    KgPipeline.decisionStats(decisions, recentN)

  /** GET /stats index section analog (vectorization.get_index_stats,
    * /root/reference/services/vectorization.py:734-765): entity count +
    * embedding dimension of an embeddings frame (vec column `emb`). */
  def indexStats(embeddings: DataFrame, embCol: String = "emb"): DataFrame =
    embeddings.agg(
      count(lit(1)).as("entity_count"),
      org.apache.spark.sql.functions.max(asize(col(embCol))).cast("long").as("dimension"))

  /** GET /databases analog (main.py:236-270): configured db_keys. */
  def databases(router: DbRouter): Seq[String] = router.databases

  /** get_related_entities analog widened by the graph layer
    * (/root/reference/services/neo4j_database.py:437-471 returns the 1-hop
    * relationship neighbors): direct co-mention partners ranked by shared-
    * turn support, plus neighborhood-overlap similars
    * (GraphOps.neighborSimilarity) that may never co-occur directly.
    * Output: (entity, relation ∈ {comention, similar}, score) — support
    * counts and jaccards are different scales on purpose; the relation
    * column says which one you are reading. */
  def relatedEntities(triples: DataFrame, entityId: String,
                      tau: Double = 0.25): DataFrame = {
    import graft.operators.GraphOps
    val pairs = GraphOps.coMentions(triples)
    val direct = pairs
      .filter(col("entity_a") === entityId || col("entity_b") === entityId)
      .select(
        org.apache.spark.sql.functions
          .when(col("entity_a") === entityId, col("entity_b"))
          .otherwise(col("entity_a")).as("entity"),
        lit("comention").as("relation"),
        col("n_turns").cast("double").as("score"))
    val similar = GraphOps.neighborSimilarity(
        pairs.select(col("entity_a").as("a"), col("entity_b").as("b")), tau)
      .filter(col("entity_a") === entityId || col("entity_b") === entityId)
      .select(
        org.apache.spark.sql.functions
          .when(col("entity_a") === entityId, col("entity_b"))
          .otherwise(col("entity_a")).as("entity"),
        lit("similar").as("relation"),
        col("jaccard").as("score"))
    direct.unionByName(similar)
  }
}
