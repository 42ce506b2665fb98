package graft.core

import graft.model.{Decision, Decisions, EntityRecord, EntityScore, Mention}

/** The reference scoring + decision semantics as pure functions.
  * Shared verbatim by the Spark pipeline (inside a fused UDF) and the
  * no-Spark oracle, so engine-vs-oracle P/R measures pipeline fidelity,
  * not scorer drift.
  *
  * Reference provenance:
  *  - weighted sum + type multiplier:
  *    /root/reference/services/disambiguation.py:259-311
  *  - decision thresholds + force_decision midpoint:
  *    /root/reference/services/disambiguation.py:381-407
  *  - scoring text (X1, attributes EXCLUDED): disambiguation.py:427-437
  *  - embedding text (X2, attributes INCLUDED "k: v1, v2"):
  *    vectorization.py:345-366
  *  - created-entity id: deterministic replacement for the wall-clock id
  *    generator (neo4j_database.py:473-488) — documented divergence, needed
  *    for reproducibility (SURVEY.md X12).
  */
object Scoring {

  /** X1 — scoring text: name + aliases + definition, attributes excluded. */
  def scoringText(name: String, aliases: Seq[String], definition: Option[String]): String =
    (Seq(name) ++ aliases ++ definition.toSeq).mkString(" ")

  /** X2 — embedding/index text: X1 plus attributes rendered "k: v1, v2".
    * Attribute keys are sorted for determinism (the reference iterates dict
    * order = insertion order; sorting is the engine's stable choice). */
  def embeddingText(
      name: String,
      aliases: Seq[String],
      definition: Option[String],
      attributes: Map[String, Seq[String]]): String = {
    val attrParts = attributes.toSeq.sortBy(_._1).map { case (k, v) => s"$k: ${v.mkString(", ")}" }
    (Seq(name) ++ aliases ++ definition.toSeq ++ attrParts).mkString(" ")
  }

  def typeMultiplier(ta: Option[String], tb: Option[String], cfg: GraftConfig): Double =
    (ta, tb) match {
      case (Some(a), Some(b)) => if (a == b) cfg.typeMatchBonus else cfg.typeMismatchPenalty
      case _                  => 1.0
    }

  /** Fused pair scorer: one pass over the alias cross-product, all 5 scores.
    * `bge` is cosine over the deterministic embeddings of the X2 texts.
    * Delegates to the prepped variant so every caller (oracle, Spark UDF,
    * tests) computes the context score through the identical code path —
    * bit-exact across engines and parallelism levels. */
  def pairScore(
      nameA: String,
      aliasesA: Seq[String],
      typeA: Option[String],
      textA: String, // X1 scoring text of side A
      embA: Array[Float],
      nameB: String,
      aliasesB: Seq[String],
      typeB: Option[String],
      textB: String,
      embB: Array[Float],
      cfg: GraftConfig): EntityScore =
    pairScorePrepped(
      nameA, aliasesA, typeA, TextSim.tfVector(textA), embA,
      nameB, aliasesB, typeB, TextSim.tfVector(textB), embB, cfg)

  /** Hot-path variant with the per-side TF vectors precomputed (once per
    * mention/entity, not once per candidate pair). */
  def pairScorePrepped(
      nameA: String,
      aliasesA: Seq[String],
      typeA: Option[String],
      tfA: TextSim.TfVec,
      embA: Array[Float],
      nameB: String,
      aliasesB: Seq[String],
      typeB: Option[String],
      tfB: TextSim.TfVec,
      embB: Array[Float],
      cfg: GraftConfig): EntityScore = {
    val bge = TextSim.cosine(embA, embB)
    val ce = TextSim.tfCosine(tfA, tfB)
    val fuzz = TextSim.fuzzScore(nameA, aliasesA, nameB, aliasesB)
    val lev = TextSim.levScore(nameA, aliasesA, nameB, aliasesB)
    val weighted =
      bge * cfg.bgeWeight + ce * cfg.crossEncoderWeight +
        fuzz * cfg.fuzzWeight + lev * cfg.levenshteinWeight
    val finalScore = weighted * typeMultiplier(typeA, typeB, cfg)
    EntityScore(bge, ce, fuzz, lev, finalScore)
  }

  /** X11 — threshold decision. */
  def decide(finalScore: Double, cfg: GraftConfig): String =
    if (finalScore >= cfg.highThreshold) Decisions.Merge
    else if (finalScore <= cfg.lowThreshold) Decisions.Create
    else if (cfg.forceDecision) {
      if (finalScore > cfg.midThreshold) Decisions.Merge else Decisions.Create
    } else Decisions.Ambiguous

  /** Deterministic created-entity id for a `create` decision: mentions of the
    * same (lowercased) surface collapse to the same new node. */
  def createdId(surface: String): String = {
    val h = scala.util.hashing.MurmurHash3.stringHash(surface.toLowerCase, 0x5f3759df)
    f"created_${h & 0xffffffffL}%08x"
  }

  /** Full per-mention decision given its best-scoring candidate (or none).
    * No candidates => create with confidence 1.0
    * (reference services/disambiguation.py:126-135). */
  def decideMention(
      m: Mention,
      best: Option[(EntityRecord, EntityScore)],
      cfg: GraftConfig): Decision = best match {
    case None =>
      Decision(m.mention_id, m.surface, Decisions.Create, None, Some(createdId(m.surface)),
        0.0, 0.0, 0.0, 0.0, 1.0)
    case Some((cand, s)) =>
      val d = decide(s.final_score, cfg)
      val matchId = if (d == Decisions.Merge) Some(cand.id) else None
      val resolved = d match {
        case Decisions.Merge  => Some(cand.id)
        case Decisions.Create => Some(createdId(m.surface))
        case _                => None
      }
      Decision(m.mention_id, m.surface, d, matchId, resolved,
        s.bge_score, s.cross_encoder_score, s.fuzz_score, s.levenshtein_score, s.final_score)
  }

  /** X13/X14 format templates — shared literals so the Spark format_string
    * surface (kg_decisions_explained) and the pure-Scala oracle twin render
    * byte-identical text (both run java.util.Formatter under Locale.US).
    * English restatements of the reference's similarity_details
    * (disambiguation.py:439-463) and reasoning templates (:388-407) —
    * documented divergence from the Chinese originals; thresholds are
    * interpolated from config, never hardcoded. */
  val DetailsTemplate = "bge=%.4f cross=%.4f fuzz=%.4f lev=%.4f final=%.4f"
  val MergeReasonTemplate = "final %.4f >= high threshold %.2f: merge with %s"
  val CreateReasonTemplate = "final %.4f <= low threshold %.2f: create new entity"
  val AmbiguousReasonTemplate = "final %.4f between thresholds: ambiguous"

  /** zh template set (cfg.reasoningLang = "zh") — the reference emits
    * Chinese reasoning text (disambiguation.py:388-407); these are
    * ENGINE-AUTHORED zh phrasings (nothing copied from the reference's
    * strings), same format-argument order as the English set so every call
    * site switches by template alone. */
  val DetailsTemplateZh = "语义=%.4f 上下文=%.4f 模糊=%.4f 编辑=%.4f 综合=%.4f"
  val MergeReasonTemplateZh = "综合得分%.4f达到合并阈值%.2f，并入实体%s"
  val CreateReasonTemplateZh = "综合得分%.4f不高于新建阈值%.2f，创建新实体"
  val AmbiguousReasonTemplateZh = "综合得分%.4f介于两阈值之间，待人工复核"

  def detailsTemplate(cfg: GraftConfig): String =
    if (cfg.reasoningLang == "zh") DetailsTemplateZh else DetailsTemplate
  def mergeReasonTemplate(cfg: GraftConfig): String =
    if (cfg.reasoningLang == "zh") MergeReasonTemplateZh else MergeReasonTemplate
  def createReasonTemplate(cfg: GraftConfig): String =
    if (cfg.reasoningLang == "zh") CreateReasonTemplateZh else CreateReasonTemplate
  def ambiguousReasonTemplate(cfg: GraftConfig): String =
    if (cfg.reasoningLang == "zh") AmbiguousReasonTemplateZh else AmbiguousReasonTemplate

  /** The mention viewed as a query entity: name = surface, definition = the
    * turn text (context), no aliases/attributes. */
  def mentionScoringText(m: Mention): String = scoringText(m.surface, Nil, Some(m.context))
  def mentionEmbeddingText(m: Mention): String =
    embeddingText(m.surface, Nil, Some(m.context), Map.empty)
}
