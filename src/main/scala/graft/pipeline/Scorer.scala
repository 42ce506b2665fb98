package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GraftConfig, Scoring, TextSim}
import graft.model.EntityScore

/** Candidate-pair scoring + per-mention decision.
  *
  * One fused UDF computes all five scores in a single pass over the alias
  * cross-product (reference scatters this across four methods,
  * /root/reference/services/disambiguation.py:259-379). Top-1 per mention =
  * window row_number over (final desc, entity id asc) — the reference's
  * candidates.sort + [0] (disambiguation.py:146-149) with a deterministic
  * tiebreak. Decision thresholds are plain when/otherwise column logic.
  */
object Scorer {

  /** struct(bge, ce, fuzz, lev, final) over a prepared mention x entity row. */
  def pairScoreUdf(cfg: GraftConfig) = udf {
    (surface: String, mentionType: String, mX1: String, mEmb: Seq[Float],
     name: String, aliases: Seq[String], entityType: String, eX1: String, eEmb: Seq[Float]) =>
      Scoring.pairScore(
        surface, Nil, Option(mentionType), mX1,
        if (mEmb == null) Array.empty[Float] else mEmb.toArray,
        name, if (aliases == null) Nil else aliases, Option(entityType), eX1,
        if (eEmb == null) Array.empty[Float] else eEmb.toArray, cfg)
  }

  /** mention df columns: mention_id, surface, mention_type, context.
    * Derived here: m_x1 (= X2: surface + context, mentions carry no
    * aliases/attributes) and m_emb. */
  def prepareMentions(mentions: DataFrame, cfg: GraftConfig): DataFrame = {
    val dim = cfg.embeddingDim
    val x1 = udf((surface: String, context: String) =>
      Scoring.scoringText(surface, Nil, Option(context)))
    val emb = udf((x: String) => TextSim.embed(x, dim))
    mentions
      .withColumn("m_x1", x1(col("surface"), col("context")))
      .withColumn("m_emb", emb(col("m_x1")))
  }

  /** Score all candidate pairs. `entities` must be EntityStore.prepare-d
    * (has x1, emb). broadcastEntities: hint when the dictionary fits on
    * executors (the common KG case — dictionaries are MBs, mentions are TBs). */
  def scorePairs(
      pairs: DataFrame,
      mentionsPrep: DataFrame,
      entities: DataFrame,
      cfg: GraftConfig,
      broadcastEntities: Boolean = true): DataFrame = {
    val ent = entities.select(
      col("id"), col("name"), col("aliases"), col("entity_type"),
      col("x1").as("e_x1"), col("emb").as("e_emb"))
    val entSide = if (broadcastEntities) broadcast(ent) else ent
    val score = pairScoreUdf(cfg)
    pairs
      .join(mentionsPrep, "mention_id")
      .join(entSide, "id")
      .withColumn("s", score(
        col("surface"), col("mention_type"), col("m_x1"), col("m_emb"),
        col("name"), col("aliases"), col("entity_type"), col("e_x1"), col("e_emb")))
      .select(
        col("mention_id"), col("surface"), col("id").as("entity_id"),
        col("s.bge_score").as("bge_score"),
        col("s.cross_encoder_score").as("cross_encoder_score"),
        col("s.fuzz_score").as("fuzz_score"),
        col("s.levenshtein_score").as("levenshtein_score"),
        col("s.final_score").as("final_score"))
  }

  /** Per-mention top-k candidates with 1-based rank (reference
    * match_candidates, disambiguation.py:226-257). */
  def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("mention_id")
      .orderBy(col("final_score").desc, col("entity_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-mention decision. Left-joins ALL mentions so candidate-less
    * mentions fall through to create-with-confidence-1.0 (reference
    * disambiguation.py:126-135). */
  def decide(spark: SparkSession, mentions: DataFrame, scored: DataFrame, cfg: GraftConfig): DataFrame = {
    val createdId = udf((surface: String) => Scoring.createdId(surface))
    val best = topK(scored, 1).drop("rank", "surface")
    val joined = mentions
      .select("mention_id", "conv_id", "turn_idx", "surface")
      .join(best, Seq("mention_id"), "left_outer")
    val decided = joined.withColumn("decision",
      when(col("entity_id").isNull, lit(graft.model.Decisions.Create))
        .when(col("final_score") >= cfg.highThreshold, lit(graft.model.Decisions.Merge))
        .when(col("final_score") <= cfg.lowThreshold, lit(graft.model.Decisions.Create))
        .otherwise(
          if (cfg.forceDecision)
            when(col("final_score") > cfg.midThreshold, lit(graft.model.Decisions.Merge))
              .otherwise(lit(graft.model.Decisions.Create))
          else lit(graft.model.Decisions.Ambiguous)))
    decided
      .withColumn("match_id",
        when(col("decision") === graft.model.Decisions.Merge, col("entity_id")))
      .withColumn("resolved_id",
        when(col("decision") === graft.model.Decisions.Merge, col("entity_id"))
          .when(col("decision") === graft.model.Decisions.Create, createdId(col("surface"))))
      .withColumn("bge_score", coalesce(col("bge_score"), lit(0.0)))
      .withColumn("cross_encoder_score", coalesce(col("cross_encoder_score"), lit(0.0)))
      .withColumn("fuzz_score", coalesce(col("fuzz_score"), lit(0.0)))
      .withColumn("levenshtein_score", coalesce(col("levenshtein_score"), lit(0.0)))
      .withColumn("final_score",
        coalesce(col("final_score"), lit(1.0))) // no-candidate create: confidence 1.0
      .drop("entity_id")
  }

  /** Entity x entity scorer (both sides carry aliases), 10-arg UDF. */
  def entityPairScoreUdf(cfg: GraftConfig) = udf {
    (nameA: String, aliasesA: Seq[String], typeA: String, x1A: String, embA: Seq[Float],
     nameB: String, aliasesB: Seq[String], typeB: String, x1B: String, embB: Seq[Float]) =>
      Scoring.pairScore(
        nameA, if (aliasesA == null) Nil else aliasesA, Option(typeA), x1A,
        if (embA == null) Array.empty[Float] else embA.toArray,
        nameB, if (aliasesB == null) Nil else aliasesB, Option(typeB), x1B,
        if (embB == null) Array.empty[Float] else embB.toArray, cfg)
  }

  /** Dictionary self-dedup edges: blocked entity pairs scoring >= HIGH. */
  def entityDupEdges(entityB: DataFrame, entities: DataFrame, cfg: GraftConfig): DataFrame = {
    val a = entityB.select(col("key"), col("id").as("src"))
    val b = entityB.select(col("key"), col("id").as("dst"))
    val pairs = a.join(b, "key").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
    val ent = entities.select(
      col("id"), col("name"), col("aliases"), col("entity_type"), col("x1"), col("emb"))
    val score = entityPairScoreUdf(cfg)
    pairs
      .join(broadcast(ent.select(
        col("id").as("src"), col("name").as("a_name"), col("aliases").as("a_aliases"),
        col("entity_type").as("a_type"), col("x1").as("a_x1"), col("emb").as("a_emb"))), "src")
      .join(broadcast(ent.select(
        col("id").as("dst"), col("name").as("b_name"), col("aliases").as("b_aliases"),
        col("entity_type").as("b_type"), col("x1").as("b_x1"), col("emb").as("b_emb"))), "dst")
      .withColumn("s", score(
        col("a_name"), col("a_aliases"), col("a_type"), col("a_x1"), col("a_emb"),
        col("b_name"), col("b_aliases"), col("b_type"), col("b_x1"), col("b_emb")))
      .filter(col("s.final_score") >= cfg.highThreshold)
      .select("src", "dst")
  }
}
