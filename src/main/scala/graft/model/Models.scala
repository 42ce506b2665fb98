package graft.model

import java.sql.Timestamp

/** One transcript turn — the primary input row shape (BASELINE.json
  * input_hint): (conv_id, turn_idx, role, text, tool, ts). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Entity record — Spark restatement of the reference's pydantic Entity
  * (/root/reference/models/entity.py:9-23). `attributes` stays typed
  * (map<string,array<string>>) instead of the reference's JSON-string blob
  * (services/neo4j_database.py:163). */
final case class EntityRecord(
    id: String,
    name: String,
    entity_type: Option[String],
    aliases: Seq[String],
    definition: Option[String],
    attributes: Map[String, Seq[String]],
    source: Option[String],
    create_time: Option[Timestamp])

/** A detected mention: one dictionary surface found in one turn.
  * mention_id = conv_id#turn_idx#offset is globally unique + deterministic. */
final case class Mention(
    mention_id: String,
    conv_id: String,
    turn_idx: Int,
    surface: String,
    offset: Int,
    mention_type: Option[String],
    context: String)

/** The 5-score vector (/root/reference/models/entity.py:25-31). */
final case class EntityScore(
    bge_score: Double,
    cross_encoder_score: Double,
    fuzz_score: Double,
    levenshtein_score: Double,
    final_score: Double)

/** Per-mention disambiguation outcome. match_id is set only for merge
  * (reference services/disambiguation.py:411-412); resolved_id is the node
  * the mention links to (match for merge, deterministic created id for
  * create, null for ambiguous). */
final case class Decision(
    mention_id: String,
    surface: String,
    decision: String, // merge | create | ambiguous
    match_id: Option[String],
    resolved_id: Option[String],
    bge_score: Double,
    cross_encoder_score: Double,
    fuzz_score: Double,
    levenshtein_score: Double,
    final_score: Double)

final case class Triple(subj: String, pred: String, obj: String)

object Decisions {
  val Merge = "merge"
  val Create = "create"
  val Ambiguous = "ambiguous"
}
