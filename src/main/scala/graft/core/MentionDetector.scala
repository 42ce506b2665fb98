package graft.core

import graft.model.{EntityRecord, Mention, Turn}

/** Dictionary-based mention detection — the engine analog of the reference's
  * single-record entity input (the reference receives one entity per HTTP
  * call; a transcript pipeline must first FIND candidate entity mentions in
  * turn text). Pure Scala so the Spark pipeline (via a broadcast
  * SurfaceIndex) and the no-Spark oracle share identical semantics.
  *
  * Rule: tokenize on whitespace; at each token position match the LONGEST
  * dictionary surface (name or alias, case-insensitive, whole-token
  * sequence). mention_id = conv_id#turn_idx#tokenOffset is unique and
  * deterministic.
  */
object MentionDetector {

  /** surfaceLower -> (canonical surface, unique owner type or None). */
  final case class SurfaceIndex(
      byFirstToken: Map[String, Seq[IndexedSurface]]) extends Serializable

  final case class IndexedSurface(
      tokensLower: Array[String],
      surface: String,
      mentionType: Option[String]) extends Serializable

  def buildIndex(dict: Seq[EntityRecord]): SurfaceIndex = {
    // surfaceLower -> set of owner types (None only if owners disagree)
    val owners = scala.collection.mutable.Map[String, (String, Set[Option[String]])]()
    for (e <- dict; s <- e.name +: e.aliases; if s.trim.nonEmpty) {
      val key = s.trim.toLowerCase
      val cur = owners.getOrElse(key, (s.trim, Set.empty[Option[String]]))
      owners(key) = (cur._1, cur._2 + e.entity_type)
    }
    val indexed = owners.toSeq.sortBy(_._1).map { case (low, (surf, types)) =>
      val mt = if (types.size == 1) types.head else None
      IndexedSurface(TextSim.tokens(low), surf, mt)
    }
    SurfaceIndex(indexed.filter(_.tokensLower.nonEmpty).groupBy(_.tokensLower.head))
  }

  /** Longest-match detection at every token position. */
  def detect(turn: Turn, idx: SurfaceIndex): Seq[Mention] = {
    val toks = TextSim.tokens(turn.text.toLowerCase)
    if (toks.isEmpty) return Nil
    val out = Seq.newBuilder[Mention]
    var i = 0
    while (i < toks.length) {
      idx.byFirstToken.get(toks(i)) match {
        case Some(cands) =>
          var best: IndexedSurface = null
          var ci = 0
          while (ci < cands.length) {
            val c = cands(ci)
            val n = c.tokensLower.length
            if (i + n <= toks.length && (best == null || n > best.tokensLower.length)) {
              var j = 0
              var ok = true
              while (ok && j < n) { ok = toks(i + j) == c.tokensLower(j); j += 1 }
              if (ok) best = c
            }
            ci += 1
          }
          if (best != null)
            out += Mention(s"${turn.conv_id}#${turn.turn_idx}#$i", turn.conv_id,
              turn.turn_idx, best.surface, i, best.mentionType, turn.text)
        case None =>
      }
      i += 1
    }
    out.result()
  }
}
