package graft.core

import graft.model.{EntityRecord, Mention, Turn}

/** Dictionary-based mention detection — the engine analog of the reference's
  * single-record entity input (the reference receives one entity per HTTP
  * call; a transcript pipeline must first FIND candidate entity mentions in
  * turn text). Pure Scala so the Spark pipeline (via a broadcast
  * SurfaceIndex) and the no-Spark oracle share identical semantics.
  *
  * Rule: tokenize with TextSim.mentionTokens — whitespace-separated for
  * Latin text (byte-identical to the round-1..3 whitespace rule there), Han
  * ideographs PER CHARACTER so unsegmented Chinese matches dictionary
  * surfaces inline (北京大学 inside a Han run is a 4-token sequence on both
  * sides; the reference's own corpus is zh/en mixed). At each token
  * position match the LONGEST dictionary surface (name or alias,
  * case-insensitive, whole-token sequence). mention_id =
  * conv_id#turn_idx#tokenOffset is unique and deterministic (the offset is
  * an index into the mixed-script token stream).
  */
object MentionDetector {

  /** Two-level index: first token -> (length DESC, joined-tokens -> surface)
    * buckets. Lookup at a position is O(#distinct lengths) hash probes
    * instead of a linear scan of every surface sharing the first token —
    * the scan was O(collisions) per position, which at a mega dictionary
    * (thousands of surfaces sharing a root name token) made detection
    * O(|dict|)-ish per turn (measured 16ms/turn at 30k entities; now
    * micro-seconds). Longest-match semantics are identical: lookup goes in
    * length-descending order so the first hit IS the longest whole-token
    * match, and when DISTINCT surface strings share one token sequence
    * (e.g. whitespace variants) the bucket keeps the first in
    * sorted-by-lowercased-surface order — the same entry the old
    * first-equal-length-match scan returned. */
  final case class SurfaceIndex(
      byFirstToken: Map[String, Array[LengthBucket]]) extends Serializable

  final case class LengthBucket(
      len: Int,
      byJoined: Map[String, IndexedSurface]) extends Serializable

  final case class IndexedSurface(
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
    val indexed = owners.toSeq.sortBy(_._1).flatMap { case (low, (surf, types)) =>
      val mt = if (types.size == 1) types.head else None
      val toks = TextSim.mentionTokens(low)
      if (toks.isEmpty) None else Some((toks, IndexedSurface(surf, mt)))
    }
    val byFirst = indexed.groupBy(_._1.head).map { case (first, ss) =>
      val buckets = ss.groupBy(_._1.length).toArray.sortBy(-_._1).map {
        case (n, group) =>
          // first-wins on token-sequence collisions: `indexed` is sorted by
          // lowercased surface, matching the old scan's tie-break
          val m = group.foldLeft(Map.empty[String, IndexedSurface]) {
            case (acc, (toks, s)) =>
              val k = toks.mkString(" ")
              if (acc.contains(k)) acc else acc.updated(k, s)
          }
          LengthBucket(n, m)
      }
      first -> buckets
    }
    SurfaceIndex(byFirst)
  }

  /** Longest-match detection at every token position. */
  def detect(turn: Turn, idx: SurfaceIndex): Seq[Mention] = {
    val toks = TextSim.mentionTokens(turn.text.toLowerCase)
    if (toks.isEmpty) return Nil
    val out = Seq.newBuilder[Mention]
    var i = 0
    while (i < toks.length) {
      idx.byFirstToken.get(toks(i)) match {
        case Some(buckets) =>
          var best: IndexedSurface = null
          var bi = 0
          while (best == null && bi < buckets.length) {
            val b = buckets(bi)
            if (i + b.len <= toks.length) {
              val key =
                if (b.len == 1) toks(i)
                else {
                  val sb = new java.lang.StringBuilder(toks(i))
                  var j = 1
                  while (j < b.len) { sb.append(' ').append(toks(i + j)); j += 1 }
                  sb.toString
                }
              best = b.byJoined.getOrElse(key, null)
            }
            bi += 1
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
