package graft.fixtures

import java.sql.Timestamp
import scala.util.Random

import graft.model.{EntityRecord, Turn}

/** Deterministic synthetic fixtures (fixed seed, no wall-clock, no external
  * data): the transcript table per BASELINE.json input_hint
  * (conv_id, turn_idx, role, text, tool, ts) and an entity dictionary whose
  * SHAPE mirrors the reference's 8-entity seed corpus
  * (/root/reference/data/sample_entities.json:1-120 — names+aliases, open type
  * vocabulary, list-valued attributes) with generated near-duplicates (alias
  * swaps, edit-distance-1 names, same-name-different-type) to hit every
  * decision branch.
  *
  * One hot entity is planted in a large fraction of turns to exercise skew
  * salting. Content is engine-authored (not copied from the reference).
  */
object Synth {

  final case class Spec(
      nConv: Int = 50,
      turnsPerConv: Int = 10,
      nBaseEntities: Int = 40,
      seed: Long = 42L,
      hotRate: Double = 0.4, // fraction of turns mentioning the hot entity
      mergeRate: Double = 0.35, // plants with definition-context (merge-ish)
      plantRate: Double = 0.8) // turns containing at least one plant

  private val types = Vector("disease", "drug", "symptom", "gene", "protein", "organ", "treatment")

  private val nameParts = Vector(
    "alder", "brevi", "cortex", "dynat", "ephra", "fulcan", "glimer", "hestia",
    "ixion", "jorvik", "kelmin", "lorax", "mersat", "novem", "ostrin", "pyrex",
    "quorin", "ralsto", "senova", "tarvel", "ulmar", "vexil", "wistar", "xanthe",
    "yarrow", "zephyr")

  private val defnVocab = Vector(
    "chronic", "condition", "characterized", "elevated", "levels", "treatment",
    "commonly", "observed", "patients", "acute", "response", "pathway", "protein",
    "binding", "receptor", "inhibitor", "therapy", "clinical", "symptom", "onset",
    "progressive", "disorder", "metabolic", "cardiac", "neural", "immune",
    "regulation", "expression", "syndrome", "deficiency")

  private val fillerVocab = Vector(
    "please", "check", "the", "report", "for", "today", "and", "send", "an",
    "update", "we", "discussed", "this", "earlier", "in", "meeting", "notes",
    "can", "you", "summarize", "that", "section", "again", "thanks", "also",
    "review", "latest", "results", "before", "friday", "schedule", "follow")

  private val roles = Vector("user", "assistant", "tool")
  private val tools = Vector("", "", "search", "lookup", "db_query")

  private def cap(s: String): String = s.capitalize

  private def mkName(rnd: Random, tokens: Int): String =
    (0 until tokens).map(_ => cap(nameParts(rnd.nextInt(nameParts.size)))).mkString(" ")

  private def abbrev(name: String): String =
    name.split(" ").map(w => w.take(1).toUpperCase).mkString + name.length.toString

  private def editOne(rnd: Random, s: String): String = {
    if (s.isEmpty) return s
    val i = rnd.nextInt(s.length)
    rnd.nextInt(3) match {
      case 0 => s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + s.substring(math.min(i + 1, s.length)) // substitute
      case 1 => s.substring(0, i) + s.substring(math.min(i + 1, s.length)) // delete
      case _ => s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + s.substring(i) // insert
    }
  }

  private def sentence(rnd: Random, vocab: Vector[String], n: Int): String =
    (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")

  /** Deterministic dictionary: base entities + near-duplicates. */
  def dictionary(spec: Spec): Seq[EntityRecord] = {
    val rnd = new Random(spec.seed)
    val base = (0 until spec.nBaseEntities).map { i =>
      val t = types(i % types.size)
      val name = mkName(rnd, 1 + rnd.nextInt(2))
      val aliases = {
        val a = scala.collection.mutable.ArrayBuffer[String]()
        if (rnd.nextBoolean()) a += abbrev(name)
        if (rnd.nextBoolean()) a += name.toLowerCase
        if (name.contains(" ") && rnd.nextBoolean()) a += name.split(" ").reverse.mkString(" ")
        a.toSeq
      }
      val defn = sentence(rnd, defnVocab, 8 + rnd.nextInt(8))
      val attrs: Map[String, Seq[String]] =
        if (rnd.nextBoolean())
          Map("category" -> Seq(t, defnVocab(rnd.nextInt(defnVocab.size))),
              "related" -> Seq(defnVocab(rnd.nextInt(defnVocab.size))))
        else Map.empty
      EntityRecord(f"${t}_${i}%05d", name, Some(t), aliases, Some(defn), attrs,
        Some("synth-corpus"), Some(Timestamp.valueOf("2024-01-01 10:00:00")))
    }
    // near-duplicates: every 4th base entity gets a perturbed clone
    val dupes = base.zipWithIndex.collect {
      case (e, i) if i % 4 == 0 =>
        val kind = i % 12
        val (nm, tp) =
          if (kind == 0) (editOne(rnd, e.name), e.entity_type) // edit-1 name, same type
          else if (kind == 4) (e.name, Some(types((types.indexOf(e.entity_type.get) + 1) % types.size))) // same name, different type
          else (e.name.split(" ").reverse.mkString(" "), e.entity_type) // token swap
        EntityRecord(s"dup_${e.id}", nm, tp, e.aliases.take(1),
          e.definition.map(d => d + " " + sentence(rnd, defnVocab, 3)),
          e.attributes, Some("synth-corpus-dup"), e.create_time)
    }
    base ++ dupes
  }

  /** Deterministic BEYOND-BROADCAST dictionary (tens of thousands of
    * entities) for exercising the blocked decide tier where it engages
    * naturally rather than forced. Separate generator (own seed, own id
    * namespace) so the existing small-dictionary fixtures — and every golden
    * oracle derived from them — keep their byte-identical draw sequence.
    * Names get an index-derived suffix token so the surface space stays
    * mostly unique at any n (the 26-part vocabulary alone saturates at ~700
    * names); abbreviation aliases still collide realistically (tens of
    * entities per alias), which is the ambiguity the scorer exists to
    * resolve. Every 40th entity gets an edit-distance-1 near-duplicate so
    * same_as canonicalization runs at scale. */
  def megaDictionary(n: Int, seed: Long = 43L): Seq[EntityRecord] = {
    val rnd = new Random(seed)
    val base = (0 until n).map { i =>
      val t = types(i % types.size)
      val root = mkName(rnd, 1 + rnd.nextInt(2))
      val name = s"$root ${cap(nameParts((i / 7) % nameParts.size))}${i % 997}"
      val aliases = {
        val a = scala.collection.mutable.ArrayBuffer[String]()
        if (rnd.nextBoolean()) a += abbrev(name)
        if (rnd.nextBoolean()) a += name.toLowerCase
        a.toSeq
      }
      // real entity definitions carry rare domain terms; two low-df marker
      // tokens (families of ~n/1009 and ~n/2003 entities) keep the ctx
      // blocking channel selective at any dictionary size — without them the
      // 30-word defn vocabulary saturates every token past the df cap
      val defn = sentence(rnd, defnVocab, 8 + rnd.nextInt(8)) +
        s" mk${i % 1009} rk${i % 2003}"
      EntityRecord(f"m${t}_$i%06d", name, Some(t), aliases, Some(defn), Map.empty,
        Some("synth-mega"), Some(Timestamp.valueOf("2024-01-01 10:00:00")))
    }
    val dupes = base.zipWithIndex.collect {
      case (e, i) if i % 40 == 0 =>
        EntityRecord(s"dup_${e.id}", editOne(rnd, e.name), e.entity_type, e.aliases.take(1),
          e.definition.map(_ + " " + sentence(rnd, defnVocab, 3)), e.attributes,
          Some("synth-mega-dup"), e.create_time)
    }
    base ++ dupes
  }

  /** All mentionable surfaces of an entity (name + aliases). */
  def surfaces(e: EntityRecord): Seq[String] = e.name +: e.aliases

  /** Deterministic transcripts with planted mentions. */
  def transcripts(spec: Spec, dict: Seq[EntityRecord]): Seq[Turn] = {
    val rnd = new Random(spec.seed + 1)
    val hot = dict.head
    val baseTs = Timestamp.valueOf("2024-06-01 00:00:00").getTime
    val out = Vector.newBuilder[Turn]
    var c = 0
    while (c < spec.nConv) {
      val convId = f"conv_$c%06d"
      var t = 0
      while (t < spec.turnsPerConv) {
        val sb = new StringBuilder(sentence(rnd, fillerVocab, 4 + rnd.nextInt(5)))
        val isHot = rnd.nextDouble() < spec.hotRate
        val doPlant = isHot || rnd.nextDouble() < spec.plantRate
        if (doPlant) {
          val e = if (isHot) hot else dict(rnd.nextInt(dict.size))
          val surf = {
            val ss = surfaces(e)
            ss(rnd.nextInt(ss.size))
          }
          val mergeish = rnd.nextDouble() < spec.mergeRate
          if (mergeish) {
            // context borrows heavily from the entity's definition => high
            // bge/ce => merge-leaning
            val defWords = graft.core.TextSim.tokens(e.definition.getOrElse(""))
            val k = math.min(defWords.length, 6 + rnd.nextInt(6))
            sb.append(" ").append(surf).append(" ").append(defWords.take(k).mkString(" "))
          } else if (rnd.nextDouble() < 0.5) {
            // partial overlap => ambiguous-leaning
            val defWords = graft.core.TextSim.tokens(e.definition.getOrElse(""))
            sb.append(" ").append(surf).append(" ").append(defWords.take(3).mkString(" "))
              .append(" ").append(sentence(rnd, fillerVocab, 4))
          } else {
            // filler-only context => create-leaning
            sb.append(" ").append(surf).append(" ").append(sentence(rnd, fillerVocab, 5))
          }
          if (rnd.nextDouble() < 0.15) { // second plant in the same turn
            val e2 = dict(rnd.nextInt(dict.size))
            sb.append(" ").append(e2.name)
          }
        }
        val role = roles(t % roles.size)
        val tool = if (role == "tool") tools(2 + rnd.nextInt(3)) else ""
        val ts = new Timestamp(baseTs + (c.toLong * spec.turnsPerConv + t) * 60000L)
        out += Turn(convId, t, role, sb.toString, tool, ts)
        t += 1
      }
      c += 1
    }
    out.result()
  }
}
