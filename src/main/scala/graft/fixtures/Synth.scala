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

  // ---------------------------------------------------------------- zh-mixed
  // Round-4 fixture family: the reference's own seed corpus is zh/en MIXED
  // (Chinese names with English aliases, open Chinese type vocabulary —
  // /root/reference/data/sample_entities.json:1-120 shape) and Chinese text
  // is UNSEGMENTED: no whitespace around mentions, so this fixture is what
  // forces the CJK-aware tokenizer. All strings below are engine-authored;
  // nothing is copied from the reference corpus. Own seeds + id namespace:
  // the Latin fixtures keep their byte-identical draw sequences.

  private val zhTypes = Vector("疾病", "药物", "症状", "基因", "机构")
  private val zhParts = Vector("云", "岭", "泉", "桥", "晨", "光", "石", "河",
    "谷", "林", "海", "星", "岩", "松", "雪", "川")
  private val zhSuffixes = Vector("医院", "大学", "公司", "研究所", "药业", "实验室")
  private val zhDefnVocab = Vector("慢性", "疾病", "治疗", "患者", "症状", "表现",
    "常见", "蛋白", "受体", "抑制剂", "临床", "通路", "反应", "调节", "表达",
    "综合征", "急性", "代谢", "免疫", "障碍")
  private val zhFillerVocab = Vector("今天", "我们", "讨论", "一下", "相关", "情况",
    "请", "查看", "报告", "然后", "安排", "会议", "记录", "更新", "结果", "继续",
    "跟进", "这个", "问题", "需要")

  /** Unsegmented run of zh vocabulary words — Chinese carries no word
    * delimiters, which is the whole point of this fixture. */
  private def zhRun(rnd: Random, vocab: Vector[String], n: Int): String =
    (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString

  /** Definition snippet for planted context: chars for unsegmented zh
    * definitions, leading words for spaced Latin ones. */
  private def defnSnippet(defn: String, n: Int): String =
    if (defn.contains(' ')) graft.core.TextSim.tokens(defn).take(n).mkString(" ")
    else defn.take(n)

  /** zh/en mixed dictionary: ~2/3 zh-named entities (index-derived two-part
    * stems + institutional suffixes keep surfaces distinct), 1/3 Latin-named;
    * aliases cross scripts both ways (zh stem aliases — the longest-match
    * foil — Latin code aliases on zh entities, zh aliases on Latin
    * entities). Every 5th zh entity gets a one-character-substituted
    * near-duplicate so same_as canonicalization runs on zh names. */
  def zhDictionary(spec: Spec): Seq[EntityRecord] = {
    val rnd = new Random(spec.seed + 7)
    val ts0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val base = (0 until spec.nBaseEntities).map { i =>
      if (i % 3 != 2) {
        val t = zhTypes(i % zhTypes.size)
        val stem = zhParts(i % zhParts.size) +
          zhParts((i / zhParts.size + i * 5 + 3) % zhParts.size)
        val name = stem + zhSuffixes(i % zhSuffixes.size)
        val aliases = {
          val a = scala.collection.mutable.ArrayBuffer[String]()
          if (i % 2 == 0) a += stem // short zh alias: exercises longest-match
          if (rnd.nextBoolean()) a += s"ZH$i" // Latin code alias inside zh text
          a.toSeq
        }
        val defn = zhRun(rnd, zhDefnVocab, 6 + rnd.nextInt(6)) // unsegmented
        EntityRecord(f"zh_$i%05d", name, Some(t), aliases, Some(defn),
          if (i % 4 == 0) Map("类别" -> Seq(t)) else Map.empty,
          Some("synth-zh"), Some(ts0))
      } else {
        val t = types(i % types.size)
        val name = mkName(rnd, 1 + rnd.nextInt(2))
        val aliases = {
          val a = scala.collection.mutable.ArrayBuffer[String]()
          if (rnd.nextBoolean()) a += abbrev(name)
          if (i % 6 == 2) // zh alias of a Latin-named entity
            a += zhParts((i * 7 + 1) % zhParts.size) +
              zhParts((i * 3 + 5) % zhParts.size) + "集团"
          a.toSeq
        }
        EntityRecord(f"en_$i%05d", name, Some(t), aliases,
          Some(sentence(rnd, defnVocab, 6 + rnd.nextInt(6))), Map.empty,
          Some("synth-zh"), Some(ts0))
      }
    }
    val dupes = base.zipWithIndex.collect {
      case (e, i) if i % 5 == 0 && e.id.startsWith("zh_") =>
        val pos = i % e.name.length
        val nm = e.name.substring(0, pos) +
          zhParts((i * 11 + 5) % zhParts.size) +
          e.name.substring(math.min(pos + 1, e.name.length))
        EntityRecord(s"dup_${e.id}", nm, e.entity_type, e.aliases.take(1),
          e.definition.map(_ + zhRun(rnd, zhDefnVocab, 2)), e.attributes,
          Some("synth-zh-dup"), e.create_time)
    }
    base ++ dupes
  }

  /** Deterministic zh/en mixed transcripts: ~70% zh turns whose planted
    * surfaces are INLINE in unsegmented Han runs (the case whitespace
    * tokenization is structurally blind to), the rest English turns that may
    * still mention zh entities; context borrowing from the entity definition
    * drives the same merge/ambiguous/create branch spread as `transcripts`. */
  def zhTranscripts(spec: Spec, dict: Seq[EntityRecord]): Seq[Turn] = {
    val rnd = new Random(spec.seed + 8)
    val hot = dict.head
    val baseTs = Timestamp.valueOf("2024-06-01 00:00:00").getTime
    val out = Vector.newBuilder[Turn]
    var c = 0
    while (c < spec.nConv) {
      val convId = f"zconv_$c%06d"
      var t = 0
      while (t < spec.turnsPerConv) {
        val zhTurn = rnd.nextInt(10) < 7
        val sb = new StringBuilder(
          if (zhTurn) zhRun(rnd, zhFillerVocab, 2 + rnd.nextInt(3))
          else sentence(rnd, fillerVocab, 4 + rnd.nextInt(5)))
        val isHot = rnd.nextDouble() < spec.hotRate
        if (isHot || rnd.nextDouble() < spec.plantRate) {
          val e = if (isHot) hot else dict(rnd.nextInt(dict.size))
          val ss = surfaces(e)
          val surf = ss(rnd.nextInt(ss.size))
          val defn = e.definition.getOrElse("")
          val mergeish = rnd.nextDouble() < spec.mergeRate
          if (zhTurn) {
            sb.append(surf) // inline: no separator before or after
            if (mergeish) sb.append(defnSnippet(defn, 5 + rnd.nextInt(6)))
            else if (rnd.nextDouble() < 0.5)
              sb.append(defnSnippet(defn, 3)).append("。")
                .append(zhRun(rnd, zhFillerVocab, 2))
            else sb.append("。").append(zhRun(rnd, zhFillerVocab, 3))
          } else {
            sb.append(" ").append(surf).append(" ")
            if (mergeish) sb.append(defnSnippet(defn, 6 + rnd.nextInt(6)))
            else if (rnd.nextDouble() < 0.5)
              sb.append(defnSnippet(defn, 3)).append(" ")
                .append(sentence(rnd, fillerVocab, 4))
            else sb.append(sentence(rnd, fillerVocab, 5))
          }
          if (rnd.nextDouble() < 0.15) { // second plant in the same turn
            val e2 = dict(rnd.nextInt(dict.size))
            if (zhTurn) sb.append("，").append(e2.name)
            else sb.append(" ").append(e2.name)
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

  /** zh/en mixed DOCUMENTS table (doc_id, lang, text) for the text-operator
    * gates (token counts, quality, vocab head, n-gram dedup): ~80% zh docs
    * of unsegmented Han sentences with CJK punctuation separators, ~20%
    * Latin docs, plus planted near-duplicates — every 10th doc cloned with
    * a one-token suffix tweak (char-3-gram jaccard ~0.9, far above the 0.5
    * gate threshold; the whitespace tokenizer sees each zh doc as ~3 giant
    * tokens and is structurally blind to these pairs). Deterministic, own
    * seed; ids are non-negative (clusterReps contract). */
  def zhDocuments(nDocs: Int, seed: Long = 42L): Seq[(Long, String, String)] = {
    // planted-duplicate ids are base + 100000; a larger base range would
    // collide clone ids with base ids (duplicate doc_id rows would silently
    // break every per-doc keyed gate), so refuse loudly instead
    require(nDocs <= 100000, s"zhDocuments supports at most 100000 docs (got $nDocs)")
    val rnd = new Random(seed + 21)
    val base = (0 until nDocs).map { i =>
      if (i % 5 == 4) {
        val words = (0 until 10 + rnd.nextInt(8))
          .map(_ => fillerVocab(rnd.nextInt(fillerVocab.size)))
        (i.toLong, "en", words.mkString(" "))
      } else {
        val sb = new StringBuilder
        val sents = 2 + rnd.nextInt(3)
        var s = 0
        while (s < sents) {
          sb.append(zhRun(rnd, zhFillerVocab, 3 + rnd.nextInt(3)))
          if (rnd.nextBoolean()) sb.append(zhRun(rnd, zhDefnVocab, 2 + rnd.nextInt(3)))
          sb.append(if (s == sents - 1) "。" else "，")
          s += 1
        }
        (i.toLong, "zh", sb.toString)
      }
    }
    // clone strides 0 and 4 mod 10: stride 0 hits only zh docs (en docs
    // live at i % 5 == 4, i.e. ids 4/9 mod 10), so stride 4 exists to plant
    // LATIN near-dup pairs too — without it the en-clone branch below was
    // dead code and the fixture never exercised Latin near-dups
    val dups = base.filter(d => d._1 % 10 == 0 || d._1 % 10 == 4).map { case (id, lang, t) =>
      (id + 100000L, lang, t + (if (lang == "zh") "另见记录" else " extra note"))
    }
    base ++ dups
  }

  /** Transcript-ish documents with PLANTED PII (doc_id, text) for the
    * scrub gate: every 3rd doc carries an email — every OTHER one of those
    * in MixedCase, so the (?i) detector path is exercised by the gate, not
    * dodged — every 4th a phone number (both formats vary
    * deterministically), doc 0 mod 12 carries BOTH plus a second email, so
    * the per-doc counts exercise 0, 1 and 2+; the rest are clean filler.
    * Deterministic, own seed. */
  def piiDocuments(nDocs: Int, seed: Long = 42L): Seq[(Long, String)] = {
    val rnd = new Random(seed + 77)
    (0 until nDocs).map { i =>
      val words = (0 until 8 + rnd.nextInt(6))
        .map(_ => fillerVocab(rnd.nextInt(fillerVocab.size)))
      val sb = new StringBuilder(words.mkString(" "))
      if (i % 3 == 0)
        sb.append(if (i % 6 == 0) s" contact agent$i@mail${i % 7}.example.com for details"
                  else s" contact Agent$i@Mail${i % 7}.Example.COM for details")
      if (i % 4 == 1)
        sb.append(if (i % 8 == 1) s" call +1 555-01${10 + i % 80} now"
                  else s" reach us on 555 010 ${100 + i % 900}")
      if (i % 12 == 0)
        sb.append(s" escalate to ops-${i % 5}@example.org or +44 20 7946 0${100 + i % 900}")
      (i.toLong, sb.toString)
    }
  }

  /** One conversation's turns — the shared generation body for the
    * sequential and distributed generators. `rnd` is consumed in a fixed
    * order, so the caller's seeding discipline alone decides the stream. */
  private def convTurns(spec: Spec, dict: scala.collection.IndexedSeq[EntityRecord],
                        hot: EntityRecord, c: Int, rnd: Random): Seq[Turn] = {
    val baseTs = Timestamp.valueOf("2024-06-01 00:00:00").getTime
    val convId = f"conv_$c%06d"
    val out = Vector.newBuilder[Turn]
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
    out.result()
  }

  /** Deterministic transcripts with planted mentions. ONE sequential random
    * stream across conversations — the historical corpus family every
    * BASELINE cell through 4M turns cites; byte-stable across rounds. */
  def transcripts(spec: Spec, dict: Seq[EntityRecord]): Seq[Turn] = {
    val rnd = new Random(spec.seed + 1)
    val d = dict.toIndexedSeq
    val hot = d.head
    (0 until spec.nConv).flatMap(c => convTurns(spec, d, hot, c, rnd))
  }

  /** Distributed transcript generation: the same content MODEL as
    * `transcripts` (same per-turn branching, rates, roles, timestamps) with
    * PER-CONVERSATION seeding (spec.seed + 1 + 1000003·conv), so any
    * executor can generate any conversation independently — the only
    * fixture spelling that exists at 10^12 turns, where a driver-side Seq
    * is impossible by construction (the 8M-turn cell OOMed the 8g driver
    * building the Vector, before Spark saw a single row). NOT byte-equal
    * to `transcripts` (different stream positions): cells measured on this
    * family say so explicitly in BASELINE.md. Generation is deterministic
    * per (seed, conv) regardless of partitioning or core count. */
  def transcriptsDistributed(spark: org.apache.spark.sql.SparkSession, spec: Spec,
                             dict: Seq[EntityRecord]): org.apache.spark.sql.Dataset[Turn] = {
    import spark.implicits._
    val dictB = spark.sparkContext.broadcast(dict.toIndexedSeq)
    val parts = math.max(spark.sparkContext.defaultParallelism * 4, 4)
    spark.range(0, spec.nConv, 1, parts).as[Long].mapPartitions { it =>
      val d = dictB.value
      val hot = d.head
      it.flatMap { c =>
        val rnd = new Random(spec.seed + 1 + 1000003L * c)
        convTurns(spec, d, hot, c.toInt, rnd)
      }
    }
  }
}
