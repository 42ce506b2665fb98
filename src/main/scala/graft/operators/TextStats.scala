package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a documents table: token counting, quality
  * scoring, language ID, fingerprinting. All narrow (per-row) Catalyst
  * expressions — no shuffle, fully codegen'd, and each has an exact ANSI-SQL
  * twin for the DuckDB oracle (ratios are single divisions of exact ints).
  */
object TextStats {

  /** Stopword list shared with the SQL oracle (quality scoring). */
  val stopwords: Seq[String] = Seq(
    "the", "and", "for", "that", "with", "this", "from", "have", "are", "was",
    "not", "but", "his", "her", "they", "you", "all", "can", "had", "one")

  /** zh single-char function/filler tokens for CJK quality scoring — the
    * char-grain tokenizer emits one token per Han character, so the stop
    * set is per-character too (shared with the SQL oracle). */
  val zhStopchars: Seq[String] = Seq(
    "的", "是", "不", "了", "在", "有", "我", "们", "一", "下",
    "相", "关", "情", "况", "这", "个", "和", "与", "讨", "论")

  /** Language marker words (tiny function-word sets; the ID heuristic is
    * hit-count argmax with deterministic ties). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "mit", "ist", "ein"),
    "en" -> Seq("the", "and", "for", "that", "with", "this", "from", "have"),
    "es" -> Seq("el", "los", "las", "que", "para", "con", "una", "por"),
    "fr" -> Seq("le", "les", "des", "une", "pour", "avec", "est", "dans"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "you3", "wo3", "ta1"))

  /** doc_id, n_chars, whitespace-token, BPE-ish-token and CJK-aware token
    * counts (n_cjk_tokens == n_ws_tokens on pure-Latin text; on unsegmented
    * zh it counts per-character — the whitespace count there is one giant
    * "token" per punctuation-free run, the round-4 degradation). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(TextOps.words(col("text"))).cast("long").as("n_ws_tokens"),
      size(TextOps.bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"),
      size(TextOps.cjkTokens(col("text"))).cast("long").as("n_cjk_tokens"))

  /** Quality features + keep flag. avg_word_len and ratios are divisions of
    * exact integer counts (bit-identical cross-engine). With `cjk` the
    * word grain is the CJK-aware tokenizer, Han chars stop counting as
    * punctuation, and the stop set should be `zhStopchars` — whitespace
    * tokenization scored every unsegmented zh doc as one enormous word
    * (avg_word_len = run length => keep=false regardless of content). */
  def quality(docs: DataFrame, cjk: Boolean = false,
              stopList: Seq[String] = stopwords): DataFrame = {
    val ws = if (cjk) TextOps.cjkTokens(col("text")) else TextOps.words(col("text"))
    val punctClass = if (cjk) "[a-z0-9 一-鿿]" else "[a-z0-9 ]"
    val nWords = size(ws).cast("long")
    val sumLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val nPunct = length(regexp_replace(lower(col("text")), punctClass, "")).cast("long")
    val nStop = TextOps.markerHits(ws, stopList)
    docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nWords.as("n_words"),
        (sumLen / nWords).as("avg_word_len"),
        (nPunct / length(col("text")).cast("long")).as("punct_ratio"),
        (nStop / nWords).as("stopword_ratio"))
      .withColumn("keep",
        col("n_words") >= 5 && col("avg_word_len") <= 12.0 && col("punct_ratio") <= 0.2)
  }

  /** Marker-hit counts per language + argmax prediction ('und' on zero
    * hits; ties broken by language code asc — encoded as a fixed-order
    * strictly-greater chain, same shape as the SQL CASE). */
  def langId(docs: DataFrame): DataFrame = {
    val ws = TextOps.words(lower(col("text")))
    val hitCols = langMarkers.map { case (lang, markers) =>
      TextOps.markerHits(ws, markers).as(s"hits_$lang")
    }
    val withHits = docs.select((col("doc_id") +: hitCols): _*)
    // argmax with lang-asc tiebreak: lang L wins iff hits_L > hits_M for all
    // M < L and hits_L >= hits_M for all M > L (langMarkers is sorted asc)
    val langs = langMarkers.map(_._1)
    val pred = langs.foldRight(lit("und")) { (lang, elseExpr) =>
      val h = col(s"hits_$lang")
      val beatsEarlier = langs.takeWhile(_ != lang)
        .map(m => h > col(s"hits_$m")).foldLeft(lit(true))(_ && _)
      val beatsLater = langs.dropWhile(_ != lang).drop(1)
        .map(m => h >= col(s"hits_$m")).foldLeft(lit(true))(_ && _)
      when(h > 0 && beatsEarlier && beatsLater, lit(lang)).otherwise(elseExpr)
    }
    withHits.withColumn("predicted_lang", pred)
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercased text
    * (exact-dup detection key, SQL-reproducible). */
  def contentFingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), " +", " "))).as("fingerprint"))

  /** Positional k-gram char hashes of the lowercased text — the shared
    * primitive under winnowSelect AND the gramHashFrame dump the DuckDB
    * winnow twin re-derives the windowed min from (single hashing code
    * path: the fingerprint and its oracle cannot drift). */
  def gramHashes(text: String, k: Int): Array[Long] = {
    val s = (if (text == null) "" else text).toLowerCase
    if (s.length < k) Array.empty
    else Array.tabulate(s.length - k + 1)(i => Dedup.hash64(s.substring(i, i + k), 0x6b43a9b5))
  }

  /** (doc_id, pos, h) rows of per-doc gram hashes — the {OUT} dump the
    * text_winnow_fp oracle twin reads (docs shorter than k emit no rows). */
  def gramHashFrame(docs: DataFrame, k: Int = 8): DataFrame = {
    val g = udf((text: String) => gramHashes(text, k))
    docs.select(col("doc_id"), posexplode(g(col("text"))).as(Seq("pos", "h")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("h"))
  }

  /** Winnowing fingerprint (rolling hash): k-gram char hashes, min per
    * sliding window of w (earliest-min on ties), distinct selected hashes —
    * the standard local document fingerprint. Emitted as per-doc summary
    * (count / min / max of selected hashes). */
  def winnowSelect(text: String, k: Int, w: Int): Array[Long] = {
    val grams = gramHashes(text, k)
    if (grams.isEmpty) return Array.empty
    if (grams.length <= w) return Array(grams.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i + w <= grams.length) {
      var m = grams(i); var j = i + 1
      while (j < i + w) { if (grams(j) < m) m = grams(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }

  /** Train→benchmark DECONTAMINATION: (train_doc, val_doc) pairs sharing at
    * least `minShared` winnow fingerprints — the overlap check a pretraining
    * pipeline runs so evaluation documents leaking into the training split
    * are caught before training, not after. Split = the deterministic
    * arithmetic hash (Corpus.hashSplit residue); fingerprints above `maxDf`
    * document frequency are dropped (boilerplate carries no contamination
    * signal and its fp buckets are the quadratic hot keys at scale — same
    * df-cap discipline as the dedup shingles). The join shuffles only
    * (fp, doc_id) pairs; winnowSelect already emits DISTINCT fps per doc,
    * so the shared count is a plain count(*). */
  def contaminationPairs(docs: DataFrame, trainPct: Int = 90, k: Int = 8, w: Int = 4,
                         minShared: Long = 3, maxDf: Long = 100): DataFrame = {
    val fpU = udf((text: String) => winnowSelect(if (text == null) "" else text, k, w))
    // pmod residue (Corpus.splitResidue): sign-safe for negative doc_ids
    val fps = docs.select(col("doc_id"),
        when(Corpus.splitResidue(col("doc_id")) < trainPct, lit("train"))
          .otherwise(lit("val")).as("split"),
        explode(fpU(col("text"))).as("fp"))
    // ONE shuffle keyed by fp does everything: per-fp train/val doc lists
    // (map-side combined), the df cap as a size filter (df = |tr|+|vl|,
    // identical to a per-fp count since winnowSelect emits distinct fps per
    // doc), then the pair expansion — bounded at maxDf²/4 per fp. A
    // train-side × val-side self-join spelling scans (and recomputes the
    // fp UDF over) the corpus twice; this is one pass, and the blowup knob
    // is explicit.
    val pairsU = udf((tr: Seq[Long], vl: Seq[Long]) =>
      for { t <- tr; v <- vl } yield (t, v))
    fps.groupBy("fp").agg(
        collect_list(when(col("split") === "train", col("doc_id"))).as("tr"),
        collect_list(when(col("split") === "val", col("doc_id"))).as("vl"))
      .filter(size(col("tr")) > 0 && size(col("vl")) > 0 &&
        size(col("tr")) + size(col("vl")) <= maxDf)
      .select(explode(pairsU(col("tr"), col("vl"))).as("p"))
      .groupBy(col("p._1").as("train_doc"), col("p._2").as("val_doc"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  def winnowFingerprint(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    val fp = udf((text: String) => winnowSelect(if (text == null) "" else text, k, w))
    docs.select(col("doc_id"), fp(col("text")).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fps"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"))
  }
}
