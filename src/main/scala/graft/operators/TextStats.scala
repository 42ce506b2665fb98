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

  /** Intra-document repetition stats — the Gopher-style repetition filters
    * (Rae et al. 2021 §A1.1: duplicate-line fractions, most-frequent-n-gram
    * character fraction) every LLM data pipeline applies before training.
    * All-exact spelling: counts are int64 and the keep rule compares
    * cross-multiplied integers, so the gate is bit-stable where the paper's
    * float fractions would not be. Three grains per doc:
    *
    *  - words: `dup_words` = occurrences beyond a word's first (what exact
    *    intra-doc word dedup would delete), with the char variants;
    *  - lines: same over trimmed non-empty '\n' splits (single-line corpora
    *    degenerate to n_lines=1, dup=0 — still exact; the spec exercises
    *    multi-line docs);
    *  - top bigram: the most frequent adjacent word pair, ties broken by
    *    gram ASC — count, the gram itself, and its repeated-char mass
    *    (count x length).
    *
    * The top-gram scan is SHUFFLE-FREE: sort the doc's bigram array and
    * take the longest run with a single `aggregate` fold (strictly-greater
    * updates keep the lexicographically smallest gram among tied maxima —
    * the same (count DESC, gram ASC) order the twin's window spells
    * relationally). The whole operator is one narrow projection over the
    * scan: per-row arrays, no exchange, the shape that survives 100 TB.
    *
    * keep := dup_words*100 <= n_words*55 AND top_gram_n <= 2 (both sides
    * exercised at sf0.01: 240/500 and 30/500 trip respectively). */
  def repetitionStats(docs: DataFrame): DataFrame = {
    // whitespace-RUN tokenization (not TextOps.words' single-space split):
    // words must not span line breaks in a line-aware operator. The class
    // is TextOps.wsRunPattern, shared VERBATIM with the twin (explicit
    // class — Java's \s and RE2's \s disagree on vertical tab)
    val ws = filter(split(lower(col("text")), TextOps.wsRunPattern, -1),
      w => w =!= lit(""))
    val lines = filter(transform(split(col("text"), "\n", -1), l => trim(l)),
      l => l =!= lit(""))
    def charSum(arr: Column) =
      aggregate(arr, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val grams = zip_with(
      slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    // longest-run fold over the sorted bigrams: (prev, run, best, bestg);
    // x == prev extends the run, a STRICTLY greater run replaces the best —
    // so the first (smallest) gram among tied maxima wins
    val top = aggregate(
      array_sort(grams),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit("").as("bestg")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          when(run > acc.getField("best"), run)
            .otherwise(acc.getField("best")).as("best"),
          when(run > acc.getField("best"), x)
            .otherwise(acc.getField("bestg")).as("bestg"))
      })
    docs.select(col("doc_id"), ws.as("ws"), lines.as("ls"), top.as("top"),
        size(grams).cast("long").as("n_grams"))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        (size(col("ws")) - size(array_distinct(col("ws")))).cast("long").as("dup_words"),
        charSum(col("ws")).as("word_chars"),
        (charSum(col("ws")) - charSum(array_distinct(col("ws")))).as("dup_word_chars"),
        size(col("ls")).cast("long").as("n_lines"),
        (size(col("ls")) - size(array_distinct(col("ls")))).cast("long").as("dup_lines"),
        charSum(col("ls")).as("line_chars"),
        (charSum(col("ls")) - charSum(array_distinct(col("ls")))).as("dup_line_chars"),
        col("n_grams"),
        col("top").getField("best").as("top_gram_n"),
        col("top").getField("bestg").as("top_gram"),
        (col("top").getField("best") * length(col("top").getField("bestg")).cast("long"))
          .as("top_gram_chars"))
      .withColumn("keep",
        col("dup_words") * 100 <= col("n_words") * 55 && col("top_gram_n") <= 2)
  }

  /** The 8 high-frequency English function words of Gopher's stop-word
    * presence rule (Rae et al. 2021 §A1.1) — a doc must contain at least 2
    * DISTINCT ones. Shared with the SQL twin. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The REMAINING Gopher quality signals (Rae et al. 2021 §A1.1) beyond
    * `quality` (word count / punct) and `repetitionStats` (dup lines /
    * top n-gram): mean-word-length band, symbol-to-word ratio, bullet- and
    * ellipsis-line fractions, stop-word presence. All counts int64 and
    * every keep arm compares CROSS-MULTIPLIED integers, so the gate is
    * bit-stable where the paper's float fractions would not be:
    *
    *  - mean word length in [3, 10]:  3·n_words <= word_chars <= 10·n_words
    *  - symbol-to-word ratio <= 0.1:  10·(n_hash + n_ellipsis) <= n_words
    *    (symbols = '#' chars + '...'/'…' runs, the paper's set)
    *  - <= 90% of lines start with a bullet ('-', '*', '•'):
    *    10·n_bullet_lines <= 9·n_lines
    *  - <= 30% of lines end with an ellipsis: 10·n_ellipsis_lines <= 3·n_lines
    *  - >= `minStop` distinct `gopherStopwords` present (the paper's rule
    *    is 2 of 8, the default; the threshold is a parameter because it
    *    presumes natural English — on a synthetic/technical vocabulary the
    *    discriminating setting can differ, and the driver gate runs the one
    *    that exercises both keep arms on its corpus)
    *
    * Word/line grains are shared with `repetitionStats` (wsRunPattern runs;
    * trimmed non-empty '\n' splits). Scan-shaped: one narrow projection,
    * per-row arrays, no shuffle — the 100 TB shape of every Gopher filter. */
  def gopherStats(docs: DataFrame, minStop: Int = 2): DataFrame = {
    val ws = filter(split(lower(col("text")), TextOps.wsRunPattern, -1),
      w => w =!= lit(""))
    val lines = filter(transform(split(col("text"), "\n", -1), l => trim(l)),
      l => l =!= lit(""))
    val wordChars = aggregate(ws, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val nHash = (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
      .cast("long")
    val nEllipsis = size(regexp_extract_all(col("text"), lit("\\.\\.\\.|…"), lit(0)))
      .cast("long")
    val bulletLines = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))).cast("long")
    val ellipsisLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val stopDistinct = gopherStopwords
      .map(w => when(array_contains(ws, w), 1L).otherwise(0L))
      .reduce(_ + _)
    docs.select(
        col("doc_id"),
        size(ws).cast("long").as("n_words"),
        wordChars.as("word_chars"),
        nHash.as("n_hash"),
        nEllipsis.as("n_ellipsis"),
        size(lines).cast("long").as("n_lines"),
        bulletLines.as("n_bullet_lines"),
        ellipsisLines.as("n_ellipsis_lines"),
        stopDistinct.as("n_stop_distinct"))
      .withColumn("keep",
        col("n_words") * 3 <= col("word_chars") &&
          col("word_chars") <= col("n_words") * 10 &&
          (col("n_hash") + col("n_ellipsis")) * 10 <= col("n_words") &&
          col("n_bullet_lines") * 10 <= col("n_lines") * 9 &&
          col("n_ellipsis_lines") * 10 <= col("n_lines") * 3 &&
          col("n_stop_distinct") >= minStop)
  }

  /** PII scrub — the redaction pass a transcripts-to-training-data
    * pipeline runs before anything else leaves the trust boundary. Two
    * detector classes (emails, phone-like digit runs) as regexes shared
    * verbatim with the DuckDB twin (`TextOps.emailPattern` /
    * `phonePattern` — plain classes + greedy quantifiers, identical in
    * java.util.regex and RE2). Emails redact FIRST, and the phone count is
    * taken over the email-redacted text, so digits inside an address are
    * never double-counted as a phone. Scan-shaped: one narrow projection,
    * no shuffle, no UDF. Returns per-doc counts + the redacted text (the
    * gate hashes the actual redaction output, not just the counts). */
  def piiScrub(docs: DataFrame): DataFrame = {
    val noEmail = regexp_replace(
      col("text"), TextOps.emailPattern, "<email>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(TextOps.emailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(TextOps.phonePattern), lit(0)))
        .cast("long").as("n_phones"),
      regexp_replace(noEmail, TextOps.phonePattern, "<phone>").as("redacted"))
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercased text
    * (exact-dup detection key, SQL-reproducible). */
  def contentFingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), " +", " "))).as("fingerprint"))

  /** Positional k-gram char hashes of the lowercased text — the shared
    * primitive under winnowSelect AND the gramHashFrame dump (single
    * hashing code path: the fingerprint and its oracle cannot drift).
    * The hash is the PORTABLE 40-bit md5 spelling (`Dedup.md5Hash40`):
    * any engine with md5() re-derives identical values, so the dump gets a
    * direct DuckDB gate (positions + hashes recomputed from the documents
    * table) on top of the windowed-min re-derivations downstream —
    * winnowing/decontamination fingerprints are exactly the artifact that
    * must reproduce across toolchains. 40 bits is ample for intra-doc
    * window minima and keeps every residue trick ANSI-safe in int64.
    * The hashing interior is `Dedup.gramHash40s` — one UTF-8 encode of the
    * whole string and a reused digest buffer instead of a substring +
    * getBytes + hex round-trip per position (the round-7 spelling that made
    * this pass 51× slower, BENCH_r07); values are bit-identical. */
  def gramHashes(text: String, k: Int): Array[Long] = {
    val s = (if (text == null) "" else text).toLowerCase
    if (s.length < k) Array.empty
    else Dedup.gramHash40s(s, k)
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
