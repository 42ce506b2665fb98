package graft.core

import scala.util.hashing.MurmurHash3

/** Pure-Scala text-similarity core — the ORACLE-SHARED functions whose
  * semantics clone the reference scorer. No Spark imports: the same code runs
  * inside Spark UDFs, in the no-Spark oracle, and in unit tests, so the
  * P/R comparison is well-defined.
  *
  * Reference provenance:
  *  - tokenSortRatio: rapidfuzz fuzz.token_sort_ratio/100 used at
  *    /root/reference/services/disambiguation.py:313-341 (split on whitespace,
  *    sort tokens, join with single spaces, normalized InDel similarity).
  *  - levRatio: 1 - lev(a,b)/max(len) (0.0 when both empty),
  *    /root/reference/services/disambiguation.py:343-379.
  *  - crossMax: name x name plus the full alias cross-product in both
  *    directions, take the max — disambiguation.py:320-337 / :352-375.
  *  - embed: deterministic per-text vectors standing in for BGE-M3, same role
  *    as the reference's own seeded fallback (vectorization.py:315-334).
  *  - cosine: type-branch cosine at disambiguation.py:191 (the engine
  *    standardizes on cosine; the reference's raw-IP main path is documented
  *    divergence, see SURVEY.md X4).
  *  - contextScore: offline surrogate for the CrossEncoder logit
  *    (disambiguation.py:272-274): token TF cosine over the two scoring
  *    texts, already in [0,1].
  */
object TextSim {

  /** Whitespace tokenization exactly as Python str.split(): runs of
    * whitespace collapse, leading/trailing ignored. This is the SCORER's
    * tokenizer — rapidfuzz token_sort_ratio splits the same way (zh strings
    * are single tokens there too), so X6 parity requires it unchanged. */
  def tokens(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  @inline private def isIdeo(cp: Int): Boolean = Character.isIdeographic(cp)

  /** CJK punctuation + fullwidth punctuation forms — separators in
    * unsegmented text (。，、！？；：（）《》「」 and their fullwidth ASCII
    * kin). U+3000 ideographic space is already Character.isWhitespace. */
  @inline private def isCjkPunct(cp: Int): Boolean =
    (cp >= 0x3001 && cp <= 0x303f) ||
      (cp >= 0xff01 && cp <= 0xff0f) ||
      (cp >= 0xff1a && cp <= 0xff20) ||
      (cp >= 0xff3b && cp <= 0xff40) ||
      (cp >= 0xff5b && cp <= 0xff65)

  /** Mixed-script segmentation for mention detection / context features:
    * whitespace still separates, but runs of Han ideographs tokenize
    * PER CHARACTER (Chinese is written without word spaces — a dictionary
    * surface like 北京大学 must match inside an unsegmented run, which
    * whitespace tokenization can never do; the reference's own corpus is
    * zh/en mixed, /root/reference/data/sample_entities.json:1-120, and its
    * substring CONTAINS search works on zh, neo4j_database.py:240-259).
    * CJK punctuation separates like whitespace — so an embedded Latin token
    * (联系YL7。 -> 联 系 yl7) still matches its dictionary surface. Non-CJK
    * text is byte-identical to `tokens` (guarded by a fast path), so every
    * Latin-corpus fixture, hash gate and offset is unchanged. Kana/Hangul
    * stay run-tokens (space-delimited scripts in practice; per-char would
    * shred Japanese words — documented scope: Han). */
  def mentionTokens(s: String): Array[String] = {
    var hasCjk = false
    var i = 0
    while (i < s.length && !hasCjk) {
      val cp = s.codePointAt(i)
      if (isIdeo(cp) || isCjkPunct(cp)) hasCjk = true
      i += Character.charCount(cp)
    }
    if (!hasCjk) return tokens(s)
    val out = Array.newBuilder[String]
    val run = new java.lang.StringBuilder
    def flush(): Unit = if (run.length > 0) { out += run.toString; run.setLength(0) }
    i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      if (Character.isWhitespace(cp) || isCjkPunct(cp)) flush()
      else if (isIdeo(cp)) { flush(); out += s.substring(i, i + n) }
      else run.append(s, i, i + n)
      i += n
    }
    flush()
    out.result()
  }

  /** Levenshtein distance (unit costs), O(|a|*|b|), two-row DP. */
  def levenshtein(a: CharSequence, b: CharSequence): Int = {
    val (la, lb) = (a.length, b.length)
    if (la == 0) return lb
    if (lb == 0) return la
    var prev = Array.tabulate(lb + 1)(identity)
    var curr = new Array[Int](lb + 1)
    var i = 1
    while (i <= la) {
      curr(0) = i
      val ca = a.charAt(i - 1)
      var j = 1
      while (j <= lb) {
        val cost = if (ca == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    prev(lb)
  }

  /** 1 - lev/max(len); 0.0 when both strings are empty (reference
    * disambiguation.py:347-349 ternary). */
  def levRatio(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 0.0 else 1.0 - levenshtein(a, b).toDouble / m
  }

  /** Longest common subsequence length, O(|a|*|b|), two-row DP. */
  private def lcsLen(a: String, b: String): Int = {
    val (la, lb) = (a.length, b.length)
    if (la == 0 || lb == 0) return 0
    var prev = new Array[Int](lb + 1)
    var curr = new Array[Int](lb + 1)
    var i = 1
    while (i <= la) {
      val ca = a.charAt(i - 1)
      var j = 1
      while (j <= lb) {
        curr(j) =
          if (ca == b.charAt(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), curr(j - 1))
        j += 1
      }
      val tmp = prev; prev = curr; curr = tmp
      java.util.Arrays.fill(curr, 0)
      i += 1
    }
    prev(lb)
  }

  /** Normalized InDel similarity: (la+lb-dist)/(la+lb) where dist is
    * insert/delete-only edit distance = la+lb-2*LCS. Equals rapidfuzz's
    * `ratio`-style normalization for the InDel metric; 1.0 for two empty
    * strings (rapidfuzz returns 100 there). */
  def indelSimilarity(a: String, b: String): Double = {
    val tot = a.length + b.length
    if (tot == 0) 1.0 else 2.0 * lcsLen(a, b) / tot
  }

  /** rapidfuzz fuzz.token_sort_ratio / 100. */
  def tokenSortRatio(a: String, b: String): Double = {
    val sa = tokens(a).sorted.mkString(" ")
    val sb = tokens(b).sorted.mkString(" ")
    indelSimilarity(sa, sb)
  }

  /** max over name x name, aliasA x aliasB, aliasA x nameB, nameA x aliasB of
    * the pairwise function `f`. Alias max defaults to 0.0 when there are no
    * alias pairs (reference `max(alias_scores) if alias_scores else 0.0`). */
  def crossMax(nameA: String, aliasesA: Seq[String], nameB: String, aliasesB: Seq[String])(
      f: (String, String) => Double): Double = {
    var best = f(nameA, nameB)
    var aliasBest = if (aliasesA.isEmpty && aliasesB.isEmpty) 0.0 else Double.MinValue
    for (x <- aliasesA; y <- aliasesB) aliasBest = math.max(aliasBest, f(x, y))
    for (x <- aliasesA) aliasBest = math.max(aliasBest, f(x, nameB))
    for (y <- aliasesB) aliasBest = math.max(aliasBest, f(nameA, y))
    if (aliasBest == Double.MinValue) aliasBest = 0.0
    math.max(best, aliasBest)
  }

  def fuzzScore(nameA: String, aliasesA: Seq[String], nameB: String, aliasesB: Seq[String]): Double =
    crossMax(nameA, aliasesA, nameB, aliasesB)(tokenSortRatio)

  def levScore(nameA: String, aliasesA: Seq[String], nameB: String, aliasesB: Seq[String]): Double =
    crossMax(nameA, aliasesA, nameB, aliasesB)(levRatio)

  // ---------------------------------------------------------------- embedding

  /** murmur3 of the char range [from, from+len) of `s` — bit-identical to
    * MurmurHash3.stringHash(s.substring(from, from+len), seed) without the
    * substring allocation (the embed hot loop would otherwise allocate one
    * substring per n-gram position: billions of objects at corpus scale,
    * which saturates the allocator and caps multi-core scaling). */
  def rangeHash(s: String, from: Int, len: Int, seed: Int): Int = {
    var h = seed
    var i = 0
    while (i + 1 < len) {
      val data = (s.charAt(from + i) << 16) + s.charAt(from + i + 1)
      h = MurmurHash3.mix(h, data)
      i += 2
    }
    if (i < len) h = MurmurHash3.mixLast(h, s.charAt(from + i).toInt)
    MurmurHash3.finalizeHash(h, len)
  }

  /** Deterministic hashed char-n-gram embedding (feature hashing with sign
    * trick), L2-normalized. Same text => same vector on every JVM
    * (MurmurHash3 over the UTF-16 chars is platform-stable). */
  def embed(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    val s = text.toLowerCase
    var n = 2
    while (n <= 3) {
      var i = 0
      val limit = s.length - n
      while (i <= limit) {
        val h = rangeHash(s, i, n, 0x9747b28c)
        val idx = java.lang.Math.floorMod(h, dim)
        if ((h & 0x80000000) == 0) v(idx) += 1f else v(idx) -= 1f
        i += 1
      }
      n += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val len = math.min(a.length, b.length)
    while (i < len) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Ascending-index squared L2 norm — the exact `na`/`nb` accumulation of
    * `cosine` for a full-length vector, hoistable when one side is reused
    * across many pairs (the broadcast sweep pays it per PAIR otherwise:
    * 3 fused multiply-adds per element where 1 carries pair information). */
  def sqNorm(a: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i); i += 1 }
    s
  }

  /** `cosine` with both squared norms precomputed by `sqNorm`. Bit-identical
    * to `cosine(a, b)` ONLY when a.length == b.length (cosine accumulates
    * all three sums over the shorter length); callers must guard. */
  def cosinePrenorm(a: Array[Float], b: Array[Float], na: Double, nb: Double): Double = {
    var dot = 0.0
    var i = 0
    val len = math.min(a.length, b.length)
    while (i < len) { dot += a(i).toDouble * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Platform-stable 64-bit token hash (two murmur32 lanes). */
  def tokenHash64(s: String): Long = {
    val h1 = MurmurHash3.stringHash(s, 0x2e1b2138)
    val h2 = MurmurHash3.stringHash(s, 0x45d9f3b1)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** Precomputed term-frequency vector: sorted distinct 64-bit token hashes
    * of the lowercased tokens, their counts, and the L2 norm. Computed ONCE
    * per mention/entity so the per-pair context score is an allocation-free
    * primitive merge-join — tokens cross the UDF boundary as long[] (no
    * per-element UTF8String->String conversion per candidate pair, which at
    * corpus scale is the dominant memory traffic). Hashing is shared with
    * the oracle, so engine and oracle compute identical scores (a 64-bit
    * collision would merge two token counts — deterministic on both sides). */
  final case class TfVec(tokens: Array[Long], counts: Array[Int], norm: Double)

  def tfVector(text: String): TfVec = {
    // mentionTokens: identical to whitespace tokens on Latin text (fast
    // path), per-character on Han runs — without it a zh context is one
    // giant unique token and the CE-surrogate cosine is structurally 0 for
    // the reference's own primary language. Oracle-shared like everything
    // here, so engine == oracle holds on every script.
    val raw = mentionTokens(text.toLowerCase)
    if (raw.isEmpty) return TfVec(Array.empty, Array.empty, 0.0)
    val hs = new Array[Long](raw.length)
    var k = 0
    while (k < raw.length) { hs(k) = tokenHash64(raw(k)); k += 1 }
    java.util.Arrays.sort(hs)
    val toks = Array.newBuilder[Long]
    val cnts = Array.newBuilder[Int]
    var i = 0
    var norm2 = 0.0
    while (i < hs.length) {
      var j = i + 1
      while (j < hs.length && hs(j) == hs(i)) j += 1
      val c = j - i
      toks += hs(i); cnts += c
      norm2 += c.toDouble * c
      i = j
    }
    TfVec(toks.result(), cnts.result(), math.sqrt(norm2))
  }

  /** TF cosine over two precomputed sorted hashed vectors. */
  def tfCosine(a: TfVec, b: TfVec): Double = {
    if (a.norm == 0.0 || b.norm == 0.0) return 0.0
    var i = 0; var j = 0
    var dot = 0.0
    while (i < a.tokens.length && j < b.tokens.length) {
      // plain locals, not a tuple pattern: the destructuring allocated a
      // boxed Tuple2[Long, Long] per merge step of this inner loop
      val x = a.tokens(i); val y = b.tokens(j)
      if (x == y) { dot += a.counts(i).toDouble * b.counts(j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val c = dot / (a.norm * b.norm)
    math.min(1.0, math.max(0.0, c))
  }

  /** Token TF cosine between two texts, in [0,1]; deterministic surrogate for
    * the CrossEncoder (see object doc). Delegates to the hashed TfVec path so
    * every caller computes the identical value. */
  def contextScore(a: String, b: String): Double =
    tfCosine(tfVector(a), tfVector(b))

  // ------------------------------------------------------- embedding LSH

  /** Deterministic random-hyperplane bank: tables x bits planes of dim
    * floats, values in [-1,1) from platform-stable murmur hashes. Built
    * once per (tables,bits,dim) and cached — model-sized (KBs). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Float]]]()

  private def planes(tables: Int, bits: Int, dim: Int): Array[Array[Float]] =
    planeCache.computeIfAbsent((tables, bits, dim), _ =>
      Array.tabulate(tables * bits) { p =>
        Array.tabulate(dim) { i =>
          val h = MurmurHash3.productHash((p, i), 0x3c6ef372)
          (h / 2147483648.0).toFloat
        }
      })

  /** Sign-LSH bucket keys for a vector: `tables` independent keys of `bits`
    * sign bits each — the blocking analog of FAISS coarse retrieval. Two
    * vectors at cosine c collide per table with prob (1 - acos(c)/pi)^bits;
    * multiple tables drive recall up without widening buckets. */
  def lshKeys(v: Array[Float], tables: Int, bits: Int): Array[String] = {
    val pl = planes(tables, bits, v.length)
    Array.tabulate(tables) { t =>
      var key = 0L
      var b = 0
      while (b < bits) {
        val plane = pl(t * bits + b)
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * plane(i); i += 1 }
        if (dot > 0) key |= (1L << b)
        b += 1
      }
      "l" + t + ":" + java.lang.Long.toHexString(key)
    }
  }

  /** Char n-grams of a lowercased surface, for blocking keys. */
  def blockingGrams(surface: String, n: Int): Array[String] = {
    val s = surface.toLowerCase
    if (s.length <= n) Array(s)
    else Array.tabulate(s.length - n + 1)(i => s.substring(i, i + n)).distinct
  }
}
