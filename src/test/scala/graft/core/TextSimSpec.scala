package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TextSimSpec extends AnyFunSuite {
  import TextSim._

  /** Deterministic property sampling (scalatestplus bridge is not in the
    * offline cache; a seeded generator gives the same coverage). */
  private def samples(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghij XYZ012   "
    (0 until n).map(_ => (0 until rnd.nextInt(20)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
  }

  test("levenshtein known values") {
    assert(levenshtein("kitten", "sitting") == 3)
    assert(levenshtein("", "abc") == 3)
    assert(levenshtein("abc", "") == 3)
    assert(levenshtein("abc", "abc") == 0)
    assert(levenshtein("flaw", "lawn") == 2)
  }

  test("levRatio reference semantics: both empty => 0.0") {
    assert(levRatio("", "") == 0.0)
    assert(levRatio("a", "a") == 1.0)
    assert(math.abs(levRatio("kitten", "sitting") - (1.0 - 3.0 / 7)) < 1e-12)
  }

  test("indelSimilarity matches rapidfuzz ratio normalization") {
    // rapidfuzz.fuzz.ratio("this is a test", "this is a test!") == 96.55...
    assert(math.abs(indelSimilarity("this is a test", "this is a test!") - 28.0 / 29) < 1e-12)
    assert(indelSimilarity("", "") == 1.0)
    assert(indelSimilarity("abc", "abc") == 1.0)
    assert(indelSimilarity("abc", "xyz") == 0.0)
  }

  test("tokenSortRatio is invariant under token permutation") {
    assert(tokenSortRatio("new york mets", "mets new york") == 1.0)
    assert(tokenSortRatio("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear") == 1.0)
  }

  test("crossMax covers name x alias both directions") {
    // nameA matches an alias of B exactly even though names differ
    val s = fuzzScore("DM", Nil, "diabetes", Seq("DM", "diabetes mellitus"))
    assert(s == 1.0)
    val l = levScore("diabetes", Seq("DM"), "unrelated", Seq("DM"))
    assert(l == 1.0)
  }

  test("crossMax with no aliases uses name score only; alias part 0.0") {
    assert(fuzzScore("abc", Nil, "abc", Nil) == 1.0)
    assert(fuzzScore("abc", Nil, "xyz", Nil) == 0.0)
  }

  test("embed: deterministic, right dim, unit norm") {
    val a = embed("some text", 64)
    val b = embed("some text", 64)
    assert(a.sameElements(b))
    assert(a.length == 64)
    val n = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    assert(!embed("other text", 64).sameElements(a))
  }

  test("cosine: identity 1, bounded") {
    val a = embed("hello world", 64)
    assert(math.abs(cosine(a, a) - 1.0) < 1e-6)
    val b = embed("totally different thing", 64)
    val c = cosine(a, b)
    assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
  }

  test("contextScore in [0,1]; identical texts => 1") {
    assert(math.abs(contextScore("a b c", "a b c") - 1.0) < 1e-12)
    assert(contextScore("a b c", "x y z") == 0.0)
    assert(contextScore("", "a") == 0.0)
  }

  test("mentionTokens: Han runs tokenize per character, Latin stays whitespace") {
    assert(mentionTokens("hello  world").sameElements(Array("hello", "world")))
    assert(mentionTokens("今天我们讨论云岭医院")
      .sameElements(Array("今", "天", "我", "们", "讨", "论", "云", "岭", "医", "院")))
    // CJK punctuation separates; embedded Latin token survives intact
    assert(mentionTokens("联系ZH7。谢谢")
      .sameElements(Array("联", "系", "ZH7", "谢", "谢")))
    assert(mentionTokens("云岭医院。today ok")
      .sameElements(Array("云", "岭", "医", "院", "today", "ok")))
    // supplementary-plane ideograph (surrogate pair) is one token
    assert(mentionTokens("a𠀀b").sameElements(Array("a", "𠀀", "b")))
    assert(mentionTokens("").isEmpty && mentionTokens("   ").isEmpty)
  }

  test("mentionTokens == tokens on any CJK-free string (fast-path identity)") {
    for (a <- samples(120)) assert(mentionTokens(a).sameElements(tokens(a)))
  }

  test("mentionTokens properties on random mixed-script strings") {
    val rnd = new scala.util.Random(11)
    val alphabet = "云岭泉桥晨光石河。，abc de 12 "
    val strs = (0 until 200).map(_ =>
      (0 until rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (s <- strs) {
      val t = mentionTokens(s)
      assert(t.forall(_.nonEmpty), s"empty token in '$s'")
      assert(t.sameElements(mentionTokens(s)), "nondeterministic")
      // a token containing an ideograph is exactly one code point
      t.filter(_.exists(Character.isIdeographic(_))).foreach { tok =>
        assert(tok.codePointCount(0, tok.length) == 1, s"multi-cp Han token '$tok' in '$s'")
      }
      // lossless modulo separators: concatenation restores the input with
      // whitespace and CJK punctuation removed
      assert(t.mkString == s.filterNot(c => Character.isWhitespace(c) || c == '。' || c == '，'),
        s"token stream not content-preserving for '$s'")
    }
  }

  test("tokenSortRatio on zh strings pins rapidfuzz semantics (whitespace split)") {
    // rapidfuzz token_sort_ratio splits on whitespace too: an unsegmented zh
    // string is ONE token, so this is plain indel similarity over chars —
    // the scorer must NOT adopt per-char tokenization (X6 parity)
    assert(tokenSortRatio("云岭医院", "云岭医院") == 1.0)
    // single tokens, sorted == identity: 2*LCS/(4+4), LCS(云岭医院, 云岩医院)=3
    assert(math.abs(tokenSortRatio("云岭医院", "云岩医院") - 0.75) < 1e-12)
    // whitespace-separated zh tokens DO sort (token_sort invariance)
    assert(tokenSortRatio("云岭医院 研究所", "研究所 云岭医院") == 1.0)
    assert(math.abs(levRatio("云岭医院", "云岩医院") - 0.75) < 1e-12)
  }

  test("contextScore overlaps on zh via per-char tf tokens") {
    // whitespace tokenization would make these single disjoint tokens => 0;
    // the CJK-aware tfVector shares 慢性疾病 chars
    assert(contextScore("慢性疾病治疗", "慢性疾病患者") > 0.4)
    assert(contextScore("慢性疾病", "调节表达") == 0.0)
  }

  test("properties: symmetry and bounds") {
    val xs = samples(120)
    for ((a, b) <- xs.zip(xs.reverse)) {
      assert(math.abs(tokenSortRatio(a, b) - tokenSortRatio(b, a)) < 1e-12)
      assert(math.abs(levRatio(a, b) - levRatio(b, a)) < 1e-12)
      val t = tokenSortRatio(a, b)
      assert(t >= 0.0 && t <= 1.0)
      val l = levRatio(a, b)
      assert(l >= 0.0 && l <= 1.0)
      val c = contextScore(a, b)
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("properties: self-similarity and embed determinism") {
    for (a <- samples(80)) {
      if (a.nonEmpty) assert(levRatio(a, a) == 1.0)
      assert(tokenSortRatio(a, a) == 1.0)
      val e = embed(a, 32)
      assert(e.length == 32)
      assert(e.sameElements(embed(a, 32)))
    }
  }
}
