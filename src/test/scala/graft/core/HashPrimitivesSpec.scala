package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import scala.util.hashing.MurmurHash3

import graft.operators.Dedup

/** Property tests (seeded random cases) for the round-1 performance
  * primitives — each must be bit-compatible with the simple form it
  * replaced, or invariant in the way its algorithm requires. */
class HashPrimitivesSpec extends AnyFunSuite {

  val rnd = new Random(0xC0FFEE)
  val alphabet = "abc XYZ09é中!."

  def randText(max: Int): String =
    (0 until rnd.nextInt(max)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  def randWords(max: Int): List[String] =
    List.fill(rnd.nextInt(max))((0 until 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)

  test("rangeHash == stringHash of the substring (allocation-free replacement)") {
    for (_ <- 1 to 500) {
      val s = randText(40)
      val from = if (s.isEmpty) 0 else rnd.nextInt(s.length)
      val len = rnd.nextInt(s.length - from + 1)
      assert(TextSim.rangeHash(s, from, len, 0x9747b28c) ==
        MurmurHash3.stringHash(s.substring(from, from + len), 0x9747b28c))
    }
  }

  test("tfCosine: symmetric, bounded, self-similarity 1 for non-empty text") {
    for (_ <- 1 to 300) {
      val (a, b) = (randText(60), randText(60))
      val (va, vb) = (TextSim.tfVector(a), TextSim.tfVector(b))
      val c = TextSim.tfCosine(va, vb)
      assert(c >= 0.0 && c <= 1.0)
      assert(c == TextSim.tfCosine(vb, va))
      if (TextSim.tokens(a).nonEmpty)
        assert(math.abs(TextSim.tfCosine(va, va) - 1.0) < 1e-12)
    }
  }

  test("tfVector is token-order invariant (bag semantics)") {
    for (_ <- 1 to 300) {
      val ws = randWords(20)
      val shuffled = rnd.shuffle(ws)
      val (a, b) = (TextSim.tfVector(ws.mkString(" ")), TextSim.tfVector(shuffled.mkString(" ")))
      assert(a.tokens.sameElements(b.tokens) && a.counts.sameElements(b.counts) && a.norm == b.norm)
    }
  }

  test("lshKeys: deterministic, right arity, invariant under positive scaling") {
    for (_ <- 1 to 200) {
      val v = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val k = 0.1f + rnd.nextFloat() * 10
      val keys = TextSim.lshKeys(v, 4, 12)
      assert(keys.length == 4)
      assert(keys.sameElements(TextSim.lshKeys(v, 4, 12)))
      // sign-LSH depends only on direction: positive scaling preserves keys
      assert(keys.sameElements(TextSim.lshKeys(v.map(_ * k), 4, 12)))
    }
  }

  test("minhash signature is set-semantics: order and duplicates don't matter") {
    for (_ <- 1 to 200) {
      val sh = randWords(30).distinct
      val noisy = rnd.shuffle(sh ++ sh.take(rnd.nextInt(sh.size + 1)))
      assert(Dedup.minhashSig(sh, 64).sameElements(Dedup.minhashSig(noisy, 64)))
    }
  }

  test("simhash is order invariant (bag semantics)") {
    for (_ <- 1 to 200) {
      val ts = randWords(30)
      assert(Dedup.simhash64(ts) == Dedup.simhash64(rnd.shuffle(ts)))
    }
  }

  test("md5Hash40 / md5Halves / gramHash40s == the hex-parse spellings they replaced") {
    def hexRef(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    for (_ <- 1 to 300) {
      val s = randText(40)
      val h = hexRef(s)
      assert(Dedup.md5Hex(s) == h)
      assert(Dedup.md5Hash40(s) == java.lang.Long.parseLong(h.substring(0, 10), 16))
      assert(Dedup.md5Halves(s) ==
        ((java.lang.Long.parseLong(h.substring(0, 8), 16),
          java.lang.Long.parseLong(h.substring(8, 16), 16))))
    }
    // gram slicing: ASCII, 2/3-byte BMP chars (fast path) and surrogate
    // pairs (substring fallback — a slice cannot reproduce the split-pair
    // replacement encoding); reference is the exact pre-optimization form
    val pinned = Seq("中文abc中文0xyz", "héllo wörld déjà vu", "a😀bcd efgh", "")
    for (s0 <- pinned ++ (1 to 100).map(_ => randText(50)); k <- Seq(3, 8)) {
      val s = s0.toLowerCase
      val ref =
        if (s.length < k) Array.empty[Long]
        else Array.tabulate(s.length - k + 1)(i =>
          java.lang.Long.parseLong(hexRef(s.substring(i, i + k)).substring(0, 10), 16))
      assert(graft.operators.TextStats.gramHashes(s0, k).sameElements(ref))
    }
  }

  test("simhash64 distinct-token counted voting == per-occurrence voting") {
    def ref(tokens: Seq[String]): Long = {
      val acc = new Array[Int](64)
      tokens.foreach { t =>
        val (hi, lo) = Dedup.md5Halves(t)
        var b = 0
        while (b < 64) {
          val bit = if (b < 32) (lo >>> b) & 1L else (hi >>> (b - 32)) & 1L
          if (bit == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
    for (_ <- 1 to 200) {
      val ts = randWords(30)
      val noisy = ts ++ ts.take(rnd.nextInt(ts.size + 1)) // force real duplicates
      assert(Dedup.simhash64(noisy) == ref(noisy))
    }
  }

  test("embed: right dim and unit norm") {
    for (dim <- Seq(16, 64, 128); _ <- 1 to 50) {
      val v = TextSim.embed(randText(80), dim)
      assert(v.length == dim)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(n == 0.0 || math.abs(n - 1.0) < 1e-5)
    }
  }
}
