package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The round-8 hot-loop optimization contract: cosinePrenorm(a, b,
  * sqNorm(a), sqNorm(b)) must be BIT-identical to cosine(a, b) whenever the
  * lengths match — the sweep/candidate paths rely on exact equality (the
  * branch-and-bound argmax and every oracle-gated score flow through it).
  */
class CosinePrenormSpec extends AnyFunSuite {

  private def vecs(seed: Int, n: Int, dim: Int): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array.fill(dim)((rnd.nextGaussian() * rnd.nextInt(3)).toFloat))
  }

  test("cosinePrenorm == cosine bit-for-bit on equal-length vectors") {
    val vs = vecs(7, 40, 64) :+ Array.fill(64)(0f) // include a zero vector
    for (a <- vs; b <- vs) {
      val expect = TextSim.cosine(a, b)
      val got = TextSim.cosinePrenorm(a, b, TextSim.sqNorm(a), TextSim.sqNorm(b))
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(expect),
        s"prenorm diverged: $got vs $expect")
    }
  }

  test("sqNorm equals cosine's own-norm accumulation (self-cosine is 1 or 0)") {
    vecs(11, 20, 32).foreach { a =>
      val self = TextSim.cosinePrenorm(a, a, TextSim.sqNorm(a), TextSim.sqNorm(a))
      assert(self == TextSim.cosine(a, a))
    }
  }

  test("hot-path guard: callers fall back to cosine on unequal lengths") {
    // documents the contract rather than the arithmetic: cosine() folds all
    // three sums over the shorter length, so prenorm over full-length norms
    // is NOT equivalent there — which is why every call site guards on
    // a.length == b.length before taking the prenorm spelling
    val a = Array(1f, 2f, 3f)
    val b = Array(1f, 2f)
    assert(TextSim.cosine(a, b) ==
      TextSim.cosinePrenorm(a, b,
        TextSim.sqNorm(a.take(2)), TextSim.sqNorm(b)))
  }
}
