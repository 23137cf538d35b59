package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ScaleUp generator invariants SCALING.md's slopes rest on —
  * the r7 sf3 run showed what a silent violation costs: the original
  * step-2 rotations had period 13, copies beyond 12 shared vocabulary,
  * and cross-copy duplicate pairs inflated dedup slopes superlinearly.
  */
class ScaleUpSpec extends AnyFunSuite {

  private val alphabet = "etaoinshrdlucmfwypvbgkjqxz"
  private val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  private def subst(i: Int): String = {
    val (a, b) = (coprimes(i % coprimes.length), i / coprimes.length)
    alphabet.indices.map(j => alphabet((a * j + b) % 26)).mkString
  }

  test("per-copy letter substitutions are bijections, identity at copy 0") {
    assert(subst(0) == alphabet)
    (0 until 312).foreach { i =>
      assert(subst(i).toSet == alphabet.toSet, s"copy $i is not a permutation")
    }
  }

  test("all 312 substitutions are pairwise distinct (no vocabulary sharing)") {
    val all = (0 until 312).map(subst)
    assert(all.distinct.size == 312,
      "duplicate permutations would make copies share vocabulary and " +
        "inflate cross-copy near-dup pairs")
  }

  test("key stride exceeds every source key space") {
    // sf0.1 max keys (TESTDATA.md tables): orders/lineitem 149999,
    // events 99999, part 19999, customer 14999, documents 4999,
    // embeddings 1999 — all < KeyStride, so shifted copies never collide
    assert(ScaleUp.KeyStride > 150000L)
  }
}
