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

  // ------------------------------------------ embedding sign patterns
  // The signed-rotation scheme lifts the old k <= dim ceiling: each copy
  // is rotation(i % dim) composed with signPattern(i / dim) — both
  // orthogonal, so within-copy dot products are exact-preserved; what
  // these pins guard is the CROSS-copy geometry (same failure class as
  // the period-13 rotation bug above: silent collapse inflates slopes).

  test("sign group 0 is the identity (copies 0..dim-1 = old pure rotations)") {
    assert(ScaleUp.signPattern(0, 64).forall(_ == 1.0f))
  }

  test("non-identity groups flip a balanced share of coordinates") {
    // Cosine between same-base-vector copies across groups is
    // sum(±x_j²)/|x|²; a lopsided pattern (few flips) would leave it
    // near ±1 and collapse copies into near-duplicates. Require each
    // pattern — and each PAIRWISE relative pattern — to flip 1/4..3/4
    // of the 64 dims (binomial(64, 1/2) tail beyond that is ~1e-5).
    val dim = 64
    val groups = (1 to 16).map(g => ScaleUp.signPattern(g, dim))
    groups.zipWithIndex.foreach { case (p, g) =>
      val flips = p.count(_ == -1.0f)
      assert(flips >= dim / 4 && flips <= 3 * dim / 4,
        s"group ${g + 1} flips $flips/$dim")
    }
    // relative pattern between any two groups (incl. identity group 0)
    val all = ScaleUp.signPattern(0, dim) +: groups
    for (a <- all.indices; b <- all.indices if a < b) {
      val diff = (0 until dim).count(j => all(a)(j) != all(b)(j))
      assert(diff >= dim / 4 && diff <= 3 * dim / 4,
        s"groups $a,$b differ in $diff/$dim dims — copies sharing a " +
          "shift would be near-parallel or near-antiparallel")
    }
  }

  test("sign patterns preserve within-copy dot products exactly") {
    val dim = 64
    val p = ScaleUp.signPattern(3, dim)
    val rnd = new scala.util.Random(7)
    val x = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    val y = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (u, v) => u.toDouble * v }.sum
    val xs = x.zip(p).map { case (v, s) => v * s }
    val ys = y.zip(p).map { case (v, s) => v * s }
    assert(dot(xs, ys) == dot(x, y),
      "sign flip must cancel in products: (s*x)(s*y) = x*y exactly")
  }

  test("key stride exceeds every source key space") {
    // sf0.1 max keys (TESTDATA.md tables): orders/lineitem 149999,
    // events 99999, part 19999, customer 14999, documents 4999,
    // embeddings 1999 — all < KeyStride, so shifted copies never collide
    assert(ScaleUp.KeyStride > 150000L)
  }
}
