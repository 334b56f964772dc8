package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-up fixture's text-bijection family across the r13
  * ceiling lift: the affine prefix stays verbatim (committed ≤312-replica
  * fixtures regenerate content-identical), the seeded extension keeps
  * the pairwise-agreement distance argument, and generation is
  * deterministic. No Spark needed — textPerms is pure. */
class ScaleUpSpec extends AnyFunSuite {
  import graft.tools.ScaleUp.{textPerms, MaxAgree}

  private def agree(x: String, y: String): Int =
    (0 until 26).count(i => x(i) == y(i))

  test("every map is a bijection of a-z, replica 0 is the identity") {
    val ps = textPerms(400)
    assert(ps.size === 400)
    assert(ps(0) === ('a' to 'z').mkString)
    ps.foreach(p => assert(p.sorted === ('a' to 'z').mkString,
      s"not a permutation: $p"))
    assert(ps.distinct.size === 400, "maps must be pairwise distinct")
  }

  test("replicas 0-311 are the original affine family verbatim") {
    val copr = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val ps = textPerms(400)
    (0 until 312).foreach { r =>
      val a = copr((r / 26) % copr.length); val b = r % 26
      val affine = (0 until 26).map(l => ('a' + (a * l + b) % 26).toChar).mkString
      assert(ps(r) === affine, s"affine prefix changed at replica $r")
    }
  }

  test("distance argument holds across the 312 boundary") {
    val ps = textPerms(400)
    // Affine-affine: ≤ 2 agreeing letters ((a1-a2)·l ≡ b2-b1 mod 26 has
    // gcd(a1-a2, 26) ≤ 2 solutions — odd multipliers, even differences,
    // never ±13).
    for (i <- 0 until 312; j <- (i + 1) until 312 by 17)
      assert(agree(ps(i), ps(j)) <= 2, s"affine pair ($i,$j)")
    // Any pair involving a seeded map: ≤ MaxAgree by the rejection check.
    for (i <- 0 until 400; j <- math.max(i + 1, 312) until 400)
      assert(agree(ps(i), ps(j)) <= MaxAgree, s"seeded pair ($i,$j)")
  }

  test("generation is deterministic and prefix-stable") {
    val a = textPerms(350)
    val b = textPerms(400)
    assert(b.take(350) === a, "a longer fixture must extend, not reshuffle")
  }
}
