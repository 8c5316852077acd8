package graft

import graft.functions.{ScoredVec, TopKByScore}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the pure (no-Spark) algorithmic kernels —
  * the algebraic laws Spark's partial/final aggregation relies on.
  * (Raw ScalaCheck runner: the scalatest-plus bridge isn't in the offline
  * dependency cache.)
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val agg = new TopKByScore(5)
  private val genVec: Gen[ScoredVec] = for {
    p <- Gen.choose(0L, 3L)
    v <- Gen.choose(0L, 1000L)
    c <- Gen.choose(-1.0, 1.0)
  } yield ScoredVec(p, v, c)
  private val genVecs = Gen.listOf(genVec)

  test("TopKByScore: merge order never changes the result") {
    check("commutative", Prop.forAll(genVecs, genVecs) { (xs, ys) =>
      val a = xs.foldLeft(agg.zero)(agg.reduce)
      val b = ys.foldLeft(agg.zero)(agg.reduce)
      agg.merge(a, b) == agg.merge(b, a)
    })
  }

  test("TopKByScore: merge is associative (any partition tree is fine)") {
    check("associative", Prop.forAll(genVecs, genVecs, genVecs) { (xs, ys, zs) =>
      val (a, b, c) = (xs.foldLeft(agg.zero)(agg.reduce),
        ys.foldLeft(agg.zero)(agg.reduce),
        zs.foldLeft(agg.zero)(agg.reduce))
      agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c))
    })
  }

  test("TopKByScore: reduce-then-merge equals one-shot fold") {
    check("partial=whole", Prop.forAll(genVecs, genVecs) { (xs, ys) =>
      agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce),
        ys.foldLeft(agg.zero)(agg.reduce)) ==
        (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
    })
  }

  test("band bucketing covers the range-join predicate exactly") {
    // q_join_range's rewrite: p in [s, s+50] => floor(p/50) is floor(s/50)
    // or floor(s/50)+1 — joining each s to its bucket and the next one
    // loses no pair (the residual BETWEEN restores exactness).
    check("band-cover",
      Prop.forAll(Gen.choose(-10000.0, 10000.0), Gen.choose(-10000.0, 10000.0)) {
        (p: Double, s: Double) =>
          !(p >= s && p <= s + 50.0) || {
            val bp = math.floor(p / 50.0).toLong
            val bs = math.floor(s / 50.0).toLong
            bp == bs || bp == bs + 1
          }
      })
  }
}
