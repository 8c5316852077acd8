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

  test("MP4 encode→probe round-trips every field across the whole domain") {
    // the container codec is a pure byte function: whatever fields the
    // writer laid out, the box walk must recover exactly — including the
    // integer-floor ms conversion — for both time layouts and both
    // track shapes, at u32 boundaries and v1's u64 range
    val genFields = for {
      dur <- Gen.oneOf(Gen.choose(0L, 4294967295L),
        Gen.choose(0L, Long.MaxValue / 1000))
      ts <- Gen.choose(1, 1000000000)
      w <- Gen.choose(0, 32767)
      h <- Gen.choose(0, 32767)
      v1 <- Gen.oneOf(true, false)
      au <- Gen.oneOf(true, false)
    } yield (dur, ts, w, h, v1, au)
    check("mp4-roundtrip", Prop.forAll(genFields) {
      case (dur, ts, w, h, v1, au) =>
        // v0 stores 32-bit times: clamp the generated duration there
        val d = if (v1) dur else dur % 4294967296L
        val bytes = graft.api.MultimodalDecode.encodeMp4(
          d, ts, w, h, version1 = v1, audioTrack = au)
        val m = graft.api.MultimodalDecode.probeVideoOne(
          graft.api.MediaIn(0L, bytes, "video/mp4"))
        m.ok && m.timescale == ts && m.width == w && m.height == h &&
          m.duration_ms == d * 1000L / ts
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
