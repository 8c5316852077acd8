package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** Laws for the Bloom-filter-pruned semi-join: exactness (the filter may
  * only over-approximate — the exact verify join removes false positives,
  * and a false NEGATIVE would drop a true match), behavior across types
  * and degenerate inputs, and the pruning actually pruning.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloomSemiJoin equals the exact semi-join on overlapping key sets") {
    import spark.implicits._
    val fact = (1L to 2000L).map(i => (i % 500, i)).toDF("fk", "payload")
    val dim = (0L to 499L by 7L).toDF("dk")
    val got = GraftOps.bloomSemiJoin(fact, col("fk"), dim, col("dk"),
        numBits = 1 << 10, numHashes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("bloomSemiJoin: string keys, duplicate dim keys, schema preserved") {
    import spark.implicits._
    val fact = Seq(("x", 1), ("y", 2), ("z", 3), ("w", 4)).toDF("k", "v")
    val dim = Seq("y", "y", "w", "nope").toDF("dk")
    val out = GraftOps.bloomSemiJoin(fact, col("k"), dim, col("dk"))
    assert(out.columns.toSeq === Seq("k", "v"),
      "probe/bitmap plumbing must not leak columns")
    assert(out.collect().map(r => (r.getString(0), r.getInt(1))).toSet ===
      Set(("y", 2), ("w", 4)))
  }

  test("bloomSemiJoin: empty dim yields empty result, not an error") {
    import spark.implicits._
    val fact = (1L to 50L).toDF("fk")
    val dim = Seq.empty[Long].toDF("dk")
    assert(GraftOps.bloomSemiJoin(fact, col("fk"), dim, col("dk")).count() === 0L)
  }

  test("bloomAntiJoin equals the exact anti-join; misses skip the verify") {
    import spark.implicits._
    val fact = (1L to 2000L).map(i => (i % 500, i)).toDF("fk", "payload")
    val dim = (0L to 499L by 7L).toDF("dk")
    val got = GraftOps.bloomAntiJoin(fact, col("fk"), dim, col("dk"),
        numBits = 1 << 10, numHashes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = fact.join(dim, col("fk") === col("dk"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("bloomAntiJoin: disjoint key spaces keep everything; empty dim too") {
    import spark.implicits._
    val fact = (1000L to 1050L).toDF("fk")
    val dim = (1L to 100L).toDF("dk")
    assert(GraftOps.bloomAntiJoin(fact, col("fk"), dim, col("dk"))
      .count() === 51L)
    val empty = Seq.empty[Long].toDF("dk")
    assert(GraftOps.bloomAntiJoin(fact, col("fk"), empty, col("dk"))
      .count() === 51L)
  }

  test("the bitmap probe prunes: a tiny filter passes few false positives") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // disjoint key spaces: every fact row is a potential false positive.
    // At m=2^14 bits / k=5 / n=100 keys, fpp ~ (1-e^(-500/16384))^5 ≈ 2e-8.
    // Assert on the PROBE VERDICT itself — the end-to-end result is empty
    // either way (the exact verify join removes false positives), so only
    // the __might survivor count can expose a bitmap that prunes nothing.
    val fact = (1000000L to 1010000L).toDF("fk")
    val dim = (1L to 100L).toDF("dk")
    val (probed, _) = GraftOps.bloomProbe(fact, col("fk"), dim, col("dk"),
      numBits = 1 << 14, numHashes = 5)
    val survivors = probed.filter(col("__might")).count()
    assert(survivors <= 10L,
      s"bitmap passed $survivors of 10001 disjoint keys — not pruning")
    assert(GraftOps.bloomSemiJoin(fact, col("fk"), dim, col("dk"),
      numBits = 1 << 14, numHashes = 5).count() === 0L)
  }

  test("bloom joins stay exact across mismatched key types (int vs long)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // xxhash64 hashes an int and a long of the same value differently —
    // without canonicalization the build and probe would set/test
    // different bits and silently drop TRUE matches (false negatives).
    val fact = (1 to 1000).map(i => i % 200).toDF("fk") // IntegerType
    val dim = (0L to 199L by 2L).toDF("dk")             // LongType
    val got = GraftOps.bloomSemiJoin(fact, col("fk"), dim, col("dk")).count()
    val want = fact.join(dim, col("fk") === col("dk"), "left_semi").count()
    assert(got === want && got > 0)
    val gotAnti = GraftOps.bloomAntiJoin(fact, col("fk"), dim, col("dk")).count()
    assert(gotAnti === fact.count() - want)
  }
}
