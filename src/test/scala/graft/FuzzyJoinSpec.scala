package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** Losslessness law for the q-gram-blocked edit-distance join: on an
  * adversarial corpus (3-letter alphabet → heavy gram collisions AND
  * repeated grams inside one string, the case the occurrence index
  * exists for), the blocked join must return EXACTLY the brute-force
  * cross-join answer.
  */
class FuzzyJoinSpec extends SparkSpec {

  private def corpus(n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val base = (0 until n).map { i =>
      val len = 12 + rnd.nextInt(5)
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    // mutate every 3rd string: delete, substitute, or insert one char
    val mutated = base.filter(_._1 % 3 == 0).map { case (id, s) =>
      val p = (id % (s.length - 1)).toInt + 1
      val m = (id / 3) % 3 match {
        case 0 => s.substring(0, p - 1) + s.substring(p)          // delete
        case 1 => s.substring(0, p - 1) + "z" + s.substring(p)    // subst
        case _ => s.substring(0, p) + "z" + s.substring(p)        // insert
      }
      (id + 1000L, m)
    }
    base ++ mutated
  }

  test("fuzzyJoin equals brute force on a gram-colliding corpus") {
    import spark.implicits._
    val df = corpus(60).toDF("id", "s")
    val blocked = GraftOps.fuzzyJoin(df, col("id"), col("s"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val names = df.filter(length(col("s")) >= 9) // operator's minLen contract
    val brute = names.as("x").crossJoin(names.as("y"))
      .filter(col("x.id") < col("y.id") &&
        levenshtein(col("x.s"), col("y.s")) <= 2)
      .select(col("x.id"), col("y.id"),
        levenshtein(col("x.s"), col("y.s")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "degenerate fixture: no true pairs to find")
    assert(blocked === brute,
      s"missed=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
  }

  test("fuzzyJoin: k=1 still finds single-edit twins, rejects two-edit") {
    import spark.implicits._
    val df = Seq((1L, "abcabcabcabc"), (2L, "abcabcabcabX"),   // ed 1
      (3L, "abcabcabcaYX")).toDF("id", "s")                    // ed 2 from 1
    val out = GraftOps.fuzzyJoin(df, col("id"), col("s"), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L), (2L, 3L)))
  }

  test("fuzzyJoin: strings below the (k+1)*q length floor are excluded") {
    import spark.implicits._
    // documented contract: len >= (k+1)*q = 9 at k=2,q=3 — a short pair
    // within k edits can share ZERO grams, so it is excluded, not missed
    val df = Seq((1L, "abcdefgh"), (2L, "abcdefgX"),   // len 8: excluded
      (3L, "abcdefghi"), (4L, "abcdefghX")).toDF("id", "s") // len 9: kept
    val out = GraftOps.fuzzyJoin(df, col("id"), col("s"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((3L, 4L)))
  }

  test("fuzzyJoin: repeated-gram strings need the occurrence index") {
    import spark.implicits._
    // 'aaaaaaaaaaaa' vs 'aaaaaaaaaaab': every distinct gram of the first
    // is 'aaa' — only the multiset (occurrence-indexed) view sees enough
    // shared grams to pass the count bound. ed = 1 <= 2 must be found.
    val df = Seq((1L, "aaaaaaaaaaaa"), (2L, "aaaaaaaaaaab"),
      (3L, "bbbbbbbbbbbb")).toDF("id", "s")
    val out = GraftOps.fuzzyJoin(df, col("id"), col("s"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L)))
  }
}
