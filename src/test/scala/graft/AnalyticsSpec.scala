package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** Semantic laws for the BI-analytics operators the hash gate proves only
  * point-wise: the distribution-walk quantiles against hand-computed
  * percentile_cont values (interpolated and exact-hit positions, multiple
  * groups), basket pair symmetry/bounds, and RFM score sanity.
  */
class AnalyticsSpec extends SparkSpec {

  test("groupQuantiles: interpolated quartiles match percentile_cont by hand") {
    import spark.implicits._
    // group g1: values 1..5 (n=5): q1 -> pos 1.0 -> 2.0 (exact hit),
    // median -> 3.0, q3 -> pos 3.0 -> 4.0
    // group g2: values 10,20,30,40 (n=4): q1 -> pos 0.75 -> 17.5,
    // median -> pos 1.5 -> 25.0, q3 -> pos 2.25 -> 32.5
    val df = (1 to 5).map(v => ("g1", v.toDouble))
      .++(Seq(10.0, 20.0, 30.0, 40.0).map("g2" -> _))
      .toDF("g", "v")
    val q = GraftOps.groupQuantiles(df, col("g"), col("v"),
        Seq(("q1", 1, 4), ("med", 2, 4), ("q3", 3, 4)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(q("g1") === ((2.0, 3.0, 4.0)))
    assert(q("g2") === ((17.5, 25.0, 32.5)))
  }

  test("groupQuantiles: duplicate values weight positions correctly") {
    import spark.implicits._
    // 1,1,1,9 (n=4): median at pos 1.5 interpolates two 1s -> 1.0;
    // q3 at pos 2.25 interpolates 1 and 9 -> 1 + 0.25*8 = 3.0
    val df = Seq(1.0, 1.0, 1.0, 9.0).map("g" -> _).toDF("g", "v")
    val q = GraftOps.groupQuantiles(df, col("g"), col("v"),
        Seq(("med", 1, 2), ("q3", 3, 4)))
      .collect().head
    assert(q.getDouble(1) === 1.0)
    assert(q.getDouble(2) === 3.0)
  }

  test("groupQuantiles: NULL values are excluded like percentile_cont") {
    import spark.implicits._
    // [1,2,3,NULL]: a counted NULL would sort first, make n=4 and shift
    // the median to 1.5; percentile_cont semantics drop it -> 2.0
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), None)
      .map("g" -> _).toDF("g", "v")
    val q = GraftOps.groupQuantiles(df, col("g"), col("v"),
      Seq(("med", 1, 2))).collect().head
    assert(q.getDouble(1) === 2.0)
    val m = GraftOps.groupMedian(df, col("g"), col("v")).collect().head
    assert(m.getDouble(1) === 2.0)
  }

  test("weightedMedian: hand-computed lower-median crossings") {
    import spark.implicits._
    // g1: values 1(w1) 2(w1) 3(w4): totw=6, cum(1)=1 cum(2)=2 cum(3)=6 ->
    //     first 2*cw >= 6 at v=3
    // g2: values 1(w2) 5(w2): totw=4, cum(1)=2 -> 2*2 >= 4 already at v=1
    //     (lower-median convention: the EARLIER of the two middle values)
    // g3: a heavier early value dominates: 10(w5) 99(w1) -> 10
    val df = Seq(("g1", 1.0, 1L), ("g1", 2.0, 1L), ("g1", 3.0, 4L),
      ("g2", 1.0, 2L), ("g2", 5.0, 2L),
      ("g3", 10.0, 5L), ("g3", 99.0, 1L)).toDF("g", "v", "w")
    val got = GraftOps.weightedMedian(df, col("g"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("g1" -> 3.0, "g2" -> 1.0, "g3" -> 10.0))
    // uniform weights reduce to the classic lower median
    val uni = Seq(("u", 1.0, 1L), ("u", 2.0, 1L), ("u", 3.0, 1L),
      ("u", 4.0, 1L)).toDF("g", "v", "w")
    val lm = GraftOps.weightedMedian(uni, col("g"), col("v"), col("w"))
      .collect().head.getDouble(1)
    assert(lm === 2.0)
  }

  test("weightedMedian laws: unit weights = classic median (odd n), weight-scale invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val n = 2 * (3 + rnd.nextInt(10)) + 1 // odd: lower = interpolated
      val vals = Seq.fill(n)(rnd.nextInt(100).toDouble)
      def df(w: Long) = vals.map(("g", _, w)).toDF("g", "v", "w")
      val wm = GraftOps.weightedMedian(df(1L), col("g"), col("v"), col("w"))
        .collect().head.getDouble(1)
      val cm = GraftOps.groupMedian(df(1L), col("g"), col("v"))
        .collect().head.getDouble(1)
      assert(wm === cm, s"trial $trial: unit-weight median diverged")
      // multiplying every weight by a constant cannot move the median
      val wm7 = GraftOps.weightedMedian(df(7L), col("g"), col("v"), col("w"))
        .collect().head.getDouble(1)
      assert(wm7 === wm, s"trial $trial: weight scaling moved the median")
    }
  }

  test("weightedMedian: all-NULL groups keep their row; weights floor") {
    import spark.implicits._
    // the groupMedian contract: g2's values are all NULL -> (g2, NULL)
    // row survives, never a silent drop
    val df = Seq(("g1", Some(1.0), 1.0), ("g1", Some(9.0), 0.4),
      ("g2", None, 5.0), ("g2", None, 5.0)).toDF("g", "v", "w")
    val got = GraftOps.weightedMedian(df, col("g"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    // fractional weights FLOOR (the cross-engine-safe conversion):
    // w=0.4 floors to 0, so v=9.0 carries no weight and 1.0 is median
    assert(got === Map("g1" -> Some(1.0), "g2" -> None))
  }

  test("parallelWalk law: ranged crossing walk is bit-identical to the window walk") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // few huge groups (the shape crossingRows exists for) + a NULL group
    // + ties; values drawn from a small domain so crossings hit tied runs
    val rows = Seq.tabulate(5000) { i =>
      val g: Option[String] =
        if (i % 97 == 0) None else Some(s"g${i % 3}")
      (g, rnd.nextInt(40).toDouble)
    }
    val df = rows.toDF("g", "v")
    val qs = Seq(("p25", 1, 4), ("med", 1, 2), ("p90", 9, 10))
    def key(r: org.apache.spark.sql.Row) =
      (0 until r.length).map(i => if (r.isNullAt(i)) "-" else r.get(i).toString)
        .mkString("|")
    val win = GraftOps.groupQuantiles(df, col("g"), col("v"), qs)
      .collect().map(key).sorted
    val par = GraftOps.groupQuantiles(df, col("g"), col("v"), qs,
      parallelWalk = true).collect().map(key).sorted
    assert(par === win, "quantile walks diverged")
    val winM = GraftOps.groupMedian(df, col("g"), col("v"))
      .collect().map(key).sorted
    val parM = GraftOps.groupMedian(df, col("g"), col("v"),
      parallelWalk = true).collect().map(key).sorted
    assert(parM === winM, "median walks diverged")
    // weighted median shares both walk phases; include a zero-weight
    // value (floors out) and weight ties at the crossing
    val wdf = df.withColumn("w",
      (col("v") % 3 + lit(1)).cast("double"))
    val winW = GraftOps.weightedMedian(wdf, col("g"), col("v"), col("w"))
      .collect().map(key).sorted
    val parW = GraftOps.weightedMedian(wdf, col("g"), col("v"), col("w"),
      parallelWalk = true).collect().map(key).sorted
    assert(parW === winW, "weighted-median walks diverged")
  }

  test("groupQuantiles/groupMedian: all-NULL groups keep their NULL row") {
    import spark.implicits._
    // percentile_cont drops NULL VALUES but still emits the group row;
    // silently losing g2 would break every join-quantiles-back caller
    val df = Seq(("g1", Some(1.0)), ("g1", Some(3.0)),
      ("g2", None), ("g2", None)).toDF("g", "v")
    val q = GraftOps.groupQuantiles(df, col("g"), col("v"),
        Seq(("med", 1, 2))).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(q === Map("g1" -> Some(2.0), "g2" -> None))
    val m = GraftOps.groupMedian(df, col("g"), col("v")).collect()
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(m === Map("g1" -> false, "g2" -> true))
  }

  test("basketPairs: NULL basket keys are unknown baskets, not one basket") {
    import spark.implicits._
    val b = Seq((Some(1), "A"), (Some(1), "B"), (None, "A"), (None, "B"))
      .toDF("basket", "item")
    val out = GraftOps.basketPairs(b).collect()
    assert(out.length === 1)
    val r = out.head
    // only basket 1's pair; n_baskets must count 1 (the NULL rows gone)
    assert((r.getString(0), r.getString(1), r.getLong(2)) === (("A", "B", 1L)))
    assert(r.getDouble(5) === 1.0, "lift must use n_baskets = 1")
  }

  test("groupQuantiles: q=0 and q=1 are exact min and max") {
    import spark.implicits._
    val df = Seq(3.0, 7.0, 42.0).map("g" -> _).toDF("g", "v")
    val q = GraftOps.groupQuantiles(df, col("g"), col("v"),
        Seq(("lo", 0, 4), ("hi", 4, 4))).collect().head
    assert(q.getDouble(1) === 3.0)
    assert(q.getDouble(2) === 42.0)
  }

  test("groupQuantiles: negative and mixed-sign values interpolate exactly") {
    import spark.implicits._
    // [-10, -2, 0, 4]: q1 at pos 0.75 -> -10 + 0.75*8 = -4; med -> -1;
    // q3 at pos 2.25 -> 0 + 0.25*4 = 1 — the integer position math must
    // not assume non-negative values
    val df = Seq(-10.0, -2.0, 0.0, 4.0).map("g" -> _).toDF("g", "v")
    val q = GraftOps.groupQuantiles(df, col("g"), col("v"),
      Seq(("q1", 1, 4), ("med", 2, 4), ("q3", 3, 4))).collect().head
    assert((q.getDouble(1), q.getDouble(2), q.getDouble(3)) ===
      ((-4.0, -1.0, 1.0)))
  }

  test("groupQuantiles equals Spark's exact percentile on random data") {
    import spark.implicits._
    // 600 seeded random values across 5 uneven groups, duplicates
    // included: the distribution walk must agree with the buffering
    // Percentile aggregate bit-for-bit (same interpolation formula) —
    // the law that lets callers swap the OOM-prone buffer for the walk
    val rnd = new scala.util.Random(42)
    val df = (1 to 600).map { i =>
      (s"g${i % 5}", math.floor(rnd.nextDouble() * 1000) / 8.0)
    }.toDF("g", "v")
    val walk = GraftOps.groupQuantiles(df, col("g"), col("v"),
        Seq(("q1", 1, 4), ("med", 2, 4), ("q3", 3, 4)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val buf = df.groupBy(col("g"))
      .agg(expr("percentile(v, array(0.25D, 0.5D, 0.75D))").as("p"))
      .collect().map { r =>
        val s = r.getSeq[Double](1); r.getString(0) -> ((s(0), s(1), s(2)))
      }.toMap
    assert(walk === buf)
  }

  test("basketPairs: counts, ordering, and lift on a hand basket set") {
    import spark.implicits._
    // baskets: {A,B,C}, {A,B}, {A}: AB support 2, AC 1, BC 1;
    // n_A=3, n_B=2, n_C=1, n_baskets=3
    val b = Seq((1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"), (3, "A"),
      (2, "A")) // duplicate (2,A) must not inflate support
      .toDF("basket", "item")
    val out = GraftOps.basketPairs(b).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out.keySet === Set("A" -> "B", "A" -> "C", "B" -> "C"),
      "pairs must be emitted once, lexicographically ordered")
    assert(out("A" -> "B") === ((2L, 3L, 2L, 1.0)))   // 2*3/(3*2)
    assert(out("A" -> "C") === ((1L, 3L, 1L, 1.0)))   // 1*3/(3*1)
    assert(out("B" -> "C") === ((1L, 2L, 1L, 1.5)))   // 1*3/(2*1)
  }

  test("q_rfm: scores are 1..4 and quartile-monotone within a nation") {
    val out = SparkEntry.queries("q_rfm")(spark, sf).collect()
    assert(out.nonEmpty)
    val (ri, fi, mi) = (5, 6, 7)
    assert(out.forall(r => Seq(ri, fi, mi).forall { i =>
      val s = r.getInt(i); s >= 1 && s <= 4
    }))
    // within one nation: monetary score must be monotone in the metric
    val byNation = out.groupBy(_.get(1).toString).maxBy(_._2.length)._2
    val sorted = byNation.sortBy(_.getLong(4)) // monetary_dollars
    val scores = sorted.map(_.getInt(mi))
    assert(scores.zip(scores.tail).forall { case (a, b) => a <= b },
      "m_score not monotone in monetary within a nation")
    // roughly balanced quartiles: every score 1..4 appears
    assert(scores.toSet === Set(1, 2, 3, 4))
  }

  test("q_trending splits every shipment into exactly one half") {
    val total = Tables.lineitem(spark, sf).count()
    val out = ops.AnalyticsQueries.trending(spark, sf).collect()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum === total)
    out.foreach { r =>
      val (recent, early, g) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(g === (recent + 1) * 1000000L / (early + 1))
    }
  }

  test("q_transitions conserves transition mass per user timeline") {
    val ev = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    val out = ops.AnalyticsQueries.transitions(spark, sf).collect()
    // every non-final event contributes exactly one transition
    assert(out.map(_.getLong(2)).sum === expected)
    // per-from probabilities: floor shares sum to <= 1e6, > 1e6 - n_types
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val total = rows.map(_.getLong(3)).sum
      assert(total <= 1000000L && total > 1000000L - rows.length,
        s"floor ppm shares sum to $total")
    }
  }

  test("rangedQuantileTable equals the distribution walk, any partitioning") {
    import spark.implicits._
    // skewed integers with heavy ties — the distribution both paths
    // must weigh identically
    val vals = (1 to 2000).map(i => (i * i) % 97L) ++ Seq.fill(500)(13L)
    val df = vals.toDF("v")
    val qs = Seq(("q1", 1, 8), ("q3", 3, 4), ("med", 1, 2), ("p", 7, 8))
    val walk = GraftOps.groupQuantileTable(df.withColumn("g", lit(1)),
        col("g"), col("v"), qs)
      .drop("grp").collect().head.toSeq
    val r32 = GraftOps.rangedQuantileTable(df, col("v"), qs).collect().head.toSeq
    val r3 = GraftOps.rangedQuantileTable(df, col("v"), qs, partitions = 3)
      .collect().head.toSeq
    assert(r32 === walk, "ranged prefix-sum must equal the walk")
    assert(r3 === walk, "result must be partitioning-independent")
  }

  test("q_cdc_diff change counts equal the planted mutations exactly") {
    val keys = Tables.orders(spark, sf).select(col("o_orderkey"))
      .collect().map(_.getLong(0))
    val expD = keys.count(_ % 97 == 0)
    val expI = keys.count(_ % 103 == 0)
    val expU = keys.count(k => k % 97 != 0 && k % 101 == 0)
    val got = ops.SetQueries.cdcDiff(spark, sf).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(got.getOrElse("D", 0) === expD)
    assert(got.getOrElse("I", 0) === expI)
    assert(got.getOrElse("U", 0) === expU)
  }

  test("q_attribution: touch ordering and exact linear shares") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val out = ops.AnalyticsQueries.attribution(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, first, last) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(!ev(first).after(ev(last)), "first touch must not follow last")
      if (n == 1) assert(first === last)
      val ppm = r.getLong(5)
      assert(ppm * n <= 1000000L && 1000000L < ppm * n + n,
        s"linear share $ppm not the exact floor of 1e6/$n")
    }
  }

  test("q_concurrency conserves session-bucket mass") {
    val sess = graft.streaming.StreamOps.sessionize(Tables.events(spark, sf))
      .select(expr("unix_micros(session_start) div 300000000").as("bs"),
        expr("unix_micros(session_end) div 300000000").as("be"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedMass = sess.map { case (bs, be) => be - bs + 1 }.sum
    val out = ops.AnalyticsQueries.concurrency(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum === expectedMass,
      "sum of per-bucket actives must equal total session-bucket slots")
    assert(out.forall(_.getLong(1) >= 1))
    // peak concurrency is at least the busiest single instant's floor:
    // any bucket containing k session starts has n_active >= k
    assert(out.map(_.getLong(1)).max >= 2, "fixture should overlap sessions")
  }

  test("q_skyline equals the brute-force dominance filter") {
    val rows = Tables.part(spark, sf).select(col("p_brand"), col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = rows.filter { case (b, _, pc, sz) =>
      !rows.exists { case (b2, _, pc2, sz2) =>
        b2 == b && pc2 < pc && sz2 > sz
      }
    }.toSet
    val got = ops.AnalyticsQueries.skyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    // a frontier is never empty while the input isn't
    assert(got.nonEmpty)
  }

  test("spikeDays: exact 2x-trailing-mean rule, empty first frame never " +
    "flags, gaps use PRESENT days (ROWS framing)") {
    import spark.implicits._
    // u1: 2 events/day on days 1..8, then 5 on day 9 — 5·7 > 2·14 → spike.
    // u2: one event on day 1 and day 20 (gap) — trailing frame of day 20
    // is the PRESENT day 1 row, 1·1 > 2·1 is false → no spike.
    val evs =
      (for (d <- 1 to 8; _ <- 1 to 2) yield (1L, f"2024-03-$d%02d 10:00:00")) ++
      Seq.fill(5)((1L, "2024-03-09 10:00:00")) ++
      Seq((2L, "2024-03-01 10:00:00"), (2L, "2024-03-20 10:00:00"))
    val df = evs.toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val out = GraftOps.spikeDays(df, col("user_id"), col("ts"))
      .orderBy("entity", "day")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    val u1 = out.filter(_._1 == 1L)
    assert(u1.head === ((1L, "2024-03-01", 2L, 0L, 0L, 0)))
    assert(u1.last === ((1L, "2024-03-09", 5L, 7L, 14L, 1)))
    // days 2..8 sit exactly AT the trailing mean — never above 2x it
    assert(u1.drop(1).dropRight(1).forall(_._6 == 0))
    val u2 = out.filter(_._1 == 2L)
    assert(u2 === Seq((2L, "2024-03-01", 1L, 0L, 0L, 0),
      (2L, "2024-03-20", 1L, 1L, 1L, 0)))
  }

  test("seasonalHours: cells compare against their own (weekday, hour) " +
    "baseline, exact 2x rule, separate hours never mix") {
    import spark.implicits._
    // Mondays 2024-03-04/11/18 at 09h: counts 1, 1, 10 -> baseline
    // total 12 over 3 cells; 10*3 > 2*12 flags, 1*3 does not. The same
    // Mondays at 14h hold counts 4, 4, 4 — a DIFFERENT baseline slot
    // (flat, nothing flags); if hours mixed, the 09h spike would dilute.
    val evs =
      Seq((1, "2024-03-04 09:15:00")) ++
      Seq((1, "2024-03-11 09:40:00")) ++
      Seq.fill(10)((1, "2024-03-18 09:05:00")) ++
      (for (d <- Seq(4, 11, 18); _ <- 1 to 4)
        yield (1, f"2024-03-$d%02d 14:30:00"))
    val df = evs.toDF("k", "s")
      .select(lit("click").as("event_type"),
        col("s").cast("timestamp").as("ts"))
    val out = GraftOps.seasonalHours(df, col("event_type"), col("ts"))
      .orderBy("ev_date", "hod")
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(out === Seq(
      ("2024-03-04", 9, 1L, 12L, 3L, 0),
      ("2024-03-04", 14, 4L, 12L, 3L, 0),
      ("2024-03-11", 9, 1L, 12L, 3L, 0),
      ("2024-03-11", 14, 4L, 12L, 3L, 0),
      ("2024-03-18", 9, 10L, 12L, 3L, 1),
      ("2024-03-18", 14, 4L, 12L, 3L, 0)))
  }
}
