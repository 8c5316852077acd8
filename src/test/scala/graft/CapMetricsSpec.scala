package graft

import scala.jdk.CollectionConverters._

import graft.api.GraftOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Cap observability: the hub cap in [[GraftOps.capAnchors]] must not
  * silently reshape an operator's output — every capped expansion
  * carries an `observe()` node whose `total_keys` / `capped_keys` /
  * `max_key_size` metrics a QueryExecutionListener can harvest, the
  * production audit trail for "how many whales did this run drop".
  */
class CapMetricsSpec extends SparkSpec {

  /** Harvest graft_cap: observed metrics from every successful query
    * execution while `body` runs; listener delivery is async, so poll.
    */
  private def withCapMetrics[A](body: => A,
      prefix: String = "graft_cap:"): (A, Seq[Row]) = {
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Row)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) =>
          if (k.startsWith(prefix)) captured.add(k -> v)
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = body
      var tries = 0
      while (captured.isEmpty && tries < 200) { Thread.sleep(25); tries += 1 }
      (result, captured.asScala.toSeq.map(_._2))
    } finally spark.listenerManager.unregister(listener)
  }

  test("capAnchors: capped-key counts are observable, whale excluded") {
    import spark.implicits._
    // 3 baskets: two normal {A,B}, one 10-item whale past the cap of 4
    val normal = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"))
      .toDF("basket", "item")
    val whale = spark.range(10).select(lit(999L).as("basket"),
      concat(lit("w"), col("id")).as("item"))
    val (out, metrics) = withCapMetrics {
      GraftOps.basketPairs(normal.unionByName(whale), maxBasketSize = 4)
        .collect()
    }
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set("A" -> "B"), "whale items must not reach the pair projection")
    assert(metrics.nonEmpty,
      "graft_cap observed metric must be delivered to the listener")
    val m = metrics.last
    assert(m.getAs[Long]("total_keys") === 3L)
    assert(m.getAs[Long]("capped_keys") === 1L)
    assert(m.getAs[Long]("max_key_size") === 10L)
  }

  test("capAnchors: zero capped keys on an all-normal input") {
    import spark.implicits._
    val edges = Seq((1L, "A"), (1L, "B"), (2L, "A")).toDF("basket", "item")
    val (n, metrics) = withCapMetrics {
      GraftOps.capAnchors(edges, "basket", "item", 4).count()
    }
    assert(n === 3L, "no row may be dropped below the cap")
    assert(metrics.nonEmpty)
    assert(metrics.last.getAs[Long]("capped_keys") === 0L)
    assert(metrics.last.getAs[Long]("total_keys") === 2L)
  }

  test("capAnchors: whale plus all-NULL-item baskets stay crash-free") {
    import spark.implicits._
    // dirty feed: one whale past the cap, one basket whose items are all
    // NULL (count_distinct = 0 -> kept but pairless), one normal pair —
    // the projection must emit exactly the normal pair and meter the
    // whale, never NPE on the NULL items
    val normal = Seq((1L, Some("A")), (1L, Some("B")),
      (5L, None: Option[String]), (5L, None: Option[String]))
      .toDF("basket", "item")
    val whale = spark.range(10).select(lit(999L).as("basket"),
      concat(lit("w"), col("id")).as("item"))
    val (out, metrics) = withCapMetrics {
      GraftOps.basketPairs(normal.unionByName(whale), maxBasketSize = 4)
        .collect()
    }
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set("A" -> "B"))
    assert(metrics.nonEmpty)
    assert(metrics.last.getAs[Long]("capped_keys") === 1L)
  }

  test("capAnchors: rebuilt queries stay plan-equal (cache reusable)") {
    // The observe name must be DERIVED from the call signature, never a
    // fresh counter: CacheManager matches persisted subtrees by
    // analyzed-plan equality, and a per-invocation unique name silently
    // turns every rebuild's persistOnce into a cache miss (measured as
    // a 3.5x warm-path regression on q_basket before this pin).
    def build() = SparkEntry.queries("q_basket")(spark, sf)
    assert(build().queryExecution.analyzed
        .sameResult(build().queryExecution.analyzed),
      "two builds of the same query must be plan-identical")
  }

  test("q_common_nbrs carries the cap metric end-to-end") {
    val (out, metrics) = withCapMetrics {
      SparkEntry.queries("q_common_nbrs")(spark, sf).collect()
    }
    assert(out.nonEmpty)
    assert(metrics.nonEmpty,
      "the registered query must surface the cap metric")
    // sf0.001 has no whales past the 4096 default — the metric must say so
    assert(metrics.last.getAs[Long]("capped_keys") === 0L)
    assert(metrics.last.getAs[Long]("total_keys") > 0L)
  }

  test("threshold floors are observable: q_common_nbrs meters MinCommon") {
    // The MinCommon floor got the MaxBasketSize treatment: one constant,
    // interpolated into the oracle, surfaced as a graft_min: observe()
    // metric. kept_pairs must equal the query's actual output size.
    val (out, metrics) = withCapMetrics(
      SparkEntry.queries("q_common_nbrs")(spark, sf).collect(),
      prefix = "graft_min:common:")
    assert(metrics.nonEmpty,
      "the MinCommon floor must surface a graft_min: metric")
    val m = metrics.last
    assert(m.getAs[Long]("kept_pairs") === out.length.toLong,
      "metered kept_pairs must equal the emitted pair count")
    assert(m.getAs[Long]("total_pairs") >= m.getAs[Long]("kept_pairs"))
  }

  test("threshold floors are observable: q_triangles meters MinSupport") {
    val (_, metrics) = withCapMetrics(
      SparkEntry.queries("q_triangles")(spark, sf).collect(),
      prefix = "graft_min:support:")
    assert(metrics.nonEmpty,
      "the MinSupport floor must surface a graft_min: metric")
    val m = metrics.last
    assert(m.getAs[Long]("total_pairs") >= m.getAs[Long]("kept_pairs"))
    assert(m.getAs[Long]("kept_pairs") > 0L)
  }
}
