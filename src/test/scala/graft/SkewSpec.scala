package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** Skew-mitigation surface: the salted two-phase aggregation must equal
  * the direct aggregation (associativity), and the salt must actually
  * fan a hot key out across partitions.
  */
class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf)
    val salted = GraftOps.saltedAgg(li, col("l_returnflag"),
      col("l_quantity"), salts = 16)
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_value"))
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)
  }

  test("AQE splits the skewed partition on the UNSALTED hot-key join") {
    // q_join_salted proves the manual salt; this pins the claim that the
    // runtime alternative — AQE's OptimizeSkewedJoin — fires on the
    // equivalent unsalted join when one key owns most of the fact table.
    // Thresholds are lowered so the split triggers at test scale (the
    // rule fires when a post-shuffle partition exceeds both the factor x
    // median and the byte threshold); broadcast is disabled because the
    // rule only rewrites sort-merge joins.
    val restore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 400k fact rows, ~95% on key 0; dim has 32 rows per key so the
      // join output is big enough for the split to pay for itself
      val fact = spark.range(0, 400000L, 1, 8)
        .select(when(pmod(col("id"), lit(20L)) =!= 0, lit(0L))
          .otherwise(pmod(col("id"), lit(1000L))).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 1000L, 1, 4)
        .select(col("id").as("k"),
          explode(array((0 until 32).map(lit(_)): _*)).as("tag"))
      val joined = fact.join(dim, "k")
      // execute THIS dataframe's own plan (count() would plan a separate
      // aggregate query and leave joined's adaptive plan un-finalized)
      val n = joined.queryExecution.toRdd.count()
      assert(n === 400000L * 32)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire; final plan:\n$finalPlan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltKey spreads a single hot key over the salt space") {
    val hot = Tables.lineitem(spark, sf)
      .select(GraftOps.saltKey(lit("HOTKEY"), 16).as("sk"),
        col("l_orderkey"))
    // lit key => same salt everywhere; salting a CONSTANT is a no-op by
    // design (hash of the key). For per-row spread the caller salts with
    // a row-unique column:
    val spread = Tables.lineitem(spark, sf)
      .select(GraftOps.saltKey(col("l_orderkey"), 16).as("sk"))
      .select(split(col("sk"), "#").getItem(0).as("salt"))
      .distinct().count()
    assert(spread > 1 && spread <= 16)
    assert(hot.select(col("sk")).distinct().count() === 1)
  }
}
