package graft


/** Dev-loop replica of the driver's t1 smoke gate: SparkEntry.entry must
  * return >0 rows on sf0.001. Prints ENTRY_ROWS=n.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build(master = "local[4]", shufflePartitions = "4")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, truncate = false)
    spark.stop()
  }
}
