package graft

/** Time a handful of registered queries in one warm session — the
  * iteration loop for targeted perf work (Bench times everything; this
  * times what you are tuning). Usage:
  *
  *   sbt "runMain graft.TimeQuery <sfDir> <query> [query ...]"
  *
  * Each query runs `reps` times (default 2, env SPARK_GRAFT_TQ_REPS) and
  * every pass is printed, so cache warm-up effects stay visible instead of
  * being folded into a min like Bench does.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <query> [query ...]")
    val sfDir = args.head
    val reps = sys.env.getOrElse("SPARK_GRAFT_TQ_REPS", "2").toInt
    val spark = Sessions.build()
    SparkEntry.entry(spark).count() // untimed JIT/classloader warm-up
    args.tail.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        f"$sec%.3f ($n rows)"
      }
      println(s"TIMEQ $name: ${times.mkString(", ")}")
    }
    spark.stop()
  }
}
