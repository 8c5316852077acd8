package graft

import org.apache.spark.sql.functions._

/** Empty-input robustness sweep: every registered query runs against a
  * fixture directory whose tables carry the real schemas but ZERO rows —
  * the day-one state of any new deployment, and the per-partition state
  * of any heavily filtered pipeline. Contract: a query either evaluates
  * (producing >= 0 rows) or fails with a DOCUMENTED require()-style
  * IllegalArgumentException — never an analysis error, NPE, or
  * NoSuchElementException from an unguarded first()/head on empty data.
  */
class EmptyInputSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    tables.foreach { t =>
      val schema = spark.read.parquet(s"$sf/$t.parquet").schema
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query evaluates on empty tables or fails its documented contract") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, emptyDir).count()
        assert(n >= 0)
      } catch {
        // a require()/contract failure with a message is acceptable —
        // loud and typed; anything else is an unguarded empty-input bug
        case e: IllegalArgumentException if e.getMessage != null => ()
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries break on empty input:\n${failures.mkString("\n")}")
  }
}
