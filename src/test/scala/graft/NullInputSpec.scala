package graft

import org.apache.spark.sql.functions._

/** NULL-injection robustness sweep — the sibling of [[EmptyInputSpec]]:
  * every registered query runs against a fixture where ~10% of the rows
  * in every non-key column carry NULL (deterministic md5-keyed choice),
  * plus NULL text and NULL embeddings. Real feeds are dirty; the
  * contract is crash-freedom: evaluate (>= 0 rows) or fail a documented
  * require() — never an NPE, a MatchError, or an unguarded head() on an
  * empty frame. (Value-level NULL SEMANTICS are pinned per-operator by
  * the DuckDB gates over the events table's genuine NULLs; this sweep
  * is about not falling over.)
  */
class NullInputSpec extends SparkSpec {

  private def poison(t: String, keep: Seq[String]): Unit = {
    val df = spark.read.parquet(s"$sf/$t.parquet")
    val out = df.columns.foldLeft(df) { (d, c) =>
      if (keep.contains(c)) d
      else d.withColumn(c,
        when(conv(substring(md5(concat_ws("|", lit(c),
          monotonically_increasing_id().cast("string"))), 1, 4), 16, 10)
          .cast("long") % 10 === 0, lit(null)).otherwise(col(c)))
    }
    out.write.mode("overwrite").parquet(s"$dirtyDir/$t.parquet")
  }

  private lazy val dirtyDir: String =
    java.nio.file.Files.createTempDirectory("graft_dirty").toString

  private lazy val ready: Boolean = {
    // keys stay intact (NULL join keys are a semantic choice each
    // operator documents; a NULL PRIMARY key is just a broken feed) —
    // every other column takes ~10% NULLs, including text and vectors
    poison("region", Seq("r_regionkey"))
    poison("nation", Seq("n_nationkey", "n_regionkey"))
    poison("customer", Seq("c_custkey"))
    poison("supplier", Seq("s_suppkey"))
    poison("part", Seq("p_partkey"))
    poison("orders", Seq("o_orderkey"))
    poison("lineitem", Seq("l_orderkey", "l_linenumber"))
    poison("events", Seq("event_id"))
    poison("documents", Seq("doc_id"))
    poison("embeddings", Seq("vec_id"))
    true
  }

  test("every query survives 10% NULLs in every non-key column") {
    assume(ready)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, dirtyDir).count()
        assert(n >= 0)
      } catch {
        case e: IllegalArgumentException if e.getMessage != null => ()
        case e: IllegalStateException if e.getMessage != null => ()
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries break on dirty input:\n${failures.mkString("\n")}")
  }
}
