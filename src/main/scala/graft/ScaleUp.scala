package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up: replicate an sf-directory N× with disjoint key
  * spaces, for whole-suite scale rehearsals (the sf1 bench) beyond the
  * largest driver-generated fixture. Every entity key (custkey,
  * orderkey, partkey, suppkey, user/event ids, doc/vec ids) shifts by
  * `replica · OFFSET` CONSISTENTLY across tables, so referential
  * integrity — and therefore every join's selectivity profile — is
  * preserved exactly; each replica is a parallel universe of the
  * original keyspace. Dimension tables (region, nation) are shared
  * across replicas, like real star schemas at scale. Text, timestamps,
  * and embeddings are copied verbatim: the corpus becomes duplicate-
  * heavy (10 copies of every document), which is what a crawl-scale
  * corpus looks like and what the dedup tier exists to handle — pair
  * candidates grow as C(reps,2) per original doc, linear in the corpus.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <dstDir> [reps=10]
  */
object ScaleUp {

  /** Larger than any key the driver generator emits at sf≤10. */
  private val Offset = 1000000000L

  private def replicate(spark: SparkSession, src: String, dst: String,
                        table: String, reps: Int,
                        keyCols: Seq[String]): Unit = {
    val df = spark.read.parquet(s"$src/$table.parquet")
    val out: DataFrame =
      if (keyCols.isEmpty) df // shared dimension: one copy
      else {
        val shift = col("_r") * lit(Offset)
        df.withColumn("_r",
            explode(lit((0 until reps).map(_.toLong).toArray)))
          .select(df.columns.map { c =>
            // NULL keys stay NULL (null + x = null) — dirty feeds survive
            if (keyCols.contains(c)) (col(c) + shift).as(c) else col(c)
          }: _*)
          // one file per replica, key-clustered: without this the 10x
          // duplicate-heavy text compresses into ONE tiny parquet file =
          // one input split, and every compute-heavy scan runs single-
          // task (x_chunk read 18.7x instead of ~10x at the rehearsal).
          // Range-partitioning on the shifted primary key keeps each
          // file a contiguous key range — the bulk-load layout — so
          // min/max pruning still works for range scans.
          .repartitionByRange(reps, col(keyCols.head))
      }
    out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
    println(s"[scaleup] $table: ${df.count()} -> ${out.count()} rows")
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.build()
    new java.io.File(dst).mkdirs()
    replicate(spark, src, dst, "region", reps, Nil)
    replicate(spark, src, dst, "nation", reps, Nil)
    replicate(spark, src, dst, "customer", reps, Seq("c_custkey"))
    replicate(spark, src, dst, "supplier", reps, Seq("s_suppkey"))
    replicate(spark, src, dst, "part", reps, Seq("p_partkey"))
    replicate(spark, src, dst, "orders", reps,
      Seq("o_orderkey", "o_custkey"))
    replicate(spark, src, dst, "lineitem", reps,
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate(spark, src, dst, "events", reps,
      Seq("event_id", "user_id"))
    replicate(spark, src, dst, "documents", reps, Seq("doc_id"))
    replicate(spark, src, dst, "embeddings", reps, Seq("vec_id"))
    spark.stop()
  }
}
