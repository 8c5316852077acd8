package graft

import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.functions._

/** Semantic checks on the LLM-pipeline tier that the hash gate cannot
  * express: LSH candidate generation must agree with the brute-force
  * definition, dedup must be idempotent, ANN results must be true
  * neighbors.
  */
class LlmOpsSpec extends SparkSpec {

  test("x_dedup_near equals brute-force all-pairs Jaccard >= 0.8") {
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), TextFns.shingles3(col("w")).as("shingles"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(size(array_intersect(col("a.shingles"), col("b.shingles")))
          .cast("double")
          / size(array_union(col("a.shingles"), col("b.shingles"))), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    val lsh = ops.LlmQueries.dedupNear(spark, sf)
    // LSH recall on this corpus must be total (16 perms / 8 bands / j>=0.8
    // => miss probability < 1e-3 per pair), and precision is exact by
    // construction (candidates are Jaccard-verified).
    assert(lsh.except(brute).isEmpty, "LSH produced a non-duplicate pair")
    assert(brute.except(lsh).isEmpty, "LSH missed a duplicate pair")
  }

  test("exact dedup is idempotent") {
    val once = ops.LlmQueries.dedupExact(spark, sf)
    assert(once.count() ===
      once.select(col("fp")).distinct().count())
  }

  test("ANN results are genuine same-bucket neighbors with true cosine") {
    val planes = VectorFns.planes(4, 64)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorFns.toDoubles(col("embedding")).as("v"))
      .withColumn("bucket", VectorFns.bucket(col("v"), planes))
    val ann = ops.LlmQueries.simLsh(spark, sf)
    val checked = ann.alias("r")
      .join(emb.select(col("vec_id").as("probe_id"), col("bucket").as("pb")), "probe_id")
      .join(emb.select(col("vec_id"), col("bucket").as("cb")), "vec_id")
    assert(checked.filter(col("pb") =!= col("cb")).count() === 0,
      "ANN returned a cross-bucket pair")
    assert(ann.groupBy(col("probe_id")).count()
      .filter(col("count") > 3).count() === 0, "more than k per probe")
  }

  test("brute-force top-k: scores are within [-1, 1] and ranked") {
    val res = ops.LlmQueries.simBrute(spark, sf)
    assert(res.filter(abs(col("cos_sim")) > 1.000001).count() === 0)
    // rank order must follow score order within each probe
    val bad = res.alias("a").join(res.alias("b"),
      col("a.probe_id") === col("b.probe_id") &&
        (col("a.rank") < col("b.rank")) &&
        (col("a.cos_sim") < col("b.cos_sim")))
    assert(bad.count() === 0, "rank inversion found")
  }

  test("topk(3) per group is a subset of topk(5) per group") {
    def topk(n: Int) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(spark, sf)
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
        .select(col("o_orderpriority"), col("o_orderkey"))
    }
    assert(topk(3).except(topk(5)).isEmpty)
  }
}
