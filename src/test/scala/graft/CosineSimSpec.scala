package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._

/** The native cosine_sim expression must be bit-equal to the built-in
  * zip_with+aggregate fold (same sequential summation order) and usable
  * from SQL via the GraftExtensions registration.
  */
class CosineSimSpec extends SparkSpec {

  test("cosine_sim equals the higher-order-function fold bit-for-bit") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorFns.toDoubles(col("embedding")).as("v"))
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("v").as("pv"))
    val both = emb.crossJoin(broadcast(probe))
      .select(
        expr("cosine_sim(pv, v)").as("native"),
        VectorFns.cosine(col("pv"), col("v")).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
  }

  test("cosine_sim is registered for plain SQL") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_sql")
    val n = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) c
        |FROM emb_sql a JOIN emb_sql b ON b.vec_id = 0
        |WHERE a.vec_id < 5""".stripMargin).count()
    assert(n === 5)
  }

  test("dot_product handles sign cases and accepts float arrays") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, -4.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b")
    val r = df.select(expr("dot_product(a, b)").as("d"))
      .as[Double].collect()
    assert(r.toSeq === Seq(-5.0, 0.0))
  }
}
