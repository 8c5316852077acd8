package graft

import org.apache.spark.sql.graft.{CosineSim, DotProduct, GramMd5, GramOcc, GramStats, MinHashSig, SimHash60, WinnowSels}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point (SURVEY.md §2.10): registers the
  * engine's native Catalyst expressions as SQL functions so both the
  * DataFrame API (expr("cosine_sim(a, b)")) and plain spark.sql can use
  * them. Wire up via `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * — Sessions.build does.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSig(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("gram_md5"),
      new ExpressionInfo(classOf[GramMd5].getName, "gram_md5"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GramMd5(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("gram_occ"),
      new ExpressionInfo(classOf[GramOcc].getName, "gram_occ"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GramOcc(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash60(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("gram_stats"),
      new ExpressionInfo(classOf[GramStats].getName, "gram_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GramStats(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_sels"),
      new ExpressionInfo(classOf[WinnowSels].getName, "winnow_sels"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowSels(children(0), children(1), children(2))))
    // Plan-level optimization: constant-width range theta-joins become
    // banded equi-joins (no BroadcastNestedLoopJoin at scale).
    ext.injectOptimizerRule(_ => graft.plans.BandedRangeJoinRule)
  }
}
