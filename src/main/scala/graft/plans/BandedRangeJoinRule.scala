package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule (SURVEY.md §4, §2.10): rewrites a constant-width range
  * theta-join
  *
  *   a JOIN b ON p >= s AND p <= s + W        (W literal, > 0)
  *
  * into a banded equi-join: bucket both sides on floor(value/W) — the
  * probe side joins its single bucket, the build side is exploded into its
  * bucket and the next one (p ∈ [s, s+W] ⇒ floor(p/W) ∈ {floor(s/W),
  * floor(s/W)+1}) — and the original predicate survives as a residual.
  * Catalyst then plans a shuffled hash / sort-merge join on the bucket key
  * instead of a BroadcastNestedLoopJoin, turning O(|a|·|b|) pair
  * evaluations into O(|a|+|b|) shuffle — the difference between a job that
  * finishes and one that never does at 100 TB.
  *
  * Scope guards: inner joins, both compared expressions DoubleType, no
  * pre-existing equi conjunct (if one exists the join is already
  * hash-joinable — and this also makes the rule idempotent, since the
  * rewritten join carries a bucket equality).
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(cond), _) =>
      rewrite(j, cond).getOrElse(j)
  }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val hasEqui = conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(j.left.outputSet) &&
          r.references.subsetOf(j.right.outputSet)) ||
          (l.references.subsetOf(j.right.outputSet) &&
            r.references.subsetOf(j.left.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    // find p >= s and p <= s + W with matching p and s
    val bounds = for {
      ge <- conjuncts.collect { case GreaterThanOrEqual(p, s) => (p, s) }
      le <- conjuncts.collect { case LessThanOrEqual(p, Add(s, Literal(w, DoubleType), _)) => (p, s, w) }
      if ge._1.semanticEquals(le._1) && ge._2.semanticEquals(le._2)
      if le._3.asInstanceOf[Double] > 0.0
      if ge._1.dataType == DoubleType && ge._2.dataType == DoubleType
    } yield (ge._1, ge._2, le._3.asInstanceOf[Double])

    bounds.headOption.flatMap { case (p, s, w) =>
      val (probeSide, buildSide, flipped) =
        if (p.references.subsetOf(j.left.outputSet) &&
          s.references.subsetOf(j.right.outputSet)) (j.left, j.right, false)
        else if (p.references.subsetOf(j.right.outputSet) &&
          s.references.subsetOf(j.left.outputSet)) (j.right, j.left, true)
        else return None

      val width = Literal(w, DoubleType)
      // probe: single bucket floor(p/W)
      val pBucket = Alias(Floor(Divide(p, width)), "graft_band_p")()
      val probe = Project(probeSide.output :+ pBucket, probeSide)
      // build: explode into bucket and bucket+1
      val sBucket = Floor(Divide(s, width))
      val bandAttr = AttributeReference("graft_band_s", LongType)()
      val build = Generate(
        Explode(CreateArray(Seq(sBucket, Add(sBucket, Literal(1L))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bandAttr), child = buildSide)

      val bandEq = EqualTo(pBucket.toAttribute, bandAttr)
      val (newLeft, newRight) =
        if (flipped) (build, probe) else (probe, build)
      val newJoin =
        Join(newLeft, newRight, Inner, Some(And(bandEq, cond)), j.hint)
      // restore the original output (drop the band columns)
      Some(Project(j.output, newJoin))
    }
  }
}
