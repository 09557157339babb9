package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window => LogicalWindow}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: `row_number() OVER (PARTITION BY … ORDER BY …) <= k`
  * filters become the native [[TopKPerKey]] operator — the declarative
  * top-k-per-group idiom every SQL author writes gets the bounded-heap
  * physical plan (≤ k rows per key per partition through the exchange, no
  * per-group sort) without the query changing at all.
  *
  * Guarded and conservative:
  *  - off by default; enable with `spark.graft.topk.rewrite=true`
  *    (the rewrite picks the same rows only when the window order is a
  *    TOTAL order — the usual caveat; with ties at the k boundary both
  *    plans pick arbitrarily but possibly differently);
  *  - fires only on the exact shape Project(Filter(rn-bound, Window(single
  *    row_number alias))) where the projection references nothing the
  *    window added — so plans that SELECT the rank, carry extra window
  *    functions, or mix other predicates into the filter are left alone;
  *  - `rn <= k`, `rn < k`, `k >= rn`, `k > rn`, `rn = 1`, and the same
  *    bounds conjoined with `isnotnull(rn)` are recognized.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topk.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case p @ Project(projectList, Filter(cond,
          LogicalWindow(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            partitionSpec, orderSpec, child, _)))
          if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
        val rn = alias.toAttribute
        boundFor(cond, rn) match {
          case Some(k) if k >= 1 && k <= Int.MaxValue &&
              projectList.forall(_.references.subsetOf(child.outputSet)) =>
            Project(projectList,
              TopKPerKey(partitionSpec, orderSpec, k.toInt, child))
          case _ => p
        }
    }
  }

  /** The single bound k when `cond` constrains ONLY the rank attribute. */
  private def boundFor(cond: Expression, rn: Attribute): Option[Long] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) =>
      Some(v.toLong)
    case LessThan(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) =>
      Some(v.toLong - 1)
    case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) =>
      Some(v.toLong)
    case GreaterThan(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) =>
      Some(v.toLong - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) =>
      Some(1L)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) =>
      Some(1L)
    case And(IsNotNull(a: Attribute), rest) if a.semanticEquals(rn) =>
      boundFor(rest, rn)
    case And(rest, IsNotNull(a: Attribute)) if a.semanticEquals(rn) =>
      boundFor(rest, rn)
    case _ => None
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
      case _ => None
    }
  }
}
