package graft.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable domain (eTLD+1) of an already-lowercased hostname under
  * the full public-suffix-list algorithm ([[graft.text.Psl]]: arbitrary
  * rule depth, wildcards, exceptions). A native codegen expression
  * rather than a UDF or a rules join: the rule set is a static per-JVM
  * hash-set load from a jar resource, so the lookup is O(host labels)
  * inside whole-stage codegen with no broadcast, no shuffle, and no
  * per-row closure dispatch — the per-domain keying projection stays as
  * narrow as the two-label subset it replaces.
  */
case class GraftRegDomain(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_regdomain requires a string argument, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(host: Any): Any =
    graft.text.Psl.regDomainUtf8(host.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Psl.regDomainUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftRegDomain =
    copy(child = newChild)
}
