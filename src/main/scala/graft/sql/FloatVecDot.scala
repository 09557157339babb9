package graft.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ aᵢ·bᵢ over two `array<float>` columns, accumulated in double precision
  * in index order — a native codegen expression for the similarity-search
  * hot path. The generic higher-order-function form
  * (`aggregate(zip_with(a,b,_*_),0d,_+_)`) evaluates its lambda through
  * interpreted projections on every element of every pair, which measures
  * ~30x slower on brute-force all-pairs scoring; this expression compiles to
  * a tight primitive loop inside whole-stage codegen while producing
  * bit-identical results (same IEEE operation order).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_fvdot requires two array<float> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |float[] $x = $l.toFloatArray();
         |float[] $y = $r.toFloatArray();
         |int $n = Math.min($x.length, $y.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x[$i] * (double) $y[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the engine's native expressions and planner
  * strategies. Enable with
  * `.config("spark.sql.extensions", "graft.sql.GraftExtensions")` (all
  * of this project's entry points do). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_fvdot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_fvdot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_regdomain"),
      new ExpressionInfo(classOf[GraftRegDomain].getName, "graft_regdomain"),
      (children: Seq[Expression]) => GraftRegDomain(children.head)))
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftshim.GraftTopKStrategy)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graftshim.WindowTopKRewrite)
  }
}
