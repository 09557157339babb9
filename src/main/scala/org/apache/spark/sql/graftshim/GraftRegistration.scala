package org.apache.spark.sql.graftshim

import graft.sql.FloatVecDot

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Imperative registration of the engine's native expressions on an already
  * built session. `SparkSessionExtensions` (graft.sql.GraftExtensions) is the
  * front door, but a host application may hand us a session built without
  * the config; the function registry is `private[sql]`, so this shim lives
  * in Spark's namespace to reach it — the standard pattern for library
  * extensions that must not depend on session construction.
  */
object GraftRegistration {

  def ensure(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val name = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fvdot")
    if (!registry.functionExists(name)) {
      registry.createOrReplaceTempFunction(
        "graft_fvdot",
        (children: Seq[Expression]) => FloatVecDot(children.head, children(1)),
        "built-in")
    }
    // Planner strategy for the native top-K-per-key operator. experimental
    // methods are the public runtime-injection point for strategies on an
    // already built session (the extensions class covers construction time).
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(GraftTopKStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ GraftTopKStrategy
    }
    // window-to-TopK rewrite (no-op unless spark.graft.topk.rewrite=true)
    if (!exp.extraOptimizations.contains(WindowTopKRewrite)) {
      exp.extraOptimizations = exp.extraOptimizations :+ WindowTopKRewrite
    }
  }
}
