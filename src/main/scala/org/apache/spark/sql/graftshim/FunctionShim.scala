package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge for registering a raw Catalyst Expression builder as a SQL
  * function on a LIVE session (`sessionState.functionRegistry` is
  * `private[sql]`). Cluster deployments should prefer the public path —
  * `spark.sql.extensions=graft.GraftExtensions` — which injects the same
  * builders at session construction; this shim exists for sessions the
  * caller didn't construct (notebooks, tests).
  */
object FunctionShim {

  def register(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark match {
      case c: org.apache.spark.sql.classic.SparkSession => c
      case other => throw new UnsupportedOperationException(
        s"graft requires classic (non-Connect) Spark 4.x, got " +
          other.getClass.getName)
    }
    classic.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  }
}
