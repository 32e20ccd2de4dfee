package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` plan constructors the engine's custom
  * operators need (e.g. [[graft.plans.AsOfJoinPlan]]): building a DataFrame
  * from a hand-constructed LogicalPlan, and registering an extra planner
  * strategy on a live session. Uses only Apache Spark's own classes — the
  * file lives in the `org.apache.spark.sql` package solely for `private
  * [sql]` access, the standard technique for Spark-native extensions that
  * construct logical plans directly rather than going through the SQL
  * parser.
  */
object GraftPlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Append `s` to the session's extra planner strategies (idempotent). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
