package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` plan-construction API.
  *
  * Spark's supported extension points (`SparkSessionExtensions`) let a
  * library inject analyzer/optimizer rules, planner strategies and
  * functions — but deliberately provide no public constructor for "a
  * DataFrame whose root is my custom LogicalPlan". Every library that
  * ships a custom logical operator (Two Sigma's Flint as-of joins,
  * spark-solr, GraphFrames) uses this same package-placed shim to reach
  * `Dataset.ofRows`, which is `private[sql]` only to keep it out of the
  * binary-compatibility surface.
  *
  * This is the single place graft touches a non-public Spark API, and it
  * is one line calling a method whose signature has been stable across
  * Spark 2.x–4.x.
  */
object GraftSqlShim {
  /** Wrap an (already analyzed) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
