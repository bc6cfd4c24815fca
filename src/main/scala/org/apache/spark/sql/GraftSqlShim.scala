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
  * This shim is the single place graft touches non-public Spark API —
  * two one-line calls to methods whose signatures have been stable across
  * Spark 2.x–4.x.
  */
object GraftSqlShim {
  /** Wrap an (already analyzed) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Force driver-side creation of the StateStoreCoordinator RPC endpoint.
    *
    * A STREAMING query creates it when `StreamExecution` starts; a BATCH
    * execution of a stateful operator (`transformWithState` runs in batch
    * mode since Spark 4.0) never goes through that path, so the
    * executor-side RocksDB store's snapshot-upload report dies with
    * `RpcEndpointNotFoundException: Cannot find endpoint:
    * spark://StateStoreCoordinator@…`. Touching the query manager's lazy
    * coordinator ref here is the EXACT initialization the streaming path
    * performs — idempotent (the ref is cached per session) and
    * metadata-only.
    */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    spark.streams.asInstanceOf[classic.StreamingQueryManager].stateStoreCoordinator
}
