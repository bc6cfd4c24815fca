package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass pipeline observability — `Dataset.observe` (Catalyst's
  * CollectMetrics node): aggregate counters accumulate ON the rows an
  * action already processes and surface on the driver when it completes,
  * so a 100 TB write ships its own data-quality metrics without a second
  * scan. That is the difference between "count the nulls" costing one
  * more full pass over the lake and costing nothing: the metric
  * expressions ride the existing tasks map-side (no extra exchange, no
  * extra scan — PipelineSpec pins both), and only the final few numbers
  * cross to the driver. In streaming the same node reports per
  * micro-batch via `StreamingQueryProgress.observedMetrics`.
  *
  * Policy: metrics must be ALGEBRAIC aggregates (count/sum/min/max) so the
  * per-partition state is constant-size and mergeable — the same rule the
  * engine applies to every sketch (SURVEY §2.12).
  */
object PipelineObservability {

  /** Attach corpus-quality counters to a documents-shaped frame. Returns
    * the instrumented frame — row-identical to the input — and the
    * [[Observation]] handle whose `get` blocks until an action has run.
    */
  def observedCorpus(docs: DataFrame): (DataFrame, Observation) = {
    val obs = Observation()
    val out = docs.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("n_empty_text"),
      sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang"),
      min(col("doc_id")).as("min_doc_id"),
      max(col("doc_id")).as("max_doc_id"))
    (out, obs)
  }

  /** Write-side contract check: the instrumented write every CDC/corpus
    * sink should run — fail the JOB (not the reader, 90 TB later) when
    * the observed violation count crosses zero. Returns the metrics map
    * on success.
    */
  def writeWithQualityGate(docs: DataFrame, path: String): Map[String, Any] = {
    val (out, obs) = observedCorpus(docs)
    out.write.mode("overwrite").parquet(path)
    val m = obs.get
    require(m("n_empty_text").asInstanceOf[Long] == 0L &&
      m("n_null_lang").asInstanceOf[Long] == 0L,
      s"quality gate failed on write: $m")
    m
  }
}
