package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement for SCALING.md: the round-7 scoring tier (q141 LM
  * perplexity, q143 quality gate, q150 drift PSI) on the sf corpus vs a
  * 10× replication with distinct doc_ids — the failure mode to rule out
  * is super-linear degradation (a vocab-keyed structure quietly growing
  * with the corpus, a window partition collapsing, a broadcast scaling
  * with input). Usage: runMain graft.TextStress [sfDir] [reps]
  */
object TextStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir10 = Scratch.path("stress10x_" + Scratch.tag(sfDir))
    val docs = Tables.documents(spark, sfDir)
    // offset by the corpus's own id span — a hard-coded constant silently
    // collides ids (skewing dedup-sensitive numbers) once any corpus has
    // doc_id past it (ADVICE r7)
    val span = docs.agg(max($"doc_id")).head.getLong(0) + 1L
    (0 until 10)
      .map(i => docs.withColumn("doc_id", $"doc_id" + i * span))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir10/documents.parquet")

    val queries = Seq(
      "q141" -> text.TextQueries.q141DocPerplexity _,
      "q143" -> text.TextQueries.q143QualityRules _,
      "q150" -> text.PipelineQueries.q150DriftPsi _)
    for ((name, fn) <- queries; (label, d) <- Seq("1x" -> sfDir, "10x" -> dir10)) {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        println(f"[textstress] $name $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
