package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement for SCALING.md: the training-free similarity tier on
  * the sf embeddings vs a 10× replication with distinct vec_ids — the
  * two scale regimes to separate are
  *   - probe-bounded search (q18 kNN, q134 multi-table LSH): the probe
  *     set is id-bounded and replicas get fresh ids, so cost must grow
  *     ~linearly with the corpus;
  *   - all-pairs-within-bucket search (q19): 10 exact copies of every
  *     vector share every bucket, so candidate PAIRS grow as
  *     duplication² — inherent (those pairs exist); the thing to rule
  *     out is super-linear degradation beyond the output's own growth
  *     (a bucket map collapsing, a broadcast scaling with the corpus).
  * Usage: runMain graft.VecStress [sfDir] [reps]
  */
object VecStress {
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

    val dir10 = Scratch.path("vecstress10x_" + Scratch.tag(sfDir))
    val vecs = Tables.embeddings(spark, sfDir)
    // offset by the corpus's own id span so replica ids never collide
    // (and never land in the bounded probe predicate) — TextStress/ADVICE r7
    val span = vecs.agg(max($"vec_id")).head.getLong(0) + 1L
    (0 until 10)
      .map(i => vecs.withColumn("vec_id", $"vec_id" + i * span))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir10/embeddings.parquet")

    val queries = Seq(
      "q18" -> vector.VectorQueries.q18KnnTopk _,
      "q134" -> vector.VectorQueries.q134MultiLsh _,
      "q19" -> vector.VectorQueries.q19AnnLsh _)
    for ((name, fn) <- queries; (label, d) <- Seq("1x" -> sfDir, "10x" -> dir10)) {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        println(f"[vecstress] $name $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
