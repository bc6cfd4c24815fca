package graft

import org.apache.spark.sql.SparkSession

/** Dev instrument (round 18, VERDICT r17 next #1/#2): recall and cost of
  * the bounded-sample Lloyd training (`VectorQueries.trainSlice`) against
  * full-corpus training, measured at the organic (novel-embeddings) 10×
  * replica where the sample modulus actually binds (n = 20,000 → coarse
  * m = 2, k = 64). Prints one JSON line per variant:
  * {"variant":…,"recall5":…,"sec":…} — the figures SCALING.md's
  * sampling section cites. Dev-only; not part of the driver contract.
  */
object TrainSampleStress {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", Scratch.path("warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import vector.VectorQueries._
    val dir = ScaleUp.buildNovelEmbeddings(spark, src)
    val n = Tables.rowCount(spark, dir, "embeddings")
    val k = scaledIvfCells(n)
    val np = scaledNprobe(k)
    val m = trainSampleMod(n, k)
    println(s"""{"n":$n,"k":$k,"np":$np,"coarse_m":$m}""")
    val exact = q18KnnTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def run(variant: String, sampled: Boolean): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // train + assign + search end-to-end, forced by the noop write —
        // the q54 shape with training INSIDE the measured window
        val base = withN2(Tables.embeddings(spark, dir))
        val cents = lloyd(
          if (sampled) trainSlice(base, n, k) else base, IvfIters, k)
        ivfSearch(spark, dir, np, centroidsOverride = Some(cents))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val base = withN2(Tables.embeddings(spark, dir))
      val cents = lloyd(
        if (sampled) trainSlice(base, n, k) else base, IvfIters, k)
      val got = ivfSearch(spark, dir, np, centroidsOverride = Some(cents))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = (exact & got).size.toDouble / exact.size
      println(f"""{"variant":"$variant","recall5":$recall%.3f,"sec":${times.min}%.2f}""")
    }
    run("full", sampled = false)
    run("sampled", sampled = true)
    spark.stop()
  }
}
