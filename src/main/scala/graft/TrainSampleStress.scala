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
    // PQ tier at the replica: the codebook trainers sample 1-in-16 here
    // (k = 8 codes, n = 20,000) — measure that the 4-byte codec built
    // from sampled codebooks still recalls against the exact dot top-5
    // (the q138 production path verbatim)
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      import graft.expressions.NativeKernels.dotF
      val adc = q138PqAdcSearch(spark, dir).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
      val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      val p = e.filter(probePredicate(col("vec_id")))
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      val w = Window.partitionBy(col("probe_id")).orderBy(col("score").desc, col("vec_id"))
      val ex = e.join(broadcast(p), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"), dotF(col("embedding"), col("p_emb")).as("score"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val recall = adc.keysIterator.map(k => (adc(k) & ex(k)).size / 5.0).sum / adc.size
      println(f"""{"variant":"pq_adc_sampled_m16","recall5":$recall%.3f}""")
      // control: PQ codebooks trained on the FULL replica corpus (the
      // pre-round-18 recipe) — separates the sampling effect from the
      // corpus effect (blocks 1-9 are uniform noise, so the codebooks
      // are mostly noise-trained either way)
      val raw = Tables.embeddings(spark, dir)
      val codedFull = (0 until PqSubspaces).map { mm =>
        val se = subspaceOf(raw, mm)
        assignCells(se, lloyd(se, PqIters, PqCodes))
          .select(col("vec_id"), lit(mm).as("m"), col("cell").as("code"))
      }.reduce(_ unionByName _)
      val lut = (0 until PqSubspaces).map { mm =>
        val se = subspaceOf(raw, mm)
        val cb = lloyd(se, PqIters, PqCodes)
        se.filter(probePredicate(col("vec_id")))
          .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"), col("n2").as("p_n2"))
          .crossJoin(broadcast(cb))
          .select(col("probe_id"), lit(mm).as("m"), col("cell").as("code"),
            ((col("p_n2") + col("c_n2")) - lit(2.0) * dotF(col("p_emb"), col("c_emb"))).as("pd2"))
      }.reduce(_ unionByName _)
      val wAdc = Window.partitionBy(col("probe_id")).orderBy(col("adc"), col("vec_id"))
      val adcFull = codedFull.join(broadcast(lut), Seq("m", "code"))
        .filter(col("vec_id") =!= col("probe_id"))
        .groupBy(col("probe_id"), col("vec_id"))
        .agg(sum(col("pd2")).as("adc"))
        .withColumn("rn", row_number().over(wAdc)).filter(col("rn") <= 5)
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val recallFull = adcFull.keysIterator.map(k => (adcFull(k) & ex(k)).size / 5.0).sum / adcFull.size
      println(f"""{"variant":"pq_adc_full","recall5":$recallFull%.3f}""")
      // the PRODUCTION pq serving path: IVF-PQ recall stage + exact
      // rerank (q229, sample-trained artifacts) vs exact cosine top-5
      val exactCos = q18KnnTopk(spark, dir).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
      val rr = q229RerankedAnn(spark, dir).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
      val recallRr = rr.keysIterator.map(k => (rr(k) & exactCos(k)).size / 5.0).sum / rr.size
      println(f"""{"variant":"ivfpq_rerank_sampled","recall5":$recallRr%.3f}""")
    }
    spark.stop()
  }
}
