package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev instrument (round 19): PQ geometry sweep at the 20k organic
  * replica — for (subspaces m, codes k) configurations, train Lloyd
  * codebooks per subspace and measure EXHAUSTIVE ADC recall@5 vs the
  * exact dot top-5, plus the rerank-recovered recall (exact top-5 of the
  * ADC top-20). Round-19 finding driving this: 256 codes on 16-dim
  * near-uniform subspaces measured 0.02 (the codebook-size hypothesis
  * failed); the variable that matters on low-structure corpora is
  * BITS/DIM, i.e. the subspace width. Dev-only; not driver contract.
  */
object PqGeomStress {
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
    import graft.expressions.NativeKernels.dotF
    val dir = ScaleUp.buildNovelEmbeddings(spark, src)
    val n = Tables.rowCount(spark, dir, "embeddings")
    val rawU = Tables.embeddings(spark, dir)
    // NORMALIZED corpus: x/|x| — FAISS's cosine-via-L2 recipe. Round-19
    // finding this sweep established: ADC is an L2 ranker, and on
    // UNNORMALIZED near-random vectors the L2 top-5 and the cosine/dot
    // top-5 barely overlap (the m=64 scalar-quantizer control scored
    // 0.000 vs dot — an objective mismatch, not a codec failure).
    val rawN = rawU.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x / sqrt(aggregate(embedding, 0.0D, (a, y) -> a + CAST(y AS DOUBLE) * y)) AS FLOAT))")
        .as("embedding"))
    def exactOf(raw: DataFrame, metric: String): Map[Long, Set[Long]] = {
      val e = raw.select(col("vec_id"), col("embedding"))
      val p = e.filter(probePredicate(col("vec_id")))
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      val scored = e.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      val sc = metric match {
        case "dot" => dotF(col("embedding"), col("p_emb"))
        case _ => // l2: -(x2 + p2 - 2xp), ranked desc == nearest first
          -(dotF(col("embedding"), col("embedding")) + dotF(col("p_emb"), col("p_emb"))
            - lit(2.0) * dotF(col("embedding"), col("p_emb")))
      }
      val w5 = Window.partitionBy(col("probe_id")).orderBy(col("score").desc, col("vec_id"))
      scored.select(col("probe_id"), col("vec_id"), sc.as("score"))
        .withColumn("rn", row_number().over(w5)).filter(col("rn") <= 5)
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    def sub(df: DataFrame, m: Int, dim: Int): DataFrame =
      df.select(col("vec_id"), slice(col("embedding"), m * dim + 1, dim).as("embedding"))
        .select(col("vec_id"), col("embedding"),
          dotF(col("embedding"), col("embedding")).as("n2"))
    def run(tag: String, raw: DataFrame, exact: Map[Long, Set[Long]],
        nSub: Int, codes: Int, iters: Int): Unit = {
      val dim = 64 / nSub
      val spaces = (0 until nSub).map { m =>
        val se = sub(raw, m, dim)
        (m, se, lloyd(trainSlice(se, n, codes), iters, codes))
      }
      val vecCodes = spaces.map { case (m, se, cb) =>
        assignCells(se, cb).select(col("vec_id"), lit(m).as("m"), col("cell").as("code"))
      }.reduce(_ unionByName _)
      val lut = spaces.map { case (m, se, cb) =>
        se.filter(probePredicate(col("vec_id")))
          .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"), col("n2").as("p_n2"))
          .crossJoin(broadcast(cb))
          .select(col("probe_id"), lit(m).as("m"), col("cell").as("code"),
            ((col("p_n2") + col("c_n2")) - lit(2.0) * dotF(col("p_emb"), col("c_emb"))).as("pd2"))
      }.reduce(_ unionByName _)
      val wAdc = Window.partitionBy(col("probe_id")).orderBy(col("adc"), col("vec_id"))
      val top20 = vecCodes.join(broadcast(lut), Seq("m", "code"))
        .filter(col("vec_id") =!= col("probe_id"))
        .groupBy(col("probe_id"), col("vec_id"))
        .agg(sum(col("pd2")).as("adc"))
        .withColumn("rn", row_number().over(wAdc)).filter(col("rn") <= 20)
        .select(col("probe_id"), col("vec_id"), col("rn"))
        .localCheckpoint()
      val adc5 = top20.filter(col("rn") <= 5)
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val r5 = adc5.keysIterator.map(k => (adc5(k) & exact(k)).size / 5.0).sum / adc5.size
      // rerank recovery: fraction of exact top-5 present in the ADC top-20
      val c20 = top20.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val r20 = c20.keysIterator.map(k => (c20(k) & exact(k)).size / 5.0).sum / c20.size
      println(f"""{"tag":"$tag","m":$nSub,"codes":$codes,"iters":$iters,"adc_recall5":$r5%.3f,"top20_contains_exact5":$r20%.3f}""")
    }
    // objective-matched control: ADC (an L2 ranker) vs the exact L2 top-5
    // on the unnormalized corpus — validates the instrument and the codec
    val exactL2 = exactOf(rawU, "l2")
    run("unnorm_vs_l2", rawU, exactL2, 4, 256, 1)
    run("unnorm_vs_l2", rawU, exactL2, 64, 256, 1)
    // the production question: NORMALIZED coding (cosine == L2 there) vs
    // the exact cosine top-5 — the geometry curve that picks q229's tier
    val exactCos = exactOf(rawN, "dot") // normalized dot == cosine
    run("norm_vs_cos", rawN, exactCos, 4, 256, 1)
    run("norm_vs_cos", rawN, exactCos, 8, 256, 1)
    run("norm_vs_cos", rawN, exactCos, 16, 256, 1)
    run("norm_vs_cos", rawN, exactCos, 64, 256, 1)
    spark.stop()
  }
}
