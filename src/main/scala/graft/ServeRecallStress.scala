package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev instrument (round 19): recall@5 of every SERVE-path tier at the
  * 20k organic (novel-embeddings) replica — the density where round 18's
  * instrument found the 3-bit PQ tier at ≈ chance and the open-loop
  * nprobe rule at 0.44. Measures, against the exact cosine top-5:
  *
  *   - pq8_flat      — exhaustive PQ8 ADC (the codec's own resolving
  *                     power, no coarse restriction)
  *   - q235 ivfpq8   — the registered IVF-PQ8 artifact serve
  *   - q229 rerank   — PQ8 recall stage + exact rerank (VERDICT r18 #1)
  *   - q54 open-loop — IVF-flat at nprobe = ⌊√k⌋ (the 0.44 baseline)
  *   - q236 tuned    — IVF-flat at the recall-TARGETED nprobe, plus the
  *                     tuned_np value and serve-vs-q54 cost ratio
  *                     (VERDICT r18 next #2's "cost ratio recorded")
  *   - q213 beam     — graph-ANN beam serve (VERDICT r18 next #5: the
  *                     n≤2000 floors were never organic-replica-tested)
  *   - q232 refined  — NN-Descent-refined beam serve
  *
  * Prints one JSON line per tier: {"tier":…,"recall5":…,("sec":…)}.
  * These are the figures SCALING.md's round-19 section cites and the
  * VectorLawsSpec floors are pinned from. Dev-only; not driver contract.
  */
object ServeRecallStress {
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
    println(s"""{"n":$n,"k":$k,"open_loop_np":${scaledNprobe(k)}}""")
    val exact = q18KnnTopk(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row], idCol: Int = 2): Double = {
      val got = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(idCol)).toSet).toMap
      got.keysIterator.map(p => (got(p) & exact(p)).size / 5.0).sum / got.size
    }
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // exhaustive PQ8 ADC (no IVF): codes + LUT from the persisted PQ8
    // codebooks, all cells — isolates codec resolution from coarse recall
    locally {
      val root = ensureAnnIndex(spark, dir)
      val rows = adcTopK8FromArtifacts(spark, dir, root, 5) // the q235 serve
      val (collected, sec) = timed(rows.collect())
      println(f"""{"tier":"q235_ivfpq8","recall5":${recallOf(collected)}%.3f,"sec":$sec%.1f}""")
      val (rr, sec2) = timed(q229RerankedAnn(spark, dir).collect())
      println(f"""{"tier":"q229_pq8_rerank","recall5":${recallOf(rr)}%.3f,"sec":$sec2%.1f}""")
      // the old 3-bit stage-1 for contrast (the round-18 envelope)
      val r3 = adcTopKFromArtifacts(spark, dir, root, 5).collect()
      println(f"""{"tier":"ivfpq3bit","recall5":${recallOf(r3)}%.3f}""")
    }
    locally { // open-loop vs tuned IVF-flat
      val (q54, sec54) = timed(q54IvfSearch(spark, dir).collect())
      println(f"""{"tier":"q54_open_loop","recall5":${recallOf(q54)}%.3f,"sec":$sec54%.1f}""")
      val (q236, sec236) = timed(q236TunedIvfSearch(spark, dir).collect())
      val np = q236.head.getLong(4)
      println(f"""{"tier":"q236_tuned","recall5":${recallOf(q236)}%.3f,"tuned_np":$np,"sec":$sec236%.1f,"cost_ratio_vs_q54":${sec236 / sec54}%.2f}""")
    }
    locally { // graph-ANN tiers at organic 20k (VERDICT r18 next #5)
      val (beam, secB) = timed(q213GraphAnnBeam(spark, dir).collect())
      println(f"""{"tier":"q213_beam","recall5":${recallOf(beam)}%.3f,"sec":$secB%.1f}""")
      val (ref, secR) = timed(q232GraphAnnRefined(spark, dir).collect())
      println(f"""{"tier":"q232_refined","recall5":${recallOf(ref)}%.3f,"sec":$secR%.1f}""")
    }
    spark.stop()
  }
}
