package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement for SCALING.md (VERDICT r14 #3): the graph-ANN tier
  * at the degrees production HNSW actually runs (M = 16–48) instead of
  * only the registered q213 default (D = 6). Per D ∈ {6, 16, 32}:
  * capped edge count, max out-degree before/after the 2·D M_max prune
  * (does the cap BIND at this degree?), build and serve wall time, and
  * recall@5 of the beam serve against the exact q18 top-5 — the
  * recall/cost curve a deployment reads before picking D. A second
  * sweep (round 16) measures the NN-Descent widening (q232's
  * machinery) at D ∈ {16, 32} × rounds ∈ {1, 2}: recall bought per
  * round and its build cost.
  * Usage: runMain graft.GraphStress [sfDir]
  */
object GraphStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val exact = vector.VectorQueries.q18KnnTopk(spark, sfDir)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap

    for (d <- Seq(6, 16, 32)) {
      val t0 = System.nanoTime()
      val edges = vector.VectorQueries.builtGraphEdgesD(spark, sfDir, d)
        .localCheckpoint()
      val nEdges = edges.count()
      val tBuild = (System.nanoTime() - t0) / 1e9
      val maxDeg = edges.groupBy($"src").count().agg(max($"count")).head.getLong(0)
      val t1 = System.nanoTime()
      val served = vector.VectorQueries.beamServe(spark, sfDir, edges,
          vector.VectorQueries.BeamRounds)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      val tServe = (System.nanoTime() - t1) / 1e9
      val recall = served.keysIterator
        .map(k => (served(k) & exact(k)).size / 5.0).sum / served.size
      println(f"D=$d%2d edges=$nEdges%7d maxOutDeg=$maxDeg%3d (cap ${2 * d}%3d) " +
        f"build=$tBuild%6.2fs serve=$tServe%6.2fs recall@5=$recall%.3f")
    }

    // the NN-Descent widening (q232's machinery) at the degrees where the
    // LSH pool binds: does each round buy recall, and at what build cost?
    for (d <- Seq(16, 32); rounds <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val edges = vector.VectorQueries.builtGraphEdgesRefinedD(spark, sfDir, d, rounds)
        .localCheckpoint()
      val nEdges = edges.count()
      val tBuild = (System.nanoTime() - t0) / 1e9
      val served = vector.VectorQueries.beamServe(spark, sfDir, edges,
          vector.VectorQueries.BeamRounds)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      val recall = served.keysIterator
        .map(k => (served(k) & exact(k)).size / 5.0).sum / served.size
      println(f"D=$d%2d NN-Descent rounds=$rounds edges=$nEdges%7d " +
        f"build=$tBuild%6.2fs recall@5=$recall%.3f")
    }
    spark.stop()
  }
}
