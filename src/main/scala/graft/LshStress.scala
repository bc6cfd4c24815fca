package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement for SCALING.md (round 15): the band-granularity lever
  * behind the LSH family's 10× ratios. The replica triptych showed the
  * quadratic comes from FIXED band depth (6 bits → 64 buckets/table):
  * in-bucket occupancy grows linearly with n, so in-bucket pairs grow
  * ~n². The production fix is band bits ∝ log n. This tool measures, per
  * bit depth b ∈ {6, 9, 12} and per corpus (sf0.1 and its 10× novel
  * replica): distinct candidate pairs, wall time of the q134-shape
  * search (4 tables, in-bucket pairs → cosine → top-1), and recall@1 vs
  * exact on the base corpus — the cost/recall trade a deployment reads
  * before picking b.
  * Usage: runMain graft.LshStress <sfDir> <replicaDir>
  */
object LshStress {
  // round-16 fix: the original stride-2 +t-shift planes made tables t and
  // t+2 share b−1 planes (near-identical bucketings — effective L ≈ 2),
  // UNDERSTATING the recall column of the SCALING.md lever table. Now uses
  // q230's md5-decorrelated CotunedPlanes, so per-depth recall is what
  // independent tables actually give. Pair counts/times are plane-family-
  // insensitive (occupancy statistics, not plane identity).
  private def bucketT(emb: Column, t: Int, bits: Int): Column =
    (0 until bits).map { i =>
      val (a, b) = vector.VectorQueries.CotunedPlanes(t)(i)
      when(element_at(emb, a) > element_at(emb, b),
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def banded(e: DataFrame, bits: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    e.select($"vec_id", posexplode(
        array((0 until 4).map(t => bucketT($"embedding", t, bits)): _*)))
      .select($"vec_id", $"pos".as("tbl"), $"col".as("bucket"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repDir = args.lift(1).getOrElse(ScaleUp.novelDir(sfDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val exact = vector.VectorQueries.q18KnnTopk(spark, sfDir)
      .filter($"rank" === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    for (bits <- Seq(6, 9, 12); (label, dir) <- Seq("1x" -> sfDir, "10x" -> repDir)) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding")
      val b = banded(e, bits).localCheckpoint()
      val pairs = b.as("a").join(b.as("b"),
          $"a.tbl" === $"b.tbl" && $"a.bucket" === $"b.bucket" &&
            $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("x"), $"b.vec_id".as("y")).distinct()
      val t0 = System.nanoTime()
      val nPairs = pairs.count()
      // the q134-shape search: score in-bucket pairs, keep top-1 per vec
      val en = e.withColumn("nrm", sqrt(aggregate(transform($"embedding",
        x => x.cast("double") * x), lit(0.0d), (acc, x) => acc + x)))
      val sym = pairs.select($"x".as("vec_id"), $"y".as("nn_id"))
        .unionByName(pairs.select($"y".as("vec_id"), $"x".as("nn_id")))
      val scored = sym
        .join(en.select($"vec_id", $"embedding".as("ea"), $"nrm".as("na")), "vec_id")
        .join(en.select($"vec_id".as("nn_id"), $"embedding".as("eb"), $"nrm".as("nb")), "nn_id")
        .select($"vec_id", $"nn_id",
          (graft.expressions.NativeKernels.dotF($"ea", $"eb") / ($"na" * $"nb")).as("sim"))
        .groupBy($"vec_id")
        .agg(max(struct($"sim", ($"nn_id" * -1).as("negid"))).as("best"))
        .select($"vec_id", ($"best.negid" * -1).as("nn_id"))
      val got = scored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      val recall =
        if (label == "1x") {
          val hits = exact.count { case (v, nn) => got.get(v).contains(nn) }
          f"recall@1=${hits.toDouble / exact.size}%.3f"
        } else ""
      println(f"bits=$bits%2d $label%3s pairs=$nPairs%10d time=$secs%7.2fs $recall")
    }
    spark.stop()
  }
}
