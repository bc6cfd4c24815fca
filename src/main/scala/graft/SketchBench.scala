package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement for SCALING.md: heavy hitters over an OPEN key domain
  * (word 3-shingles — essentially unique per position, the regime where a
  * plain groupBy's map-side combine cannot reduce anything) computed (a)
  * exactly and (b) via the q142 Misra–Gries sketch-then-recount. Reports
  * elapsed time and SHUFFLE BYTES — the latter is the claim under test:
  * the sketch shuffles ≤k entries per (group × partition) while the exact
  * plan shuffles every distinct key. Usage: runMain graft.SketchBench
  * [sfDir] [reps]
  */
object SketchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleBytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    import graft.functions.TextFunctions.{shingles, tokens}
    def grams: DataFrame = Tables.documents(spark, sfDir)
      .select($"lang", explode(shingles(tokens($"text"), 3)).as("g"))
    def totals: DataFrame = grams.groupBy($"lang").agg(count(lit(1)).as("n_tot"))

    // threshold 0.5%: nothing qualifies on open-domain shingles — both
    // plans return the same (near-empty) answer; the cost difference is
    // the infrastructure, which is the point
    def exact: DataFrame =
      grams.groupBy($"lang", $"g").agg(count(lit(1)).as("n"))
        .join(broadcast(totals), "lang")
        .filter($"n" * 200 >= $"n_tot")
        .select($"lang", $"g", $"n")

    // ---- q197 stage split (VERDICT r15 #7): is the 10× ratio the
    // ---- linear accumulate pass or the (sketch-sized) union stage? ----
    if (sys.env.get("SPARK_GRAFT_Q197_SPLIT").contains("1")) {
      def time(label: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"[q197split] $sfDir $label: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      val o = Tables.orders(spark, sfDir)
      (1 to reps).foreach { _ =>
        time("sketch-build (scan+agg)") {
          o.groupBy($"o_orderpriority")
            .agg(hll_sketch_agg($"o_custkey", lit(14)).as("sk"))
            .write.format("noop").mode("overwrite").save()
        }
      }
      val sketches = o.groupBy($"o_orderpriority")
        .agg(hll_sketch_agg($"o_custkey", lit(14)).as("sk"))
        .localCheckpoint() // 5 rows, materialized — union timed alone below
      (1 to reps).foreach { _ =>
        time("union+estimate (5 sketches)") {
          sketches.agg(hll_sketch_estimate(hll_union_agg($"sk")))
            .write.format("noop").mode("overwrite").save()
        }
      }
      (1 to reps).foreach { _ =>
        time("exact adjudication (2x countDistinct)") {
          o.groupBy($"o_orderpriority").agg(countDistinct($"o_custkey").as("d"))
            .union(o.agg(countDistinct($"o_custkey").as("d"))
              .select(lit("(all)"), $"d"))
            .write.format("noop").mode("overwrite").save()
        }
      }
      spark.stop()
      return
    }

    def sketched: DataFrame = {
      val mg = udaf(new graft.operators.MisraGries(256))
      val cand = grams.groupBy($"lang").agg(mg($"g").as("s"))
        .select($"lang", explode(map_keys($"s")).as("g"))
      grams.join(broadcast(cand), Seq("lang", "g"))
        .groupBy($"lang", $"g").agg(count(lit(1)).as("n"))
        .join(broadcast(totals), "lang")
        .filter($"n" * 200 >= $"n_tot")
        .select($"lang", $"g", $"n")
    }

    def time(label: String)(mk: () => DataFrame): Unit = {
      (1 to reps).foreach { i =>
        // count() suffices: both plans are aggregates, nothing is pruned
        java.lang.System.gc()
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        val n = mk().count()
        // listener events drain asynchronously after the job ends
        Thread.sleep(300)
        println(f"[sketchbench] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
          f"shuffle ${shuffleBytes.get() / 1024.0 / 1024.0}%.1f MiB, $n rows")
      }
    }
    time("exact groupBy")(() => exact)
    time("MG sketch+recount")(() => sketched)
    spark.stop()
  }
}
