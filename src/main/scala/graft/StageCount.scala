package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong
object StageCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new AtomicLong(); val tasks = new AtomicLong()
    val recordsRead = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        recordsRead.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
      }
    })
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    Thread.sleep(2000) // let the listener bus drain
    println(s"[stagecount] $name stages=${stages.get} tasks=${tasks.get} inputRecords=${recordsRead.get}")
    spark.stop()
  }
}
