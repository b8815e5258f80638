package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.Queries

/** Scratch harness: print Spark job counts per query under the bench
  * posture (AQE off) — the controlled regression metric the PlanSpec pins
  * are measured with. Counts via a listener on job START, so jobs
  * submitted under ANY job group — including Structured Streaming's
  * micro-batch execution threads, which statusTracker's null-group query
  * misses — are all counted. Usage:
  * runMain graft.tools.JobCount <sfDir> <q1,q2,…>
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Prep.ensure(spark)
    val jobs = new AtomicInteger()
    val counter = new SparkListener {
      override def onJobStart(start: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(counter)
    for (name <- names.split(",")) {
      val fn = Queries.all.find(_.name == name).getOrElse(
        sys.error(s"JobCount: unknown query '$name' — check the comma-separated list")).fn
      def noop(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      noop()
      spark.catalog.clearCache()
      // listener events post asynchronously — drain the bus
      // deterministically before each sample (a fixed sleep can under-
      // or over-count when the bus is loaded)
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      val before = jobs.get()
      noop()
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      println(s"JOBS $name ${jobs.get() - before}")
    }
    spark.stop()
  }
}
