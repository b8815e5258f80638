package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Queries

/** Scratch harness: print Spark job counts per query under the bench
  * posture (AQE off) — the controlled regression metric the PlanSpec pins
  * are measured with. Usage: runMain graft.tools.JobCount <sfDir> <q1,q2,…>
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
    for (name <- names.split(",")) {
      val fn = Queries.all.find(_.name == name).get.fn
      def noop(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      noop()
      spark.catalog.clearCache()
      val st = spark.sparkContext.statusTracker
      val before = st.getJobIdsForGroup(null).length
      noop()
      Thread.sleep(500)
      println(s"JOBS $name ${st.getJobIdsForGroup(null).length - before}")
    }
    spark.stop()
  }
}
