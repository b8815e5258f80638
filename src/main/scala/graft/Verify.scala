package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional allowlist for focused local iteration (driver runs leave it
    // unset = full dump); oracle_sql.json is always written in full so a
    // filtered dump still checks against the right SQL
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // a typo'd or empty allowlist would dump nothing and exit 0 — name the
    // entries that matched no query so the focused run can't silently
    // check nothing (same guard as Bench)
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[verify] WARNING: SPARK_GRAFT_ONLY entries match no query: " +
          unknown.mkString(", "))
    }
    val failedNames = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failedNames += name
        // FAIL CLOSED: a failure thrown during ANALYSIS never reaches the
        // overwrite, so a reused outDir still holds the PREVIOUS run's
        // dump for this key — the oracle compare would silently pass on
        // stale rows. Delete any existing dump so the failure is visible
        // to the compare, and record the name for the checker.
        val stale = Paths.get(outDir, name)
        if (Files.exists(stale)) {
          try {
            // walk() holds a directory handle until closed — one leak per
            // failed query adds up over a full fail-closed sweep
            val st = Files.walk(stale)
            try st.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => { Files.deleteIfExists(p); () })
            finally st.close()
          } catch { case de: Throwable =>
            System.err.println(s"[verify] could not delete stale dump for $name: ${de.getMessage}")
          }
        }
      }
      // queries that persist intermediates (curation funnels) must not hold
      // their blocks across the remaining ~100 queries of the dump
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the checker reads this and counts each entry as a FAILURE: without
    // it, a query that crashed before dumping simply had no dir to compare
    // and the run could still report "N pass, 0 fail"
    Files.writeString(Paths.get(s"$outDir/failed.json"),
      failedNames.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
