package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Death
import graft.ops.{Aggregates, Sources, Transforms, Joins}

/** The reference's death staging pipeline as ONE lazy DataFrame expression
  * (SURVEY.md §3.2; /root/reference/dags/global_dag.py:94-148).
  *
  * Raw fixed-width `death_*` files → byte-sliced fields → sha1 privacy id →
  * multi-format date parse (nulls on `00` months, exactly like strptime
  * failure) → broadcast INSEE→geo lookup (inner: unknown communes dropped)
  * → validity filter → within-batch dedup on id.
  *
  * Scale: the only non-narrow step is the final dropDuplicates (one hash
  * shuffle on id); the geo lookup broadcasts (~35k communes in the real
  * data). At 100 TB the txt scan parallelizes per file-split and the plan is
  * unchanged.
  */
object StageDeaths {

  def cityGeo(spark: SparkSession, path: String): DataFrame =
    Sources.csvPermissive(spark, path, sep = ",")
      // INSEE codes are 5 chars with leading zeros; schema inference may have
      // read them as ints (pandas has the same hazard), so re-pad.
      .select(lpad(col("code_commune_INSEE").cast("string"), 5, "0").as("insee"),
        col("latitude").cast("double"),
        col("longitude").cast("double"))

  /** Fixed-width death lines → sliced fields + privacy id + parsed dates —
    * THE one parse definition, shared with the streaming ingest
    * ([[graft.streaming.Streaming.deathFileStream]]): a format added (or an
    * id derivation changed) in one hand-maintained copy would silently
    * stop the streaming ids/dates matching the batch table they feed
    * through the idempotent append, landing duplicates at rest.
    */
  def parsedRecords(lines: DataFrame): DataFrame =
    Sources.fixedWidth(lines, "value", Sources.deathRecordFields)
      .withColumn("id", sha1(col("name_raw")))
      .withColumn("date_of_birth", Transforms.parseDateMulti(col("birth_raw")))
      .withColumn("date_of_death", Transforms.parseDateMulti(col("death_raw")))

  def apply(spark: SparkSession, deathGlob: String, cityGeoPath: String): DataFrame = {
    graft.Prep.ensure(spark)
    val parsed = parsedRecords(spark.read.text(deathGlob))
    // the op-10 helper IS this filter (null + NaN per dtype) — one
    // definition, no drift
    val geo = Transforms.filterValid(cityGeo(spark, cityGeoPath),
      Seq("latitude", "longitude"))
    // first-wins dedup under a TOTAL order (the StagePlants.stageOne
    // discipline): two records sharing an 80-byte name field (id =
    // sha1(name_raw)) but differing in dates/coords must yield the SAME
    // survivor on every run — a bare dropDuplicates keeps whichever row
    // the shuffle happens to deliver first, violating the repo's
    // determinism contract one package over from where it is documented
    Aggregates.dedupFirst(
      Transforms.filterValid(
          Joins.broadcastLookup(parsed, geo, parsed("insee") === geo("insee")),
          Seq("date_of_birth", "date_of_death"))
        .select(parsed("id"), col("date_of_birth"), col("date_of_death"),
          col("latitude"), col("longitude")),
      Seq("id"),
      Seq(col("date_of_birth").asc_nulls_last, col("date_of_death").asc_nulls_last,
        col("latitude").asc_nulls_last, col("longitude").asc_nulls_last))
  }

  /** Typed serve-layer view (SURVEY.md §1.4). */
  def typed(spark: SparkSession, deathGlob: String, cityGeoPath: String): Dataset[Death] =
    apply(spark, deathGlob, cityGeoPath).as(Encoders.product[Death])
}
