package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.PowerPlant
import graft.ops.{Sources, Transforms, Aggregates}

/** The reference's power-plant staging pipeline as one expression
  * (/root/reference/dags/global_dag.py:49-67,186-221).
  *
  * `;`-CSV scans → column drop/rename → first-wins dedup per plant
  * (deterministic variant, SURVEY.md §7.4.2) → date parse (unparseable →
  * dropped) → "lat,lon" split → stable sha1 id over business columns
  * (§7.4.1 deviation from sha1(str(row))) → THERMAL/NUCLEAR tag →
  * schema-aligned union.
  */
object StagePlants {

  private val targetCols: Seq[Column] = Seq(
    col("id"), col("plant_name"), col("plant_type"), col("fuel_type"),
    col("creation_date"), col("plant_power"), col("latitude"), col("longitude"))

  /** One source (thermal or nuclear) staged to the target schema. */
  def stageOne(raw: DataFrame, dropList: Seq[String], renames: Map[String, String],
               plantType: String, orderCol: String): DataFrame = {
    val staged = Transforms.renameCols(Transforms.dropCols(raw, dropList), renames)
    val deduped = Aggregates.dedupFirst(staged, Seq("plant"), Seq(col(orderCol).asc))
    val (lat, lon) = Transforms.splitPoint(col("position"))
    deduped
      .withColumn("creation_date", Transforms.parseDateMulti(col("start_date"), Seq("yyyy-MM-dd", "yyyyMMdd")))
      .where(col("creation_date").isNotNull)
      .withColumn("latitude", lat)
      .withColumn("longitude", lon)
      .withColumn("plant_power", col("power (MW)").cast("double"))
      .withColumn("plant_name", col("plant"))
      .withColumn("plant_type", lit(plantType))
      .withColumn("fuel_type", col("fuel"))
      .withColumn("id", Transforms.hashId(Seq(col("plant_name"), col("plant_type"),
        col("fuel_type"), col("creation_date").cast("string"), col("plant_power").cast("string"))))
      .select(targetCols: _*)
  }

  /** Reference drop/rename lists (global_dag.py:53-56,63-66). */
  val thermalDrops: Seq[String] = Seq("perimetre_spatial", "filiere", "combustible",
    "reserve_secondaire_maximale", "sous_filiere", "unite")
  val nuclearDrops: Seq[String] = Seq("reserve_secondaire_maximale",
    "puissance_minimum_de_conception", "sub_sector", "perimetre_spatial",
    "combustible", "filiere", "unite")
  val commonRenames: Map[String, String] = Map(
    "centrale" -> "plant", "point_gps_wsg84" -> "position", "commune" -> "city",
    "date_de_mise_en_service_industrielle" -> "start_date", "puissance_installee" -> "power (MW)")
  val nuclearRenames: Map[String, String] =
    commonRenames ++ Map("sous_filiere" -> "sub_sector", "contrat_programme" -> "contract")

  def apply(spark: SparkSession, thermalCsv: String, nuclearCsv: String): DataFrame = {
    graft.Prep.ensure(spark)
    val thermal = stageOne(Sources.csvPermissive(spark, thermalCsv),
      thermalDrops, commonRenames, "THERMAL", "tranche")
    val nuclear = stageOne(Sources.csvPermissive(spark, nuclearCsv),
      nuclearDrops, nuclearRenames, "NUCLEAR", "tranche")
    Aggregates.unionAligned(Seq(thermal, nuclear))
  }

  /** Typed serve-layer view (SURVEY.md §1.4). */
  def typed(spark: SparkSession, thermalCsv: String, nuclearCsv: String): Dataset[PowerPlant] =
    apply(spark, thermalCsv, nuclearCsv).as(Encoders.product[PowerPlant])
}
