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
    // the ORDER must be total within a plant group or the surviving row —
    // and therefore its hash id — is partition-order dependent (dedupFirst's
    // documented contract): every remaining column joins as a tiebreaker
    val tieBreak = staged.columns.filterNot(c => c == orderCol || c == "plant")
      .sorted.map(c => staged(c).asc)
    val deduped = Aggregates.dedupFirst(staged, Seq("plant"), col(orderCol).asc +: tieBreak.toIndexedSeq)
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
  // NOTE drop-then-rename order (stageOne) mirrors the reference exactly:
  // nuclearDrops' "sub_sector" targets a pre-existing raw column of that
  // name (global_dag.py:63 drops it BEFORE renaming), and the rename below
  // re-mints sub_sector from the surviving sous_filiere — in the
  // INTERMEDIATE frame only (reference parity of that shape, and the
  // renamed name participates in dedupFirst's sorted-column tiebreak, so
  // removing the entry would change which duplicate survives); stageOne's
  // final target projection then drops it, as it does city/contract —
  // neither stage's OUTPUT carries sub_sector.
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

  /** Typed serve-layer view (SURVEY.md §1.4). The typed layer only admits
    * fully-valid rows: `PowerPlant`'s numeric fields are primitive Doubles,
    * so a row with unparseable power or position (NULL after the permissive
    * casts) would NPE inside the deserializer mid-stage — same validity
    * gate StageDeaths applies before typing.
    */
  def typed(spark: SparkSession, thermalCsv: String, nuclearCsv: String): Dataset[PowerPlant] =
    Transforms.filterValid(apply(spark, thermalCsv, nuclearCsv),
        Seq("plant_power", "latitude", "longitude"))
      .as(Encoders.product[PowerPlant])
}
