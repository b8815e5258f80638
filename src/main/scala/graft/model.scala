package graft

import java.sql.Date

/** Typed core (SURVEY.md §1.4): the reference's two production tables as
  * case classes. `DataFrame` at dynamic-schema boundaries (sources, staging),
  * `Dataset[T]` once the schema is fixed — compile-time field checks at the
  * serve layer.
  *
  * Schemas: /root/reference/dags/sql/create_death_table.sql:4-10 and
  * create_power_plant_table.sql:4-13. DECIMAL has no scale in the reference
  * DDL, so Double is both faithful and Tungsten-friendly (SURVEY §1.4).
  */
final case class Death(
    id: String,
    date_of_birth: Date,
    date_of_death: Date,
    latitude: Double,
    longitude: Double)

final case class PowerPlant(
    id: String,
    plant_name: String,
    plant_type: String,
    fuel_type: String,
    creation_date: Date,
    plant_power: Double,
    latitude: Double,
    longitude: Double)
