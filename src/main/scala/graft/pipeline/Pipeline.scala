package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Named pipeline stages (SURVEY.md §2.6): the reference's Airflow DAG
  * collapses to lazy DataFrame lineage, but the Ingest → Stage → Serve
  * structure is worth keeping as an API — stages compose left-to-right,
  * stay lazy until `run`, and each stage is individually testable.
  *
  * Barriers (the reference's fan-in trigger rules) are action boundaries:
  * nothing executes until the sink action, and Spark schedules independent
  * subtrees concurrently — the 4-way parallel ingest fan-out for free.
  */
final case class Pipeline(stages: Vector[(String, DataFrame => DataFrame)]) {

  def stage(name: String)(f: DataFrame => DataFrame): Pipeline =
    copy(stages = stages :+ (name -> f))

  /** Compose all stages over the input — still lazy. */
  def build(input: DataFrame): DataFrame =
    stages.foldLeft(input) { case (df, (_, f)) => f(df) }

  /** Compose and run a terminal action (the only eager point). */
  def run[A](input: DataFrame)(sink: DataFrame => A): A = sink(build(input))

  def names: Seq[String] = stages.map(_._1)
}

object Pipeline {
  def start: Pipeline = Pipeline(Vector.empty)
}
