package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversion (Spark 4 moved the
  * public `Column(expr)` constructor behind `classic.ExpressionUtils`).
  * Lives in the spark.sql package solely to satisfy the access modifier.
  */
object GraftBridge {
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Table existence through Spark's own JDBC machinery — the connection
    * comes from the dialect's factory (which consults Spark's
    * DriverRegistry, so drivers shipped via `--jars` + the `driver`
    * property work) and the probe is the dialect's table-exists query
    * (`SELECT 1 FROM <table> WHERE 1=0`), which resolves schema-qualified
    * names and the connection's search path exactly like the subsequent
    * read/write will. A raw `DriverManager` + `getMetaData.getTables(null,
    * null, null)` probe gets all three wrong.
    */
  def jdbcTableExists(url: String, table: String, props: java.util.Properties): Boolean = {
    import org.apache.spark.sql.execution.datasources.jdbc.{JdbcOptionsInWrite, JdbcUtils}
    import scala.jdk.CollectionConverters._
    val params = props.asScala.map { case (k, v) => k.toString -> v.toString }.toMap ++
      Map("url" -> url, "dbtable" -> table)
    val opts = new JdbcOptionsInWrite(params)
    JdbcUtils.withConnection(opts) { conn =>
      // dialect probe first; but its not-found classifier keys on SQLState
      // class 42, which also covers ACCESS violations (e.g. SELECT denied
      // to a write-only account) — a false "absent" would skip the
      // idempotence anti-join. The metadata catalog still lists tables the
      // account cannot SELECT, so it arbitrates before we report absence.
      JdbcUtils.tableExists(conn, opts) || {
        val (schemaPat, namePat) = table.split("\\.") match {
          case Array(s, t) => (s, t)
          case _ => (null, table)
        }
        Seq[String => String](identity, _.toUpperCase, _.toLowerCase).exists { f =>
          val rs = conn.getMetaData.getTables(null,
            Option(schemaPat).map(f).orNull, f(namePat), Array("TABLE"))
          try rs.next() finally rs.close()
        }
      }
    }
  }
}
