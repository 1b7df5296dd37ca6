package graft.sinks

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types._

/** K2's live half: execute the schema-reconciling DDL against a real
  * JDBC database and move rows with Spark's distributed JDBC writer —
  * the loop the reference runs per destination
  * (unstract_db.py:151-377, database_utils.py:83-336):
  *
  *   probe live columns → CREATE TABLE (IF NOT EXISTS) from the plan
  *   schema → migrate v1 layouts in place (ALTER ADD permanent cols +
  *   `*_v2` JSON twins) → parameterized INSERT → read back.
  *
  * DDL runs once on the driver (a handful of statements); row movement
  * is `df.write.jdbc` — every partition opens its own connection and
  * batches inserts, so the write scales with executors, never through
  * the driver.
  */
object DbWriter {

  def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Live column names from JDBC metadata (the information_schema probe,
    * unstract_db.py:160-171). Empty = table absent. */
  def liveColumns(conn: Connection, table: String): Seq[String] = {
    val rs = conn.getMetaData.getColumns(null, null, table, null)
    val cols = scala.collection.mutable.Buffer[String]()
    while (rs.next()) cols += rs.getString("COLUMN_NAME")
    rs.close()
    cols.toSeq
  }

  /** Reconcile the live table with the plan schema: create when absent,
    * otherwise apply the v1→v2 migration ALTERs. Returns the statements
    * actually executed. */
  def reconcile(conn: Connection, d: SchemaDDL.Dialect, table: String,
      schema: StructType): Seq[String] = {
    val live = liveColumns(conn, table)
    val stmts =
      if (live.isEmpty) {
        val ddl = SchemaDDL.createTable(d, table, schema)
        // Derby (and Oracle) lack IF NOT EXISTS; the metadata probe above
        // already guarantees absence
        Seq(ddl.replace("CREATE TABLE IF NOT EXISTS", "CREATE TABLE"))
      } else SchemaDDL.migrate(d, table, live, schema)
    stmts.foreach { s =>
      val st = conn.createStatement()
      try st.execute(s) finally st.close()
    }
    stmts
  }

  /** JDBC can't bind complex types: serialize map/array/struct columns
    * to JSON text first (the reference json.dumps's dict/list values,
    * unstract_db.py:341-361). */
  def jsonifyComplex(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: MapType | _: ArrayType | _: StructType =>
          d.withColumn(f.name, to_json(col(f.name)))
        case _ => d
      }
    }

  /** Distributed append: each partition opens a connection and batches
    * parameterized inserts (Spark's JDBC writer). */
  def append(df: DataFrame, url: String, table: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): Unit = {
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    jsonifyComplex(df).write.mode(SaveMode.Append).jdbc(url, table, props)
  }

  def read(spark: SparkSession, url: String, table: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): DataFrame = {
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    spark.read.jdbc(url, table, props)
  }
}
