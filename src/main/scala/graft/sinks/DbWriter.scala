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

  private def columnsOf(md: java.sql.DatabaseMetaData, table: String): Seq[String] = {
    val rs = md.getColumns(null, null, table, null)
    val cols = scala.collection.mutable.Buffer[String]()
    while (rs.next()) cols += rs.getString("COLUMN_NAME")
    rs.close()
    cols.toSeq
  }

  /** Resolve the live form of `table` plus its columns (empty = absent).
    * The engine's own DDL quotes identifiers, so names round-trip
    * exactly — but a PRE-EXISTING table created unquoted was case-folded
    * by the database, and probing only the exact case would miss it and
    * let `reconcile` issue a colliding CREATE. When the exact probe comes
    * back empty, retry with the engine's declared folded form
    * (DatabaseMetaData.storesUpper/LowerCaseIdentifiers) and adopt that
    * name for all subsequent DDL/DML. */
  def resolveTable(conn: Connection, table: String): (String, Seq[String]) = {
    val md = conn.getMetaData
    val exact = columnsOf(md, table)
    if (exact.nonEmpty) (table, exact)
    else {
      val folded =
        if (md.storesUpperCaseIdentifiers) table.toUpperCase
        else if (md.storesLowerCaseIdentifiers) table.toLowerCase
        else table
      val adopted = if (folded == table) Nil else columnsOf(md, folded)
      if (adopted.nonEmpty) (folded, adopted) else (table, Nil)
    }
  }

  /** Live column names from JDBC metadata (the information_schema probe,
    * unstract_db.py:160-171). Empty = table absent. */
  def liveColumns(conn: Connection, table: String): Seq[String] =
    resolveTable(conn, table)._2

  /** Reconcile the live table with the plan schema: create when absent,
    * otherwise apply the v1→v2 migration ALTERs (against the adopted
    * live-case name). Returns (liveTableName, statements executed). */
  def reconcile(conn: Connection, d: SchemaDDL.Dialect, table: String,
      schema: StructType): Seq[String] = reconcileAs(conn, d, table, schema)._2

  def reconcileAs(conn: Connection, d: SchemaDDL.Dialect, table: String,
      schema: StructType): (String, Seq[String]) = {
    val (liveName, live) = resolveTable(conn, table)
    val stmts =
      if (live.isEmpty) Seq(SchemaDDL.createTable(d, table, schema))
      else SchemaDDL.migrate(d, liveName, live, schema)
    stmts.foreach { s =>
      val st = conn.createStatement()
      try st.execute(s) finally st.close()
    }
    (liveName, stmts)
  }

  /** Rename DataFrame columns to the live table's exact case: an adopted
    * pre-existing table stores its original columns case-folded, and the
    * JDBC writer quotes names exactly — a quoted lowercase INSERT would
    * miss the folded column. */
  def alignColumns(df: DataFrame, liveCols: Seq[String]): DataFrame = {
    val byLower = liveCols.map(c => c.toLowerCase -> c).toMap
    df.columns.foldLeft(df) { (d, c) =>
      byLower.get(c.toLowerCase).filter(_ != c)
        .map(live => d.withColumnRenamed(c, live)).getOrElse(d)
    }
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
