package graft.sinks

import org.apache.spark.sql.types._

/** Schema-reconciling destination DDL (SURVEY.md K2): the reference
  * creates destination tables from the first row's value types, with
  * fixed permanent columns, and migrates v1 layouts in place by adding
  * `*_v2` JSON columns (unstract_db.py:151-377, postgresql.py:84-177,
  * database_utils.py:83-336).
  *
  * Here schema is known at PLAN time (a Spark improvement with the same
  * external semantics): DDL derives from the DataFrame's StructType, and
  * reconciliation diffs the live table's columns against the plan.
  */
object SchemaDDL {

  sealed trait Dialect {
    def name: String
    def quote(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""
    /** ALTER TABLE's add-column clause — ANSI `ADD COLUMN x t`; T-SQL
      * rejects the COLUMN keyword and Oracle wants parens (the
      * reference's per-dialect connectors: mssql/mssql.py,
      * oracle_db/oracle_db.py). */
    def addColumnClause(quotedCol: String, typ: String): String =
      s"ADD COLUMN $quotedCol $typ"
    /** Whether CREATE TABLE accepts an inline IF NOT EXISTS guard
      * (MSSQL never, Oracle pre-23c never) — absence is fine for the
      * engine itself, which probes JDBC metadata before creating. */
    def supportsCreateIfNotExists: Boolean = true
    def typeOf(dt: DataType): String = dt match {
      case StringType => "TEXT"
      case IntegerType | ShortType | ByteType => "INTEGER"
      case LongType => "BIGINT"
      case DoubleType | FloatType => "DOUBLE PRECISION"
      case BooleanType => "BOOLEAN"
      case _: DecimalType => "NUMERIC"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case DateType => "DATE"
      case _: MapType | _: ArrayType | _: StructType => jsonType
      case BinaryType => "BYTEA"
      case _ => "TEXT"
    }
    def jsonType: String = "TEXT"
  }
  case object Postgres extends Dialect { val name = "postgresql"; override def jsonType = "JSONB" }
  case object MySql extends Dialect {
    val name = "mysql"
    override def quote(id: String): String = "`" + id.replace("`", "``") + "`"
    override def jsonType = "JSON"
    override def typeOf(dt: DataType): String = dt match {
      case StringType => "LONGTEXT"
      case DoubleType | FloatType => "DOUBLE"
      case BinaryType => "LONGBLOB"
      case _ => super.typeOf(dt) match { case "TEXT" => "LONGTEXT"; case t => t }
    }
  }
  case object MariaDb extends Dialect {
    val name = "mariadb"
    override def quote(id: String): String = MySql.quote(id)
    override def jsonType = "LONGTEXT"
    override def typeOf(dt: DataType): String = MySql.typeOf(dt)
  }
  case object MsSql extends Dialect {
    val name = "mssql"
    override def quote(id: String): String = "[" + id.replace("]", "]]") + "]"
    override def addColumnClause(quotedCol: String, typ: String): String =
      s"ADD $quotedCol $typ"
    override def supportsCreateIfNotExists: Boolean = false
    override def typeOf(dt: DataType): String = dt match {
      case StringType => "NVARCHAR(MAX)"
      case DoubleType | FloatType => "FLOAT"
      case BooleanType => "BIT"
      case TimestampType | TimestampNTZType => "DATETIME2"
      case _: MapType | _: ArrayType | _: StructType => "NVARCHAR(MAX)"
      case BinaryType => "VARBINARY(MAX)"
      case other => super.typeOf(other)
    }
  }
  case object Oracle extends Dialect {
    val name = "oracle"
    override def addColumnClause(quotedCol: String, typ: String): String =
      s"ADD ($quotedCol $typ)"
    override def supportsCreateIfNotExists: Boolean = false
    override def typeOf(dt: DataType): String = dt match {
      case StringType => "CLOB"
      case IntegerType | ShortType | ByteType | LongType => "NUMBER(19)"
      case DoubleType | FloatType => "BINARY_DOUBLE"
      case BooleanType => "NUMBER(1)"
      case _: MapType | _: ArrayType | _: StructType => "CLOB"
      case BinaryType => "BLOB"
      case other => super.typeOf(other)
    }
  }
  case object Redshift extends Dialect {
    val name = "redshift"
    override def jsonType = "SUPER"
    override def typeOf(dt: DataType): String = dt match {
      case StringType => "VARCHAR(65535)"
      case other => super.typeOf(other)
    }
  }
  case object Snowflake extends Dialect {
    val name = "snowflake"
    override def jsonType = "VARIANT"
    override def typeOf(dt: DataType): String = dt match {
      case StringType => "VARCHAR"
      case DoubleType | FloatType => "DOUBLE"
      case IntegerType | LongType | ShortType | ByteType => "NUMBER"
      case other => super.typeOf(other)
    }
  }
  case object BigQuery extends Dialect {
    val name = "bigquery"
    override def quote(id: String): String = "`" + id + "`"
    override def jsonType = "JSON"
    override def typeOf(dt: DataType): String = dt match {
      case StringType => "STRING"
      case IntegerType | LongType | ShortType | ByteType => "INT64"
      case DoubleType | FloatType => "FLOAT64"
      case BooleanType => "BOOL"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case BinaryType => "BYTES"
      case _: MapType | _: ArrayType | _: StructType => "JSON"
      case other => super.typeOf(other)
    }
  }

  val dialects: Seq[Dialect] = Seq(
    Postgres, MySql, MariaDb, MsSql, Oracle, Redshift, Snowflake, BigQuery)

  /** Embedded-test dialect (NOT one of the reference's 8): Apache Derby
    * ships with Spark, so DbWriterSpec can run the create → migrate →
    * insert → read-back loop against a LIVE database in-sandbox. Derby
    * has no `IF NOT EXISTS` (and, like Oracle, no COLUMN keyword in
    * ADD) — DbWriter probes metadata before creating. */
  case object Derby extends Dialect {
    val name = "derby"
    override def addColumnClause(quotedCol: String, typ: String): String =
      s"ADD $quotedCol $typ"
    override def supportsCreateIfNotExists: Boolean = false
    override def jsonType = "CLOB"
    override def typeOf(dt: DataType): String = dt match {
      // CLOB (not VARCHAR) matches Spark's DerbyDialect StringType
      // mapping, so the JDBC writer's setNull(Types.CLOB) binds cleanly
      case StringType => "CLOB"
      case DoubleType | FloatType => "DOUBLE"
      case BinaryType => "BLOB"
      case _: DecimalType => "DECIMAL(31,6)"
      case other => super.typeOf(other)
    }
  }

  /** Permanent columns every destination table carries
    * (postgresql.py:156-177). */
  def permanentColumns(d: Dialect): Seq[(String, String)] = Seq(
    "id" -> d.typeOf(StringType),
    "created_by" -> d.typeOf(StringType),
    "created_at" -> d.typeOf(TimestampType),
    "metadata" -> d.jsonType,
    "status" -> d.typeOf(StringType),
    "error_message" -> d.typeOf(StringType))

  /** CREATE TABLE from the plan schema + permanent cols, with the
    * existence guard only where the dialect has one. */
  def createTable(d: Dialect, table: String, schema: StructType): String = {
    val perm = permanentColumns(d).map { case (n, t) => s"${d.quote(n)} $t" }
    val data = schema.fields
      .filterNot(f => permanentColumns(d).exists(_._1 == f.name))
      .map(f => s"${d.quote(f.name)} ${d.typeOf(f.dataType)}")
    val guard = if (d.supportsCreateIfNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $guard${d.quote(table)} (${(perm ++ data).mkString(", ")})"
  }

  /** v1 → v2 migration: columns the live table is missing, and the `*_v2`
    * JSON twin for every data column when the layout predates v2
    * (unstract_db.py:279-323). Returns ALTER statements in a
    * deterministic order. */
  def migrate(d: Dialect, table: String, liveColumns: Seq[String],
      schema: StructType): Seq[String] = {
    val live = liveColumns.map(_.toLowerCase).toSet
    val wantPerm = permanentColumns(d).filterNot { case (n, _) => live(n) }
    val dataCols = schema.fields
      .filterNot(f => permanentColumns(d).exists(_._1 == f.name))
    val wantData = dataCols.filterNot(f => live(f.name.toLowerCase))
      .map(f => f.name -> d.typeOf(f.dataType)).toSeq
    // v2 layout marker: the metadata permanent column (added in the same
    // migration wave as the *_v2 twins) or any existing twin — a freshly
    // created table is already v2 and must not grow twins
    val isV1 = !(live("metadata") || live.exists(_.endsWith("_v2")))
    val v2Twins: Seq[(String, String)] = if (isV1)
      dataCols.map(f => s"${f.name}_v2" -> d.jsonType)
        .filterNot { case (n, _) => live(n.toLowerCase) }.toSeq
    else Seq.empty
    (wantPerm ++ wantData ++ v2Twins).map { case (n, t) =>
      s"ALTER TABLE ${d.quote(table)} ${d.addColumnClause(d.quote(n), t)}"
    }
  }
}
