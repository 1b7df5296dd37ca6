package graft.sinks

import java.sql.{Connection, SQLException}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** K2's PostgreSQL branch, exercised LIVE through DbWriter's
  * reconcile → migrate loop against a scripted JDBC connection with
  * Postgres DDL semantics (no Postgres server ships in-sandbox; the
  * fake executes — not string-compares — every statement against a
  * catalog with the behaviors that differ from Derby's):
  *
  *  - identifiers fold to LOWER case when unquoted (Derby folds UPPER,
  *    so the lower-folding adoption branch of `resolveTable` is never
  *    hit by DbWriterSpec);
  *  - `CREATE TABLE IF NOT EXISTS` is accepted and honored (Derby has
  *    no guard, so `supportsCreateIfNotExists=true` codepaths — the
  *    guard emission AND its idempotence — go unexecuted there);
  *  - the JSON type is JSONB, so the v1→v2 `*_v2` twin migration runs
  *    with the reference's actual Postgres column type
  *    (postgresql.py:84-177, unstract_db.py:279-323);
  *  - every column type is validated against the types PostgreSQL
  *    actually accepts, so a foreign dialect's type leaking into the
  *    Postgres branch fails the statement, not a string diff.
  */
class PgLiveLoopSpec extends AnyFunSuite {
  import SchemaDDL.Postgres

  private val schema = StructType(Seq(
    StructField("invoice_total", DoubleType),
    StructField("customer", StringType),
    StructField("line_items", ArrayType(StringType))))

  test("create → reconcile: IF NOT EXISTS guard emitted, JSONB landed, idempotent") {
    val db = new FakePostgres.Db
    val conn = FakePostgres.connection(db)
    val stmts = DbWriter.reconcile(conn, Postgres, "results", schema)
    assert(stmts.size == 1 &&
      stmts.head.startsWith("CREATE TABLE IF NOT EXISTS \"results\""))
    val cols = db.tables("results")
    assert(cols("metadata") == "JSONB")     // permanent JSON column
    assert(cols("line_items") == "JSONB")   // complex data column
    assert(cols("invoice_total") == "DOUBLE PRECISION")
    assert(cols("customer") == "TEXT")
    // idempotent: second reconcile probes metadata and issues nothing
    assert(DbWriter.reconcile(conn, Postgres, "results", schema).isEmpty)
    // the guard itself is honored by the engine: replaying the CREATE
    // verbatim is a no-op, while an unguarded CREATE collides
    FakePostgres.exec(conn, stmts.head)
    assert(db.tables("results") == cols)
    val bare = stmts.head.replace("IF NOT EXISTS ", "")
    assert(intercept[SQLException](FakePostgres.exec(conn, bare))
      .getMessage.contains("already exists"))
  }

  test("adopts a lower-folded pre-existing v1 table and migrates it to JSONB v2") {
    val db = new FakePostgres.Db
    val conn = FakePostgres.connection(db)
    // a DBA-created legacy table, unquoted: Postgres folds to "results"
    FakePostgres.exec(conn, "CREATE TABLE Results (id TEXT, " +
      "created_by TEXT, created_at TIMESTAMP, " +
      "invoice_total DOUBLE PRECISION, customer TEXT)")
    assert(db.tables.keySet == Set("results"))
    // the engine asks for "Results": the exact probe misses, the folded
    // probe must adopt "results" instead of issuing a colliding CREATE
    val v1 = StructType(schema.fields.take(2))
    val (liveName, stmts) = DbWriter.reconcileAs(conn, Postgres, "Results", v1)
    assert(liveName == "results")
    assert(stmts.nonEmpty &&
      stmts.forall(_.startsWith("ALTER TABLE \"results\" ADD COLUMN ")))
    // v1 marker: permanent cols + *_v2 JSONB twins for every data column
    val cols = db.tables("results")
    assert(cols("metadata") == "JSONB" && cols("status") == "TEXT")
    assert(cols("invoice_total_v2") == "JSONB")
    assert(cols("customer_v2") == "JSONB")
    // migrated layout is stable under both spellings
    assert(DbWriter.reconcile(conn, Postgres, "Results", v1).isEmpty)
    assert(DbWriter.reconcile(conn, Postgres, "results", v1).isEmpty)
  }

  test("schema evolution ALTERs exactly the new column, typed for Postgres") {
    val db = new FakePostgres.Db
    val conn = FakePostgres.connection(db)
    DbWriter.reconcile(conn, Postgres, "results", schema)
    val evolved = schema.add(StructField("due_date", DateType))
      .add(StructField("attachments", BinaryType))
    val stmts = DbWriter.reconcile(conn, Postgres, "results", evolved)
    assert(stmts == Seq(
      """ALTER TABLE "results" ADD COLUMN "due_date" DATE""",
      """ALTER TABLE "results" ADD COLUMN "attachments" BYTEA"""))
    assert(db.tables("results")("attachments") == "BYTEA")
    assert(DbWriter.reconcile(conn, Postgres, "results", evolved).isEmpty)
  }
}

/** Scripted JDBC connection with PostgreSQL DDL semantics, built from
  * dynamic proxies over the four java.sql interfaces DbWriter touches
  * (Connection, DatabaseMetaData, Statement, ResultSet). Any method
  * outside that surface throws, keeping the fake honest. */
object FakePostgres {

  /** Types the engine's Postgres branch may emit — anything else is a
    * dialect leak and fails the statement like a real server would. */
  private val LegalTypes = Set("TEXT", "INTEGER", "BIGINT",
    "DOUBLE PRECISION", "BOOLEAN", "NUMERIC", "TIMESTAMP", "DATE",
    "JSONB", "BYTEA")

  final class Db {
    // exact-case table name -> insertion-ordered col name -> type
    val tables = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.LinkedHashMap[String, String]]()
  }

  def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  private def proxy[T](cls: Class[T])(
      h: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
      (_, m, a) => {
        val args = if (a == null) Array.empty[AnyRef] else a
        h.applyOrElse((m.getName, args), (x: (String, Array[AnyRef])) =>
          throw new UnsupportedOperationException(s"${cls.getSimpleName}.${x._1}"))
      }).asInstanceOf[T]

  /** Unquoted identifiers fold to lower case; quoted stay exact. */
  private def ident(raw: String): String = {
    val t = raw.trim
    if (t.startsWith("\"")) t.stripPrefix("\"").stripSuffix("\"").replace("\"\"", "\"")
    else t.toLowerCase
  }

  private def checkType(t: String): String = {
    if (!LegalTypes(t.trim))
      throw new SQLException(s"""type "${t.trim}" does not exist""")
    t.trim
  }

  private val CreateRe =
    """(?s)^\s*CREATE TABLE\s+(IF NOT EXISTS\s+)?("[^"]+"|\S+)\s*\((.*)\)\s*$""".r
  private val AlterRe =
    """^\s*ALTER TABLE\s+("[^"]+"|\S+)\s+ADD COLUMN\s+("[^"]+"|\S+)\s+(.+?)\s*$""".r

  private def execute(db: Db, sql: String): Unit = sql match {
    case CreateRe(guard, rawName, colList) =>
      val name = ident(rawName)
      if (db.tables.contains(name)) {
        if (guard == null)
          throw new SQLException(s"""relation "$name" already exists""")
      } else {
        val cols = scala.collection.mutable.LinkedHashMap[String, String]()
        colList.split(",\\s*(?=\"|\\w)").foreach { c =>
          val parts = c.trim.split("\\s+", 2)
          cols(ident(parts(0))) = checkType(parts(1))
        }
        db.tables(name) = cols
      }
    case AlterRe(rawName, rawCol, typ) =>
      val name = ident(rawName)
      val cols = db.tables.getOrElse(name,
        throw new SQLException(s"""relation "$name" does not exist"""))
      val col = ident(rawCol)
      if (cols.contains(col))
        throw new SQLException(s"""column "$col" of relation "$name" already exists""")
      cols(col) = checkType(typ)
    case other => throw new SQLException(s"syntax error: $other")
  }

  private def columnsResultSet(names: Seq[String]): java.sql.ResultSet = {
    val it = names.iterator
    var cur: String = null
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        val has = it.hasNext
        if (has) cur = it.next()
        java.lang.Boolean.valueOf(has)
      case ("getString", Array(k)) if k == "COLUMN_NAME" => cur
      case ("close", _) => null
    }
  }

  private def metaData(db: Db): java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData]) {
      case ("storesUpperCaseIdentifiers", _) => java.lang.Boolean.FALSE
      case ("storesLowerCaseIdentifiers", _) => java.lang.Boolean.TRUE
      case ("getColumns", Array(_, _, table, _)) =>
        // JDBC metadata matches the stored (folded) name literally
        columnsResultSet(
          db.tables.get(table.asInstanceOf[String]).map(_.keys.toSeq)
            .getOrElse(Nil))
    }

  def connection(db: Db): Connection =
    proxy(classOf[Connection]) {
      case ("getMetaData", _) => metaData(db)
      case ("createStatement", _) =>
        proxy(classOf[java.sql.Statement]) {
          case ("execute", Array(sql)) =>
            execute(db, sql.asInstanceOf[String]); java.lang.Boolean.FALSE
          case ("close", _) => null
        }
      case ("close", _) => null
    }
}
