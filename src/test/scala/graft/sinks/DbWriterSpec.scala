package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K2 live loop against embedded Derby: the DDL is EXECUTED on a real
  * database and rows land via the distributed JDBC writer — not
  * string-compared (unstract_db.py:151-377 semantics). */
class DbWriterSpec extends SparkSpec {
  import SchemaDDL.Derby

  private def freshUrl(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    s"jdbc:derby:$dir/$name;create=true"
  }

  private val schema = StructType(Seq(
    StructField("invoice_total", DoubleType),
    StructField("customer", StringType),
    StructField("line_items", ArrayType(StringType))))

  test("create → insert → read back: permanent cols, status, JSON arrays") {
    import spark.implicits._
    val url = freshUrl("db1")
    val created = DbWriter.withConnection(url) { conn =>
      DbWriter.reconcile(conn, Derby, "RESULTS", schema)
    }
    assert(created.size == 1 && created.head.startsWith("CREATE TABLE \"RESULTS\""))
    // idempotent: a second reconcile finds nothing missing
    val again = DbWriter.withConnection(url) { conn =>
      DbWriter.reconcile(conn, Derby, "RESULTS", schema)
    }
    assert(again.isEmpty)

    val rows = Seq(
      (12.5, "acme", Seq("w1", "w2"), Option.empty[String]),
      (0.0, "bad co", Seq.empty[String], Some("parse failure")))
      .toDF("invoice_total", "customer", "line_items", "error_message")
    DbWriter.append(Sinks.shapeForDb(rows, "wf-9"), url, "RESULTS")

    val back = DbWriter.read(spark, url, "RESULTS")
    assert(back.count() == 2)
    val byCustomer = back.orderBy("customer")
      .select("customer", "status", "error_message", "line_items")
      .collect()
    assert(byCustomer(0).getString(1) == "SUCCESS" && byCustomer(0).isNullAt(2))
    assert(byCustomer(0).getString(3) == """["w1","w2"]""") // json.dumps analog
    assert(byCustomer(1).getString(1) == "ERROR" &&
      byCustomer(1).getString(2) == "parse failure")
  }

  test("v1 layout migrates in place: permanent cols + *_v2 twins ALTERed") {
    import spark.implicits._
    val url = freshUrl("db2")
    val v1Schema = StructType(schema.fields.take(2))
    DbWriter.withConnection(url) { conn =>
      val st = conn.createStatement()
      st.execute("""CREATE TABLE "RESULTS" ("id" CLOB,
        "created_by" CLOB, "created_at" TIMESTAMP,
        "invoice_total" DOUBLE, "customer" CLOB)""")
      st.execute("""INSERT INTO "RESULTS" ("id", "created_by", "invoice_total", "customer")
        VALUES ('r1', 'legacy', 10.0, 'oldco')""")
      st.close()
      val stmts = DbWriter.reconcile(conn, Derby, "RESULTS", v1Schema)
      assert(stmts.exists(_.contains("\"metadata\" CLOB")))
      assert(stmts.exists(_.contains("\"status\" CLOB")))
      assert(stmts.exists(_.contains("\"invoice_total_v2\" CLOB")))
      assert(stmts.exists(_.contains("\"customer_v2\" CLOB")))
      assert(stmts.forall(_.startsWith("ALTER TABLE \"RESULTS\" ADD ")))
      // migrated layout is stable: third reconcile is a no-op
      assert(DbWriter.reconcile(conn, Derby, "RESULTS", v1Schema).isEmpty)
    }
    // v2 rows land in the migrated table next to the legacy row
    val v2 = Seq((99.0, "newco", Option.empty[String]))
      .toDF("invoice_total", "customer", "error_message")
    DbWriter.append(Sinks.shapeForDb(v2, "wf-2"), url, "RESULTS")
    val back = DbWriter.read(spark, url, "RESULTS").orderBy("invoice_total")
      .select("customer", "status").collect()
    assert(back.map(_.getString(0)).toSeq == Seq("oldco", "newco"))
    assert(back(0).isNullAt(1) && back(1).getString(1) == "SUCCESS")
  }

  test("adopts a pre-existing table created unquoted (engine-case-folded)") {
    import spark.implicits._
    val url = freshUrl("db4")
    DbWriter.withConnection(url) { conn =>
      val st = conn.createStatement()
      // unquoted DDL: Derby folds the identifier to ADOPTED
      st.execute("CREATE TABLE adopted (id CLOB, created_by CLOB, " +
        "created_at TIMESTAMP, invoice_total DOUBLE, customer CLOB)")
      st.close()
      // probing "adopted" exact-case finds nothing; the folded probe must
      // adopt ADOPTED and migrate it instead of issuing a colliding CREATE
      val (liveName, stmts) = DbWriter.reconcileAs(conn, Derby, "adopted", schema)
      assert(liveName == "ADOPTED")
      assert(stmts.nonEmpty && stmts.forall(_.startsWith("ALTER TABLE \"ADOPTED\" ADD ")))
      assert(DbWriter.reconcile(conn, Derby, "adopted", schema).isEmpty)
    }
    val rows = Seq((5.0, "foldco", Seq.empty[String], Option.empty[String]))
      .toDF("invoice_total", "customer", "line_items", "error_message")
    // pre-existing cols live as INVOICE_TOTAL etc; align before the
    // exact-case-quoting JDBC insert
    val live = DbWriter.withConnection(url)(c => DbWriter.liveColumns(c, "adopted"))
    DbWriter.append(DbWriter.alignColumns(Sinks.shapeForDb(rows, "wf"), live),
      url, "ADOPTED")
    assert(DbWriter.read(spark, url, "ADOPTED").count() == 1)
  }

  test("schema evolution: a new prompt column is ALTERed in, old rows null") {
    import spark.implicits._
    val url = freshUrl("db3")
    DbWriter.withConnection(url)(c => DbWriter.reconcile(c, Derby, "RESULTS", schema))
    val r1 = Seq((1.0, "a", Seq("x"), Option.empty[String]))
      .toDF("invoice_total", "customer", "line_items", "error_message")
    DbWriter.append(Sinks.shapeForDb(r1, "wf"), url, "RESULTS")

    val evolved = schema.add(StructField("due_date", DateType))
    val stmts = DbWriter.withConnection(url)(c =>
      DbWriter.reconcile(c, Derby, "RESULTS", evolved))
    assert(stmts == Seq("""ALTER TABLE "RESULTS" ADD "due_date" DATE"""))

    val r2 = Seq((2.0, "b", Seq.empty[String], "2024-06-01", Option.empty[String]))
      .toDF("invoice_total", "customer", "line_items", "due_date", "error_message")
      .withColumn("due_date", to_date(col("due_date")))
    DbWriter.append(Sinks.shapeForDb(r2, "wf"), url, "RESULTS")

    val back = DbWriter.read(spark, url, "RESULTS").orderBy("invoice_total")
      .select("due_date").collect()
    assert(back(0).isNullAt(0))
    assert(back(1).getDate(0).toString == "2024-06-01")
  }
}
