package graft

import org.apache.spark.sql.types._

/** Schema pin for the driver-generated testdata.
  *
  * Round-8 postmortem: the driver regenerated /root/testdata mid-round and
  * changed events.ts from parquet TIMESTAMP(NANOS) to timestamp[us]; the
  * loader's hard-coded nanos branch then broke 15 queries, 25 tests and the
  * whole bench — and the failures surfaced as 25 scattered DATATYPE_MISMATCH
  * errors, not as "the testdata changed". This spec makes the next regen
  * fail LOUDLY in one place, naming the table and column that drifted.
  *
  * Pins the POST-LOADER schema (Tables.load) — i.e. what every query
  * actually assumes — as a (column → type) subset, so a benign added column
  * does not fail the pin but a renamed/retyped column does.
  */
class TableSchemaPinSpec extends SparkSpec {

  private val pins: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // Spark 4 reads parquet timestamp[us] (no tz) as TIMESTAMP_NTZ
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts MUST come out of the loader as TimestampType regardless of the
    // physical encoding (nanos-as-long or timestamp[us]) — this is the
    // exact column whose drift cost round 8 its evidence.
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"$dir: post-loader schemas match what the queries assume") {
      val drifts = pins.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
        val schema = Tables.load(spark, sf(dir), table).schema
        val byName = schema.fields.map(f => f.name -> f.dataType).toMap
        cols.flatMap { case (col, want) =>
          byName.get(col) match {
            case None =>
              Some(s"$table.$col: MISSING (testdata regenerated? " +
                s"present: ${schema.fieldNames.mkString(", ")})")
            case Some(got) if got != want =>
              Some(s"$table.$col: expected ${want.simpleString}, " +
                s"got ${got.simpleString} — testdata schema drifted; " +
                s"fix Tables.load or update queries that assume ${want.simpleString}")
            case _ => None
          }
        }
      }
      assert(drifts.isEmpty, "\nSCHEMA DRIFT:\n" + drifts.mkString("\n"))
    }
  }
}
