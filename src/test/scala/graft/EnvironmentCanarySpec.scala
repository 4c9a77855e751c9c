package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Environment-drift canary: asserts the engine's reader assumptions
  * against the ACTUAL driver-generated testdata, so a regenerated
  * dataset in a new shape fails HERE with one pointed message instead
  * of as dozens of downstream DATATYPE_MISMATCH failures (the round-6
  * incident: events.ts moved from INT64 TIMESTAMP(NANOS) to
  * TIMESTAMP(µs) and 77 tests / 45 gates went down with an opaque
  * shared root cause).
  *
  * Checks every scale factor present on disk — drift can land in one
  * SF before another if the driver regenerates incrementally.
  */
class EnvironmentCanarySpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).isDirectory)

  /** Column name → acceptable Spark types. The reader contract, not the
    * full schema: extra columns are tolerated (additive drift is fine),
    * missing columns or changed types are not.
    */
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "events" -> Map(
      // every encoding normalizeEventTs knows how to adapt
      "ts" -> Set(LongType, TimestampType, TimestampNTZType),
      "event_id" -> Set(LongType),
      "user_id" -> Set(LongType),
      "event_type" -> Set(StringType),
      "value" -> Set(DoubleType),
      "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType),
      "text" -> Set(StringType),
      "lang" -> Set(StringType),
      "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType, containsNull = true),
                         ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> Set[DataType](TimestampNTZType, TimestampType, DateType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType),
      "l_quantity" -> Set(DoubleType, LongType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType),
      "l_shipdate" -> Set[DataType](TimestampNTZType, TimestampType, DateType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType),
      "c_name" -> Set(StringType),
      "c_nationkey" -> Set(LongType, IntegerType)),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType),
      "s_name" -> Set(StringType),
      "s_nationkey" -> Set(LongType, IntegerType),
      "s_acctbal" -> Set(DoubleType)),
    "part" -> Map(
      "p_partkey" -> Set(LongType),
      "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType),
      "p_size" -> Set(LongType, IntegerType),
      "p_retailprice" -> Set(DoubleType)),
    "region" -> Map(
      "r_regionkey" -> Set(LongType, IntegerType),
      "r_name" -> Set(StringType)),
    "nation" -> Map(
      "n_nationkey" -> Set(LongType, IntegerType),
      "n_name" -> Set(StringType),
      "n_regionkey" -> Set(LongType, IntegerType)))

  for (dir <- sfDirs) {
    test(s"all driver tables exist at $dir") {
      val missing = Tables.names.filterNot(n =>
        new java.io.File(s"$dir/$n.parquet").exists())
      assert(missing.isEmpty,
        s"driver testdata at $dir is missing tables: ${missing.mkString(", ")}" +
          " — TESTDATA.md layout changed; update graft.sources.Tables.names")
    }

    for ((table, cols) <- expected) {
      test(s"$table reader assumptions hold at $dir") {
        val schema = spark.read.parquet(s"$dir/$table.parquet").schema
        val byName = schema.fields.map(f => f.name -> f.dataType).toMap
        for ((name, ok) <- cols) {
          val got = byName.get(name)
          assert(got.isDefined,
            s"$dir/$table.parquet lost column `$name` (have: " +
              s"${schema.fieldNames.mkString(", ")}) — the driver " +
              "regenerated testdata in a new shape; update the readers " +
              "and this canary together")
          assert(ok.contains(got.get),
            s"$dir/$table.parquet column `$name` drifted to ${got.get} " +
              s"(engine handles: ${ok.mkString(" | ")}) — teach the " +
              "reader (Tables / normalizeEventTs) this encoding first, " +
              "then widen this canary")
        }
      }
    }

    test(s"events ts normalization is exact at $dir") {
      val ev = Tables.events(spark, dir)
      val tsNs = ev.schema("ts_ns").dataType
      val ts = ev.schema("ts").dataType
      assert(tsNs == LongType && ts == TimestampType,
        s"normalizeEventTs output drifted: ts_ns=$tsNs ts=$ts")
      // ts_ns must be the exact epoch-ns twin of ts (µs·1000) — the
      // invariant every downstream tie-breaker / as-of join / interval
      // endpoint relies on, and what DuckDB's epoch_ns(ts) returns
      import org.apache.spark.sql.functions.{col, expr}
      val bad = ev.filter(
        col("ts_ns") =!= expr("unix_micros(ts) * 1000L")).count()
      assert(bad == 0L,
        s"$bad events rows have ts_ns != unix_micros(ts)*1000 at $dir — " +
          "normalization no longer matches the oracle's epoch_ns")
    }
  }
}
