package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Early-warning net for driver testdata regeneration (the round-9
  * lesson: events.parquet's `ts` layout changed between rounds and 11
  * oracle gates went dark before any test named the cause). Pins the
  * LOGICAL schema every `Tables` adapter yields over the live testdata —
  * physical layout changes the adapters absorb (EventsLayoutSpec) are
  * fine; a change that leaks into the logical schema fails here with the
  * table and column spelled out, before 100 downstream queries fail
  * obscurely.
  */
class TestdataDriftSpec extends SparkSpec {

  private def expect(df: => DataFrame, table: String, cols: (String, DataType)*): Unit = {
    val got = df.schema.map(f => f.name -> f.dataType)
    assert(got == cols.toSeq,
      s"$table logical schema drifted:\n  got      $got\n  expected ${cols.toSeq}")
  }

  private val d = sf()

  test("TPC-H-ish tables keep their logical schema") {
    expect(Tables.lineitem(spark, d), "lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      // the round-10 testdata generation stores all timestamps as
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType.
      // Queries pass NTZ straight through: comparisons against
      // TimestampType literals coerce the LITERAL side (pushdown
      // verified intact: PushedFilters shows the NTZ-typed bound), and
      // the DuckDB oracle's TIMESTAMP is itself naive. Only the events
      // adapter normalizes (its windows/session_windows need one type
      // across historic layouts).
      "l_shipdate" -> TimestampNTZType)
    expect(Tables.orders(spark, d), "orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
    expect(Tables.customer(spark, d), "customer",
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    expect(Tables.supplier(spark, d), "supplier",
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    expect(Tables.part(spark, d), "part",
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    expect(Tables.nation(spark, d), "nation",
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    expect(Tables.region(spark, d), "region",
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
  }

  test("events adapter yields the canonical logical schema over live testdata") {
    // whatever the physical ts layout of the current generation, the
    // adapter must emit TimestampType (EventsLayoutSpec pins the layouts;
    // this pins the live file)
    expect(Tables.events(spark, d), "events",
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
  }

  test("documents and embeddings keep their logical schema") {
    expect(Tables.documents(spark, d), "documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    expect(Tables.embeddings(spark, d), "embeddings",
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  }
}
