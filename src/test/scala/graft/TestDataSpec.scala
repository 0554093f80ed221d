package graft

import org.apache.spark.sql.types._

/** Schema-drift guard for the driver-generated parquet fixtures.
  *
  * Round 9's only real defect was discovered by the DRIVER, not this
  * suite: the regenerated `events.parquet` switched `ts` from
  * TIMESTAMP(NANOS) (read as long under `nanosAsLong`) to plain
  * `timestamp[us]`, and the unconditional nanos→micros conversion in
  * `QueriesExt.events()` crashed all five event queries. This spec makes
  * any future regeneration fail loudly in `sbt test`: every table the
  * queries read gets its expected logical schema pinned here, and each
  * timestamp-bearing column lists the full set of physical vintages the
  * reading code is written to accept.
  */
class TestDataSpec extends SparkSpec {

  private val dir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sf("sf0.01"))

  /** Accepted type sets per column; a column read as anything outside
    * its set means reader code (Queries.t / QueriesExt.events) needs a
    * new branch, so fail with the observed type in the message. */
  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val tables: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> ts),
    // events.ts: LongType is the TIMESTAMP(NANOS) vintage (readable only
    // via spark.sql.legacy.parquet.nanosAsLong), timestamp[us] reads as
    // NTZ (or TimestampType if written UTC-adjusted) — events() branches
    // on exactly this set
    "events" -> Seq(
      "event_id" -> Set(LongType), "ts" -> (ts + LongType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Seq(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> Set(IntegerType)))

  for ((table, expected) <- tables.toSeq.sortBy(_._1)) {
    test(s"$table.parquet at $dir has the expected logical schema") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$dir/$table.parquet").schema
      assert(schema.fieldNames.toSeq == expected.map(_._1),
        s"column set/order drifted: got ${schema.fieldNames.mkString(",")}")
      for ((name, accepted) <- expected) {
        val got = schema(name).dataType
        assert(accepted.contains(got),
          s"$table.$name read as $got, not in accepted " +
            s"${accepted.mkString("{", ", ", "}")} — the fixture was " +
            "regenerated with a new physical type; add a reader branch " +
            "(see QueriesExt.events for the ts precedent)")
      }
    }
  }

  test("events() normalizes ts to a timestamp whatever the vintage") {
    val ev = QueriesExt.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events().ts is ${ev.schema("ts").dataType}")
    assert(ev.filter(org.apache.spark.sql.functions.col("ts").isNotNull)
      .limit(1).count() == 1L)
  }
}
