package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (schemas: /root/repo/FIXTURES.md §A).
  *
  * All queries take the scale-factor directory as a runtime parameter so the
  * driver can point the same plan at sf0.001 / 0.01 / 0.1 (or, on a real
  * cluster, at a 100 TB lake path — nothing here is local-mode specific).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is INT64 TIMESTAMP(NANOS) on disk, which Spark's parquet
    // reader rejects outright; read the raw nanos and rebuild a (µs)
    // timestamp. All fixture values are µs-aligned, so `div 1000` is exact.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}

/** One verifiable unit of engine surface: a Spark plan plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same tables.
  * Kernel / orchestration operators that cannot be expressed in SQL carry
  * `oracle = None` and are pinned by ScalaTest specs instead (SURVEY.md §5.3).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
