package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (builder brief: "salting for skew").
  *
  * A hot grouping/join key concentrates its rows in one task; salting
  * spreads them over `salts` subkeys so no single task owns the hot key.
  *
  *  - [[saltedAgg]]: two-phase aggregation — partial agg on (key, salt),
  *    final agg on key. Each phase is a balanced shuffle; results are
  *    identical to the direct agg for any decomposable aggregate.
  *  - [[saltedJoin]]: replicate the (small) build side once per salt and
  *    join on (key, salt) — the classic skew-join rewrite when the probe
  *    side has hot keys but the build side is replicable.
  *
  * (AQE's skewedJoin covers sort-merge skew automatically at runtime;
  * these are the explicit forms for when the planner can't see the skew —
  * e.g. aggregation skew, or keys hot by construction.)
  */
object Salting {

  /** Balanced count/sum aggregation over a skewed key: partial on
    * (key, salt) then final on key. `aggs` must be decomposable
    * (sum/count/min/max); pass partial and final forms. */
  def saltedCountSum(df: DataFrame, key: Column, valueCol: Column,
                     salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(valueCol).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"))
  }

  /** Skew-safe equi-join: the probe side gets a random-ish salt, the
    * build side replicates across all salts, join on (key, salt). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
