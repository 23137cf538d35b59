package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** AQE skew-join demonstration beside q28's manual salting (VERDICT r6
  * next-round #5): at 100 TB the first answer to a skewed shuffle join is
  * Spark's own `spark.sql.adaptive.skewJoin` runtime split — salting
  * (q28 / [[Salting]]) remains the tool for skewed AGGREGATIONS and for
  * engines without AQE. This spec plants a join where one key owns ~95%
  * of the fact side, lowers the skew thresholds so the tiny local
  * fixture trips the same code path a multi-GB partition trips in
  * production, and pins both halves of the contract:
  *
  *  - the finalized adaptive plan really split the skewed partition
  *    (`SortMergeJoin(skew=true)` — OptimizeSkewedJoin marks the join it
  *    rewrote, and AQEShuffleRead shows the skewed reader), and
  *  - the result is EXACTLY the unskewed oracle (the same join computed
  *    via broadcast, where no partition-level rewrite can apply).
  *
  * Conf deltas are scoped try/finally: the shared test session leaves
  * with the defaults it came with.
  */
class AqeSkewJoinSpec extends SparkTestBase {

  import spark.implicits._

  // ~95% of fact rows carry the hot key 42; the rest spread over 96 keys
  private lazy val fact = spark.range(0, 200000)
    .select(
      when($"id" % 20 =!= 0, lit(42L)).otherwise($"id" % 97).as("k"),
      ($"id" % 1000).cast("double").as("v"))
  private lazy val dim = spark.range(0, 97)
    .select($"id".as("k"), concat(lit("dim_"), $"id").as("name"))

  test("AQE splits the skewed join partition and matches the unskewed oracle") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production defaults (factor 5, 256 MB) scaled to the fixture: the
      // hot partition is a few MB, the rest a few KB
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // partition-count assertions elsewhere don't apply here; disabling
      // coalesce keeps the skew reader the only AQE rewrite in the plan
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force the shuffle join: a broadcast dim would dodge the skew path
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val joined = fact.join(dim, "k")
        .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("total"))
      val got = joined.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

      // the FINAL adaptive plan (post-execution) must carry the skew split
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no skewed-join rewrite in the adaptive plan:\n$plan")

      // unskewed oracle: same join via broadcast (no shuffle partitions to
      // split), computed under restored-default AQE knobs via the hint
      val oracle = fact.join(broadcast(dim), "k")
        .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("total"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == oracle)
      assert(got.exists { case (name, n, _) => name == "dim_42" && n >= 190000L },
        "test premise: the hot key must dominate the fact side")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q67: the roster skew join splits the hot partition and matches the broadcast oracle") {
    // the skew split only exists in the FINAL adaptive plan, i.e. after
    // execution, and OptimizeSkewedJoin reads the LIVE session conf at
    // runtime — so this pin must collect INSIDE the conf scope (the
    // roster wrapper's production path does the same via its scoped
    // localCheckpoint; its finally would restore the thresholds before
    // a later collect ever ran)
    val saved = Relational.SkewConfs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    Relational.SkewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // sf0.01: the sf0.001 hot partition compresses to ~the threshold
      // itself (5.7k near-identical keys lz4 to a few KB) — the split
      // premise needs the hot side clearly above it
      val dir = "/root/testdata/sf0.01"
      val joined = Relational.skewJoinDemo(spark, dir).orderBy($"grp")
      val got = joined.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"q67's adaptive plan never split the skewed partition:\n${plan.take(1200)}")
      // hot key 42 lands in grp g03 (42 % 13 = 3): it must dominate
      assert(got.exists { case (g, n, _, _) =>
        g == "g03" && n > got.map(_._2).sum / 2 },
        "test premise: the hot key's group must dominate the fact side")

      // broadcast twin: no shuffle partitions exist to split, so the
      // result is the unskewed oracle
      val oracle = {
        val fact = graft.Tables(spark, dir, "lineitem").select(
          when($"l_orderkey" % 20 =!= 0, lit(42L))
            .otherwise($"l_orderkey" % 97).as("k"), $"l_quantity")
        val dim = graft.Tables(spark, dir, "customer")
          .groupBy(($"c_custkey" % 97).as("k")).agg(count(lit(1)).as("dim_n"))
          .withColumn("grp",
            concat(lit("g"), lpad(($"k" % 13).cast("string"), 2, "0")))
        fact.join(broadcast(dim), Seq("k")).groupBy($"grp")
          .agg(count(lit(1)).as("n_lines"),
            round(sum($"l_quantity".cast("decimal(18,4)")).cast("double"), 4)
              .as("sum_qty"),
            min($"dim_n").as("min_dim_n"))
          .orderBy($"grp").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
          .toSeq
      }
      assert(got == oracle)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
