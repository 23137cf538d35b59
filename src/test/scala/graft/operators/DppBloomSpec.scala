package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the two runtime fact-table levers q65/q66 exist to demonstrate,
  * with MEASUREMENTS, not just plan strings:
  *
  *  - q65 dynamic partition pruning: the lang-partitioned corpus scan
  *    must carry a `dynamicpruning` PartitionFilter, and at sf0.01
  *    (where source 'src14' spans only 4 of 5 languages) the scan's
  *    own metrics must show the `lang=de` partition was NEVER READ —
  *    the partition-level skip, observed from the executed plan.
  *
  *  - q66 runtime bloom filter: the executed plan must carry the
  *    `bloom_filter_agg` build and the `might_contain` probe, and the
  *    fact-side shuffle must carry a FRACTION of the rows the same
  *    join shuffles with the filter disabled — the rows-die-before-
  *    the-exchange claim, measured from shuffle-write metrics.
  *
  * Both tests run at sf0.01 (the driver SF): sf0.001's 'src14' slice
  * happens to span all 5 languages, which would make the skip count
  * vacuously zero — the q10 lesson about evidence at the verified
  * scale.
  */
class DppBloomSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  /** Flattens the executed plan across AQE boundaries (adaptive root,
    * materialized query stages, reused exchanges) so scans/exchanges
    * and their POST-EXECUTION metrics are reachable. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec        => q +: flatten(q.plan)
    case r: ReusedExchangeExec    => r +: flatten(r.child)
    case other                    => other +: other.children.flatMap(flatten)
  }

  private def shuffleRecordsWritten(p: SparkPlan): Long =
    flatten(p)
      .filter(_.getClass.getSimpleName.contains("ShuffleExchange"))
      .map(_.metrics.collectFirst {
        case (k, m) if k.toLowerCase.contains("recordswritten") => m.value
      }.getOrElse(0L))
      .sum

  test("q65: DPP subquery skips the non-qualifying lang partitions") {
    // the expected qualifying-lang set is COMPUTED from the fixture
    // (ADVICE r11: hardcoding en/es/fr/zh made the test fixture-seed-
    // dependent — a regenerated fixture could fail it, or make the skip
    // vacuous, with no code regression either way)
    val allLangs = graft.Tables(spark, dir, "documents")
      .select($"lang").distinct().collect().map(_.getString(0)).toSeq.sorted
    val expected = graft.Tables(spark, dir, "documents")
      .filter($"source" === "src14")
      .select($"lang").distinct().collect().map(_.getString(0)).toSeq.sorted
    assert(expected.size < allLangs.size,
      s"fixture premise broken: src14 spans all ${allLangs.size} langs — " +
        "the partition skip this test measures would be vacuous")

    val df = graft.SparkEntry.queries("q65_dpp_partition_prune")(spark, dir)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == expected)

    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("dynamicpruning"),
      s"q65 lost its DPP subquery:\n${plan.toString.take(800)}")

    // the measured skip: the partitioned-corpus scan read only the
    // qualifying partitions
    val scan = flatten(plan).collectFirst {
      case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("corpus_bylang")) => f
    }.getOrElse(fail("no partitioned-corpus scan in the q65 plan"))
    val nParts = scan.metrics.collectFirst {
      case (k, m) if k == "numPartitions" => m.value
    }.getOrElse(fail(s"no numPartitions metric; keys=${scan.metrics.keys}"))
    assert(nParts == expected.size.toLong,
      s"expected ${expected.size} of ${allLangs.size} lang partitions read, got $nParts")
  }

  test("e8: one plan carries BOTH the DPP subquery and the bloom probe") {
    // the lakehouse capstone's contract: partition pruning on the
    // partitioned key AND the runtime bloom filter on the unpartitioned
    // key, in the SAME executed plan over the packed layout
    val prevEager = spark.conf.getOption("graft.eagerRelease")
    spark.conf.set("graft.eagerRelease", "false")
    try {
      val df = graft.SparkEntry.queries("e8_lakehouse_scan")(spark, dir)
      val rows = df.collect()
      assert(rows.nonEmpty, "e8 premise: src3 ∩ src14-langs must be non-empty")
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning"),
        s"e8 lost the DPP subquery:\n${planStr.take(800)}")
      assert(planStr.contains("bloom_filter_agg"),
        s"e8 lost the bloom build side:\n${planStr.take(800)}")
      assert(planStr.contains("might_contain"),
        s"e8 lost the bloom probe:\n${planStr.take(800)}")
      // and the partition skip is real, same measurement as q65
      val scan = flatten(df.queryExecution.executedPlan).collectFirst {
        case f: FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("corpus_bylang")) => f
      }.getOrElse(fail("no packed-corpus scan in the e8 plan"))
      val nParts = scan.metrics.collectFirst {
        case (k, m) if k == "numPartitions" => m.value
      }.getOrElse(fail(s"no numPartitions metric; keys=${scan.metrics.keys}"))
      val allLangs = graft.Tables(spark, dir, "documents")
        .select($"lang").distinct().count()
      assert(nParts < allLangs,
        s"e8 read all $nParts partitions — DPP skipped nothing")
    } finally prevEager.fold(spark.conf.unset("graft.eagerRelease"))(
      spark.conf.set("graft.eagerRelease", _))
  }

  test("q66: bloom probe kills fact rows before the shuffle (measured)") {
    // keep the roster fn lazy so THIS test owns execution and can read
    // the executed plan's metrics afterwards (Materialize convention);
    // restore the PRE-TEST conf state, not a hardcoded value (ADVICE r12)
    val prevEager = spark.conf.getOption("graft.eagerRelease")
    spark.conf.set("graft.eagerRelease", "false")
    try {
      val df = graft.SparkEntry.queries("q66_bloom_runtime_filter")(spark, dir)
      val withBloom = df.collect()
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("bloom_filter_agg"),
        s"q66 lost the bloom build side:\n${planStr.take(800)}")
      assert(planStr.contains("might_contain"),
        s"q66 lost the bloom probe on the fact side:\n${planStr.take(800)}")
      val bloomShuffled = shuffleRecordsWritten(df.queryExecution.executedPlan)

      // the no-filter twin: same shuffle join, bloom off
      val twin = {
        val scoped = Seq(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
        val prev = scoped.map { case (k, _) => k -> spark.conf.getOption(k) }
        scoped.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val li = graft.Tables(spark, dir, "lineitem")
          val sel = graft.Tables(spark, dir, "orders")
            .filter($"o_orderpriority" === "1-URGENT" &&
              $"o_totalprice" > 400000.0)
            .select($"o_orderkey")
          val t = li.join(sel, $"l_orderkey" === $"o_orderkey")
            .groupBy($"l_returnflag")
            .agg(count(lit(1)).as("n_lines"))
            .orderBy($"l_returnflag")
          t.queryExecution.executedPlan // pin inside the scope
          t
        } finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      }
      val twinRows = twin.collect()
      assert(!twin.queryExecution.executedPlan.toString.contains("might_contain"))
      val plainShuffled = shuffleRecordsWritten(twin.queryExecution.executedPlan)

      // same join answer (bloom is a pure pre-filter) ...
      assert(withBloom.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        twinRows.map(r => (r.getString(0), r.getLong(1))).toSeq)
      // ... at a fraction of the shuffled rows: ~10% of lineitem rows
      // survive the probe at sf0.01 (1,523 of 15,000 orders qualify)
      assert(plainShuffled > 0 && bloomShuffled < plainShuffled / 2,
        s"bloom filter did not reduce the shuffle: $bloomShuffled vs $plainShuffled")
    } finally prevEager.fold(spark.conf.unset("graft.eagerRelease"))(
      spark.conf.set("graft.eagerRelease", _))
  }
}
