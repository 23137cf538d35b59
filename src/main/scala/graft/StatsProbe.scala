package graft

/** Dev probe for the r13 localCheckpoint stats-blowup class
  * (SCALING.md round 13): for each named query, run its roster fn and
  * print the DIGIT COUNT of the final plan's `stats.sizeInBytes`. A
  * healthy plan's estimate has ~2-15 digits; a loop that compounds
  * preserved checkpoint stats multiplicatively shows hundreds to
  * millions of digits — the driver then burns CPU in BigInteger
  * multiplication under SizeInBytesOnlyStatsPlanVisitor while
  * executors idle (observed 700+ driver CPU-seconds planning d27 at
  * sf1 before the connectedComponents rebase fix). The probe walks
  * EVERY node's stats, not just the root, because the compounded
  * LogicalRDD can sit under a cheap final projection whose own
  * estimate never multiplies it further.
  *
  * `runMain graft.StatsProbe [sfDir] [query ...]` — defaults to the
  * iterative-loop queries (graph family + the CC/keeper/k-means rows).
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("g1_pagerank_trade_graph", "g3_bfs_hops", "g4_weighted_paths",
        "g5_kcore_peel", "g6_label_propagation", "g7_hits_trade_graph",
        "d7_dedup_clusters", "d8_semantic_clusters", "d23_semdedup_keeper",
        "d27_auto_semdedup_keeper", "s11_kmeans_train",
        "q1_agg_pushdown" /* control: non-iterative */ )
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("graft-stats-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val qs = SparkEntry.queries
      for (n <- names) qs.get(n) match {
        case None => println(f"$n%-28s MISSING")
        case Some(fn) =>
          val df = fn(spark, dir)
          df.limit(1).count() // force execution so checkpoints materialize
          val plan = df.queryExecution.optimizedPlan
          var maxDigits = 0
          plan.foreach { node =>
            val d = node.stats.sizeInBytes.toString.length
            if (d > maxDigits) maxDigits = d
          }
          println(f"$n%-28s maxSizeInBytesDigits=$maxDigits")
      }
    } finally spark.stop()
  }
}
