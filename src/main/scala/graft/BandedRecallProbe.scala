package graft
import org.apache.spark.sql.SparkSession

/** Dev tool (SCALING.md's d24 recall ladder): measure the banded edge
  * source's recall against the exact d5 graph at a given fixture dir —
  * the BandedSemanticDedupSpec floors extended to scales where running
  * the exact O(n²) verifier inside `sbt test` would be unreasonable.
  * `runMain graft.BandedRecallProbe <sfDir> [threshold]` uses the SAME
  * auto-sizing the 100 TB path uses ([[operators.Dedup.bandedCosinePairsAuto]]),
  * so what it measures is the production shape's recall, not the roster
  * pin's. Prints exact/banded/candidate counts and recall. */
object BandedRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = operators.Dedup.cosinePairs(spark, dir, threshold)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (bandedDf, bands, r) =
      operators.Dedup.bandedCosinePairsAuto(spark, dir, threshold)
    val banded = bandedDf.select("a_id", "b_id").collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    val hit = banded.intersect(exact).size
    val phantom = banded -- exact
    println(f"[recallprobe] $dir t=$threshold auto=($bands bands x r=$r): " +
      f"exact=${exact.size} banded=${banded.size} recall=$hit/${exact.size}" +
      f" = ${if (exact.nonEmpty) 100.0 * hit / exact.size else 100.0}%.1f%%" +
      f" phantom=${phantom.size}")
    spark.stop()
  }
}
