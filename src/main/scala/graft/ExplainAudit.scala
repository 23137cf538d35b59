package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the join/exchange/scan skeleton of each
  * registered query's physical plan, for the per-round scale review
  * (is the small side broadcast? are scans column-pruned? where are the
  * shuffles?). `runMain graft.ExplainAudit [sfDir] [query ...]` — with no
  * query args, audits every registered query. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // audit the FULL pipeline plan, not the checkpoint-scan tail the
      // eager persist-release path exposes (see Materialize scaladoc —
      // same escape hatch PlanAuditSpec uses)
      .config("graft.eagerRelease", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q =====")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
        l.contains("PushedFilters") || l.contains("WholeStageCodegen") || l.contains("Broadcast"))
        .take(25).mkString("\n"))
    }
    spark.stop()
  }
}
