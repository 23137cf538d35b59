package graft
import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for the named queries into
  * `<outDir>/<query>_<suffix>.txt` — the r18 optimization-round plan
  * evidence (`plans/r18/<query>_before.txt` / `_after.txt`). Loop-class
  * queries (CC, the graph family) EXECUTE their loop during query
  * construction, so their dumped plan is the post-loop tail
  * (checkpoint-scan + presentation); for those the per-round evidence
  * is the bench artifact's per-query JOB COUNTS, cited alongside the
  * tails in OPTIMIZATION_r18.md.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query> [...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qs @ _*) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("graft.eagerRelease", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    qs.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"), txt)
      println(s"[plandump] $q -> $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
