package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE registered query (same noop-sink methodology as
  * [[Bench]]) without paying the full 61-query sweep — for plan/perf
  * iteration on a single operator. Usage:
  * `sbt "runMain graft.TimeOne <query> [sfDir] [iters]"`. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench: scan footers + one shuffle
    Tables.names.foreach { t =>
      Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.err.println(f"[timeone] $name iter $i: $dt%.2f s")
    }
    spark.stop()
  }
}
