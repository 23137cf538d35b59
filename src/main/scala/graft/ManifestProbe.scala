package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: the manifest plane's SCALING numbers. For a fixture dir,
  * stages the e12/e13 lifecycle root (write-once) and times, warm:
  *   plan_manifest — file list from manifest_v2 (one tiny parquet read)
  *   plan_footers  — the same must-read set derived by opening every
  *                   live data-file footer (what e9/e10 planning costs
  *                   without a manifest: one GET per file at lake scale)
  *   commit        — zincManifestCommit re-run (reads v1 + delta
  *                   footers only; ∝ batch)
  * Usage: `sbt "runMain graft.ManifestProbe [sfDir] [iters]"`. */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Lakehouse, Mixing}

    val t0 = System.nanoTime()
    val root = new java.io.File(Lakehouse.zincManifestRoot(spark, sfDir))
    println(f"stage_or_check: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(sfDir)
    val cols = Set("l_partkey", "l_suppkey")
    val live = Seq("standing", "delta").map(new java.io.File(root, _))
    def liveFiles: Int = live.map(d =>
      d.listFiles().count(_.getName.endsWith(".parquet"))).sum

    def time(label: String)(f: => Any): Unit = {
      val walls = (1 to iters).map { _ =>
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
      }
      println(f"$label: min ${walls.min}%.3f s over $iters iters")
    }

    import spark.implicits._
    time("plan_manifest") {
      spark.read.parquet(
        new java.io.File(root, "manifest_v2").getAbsolutePath)
        .filter($"pmax" >= pLo && $"pmin" <= pHi &&
          $"smax" >= sLo && $"smin" <= sHi)
        .select($"file").as[String].collect()
    }
    time("plan_footers") {
      live.flatMap(d => Mixing.footerStats(d, cols)).filter { g =>
        val (pMin, pMax) = g.stats("l_partkey")
        val (sMin, sMax) = g.stats("l_suppkey")
        pMax >= pLo && pMin <= pHi && sMax >= sLo && sMin <= sHi
      }.map(_.file).distinct
    }
    time("commit") { Lakehouse.zincManifestCommit(spark, root) }
    println(s"live data files: $liveFiles; delta files: ${Lakehouse.ZincDeltaFiles}")
    spark.stop()
  }
}
