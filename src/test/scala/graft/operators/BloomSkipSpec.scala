package graft.operators

import graft.SparkTestBase

/** Pins e21's bloom-manifest file skipping against ground truth:
  *
  *  - NO FALSE NEGATIVES: every file that truly contains a needle row
  *    is in the opened set (a miss here silently drops rows — e21's
  *    oracle catches it by value, this pins it structurally),
  *  - genuine skipping with bounded false positives: the opened set is
  *    a strict subset of the layout with at most a small FP slack over
  *    the truly-containing files (1% FPP sizing),
  *  - the motivation is real: footer min/max on l_orderkey prunes
  *    (almost) nothing for the same needles over the z-clustered
  *    layout — the boxes span the key domain, the blooms don't.
  */
class BloomSkipSpec extends SparkTestBase {

  private val dir = sfDir

  test("opened files cover exactly the needle-bearing files, with bounded FP slack; min/max would not skip") {
    import spark.implicits._
    val needles = Lakehouse.bloomNeedles(spark, dir)
    assert(needles.size == 3 && needles.distinct.size == 3)

    val manifest = spark.read.parquet(new java.io.File(
        Lakehouse.bloomManifestRoot(spark, dir), "manifest").getAbsolutePath)
      .as[(String, Array[Byte])].collect()
    val opened = manifest.filter { case (_, bytes) =>
      val bf = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      needles.exists(bf.mightContainLong)
    }.map(_._1).toSet

    // ground truth: which files actually hold a needle row
    val zroot = new java.io.File(Lakehouse.zincManifestRoot(spark, dir))
    val all = spark.read.parquet(
        new java.io.File(zroot, "standing").getAbsolutePath,
        new java.io.File(zroot, "delta").getAbsolutePath)
      .select(
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.col("_metadata.file_path"),
          "^file:/+", "/").as("file"),
        $"l_orderkey")
    val truly = all.filter($"l_orderkey".isin(needles: _*))
      .select("file").distinct().as[String].collect().toSet

    assert(truly.subsetOf(opened),
      s"bloom skipped a needle-bearing file: ${truly.diff(opened)}")
    assert(opened.size <= truly.size + 3,
      s"false positives exceed slack: ${opened.size} opened, ${truly.size} true")
    assert(opened.size < manifest.length,
      s"no skipping: ${opened.size}/${manifest.length}")

    // min/max futility on the same needles: count files whose footer
    // l_orderkey range covers ANY needle — near-total on this layout
    val boxes = Mixing.footerStats(new java.io.File(zroot, "standing"),
        Set("l_orderkey")) ++
      Mixing.footerStats(new java.io.File(zroot, "delta"), Set("l_orderkey"))
    val byFile = boxes.groupBy(_.file).map { case (f, gs) =>
      val lo = gs.map(_.stats("l_orderkey")._1).min
      val hi = gs.map(_.stats("l_orderkey")._2).max
      (f, lo, hi)
    }
    val minmaxOpens = byFile.count { case (_, lo, hi) =>
      needles.exists(n => n >= lo && n <= hi)
    }
    assert(minmaxOpens > opened.size,
      s"min/max ($minmaxOpens files) should prune less than blooms (${opened.size})")
    info(s"layout ${manifest.length} files: blooms open ${opened.size} " +
      s"(${truly.size} truly contain needles), min/max would open $minmaxOpens")
  }
}
