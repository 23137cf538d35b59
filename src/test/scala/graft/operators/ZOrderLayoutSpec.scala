package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins e9's PHYSICAL claim — that the staged z-clustered layout
  * ([[Mixing.writeZorderedLineitem]]) turns a 2-D box predicate into
  * footer-stats row-group skipping a 1-D sorted layout cannot match.
  * ZOrderSpec pins the KEY's locality abstractly (bucket counts on a
  * synthetic grid); this spec measures the real artifact: it stages the
  * z layout and a partkey-sorted layout at the same file count, reads
  * both sets of parquet footers ([[Mixing.footerStats]] — the exact
  * metadata a stats-pruning scan consults), and counts the row groups
  * whose (partkey, suppkey) min/max boxes intersect the query box,
  * i.e. the row groups a scan MUST read. At fixture scale each file is
  * one row group, so file-level and row-group-level skipping coincide.
  */
class ZOrderLayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = sfDir
  private val Files = 64

  private lazy val (zGroups, linGroups) = {
    val tmp = java.nio.file.Files
      .createTempDirectory("zorder_layout_spec").toFile
    val zOut = new java.io.File(tmp, "z").getAbsolutePath
    val linOut = new java.io.File(tmp, "lin").getAbsolutePath
    Mixing.writeZorderedLineitem(spark, dir, zOut, Files)
    // the 1-D alternative a naive pipeline writes: same file count,
    // range-clustered and sorted on the leading key only
    graft.Tables(spark, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey")
      .repartitionByRange(Files, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(linOut)
    val cols = Set("l_partkey", "l_suppkey")
    (Mixing.footerStats(new java.io.File(zOut), cols),
      Mixing.footerStats(new java.io.File(linOut), cols))
  }

  /** Row groups whose stats box intersects [pLo,pHi]×[sLo,sHi] — the
    * ones min/max pruning cannot skip. */
  private def mustRead(groups: Seq[Mixing.RowGroupStats],
                       pLo: Long, pHi: Long, sLo: Long, sHi: Long): Int =
    groups.count { g =>
      val (pMin, pMax) = g.stats("l_partkey")
      val (sMin, sMax) = g.stats("l_suppkey")
      pMax >= pLo && pMin <= pHi && sMax >= sLo && sMin <= sHi
    }

  test("2-D box: z layout's footer stats skip more row groups than the 1-D sort's") {
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    val z = mustRead(zGroups, pLo, pHi, sLo, sHi)
    val lin = mustRead(linGroups, pLo, pHi, sLo, sHi)
    // quarter×quarter box over an ~8×8 z tiling reads ~3×3 tiles; the
    // partkey sort reads every file in the partkey quarter (~16+) since
    // suppkey stats are uninformative. Pin the direction with margin
    // and that z pruning is real (reads well under half the groups).
    assert(z < lin, s"z layout read $z groups, 1-D sort $lin")
    assert(z <= zGroups.size / 2,
      s"z layout read $z of ${zGroups.size} groups — stats boxes not tight")
    info(s"2-D box: z reads $z/${zGroups.size}, linear reads $lin/${linGroups.size}")
  }

  test("trailing-dim-only range: the 1-D sort prunes nothing, the z layout halves the scan") {
    // the layout's reason to exist: a predicate on the NON-leading key.
    // suppkey quarter [2/8, 4/8] of the global range; partkey
    // unconstrained.
    val keys = Set("l_suppkey")
    val all = Mixing.footerStats(
      new java.io.File(dir, "lineitem.parquet"), keys)
    val (sMin, sMax) = all.map(_.stats("l_suppkey")).reduce { (a, b) =>
      (math.min(a._1, b._1), math.max(a._2, b._2))
    }
    val (sLo, sHi) =
      (sMin + 2 * (sMax - sMin) / 8, sMin + 4 * (sMax - sMin) / 8)
    def mustReadS(groups: Seq[Mixing.RowGroupStats]): Int =
      groups.count { g =>
        val (mn, mx) = g.stats("l_suppkey")
        mx >= sLo && mn <= sHi
      }
    val z = mustReadS(zGroups)
    val lin = mustReadS(linGroups)
    assert(lin == linGroups.size,
      s"partkey-sorted files should all span the suppkey range, $lin of ${linGroups.size} overlap")
    assert(z <= zGroups.size / 2,
      s"z layout should confine a suppkey quarter to ≤ half the row groups, read $z of ${zGroups.size}")
    info(s"suppkey-only: z reads $z/${zGroups.size}, linear reads $lin/${linGroups.size}")
  }

  test("e11's manifest planning lands on exactly the footer-derived must-read file set") {
    val man = Mixing.zorderManifest(spark, dir)
    val lay = new java.io.File(
      new java.io.File(man).getParentFile,
      "li_zorder_" + new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9._-]", "_"))
    val cols = Set("l_partkey", "l_suppkey")
    val groups = Mixing.footerStats(lay, cols)
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    // per-FILE must-read set straight from the footers (a file is read
    // iff any of its row groups overlaps the box)
    val expected = groups.filter { g =>
      val (pMin, pMax) = g.stats("l_partkey")
      val (sMin, sMax) = g.stats("l_suppkey")
      pMax >= pLo && pMin <= pHi && sMax >= sLo && sMin <= sHi
    }.map(_.file).distinct.sorted
    import spark.implicits._
    val planned = spark.read.parquet(man)
      .filter($"pmax" >= pLo && $"pmin" <= pHi &&
        $"smax" >= sLo && $"smin" <= sHi)
      .select($"file").as[String].collect().toSeq.sorted
    assert(planned == expected,
      s"manifest planned ${planned.size} files, footers say ${expected.size}")
    assert(planned.size < groups.map(_.file).distinct.size,
      "manifest planning pruned nothing — the layout or box is degenerate")
    // and the planned scan answers identically to the full staged scan
    val e11 = Mixing.specs.find(_.name == "e11_manifest_planned_scan").get
      .fn(spark, dir).collect().map(_.toString).toSeq
    val e9 = Mixing.specs.find(_.name == "e9_zorder_pruned_scan").get
      .fn(spark, dir).collect().map(_.toString).toSeq
    assert(e11 == e9, "manifest-planned result diverged from the full scan")
  }

  test("e9's box bounds reach the staged scan as pushed parquet filters") {
    val df = Mixing.specs.find(_.name == "e9_zorder_pruned_scan").get
      .fn(spark, dir)
    // the scan node's metadata map, not the rendered plan string — the
    // latter truncates the PushedFilters list. Flattened across the AQE
    // root (DppBloomSpec's traversal).
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val pushed = flatten(df.queryExecution.executedPlan).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata("PushedFilters")
    }.getOrElse(fail("no FileSourceScanExec in the e9 plan"))
    Seq("GreaterThanOrEqual(l_partkey", "LessThanOrEqual(l_partkey",
      "GreaterThanOrEqual(l_suppkey", "LessThanOrEqual(l_suppkey")
      .foreach(m => assert(pushed.contains(m),
        s"expected $m in the scan's pushed filters: $pushed"))
    ()
  }
}
