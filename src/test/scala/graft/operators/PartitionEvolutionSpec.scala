package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins e24's partition-spec evolution: the staged layout's two eras
  * are total and disjoint (every base row lands in exactly one spec's
  * files), pruning is spec-local (a range inside the evolved era opens
  * ZERO old-spec files), the evolution's payoff is real (the boundary
  * year opens whole under spec-0 but only the in-range months under
  * spec-1), and the spec-aware planned read answers exactly like a
  * direct base-table filter. */
class PartitionEvolutionSpec extends SparkTestBase {

  private val dir = sfDir

  test("eras are total and disjoint; each file's manifest tuple matches its rows") {
    import spark.implicits._
    val root = new java.io.File(Lakehouse.partitionSpecRoot(spark, dir))
    val sy = Lakehouse.pspecSplitYear(spark, dir)
    val m = spark.read.parquet(
      new java.io.File(root, "manifest").getAbsolutePath)
      .as[(String, Int, Int, Int)].collect().toSeq

    // spec locality of the tuples themselves
    assert(m.filter(_._2 == 0).forall(_._3 < sy),
      "a spec-0 file claims a post-split year")
    assert(m.filter(_._2 == 1).forall(_._3 >= sy),
      "a spec-1 file claims a pre-split year")
    assert(m.filter(_._2 == 0).forall(_._4 == -1),
      "spec-0 has no month transform; its manifest month must be -1")

    // totality: the union of all manifest files is the base table
    val total = spark.read.parquet(m.map(_._1): _*).count()
    val base = graft.Tables(spark, dir, "lineitem").count()
    assert(total == base, s"eras lost/duplicated rows: $total vs $base")

    // each file really holds only its claimed (year[, month])
    val sample = m.filter(_._2 == 0).take(2) ++ m.filter(_._2 == 1).take(2)
    sample.foreach { case (f, spec, y, mo) =>
      val bad = spark.read.parquet(f).filter(
        if (spec == 0) year($"l_shipdate") =!= y
        else year($"l_shipdate") =!= y || month($"l_shipdate") =!= mo)
        .count()
      assert(bad == 0, s"$f holds rows outside its partition tuple")
    }
  }

  test("a range inside the evolved era opens zero spec-0 files and only its months; values match the base table") {
    import spark.implicits._
    val root = new java.io.File(Lakehouse.partitionSpecRoot(spark, dir))
    val sy = Lakehouse.pspecSplitYear(spark, dir)
    val m = spark.read.parquet(
      new java.io.File(root, "manifest").getAbsolutePath)
    // Jun 1 .. Sep 1 of the split year — entirely era-1
    val loYm = sy * 100 + 6
    val hiYm = sy * 100 + 8
    val open = m.filter(
        ($"spec" === 0 && $"p_y".between(sy, sy)) ||
        ($"spec" === 1 && ($"p_y" * 100 + $"p_m").between(loYm, hiYm)))
      .select($"file", $"spec").as[(String, Int)].collect().toSeq
    assert(open.nonEmpty && open.forall(_._2 == 1),
      "an era-1-only range opened spec-0 files")
    val months = m.filter($"spec" === 1 &&
        ($"p_y" * 100 + $"p_m").between(loYm, hiYm))
      .select($"p_y", $"p_m").distinct().count()
    assert(months == 3, s"expected 3 month partitions, got $months")

    val got = spark.read.parquet(open.map(_._1).sorted: _*)
      .filter($"l_shipdate" >= to_timestamp(lit(s"$sy-06-01 00:00:00")) &&
        $"l_shipdate" < to_timestamp(lit(s"$sy-09-01 00:00:00")))
      .transform(Mixing.flagAgg).collect().map(_.toString).toSeq
    val want = graft.Tables(spark, dir, "lineitem")
      .filter($"l_shipdate" >= to_timestamp(lit(s"$sy-06-01 00:00:00")) &&
        $"l_shipdate" < to_timestamp(lit(s"$sy-09-01 00:00:00")))
      .transform(Mixing.flagAgg).collect().map(_.toString).toSeq
    assert(got == want, "spec-aware planned read diverged from base table")
  }

  test("the evolution's payoff: the boundary year opens 12/12 under spec-0 grain but 3/12 months under spec-1") {
    import spark.implicits._
    val root = new java.io.File(Lakehouse.partitionSpecRoot(spark, dir))
    val sy = Lakehouse.pspecSplitYear(spark, dir)
    val m = spark.read.parquet(
      new java.io.File(root, "manifest").getAbsolutePath)
    // e24's straddling range: Oct (sy-1) .. Mar (sy)
    val loYm = (sy - 1) * 100 + 10
    val hiYm = sy * 100 + 3
    // spec-0 cannot subset its boundary year: the year's files open
    // whole, dragging in months Jan..Sep that carry no matching rows
    val spec0Files = m.filter($"spec" === 0 && $"p_y" === (sy - 1))
      .select($"file").as[String].collect().toSeq
    assert(spec0Files.nonEmpty, "boundary year has no spec-0 files")
    val monthsRead = spark.read.parquet(spec0Files: _*)
      .select(month($"l_shipdate")).distinct().count()
    val monthsMatching = spark.read.parquet(spec0Files: _*)
      .filter($"l_shipdate" >= to_timestamp(lit(s"${sy - 1}-10-01 00:00:00")))
      .select(month($"l_shipdate")).distinct().count()
    assert(monthsRead >= 11 && monthsMatching == 3,
      s"spec-0 should drag ~12 months through the scan for 3 matching, " +
        s"got $monthsRead read / $monthsMatching matching")
    // spec-1 opens exactly the in-range months of its boundary year
    val spec1Months = m.filter($"spec" === 1 &&
        ($"p_y" * 100 + $"p_m").between(loYm, hiYm))
      .select($"p_m").distinct().as[Int].collect().toSet
    assert(spec1Months == Set(1, 2, 3),
      s"spec-1 should open Jan-Mar of the split year, got $spec1Months")
    val spec1YearMonths = m.filter($"spec" === 1 && $"p_y" === sy)
      .select($"p_m").distinct().count()
    assert(spec1YearMonths >= 11,
      s"split year should carry ~12 month partitions, got $spec1YearMonths")
  }
}
