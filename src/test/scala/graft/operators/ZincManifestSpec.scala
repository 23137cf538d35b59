package graft.operators

import graft.SparkTestBase

/** Pins e12's manifest-lifecycle contract on a spec-owned staging root:
  * the bootstrap manifest covers exactly the live files, the maintenance
  * commit is metadata-only (standing footers never re-opened — proven by
  * running the commit with standing/ physically absent), the committed
  * manifest is identical to a from-scratch rebuild over the live tree,
  * and planning from it lands on exactly the footer-derived must-read
  * set. Row semantics across the lifecycle are pinned by e12's DuckDB
  * oracle (box over the full base table); this spec owns the physical
  * and metadata claims.
  */
class ZincManifestSpec extends SparkTestBase {

  private val dir = sfDir

  private def rows(path: java.io.File)
      : Seq[(String, Long, Long, Long, Long, Long)] =
    spark.read.parquet(path.getAbsolutePath)
      .select("file", "rows", "pmin", "pmax", "smin", "smax")
      .collect().toSeq.map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      }.sortBy(_._1)

  test("maintenance commit edits metadata only and matches a from-scratch rebuild") {
    val root = java.nio.file.Files
      .createTempDirectory("zincm_spec").toFile
    Lakehouse.zincStage(spark, dir, root)
    val v1 = Mixing.footerBoxRows(new java.io.File(root, "standing")) ++
      Mixing.footerBoxRows(new java.io.File(root, "delta_raw"))
    import spark.implicits._
    v1.toDF("file", "rows", "pmin", "pmax", "smin", "smax").coalesce(1)
      .write.parquet(new java.io.File(root, "manifest_v1").getAbsolutePath)

    Lakehouse.zincMaintain(spark, dir, root)
    Lakehouse.zincManifestCommit(spark, root)
    val v2 = rows(new java.io.File(root, "manifest_v2"))

    // no retired file survives the commit; every standing row carried
    // verbatim from v1
    assert(!v2.exists(_._1.contains("delta_raw")),
      "a retired raw-delta file survived the manifest commit")
    val standingV1 = v1.filter(_._1.contains("standing")).sortBy(_._1)
    val standingV2 = v2.filter(_._1.contains("standing"))
    assert(standingV2 == standingV1,
      "standing manifest rows changed across a commit that never touched standing files")

    // committed manifest ≡ from-scratch rebuild over the live tree
    val rebuilt =
      (Mixing.footerBoxRows(new java.io.File(root, "standing")) ++
        Mixing.footerBoxRows(new java.io.File(root, "delta"))).sortBy(_._1)
    assert(v2 == rebuilt,
      "incremental manifest commit diverged from a from-scratch rebuild")

    // the commit never consults standing/: replay it on a clone of the
    // root with standing/ REMOVED — if the commit listed or opened a
    // standing footer it would throw; instead it must produce the same
    // delta rows and carry the same standing rows from v1
    val clone = java.nio.file.Files
      .createTempDirectory("zincm_nostanding").toFile
    def copy(name: String): Unit = {
      val src = new java.io.File(root, name).toPath
      val dst = new java.io.File(clone, name).toPath
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
        java.nio.file.Files.copy(p, dst.resolve(src.relativize(p)),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copy("manifest_v1"); copy("delta")
    assert(!new java.io.File(clone, "standing").exists())
    Lakehouse.zincManifestCommit(spark, clone)
    val v2NoStanding = rows(new java.io.File(clone, "manifest_v2"))
    // identical rows modulo the delta paths now living under the clone
    def canon(rs: Seq[(String, Long, Long, Long, Long, Long)]) =
      rs.map { r => (new java.io.File(r._1).getName, r._2, r._3, r._4,
        r._5, r._6) }.sortBy(_._1)
    assert(canon(v2NoStanding) == canon(v2),
      "commit behaved differently when standing/ was absent — it must not depend on standing files")
    info(s"manifest v1 ${v1.size} rows → v2 ${v2.size} rows, " +
      s"commit re-read only ${Lakehouse.ZincDeltaFiles} delta files")
  }

  test("time travel reads the v1 snapshot until vacuum expires it; vacuum spares every live file") {
    val root = java.nio.file.Files
      .createTempDirectory("zincm_vac").toFile
    Lakehouse.zincStage(spark, dir, root)
    import spark.implicits._
    Mixing.footerBoxRows(new java.io.File(root, "standing"))
      .++(Mixing.footerBoxRows(new java.io.File(root, "delta_raw")))
      .toDF("file", "rows", "pmin", "pmax", "smin", "smax").coalesce(1)
      .write.parquet(new java.io.File(root, "manifest_v1").getAbsolutePath)
    Lakehouse.zincMaintain(spark, dir, root, retainRaw = true)
    Lakehouse.zincManifestCommit(spark, root)

    def planAll(manifest: String): Seq[String] =
      spark.read.parquet(new java.io.File(root, manifest).getAbsolutePath)
        .select("file").collect().map(_.getString(0)).toSeq.sorted
    def total(files: Seq[String]): Long =
      spark.read.parquet(files: _*).count()

    // before vacuum: BOTH snapshots are readable and row-identical
    // (maintenance only re-clusters)
    val v1Files = planAll("manifest_v1")
    val v2Files = planAll("manifest_v2")
    assert(v1Files.forall(f => new java.io.File(f).isFile),
      "a v1-referenced file is already missing before vacuum")
    val v1Rows = total(v1Files)
    assert(v1Rows == total(v2Files),
      "v1 snapshot and live read disagree on row count")

    // retention window first (r13 ADVICE/ask #7): the snapshot was
    // committed seconds ago — a reader could still be mid-flight on it,
    // so a retention-gated vacuum must spare EVERYTHING
    Lakehouse.zincVacuum(spark, root, retentionMs = 60L * 60 * 1000)
    assert(v1Files.forall(f => new java.io.File(f).isFile),
      "retention-gated vacuum deleted a too-young snapshot's file")
    assert(new java.io.File(root, "manifest_v1").isDirectory,
      "retention-gated vacuum expired a too-young manifest")
    assert(v1Rows == total(v1Files),
      "the young snapshot no longer answers after the gated vacuum")

    Lakehouse.zincVacuum(spark, root)

    // after: every live file intact (live scan byte-identical), every
    // unreferenced file gone, the expired manifest gone
    assert(v2Files.forall(f => new java.io.File(f).isFile),
      "vacuum deleted a file the live manifest references")
    assert(total(v2Files) == v1Rows, "live read changed across vacuum")
    val retired = v1Files.toSet -- v2Files.toSet
    assert(retired.nonEmpty && retired.forall(f => !new java.io.File(f).exists()),
      "vacuum left an unreferenced data file behind")
    assert(!new java.io.File(root, "manifest_v1").exists(),
      "vacuum left the expired manifest readable")
    // structurally idempotent
    Lakehouse.zincVacuum(spark, root)
    assert(v2Files.forall(f => new java.io.File(f).isFile))
    info(s"vacuum expired ${retired.size} retired files; " +
      s"${v2Files.size} live files untouched")
  }

  test("e13's staged snapshot answers identically to the live e12 read") {
    val e13 = Mixing.specs.find(_.name == "e13_time_travel_scan").get
      .fn(spark, dir).collect().map(_.toString).toSeq
    val e12 = Mixing.specs.find(_.name == "e12_manifest_lifecycle_scan").get
      .fn(spark, dir).collect().map(_.toString).toSeq
    assert(e13 == e12, "time-travel result diverged from the live read")
  }

  test("e12's planning lands on the footer-derived must-read set and answers like e10") {
    val root = new java.io.File(Lakehouse.zincManifestRoot(spark, dir))
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    val cols = Set("l_partkey", "l_suppkey")
    val live = Mixing.footerStats(new java.io.File(root, "standing"), cols) ++
      Mixing.footerStats(new java.io.File(root, "delta"), cols)
    val expected = live.filter { g =>
      val (pMin, pMax) = g.stats("l_partkey")
      val (sMin, sMax) = g.stats("l_suppkey")
      pMax >= pLo && pMin <= pHi && sMax >= sLo && sMin <= sHi
    }.map(_.file).distinct.sorted
    import spark.implicits._
    val planned = spark.read.parquet(
      new java.io.File(root, "manifest_v2").getAbsolutePath)
      .filter($"pmax" >= pLo && $"pmin" <= pHi &&
        $"smax" >= sLo && $"smin" <= sHi)
      .select($"file").as[String].collect().toSeq.sorted
    assert(planned == expected,
      s"manifest planned ${planned.size} files, footers say ${expected.size}")
    assert(planned.size < live.map(_.file).distinct.size,
      "manifest planning pruned nothing — the layout or box is degenerate")
    val e12 = Mixing.specs.find(_.name == "e12_manifest_lifecycle_scan").get
      .fn(spark, dir).collect().map(_.toString).toSeq
    val e10 = Mixing.specs.find(_.name == "e10_zorder_maintain").get
      .fn(spark, dir).collect().map(_.toString).toSeq
    assert(e12 == e10, "manifest-lifecycle result diverged from the directory-listed scan")
  }
}
