package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins e10's maintenance contract on a spec-owned staging root:
  * appended delta files arrive stats-blind (round-robin ⇒ every file's
  * footer box spans the key space, so the e9 box must read them all),
  * the maintenance pass makes the SAME rows prunable, the standing
  * z-files are never touched (byte/mtime identity — maintenance cost is
  * delta-sized), and maintenance is idempotent. Row semantics across
  * the append+maintain lifecycle are pinned by e10's DuckDB oracle (box
  * over the full base table); this spec owns the physical claims.
  */
class ZOrderMaintainSpec extends SparkTestBase {

  private val dir = sfDir

  private def snapshot(d: java.io.File): Map[String, (Long, Long)] =
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap

  private def mustRead(groups: Seq[Mixing.RowGroupStats],
                       box: (Long, Long, Long, Long)): Int =
    groups.count { g =>
      val (pMin, pMax) = g.stats("l_partkey")
      val (sMin, sMax) = g.stats("l_suppkey")
      pMax >= box._1 && pMin <= box._2 && sMax >= box._3 && sMin <= box._4
    }

  test("maintenance makes the blind delta prunable without touching a standing byte") {
    val root = java.nio.file.Files
      .createTempDirectory("zinc_spec").toFile
    Lakehouse.zincStage(spark, dir, root)
    val standing = new java.io.File(root, "standing")
    val raw = new java.io.File(root, "delta_raw")
    val standingBefore = snapshot(standing)
    val box = Mixing.e9Box(dir)
    val cols = Set("l_partkey", "l_suppkey")

    // as-arrived: every raw file's box spans the key space — the box
    // scan cannot skip any of them
    val rawGroups = Mixing.footerStats(raw, cols)
    val rawRead = mustRead(rawGroups, box)
    assert(rawRead == rawGroups.size,
      s"expected the blind delta fully read, $rawRead of ${rawGroups.size}")

    Lakehouse.zincMaintain(spark, dir, root)
    assert(!raw.isDirectory, "maintenance should retire delta_raw")
    val delta = new java.io.File(root, "delta")
    val deltaGroups = Mixing.footerStats(delta, cols)
    val deltaRead = mustRead(deltaGroups, box)
    // same rows, clustered: the box now confines to a fraction of the
    // delta's row groups
    assert(deltaRead < deltaGroups.size,
      s"maintained delta still fully read ($deltaRead/${deltaGroups.size})")
    assert(deltaRead <= deltaGroups.size / 2,
      s"maintained delta should prune at least half, read $deltaRead of ${deltaGroups.size}")
    info(s"delta must-read: raw $rawRead/${rawGroups.size} → maintained $deltaRead/${deltaGroups.size}")

    // standing untouched — maintenance cost is delta-sized by contract
    assert(snapshot(standing) == standingBefore,
      "maintenance rewrote or touched standing files")

    // idempotence: a second pass with no raw delta is a structural no-op
    val deltaBefore = snapshot(delta)
    Lakehouse.zincMaintain(spark, dir, root)
    assert(snapshot(delta) == deltaBefore, "re-maintain rewrote the delta")

    // row-content identity: standing ∪ delta ≡ the base table (the
    // lifecycle lost/duplicated nothing — checked here driver-free of
    // the oracle so the pin also holds on spec-staged roots)
    import spark.implicits._
    val rebuilt = spark.read.parquet(
      standing.getAbsolutePath, delta.getAbsolutePath)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val base = graft.Tables(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    assert(rebuilt.exceptAll(base).isEmpty && base.exceptAll(rebuilt).isEmpty,
      "standing ∪ delta diverged from the base table")
  }
}
