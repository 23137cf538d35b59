package graft.streaming

import graft.SparkTestBase
import graft.operators.{Lakehouse, Mixing}

/** Pins st18's physical contract: the catch-up run really commits per
  * micro-batch (≥2 data batches), the assembled manifest log equals a
  * from-scratch rebuild over the files it created, the standing layout
  * is byte-untouched, and the manifest-planned answer matches e10's
  * directory-listed scan of the equivalent table. Value semantics are
  * pinned by st18's DuckDB oracle (the e9 box over the full base
  * table). */
class ManifestIngestStreamSpec extends SparkTestBase {

  private val dir = sfDir

  test("per-trigger commits assemble a manifest equal to a rebuild; standing untouched") {
    val standing = new java.io.File(
      new java.io.File(Lakehouse.zincManifestRoot(spark, dir)), "standing")
    val before = standing.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap

    val result = StreamQueries.manifestIngestCatchUp(spark, dir)
      .collect().map(_.toString).toSeq

    val dataBatches = StreamQueries.lastRunProgress
      .count(p => p.numInputRows > 0)
    assert(dataBatches >= 2,
      s"expected >=2 data micro-batches, saw $dataBatches")

    val after = standing.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    assert(after == before, "the ingest stream touched the standing layout")

    // manifest log ≡ from-scratch rebuild over standing + streamed delta
    val runDir = new java.io.File(StreamQueries.lastIngestRunDir)
    val logged = spark.read.parquet(
      new java.io.File(runDir, "manifest").getAbsolutePath)
      .select("file", "rows", "pmin", "pmax", "smin", "smax")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    val rebuilt = (Mixing.footerBoxRows(standing) ++
      Mixing.footerBoxRows(new java.io.File(runDir, "delta"))).sortBy(_._1)
    assert(logged == rebuilt,
      "assembled manifest log diverged from a from-scratch rebuild")
    // delta commits really carry multiple batches' files
    val deltaFiles = new java.io.File(runDir, "delta").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(deltaFiles >= dataBatches,
      s"expected >= $dataBatches delta files, found $deltaFiles")

    // answer parity with the directory-listed lifecycle scan (e10:
    // same 80/20 split, same box, listing instead of manifest)
    val e10 = Mixing.specs.find(_.name == "e10_zorder_maintain").get
      .fn(spark, dir).collect().map(_.toString).toSeq
    assert(result == e10,
      "manifest-planned streamed table diverged from the directory-listed scan")
    info(s"$dataBatches data batches, $deltaFiles delta files, " +
      s"${logged.size} manifest rows")
  }
}
