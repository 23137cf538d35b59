package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins e15's purge contract on a spec-owned lifecycle root: the
  * clustered delete makes SOME files hot and the scattered delete makes
  * NONE (the threshold split is real), cold files stay byte-identical,
  * rewritten files contain exactly their survivors, the post-compact DV
  * holds only cold-file entries, the masked answer is invariant across
  * the compaction, and a second pass is a no-op. Value semantics are
  * pinned by e15's DuckDB oracle. */
class DvCompactSpec extends SparkTestBase {

  private val dir = sfDir

  test("purge rewrites exactly the hot files, spares the cold ones, and changes no answer") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("dvlc_spec").toFile
    val lay = new java.io.File(Mixing.zorderedLineitem(spark, dir))
    val dataDir = new java.io.File(root, "data")
    dataDir.mkdirs()
    lay.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(dataDir, f.getName).toPath)
    }
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    def masked(dvName: String) =
      spark.read.parquet(dataDir.getAbsolutePath)
        .withColumn("file", col("_metadata.file_path"))
        .withColumn("pos", col("_metadata.row_index"))
        .join(broadcast(spark.read.parquet(
          new java.io.File(root, dvName).getAbsolutePath)),
          Seq("file", "pos"), "left_anti")
    // two delete batches: clustered (e9 box) + scattered (%97)
    val data = spark.read.parquet(dataDir.getAbsolutePath)
      .withColumn("file", col("_metadata.file_path"))
      .withColumn("pos", col("_metadata.row_index"))
    val dv1 = new java.io.File(root, "dv1").getAbsolutePath
    data.filter($"l_partkey".between(pLo, pHi) &&
      $"l_suppkey".between(sLo, sHi)).select("file", "pos")
      .write.mode("append").parquet(dv1)
    data.filter($"l_orderkey" % 97 === 0).select("file", "pos")
      .write.mode("append").parquet(dv1)

    val before = masked("dv1").orderBy("l_orderkey", "pos")
      .drop("file", "pos").collect().map(_.toString).toSeq
    val snapshot = dataDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap

    val hot = Lakehouse.dvCompact(spark, root, 0.2)
    assert(hot.nonEmpty, "the clustered delete should make some files hot")
    assert(hot.size < snapshot.size,
      "every file rewrote — the threshold split is degenerate")

    // cold files byte-identical; hot originals gone, replaced by -rw
    val after = dataDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    val hotNames = hot.map(f => new java.io.File(f).getName).toSet
    snapshot.keys.filterNot(hotNames).foreach { n =>
      assert(after(n) == snapshot(n), s"cold file $n was touched")
    }
    hotNames.foreach { n =>
      assert(!after.contains(n), s"hot file $n survived its rewrite")
      assert(after.contains(n.stripSuffix(".parquet") + "-rw.parquet"),
        s"rewritten replacement for $n missing")
    }

    // post-compact DV references no rewritten file, and shrank
    val dv2 = spark.read.parquet(new java.io.File(root, "dv2").getAbsolutePath)
    val dv2Files = dv2.select("file").distinct().collect()
      .map(r => new java.io.File(
        r.getString(0).stripPrefix("file://").stripPrefix("file:")).getName)
    assert(dv2Files.forall(n => !hotNames.contains(n)),
      "a rewritten file still has DV entries")
    assert(dv2.count() < spark.read.parquet(dv1).distinct().count(),
      "compaction dropped no DV entries")

    // answers invariant across the purge
    val afterRows = masked("dv2").orderBy("l_orderkey", "pos")
      .drop("file", "pos").collect().map(_.toString).toSeq
    assert(afterRows.sorted == before.sorted,
      "the purge changed the masked answer")

    // idempotent: nothing hot remains against the compacted DV
    val hot2 = Lakehouse.dvCompact(spark, root, 0.2, inDv = "dv2", outDv = "dv3")
    assert(hot2.isEmpty, s"second purge rewrote ${hot2.size} files")
    info(s"purged ${hot.size}/${snapshot.size} files; " +
      s"DV ${spark.read.parquet(dv1).count()} → ${dv2.count()} entries")
  }
}
