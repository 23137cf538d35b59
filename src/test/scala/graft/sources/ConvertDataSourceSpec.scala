package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkTestBase

/** The DSv2 conversion table: same results as Pipeline.convertDirectory,
  * registered under the `docling` short name, and — the point of the
  * connector tier — column pruning that reaches the kernel: a scan that
  * needs no converted column must never parse a byte. */
class ConvertDataSourceSpec extends SparkTestBase {

  import spark.implicits._

  private def stage(): String = {
    val dir = Files.createTempDirectory("graft-dsv2")
    Files.write(dir.resolve("a.md"), "# A\n\nAlpha.".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.csv"), "x,y\n1,2\n".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("weird.xyz"), "???".getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  test("docling short name reads a directory with pipeline-identical results") {
    val dir = stage()
    val viaSource = spark.read.format("docling").load(dir)
      .select($"filename", $"markdown", $"error")
      .collect().map(_.toSeq).toSet
    val viaPipeline = graft.Pipeline.convertDirectory(spark, dir)
      .select($"filename", $"markdown", $"error")
      .collect().map(_.toSeq).toSet
    assert(viaSource.nonEmpty)
    assert(viaSource == viaPipeline)
  }

  test("pruned scans never invoke the kernel; full scans do") {
    val dir = stage()
    val before = ConvertDataSource.kernelCalls.get()
    // filename-only projection: conversion must be skipped entirely
    val names = spark.read.format("docling").load(dir)
      .select($"filename").as[String].collect().toSet
    assert(names == Set("a.md", "b.csv", "weird.xyz"))
    assert(ConvertDataSource.kernelCalls.get() == before,
      "a filename-only scan ran the conversion kernel")

    // asking for markdown converts exactly once per file (collect, not
    // count: count prunes every column away and would skip the kernel)
    val md = spark.read.format("docling").load(dir)
      .select($"markdown").collect()
    assert(md.length == 3)
    assert(ConvertDataSource.kernelCalls.get() == before + 3,
      s"expected +3 kernel calls, got +${ConvertDataSource.kernelCalls.get() - before}")
  }

  test("input partitions bin-pack by file count and isolate oversized files") {
    val dir = Files.createTempDirectory("graft-dsv2-pack")
    (1 to 10).foreach(i =>
      Files.write(dir.resolve(f"d$i%02d.md"), s"# $i".getBytes(StandardCharsets.UTF_8)))
    val packed = spark.read.format("docling")
      .option("maxFilesPerPartition", 3).load(dir.toString)
      .rdd.getNumPartitions
    assert(packed == 4, s"ceil(10/3) partitions expected, got $packed")

    // a file above the byte target (4 MB default) gets its own partition
    Files.write(dir.resolve("zz_big.md"),
      ("# b\n\n" + "x" * (5 * 1024 * 1024)).getBytes(StandardCharsets.UTF_8))
    val isolated = spark.read.format("docling")
      .option("maxFilesPerPartition", 100).load(dir.toString)
      .rdd.getNumPartitions
    assert(isolated == 2, s"tiny pack + isolated big expected, got $isolated")
  }

  test("SQL DDL reaches the connector: CREATE TEMP VIEW ... USING docling") {
    val dir = stage()
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW inbox USING docling OPTIONS (path '$dir')")
    val got = spark.sql(
      "SELECT filename, error IS NULL AS ok FROM inbox ORDER BY filename")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(got == Seq(("a", true), ("b", true), ("weird.xyz", false)))
  }

  test("packing invariants hold on random size lists (property)") {
    val gen = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val n = gen.nextInt(40)
      val files = (0 until n).map(i => (s"f$i", gen.nextInt(1000).toLong))
      val target = 1 + gen.nextInt(2000)
      val maxFiles = 1 + gen.nextInt(8)
      val parts = ConvertDataSource.pack(files, target.toLong, maxFiles)
      // every file exactly once, input order preserved
      assert(parts.flatten == files, s"coverage/order broke: $files -> $parts")
      parts.foreach { p =>
        assert(p.nonEmpty && p.length <= maxFiles)
        // byte bound applies to multi-file partitions (each append
        // checked the running total); an oversized file is allowed only
        // as a singleton
        if (p.length > 1)
          assert(p.map(_._2).sum <= target,
            s"multi-file partition over byte target: $p target=$target")
      }
    }
  }

  test("options thread through: maxFileMb 413s oversized files in-scan") {
    val dir = Files.createTempDirectory("graft-dsv2-big")
    Files.write(dir.resolve("big.md"),
      ("# big\n\n" + "x" * (1100 * 1024)).getBytes(StandardCharsets.UTF_8))
    val r = spark.read.format("docling").option("maxFileMb", 1).load(dir.toString)
      .select($"filename", $"error").collect()
    assert(r.length == 1)
    assert(r.head.getString(1) == graft.ingest.UploadValidation.fileTooLargeError(1))
  }

  test("rows buffered across next() calls keep their own images (no buffer aliasing)") {
    // the serializer reuses its output buffer between files, so a reader
    // that hands out views would let file 2 overwrite file 1's images for
    // any consumer that buffers rows — drive the PartitionReader directly
    // and hold the first row across the second next()
    val dir = Files.createTempDirectory("graft-dsv2-imgs")
    Files.write(dir.resolve("p1.png"), graft.kernel.ImageRenderer.renderPicture(1))
    Files.write(dir.resolve("p2.png"), graft.kernel.ImageRenderer.renderPicture(2))
    val files = dir.toFile.listFiles().sortBy(_.getName)
      .map(f => (f.getAbsolutePath, f.length())).toVector
    val reader = new ConvertReader(ConvertInputPartition(files),
      ConvertDataSource.schema, Map.empty,
      spark.sessionState.newHadoopConf())
    val schema = ConvertDataSource.schema
    def imageB64(row: org.apache.spark.sql.catalyst.InternalRow): String = {
      val images = row.getArray(schema.fieldIndex("images"))
      images.getStruct(0, 3).getString(2) // the base64 payload field
    }
    assert(reader.next())
    val first = reader.get()
    val firstImage = imageB64(first)
    assert(reader.next())
    val secondImage = imageB64(reader.get())
    assert(!reader.next())
    reader.close()
    // re-reading the BUFFERED first row must still yield file 1's image,
    // byte-for-byte different from file 2's
    assert(imageB64(first) == firstImage)
    assert(firstImage != secondImage)
  }
}
