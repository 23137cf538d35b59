package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The m1/m2 binary fixture contract: written once, scanned thereafter,
  * and column pruning keeps the payload bytes out of plans that don't
  * read them.
  */
class MediaFixtureSpec extends SparkTestBase {

  import spark.implicits._

  test("fixture is written once and reused on subsequent reads") {
    Multimodal.mediaTable(spark, sfDir).count() // builds if missing
    val base = new java.io.File(sfDir).getName
    val root = new java.io.File(sys.props("user.dir") + "/data", "media_" + base)
    val success = new java.io.File(root, "_SUCCESS")
    assert(success.exists())
    // self-describing staging marker: construction version + source
    // parquet size/mtime fingerprint (no Spark job to validate it)
    val marker = new java.io.File(root.getAbsolutePath + ".staged")
    assert(marker.isFile)
    val stamp = new String(java.nio.file.Files.readAllBytes(marker.toPath))
    assert(stamp.matches("v\\d+:\\d+:\\d+"), stamp)
    assert(stamp == "v3:" + Multimodal.sourceFingerprint(
      new java.io.File(sfDir, "documents.parquet")),
      s"marker $stamp must equal the recomputed source fingerprint")
    val mtime = success.lastModified()
    val n = Multimodal.mediaTable(spark, sfDir).count()
    assert(n > 0)
    assert(success.lastModified() == mtime, "second read must not rewrite")
  }

  test("doc_id-only projection prunes the payload column at the scan") {
    val plan = Multimodal.mediaTable(spark, sfDir).select($"doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"payload must be pruned from the scan:\n$plan")
    assert(!plan.contains("payload"), "payload bytes must not be read at all")
  }

  test("payloads scanned from parquet carry the renderer's dimension contract") {
    val rows = Multimodal.mediaTable(spark, sfDir)
      .select($"doc_id",
        conv(hex(substring($"payload", 17, 4)), 16, 10).cast("long").as("width"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) == 64L * (r.getLong(0) % 4 + 1)))
  }

  test("m5's aHash merges resized variants that byte hashing would split") {
    import org.apache.spark.sql.functions._
    // the perceptual claim, pinned directly: each of the 4 clusters must
    // contain the SAME pattern at >= 2 distinct pixel sizes (so exact
    // content hashing — 12 distinct payload bytes — could never produce
    // this grouping), and distinct patterns never share a hash
    val t = Multimodal.phashTable(spark, sfDir)
      .select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .collect()
    val hashed = t.map { case (id, png) =>
      (id % 4, png.length, Multimodal.aHash64(png)) }
    val byHash = hashed.groupBy(_._3)
    assert(byHash.size == 4, s"expected 4 perceptual clusters, got ${byHash.size}")
    byHash.foreach { case (h, members) =>
      assert(members.map(_._1).distinct.length == 1,
        s"hash $h merged distinct patterns")
      assert(members.map(_._2).distinct.length >= 2,
        s"hash $h holds only one payload size — resize invariance untested")
    }
    // premise: the payload BYTES genuinely differ across scales
    assert(t.map(_._2.length).distinct.length >= 3)
  }

  test("m6 video payloads are real JFIF containers, not PNG stubs") {
    // the round-10 codec upgrade's premise: every frame is a baseline
    // JPEG (SOI = FFD8) that the JVM's own codec decodes — so the m6
    // walk + hash exercises a real codec end-to-end, and the aHash
    // survives the LOSSY encode round-trip (4 clusters pinned below)
    val payloads = Multimodal.videoTable(spark, sfDir)
      .select($"payload").as[Array[Byte]].head(5)
    payloads.foreach { p =>
      assert((p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8,
        "video payload must start with a JPEG SOI marker")
      assert(!(p.take(4).sameElements(
        Array[Byte](0x89.toByte, 'P', 'N', 'G'))), "PNG stub resurfaced")
    }
  }

  test("m6 walks every frame exactly once and clusters across videos/scales") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("m6_frame_dedup")(spark, sfDir).collect()
    val nDocs = graft.Tables(spark, sfDir, "documents").count()
    val docIds = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id").as[Long].collect()
    // exactly-once container walk: cluster frame counts sum to the
    // fixture's total frame count Σ (id%5+2)
    val totalFrames = docIds.map(_ % 5 + 2).sum
    assert(got.map(_.getAs[Long]("n_frames")).sum == totalFrames,
      "frame index walk lost or duplicated frames")
    // 4 patterns → exactly 4 perceptual clusters, each spanning many
    // videos (cross-video dedup is the point) — and frames of the same
    // pattern at different scales MERGED (each pattern appears at all
    // three scales across the corpus)
    assert(got.length == 4, s"expected 4 clusters, got ${got.length}")
    got.foreach { r =>
      assert(r.getAs[Long]("n_videos") > 1, "cluster confined to one video")
      assert(r.getAs[Long]("n_videos") < nDocs + 1)
    }
  }
}
