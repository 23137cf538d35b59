package graft.operators

import graft.SparkTestBase

/** Pins s16's standing binary-quantization code table:
  *
  *  - the COARSE plan reads the code table ONLY — no embeddings file in
  *    its scan set (8 bytes/vector where the float path reads 512);
  *  - staging is append-only at the file level: the corpus half's part
  *    files are byte-untouched by the batch append, and a re-run is a
  *    marker-idempotent no-op;
  *  - artifact codes ≡ inline s15 codes (same expression at ingest and
  *    query time), so the served top-k equals s15's row-for-row.
  */
class BqCodesSpec extends SparkTestBase {

  private val dir = sfDir

  test("coarse probe scans codes only; staging is append-only and idempotent; served top-k equals the inline pass") {
    import spark.implicits._

    val root = Similarity.bqCodesRoot(spark, dir)
    val codesDir = new java.io.File(root, "codes")

    // file-level snapshot after the full stage (corpus + append)
    def snapshot(): Map[String, (Long, Long)] =
      codesDir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    val after = snapshot()
    assert(after.nonEmpty, "no code part files staged")

    // idempotence: a second call touches nothing
    Similarity.bqCodesRoot(spark, dir)
    assert(snapshot() == after, "re-staging touched the code table")

    // the coarse plan's scan set: only the artifact, never embeddings
    val coarse = Similarity.bqCoarseFinalists(spark, root,
      nQueries = 10, cut = 50)
    val scanned = coarse.inputFiles.toSeq
    assert(scanned.nonEmpty)
    assert(scanned.forall(_.contains("bqcodes_")),
      s"coarse plan scanned outside the artifact: ${scanned.take(3)}")
    assert(!scanned.exists(_.contains("embeddings")),
      s"coarse plan read an embeddings file: ${scanned.take(3)}")

    // artifact codes ≡ inline codes over the full table
    val inline = graft.Tables(spark, dir, "embeddings")
      .selectExpr("vec_id",
        """aggregate(transform(sequence(0, 31), i ->
          |  IF(element_at(embedding, i + 1) >= cast(0 as float),
          |     shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
          |  cast(0 as bigint), (acc, x) -> acc + x) as c0""".stripMargin,
        """aggregate(transform(sequence(0, 31), i ->
          |  IF(element_at(embedding, i + 33) >= cast(0 as float),
          |     shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
          |  cast(0 as bigint), (acc, x) -> acc + x) as c1""".stripMargin)
    val artifact = spark.read.parquet(codesDir.getAbsolutePath)
    assert(artifact.count() == inline.count(),
      "artifact row count diverges from the table")
    assert(artifact.exceptAll(inline).isEmpty &&
      inline.exceptAll(artifact).isEmpty,
      "artifact codes diverge from inline sign-packing")

    // the served probe equals s15's inline pipeline row-for-row
    val served = Similarity.binaryQuantTopKFromCodes(spark, dir, root)
      .collect().map(_.toString).toSeq
    val inlineTopK = Similarity.binaryQuantTopK(spark, dir)
      .collect().map(_.toString).toSeq
    assert(served == inlineTopK,
      "code-table probe diverged from the inline s15 pass")
  }

  test("a crashed append is repaired, never stacked (ADVICE r15: duplicate vec_ids)") {
    import org.apache.spark.sql.functions._
    val root = Similarity.bqCodesRoot(spark, dir)
    val codesDir = new java.io.File(root, "codes")
    val total = spark.read.parquet(codesDir.getAbsolutePath).count()
    val aMarker = new java.io.File(root + ".appended")

    // crash AFTER the moves landed, BEFORE the marker write: the next
    // run must replace the orphaned append- files, not stack a second
    // copy of the batch split onto them
    java.nio.file.Files.delete(aMarker.toPath)
    Similarity.bqCodesRoot(spark, dir)
    val afterFull = spark.read.parquet(codesDir.getAbsolutePath)
    assert(afterFull.count() == total, "re-run stacked a duplicate append")

    // crash MID-MOVE: only part of the append- set landed; the repair
    // deletes the partial set and restages the whole batch split
    val appendParts = codesDir.listFiles()
      .filter(_.getName.startsWith("append-")).sorted
    assert(appendParts.nonEmpty, "append produced no append- part files")
    java.nio.file.Files.delete(appendParts.head.toPath)
    java.nio.file.Files.delete(aMarker.toPath)
    val repaired = spark.read.parquet(
      new java.io.File(Similarity.bqCodesRoot(spark, dir), "codes")
        .getAbsolutePath)
    assert(repaired.count() == total,
      "mid-move repair lost or duplicated rows")
    assert(repaired.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0,
      "code table holds duplicate vec_ids after repair")
  }
}
