package graft.ingest

import scala.collection.mutable.ArrayBuffer

import graft.SparkTestBase
import graft.ingest.UploadValidation._

/** Port of the reference's tests/test_upload_limits.py:22-102 — same cases,
  * same expected byte accounting (O2/O3/O4). The reference patches
  * mb_to_bytes to the identity so limits are byte-sized; here `toBytes`
  * is a parameter for the same reason.
  */
class UploadValidationSpec extends SparkTestBase {

  private val identityMb: Int => Long = _.toLong

  private class FakeUpload(content: Array[Byte],
                           val filename: String = "document.pdf",
                           val declaredSize: Option[Long] = None) extends Upload {
    val readSizes = ArrayBuffer[Long]()
    def read(n: Long): Array[Byte] = { readSizes += n; content.take(n.toInt) }
  }

  // test_single_file_limit_is_enforced..._with_bounded_reads (py:22-44)
  test("single-file limit is enforced with a bounded read of limit+1 bytes") {
    val doc = new FakeUpload("12345".getBytes)
    val r = readAndValidateDocument(doc, maxFileMb = 4, toBytes = identityMb)
    assert(r == Left(ValidationError(413, fileTooLargeError(4))))
    assert(r.swap.exists(_.detail.contains("File size exceeds")))
    assert(doc.readSizes == Seq(5L)) // exactly limit+1 requested, never more
  }

  // test_batch_total_limit_is_enforced..._with_bounded_reads (py:46-73)
  test("batch total limit is enforced with per-file reads bounded by the remaining budget") {
    val first = new FakeUpload("123".getBytes, filename = "first.pdf")
    val second = new FakeUpload("4567".getBytes, filename = "second.pdf")
    val r = readAndValidateBatch(Seq(first, second),
      maxFileMb = 10, maxBatchMb = 6, toBytes = identityMb)
    assert(r == Left(ValidationError(413, batchTooLargeError(6))))
    assert(r.swap.exists(_.detail.contains("Batch size exceeds")))
    assert(first.readSizes == Seq(7L)) // min(perFile=10, remaining=6)+1
    assert(second.readSizes == Seq(4L)) // min(10, remaining=3)+1
  }

  // test_known_oversized_batch_is_rejected_before_any_file_is_read (py:75-91)
  test("declared-size fail-fast rejects the batch before any byte is read") {
    val docs = Seq(
      new FakeUpload("123".getBytes, declaredSize = Some(3L)),
      new FakeUpload("4567".getBytes, declaredSize = Some(4L)))
    val r = readAndValidateBatch(docs, maxFileMb = 10, maxBatchMb = 6, toBytes = identityMb)
    assert(r == Left(ValidationError(413, batchTooLargeError(6))))
    assert(docs.forall(_.readSizes.isEmpty))
  }

  // test_files_at_the_configured_limits_are_accepted (py:93-102)
  test("files exactly at the configured limits are accepted") {
    val first = new FakeUpload("123".getBytes, filename = "first.pdf")
    val second = new FakeUpload("456".getBytes, filename = "second.pdf")
    val r = readAndValidateBatch(Seq(first, second),
      maxFileMb = 3, maxBatchMb = 6, toBytes = identityMb,
      formatSupported = (_, _) => true) // reference patches is_file_format_supported
    assert(r.map(_.map { case (n, b) => (n, new String(b)) }) ==
      Right(Seq(("first.pdf", "123"), ("second.pdf", "456"))))
  }

  // Engine-side additions: the declared-size pre-check used by the
  // relational plane (failFast) and the per-file 413 on declared size.
  test("declared per-file oversize fails fast on the single-document path") {
    val doc = new FakeUpload("12".getBytes, declaredSize = Some(99L))
    val r = readDocumentWithLimit(doc, maxFileMb = 4, toBytes = identityMb)
    assert(r == Left(ValidationError(413, fileTooLargeError(4))))
    assert(doc.readSizes.isEmpty)
  }

  // Relational-plane analogs (the forms used over binaryFile listings).

  test("binaryFile source pushes the length predicate down to the scan (O2 claim)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-pushdown")
    java.nio.file.Files.write(dir.resolve("small.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("large.bin"), Array.fill[Byte](64)(1))
    val df = spark.read.format("binaryFile").load(dir.toString)
      .filter(col("length") <= 3)
    val plan = df.queryExecution.executedPlan.toString
    // the over-limit file is excluded by the scan, not by a post-read filter
    assert(plan.contains("PushedFilters") && plan.contains("length"),
      s"no length pushdown in plan:\n$plan")
    assert(df.count() == 1)
  }

  test("withFileLimit marks over-limit rows as 413 error rows, keeps the rest flowing") {
    import spark.implicits._
    val df = Seq(("a.md", mbToBytes(1)), ("big.md", mbToBytes(101)))
      .toDF("filename", "length")
    val out = withFileLimit(df, maxFileMb = 100)
      .select("filename", "error").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out("a.md").isEmpty)
    assert(out("big.md").contains(fileTooLargeError(100)))
  }

  test("withBatchAccounting 413s the first row past the running budget and all after it") {
    import spark.implicits._
    val df = Seq((0, "a", mbToBytes(200)), (1, "b", mbToBytes(200)),
      (2, "c", mbToBytes(200)), (3, "d", mbToBytes(1)))
      .toDF("idx", "filename", "length")
    val out = withBatchAccounting(df, maxFileMb = 300, maxBatchMb = 500)
      .select("idx", "running_total", "error").collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getLong(1), Option(r.getString(2))))
    assert(out.map(_._1).toSeq ==
      Seq(mbToBytes(200), mbToBytes(400), mbToBytes(600), mbToBytes(601)))
    assert(out(0)._2.isEmpty && out(1)._2.isEmpty)
    assert(out(2)._2.contains(batchTooLargeError(500)))
    assert(out(3)._2.contains(batchTooLargeError(500))) // everything after, too
  }

  test("validateBatch is all-or-nothing and reports the FIRST error in idx order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when}
    val df = Seq((0, "ok.md", 10L), (1, "bad.xyz", 10L), (2, "huge.md", mbToBytes(999)))
      .toDF("idx", "filename", "length")
    val fmt = when(col("filename").endsWith(".md"), "md")
    val r = validateBatch(df, fmt)
    // idx 1 (unsupported) precedes idx 2 (oversize): first error wins
    assert(r == Left("Unsupported file format: bad.xyz"))
    val ok = validateBatch(df.filter(col("idx") === 0), fmt)
    assert(ok.isRight)
  }

  test("failFast mirrors the declared-size pre-checks") {
    assert(failFast(Seq(Some(1L), Some(2L))).isEmpty)
    assert(failFast(Seq(Some(mbToBytes(101))), maxFileMb = 100) ==
      Some(fileTooLargeError(100)))
    assert(failFast(Seq(Some(mbToBytes(300)), Some(mbToBytes(300))),
      maxFileMb = 400, maxBatchMb = 500) == Some(batchTooLargeError(500)))
    // unknown sizes disable only the total pre-check, like the reference
    assert(failFast(Seq(Some(mbToBytes(300)), None),
      maxFileMb = 400, maxBatchMb = 500).isEmpty)
  }
}
