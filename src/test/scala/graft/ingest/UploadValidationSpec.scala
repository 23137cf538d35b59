package graft.ingest

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.UploadValidation._

/** Port of the reference's tests/test_upload_limits.py:22-102 — same cases,
  * same expected byte accounting (O2/O3/O4). The reference patches
  * mb_to_bytes to the identity so limits are byte-sized; here `toBytes`
  * is a parameter for the same reason.
  */
class UploadValidationSpec extends AnyFunSuite {

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
