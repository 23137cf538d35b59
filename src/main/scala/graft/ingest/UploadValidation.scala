package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upload size-limit predicates and batch accounting (reference:
  * document_converter/upload_validation.py).
  *
  * The reference enforces limits imperatively while reading an HTTP stream;
  * the engine enforces the same accounting relationally over a listing /
  * binary DataFrame with (filename, length[, content]) columns:
  *
  *  - per-file cap  → `length > maxFileBytes`  ⇒ 413 error row
  *    (upload_validation.py:42-64 bounded read — on the Spark side the
  *    binaryFile source pushes a `length` filter down to the listing, so
  *    over-limit files are never read, same never-buffer guarantee);
  *  - declared-size fail-fast (py:80-85) → statistics pre-check on the
  *    file listing, before any content scan;
  *  - batch running total (py:77-98) → cumulative-sum window in upload
  *    order, files after the budget point ⇒ 413;
  *  - batch validation is all-or-nothing (py:94-96): any invalid file
  *    fails the whole batch.
  */
object UploadValidation {

  val DefaultMaxFileMb = 100
  val DefaultMaxBatchMb = 500

  def mbToBytes(mb: Int): Long = mb.toLong * 1024 * 1024

  /** Driver-side upload surface — the reference's UploadFile: a bounded
    * read plus an optional client-declared size (upload_validation.py:42). */
  trait Upload {
    def filename: String
    def declaredSize: Option[Long]
    /** Read at most n bytes. */
    def read(n: Long): Array[Byte]
  }

  /** 413/400-shaped validation error (error-as-value at the driver edge). */
  final case class ValidationError(status: Int, detail: String)

  def fileTooLargeError(maxFileMb: Int): String =
    s"File size exceeds the maximum allowed size of $maxFileMb MB"

  def batchTooLargeError(maxBatchMb: Int): String =
    s"Batch size exceeds the maximum allowed total size of $maxBatchMb MB"

  def unsupportedFormatError(filename: String): String =
    s"Unsupported file format: $filename"

  // ------------------------------------------------------------------
  // Driver-edge imperative reader — the reference's exact byte accounting
  // (upload_validation.py:42-98), used when the engine ingests uploads
  // before parallelizing. `toBytes` is pluggable for the same reason the
  // reference's tests patch mb_to_bytes: unit tests pin the accounting
  // with byte-sized limits.
  // ------------------------------------------------------------------

  /** Bounded read (py:42-64): reads at most limit+1 bytes — never buffers
    * an unbounded stream; +1 is the over-limit detection byte. */
  def readDocumentWithLimit(doc: Upload,
                            maxFileMb: Int = DefaultMaxFileMb,
                            maxBatchMb: Int = DefaultMaxBatchMb,
                            remainingBatchBytes: Option[Long] = None,
                            toBytes: Int => Long = mbToBytes): Either[ValidationError, Array[Byte]] = {
    val maxFileBytes = toBytes(maxFileMb)
    doc.declaredSize match {
      case Some(size) if size > maxFileBytes =>
        return Left(ValidationError(413, fileTooLargeError(maxFileMb)))
      case Some(size) if remainingBatchBytes.exists(size > _) =>
        return Left(ValidationError(413, batchTooLargeError(maxBatchMb)))
      case _ => ()
    }
    val readLimit = remainingBatchBytes.fold(maxFileBytes)(math.min(maxFileBytes, _))
    val bytes = doc.read(readLimit + 1)
    if (bytes.length > maxFileBytes)
      Left(ValidationError(413, fileTooLargeError(maxFileMb)))
    else if (remainingBatchBytes.exists(bytes.length > _))
      Left(ValidationError(413, batchTooLargeError(maxBatchMb)))
    else Right(bytes)
  }

  /** Single-document read + format validation (py:67-74). */
  def readAndValidateDocument(doc: Upload,
                              maxFileMb: Int = DefaultMaxFileMb,
                              toBytes: Int => Long = mbToBytes,
                              formatSupported: (Array[Byte], String) => Boolean =
                                FormatDetection.isSupported): Either[ValidationError, (String, Array[Byte])] =
    readDocumentWithLimit(doc, maxFileMb, toBytes = toBytes).flatMap { bytes =>
      val name = Option(doc.filename).getOrElse("unnamed")
      if (!formatSupported(bytes, name))
        Left(ValidationError(400, unsupportedFormatError(name)))
      else Right((name, bytes))
    }

  /** Batch read (py:77-98): declared-size fail-fast before ANY read, then
    * sequential bounded reads decrementing the batch budget, then
    * all-or-nothing format validation over the whole batch. */
  def readAndValidateBatch(docs: Seq[Upload],
                           maxFileMb: Int = DefaultMaxFileMb,
                           maxBatchMb: Int = DefaultMaxBatchMb,
                           toBytes: Int => Long = mbToBytes,
                           formatSupported: (Array[Byte], String) => Boolean =
                             FormatDetection.isSupported): Either[ValidationError, Seq[(String, Array[Byte])]] = {
    val maxFileBytes = toBytes(maxFileMb)
    var remaining = toBytes(maxBatchMb)
    val known = docs.map(_.declaredSize)
    if (known.exists(_.exists(_ > maxFileBytes)))
      return Left(ValidationError(413, fileTooLargeError(maxFileMb)))
    if (known.forall(_.isDefined) && known.flatten.sum > remaining)
      return Left(ValidationError(413, batchTooLargeError(maxBatchMb)))

    val data = Seq.newBuilder[(String, Array[Byte])]
    docs.foreach { doc =>
      readDocumentWithLimit(doc, maxFileMb, maxBatchMb, Some(remaining), toBytes) match {
        case Left(e) => return Left(e)
        case Right(bytes) =>
          data += ((Option(doc.filename).getOrElse("unnamed"), bytes))
          remaining -= bytes.length
      }
    }
    val read = data.result()
    read.foreach { case (name, bytes) =>
      if (!formatSupported(bytes, name))
        return Left(ValidationError(400, unsupportedFormatError(name)))
    }
    Right(read)
  }

  /** Per-file limit as an error-column: rows keep flowing, over-limit rows
    * carry the 413 message (error-as-column, SURVEY.md O16). */
  def withFileLimit(df: DataFrame, maxFileMb: Int = DefaultMaxFileMb): DataFrame =
    df.withColumn("error",
      when(col("length") > mbToBytes(maxFileMb), fileTooLargeError(maxFileMb))
        .otherwise(lit(null).cast("string")))

  /** Driver-side fail-fast on declared sizes (no content read): Some(error)
    * if any declared size or the declared total exceeds the caps. Declared
    * sizes may be unknown (None) — the total pre-check only applies when
    * all are known, like the reference. */
  def failFast(declaredSizes: Seq[Option[Long]],
               maxFileMb: Int = DefaultMaxFileMb,
               maxBatchMb: Int = DefaultMaxBatchMb): Option[String] = {
    if (declaredSizes.exists(_.exists(_ > mbToBytes(maxFileMb))))
      Some(fileTooLargeError(maxFileMb))
    else if (declaredSizes.forall(_.isDefined) &&
      declaredSizes.flatten.sum > mbToBytes(maxBatchMb))
      Some(batchTooLargeError(maxBatchMb))
    else None
  }

  /** Batch running-total accounting: cumulative sum of `length` in `idx`
    * order; the first row whose running total exceeds the batch budget — and
    * everything after it — is over budget. Returns the annotated frame with
    * `running_total` and `error` columns. */
  def withBatchAccounting(df: DataFrame,
                          maxFileMb: Int = DefaultMaxFileMb,
                          maxBatchMb: Int = DefaultMaxBatchMb): DataFrame = {
    // Global (no-partition) running-sum window = one task, which is safe
    // ONLY because a batch is capped at maxBatchMb (500 MB reference
    // semantics, ≤ thousands of rows). A multi-batch frame at scale must
    // partition this window by its batch/job id column.
    val w = Window.orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_total", sum(col("length")).over(w))
      .withColumn("error",
        when(col("length") > mbToBytes(maxFileMb), fileTooLargeError(maxFileMb))
          .when(col("running_total") > mbToBytes(maxBatchMb), batchTooLargeError(maxBatchMb))
          .otherwise(lit(null).cast("string")))
  }

  /** All-or-nothing batch validation (the reference 413s/400s the whole
    * request): Left(firstError) if any row is over limits or unsupported,
    * Right(df) otherwise. `formatCol` is the detected format column. */
  def validateBatch(df: DataFrame,
                    formatCol: Column,
                    maxFileMb: Int = DefaultMaxFileMb,
                    maxBatchMb: Int = DefaultMaxBatchMb): Either[String, DataFrame] = {
    val annotated = withBatchAccounting(df, maxFileMb, maxBatchMb)
      .withColumn("error",
        when(col("error").isNotNull, col("error"))
          .when(formatCol.isNull,
            concat(lit("Unsupported file format: "), col("filename")))
          .otherwise(lit(null).cast("string")))
    val firstError = annotated.filter(col("error").isNotNull)
      .orderBy(col("idx")).select(col("error")).limit(1).collect()
    if (firstError.nonEmpty) Left(firstError(0).getString(0))
    else Right(annotated.drop("error"))
  }
}
