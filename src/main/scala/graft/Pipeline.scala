package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{FormatDetection, UploadValidation}
import graft.kernel.ConvertKernel
import graft.kernel.ConvertKernel.ConversionConfig

/** The composed ingest→convert pipeline (SURVEY §3.1 trace as a library
  * entry point): binary source → size-limit predicate → columnar format
  * detection → mapPartitions kernel → error-as-column results.
  *
  * A user of the reference's batch-convert endpoint points this at a
  * directory instead. Declarative pre-pass rules:
  *  - over-limit and unsupported-format rows become error rows WITHOUT
  *    their content ever entering the kernel (the columnar `when` cascade
  *    runs inside the scan stage; Catalyst prunes `content` from the
  *    error branch);
  *  - everything else converts in partition parallelism with per-row
  *    error capture, exactly like ConvertKernel.convertOne;
  *  - error messages match the reference's (413 size text, unsupported
  *    format text), and batchMode controls the stem/full-filename
  *    asymmetry the same way.
  */
object Pipeline {

  def convertDirectory(spark: SparkSession, dir: String,
                       config: ConversionConfig = ConversionConfig(),
                       maxFileMb: Int = UploadValidation.DefaultMaxFileMb,
                       batchMode: Boolean = true): DataFrame = {
    import spark.implicits._

    val files = spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract($"path", "([^/]+)$", 1).as("filename"),
        $"content", $"length")

    // One pass over one scan: rows with a pre-pass error short-circuit to
    // the reference's error-row shape (stem in single mode, full filename
    // in batch — ConvertKernel.stem), everything else goes through the
    // kernel. Two filtered branches would re-read every file's bytes.
    convertRows(files, config, maxFileMb, batchMode)
  }

  /** INCREMENTAL [[convertDirectory]]: convert only files not yet
    * recorded in the `ledgerDir` parquet of done paths, then append the
    * newly-done paths to the ledger — the daily-drop ingest shape (the
    * orchestration-plane analog of d11's incremental dedup: never
    * re-convert the corpus to ingest a batch). The pending set is a
    * LISTING-level left-anti join — only `(path, length)` rows reach the
    * join, the binary `content` column is pruned until after the
    * pending filter, so the join cost is O(listing), not O(bytes). A
    * file whose length changed re-converts (path+length is the change
    * key; a real deployment would use modificationTime too).
    *
    * Commit-order contract: the ledger append runs at CALL time, before
    * the caller materializes the returned results — at-most-once
    * semantics (a crash between ledger append and result consumption
    * skips those files on retry). A production deployment flips the
    * order — write results, then the ledger — or commits both behind a
    * transactional table format; the join shape stays identical.
    * Returns (results for the NEW files only, n_previously_done). */
  def convertDirectoryIncremental(spark: SparkSession, dir: String,
                                  ledgerDir: String,
                                  config: ConversionConfig = ConversionConfig(),
                                  maxFileMb: Int = UploadValidation.DefaultMaxFileMb,
                                  batchMode: Boolean = true): (DataFrame, Long) = {
    import spark.implicits._

    val listing = spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract($"path", "([^/]+)$", 1).as("filename"),
        $"content", $"length")

    // probe through the Hadoop FileSystem API, not java.io.File: the
    // ledger lives wherever the deployment points it (HDFS/object
    // store), and a local-only probe would read "absent" there — every
    // run re-converting the whole directory while appending duplicate
    // ledger rows, silently defeating the incremental contract
    val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
    val ledgerFs = ledgerPath.getFileSystem(
      spark.sessionState.newHadoopConf())
    val ledgerExists = ledgerFs.exists(ledgerPath) &&
      ledgerFs.listStatus(ledgerPath)
        .exists(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val done =
      if (ledgerExists) spark.read.parquet(ledgerDir)
      else Seq.empty[(String, Long)].toDF("filename", "length")

    val nDone = done.count()
    // a file is done iff the ledger holds exactly its (filename, length)
    // — a changed file's new length isn't there, so it re-converts, and
    // its stale ledger row is harmless. Left-anti on the narrow listing
    // columns; content stays pruned below the pending filter.
    val pending = listing.join(done, Seq("filename", "length"), "left_anti")
      .select($"filename", $"content", $"length")

    val results = convertRows(pending, config, maxFileMb, batchMode)

    // record the newly-converted paths (append-only ledger)
    pending.select($"filename", $"length")
      .write.mode("append").parquet(ledgerDir)

    (results, nDone)
  }

  /** The shared pre-check → kernel tail of [[convertDirectory]], over an
    * arbitrary `(filename, content, length)` frame. */
  private def convertRows(files: DataFrame, config: ConversionConfig,
                          maxFileMb: Int, batchMode: Boolean): DataFrame = {
    import files.sparkSession.implicits._
    val checked = files.withColumn("pre_error",
      when($"length" > UploadValidation.mbToBytes(maxFileMb),
        UploadValidation.fileTooLargeError(maxFileMb))
        .when(FormatDetection.detectFormatCol($"content", $"filename").isNull,
          concat(lit("Unsupported file format: "), $"filename")))
    checked.select($"filename", $"content", $"pre_error")
      .as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (name, content, preError) =>
          if (preError != null) {
            val errorName =
              if (batchMode) name else ConvertKernel.stemOf(name)
            ConvertKernel.ConversionResult(errorName, null, Seq.empty, preError)
          } else ConvertKernel.convertOne(name, content, config, batchMode)
        }
      }.toDF()
  }

  /** [[convertDirectory]] with run metrics attached via Spark's
    * Observation API — the engine analog of the reference's per-job
    * result stats (service.py:244-273 aggregates success/failure counts
    * per batch). The metrics ride the SAME action as accumulators:
    * no second pass over the data, where a bookkeeping `.count()` at
    * 100 TB would re-run the kernel. After any action on the returned
    * frame, `observation.get` yields n_docs / n_errors / markdown_chars. */
  def convertDirectoryObserved(spark: SparkSession, dir: String,
                               config: ConversionConfig = ConversionConfig(),
                               maxFileMb: Int = UploadValidation.DefaultMaxFileMb,
                               batchMode: Boolean = true): (DataFrame, Observation) = {
    val obs = Observation()
    val out = convertDirectory(spark, dir, config, maxFileMb, batchMode)
      .observe(obs,
        count(lit(1)).as("n_docs"),
        count(col("error")).as("n_errors"),
        sum(length(coalesce(col("markdown"), lit("")))).cast("long")
          .as("markdown_chars"))
    (out, obs)
  }
}
