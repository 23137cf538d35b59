package graft.jobs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.{Base64, UUID}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.kernel.ConvertKernel
import graft.kernel.ConvertKernel.{ConversionConfig, ConversionResult}

/** Async job orchestration (SURVEY.md O18-O22) — the reference's
  * Celery/Redis plane (worker/tasks.py, service.py:204-273) re-expressed as
  * a filesystem jobs ledger + Spark execution:
  *
  *   submit  → payload bytes persisted as `<idx>.bin` under
  *             `<ledger>/requests/<job_id>/` with client filenames in a
  *             base64 `_MANIFEST` sidecar (the Redis broker boundary) —
  *             filenames never become paths, so traversal is impossible;
  *   process → a worker drain reads the job through the distributed
  *             `binaryFile` source (content bytes never materialize on the
  *             driver), converts with the mapPartitions kernel, and writes
  *             `<ledger>/results/<job_id>/` (the result backend boundary)
  *             carrying the submit index, so results read back in
  *             submission order like the reference's convert_all
  *             (service.py:171-186);
  *   status  → read-side state machine, reproducing the reference exactly:
  *             * unknown job_id ⇒ IN_PROGRESS (Celery PENDING means
  *               "unknown", service.py:230-231 — deliberately NOT "fixed"),
  *             * single job: result error ⇒ job FAILURE (service.py:233-237),
  *             * batch job: SUCCESS as long as the task ran, even if every
  *               document failed (service.py:247-251); per-document
  *               statuses nested inside,
  *             * task-level exception ⇒ FAILURE with the message.
  */
object JobService {

  val InProgress = "IN_PROGRESS"
  val Success = "SUCCESS"
  val Failure = "FAILURE"

  final case class JobResult(
      jobId: String,
      result: Option[ConversionResult],
      error: Option[String],
      status: String)

  final case class BatchJobResult(
      jobId: String,
      conversionResults: Seq[JobResult],
      status: String,
      error: Option[String])

  final class Ledger(val root: String) {
    private def reqDir(id: String) = Paths.get(root, "requests", id)
    private def resDir(id: String) = Paths.get(root, "results", id)
    private def failFile(id: String) = Paths.get(root, "results", id, "_TASK_FAILED")
    private def doneFile(id: String) = Paths.get(root, "results", id, "_DONE")
    private def batchFlag(id: String) = Paths.get(root, "requests", id, "_BATCH")
    private def manifestFile(id: String) = Paths.get(root, "requests", id, "_MANIFEST")

    /** Enqueue: persist payload rows as index-named files plus a filename
      * manifest; returns the job id. Client filenames go through base64 —
      * never interpreted as paths (no traversal, no name mangling). */
    def submit(docs: Seq[(String, Array[Byte])], batch: Boolean,
               config: ConversionConfig = ConversionConfig()): String = {
      val id = UUID.randomUUID().toString
      val dir = reqDir(id)
      Files.createDirectories(dir)
      // empty → "unnamed" like the reference's `filename or "unnamed"`
      // (Python-falsy ""), and so no manifest line is ever empty (an empty
      // line would shift the idx→name mapping on read)
      val manifest = docs.map { case (name, _) =>
        Base64.getEncoder.encodeToString(
          Option(name).filter(_.nonEmpty).getOrElse("unnamed")
            .getBytes(StandardCharsets.UTF_8))
      }.mkString("\n")
      Files.write(manifestFile(id), manifest.getBytes(StandardCharsets.UTF_8))
      docs.zipWithIndex.foreach { case ((_, bytes), i) =>
        Files.write(dir.resolve(f"$i%05d.bin"), bytes)
      }
      if (batch) Files.write(batchFlag(id), Array.emptyByteArray)
      id
    }

    private def readManifest(id: String): IndexedSeq[String] =
      Files.readAllLines(manifestFile(id), StandardCharsets.UTF_8).asScala
        .filter(_.nonEmpty)
        .map(l => new String(Base64.getDecoder.decode(l), StandardCharsets.UTF_8))
        .toIndexedSeq

    def pendingJobs(): Seq[String] = {
      val req = Paths.get(root, "requests")
      if (!Files.isDirectory(req)) return Seq.empty
      Files.list(req).iterator().asScala.map(_.getFileName.toString)
        .filterNot(id => Files.exists(doneFile(id)) || Files.exists(failFile(id)))
        .toSeq.sorted
    }

    def isBatch(id: String): Boolean = Files.exists(batchFlag(id))

    /** Worker drain: convert one pending job through the Spark kernel.
      * Content bytes flow source→executors only (binaryFile scan); the
      * driver touches just the manifest. The submit index rides along so
      * results are order-preserving. */
    def process(spark: SparkSession, id: String,
                config: ConversionConfig = ConversionConfig()): Unit = {
      import spark.implicits._
      try {
        val dir = reqDir(id)
        if (!Files.isDirectory(dir))
          throw new IllegalStateException(s"no such job: $id")
        val names = readManifest(id)
        val bnames = spark.sparkContext.broadcast(names)
        val batch = isBatch(id)
        val parallelism = math.max(1, math.min(names.size, spark.sparkContext.defaultParallelism))
        val files = spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.bin")
          .load(dir.toString)
          .select($"path", $"content")
          .as[(String, Array[Byte])]
          .repartition(parallelism) // small files pack into one scan partition otherwise
        val results = files.mapPartitions { it =>
          val nm = bnames.value
          it.map { case (path, content) =>
            val idx = path.substring(path.lastIndexOf('/') + 1).stripSuffix(".bin").toInt
            (idx, ConvertKernel.convertOne(nm(idx), content, config, batchMode = batch))
          }
        }.toDF("idx", "r").select($"idx", $"r.*")
        Files.createDirectories(resDir(id))
        results.write.mode("overwrite")
          .json(resDir(id).resolve("rows").toString)
        Files.write(doneFile(id), Array.emptyByteArray)
      } catch {
        case e: Exception =>
          Files.createDirectories(resDir(id))
          Files.write(failFile(id), e.toString.getBytes("UTF-8"),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      }
    }

    def processAllPending(spark: SparkSession,
                          config: ConversionConfig = ConversionConfig()): Unit =
      pendingJobs().foreach(process(spark, _, config))

    /** Retention sweep (VERDICT r12 #8): the reference's Celery result
      * backend expires results after a TTL (`result_expires`, 24 h
      * default); without an analog this filesystem ledger grows without
      * bound in a long-lived server. Deletes the request AND result
      * dirs of COMPLETED jobs (done or task-failed) whose completion
      * marker is older than `ttlMillis`; in-progress jobs are never
      * touched, however old — only completion starts the clock, exactly
      * like Celery's backend. After expiry a status lookup naturally
      * falls back to the unknown-id ⇒ IN_PROGRESS quirk — the same
      * answer the reference gives once Celery forgets a task id
      * (service.py:230-231), spec-pinned. Returns the swept job ids
      * (sorted) so a caller can log them. `now` is injectable for
      * deterministic tests. */
    def sweepExpired(ttlMillis: Long,
                     now: Long = System.currentTimeMillis()): Seq[String] = {
      val res = Paths.get(root, "results")
      if (!Files.isDirectory(res)) return Seq.empty
      val ids = {
        val st = Files.list(res)
        try st.iterator().asScala.map(_.getFileName.toString).toSeq
        finally st.close()
      }
      val expired = ids.filter { id =>
        Seq(doneFile(id), failFile(id)).find(Files.exists(_)).exists(m =>
          now - Files.getLastModifiedTime(m).toMillis >= ttlMillis)
      }.sorted
      expired.foreach { id =>
        deleteRecursively(reqDir(id))
        deleteRecursively(resDir(id))
      }
      expired
    }

    private def deleteRecursively(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        val st = Files.walk(p)
        try st.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
        finally st.close()
      }

    /** Results in submission order (reference convert_all returns input
      * order; the idx column restores it after the distributed write). */
    private def readResults(spark: SparkSession, id: String): Seq[ConversionResult] = {
      import spark.implicits._
      spark.read
        .schema("idx INT, filename STRING, markdown STRING, " +
          "images ARRAY<STRUCT<type: STRING, filename: STRING, image: STRING>>, error STRING")
        .json(resDir(id).resolve("rows").toString)
        .orderBy($"idx")
        .drop("idx")
        .as[ConversionResult].collect().toSeq
    }

    /** Single-job status (service.py:220-242). `head` is deterministic:
      * the first-submitted document. */
    def singleStatus(spark: SparkSession, id: String): JobResult = {
      if (Files.exists(failFile(id)))
        JobResult(id, None, Some(new String(Files.readAllBytes(failFile(id)), "UTF-8")), Failure)
      else if (Files.exists(doneFile(id))) {
        readResults(spark, id).headOption match {
          case None =>
            JobResult(id, None, Some("job produced no results"), Failure)
          case Some(r) if r.error != null =>
            JobResult(id, None, Some(r.error), Failure)
          case Some(r) => JobResult(id, Some(r), None, Success)
        }
      } else JobResult(id, None, None, InProgress) // unknown ⇒ IN_PROGRESS quirk
    }

    /** Batch-job status (service.py:244-273), per-document results in
      * submission order. */
    def batchStatus(spark: SparkSession, id: String): BatchJobResult = {
      if (Files.exists(failFile(id)))
        BatchJobResult(id, Seq.empty,
          Failure, Some(new String(Files.readAllBytes(failFile(id)), "UTF-8")))
      else if (Files.exists(doneFile(id))) {
        val per = readResults(spark, id).map { r =>
          if (r.error != null) JobResult(id, None, Some(r.error), Failure)
          else JobResult(id, Some(r), None, Success)
        }
        // batch is SUCCESS even if every document failed
        BatchJobResult(id, per, Success, None)
      } else BatchJobResult(id, Seq.empty, InProgress, None)
    }
  }
}
