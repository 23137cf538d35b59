package graft.jobs

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.kernel.ConvertKernel
import graft.kernel.ConvertKernel.{ConversionConfig, ConversionResult, UploadRow}

/** Async job orchestration (SURVEY.md O18-O22) — the reference's
  * Celery/Redis plane (worker/tasks.py, service.py:204-273) re-expressed as
  * a filesystem jobs ledger + Spark execution:
  *
  *   submit  → request rows persisted under `<ledger>/requests/<job_id>/`
  *             (the Redis broker boundary), status IN_PROGRESS;
  *   process → a worker drain converts pending jobs with the mapPartitions
  *             kernel and writes `<ledger>/results/<job_id>/` (the result
  *             backend boundary);
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

    /** Enqueue: persist (filename, bytes) rows; returns the job id. */
    def submit(docs: Seq[(String, Array[Byte])], batch: Boolean,
               config: ConversionConfig = ConversionConfig()): String = {
      val id = UUID.randomUUID().toString
      val dir = reqDir(id)
      Files.createDirectories(dir)
      docs.zipWithIndex.foreach { case ((name, bytes), i) =>
        Files.write(dir.resolve(f"$i%05d__$name"), bytes)
      }
      if (batch) Files.write(batchFlag(id), Array.emptyByteArray)
      id
    }

    def pendingJobs(): Seq[String] = {
      val req = Paths.get(root, "requests")
      if (!Files.isDirectory(req)) return Seq.empty
      Files.list(req).iterator().asScala.map(_.getFileName.toString)
        .filterNot(id => Files.exists(doneFile(id)) || Files.exists(failFile(id)))
        .toSeq.sorted
    }

    def isBatch(id: String): Boolean = Files.exists(batchFlag(id))

    /** Worker drain: convert one pending job through the Spark kernel. */
    def process(spark: SparkSession, id: String,
                config: ConversionConfig = ConversionConfig()): Unit = {
      import spark.implicits._
      try {
        val dir = reqDir(id)
        if (!Files.isDirectory(dir))
          throw new IllegalStateException(s"no such job: $id")
        val files = Files.list(dir).iterator().asScala
          .filterNot(_.getFileName.toString.startsWith("_"))
          .toSeq.sortBy(_.getFileName.toString)
        val rows = files.map { p =>
          val name = p.getFileName.toString.split("__", 2).last
          val bytes = Files.readAllBytes(p)
          UploadRow(p.toString, name, bytes, bytes.length.toLong)
        }
        val batch = isBatch(id)
        // partition parallelism where the reference converts sequentially
        val ds = spark.createDataset(rows)
          .repartition(math.max(1, math.min(rows.size, spark.sparkContext.defaultParallelism)))
        val results = ConvertKernel.convert(ds, config, batchMode = batch)
        Files.createDirectories(resDir(id))
        results.toDF().coalesce(1).write.mode("overwrite")
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

    private def readResults(spark: SparkSession, id: String): Seq[ConversionResult] = {
      import spark.implicits._
      val df = spark.read
        .schema("filename STRING, markdown STRING, images ARRAY<STRUCT<type: STRING, filename: STRING, image: STRING>>, error STRING")
        .json(resDir(id).resolve("rows").toString)
      df.as[ConversionResult].collect().toSeq
    }

    /** Single-job status (service.py:220-242). */
    def singleStatus(spark: SparkSession, id: String): JobResult = {
      if (Files.exists(failFile(id)))
        JobResult(id, None, Some(new String(Files.readAllBytes(failFile(id)), "UTF-8")), Failure)
      else if (Files.exists(doneFile(id))) {
        val r = readResults(spark, id).head
        if (r.error != null) JobResult(id, None, Some(r.error), Failure)
        else JobResult(id, Some(r), None, Success)
      } else JobResult(id, None, None, InProgress) // unknown ⇒ IN_PROGRESS quirk
    }

    /** Batch-job status (service.py:244-273). */
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
