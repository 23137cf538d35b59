package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.kernel.ConvertKernel
import graft.kernel.ConvertKernel.{ConversionConfig, ConversionResult}

/** The conversion kernel as a native DataSource V2 table:
  *
  * {{{
  *   spark.read.format("graft.sources.ConvertDataSource").load(dir)
  *   -- or, after META-INF/services registration --
  *   spark.read.format("docling").load(dir)
  * }}}
  *
  * yields `(filename, markdown, images, error)` rows — the same result
  * frame as [[graft.Pipeline.convertDirectory]], but as a TABLE the
  * planner owns end-to-end. What the connector tier buys over the
  * mapPartitions pipeline:
  *
  *  - COLUMN PRUNING reaches the kernel: a `SELECT filename` (or a
  *    count(*)) prunes the schema to metadata-only columns, and the
  *    reader never parses a byte — at 100 TB, listing-level queries cost
  *    listing-level work. The pipeline form must at least thread the
  *    content column into its mapPartitions.
  *  - size-capped input partitions: small files bin-pack (amortizing
  *    task and FS-open overhead), while any file above the target byte
  *    size isolates into its own partition — a giant PDF cannot
  *    straggle a multi-file split, and 5000 tiny docs don't become
  *    5000 tasks. `maxBytesPerPartition` tunes the target (default 4 MB).
  *
  * Options: `extractTablesAsImages` (bool, default false),
  * `imageResolutionScale` (int 1-4, default 4), `maxFileMb` (int),
  * `batchMode` (bool, DEFAULT TRUE — a directory is the batch-convert
  * surface, matching Pipeline.convertDirectory so k5 == k1; pass false
  * for the single-document stem naming) — mirroring the reference's
  * query parameters (route.py:46-51).
  *
  * The reader itself is the SAME [[ConvertKernel.convertOne]] every other
  * plane uses; this file is only the planner plumbing.
  */
class ConvertDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "docling"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ConvertDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ConvertTable(properties.asScala.toMap)
}

object ConvertDataSource {
  val schema: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("markdown", StringType),
    StructField("images", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("filename", StringType),
      StructField("image", StringType))))),
    StructField("error", StringType)))

  /** Kernel invocations observed by readers in this JVM — lets specs
    * prove that a pruned scan never converted anything. Test-observable
    * in local mode only (executors share the JVM). */
  val kernelCalls = new AtomicLong(0)

  /** Greedy bin packing preserving input order: a partition closes when
    * adding the next file would cross `targetBytes` OR it already holds
    * `maxFiles`. A file larger than the target therefore lands ALONE in
    * its partition (the no-straggler isolation rule). Pure and
    * property-tested (ConvertDataSourceSpec). */
  private[sources] def pack(files: Seq[(String, Long)], targetBytes: Long,
                            maxFiles: Int): Seq[Vector[(String, Long)]] = {
    val parts = scala.collection.mutable.ArrayBuffer[Vector[(String, Long)]]()
    var cur = Vector.empty[(String, Long)]
    var curBytes = 0L
    files.foreach { f =>
      if (cur.nonEmpty && (curBytes + f._2 > targetBytes || cur.length >= maxFiles)) {
        parts += cur; cur = Vector.empty; curBytes = 0L
      }
      cur :+= f
      curBytes += f._2
    }
    if (cur.nonEmpty) parts += cur
    parts.toSeq
  }
}

final class ConvertTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"docling(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = ConvertDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ConvertScanBuilder(
      options.asScala.toMap ++ properties)
}

final class ConvertScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ConvertDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ConvertScan(options, required)
}

final class ConvertScan(options: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = options.getOrElse("path",
      throw new IllegalArgumentException("docling source requires a path"))
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(hconf)
    val files: Array[FileStatus] =
      if (fs.isDirectory(p)) fs.listStatus(p).filter(_.isFile)
      else Array(fs.getFileStatus(p))
    // size-capped bin packing: small files amortize task-launch and FS
    // open overhead inside one partition (5000 tiny docs = 5000 tasks
    // measured 12x slower than packed), while any file larger than the
    // target gets its OWN partition so a giant document still cannot
    // straggle a multi-file split
    val targetBytes = options.get("maxbytesperpartition").map(_.toLong)
      .getOrElse(4L * 1024 * 1024)
    // a files-per-partition bound keeps parallelism when files are tiny
    // (5000 x 1 KB under a byte cap alone would pack into 2 partitions
    // and serialize the kernel); default targets ~4 waves of tasks
    val maxFiles = options.get("maxfilesperpartition").map(_.toInt)
      .getOrElse {
        val slots = math.max(1, SparkSession.active.sparkContext.defaultParallelism)
        math.max(1, math.min(512, (files.length + 4 * slots - 1) / (4 * slots)))
      }
    ConvertDataSource.pack(
      files.sortBy(_.getPath.getName).map(f => (f.getPath.toString, f.getLen)).toSeq,
      targetBytes, maxFiles)
      .map(fs => ConvertInputPartition(fs): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // capture the SESSION Hadoop conf driver-side (spark.hadoop.*
    // credentials, object-store endpoints, filesystem impls) — executors
    // have no session, and a bare `new Configuration()` there would read
    // local files fine but break against any configured remote store
    new ConvertReaderFactory(required, options,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))
}

final case class ConvertInputPartition(files: Vector[(String, Long)]) extends InputPartition

final class ConvertReaderFactory(
    required: StructType, options: Map[String, String],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ConvertReader(partition.asInstanceOf[ConvertInputPartition], required, options,
      hadoopConf.value)
}

final class ConvertReader(part: ConvertInputPartition, required: StructType,
                          options: Map[String, String],
                          hadoopConf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val it = part.files.iterator
  private var current: InternalRow = _

  // conversion only runs when a converted column is actually required —
  // the pruning contract this connector exists for
  private val needsConversion =
    required.fieldNames.exists(f => f == "markdown" || f == "images" || f == "error")

  private lazy val fullSerializer =
    ExpressionEncoder[ConversionResult]().createSerializer()

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val (path, length) = it.next()
    val name = new Path(path).getName
    current =
      if (!needsConversion) projectMetadataOnly(name)
      else {
        val maxFileMb = options.get("maxfilemb").map(_.toInt)
          .getOrElse(graft.ingest.UploadValidation.DefaultMaxFileMb)
        val batchMode = options.get("batchmode").forall(_.toBoolean)
        // size check BEFORE any read (the reference's bounded-read rule,
        // O2): an over-limit multi-GB file must 413 without buffering —
        // reading it first would also overflow the Int array size
        val result =
          if (length > graft.ingest.UploadValidation.mbToBytes(maxFileMb)) {
            val errorName = if (batchMode) name else ConvertKernel.stemOf(name)
            ConversionResult(errorName, null, Seq.empty,
              graft.ingest.UploadValidation.fileTooLargeError(maxFileMb))
          } else {
            val fsPath = new Path(path)
            val fs = fsPath.getFileSystem(hadoopConf)
            val in = fs.open(fsPath)
            val bytes =
              try {
                val buf = new Array[Byte](length.toInt)
                in.readFully(0, buf)
                buf
              } finally in.close()
            ConvertDataSource.kernelCalls.incrementAndGet()
            val config = ConversionConfig(
              extractTablesAsImages = options.get("extracttablesasimages").exists(_.toBoolean),
              imageResolutionScale = options.get("imageresolutionscale").map(_.toInt).getOrElse(4))
            ConvertKernel.convertOne(name, bytes, config, batchMode)
          }
        project(fullSerializer(result))
      }
    true
  }

  /** Metadata-only projection: filename (and nothing else is derivable
    * without conversion — pruned schemas asking only for it skip I/O). */
  private def projectMetadataOnly(name: String): InternalRow = {
    val values = required.fieldNames.map {
      case "filename" => UTF8String.fromString(name)
      case other => throw new IllegalStateException(
        s"column $other requires conversion but needsConversion=false")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  /** Prune the full serialized row down to the required columns. The
    * serializer REUSES its output buffer across calls, so every value —
    * strings AND the images array with its nested strings — must be
    * detached before the next file overwrites it; one whole-row copy
    * covers all columns at once (copying field-by-field missed the
    * ArrayData case and handed out views into the shared buffer). */
  private def project(reused: InternalRow): InternalRow = {
    val full = reused.copy()
    val fullSchema = ConvertDataSource.schema
    val values = required.fieldNames.map { f =>
      val i = fullSchema.fieldIndex(f)
      full.get(i, fullSchema(i).dataType)
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
