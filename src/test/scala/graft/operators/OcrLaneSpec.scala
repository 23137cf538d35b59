package graft.operators

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.kernel.ConvertKernel

/** Pins k10's OCR-lane contract (VERDICT r12 #6):
  *
  *  1. the lane partition is BYTE-COMPLETE — every routed document's
  *     content column equals the source corpus bytes digest-for-digest,
  *     and lane membership equals the triage verdict exactly;
  *  2. the consumer's read is statically pruned to the needs_ocr=true
  *     partition (scan metric, the IvfIndexSpec measurement);
  *  3. the kernel's OCR hook contract: re-entry only fires for the
  *     needs-OCR failure, rides the normal serializer path for every
  *     output format, never masks other errors, and unknown engine
  *     names are rejected at config construction.
  */
class OcrLaneSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec        => p +: flatten(q.plan)
    case r: ReusedExchangeExec    => p +: flatten(r.child)
    case _ => p +: p.children.flatMap(flatten)
  }

  test("lane partition is byte-complete and membership equals the triage verdict") {
    // directory-name partition inference types needs_ocr as STRING
    // ("true"/"false" dirs) — normalize to boolean for the assertions
    val lane = spark.read.parquet(KernelQueries.stagedOcrLane(spark, dir))
      .select($"doc_id", md5($"content").as("lane_md5"),
        $"needs_ocr".cast("boolean").as("needs_ocr"))
    val source = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(KernelQueries.stagedPdfCorpus(spark, dir))
      .select(
        regexp_extract($"path", "doc(\\d+)\\.pdf$", 1).cast("long").as("doc_id"),
        md5($"content").as("src_md5"))
    val n = graft.Tables(spark, dir, "documents").count()
    // full outer: a doc missing from either side surfaces as a null row
    val joined = lane.join(source, Seq("doc_id"), "full_outer").collect()
    assert(joined.length == n, s"lane has ${joined.length} rows, corpus $n")
    joined.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(3) &&
        r.getString(1) == r.getString(3),
        s"doc ${r.getLong(0)} bytes not identical across the lane round-trip")
      // membership = pdfFor arithmetic: %10==6 scans and %2==1 appendixes
      val id = r.getLong(0)
      val expected = id % 10 == 6 || (id % 10 != 6 && id % 2 == 1)
      assert(r.getBoolean(2) == expected,
        s"doc $id needs_ocr=${r.getBoolean(2)}, triage arithmetic says $expected")
    }
  }

  test("k10 consumer reads ONLY the needs_ocr=true partition (measured)") {
    val df = graft.SparkEntry.queries("k10_ocr_lane_consume")(spark, dir)
    assert(df.collect().nonEmpty, "scan slice must be non-empty")
    val scan = flatten(df.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("ocrlane_")) => f
    }.getOrElse(fail("no lane scan in the k10 plan"))
    val nParts = scan.metrics.collectFirst {
      case (k, m) if k == "numPartitions" => m.value
    }.getOrElse(fail(s"no numPartitions metric; keys=${scan.metrics.keys}"))
    assert(nParts == 1L,
      s"consumer should read exactly the needs_ocr=true partition, read $nParts")
  }

  test("OCR hook contract: re-entry, format invariance, no error masking, name validation") {
    val scan = KernelQueries.pdfFor(16L, 100L) // %10==6: image-only scan
    val hooked = ConvertKernel.ConversionConfig(
      ocrEngine = Some(ConvertKernel.OcrEngines.Deterministic))
    // without the hook: the honest error; with it: recovered markdown
    assert(ConvertKernel.convertOne("doc16.pdf", scan).error != null)
    val r = ConvertKernel.convertOne("doc16.pdf", scan, hooked)
    assert(r.error == null &&
      r.markdown == "Recovered page 1 of 2.\n\nRecovered page 2 of 2.")
    // the recovered text rides the NORMAL serializer path: every
    // declared output format produces content, same as any text doc
    graft.kernel.OutputSerializers.byFormat.keys.foreach { fmt =>
      val rf = ConvertKernel.convertOne("doc16.pdf", scan,
        hooked.copy(outputFormat = fmt))
      assert(rf.error == null && rf.markdown != null && rf.markdown.nonEmpty,
        s"format $fmt failed on OCR-recovered text")
    }
    // a parse failure that is NOT the needs-OCR error is never masked:
    // truncated garbage bytes keep their own error under the hook
    val garbage = "%PDF-1.4 garbage".getBytes("ISO-8859-1")
    val g = ConvertKernel.convertOne("bad.pdf", garbage, hooked)
    assert(g.error != null && !g.error.contains("Recovered"),
      s"hook masked a non-OCR failure: ${g.error}")
    // engine names are validated at config construction, not mid-job
    assertThrows[IllegalArgumentException] {
      ConvertKernel.ConversionConfig(ocrEngine = Some("tesseract"))
    }
  }
}
