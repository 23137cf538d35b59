package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.ConvertKernel.{ConversionConfig, OcrEngine, OcrEngines}

/** What a real OCR adapter (tess4j, an EasyOCR bridge) looks like to the
  * kernel: any class with a public no-arg constructor implementing
  * [[ConvertKernel.OcrEngine]], named as `provider:<fqcn>` — nothing to
  * register at build time, resolved by reflection on the executor. */
class StubProviderEngine extends OcrEngine {
  def recognize(filename: String, content: Array[Byte]): Option[String] =
    Some(s"Provider-recovered text for $filename.")
}

/** Rejection case: on the classpath but not an engine. */
class NotAnEngine

/** Pins the `provider:` OCR mechanism (VERDICT r13 ask #8): the kernel
  * keeps its zero-ML-dependency default, but a real recognizer drops in
  * by classpath + name — config validation, reflection resolution,
  * per-JVM memoization, loud failures for bad providers, and the same
  * re-entry path the deterministic double uses. The last test is the
  * real-engine integration hook: it runs only when
  * `-Dgraft.ocr.provider=<fqcn>` names an installed engine. */
class OcrProviderSpec extends AnyFunSuite {

  private val scan = graft.operators.KernelQueries.pdfFor(6, 100)

  test("a provider: engine loads by reflection and re-enters conversion like the built-in hook") {
    val cfg = ConversionConfig(
      ocrEngine = Some("provider:graft.kernel.StubProviderEngine"))
    val bare = ConvertKernel.convertOne("scan6.pdf", scan)
    assert(bare.error != null, "the image-only scan should fail without OCR")
    val r = ConvertKernel.convertOne("scan6.pdf", scan, cfg)
    assert(r.error == null, s"provider path errored: ${r.error}")
    assert(r.markdown.contains("Provider-recovered text for scan6.pdf."),
      r.markdown)
  }

  test("provider instances are memoized per JVM (model-loading engines init once per executor)") {
    val name = "provider:graft.kernel.StubProviderEngine"
    assert(OcrEngines.byName(name) eq OcrEngines.byName(name))
  }

  test("bad providers fail loud at resolution; config validation accepts the prefix form only when named") {
    intercept[IllegalArgumentException] {
      OcrEngines.byName("provider:graft.kernel.DoesNotExist")
    }
    intercept[IllegalArgumentException] {
      OcrEngines.byName("provider:graft.kernel.NotAnEngine")
    }
    intercept[IllegalArgumentException] {
      ConversionConfig(ocrEngine = Some("tesseract")) // not a known name
    }
    intercept[IllegalArgumentException] {
      ConversionConfig(ocrEngine = Some("provider:")) // empty class name
    }
    // the prefix form itself is config-valid without classloading — the
    // name is data; resolution happens lazily on the executor
    ConversionConfig(ocrEngine = Some("provider:not.Loaded.Yet"))
  }

  test("real OCR engine integration (runs when -Dgraft.ocr.provider names an installed engine)") {
    val provider = sys.props.get("graft.ocr.provider")
    assume(provider.nonEmpty,
      "no real OCR provider installed — set -Dgraft.ocr.provider=<fqcn>")
    val cfg = ConversionConfig(ocrEngine = provider.map("provider:" + _))
    val r = ConvertKernel.convertOne("scan6.pdf", scan, cfg)
    assert(r.error == null, s"real provider errored: ${r.error}")
    assert(r.markdown != null && r.markdown.nonEmpty)
  }
}
