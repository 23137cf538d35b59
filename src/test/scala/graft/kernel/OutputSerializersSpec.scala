package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.DocModel._

/** The declared-but-unwired OutputFormat surface (utils.py:20-24), shipped
  * and pinned: all four serializers over one mixed document.
  */
class OutputSerializersSpec extends AnyFunSuite {

  private val doc = DocTree("sample", Seq(
    HeadingElement("Title", 1),
    TextElement("Some \"quoted\" text & more."),
    TableElement(Seq(
      TableCellSpec(0, 1, 0, 1, "H1", columnHeader = true),
      TableCellSpec(0, 1, 1, 2, "H2", columnHeader = true),
      TableCellSpec(1, 2, 0, 1, "a"),
      TableCellSpec(1, 2, 1, 2, "b")), 2, 2),
    PictureElement(None)))

  test("markdown serializer matches the kernel's wire format") {
    assert(OutputSerializers.Markdown.serialize(doc) == DocModel.renderMarkdown(doc))
    assert(OutputSerializers.Markdown.serialize(doc).startsWith("# Title"))
  }

  test("text serializer strips markup, tab-separates tables") {
    assert(OutputSerializers.Text.serialize(doc) ==
      "Title\n\nSome \"quoted\" text & more.\n\nH1\tH2\na\tb\n\n[image]")
  }

  test("json serializer is valid parseable JSON with kind discriminators") {
    val json = OutputSerializers.Json.serialize(doc)
    // parse with Spark's own JSON reader against a declared schema
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val parsed = spark.read.json(Seq(json).toDS())
    assert(parsed.select("name").first().getString(0) == "sample")
    val kinds = parsed.selectExpr("explode(items.kind)").collect().map(_.getString(0))
    assert(kinds.toSeq == Seq("heading", "text", "table", "picture"))
  }

  test("json serializer carries list nesting levels") {
    val listDoc = DocTree("l", Seq(
      ListElement(Seq("a", "a1", "b"), ordered = true, levels = Seq(0, 1, 0))))
    assert(OutputSerializers.Json.serialize(listDoc) ==
      """{"name":"l","items":[{"kind":"list","ordered":true,"items":["a","a1","b"],"levels":[0,1,0]}]}""")
  }

  test("doctags serializer emits escaped element tags") {
    val tags = OutputSerializers.DocTags.serialize(doc)
    assert(tags.contains("<section_header_level_1>Title</section_header_level_1>"))
    assert(tags.contains("Some \"quoted\" text &amp; more."))
    assert(tags.contains("<table><row><cell>H1</cell><cell>H2</cell></row>"))
    assert(tags.endsWith("<picture/>"))
  }

  test("registry exposes exactly the reference's four declared formats") {
    assert(OutputSerializers.byFormat.keySet == Set("md", "text", "json", "doctags"))
  }
}
