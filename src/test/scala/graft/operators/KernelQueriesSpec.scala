package graft.operators

import graft.SparkTestBase
import graft.kernel.ConvertKernel

/** Pins the k1 fixture contract locally (without DuckDB): the deterministic
  * staging constructions must convert to exactly the strings the oracle SQL
  * recomputes, and the registered query must run end-to-end on the fixture
  * corpus with the expected error slice.
  */
class KernelQueriesSpec extends SparkTestBase {

  test("md construction converts to the oracle's exact markdown") {
    val (name, bytes) = KernelQueries.fileFor(42L, 123L) // 42 % 3 == 0 -> md
    assert(name == "doc42.md")
    val r = ConvertKernel.convertOne(name, bytes, batchMode = true)
    assert(r.error == null)
    assert(r.markdown ==
      "# Doc 42\n\nThis document has 123 characters of source text.")
    assert(r.images.isEmpty)
  }

  test("csv construction converts to the oracle's exact pipe table") {
    val (name, bytes) = KernelQueries.fileFor(43L, 7L) // 43 % 3 == 1 -> csv
    assert(name == "doc43.csv")
    val r = ConvertKernel.convertOne(name, bytes, batchMode = true)
    assert(r.error == null)
    assert(r.markdown == "| doc_id | chars |\n|---|---|\n| 43 | 7 |")
    assert(r.images.isEmpty)
  }

  test("html construction converts with one spliced picture") {
    val (name, bytes) = KernelQueries.fileFor(41L, 9L) // 41 % 3 == 2 -> html
    assert(name == "doc41.html")
    val r = ConvertKernel.convertOne(name, bytes, batchMode = true)
    assert(r.error == null)
    assert(r.markdown ==
      "# Doc 41\n\nContains 9 characters.\n\npicture-1.png\n\nEnd of 41.")
    assert(r.images.map(i => (i.`type`, i.filename)) == Seq(("picture", "picture-1.png")))
  }

  test("unsupported-extension slice surfaces through the error channel") {
    val (name, bytes) = KernelQueries.fileFor(7L, 5L)
    assert(name == "doc7.xyz")
    val r = ConvertKernel.convertOne(name, bytes, batchMode = true)
    assert(r.markdown == null)
    assert(r.error == "Unsupported file format: doc7.xyz")
  }

  test("k2 element-kind counts match the oracle's CASE table per construction") {
    import graft.kernel.ConvertKernel.ConversionConfig
    val cfg = ConversionConfig(outputFormat = "json")
    // (id, expected (heading, text, table, picture)) per doc_id%3 slice
    val expect = Seq(42L -> (1, 1, 0, 0), 43L -> (0, 0, 1, 0), 41L -> (1, 2, 0, 1),
      34L -> (0, 0, 0, 1)) // 34 % 10 == 4 -> png (picture-only)
    expect.foreach { case (id, (h, t, tb, p)) =>
      val (name, bytes) = KernelQueries.fileFor(id, 99L)
      val r = ConvertKernel.convertOne(name, bytes, cfg, batchMode = true)
      assert(r.error == null)
      val kinds = "\"kind\":\"([a-z]+)\"".r
        .findAllMatchIn(r.markdown).map(_.group(1)).toSeq
      assert(kinds.count(_ == "heading") == h, s"doc$id headings in ${r.markdown}")
      assert(kinds.count(_ == "text") == t, s"doc$id texts in ${r.markdown}")
      assert(kinds.count(_ == "table") == tb, s"doc$id tables in ${r.markdown}")
      assert(kinds.count(_ == "picture") == p, s"doc$id pictures in ${r.markdown}")
    }
  }

  test("k2 runs end-to-end: from_json re-ingestion yields the per-slice counts") {
    val df = graft.SparkEntry.queries("k2_json_elements")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq(
      "doc_id", "filename", "n_heading", "n_text", "n_table", "n_picture", "error"))
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 10 == 7) {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
          s"error row $id must carry NULL counts")
        assert(!r.isNullAt(6))
      } else {
        val expected =
          if (id % 10 == 4) (0L, 0L, 0L, 1L) // png slice: picture only
          else (id % 3) match {
            case 0 => (1L, 1L, 0L, 0L)
            case 1 => (0L, 0L, 1L, 0L)
            case _ => (1L, 2L, 0L, 1L)
          }
        assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) == expected,
          s"doc $id counts")
      }
    }
  }

  test("k1 runs end-to-end on the fixture corpus") {
    val df = KernelQueries.specs.head.fn(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("doc_id", "filename", "md_len", "n_images", "error"))
    val errs = rows.filter(r => !r.isNullAt(4))
    assert(errs.nonEmpty, "the doc_id%10==7 slice must produce error rows")
    assert(errs.forall(r => r.getString(4).startsWith("Unsupported file format: doc")))
    val imgs = rows.filter(r => r.getLong(3) == 1L)
    assert(imgs.nonEmpty, "html docs must carry one spliced image")
  }
}
