package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.SparkTestBase

/** End-to-end library surface: a directory of mixed real files through
  * source → validate → detect → kernel → results (SURVEY §3.1), the flow a
  * reference batch-convert user would switch to.
  */
class PipelineSpec extends SparkTestBase {

  private def write(dir: Path, name: String, bytes: Array[Byte]): Unit =
    Files.write(dir.resolve(name), bytes)

  test("convertDirectory: converts, rejects and 413s per file, error-as-column") {
    val dir = Files.createTempDirectory("graft-pipeline")
    write(dir, "notes.md", "# Hello\n\nBody.".getBytes(StandardCharsets.UTF_8))
    write(dir, "data.csv", "a,b\n1,2\n".getBytes(StandardCharsets.UTF_8))
    // an MP3 mislabeled as markdown: magic sniff must reject it
    write(dir, "song.md", "ID3".getBytes ++ Array[Byte](4, 0) ++ Array.fill[Byte](64)(7))
    // over the (test-sized) 1 MB cap
    write(dir, "big.md", ("# big\n\n" + "x" * (1100 * 1024)).getBytes(StandardCharsets.UTF_8))

    val out = Pipeline.convertDirectory(spark, dir.toString, maxFileMb = 1)
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(3)))).toMap

    assert(out.size == 4)
    // converted rows report the stem (kernel success naming)
    assert(out("notes")._1 == Some("# Hello\n\nBody."))
    assert(out("notes")._2.isEmpty)
    assert(out("data")._1 == Some("| a | b |\n|---|---|\n| 1 | 2 |"))
    // pre-pass error rows report the full filename (batch mode)
    assert(out("song.md")._1.isEmpty)
    assert(out("song.md")._2 == Some("Unsupported file format: song.md"))
    assert(out("big.md")._2 ==
      Some(ingest.UploadValidation.fileTooLargeError(1)))
  }

  test("convertDirectoryObserved reports run metrics from the conversion action itself") {
    val dir = Files.createTempDirectory("graft-pipeline-obs")
    write(dir, "a.md", "# A\n\nOne.".getBytes(StandardCharsets.UTF_8))
    write(dir, "b.csv", "x,y\n1,2\n".getBytes(StandardCharsets.UTF_8))
    write(dir, "bad.md", "ID3".getBytes ++ Array[Byte](4, 0) ++ Array.fill[Byte](16)(9))

    val (out, obs) = Pipeline.convertDirectoryObserved(spark, dir.toString)
    val rows = out.collect() // one action; metrics ride it as accumulators
    val m = obs.get

    assert(m("n_docs") == 3L)
    assert(m("n_errors") == 1L)
    val expectedChars = rows.map(r => Option(r.getString(1)).map(_.length.toLong).getOrElse(0L)).sum
    assert(m("markdown_chars") == expectedChars && expectedChars > 0)
  }

  test("convertDirectoryIncremental converts only new files across runs") {
    val dir = Files.createTempDirectory("graft-pipeline-inc")
    val ledger = Files.createTempDirectory("graft-pipeline-ledger").toString + "/ledger"
    write(dir, "one.md", "# One".getBytes(StandardCharsets.UTF_8))
    write(dir, "two.md", "# Two".getBytes(StandardCharsets.UTF_8))

    val (r1, done1) = Pipeline.convertDirectoryIncremental(spark, dir.toString, ledger)
    val names1 = r1.collect().map(_.getString(0)).toSet
    assert(done1 == 0L)
    assert(names1 == Set("one", "two"))

    // second run: one new file, one grown file (re-converts), one unchanged
    write(dir, "three.md", "# Three".getBytes(StandardCharsets.UTF_8))
    write(dir, "two.md", "# Two grew".getBytes(StandardCharsets.UTF_8))
    val (r2, done2) = Pipeline.convertDirectoryIncremental(spark, dir.toString, ledger)
    val out2 = r2.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(done2 == 2L, s"ledger should know 2 done files, knew $done2")
    assert(out2.keySet == Set("three", "two"), out2.keySet.toString)
    assert(out2("two") == "# Two grew")

    // third run: nothing new
    val (r3, done3) = Pipeline.convertDirectoryIncremental(spark, dir.toString, ledger)
    assert(r3.collect().isEmpty)
    assert(done3 >= 3L)
  }

  test("convertDirectory honors the requested output format end-to-end") {
    val dir = Files.createTempDirectory("graft-pipeline-json")
    write(dir, "notes.md", "# Hello\n\nBody.".getBytes(StandardCharsets.UTF_8))
    val config = kernel.ConvertKernel.ConversionConfig(outputFormat = "json")
    val out = Pipeline.convertDirectory(spark, dir.toString, config = config)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("notes") ==
      """{"name":"notes.md","items":[{"kind":"heading","level":1,"text":"Hello"},{"kind":"text","text":"Body."}]}""")
  }

  test("convertDirectory single mode reports stems in error rows") {
    val dir = Files.createTempDirectory("graft-pipeline-single")
    write(dir, "song.md", "ID3".getBytes ++ Array[Byte](4, 0) ++ Array.fill[Byte](64)(7))
    val out = Pipeline.convertDirectory(spark, dir.toString, batchMode = false)
      .collect().map(r => (r.getString(0), r.getString(3)))
    assert(out.toSeq == Seq(("song", "Unsupported file format: song.md")))
  }
}
