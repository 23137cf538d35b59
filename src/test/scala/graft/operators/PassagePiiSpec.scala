package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.Row

/** Brute-force parity checks for d9 (passage-level exact dedup) and t13
  * (PII scrub): recompute both results locally in plain Scala from the
  * collected fixture text and compare row-for-row. The DuckDB oracle is
  * the cross-engine gate; this pins the semantics inside the JVM so a
  * regex-dialect or chunking regression fails fast in `sbt test`.
  */
class PassagePiiSpec extends SparkTestBase {

  test("d9 passage dedup matches a brute-force local recomputation") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id", $"text").as[(Long, String)].collect()

    // local recomputation: consecutive 10-word chunks, full windows only
    val passages = docs.flatMap { case (id, text) =>
      val ws = text.trim.split("\\s+")
      (0 until ws.length / 10).map(i => (id, ws.slice(i * 10, i * 10 + 10).mkString(" ")))
    }
    val expected = passages.groupBy(_._2).collect {
      case (p, occ) if occ.map(_._1).distinct.length > 1 =>
        (occ.map(_._1).distinct.length.toLong, occ.length.toLong, occ.map(_._1).min)
    }.toSeq.sorted

    val got = graft.SparkEntry.queries("d9_passage_dedup")(spark, sfDir)
      .collect().map { case Row(_: String, nDocs: Long, nOcc: Long, first: Long) =>
        (nDocs, nOcc, first)
      }.toSeq.sorted

    assert(got == expected, s"got ${got.size} rows, expected ${expected.size}")
    assert(expected.nonEmpty, "fixture should contain duplicated passages")
  }

  test("d10 winnowing matches a brute-force local recomputation") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id", $"text").as[(Long, String)].collect()

    // local winnowing: 3-word shingle polyhash, min per 4-hash window
    val fps = docs.flatMap { case (id, text) =>
      val ws = text.trim.split("\\s+")
      val hs = (0 until ws.length - 2).map(i =>
        TextAnalysis.polyHashJvm(ws(i) + " " + ws(i + 1) + " " + ws(i + 2)))
      hs.sliding(4).filter(_.size == 4).map(w => (id, w.min)).toSeq.distinct
    }
    val expected = fps.groupBy(_._2).collect {
      case (fp, occ) if occ.map(_._1).distinct.size > 1 =>
        (fp, occ.map(_._1).distinct.size.toLong, occ.map(_._1).min)
    }.toSeq.sorted

    val got = graft.SparkEntry.queries("d10_winnowed_dups")(spark, sfDir)
      .collect().map { case Row(fp: Long, nDocs: Long, first: Long) =>
        (fp, nDocs, first)
      }.toSeq.sorted

    assert(got == expected, s"got ${got.size} rows, expected ${expected.size}")
    assert(expected.nonEmpty, "fixture should contain shared winnowed fingerprints")
  }

  test("t13 PII scrub redacts every planted email/ip/phone exactly once") {
    val rows = graft.SparkEntry.queries("t13_pii_scrub")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") == 1L, s"emails in $r")
      assert(r.getAs[Long]("n_ips") == 1L, s"ips in $r")
      assert(r.getAs[Long]("n_phones") == 1L, s"phones in $r")
    }
  }

  test("t13 scrub markers replace the PII spans verbatim") {
    import spark.implicits._
    // recompute one doc's scrub locally with java.util.regex and compare
    // the fingerprint the query ships
    val (id, text) = Tables(spark, sfDir, "documents")
      .filter($"text".isNotNull).select($"doc_id", $"text")
      .as[(Long, String)].head()
    val raw = s"$text contact user$id@mail${id % 7}.example.com from 10." +
      s"${id % 200}.0.${id % 250} call +1-555-" + f"${id % 10000}%04d"
    val scrubbed = raw
      .replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
      .replaceAll("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
      .replaceAll("\\+\\d-\\d{3}-\\d{4}", "<PHONE>")
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(scrubbed.getBytes("UTF-8")).map("%02x".format(_)).mkString

    val got = graft.SparkEntry.queries("t13_pii_scrub")(spark, sfDir)
      .filter($"doc_id" === id).head()
    assert(got.getAs[String]("fp") == fp)
    assert(got.getAs[Long]("scrub_len") == scrubbed.length.toLong)
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<IP>") &&
      scrubbed.contains("<PHONE>"))
  }
}
