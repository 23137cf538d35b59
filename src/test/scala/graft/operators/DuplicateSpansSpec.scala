package graft.operators

import graft.SparkTestBase

/** Pins d14's exact-substring span semantics on synthetic corpora where
  * the expected extents are computable by hand (the sf oracles prove the
  * relational pipeline; these prove the SEMANTICS — merge rule, within-doc
  * repetition, boundary behavior — at a readable gram width k=3).
  * Filler tokens are globally unique so no accidental gram duplicates.
  */
class DuplicateSpansSpec extends SparkTestBase {
  import org.apache.spark.sql.Row

  private def spansOf(docs: Seq[(Long, String)], k: Int = 3): Seq[Row] = {
    import spark.implicits._
    Dedup.duplicateSpansOn(spark, docs.toDF("doc_id", "text"), k)
      .orderBy($"doc_id", $"span_start")
      .collect().toSeq
  }

  test("a shared run merges into one maximal span per document") {
    // 5-word run shared at different offsets: duplicated 3-gram starts are
    // consecutive inside the run and absent at the unique-context edges
    val out = spansOf(Seq(
      1L -> "u1 u2 x1 x2 x3 x4 x5 u3 u4",
      2L -> "v1 x1 x2 x3 x4 x5 v2 v3 v4 v5"))
    assert(out === Seq(
      Row(1L, 3L, 7L, 5L),
      Row(2L, 2L, 6L, 5L)))
  }

  test("within-doc repetition is duplicated; gap > k splits spans") {
    // "y1 y2 y3" at positions 1 and 7 of the same doc (gap 6 > k=3):
    // two separate 3-token spans, no other doc involved
    val out = spansOf(Seq(3L -> "y1 y2 y3 f1 f2 f3 y1 y2 y3"))
    assert(out === Seq(
      Row(3L, 1L, 3L, 3L),
      Row(3L, 7L, 9L, 3L)))
  }

  test("gap == k merges overlapping-or-adjacent extents") {
    // duplicated starts at 1 and 4 (gap exactly k=3): extents [1,3] and
    // [4,6] are adjacent token ranges -> one 6-token span
    val out = spansOf(Seq(4L -> "z1 z2 z3 z1 z2 z3 f4 f5"))
    assert(out === Seq(Row(4L, 1L, 6L, 6L)))
  }

  test("docs shorter than the gram width contribute nothing") {
    assert(spansOf(Seq(5L -> "a b", 6L -> "c d")).isEmpty)
  }

  test("d15 excises exactly the d14 extents and keeps everything else") {
    import spark.implicits._
    // fixture-shaped micro-check at the real gram width k=8: two docs
    // share a 9-word run; each must lose exactly those 9 tokens
    val docs = Seq(
      10L -> "p1 p2 s1 s2 s3 s4 s5 s6 s7 s8 s9 p3 p4",
      11L -> "r1 s1 s2 s3 s4 s5 s6 s7 s8 s9 r2 r3 r4 r5").toDF("doc_id", "text")
    val spans = Dedup.duplicateSpansOn(spark, docs)
      .orderBy($"doc_id").collect().toSeq
    assert(spans === Seq(Row(10L, 3L, 11L, 9L), Row(11L, 2L, 10L, 9L)))
    // d15's scrub path over the same frame, via the same join+merge-walk
    // the registered query uses (the query itself is pinned by the
    // DuckDB oracle at every fixture scale)
    val out = graft.SparkEntry.queries("d15_span_scrub")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val clean = r.getString(1)
      assert(!clean.startsWith(" ") && !clean.endsWith(" ") &&
        !clean.contains("  "), s"malformed rejoin for doc ${r.getLong(0)}")
    }
  }

  test("d14 on the fixture corpus emits well-formed, doc-sorted spans") {
    val rows = graft.SparkEntry.queries("d14_duplicate_spans")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "sf0.001 corpus shares no 8-gram? d6 says it does")
    rows.foreach { r =>
      val (s, e, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(e >= s && n === e - s + 1 && n >= Dedup.SpanGram, r.toString)
    }
    val perDoc = rows.groupBy(_.getLong(0)).values
    // spans within a doc are disjoint with a gap: merge rule left nothing
    // mergeable behind
    perDoc.foreach { rs =>
      rs.map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(s2 > e1 + 1, s"adjacent spans unmerged: ${rs.toSeq}")
        case _ =>
      }
    }
  }
}
