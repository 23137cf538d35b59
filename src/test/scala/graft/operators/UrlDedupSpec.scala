package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** d17's canonicalization contract, pinned from inside Spark (the DuckDB
  * oracle pins the cross-engine replay; these pin the SEMANTICS):
  * case/www/default-port/tracking/fragment junk must collapse, genuinely
  * different URLs must NOT, and the blocklist must hold.
  */
class UrlDedupSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val out =
    graft.SparkEntry.queries("d17_url_dedup")(spark, sfDir).collect()

  test("blocked domains never surface") {
    val domains = out.map(_.getString(0)).toSet
    val blocked = Set("d3.example.com", "d7.example.com", "d13.example.com")
    assert(domains.intersect(blocked).isEmpty, s"blocklist leaked: $domains")
    // …and the blocklist actually removed something: the synthesis cycles
    // g % 40, so every dN domain exists pre-filter
    assert(domains.size == 40 - blocked.size,
      s"expected ${40 - blocked.size} surviving domains, got ${domains.size}")
  }

  test("junk variants collapse; real differences survive") {
    // every doc triple (g = doc_id div 3) shares one true page, except
    // members wearing the every-11th :8080 port, which are genuinely
    // different URLs and must stay separate pages
    val docs = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id").as[Long].collect()
    val expectedPages = docs
      .groupBy(id => id / 3)
      .filter { case (g, _) => g % 40 != 3 && g % 40 != 7 && g % 40 != 13 }
      .map { case (_, ids) =>
        // the shared page (if any non-:8080 member exists) + one page per
        // :8080 member
        (if (ids.exists(_ % 11 != 0)) 1 else 0) + ids.count(_ % 11 == 0)
      }
      .sum
    val gotPages = out.map(_.getLong(1)).sum
    assert(gotPages == expectedPages,
      s"canonicalizer page count $gotPages != expected $expectedPages — " +
        "a normalization rule over- or under-merges")
    // doc accounting: every unblocked doc lands in exactly one page
    val expectedDocs = docs.count(id => {
      val d = (id / 3) % 40
      d != 3 && d != 7 && d != 13
    })
    assert(out.map(_.getLong(2)).sum == expectedDocs)
  }
}
