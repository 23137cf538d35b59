package graft

/** The correctness dump must turn a broken query into a VISIBLE red
  * (VERDICT r7 next-round #3): an errors.json entry with the failure
  * message, alongside successful dumps — never a silent absence.
  */
class VerifyErrorsSpec extends SparkTestBase {

  private def readJson(path: java.nio.file.Path): Map[String, String] = {
    // minimal flat {"k":"v"} reader sufficient for the files Verify writes
    val s = new String(java.nio.file.Files.readAllBytes(path), "UTF-8").trim
    if (s == "{}") Map.empty
    else s.stripPrefix("{").stripSuffix("}")
      .split("\",")
      .map { kv =>
        val Array(k, v) = kv.split("\":", 2)
        k.trim.stripPrefix("\"") ->
          v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
  }

  test("a query that dies leaves an errors.json entry, not a silent absence") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_err")
    // nonexistent sf dir: the scan fails at analysis for every query —
    // the exact failure class that silently vanished 13 rows in r7
    val errs = Verify.run(spark, "/nonexistent/sfdir", out.toString,
      Some(Set("q1_pricing_summary", "q2_revenue_forecast")))
    assert(errs.keySet == Set("q1_pricing_summary", "q2_revenue_forecast"))
    val onDisk = readJson(out.resolve("errors.json"))
    assert(onDisk.keySet == errs.keySet)
    onDisk.values.foreach(msg => assert(msg.nonEmpty))
    // oracle_sql.json is still written so the driver sees the full
    // registered surface even on a red run
    assert(java.nio.file.Files.exists(out.resolve("oracle_sql.json")))
  }

  test("a healthy run writes an EMPTY errors.json (file present, no entries)") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_ok")
    val errs = Verify.run(spark, sfDir, out.toString,
      Some(Set("q2_revenue_forecast")))
    assert(errs.isEmpty)
    assert(readJson(out.resolve("errors.json")).isEmpty)
    assert(java.nio.file.Files.isDirectory(out.resolve("q2_revenue_forecast")))
  }
}
