package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's tail-line contract (VERDICT r16 #1).
  *
  * The driver parses only the last ~2000 chars of Bench's output; the
  * final line must therefore be a short, self-contained JSON total. It
  * regressed three times (r9, r10, r16 — the last when the roster-sized
  * per-query `jobs` map rode in through a shared context string), each
  * time costing the driver's cross-round dashboard a machine-readable
  * total. These checks make the contract executable: realistic fields
  * stay far under the window, and a roster-sized leak refuses loudly at
  * bench time instead of shipping `parsed: null`.
  */
class BenchShortLineSpec extends AnyFunSuite {

  private val realisticContext =
    ""","warmup_sec":4.21,"staged_cold":false,"dispatch_ms_per_job":13.45"""
  private val realisticLoad =
    ""","loadavg":[0.42,0.51,0.63],"loadavg_start":[0.38,0.49,0.61],"cpu_steal_pct":0.24"""

  test("realistic short line stays well inside the driver's tail window") {
    val line = Bench.shortLine(
      279.714, 257, 0, "/root/testdata/sf0.1", realisticContext, realisticLoad)
    assert(line.length < 400, s"short line is ${line.length} chars")
    // self-contained JSON object on one line: balanced braces, no newline
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(!line.contains("\n"))
    // the fields the driver's dashboard reads
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"n_queries\":257"))
    assert(line.contains("\"n_errors\":0"))
    // the roster-sized fields must NOT be here
    assert(!line.contains("\"jobs\""))
    assert(!line.contains("\"queries\""))
    assert(!line.contains("\"families\""))
  }

  test("a roster-sized field leaking into the short line refuses loudly") {
    // simulate the r16 regression: 257 per-query job counts (~16KB)
    val jobsLeak = ""","jobs":{""" + (1 to 257).map(i =>
      s""""q${i}_some_query_name_of_typical_length":${i % 40}""")
      .mkString(",") + "}"
    val ex = intercept[IllegalArgumentException] {
      Bench.shortLine(279.714, 257, 0, "/root/testdata/sf0.1",
        realisticContext + jobsLeak, realisticLoad)
    }
    assert(ex.getMessage.contains("short"))
  }
}
