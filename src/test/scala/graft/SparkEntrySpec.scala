package graft

/** The driver contract itself: `entry` must smoke (rows > 0 at
  * sf0.001), every registered query name must be well-formed and
  * unique, and every oracle key must point at a registered query —
  * the invariants the driver's harness assumes before it runs
  * anything. */
class SparkEntrySpec extends SparkTestBase {

  test("entry returns rows at sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique, well-formed, and cover every oracle key") {
    val specs = Seq(
      operators.Relational.specs, operators.TextAnalysis.specs,
      operators.Dedup.specs, operators.MinHashDedup.specs,
      operators.Similarity.specs, operators.Multimodal.specs,
      operators.KernelQueries.specs, operators.Mixing.specs,
      operators.Sketches.specs, operators.Graph.specs,
      streaming.StreamQueries.specs).flatten
    val names = specs.map(_.name)
    assert(names.distinct.length == names.length,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    assert(names.forall(_.matches("[a-z][a-z0-9_]+")),
      s"ill-formed names: ${names.filterNot(_.matches("[a-z][a-z0-9_]+"))}")
    assert(SparkEntry.queries.keySet == names.toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // the by-design rows-only set stays exactly as documented
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("d4_minhash_lsh_pairs", "d12_minhash_incremental",
      "x1_hll_distinct_users", "x2_approx_length_quantiles",
      "x10_kll_length_quantiles"),
      s"rows-only set drifted: $noOracle")
  }
}
