package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins e16's add-column contract: evolving the schema rewrites no
  * standing byte, the merged read surfaces NULL (never a default) for
  * the new column on pre-evolution files, and schema merging does not
  * cost the scan its stats pruning — the box bounds still reach the
  * parquet reader as pushed filters across both schema generations.
  * Value semantics are pinned by e16's DuckDB oracle. */
class SchemaEvolutionSpec extends SparkTestBase {

  private val dir = sfDir

  test("old files stay valid under the new schema: nulls, no rewrites, pruning intact") {
    import spark.implicits._
    val root = new java.io.File(Mixing.schemaEvolvedRoot(spark, dir))
    val standing = new java.io.File(root, "standing")
    val snapshot = standing.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap

    val merged = spark.read.option("mergeSchema", "true").parquet(
      standing.getAbsolutePath,
      new java.io.File(root, "delta").getAbsolutePath)
    assert(merged.columns.contains("l_tax"),
      "merged schema lost the evolved column")
    // the standing split surfaces NULL for the evolved column; the
    // delta split carries real values
    val (standingTax, deltaTax) = (
      merged.filter($"l_orderkey" % 5 =!= 0 && $"l_tax".isNotNull).count(),
      merged.filter($"l_orderkey" % 5 === 0 && $"l_tax".isNotNull).count())
    assert(standingTax == 0,
      s"pre-evolution rows carry non-null l_tax ($standingTax)")
    assert(deltaTax > 0, "the evolved split carries no values — degenerate")

    // evolution rewrote nothing
    val after = standing.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    assert(after == snapshot, "schema evolution touched a standing file")

    // merged reads keep their pushed filters (evolution must not cost
    // the scan its stats pruning)
    val (pLo, pHi, sLo, sHi) = Mixing.e9Box(dir)
    val boxed = merged.filter($"l_partkey".between(pLo, pHi) &&
      $"l_suppkey".between(sLo, sHi))
    val plan = boxed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_partkey)"),
      s"box bounds not pushed through the merged scan:\n$plan")
    assert(boxed.count() > 0)
  }
}
