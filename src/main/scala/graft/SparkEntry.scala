package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operator surface is registered as [[QuerySpec]]s in the per-plane
  * objects under graft.operators; this object only aggregates them.
  */
object SparkEntry {

  private def allSpecs: Seq[QuerySpec] =
    operators.Relational.specs ++
      operators.TextAnalysis.specs ++
      operators.Dedup.specs ++
      operators.MinHashDedup.specs ++
      operators.Similarity.specs ++
      operators.Multimodal.specs ++
      operators.KernelQueries.specs ++
      operators.Mixing.specs ++
      operators.Sketches.specs ++
      operators.Graph.specs ++
      streaming.StreamQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The REAL ingest→convert pipeline (k1): deterministic staging corpus
    * from the documents table through Pipeline.convertDirectory —
    * binaryFile scan → columnar pre-checks → mapPartitions kernel
    * (SURVEY.md §3.1 / §7.3). */
  def entry(spark: SparkSession): DataFrame =
    queries("k1_convert_directory")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
