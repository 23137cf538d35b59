package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the co-located join technique for 100 TB fact
  * tables (SURVEY §4 / builder brief: "bucketing for co-located joins").
  *
  * Writing both join sides bucketed by the join key with the same bucket
  * count lets Spark plan the join with NO shuffle exchange on either side
  * — at warehouse scale this turns every fact⋈fact query on the bucket
  * key from a full-network shuffle into local merges. BucketingSpec
  * proves the exchange-free plan and result parity on the fixture tables.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (bucketBy requires the table
    * catalog; plain parquet paths cannot carry bucket metadata). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
