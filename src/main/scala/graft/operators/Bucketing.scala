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

  /** Buckets for [[bucketedFixture]]. At lake scale this is sized so one
    * bucket of the biggest table is a few hundred MB (thousands of
    * buckets); the VALUE of the technique is bucket-count-invariant —
    * both sides hash-route by the same function, so the join plans
    * exchange-free at any count — and 16 keeps fixture staging cheap. */
  val FixtureBuckets: Int = 16

  /** Write-once bucketed (lineitem, orders) pair for q68 — both sides
    * bucketed AND sorted by their join key at [[FixtureBuckets]], the
    * layout a warehouse stages once so every subsequent fact⋈fact query
    * on the key joins with no shuffle on either side. Managed tables
    * (bucket metadata needs the catalog); the source-fingerprint marker
    * lives under the fixture root like the parquet layout stagings, and
    * an up-to-date pair launches no job. */
  private[graft] def bucketedFixture(s: SparkSession, dir: String)
      : (String, String) = {
    val base = new java.io.File(dir).getName
      .replaceAll("[^A-Za-z0-9_]", "_").toLowerCase
    val liT = s"li_bkt_$base"
    val oT = s"ord_bkt_$base"
    if (verifiedPairs.contains(liT)) return (liT, oT)
    val root = new java.io.File(sys.props.getOrElse("graft.fixture.dir",
      sys.props("user.dir") + "/data"))
    root.mkdirs()
    val stamp = s"v1:${Multimodal.sourceFingerprint(
      new java.io.File(dir, "lineitem.parquet"))}:${
      Multimodal.sourceFingerprint(new java.io.File(dir, "orders.parquet"))}"
    val marker = new java.io.File(root, s"bkt_$base.staged")
    val upToDate = marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == stamp &&
      s.catalog.tableExists(liT) && s.catalog.tableExists(oT)
    if (!upToDate) {
      // Restage from scratch: a FRESH session's in-memory catalog has no
      // memory of the tables, but a previous JVM's managed locations can
      // still sit under spark-warehouse/ — and saveAsTable(Overwrite) on
      // an uncataloged name whose location exists fails with
      // LOCATION_ALREADY_EXISTS (caught by the r13 verify sweep). Drop
      // whatever the catalog knows AND delete any orphaned location.
      Seq(liT, oT).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        // resolve + delete through Hadoop's FileSystem so a non-file:
        // warehouse URI (hdfs/s3a on a real cluster) is handled the same
        // way saveAsTable will resolve it (ADVICE r13: string surgery on
        // the URI silently no-ops off local disk)
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) { fs.delete(loc, true); () }
      }
      writeBucketed(graft.Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        liT, "l_orderkey", FixtureBuckets)
      writeBucketed(graft.Tables(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority"),
        oT, "o_orderkey", FixtureBuckets)
      java.nio.file.Files.write(marker.toPath, stamp.getBytes)
      ()
    }
    verifiedPairs.add(liT)
    (liT, oT)
  }

  private val verifiedPairs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
