package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: replicate an sf directory k× with
  * consistent key shifts, producing the next scale factor for slope
  * measurement (SCALING.md; VERDICT r6 next-round #1 — every perf claim
  * was sf0.1-only). This is a measurement tool, not a data generator for
  * correctness: the DuckDB oracle still runs at the driver's sf0.01.
  *
  * Scaling rules, chosen so each query family's WORK scales linearly the
  * way a real corpus grows, with no degenerate blowups:
  *
  *  - Fact/dimension keys shift by `copy * 1_000_000` (larger than any
  *    source key), applied consistently across every FK edge
  *    (orders.o_custkey ↔ customer.c_custkey, lineitem.l_* ↔
  *    orders/part/supplier, events.user_id ↔ customer.c_custkey), so
  *    join fan-outs and group cardinalities scale 10× — not 100×.
  *  - region/nation stay fixed (TPC-H dimensions are SF-invariant).
  *  - Timestamps stay in the source range: 10× event/order density in
  *    the same window — so streaming watermarks and windowed aggregates
  *    see 10× rows per window, which is how ingest actually grows.
  *    events.ts is copied verbatim in its on-disk representation
  *    (nanosAsLong set for the legacy INT64-nanos vintage; the current
  *    timestamp[us] NTZ vintage round-trips as NTZ) so [[Tables]]'
  *    dtype-branched normalization applies to the output identically.
  *  - documents.text is remapped per copy with a 1:1 letter translation
  *    (rotations of a 26-letter alphabet; copy 0 is the identity), so
  *    each copy keeps its internal near-dup structure (shingle/minhash/
  *    Jaccard relations are preserved within a copy) but shares no
  *    vocabulary across copies: dedup pair counts scale ~10×, never the
  *    ~100× a verbatim replication would produce. Token/char lengths are
  *    preserved, so length/shape statistics scale cleanly.
  *  - embeddings are transformed per copy by a SIGNED circular rotation
  *    — rotate by `copy % dim` positions, then flip the sign of ~half
  *    the coordinates according to a splitmix64 bit pattern keyed by
  *    `copy / dim` (group 0 is the identity pattern, so copies 0..dim-1
  *    stay pure rotations like the original scheme — shift assignment
  *    is `i % dim` now, not `i*dim/k`, both valid spreads: measured
  *    max |cos(x, rot_s(x))| ≈ 0.45 for ANY step s on the fixture
  *    vectors, far below pair thresholds). Both
  *    stages are orthogonal transforms, so norms and every WITHIN-copy
  *    dot product are preserved exactly (cosine pairs, ANN bucket
  *    structure, IVF geometry all scale ~k), while distinct
  *    (shift, sign-group) pairs keep copies in mutually
  *    far-from-parallel directions up to k = dim * 2^63 — the sign
  *    stage is what lifts the old k <= dim ceiling that kept sf10
  *    embedding-free. Cross-group relative patterns flip ~dim/2
  *    coordinates, so same-base-vector copies across groups have
  *    cosine ≈ Σ±x_j²/|x|² — centered at 0, far below pair thresholds
  *    for coordinate-spread embeddings.
  *
  * Usage: `sbt "runMain graft.ScaleUp <srcDir> <dstDir> [k] [tables]"`
  * where `tables` is an optional comma list restricting which tables are
  * generated (dimensions region/nation are always written).
  * Output is written once; re-running overwrites deterministically (same
  * values, file-internal row order may differ).
  */
object ScaleUp {
  val KeyStride = 1000000L

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** dim sign factors (±1) for an embedding copy group. Group 0 is all
    * +1 — the identity — so copies 0..dim-1 stay pure rotations; later
    * groups draw their bits from splitmix64 words seeded by the group
    * index, flipping ~dim/2 coordinates (ScaleUpSpec pins balance and
    * pairwise distance). */
  def signPattern(group: Int, dim: Int): IndexedSeq[Float] =
    if (group == 0) IndexedSeq.fill(dim)(1.0f)
    else (0 until dim).map { j =>
      val word = splitmix64(group.toLong * 8 + j / 64)
      if (((word >>> (j % 64)) & 1L) == 1L) -1.0f else 1.0f
    }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._

    def raw(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** One-scan k× replication: explode a 0..k-1 copy index, shift the
      * key columns by copy*stride, keep everything else verbatim. */
    def copies(df: DataFrame, keyCols: Seq[String]): DataFrame = {
      val withCopy = df.withColumn("copy",
        explode(sequence(lit(0L), lit(k - 1L))))
      keyCols.foldLeft(withCopy) { (d, c) =>
        d.withColumn(c, col(c) + $"copy" * KeyStride)
      }.drop("copy").select(df.columns.map(col).toIndexedSeq: _*)
    }

    val wanted: String => Boolean =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else _ => true

    def write(df: => DataFrame, name: String, files: Int): Unit =
      if (wanted(name) || name == "region" || name == "nation") {
        df.repartition(files)
          .write.mode("overwrite").parquet(s"$dst/$name.parquet")
        System.err.println(s"[scaleup] $name written ($files files)")
      } else System.err.println(s"[scaleup] $name skipped (not in table list)")

    // SF-invariant dimensions: verbatim
    write(raw("region"), "region", 1)
    write(raw("nation"), "nation", 1)

    write(copies(raw("customer"), Seq("c_custkey")), "customer", 4)
    write(copies(raw("supplier"), Seq("s_suppkey")), "supplier", 2)
    write(copies(raw("part"), Seq("p_partkey")), "part", 4)
    write(copies(raw("orders"), Seq("o_orderkey", "o_custkey")), "orders", 8)
    write(copies(raw("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem", 16)
    // ts copied in its on-disk representation (see scaladoc)
    write(copies(raw("events"), Seq("event_id", "user_id")), "events", 8)

    // documents: per-copy 1:1 letter substitution (translate needs
    // literal match/replace strings, so this is a k-branch union — the
    // source is small and scanned once per branch). The substitution is
    // an AFFINE permutation j -> (a*j + b) mod 26 with a coprime to 26
    // and (a, b) distinct per copy — 12*26 = 312 distinct permutations,
    // so copies share no vocabulary up to k = 312. (A plain rotation has
    // period 26/gcd — the first sf3 attempt used step-2 rotations,
    // period 13, and copies 13.. silently shared vocabulary with copies
    // 0.., inflating cross-copy near-dup pairs superlinearly.) Copy 0 is
    // (a=1, b=0): the identity.
    require(k <= 312, s"only 312 distinct letter permutations (k=$k)")
    val alphabet = "etaoinshrdlucmfwypvbgkjqxz"
    val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val docs = raw("documents")
    val docCopies = (0 until k).map { i =>
      val (a, b) = (coprimes(i % coprimes.length), i / coprimes.length)
      val subst = alphabet.indices.map(j => alphabet((a * j + b) % 26)).mkString
      docs.select(
        ($"doc_id" + i * KeyStride).as("doc_id"),
        translate($"text", alphabet, subst).as("text"),
        $"lang", $"source", $"n_chars")
    }.reduce(_ union _)
    write(docCopies, "documents", 8)

    // embeddings: signed circular rotation (see scaladoc). shift cycles
    // through the dim positions; the sign pattern advances one splitmix64
    // draw per full cycle, so every copy gets a distinct orthogonal
    // transform and copies 0..dim-1 match the original pure rotations.
    if (wanted("embeddings")) {
      val emb = raw("embeddings")
      val dim = emb.select(size($"embedding")).head.getInt(0)
      val embCopies = (0 until k).map { i =>
        val shift = i % dim
        val group = i / dim
        val rotated =
          if (shift == 0) $"embedding"
          else concat(
            slice($"embedding", shift + 1, dim - shift),
            slice($"embedding", 1, shift))
        val signed =
          if (group == 0) rotated
          else zip_with(rotated, array(signPattern(group, dim).map(lit): _*),
            (x, sgn) => x * sgn)
        emb.select(
          ($"vec_id" + i * KeyStride).as("vec_id"),
          signed.as("embedding"),
          $"label")
      }.reduce(_ union _)
      write(embCopies, "embeddings", if (k > 32) 16 else 4)
    } else System.err.println("[scaleup] embeddings skipped (not in table list)")

    System.err.println(s"[scaleup] done: $src x$k -> $dst")
    spark.stop()
  }
}
