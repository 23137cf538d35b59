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
  *    events.ts is kept as raw INT64 nanos (read with nanosAsLong,
  *    written back as a plain long) so [[Tables]]' µs rebuild applies to
  *    the output identically.
  *  - documents.text is remapped per copy with a 1:1 letter translation
  *    (rotations of a 26-letter alphabet; copy 0 is the identity), so
  *    each copy keeps its internal near-dup structure (shingle/minhash/
  *    Jaccard relations are preserved within a copy) but shares no
  *    vocabulary across copies: dedup pair counts scale ~10×, never the
  *    ~100× a verbatim replication would produce. Token/char lengths are
  *    preserved, so length/shape statistics scale cleanly.
  *  - embeddings rotate circularly by `copy * dim/k` positions: norms
  *    are preserved, but copies of a vector point in (near-orthogonal)
  *    different directions, so cosine-threshold pair counts and ANN
  *    bucket occupancies scale ~10× rather than collapsing every copy
  *    into one near-duplicate ball.
  *
  * Usage: `sbt "runMain graft.ScaleUp <srcDir> <dstDir> [k] [tables]"`
  * where `tables` is an optional comma list restricting which tables are
  * generated (dimensions region/nation are always written). Needed past
  * k=64: the embeddings rotation runs out of distinct circular shifts at
  * k=dim, so an sf10 (k=100) dir is generated WITHOUT embeddings and the
  * embedding-family queries keep sf1 as their largest measured point.
  * Output is written once; re-running overwrites deterministically (same
  * values, file-internal row order may differ).
  */
object ScaleUp {
  val KeyStride = 1000000L

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
    // ts stays a raw nanos long (see scaladoc)
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

    // embeddings: circular rotation by copy*dim/k positions
    if (wanted("embeddings")) {
      val emb = raw("embeddings")
      val dim = emb.select(size($"embedding")).head.getInt(0)
      require(k <= dim,
        s"k=$k > dim=$dim: circular shifts would repeat and copies would " +
          "collapse into near-duplicate directions")
      val embCopies = (0 until k).map { i =>
        val shift = i * dim / k
        val rotated =
          if (shift == 0) $"embedding"
          else concat(
            slice($"embedding", shift + 1, dim - shift),
            slice($"embedding", 1, shift))
        emb.select(
          ($"vec_id" + i * KeyStride).as("vec_id"),
          rotated.as("embedding"),
          $"label")
      }.reduce(_ union _)
      write(embCopies, "embeddings", 4)
    } else System.err.println("[scaleup] embeddings skipped (not in table list)")

    System.err.println(s"[scaleup] done: $src x$k -> $dst")
    spark.stop()
  }
}
