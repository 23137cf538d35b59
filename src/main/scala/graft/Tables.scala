package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (schemas: /root/repo/FIXTURES.md §A).
  *
  * All queries take the scale-factor directory as a runtime parameter so the
  * driver can point the same plan at sf0.001 / 0.01 / 0.1 (or, on a real
  * cluster, at a 100 TB lake path — nothing here is local-mode specific).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped in two fixture generations: INT64
    // TIMESTAMP(NANOS) (which Spark's reader rejects outright — read the
    // raw nanos and rebuild; values are µs-aligned so `div 1000` is
    // exact) and plain timestamp[us] with no UTC adjustment (arrives as
    // TIMESTAMP_NTZ; session TZ is pinned UTC everywhere, so a cast to
    // the session-TZ timestamp type is an identity relabel). Branch on
    // the dtype the scan actually produced so either vintage loads.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampType}
      df.schema("ts").dataType match {
        case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => df
        case _             => df.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else df
  }
}

/** One verifiable unit of engine surface: a Spark plan plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same tables.
  * Kernel / orchestration operators that cannot be expressed in SQL carry
  * `oracle = None` and are pinned by ScalaTest specs instead (SURVEY.md §5.3).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Deterministic cache release for query functions that persist reused
  * intermediates (d2's shingle lineage, t16's token frame, d6's gram
  * frame, d13's shingle rows): [[thenRelease]] eagerly materializes the
  * query's result executor-side (eager localCheckpoint — never a driver
  * collect; storage is bounded by the query OUTPUT, not its
  * intermediates, and is reclaimed by the ContextCleaner once the frame
  * becomes unreachable) and then unpersists the intermediates, so no
  * cache-manager entry outlives the query function. A long-lived session
  * (the HttpApi server, a notebook) therefore accumulates nothing across
  * queries — previously release relied on Verify/Bench calling
  * clearCache (VERDICT r6 "what's wrong" #1). Callers apply presentation
  * ordering AFTER release, so observable output is unchanged.
  *
  * Session conf `graft.eagerRelease=false` keeps the full lazy plan and
  * skips the release — used by PlanAuditSpec, whose assertions must see
  * the complete pipeline plan rather than the checkpoint-scan tail the
  * eager path exposes. The audited plan is identical to the production
  * plan's pre-checkpoint stages: the checkpoint only splits execution
  * into two jobs, it does not re-plan the upstream operators. */
private[graft] object Materialize {
  def thenRelease(result: DataFrame,
                  cached: org.apache.spark.sql.Dataset[_]*): DataFrame = {
    val eager = result.sparkSession.conf
      .getOption("graft.eagerRelease").forall(_.toBoolean)
    if (!eager) result
    else {
      val out = result.localCheckpoint(true)
      cached.foreach(_.unpersist(false))
      out
    }
  }

  /** Eager localCheckpoint + STATS REBASE — the per-round truncation for
    * iterative loops (connected components, PageRank, BFS/Bellman-Ford,
    * LPA, HITS). `localCheckpoint` preserves `optimizedPlan.stats` into
    * its LogicalRDD, and Spark's size-only join estimate MULTIPLIES the
    * children's sizeInBytes — so a loop that checkpoints a join of the
    * previous round's checkpoint compounds the preserved estimate
    * geometrically per round. At high round counts that stalls the
    * DRIVER in BigInteger multiplication under
    * SizeInBytesOnlyStatsPlanVisitor (the d27 sf1 hang, SCALING r13);
    * at fixed small round counts the loop still RETURNS a frame whose
    * sizeInBytes is astronomically wrong (10^36+ observed for the graph
    * family at sf0.01), which poisons any downstream composition — a
    * node-sized rank table with a 10^36 estimate will never clear
    * autoBroadcastJoinThreshold. Rebasing on the checkpointed RDD
    * restores default leaf stats; loop-carried frames are node-sized,
    * so the extra Row round-trip is noise next to the round's shuffles.
    * (Loops whose per-round plans only semi-join or aggregate the
    * carried frame — g5's peel, s11's broadcast k-means — do not
    * multiply carried stats and stay on plain localCheckpoint.) */
  def checkpointRebased(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    c.sparkSession.createDataFrame(c.rdd, c.schema)
  }

  /** [[checkpointRebased]] with a LAZY checkpoint (r19, guide §1.2):
    * same plan truncation + stats rebase, but the materializing job is
    * the CALLER'S next action over the frame instead of an immediate
    * eager pass — for step-function outputs consumed by the following
    * step (st17's per-batch labels/signatures) this removes one
    * driver-sequential job per output per step, and an output the
    * caller never reads (d28's one-shot discards the updated signature
    * set) is never computed at all. Bounded growth: the NEXT step's
    * first action materializes (and caches) the previous step's
    * checkpoint, so the un-truncated plan depth never exceeds one
    * step. */
  def checkpointRebasedLazy(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(false)
    c.sparkSession.createDataFrame(c.rdd, c.schema)
  }

  /** [[checkpointRebased]] whose materializing action doubles as the
    * caller's per-round scalar (r18, guide §1.2 "don't compute things
    * twice"): the iterative families all follow "checkpoint the round,
    * then read one convergence scalar from it", which as two separate
    * actions costs two driver-sequential jobs per round — the second a
    * full re-scan of the just-cached partitions. A LAZY localCheckpoint
    * materialized BY the scalar aggregation fuses them: one job computes
    * the round, caches it (localCheckpoint persists on first
    * computation), and folds the scalar. The returned frame is
    * stats-rebased exactly like [[checkpointRebased]]. */
  def checkpointRebasedAgg[T](df: DataFrame)(agg: DataFrame => T)
      : (DataFrame, T) = {
    val c = df.localCheckpoint(false)
    // release the lazy checkpoint if the materializing aggregate throws
    // (VERDICT r18 #4 — symmetry; convergence scalars don't throw
    // mid-loop today, but a leaked cache entry would outlive the query)
    val v = try agg(c) // one job: materialize the checkpoint + the scalar
      catch { case t: Throwable => c.unpersist(false); throw t }
    (c.sparkSession.createDataFrame(c.rdd, c.schema), v)
  }

  /** The loop families' shared shuffle-parallelism formula: one
    * partition per ~100k carried rows (edges for the graph loops, pairs
    * for CC), capped at the session's core count — scale-adaptive, so a
    * 100 TB edge list still gets hundreds of partitions while a
    * node-sized loop frame gets one. */
  def loopParts(s: SparkSession, rows: Long): Int =
    math.max(1, math.min(s.sparkContext.defaultParallelism,
      (rows / 100000L).toInt + 1))

  /** Run `body` under LOOP-SCOPED shuffle parallelism with AQE off,
    * restoring the session values after (r18, guide §2.2/§2.4). The
    * iterative families move node-/edge-sized frames per round; `parts`
    * is derived from that DATA size by the caller (scale-adaptive — at
    * 100 TB the same formula yields hundreds of partitions), so every
    * per-round exchange is already right-sized and AQE's contribution
    * collapses to pure overhead: each AQE shuffle stage runs as its own
    * driver-sequential job (re-planned between stages), turning a
    * 3-join round into 4-5 jobs of a few ms dispatch each (before/after
    * evidence: OPTIMIZATION_r18.md). Session values are restored in a
    * finally so caller plans (and st17's stream-scoped 8-partition
    * setting) are untouched.
    *
    * ASSUMES A SINGLE-THREADED SESSION (ADVICE r18): the conf mutation
    * is session-global, so any query or stream PLANNED concurrently in
    * the same SparkSession while a loop runs would silently pick up the
    * loop-scoped settings. The Bench/Verify/HttpApi harnesses all plan
    * sequentially; a caller that overlaps jobs (guide §2.6) must give
    * loop queries their own session (`spark.newSession()` shares the
    * context but isolates conf).
    *
    * Skew at scale (VERDICT r18): AQE-off also disables runtime
    * skew-join splitting inside the loop — deliberate, because the loop
    * joins' skew is SINGLE-KEY (a giant component's label, a hub node's
    * edges), which AQE cannot split either (guide §2.5: it cannot split
    * one enormous key). The CC propagate join neutralizes it
    * structurally with a deterministic salt instead — see
    * [[graft.operators.Dedup.connectedComponents]]. */
  def loopScoped[T](s: SparkSession, parts: Int)(body: => T): T = {
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
