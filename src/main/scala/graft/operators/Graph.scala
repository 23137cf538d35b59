package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over transaction-derived graphs — the
  * second iterative-DataFrame operator family beside d7's connected
  * components (pointer-jumping label propagation). PageRank is the
  * canonical "join ranks to edges, aggregate, repeat" workload: each
  * iteration is ONE shuffle join of the node-sized rank frame against
  * the edge list plus ONE destination aggregate, with an eager
  * localCheckpoint per round so the logical plan stays constant-size
  * (the d7 convention — without truncation the plan doubles per round).
  *
  * At 100 TB the edge list is the corpus-scale side: it is checkpointed
  * ONCE, partitioned by source, and every iteration's join reuses that
  * layout while only the node-sized rank frame moves — the same
  * stationary-edges/mobile-ranks split GraphX and every production
  * PageRank uses. A fixed iteration count (not a convergence test) keeps
  * the oracle replayable: DuckDB unrolls the same five rounds as chained
  * CTEs and must land on the identical doubles before the 6 dp round.
  */
object Graph {

  /** Damping factor — the standard 0.85. */
  private val Damping = 0.85

  /** Fixed iteration count; five rounds on a diameter-2 bipartite graph
    * is past the point where scores move at 6 dp. */
  private val Rounds = 5

  /** g3's hop cap — four levels covers the trade graph's diameter at
    * every fixture scale (spec-pinned: the last frontier adds nothing),
    * and a FIXED cap is what keeps the DuckDB oracle an exact unrolled
    * replay rather than a convergence race. */
  private val BfsHops = 4

  /** g5's core order: nodes with fewer than K surviving neighbors peel. */
  private val KcoreK = 3

  /** g5's fixed peel-wave count — like [[BfsHops]], a FIXED cap is what
    * keeps the oracle an exact unrolled replay; the output's semantic is
    * "peel wave index (1-4), 0 = still in the core after 4 waves". */
  private val KcorePeels = 4

  /** g6's fixed synchronous-LPA round count. Three rounds is where the
    * fixture graph's label histogram is already community-shaped while
    * the unrolled oracle stays three node-sized levels. */
  private val LpaRounds = 3

  /** g7's fixed HITS round count (one round = authority update then hub
    * update). Two rounds of UNNORMALIZED integer iteration: scores stay
    * exact BIGINTs (round-2 magnitudes are Σ over degrees³ — ~6e12 at
    * sf10, nowhere near overflow), and since the classic per-round L2
    * normalization is a positive scalar multiply it never changes the
    * RANKING — so the top-k report is identical to normalized HITS while
    * every arithmetic step is hash-exact on both engines. */
  private val HitsRounds = 2

  val specs: Seq[QuerySpec] = Seq(

    // ----------------------------------------------------------------- g1
    // PageRank over the customer↔supplier transaction graph: an edge per
    // distinct (customer, supplier) trading pair in lineitem⋈orders,
    // mirrored to an undirected digraph (both directions), so no node
    // dangles and the random walk is well-defined. Suppliers serve many
    // customers, so mass concentrates there — the output is the top-50
    // most central nodes, the "which counterparties matter" report.
    // Determinism: scores are double sums whose accumulation order
    // differs between engines (~1e-12 over thousands of in-edges);
    // ROUND(·,6) absorbs it, and the top-50 cut orders by the ROUNDED
    // score with a (node_type, node_id) tiebreak so both engines slice
    // the same frontier.
    QuerySpec(
      "g1_pagerank_trade_graph",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
        val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        // node ids: customers as-is, suppliers offset into their own id
        // space via a type tag carried separately (keys stay longs)
        val pairs = li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("p"))
          .distinct()
        val edges = pairs
          .select($"c".as("src"), lit("c").as("src_t"),
            $"p".as("dst"), lit("s").as("dst_t"))
          .union(pairs.select($"p".as("src"), lit("s").as("src_t"),
            $"c".as("dst"), lit("c").as("dst_t")))
        pageRank(s, edges)
          .select($"t".as("node_type"), $"id".as("node_id"),
            round($"score", 6).as("score"))
          .orderBy($"score".desc, $"node_type", $"node_id")
          .limit(50)
      },
      Some(PageRankOracle)),

    // ----------------------------------------------------------------- g2
    // Degree-oriented triangle counting over the weekly co-purchase
    // graph: customers are connected when they bought the same part in
    // the same ship week (the bounded-fan-out projection — customers per
    // (part, week) is a scale-constant, so edge generation is an
    // equi-key join that never goes quadratic; the unwindowed co-part
    // graph is near-complete already at sf0.001 and would be a dense-
    // graph landmine). Triangles are the community-structure primitive
    // (clustering coefficient, cohesion scoring); the output is each
    // customer's triangle participation count.
    //
    // The Spark plan is the MapReduce-classic orientation scheme: orient
    // every undirected edge from its lower-(degree, id) endpoint to the
    // higher, so each wedge {v—u—w} is generated exactly once at its
    // lowest-order apex and out-degrees are bounded by O(sqrt(m)) —
    // the wedge self-join's fan-out cap and the reason this shape
    // survives power-law graphs at 100 TB where a naive shared-neighbor
    // join explodes on hubs. One wedge join + one closing semi-ish join,
    // all equi-key shuffles; the DuckDB oracle needs no orientation
    // (a<b<c enumeration lands on the identical triangle set).
    QuerySpec(
      "g2_triangle_copurchase",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_partkey", $"l_shipdate")
        val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        val cp = li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".as("c"), $"l_partkey".as("p"),
            date_trunc("week", $"l_shipdate").as("w"))
        // neighborhood-list pair emission: ONE (part, week) aggregate
        // builds each window's (deduped) customer set, pairs explode
        // map-side from the set — |set|² work bounded by the scale-
        // constant customers-per-(part,week). Replaces the first-cut
        // distinct → self-join → distinct chain (four exchanges) with
        // two (the group-by and the pair dedup): same edge set
        // bit-for-bit, measured 40.3 s → 31.4 s at sf10 where the saved
        // exchanges carry real volume (sf0.1 is overhead-bound and
        // moves only 5.6 → 5.3 s).
        val edges = cp.groupBy($"p", $"w").agg(collect_set($"c").as("cs"))
          .filter(size($"cs") >= 2)
          .select(explode(expr(
            "filter(flatten(transform(cs, a -> transform(cs, b -> " +
              "named_struct('x', a, 'y', b)))), s -> s.x < s.y)")).as("e"))
          .select($"e.x".as("x"), $"e.y".as("y"))
          .distinct()
        triangleCounts(s, edges)
          .select($"node".as("custkey"), $"triangles")
          .orderBy($"triangles".desc, $"custkey")
      },
      Some(raw"""
        WITH cp AS (
          SELECT DISTINCT o_custkey AS c, l_partkey AS p,
                 date_trunc('week', l_shipdate) AS w
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        e AS (
          SELECT DISTINCT a.c AS x, b.c AS y
          FROM cp a JOIN cp b ON a.p = b.p AND a.w = b.w AND a.c < b.c),
        tri AS (
          SELECT e1.x AS a, e1.y AS b, e2.y AS c
          FROM e e1
          JOIN e e2 ON e2.x = e1.y
          JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        nodes AS (
          SELECT a AS custkey FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        SELECT custkey, CAST(COUNT(*) AS BIGINT) AS triangles
        FROM nodes GROUP BY custkey
        ORDER BY triangles DESC, custkey""")),

    // ----------------------------------------------------------------- g3
    // Multi-source BFS hop distances — the third iterative-graph
    // primitive beside d7's components and g1's PageRank: from a seed
    // set (nation-0 customers), how many hops through the trade graph
    // to every reachable counterparty? This is the reachability/
    // blast-radius query (supply-chain exposure, fraud-ring proximity,
    // k-hop feature generation). FRONTIER-based: each round joins only
    // the newly-discovered frontier against the stationary edge list,
    // anti-joins the visited set, and checkpoints (the d7/g1 plan-
    // truncation convention) — per-round work tracks the frontier's
    // incident edges, never re-scans the visited set, which is why BFS
    // over a 100 TB edge list is rounds × (frontier-sized join + anti
    // join) with the edges laid out once. A fixed 4-round cap keeps the
    // oracle replayable: DuckDB unrolls four min-relaxation levels as
    // chained re-aggregating CTEs (each level one row per node — no
    // path explosion) and must land on the identical hop set; frontier
    // BFS and level-wise relaxation provably compute the same min-hop
    // function.
    QuerySpec(
      "g3_bfs_hops",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
        val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        val pairs = li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("p"))
          .distinct()
        val edges = pairs
          .select($"c".as("src"), lit("c").as("src_t"),
            $"p".as("dst"), lit("s").as("dst_t"))
          .union(pairs.select($"p".as("src"), lit("s").as("src_t"),
            $"c".as("dst"), lit("c").as("dst_t")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // materialize + size in one action (the first round paid this
        // compute anyway); m drives the loop's shuffle parallelism
        val m = edges.count()
        val seeds = Tables(s, dir, "customer")
          .filter($"c_nationkey" === 0)
          .select(lit("c").as("t"), $"c_custkey".as("id"), lit(0L).as("hop"))
        graft.Materialize.loopScoped(s, graft.Materialize.loopParts(s, m)) {
        var dist = seeds.localCheckpoint(false)
        var frontier = dist
        // LAZY per-level checkpoints, ONE materializing job for the
        // whole fixed-depth loop (r19, guide §1.2): the level plans
        // stay truncated and cached exactly as before, but nothing
        // forces a driver-sequential job per level — the LAST level's
        // eager checkpoint pulls the entire chain (each lazy
        // checkpoint caches at first compute, so every level still
        // executes once), collapsing BfsHops+1 jobs into one. Only
        // loops with NO data-dependent control flow can do this; the
        // convergence-checked CC loop keeps its per-block scalar.
        for (i <- 1 to BfsHops) {
          val level = edges
            .join(frontier,
              edges("src") === frontier("id") && edges("src_t") === frontier("t"))
            .select($"dst_t".as("t"), $"dst".as("id")).distinct()
            .join(dist, Seq("t", "id"), "left_anti")
            .withColumn("hop", lit(i.toLong))
          // stats-rebased checkpoints: the inner join multiplies the
          // carried frontier's preserved estimate into each round
          // (graft.Materialize.checkpointRebased)
          val next =
            if (i == BfsHops) graft.Materialize.checkpointRebased(level)
            else graft.Materialize.checkpointRebasedLazy(level)
          // the visited set stays a LAZY union of the per-level
          // checkpoints (depth = BfsHops, so the plan stays bounded):
          // re-checkpointing the union copied the whole accumulated
          // set every round — one full O(|visited|) pass per level
          // that the anti-join never needed (r18; union of ≤5
          // checkpointed leaves ADDS size estimates, no multiplication)
          dist = dist.union(next)
          frontier = next
        }
        edges.unpersist(false)
        dist.select($"t".as("node_type"), $"id".as("node_id"), $"hop")
          .orderBy($"hop", $"node_type", $"node_id")
        }
      },
      Some(BfsOracle)),

    // ----------------------------------------------------------------- g4
    // WEIGHTED shortest paths — g3's BFS generalized to Bellman-Ford:
    // edges carry an integer cost (100 − min(order count, 99): heavily
    // traded pairs are cheap to traverse — the "strength of
    // relationship" routing every supply-chain/fraud-proximity analysis
    // runs), and each round relaxes dist(v) = min(dist(v),
    // dist(u) + w(u,v)) over the whole frontier. INTEGER costs keep
    // every candidate sum exact, so cross-engine parity needs no
    // rounding anywhere. Same scale shape as g3/g1: stationary weighted
    // edge list, node-sized distance frame moving per round, per-round
    // checkpoints; the fixed 4-round cap bounds path length (dist = the
    // cheapest ≤4-hop route) and keeps the oracle an exact unrolled
    // relaxation — each level re-aggregates to one row per node, so the
    // chained CTEs never enumerate paths.
    QuerySpec(
      "g4_weighted_paths",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
        val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        val weighted = li.join(ord, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_custkey".as("c"), $"l_suppkey".as("p"))
          .agg(count(lit(1)).as("n"))
          .select($"c", $"p",
            (lit(100L) - least($"n", lit(99L))).as("w"))
        val edges = weighted
          .select($"c".as("src"), lit("c").as("src_t"),
            $"p".as("dst"), lit("s").as("dst_t"), $"w")
          .union(weighted.select($"p".as("src"), lit("s").as("src_t"),
            $"c".as("dst"), lit("c").as("dst_t"), $"w"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // materialize + size in one action (round 1 paid this compute
        // anyway); m drives the loop's shuffle parallelism
        val m = edges.count()
        graft.Materialize.loopScoped(s, graft.Materialize.loopParts(s, m)) {
        var dist = Tables(s, dir, "customer")
          .filter($"c_nationkey" === 0)
          .select(lit("c").as("t"), $"c_custkey".as("id"), lit(0L).as("cost"))
          .localCheckpoint(false)
        // lazy per-round checkpoints, one materializing job at the last
        // round (the g3 rationale — fixed depth, no per-round scalar)
        for (r <- 1 to BfsHops) {
          // stats-rebased checkpoint, same rationale as g3's loop
          val relaxed = dist.union(
              edges.join(dist,
                edges("src") === dist("id") && edges("src_t") === dist("t"))
                .select($"dst_t".as("t"), $"dst".as("id"),
                  ($"cost" + $"w").as("cost")))
            .groupBy($"t", $"id").agg(min($"cost").as("cost"))
          dist =
            if (r == BfsHops) graft.Materialize.checkpointRebased(relaxed)
            else graft.Materialize.checkpointRebasedLazy(relaxed)
        }
        edges.unpersist(false)
        dist.select($"t".as("node_type"), $"id".as("node_id"), $"cost")
          .orderBy($"cost", $"node_type", $"node_id")
        }
      },
      Some(WeightedPathsOracle)),

    // ----------------------------------------------------------------- g5
    // k-core peeling over g2's weekly co-purchase graph — the
    // Batagelj–Zavrsnik degeneracy decomposition every dense-subgraph /
    // spam-farm / community-core analysis starts from: repeatedly remove
    // nodes with degree < k, where each wave's removals can cascade the
    // next (a node loses its last strong neighbors and peels later).
    // The output classifies every node by its PEEL WAVE (1-4; 0 = still
    // in the k-core after four waves) — the cascade depth is exactly
    // what a single degree filter cannot compute, so the oracle
    // falsifies any non-iterative shortcut.
    //
    // Scale shape: per wave ONE degree aggregate over the surviving
    // (mirrored) edge list + two semi-joins filtering edges to surviving
    // endpoints, with the d7/g3 eager-localCheckpoint convention keeping
    // the plan constant-size; the edge list only SHRINKS, so wave cost
    // is monotone non-increasing, and the alive/removed frames are
    // node-sized. The fixed wave cap bounds the unrolled DuckDB replay
    // (each level re-aggregates to one row per node — no recursion
    // race); a to-fixpoint variant would swap the cap for d7's monotone
    // convergence check unchanged.
    QuerySpec(
      "g5_kcore_peel",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_partkey", $"l_shipdate")
        val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        val cp = li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".as("c"), $"l_partkey".as("p"),
            date_trunc("week", $"l_shipdate").as("w"))
        // g2's neighborhood-list pair emission (see its scaladoc)
        val und = cp.groupBy($"p", $"w").agg(collect_set($"c").as("cs"))
          .filter(size($"cs") >= 2)
          .select(explode(expr(
            "filter(flatten(transform(cs, a -> transform(cs, b -> " +
              "named_struct('x', a, 'y', b)))), s -> s.x < s.y)")).as("e"))
          .select($"e.x".as("x"), $"e.y".as("y"))
          .distinct()
        // lazy checkpoint materialized by the sizing count: one job
        // computes the mirrored edges, caches them, and sizes the loop
        var edges = und.select($"x".as("s"), $"y".as("d"))
          .union(und.select($"y".as("s"), $"x".as("d")))
          .localCheckpoint(false)
        val m = edges.count()
        graft.Materialize.loopScoped(s, graft.Materialize.loopParts(s, m)) {
        var alive = edges.select($"s".as("v")).distinct().localCheckpoint(false)
        // removed stays a LAZY union of per-wave checkpointed slices
        // (depth = KcorePeels, bounded): re-checkpointing the union
        // copied the accumulated set every wave for nothing (r18) —
        // the per-wave slices below are cached through `alive`'s and
        // `edges`'s checkpoints, and removed is only SCANNED at the end
        var removed = Seq.empty[(Long, Long)].toDF("custkey", "removed_round")
        // plain (non-rebased) checkpoints are correct HERE: the loop's
        // joins against carried frames are left/left_semi, whose size
        // estimate is the left side alone — carried stats never
        // multiply (probed: 12 digits after 4 peels, vs g1/g6/g7's
        // 36-41 before the graft.Materialize.checkpointRebased sweep)
        // lazy per-wave checkpoints, one materializing job at the last
        // wave's annotated frame (the g3 rationale): every earlier
        // wave's annotated/edges slice caches through that job's
        // lineage, and the LAST wave's filtered edge list — which
        // nothing downstream reads — is never computed at all.
        for (r <- 1 to KcorePeels) {
          val deg = edges.groupBy($"s".as("v")).agg(count(lit(1)).as("deg"))
          // left join, not inner: a node whose edges ALL vanished last
          // wave has no degree row at all — it peels as degree 0
          val annotated = alive.join(deg, Seq("v"), "left")
            .withColumn("deg", coalesce($"deg", lit(0L)))
            .localCheckpoint(r == KcorePeels)
          removed = removed.union(
              annotated.filter($"deg" < KcoreK)
                .select($"v".as("custkey"), lit(r.toLong).as("removed_round")))
          alive = annotated.filter($"deg" >= KcoreK).select($"v")
          edges = edges
            .join(alive.select($"v".as("s")), Seq("s"), "left_semi")
            .join(alive.select($"v".as("d")), Seq("d"), "left_semi")
            .select($"s", $"d")
            .localCheckpoint(false)
        }
        removed
          .union(alive.select($"v".as("custkey"), lit(0L).as("removed_round")))
          .orderBy($"custkey")
        }
      },
      Some(KcoreOracle)),

    // ----------------------------------------------------------------- g6
    // Synchronous label propagation (LPA) over the co-purchase graph —
    // the community-detection primitive beside d7's connected components
    // (min-label closure merges everything reachable; LPA's MODE vote
    // finds densely-knit groups inside one component). Each round every
    // node adopts the most frequent label among its NEIGHBORS, ties
    // broken by the smallest label — integer counts and a total tie
    // order make synchronous LPA fully deterministic, which is exactly
    // why this variant (and not the async/random one the original paper
    // uses) is the distributed-engine shape: it replays bit-identically
    // under the unrolled oracle.
    //
    // Scale: per round ONE edge-to-labels equi-join (the stationary-
    // edges / mobile-labels split g1 documents) + one (node, label)
    // count aggregate + one per-node argmax window — label frames stay
    // node-sized, the per-node window partitions are bounded by degree,
    // and the eager localCheckpoint keeps plans constant-size. Fixed
    // [[LpaRounds]] keeps the oracle an exact three-level replay.
    QuerySpec(
      "g6_label_propagation",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val li = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_partkey", $"l_shipdate")
        val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        val cp = li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".as("c"), $"l_partkey".as("p"),
            date_trunc("week", $"l_shipdate").as("w"))
        val und = cp.groupBy($"p", $"w").agg(collect_set($"c").as("cs"))
          .filter(size($"cs") >= 2)
          .select(explode(expr(
            "filter(flatten(transform(cs, a -> transform(cs, b -> " +
              "named_struct('x', a, 'y', b)))), s -> s.x < s.y)")).as("e"))
          .select($"e.x".as("x"), $"e.y".as("y"))
          .distinct()
        // lazy checkpoint materialized by the sizing count (r18)
        val edges = und.select($"x".as("s"), $"y".as("d"))
          .union(und.select($"y".as("s"), $"x".as("d")))
          .localCheckpoint(false)
        val m = edges.count()
        graft.Materialize.loopScoped(s, graft.Materialize.loopParts(s, m)) {
        var labels = edges.select($"s".as("v")).distinct()
          .withColumn("label", $"v").localCheckpoint(false)
        val byNode = Window.partitionBy($"v").orderBy($"cnt".desc, $"label")
        // lazy per-round checkpoints, one materializing job at the last
        // round (the g3 rationale — fixed depth, no per-round scalar)
        for (r <- 1 to LpaRounds) {
          // stats-rebased checkpoint: the vote join multiplies the
          // carried label frame's preserved estimate per round
          val vote = edges.join(labels, edges("d") === labels("v"))
            .groupBy(edges("s").as("v"), $"label")
            .agg(count(lit(1)).as("cnt"))
            .withColumn("rk", row_number().over(byNode))
            .filter($"rk" === 1)
            .select($"v", $"label")
          labels =
            if (r == LpaRounds) graft.Materialize.checkpointRebased(vote)
            else graft.Materialize.checkpointRebasedLazy(vote)
        }
        labels.select($"v".as("custkey"), $"label".as("community"))
          .orderBy($"custkey")
        }
      },
      Some(LpaOracle)),

    // ----------------------------------------------------------------- g7
    // HITS hubs & authorities over the DIRECTED customer→supplier trade
    // graph — the bipartite-centrality complement to g1's PageRank
    // (PageRank mixes both roles into one score on the mirrored graph;
    // HITS keeps "broad buyers" and "widely-bought-from suppliers" as
    // separate rankings, the reinforcing-pair semantics the original
    // Kleinberg formulation is for). Each half-round is ONE join of the
    // node-sized score frame into the stationary edge list + one
    // destination aggregate — the g1 stationary-edges/mobile-scores
    // split, two exchanges per round, with the per-round eager
    // localCheckpoint keeping plans constant-size. Determinism: scores
    // start at integer 1 and stay UNNORMALIZED exact BIGINTs (see
    // [[HitsRounds]] — normalization is a rank-preserving positive
    // scalar, so the top-50 cut is the same report normalized HITS
    // yields), which makes the unrolled DuckDB replay hash-exact with
    // no float rounding anywhere.
    QuerySpec(
      "g7_hits_trade_graph",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
        val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        // lazy checkpoint materialized by the sizing count (r18)
        val pairs = li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("p"))
          .distinct()
          .localCheckpoint(false)
        val m = pairs.count()
        graft.Materialize.loopScoped(s, graft.Materialize.loopParts(s, m)) {
        // h0 = 1 for every customer; each round: a(s) = Σ h(c) over
        // in-edges, then h(c) = Σ a(s) over out-edges. Every supplier
        // has an in-edge and every customer an out-edge by construction
        // (pairs come from actual order lines), so inner joins lose no
        // node.
        var hub = pairs.select($"c").distinct().withColumn("h", lit(1L))
        var auth = pairs.select($"p").distinct().withColumn("a", lit(1L))
        // lazy per-half-round checkpoints, one materializing job at the
        // last hub update (the g3 rationale): the final hub's lineage
        // pulls and caches every earlier half-round, including the last
        // auth frame the report reads.
        for (r <- 1 to HitsRounds) {
          // stats-rebased checkpoints: each half-round joins the other
          // half's checkpoint, compounding preserved estimates
          auth = graft.Materialize.checkpointRebasedLazy(pairs.join(hub, "c")
            .groupBy($"p").agg(sum($"h").as("a")))
          val hubPlan = pairs.join(auth, "p")
            .groupBy($"c").agg(sum($"a").as("h"))
          hub =
            if (r == HitsRounds) graft.Materialize.checkpointRebased(hubPlan)
            else graft.Materialize.checkpointRebasedLazy(hubPlan)
        }
        val topHubs = hub
          .select(lit("c").as("node_type"), $"c".as("node_id"),
            $"h".as("score"))
          .orderBy($"score".desc, $"node_id").limit(50)
        val topAuths = auth
          .select(lit("s").as("node_type"), $"p".as("node_id"),
            $"a".as("score"))
          .orderBy($"score".desc, $"node_id").limit(50)
        topHubs.unionAll(topAuths)
          .orderBy($"node_type", $"score".desc, $"node_id")
        }
      },
      Some(HitsOracle)),

    // ----------------------------------------------------------------- g8
    // Item-item similarity (collaborative filtering's build step): for
    // every supplier pair, the Jaccard of their CUSTOMER sets — "buyers
    // of X also buy from Y", the neighborhood model every recommender
    // bootstraps from and the graph twin of d2's document Jaccard. Same
    // scale skeleton as d2's inverted index: the co-rating join keys on
    // the shared CUSTOMER (never supplier×supplier), so pair generation
    // is Σ_c deg(c)² — and promiscuous customers (the stopword analog:
    // a buyer of everything co-occurs every pair and says nothing) are
    // DF-CAPPED out at >64 distinct suppliers before the self-join, the
    // d2 cap that keeps the fan-out bounded on power-law data. One
    // customer-keyed exchange + one pair aggregate; sizes computed on
    // the SAME capped universe so jaccard stays a true set ratio.
    // NO SILENT CAPS (VERDICT r9 #2): every output row carries the
    // cap's coverage accounting — how many customers the ≤64 rule
    // excluded and how many co-rating pairs (Σ C(deg,2) over them) that
    // sacrificed — so a consumer sees exactly what the bound cost
    // instead of inferring it from prose. The accounting rides a 1-row
    // broadcast cross (the t16 scalar-cross shape) off the SAME
    // customer-degree frame that computes the cap, persisted once.
    QuerySpec(
      "g8_item_similarity",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
        val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        val cp = li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("p"))
          .distinct()
        val degs = cp.groupBy($"c").agg(count(lit(1)).as("deg")).persist()
        val kept = degs.filter($"deg" <= 64).select($"c")
        val acc = degs.filter($"deg" > 64)
          .agg(count(lit(1)).as("capped_customers"),
            coalesce(sum(expr("CAST(deg * (deg - 1) DIV 2 AS BIGINT)")),
              lit(0L)).as("dropped_copairs"))
        val capped = cp.join(kept, "c").persist()
        val pairs = capped.as("x").join(capped.as("y"),
            $"x.c" === $"y.c" && $"x.p" < $"y.p")
          .groupBy($"x.p".as("p_a"), $"y.p".as("p_b"))
          .agg(count(lit(1)).as("common"))
        val sizes = capped.groupBy($"p").agg(count(lit(1)).as("n"))
        val out = pairs
          .join(sizes.select($"p".as("p_a"), $"n".as("na")), "p_a")
          .join(sizes.select($"p".as("p_b"), $"n".as("nb")), "p_b")
          .withColumn("jaccard", round($"common".cast("double") /
            ($"na" + $"nb" - $"common"), 6))
          .select($"p_a", $"p_b", $"common", $"jaccard")
          .orderBy($"jaccard".desc, $"p_a", $"p_b")
          .limit(50)
          .crossJoin(broadcast(acc))
        graft.Materialize.thenRelease(out, capped, degs)
      },
      Some("""
        WITH cp AS (
          SELECT DISTINCT o_custkey AS c, l_suppkey AS p
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        degs AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS deg
                 FROM cp GROUP BY c),
        kept AS (SELECT c FROM degs WHERE deg <= 64),
        acc AS (SELECT CAST(COUNT(*) AS BIGINT) AS capped_customers,
                       CAST(COALESCE(SUM(deg * (deg - 1) // 2), 0) AS BIGINT)
                         AS dropped_copairs
                FROM degs WHERE deg > 64),
        capped AS (SELECT cp.c, cp.p FROM cp JOIN kept USING (c)),
        pairs AS (
          SELECT x.p AS p_a, y.p AS p_b, CAST(COUNT(*) AS BIGINT) AS common
          FROM capped x JOIN capped y ON x.c = y.c AND x.p < y.p
          GROUP BY x.p, y.p),
        top AS (
          SELECT p_a, p_b, common,
                 ROUND(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6)
                   AS jaccard
          FROM pairs
          JOIN (SELECT p, COUNT(*) AS n FROM capped GROUP BY p) sa ON p_a = sa.p
          JOIN (SELECT p, COUNT(*) AS n FROM capped GROUP BY p) sb ON p_b = sb.p
          ORDER BY jaccard DESC, p_a, p_b LIMIT 50)
        SELECT p_a, p_b, common, jaccard, capped_customers, dropped_copairs
        FROM top CROSS JOIN acc
        ORDER BY jaccard DESC, p_a, p_b""")),
  )

  /** Per-node triangle participation counts for an undirected simple
    * graph given as a distinct edge list `(x, y)` with `x < y` (callers
    * guarantee dedup + canonical order; nodes in no triangle are absent
    * from the output — the caller decides whether zero rows matter).
    *
    * Orientation: each edge points from its lower-(deg, id) endpoint to
    * the higher. Every triangle {a,b,c} then appears EXACTLY once — as
    * the wedge at its minimum-order vertex closed by the oriented edge
    * between the other two — so no post-hoc dedup or /3 correction is
    * needed, and the wedge join's per-key fan-out is the oriented
    * out-degree, O(sqrt(m)) even on hub nodes. Degrees are node-sized
    * (left un-hinted: AQE broadcasts while they fit, degrades to a
    * shuffle join beyond); the wedge and closing joins are equi-key
    * shuffles on node pairs. */
  private[operators] def triangleCounts(
      s: org.apache.spark.sql.SparkSession,
      edges: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val deg = edges.select($"x".as("n")).union(edges.select($"y".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select($"n".as("x"), $"deg".as("dx")), "x")
      .join(deg.select($"n".as("y"), $"deg".as("dy")), "y")
      // degree pre-filter (r19, guide §2.3/§3.2): an edge with a
      // degree-1 endpoint can close no wedge and sit in no triangle —
      // dropping it here shrinks BOTH the wedge self-join's input and
      // the closing join's build, at zero extra shuffles (the degree
      // columns are already attached for the orientation). Orientation
      // still uses the ORIGINAL degrees, so the per-apex fan-out bound
      // is unchanged; the triangle set is provably identical.
      .filter($"dx" >= 2 && $"dy" >= 2)
    val xFirst = $"dx" < $"dy" || ($"dx" === $"dy" && $"x" < $"y")
    val oriented = withDeg.select(
      when(xFirst, $"x").otherwise($"y").as("src"),
      when(xFirst, $"y").otherwise($"x").as("dst"),
      when(xFirst, $"dy").otherwise($"dx").as("ddst"))
    // wedges at apex u: pairs of out-neighbours (v, w) with v before w
    // in the SAME (deg, id) total order the orientation used, so the
    // candidate (v, w) matches the oriented closing edge's direction
    val o1 = oriented.select($"src", $"dst".as("v"), $"ddst".as("dv"))
    val o2 = oriented.select($"src", $"dst".as("w"), $"ddst".as("dw"))
    val wedges = o1.join(o2, "src")
      .filter($"dv" < $"dw" || ($"dv" === $"dw" && $"v" < $"w"))
      .select($"src".as("u"), $"v", $"w")
    val closed = wedges.join(
      oriented.select($"src".as("v"), $"dst".as("w")), Seq("v", "w"),
      "left_semi")
    closed.select(explode(array($"u", $"v", $"w")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("triangles"))
  }

  /** The iteration, factored out so specs can drive it with synthetic
    * graphs (closed-form two-node and star cases). `edges` is a
    * directed edge list `(src, src_t, dst, dst_t)` where every node has
    * at least one out-edge (callers mirror undirected graphs; dangling
    * nodes are the caller's responsibility — with none, total mass is
    * conserved at 1). Returns the full unrounded `(id, t, score)` frame
    * after [[Rounds]] iterations.
    *
    * Stationary-edges / mobile-ranks: the edge list hash-partitions on
    * its source key and checkpoints ONCE; each round is one join of the
    * node-sized rank frame (which carries its out-degree) into the
    * edges, one dst aggregate, one update join. The rank-side join
    * strategy is THRESHOLD-GATED on the measured node count
    * (`graft.pagerank.broadcastNodes`, default 1M): below it, ranks
    * broadcast and the only shuffle per round is the dst aggregate (a
    * first cut that shuffle-joined ranks every round measured 8.2 s at
    * sf0.1 against this shape's 5.6 s); above it, the joins run against
    * the PRESERVED edge partitioning with only the node-sized frames
    * moving — the sf10 measurement forced this split: broadcasting the
    * 1.6M-node rank frame exhausted execution memory
    * (UNABLE_TO_ACQUIRE_MEMORY in the dst aggregate) while the
    * partitioned path completes. The edges-stationary property is what
    * matters at 100 TB; the gate picks the join strategy the same way a
    * stats-aware planner would. */
  private[operators] def pageRank(
      s: org.apache.spark.sql.SparkSession,
      edgeList: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // COLUMNAR persist, not a deserialized localCheckpoint: the
    // stationary edge list is the one corpus-scale artifact here, and a
    // checkpoint's deserialized row blocks pinned enough of the storage
    // pool at sf10 (8 GB heap, ~100M mirrored edges) to starve the
    // per-round sort/aggregate of execution memory
    // (UNABLE_TO_ACQUIRE_MEMORY). The SQL columnar cache is compressed
    // (several times smaller), memory-resident while it fits, and
    // overflows/evicts to disk under pressure at scale. Unpersisted
    // before return (the final ranks checkpoint does not depend on
    // it), so nothing outlives the query (CacheHygieneSpec).
    val raw = edgeList
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // lazy checkpoint materialized by the sizing aggregate: ONE job
    // computes out-degrees, caches them, and reads (node count, edge
    // count) — n drives the teleport term and the broadcast decision
    // exactly as before, m sizes the loop's shuffle parallelism (r18
    // fused-action convention, graft.Materialize.checkpointRebasedAgg)
    val outdeg = raw.groupBy($"src", $"src_t")
      .agg(count(lit(1)).as("deg"))
      .select($"src".as("id"), $"src_t".as("t"), $"deg")
      .localCheckpoint(false)
    val (n, m) = outdeg
      .agg(count(lit(1)), coalesce(sum($"deg"), lit(0L)))
      .as[(Long, Long)].head()
    val bcastLimit =
      s.conf.getOption("graft.pagerank.broadcastNodes").map(_.toLong)
        .getOrElse(1000000L)
    def side(df: org.apache.spark.sql.DataFrame) =
      if (n <= bcastLimit) broadcast(df) else df
    // the layout pass and all five rounds run under EDGE-count-derived
    // shuffle parallelism with AQE off (graft.Materialize.loopScoped):
    // the per-round exchanges (contrib aggregate, rank join when not
    // broadcast) are already right-sized by the data, so AQE's
    // per-stage re-planning only fragments each round into extra
    // driver-sequential jobs
    graft.Materialize.loopScoped(s, graft.Materialize.loopParts(s, m)) {
    // Large n additionally pays ONE extra pass to lay edges out by
    // source key, so all five rank joins reuse that partitioning
    // instead of reshuffling the corpus-scale side per round; small n
    // needs no layout at all (every join broadcasts).
    val edges =
      if (n <= bcastLimit) raw
      else {
        val e = raw.repartition($"src", $"src_t")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        e.count()
        raw.unpersist(false)
        e
      }
    var ranks = outdeg.withColumn("score", lit(1.0 / n))
    // lazy per-round checkpoints, one materializing job at the last
    // round (the g3 rationale — fixed depth, no per-round scalar); the
    // per-round broadcast builds still execute in dependency order, but
    // the driver-sequential eager-checkpoint job per round is gone
    for (r <- 1 to Rounds) {
      val contrib = edges
        .join(side(ranks),
          edges("src") === ranks("id") && edges("src_t") === ranks("t"))
        .groupBy($"dst", $"dst_t")
        .agg(sum($"score" / $"deg").as("mass"))
      val updated = outdeg
        .join(side(contrib),
          outdeg("id") === contrib("dst") && outdeg("t") === contrib("dst_t"),
          "left")
        .select($"id", $"t", $"deg",
          (lit((1.0 - Damping) / n) +
            lit(Damping) * coalesce($"mass", lit(0.0))).as("score"))
      // stats-rebased checkpoint: the round joins the previous round's
      // checkpoint twice, so preserved size estimates would compound
      // geometrically per round (graft.Materialize.checkpointRebased)
      ranks =
        if (r == Rounds) graft.Materialize.checkpointRebased(updated)
        else graft.Materialize.checkpointRebasedLazy(updated)
    }
    edges.unpersist(false)
    ranks.select($"id", $"t", $"score")
    }
  }

  /** The oracle unrolls the identical five rounds as chained CTEs over
    * the same mirrored edge list; N and out-degrees are exact BIGINTs,
    * scores the same IEEE arithmetic. */
  /** g5's oracle: the co-purchase edge CTE (g2's construction) + one
    * unrolled peel wave per round — each wave re-aggregates degrees over
    * the previous wave's surviving edges, classifies nodes, and filters
    * the edge list; node-sized levels, no recursion. */
  private def KcoreOracle: String = {
    // The chained m$i / a$i levels are each referenced TWICE by the next
    // wave; without explicit materialization DuckDB inlines the chain,
    // re-executing the (part, week) pair join 2^waves times — measured
    // as a >70 GB spill death at sf0.1. AS MATERIALIZED (DuckDB syntax;
    // the oracle never runs on Spark) pins each level to one execution,
    // the same per-round truncation the engine gets from localCheckpoint.
    val base = raw"""
      WITH cp AS MATERIALIZED (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p,
               date_trunc('week', l_shipdate) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS MATERIALIZED (
        SELECT DISTINCT a.c AS x, b.c AS y
        FROM cp a JOIN cp b ON a.p = b.p AND a.w = b.w AND a.c < b.c),
      m0 AS MATERIALIZED (
        SELECT x AS s, y AS d FROM e UNION ALL SELECT y AS s, x AS d FROM e),
      a0 AS (SELECT DISTINCT s AS v FROM m0)"""
    val waves = (1 to KcorePeels).map { i =>
      raw"""
      deg$i AS (SELECT s AS v, COUNT(*) AS deg FROM m${i - 1} GROUP BY s),
      ann$i AS (SELECT a${i - 1}.v, COALESCE(deg$i.deg, 0) AS deg
                FROM a${i - 1} LEFT JOIN deg$i USING (v)),
      rm$i AS (SELECT v FROM ann$i WHERE deg < $KcoreK),
      a$i AS MATERIALIZED (SELECT v FROM ann$i WHERE deg >= $KcoreK),
      m$i AS MATERIALIZED (SELECT m.s, m.d FROM m${i - 1} m
              JOIN a$i x ON m.s = x.v
              JOIN a$i y ON m.d = y.v)"""
    }.mkString(",")
    val unioned = (1 to KcorePeels).map { i =>
      raw"SELECT v AS custkey, CAST($i AS BIGINT) AS removed_round FROM rm$i"
    }.mkString("\n        UNION ALL ")
    base + "," + waves + raw"""
      SELECT custkey, removed_round FROM (
        $unioned
        UNION ALL SELECT v AS custkey, CAST(0 AS BIGINT) AS removed_round
                  FROM a$KcorePeels)
      ORDER BY custkey"""
  }

  /** g6's oracle: the co-purchase edge CTE + one unrolled synchronous
    * LPA round per level — each level joins the mirrored edges to the
    * previous labels, counts (node, label) votes, and takes the
    * (count DESC, label ASC) argmax; node-sized levels throughout. */
  private def LpaOracle: String = {
    val base = raw"""
      WITH cp AS MATERIALIZED (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p,
               date_trunc('week', l_shipdate) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS MATERIALIZED (
        SELECT DISTINCT a.c AS x, b.c AS y
        FROM cp a JOIN cp b ON a.p = b.p AND a.w = b.w AND a.c < b.c),
      m0 AS MATERIALIZED (
        SELECT x AS s, y AS d FROM e UNION ALL SELECT y AS s, x AS d FROM e),
      l0 AS (SELECT DISTINCT s AS v, s AS label FROM m0)"""
    val rounds = (1 to LpaRounds).map { i =>
      raw"""
      n$i AS (
        SELECT m0.s AS v, l.label, COUNT(*) AS cnt
        FROM m0 JOIN l${i - 1} l ON m0.d = l.v
        GROUP BY m0.s, l.label),
      l$i AS (
        SELECT v, label FROM (
          SELECT v, label,
                 ROW_NUMBER() OVER (PARTITION BY v
                                    ORDER BY cnt DESC, label) AS rk
          FROM n$i)
        WHERE rk = 1)"""
    }.mkString(",")
    base + "," + rounds + raw"""
      SELECT v AS custkey, label AS community FROM l$LpaRounds
      ORDER BY custkey"""
  }

  private def PageRankOracle: String = {
    val base = raw"""
      WITH pairs AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (
        SELECT c AS src, 'c' AS src_t, p AS dst, 's' AS dst_t FROM pairs
        UNION ALL
        SELECT p AS src, 's' AS src_t, c AS dst, 'c' AS dst_t FROM pairs),
      outdeg AS (
        SELECT src, src_t, CAST(COUNT(*) AS BIGINT) AS deg
        FROM edges GROUP BY src, src_t),
      nodes AS (SELECT src AS id, src_t AS t FROM outdeg),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
      pr0 AS (
        SELECT id, t, 1.0 / (SELECT n FROM nn) AS score FROM nodes)"""
    val rounds = (1 to Rounds).map { i =>
      raw"""
      pr$i AS (
        SELECT nd.id, nd.t,
               (1.0 - 0.85) / (SELECT n FROM nn) +
               0.85 * COALESCE(m.mass, 0.0) AS score
        FROM nodes nd LEFT JOIN (
          SELECT e.dst AS id, e.dst_t AS t,
                 SUM(p.score / o.deg) AS mass
          FROM edges e
          JOIN outdeg o ON e.src = o.src AND e.src_t = o.src_t
          JOIN pr${i - 1} p ON e.src = p.id AND e.src_t = p.t
          GROUP BY e.dst, e.dst_t) m
        ON nd.id = m.id AND nd.t = m.t)"""
    }.mkString(",")
    base + "," + rounds + raw"""
      SELECT t AS node_type, id AS node_id, ROUND(score, 6) AS score
      FROM pr$Rounds
      ORDER BY score DESC, node_type, node_id LIMIT 50"""
  }

  /** g3's oracle: the same mirrored edge list, then [[BfsHops]] unrolled
    * min-relaxation levels — each level re-aggregates to ONE row per
    * node (seed set ∪ neighbors-of-previous-level, min hop), so the
    * chained CTEs stay node-sized and provably compute the same min-hop
    * function as the engine's frontier BFS. */
  private def BfsOracle: String = {
    val base = raw"""
      WITH pairs AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS MATERIALIZED (
        SELECT c AS src, 'c' AS src_t, p AS dst, 's' AS dst_t FROM pairs
        UNION ALL
        SELECT p AS src, 's' AS src_t, c AS dst, 'c' AS dst_t FROM pairs),
      d0 AS (
        SELECT 'c' AS t, c_custkey AS id, 0 AS hop
        FROM customer WHERE c_nationkey = 0)"""
    val levels = (1 to BfsHops).map { i =>
      raw"""
      d$i AS MATERIALIZED (
        SELECT t, id, MIN(hop) AS hop FROM (
          SELECT t, id, hop FROM d${i - 1}
          UNION ALL
          SELECT e.dst_t AS t, e.dst AS id, p.hop + 1 AS hop
          FROM d${i - 1} p JOIN edges e ON p.id = e.src AND p.t = e.src_t
        ) GROUP BY t, id)"""
    }.mkString(",")
    base + "," + levels + raw"""
      SELECT t AS node_type, id AS node_id, CAST(hop AS BIGINT) AS hop
      FROM d$BfsHops
      ORDER BY hop, node_type, node_id"""
  }

  /** g7's oracle: the distinct trading-pair edge list + [[HitsRounds]]
    * unrolled authority/hub levels (a_i = Σ h_{i-1} over in-edges,
    * h_i = Σ a_i over out-edges, h_0 = 1), all exact BIGINT sums — the
    * top-50 cuts use the identical (score DESC, node_id) total order as
    * the engine. */
  private def HitsOracle: String = {
    val base = raw"""
      WITH pairs AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      h0 AS (SELECT DISTINCT c, CAST(1 AS BIGINT) AS h FROM pairs)"""
    val rounds = (1 to HitsRounds).map { i =>
      raw"""
      a$i AS (
        SELECT p, CAST(SUM(h) AS BIGINT) AS a
        FROM pairs JOIN h${i - 1} USING (c) GROUP BY p),
      h$i AS (
        SELECT c, CAST(SUM(a) AS BIGINT) AS h
        FROM pairs JOIN a$i USING (p) GROUP BY c)"""
    }.mkString(",")
    base + "," + rounds + raw"""
      SELECT node_type, node_id, score FROM (
        (SELECT 'c' AS node_type, c AS node_id, h AS score FROM h$HitsRounds
         ORDER BY score DESC, node_id LIMIT 50)
        UNION ALL
        (SELECT 's' AS node_type, p AS node_id, a AS score FROM a$HitsRounds
         ORDER BY score DESC, node_id LIMIT 50))
      ORDER BY node_type, score DESC, node_id"""
  }

  /** g4's oracle: [[BfsHops]] unrolled Bellman-Ford relaxation levels
    * over the integer-weighted mirrored edge list — the [[BfsOracle]]
    * shape with min(cost) in place of min(hop). */
  private def WeightedPathsOracle: String = {
    val base = raw"""
      WITH wpairs AS (
        SELECT o_custkey AS c, l_suppkey AS p,
               100 - LEAST(COUNT(*), 99) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey, l_suppkey),
      edges AS MATERIALIZED (
        SELECT c AS src, 'c' AS src_t, p AS dst, 's' AS dst_t, w FROM wpairs
        UNION ALL
        SELECT p AS src, 's' AS src_t, c AS dst, 'c' AS dst_t, w FROM wpairs),
      d0 AS (
        SELECT 'c' AS t, c_custkey AS id, 0 AS cost
        FROM customer WHERE c_nationkey = 0)"""
    val levels = (1 to BfsHops).map { i =>
      raw"""
      d$i AS MATERIALIZED (
        SELECT t, id, MIN(cost) AS cost FROM (
          SELECT t, id, cost FROM d${i - 1}
          UNION ALL
          SELECT e.dst_t AS t, e.dst AS id, p.cost + e.w AS cost
          FROM d${i - 1} p JOIN edges e ON p.id = e.src AND p.t = e.src_t
        ) GROUP BY t, id)"""
    }.mkString(",")
    base + "," + levels + raw"""
      SELECT t AS node_type, id AS node_id, CAST(cost AS BIGINT) AS cost
      FROM d$BfsHops
      ORDER BY cost, node_type, node_id"""
  }
}
