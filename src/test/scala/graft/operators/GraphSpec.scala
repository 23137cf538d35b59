package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PageRank invariants the value oracle can't express:
  * mass conservation (no dangling nodes ⇒ Σscore = 1 every round),
  * closed-form fixpoints on synthetic graphs, and the bipartite
  * concentration property on the fixture graph. */
class GraphSpec extends SparkTestBase {

  import spark.implicits._

  test("symmetric two-node graph lands on the uniform fixpoint") {
    val edges = Seq(
      (1L, "a", 2L, "a"),
      (2L, "a", 1L, "a"))
      .toDF("src", "src_t", "dst", "dst_t")
    val ranks = Graph.pageRank(spark, edges).collect()
    assert(ranks.length == 2)
    ranks.foreach(r => assert(math.abs(r.getDouble(2) - 0.5) < 1e-12,
      s"symmetric pair must stay at 0.5, got ${r.getDouble(2)}"))
  }

  test("star graph concentrates mass at the hub") {
    // hub 0 <-> leaves 1..8, mirrored
    val pairs = (1L to 8L).flatMap(l =>
      Seq((0L, "a", l, "a"), (l, "a", 0L, "a")))
    val ranks = Graph.pageRank(spark, pairs.toDF("src", "src_t", "dst", "dst_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val hub = ranks(0L)
    (1L to 8L).foreach(l => assert(hub > ranks(l) * 3,
      s"hub $hub should dominate leaf ${ranks(l)}"))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9, "mass not conserved")
  }

  test("the partitioned large-n path emits exactly the broadcast path's scores") {
    // force the shuffle-join/columnar-layout path (the sf10 shape) on
    // the small fixture by dropping the broadcast threshold to 1, and
    // pin it row-identical to the default broadcast path — the gate
    // must change the PLAN, never the numbers
    val prev = spark.conf.getOption("graft.pagerank.broadcastNodes")
    val viaBroadcast = graft.SparkEntry
      .queries("g1_pagerank_trade_graph")(spark, sfDir).collect().map(_.toSeq)
    spark.conf.set("graft.pagerank.broadcastNodes", "1")
    try {
      val viaShuffle = graft.SparkEntry
        .queries("g1_pagerank_trade_graph")(spark, sfDir).collect().map(_.toSeq)
      assert(viaShuffle.sameElements(viaBroadcast),
        "join-strategy gate changed the result")
    } finally prev match {
      case Some(v) => spark.conf.set("graft.pagerank.broadcastNodes", v)
      case None    => spark.conf.unset("graft.pagerank.broadcastNodes")
    }
  }

  test("fixture graph conserves mass and suppliers out-rank customers") {
    val g1 = graft.SparkEntry.queries("g1_pagerank_trade_graph")(spark, sfDir)
      .collect()
    assert(g1.length == 50)
    // the bipartite fixture has ~15x more customers than suppliers, so
    // supplier-side mass per node is higher: the top of the table is
    // supplier-typed
    assert(g1.take(10).forall(_.getString(0) == "s"),
      "top-10 central nodes should all be suppliers")
    assert(g1.forall(_.getDouble(2) > 0.0))
    // monotone non-increasing by construction of the orderBy
    val scores = g1.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  // ------------------------------------------------------- g2 triangles

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(spark, edges.toDF("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 gives every node three triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = tri(k4)
    assert(got == (1L to 4L).map(_ -> 3L).toMap)
  }

  test("a 4-cycle has no triangles and a pendant node never appears") {
    // square 1-2-3-4 plus pendant 5 off node 1
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L))).isEmpty)
    // add one diagonal: two triangles, shared edge endpoints get 2
    val got = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L), (1L, 3L)))
    assert(got == Map(1L -> 2L, 3L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("orientation scheme matches naive enumeration across seeds and densities") {
    // deterministic pseudorandom graphs spanning sparse to near-dense,
    // including skewed-degree shapes (p=0.55 on 20 nodes ⇒ hub-heavy):
    // the orientation must agree with brute force on every one
    for ((seed, n, p) <- Seq((42, 30, 0.25), (7, 20, 0.55), (13, 40, 0.1),
      (99, 25, 0.4), (5, 15, 0.8))) {
      val rnd = new scala.util.Random(seed)
      val edges = for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong if rnd.nextDouble() < p
      } yield (a, b)
      val eset = edges.toSet
      val naive = scala.collection.mutable.Map.empty[Long, Long]
      for {
        (a, b) <- edges; c <- (b + 1) to n.toLong
        if eset.contains((a, c)) && eset.contains((b, c))
      } Seq(a, b, c).foreach(x => naive(x) = naive.getOrElse(x, 0L) + 1L)
      assert(tri(edges) == naive.toMap, s"mismatch at (seed=$seed, n=$n, p=$p)")
    }
  }

  test("g2 fixture output is positive-count, node-distinct and ordered") {
    val rows = graft.SparkEntry
      .queries("g2_triangle_copurchase")(spark, sfDir).collect()
    assert(rows.nonEmpty, "fixture co-purchase graph should close triangles")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.forall(_.getLong(1) > 0))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("g3 BFS hops satisfy the shortest-path invariants on the fixture graph") {
    import spark.implicits._
    val dist = graft.SparkEntry.queries("g3_bfs_hops")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // seeds are exactly the hop-0 set
    val seeds = graft.Tables(spark, sfDir, "customer")
      .filter($"c_nationkey" === 0).select($"c_custkey").as[Long]
      .collect().map(id => ("c", id)).toSet
    assert(dist.filter(_._2 == 0L).keySet == seeds)
    // rebuild the undirected adjacency driver-side (fixture-sized)
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val pairs = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect()
    val adj = (pairs.map { case (c, p) => (("c", c), ("s", p)) } ++
      pairs.map { case (c, p) => (("s", p), ("c", c)) })
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // triangle inequality both ways: every non-seed node's hop is
    // exactly 1 + min over neighbors (BFS optimality, not just
    // reachability)
    dist.foreach { case (node, h) =>
      if (h > 0) {
        val minNbr = adj(node).flatMap(dist.get).min
        assert(h == minNbr + 1,
          s"$node at hop $h but its best neighbor is at $minNbr")
      }
    }
    // the 4-round cap covers the diameter: no frontier remains (any
    // unreached node adjacent to a reached one would violate this)
    val reached = dist.keySet
    val expandable = reached.exists(n =>
      adj.getOrElse(n, Array.empty[(String, Long)]).exists(!reached(_)))
    assert(!expandable, "cap truncated the BFS before the diameter")
  }

  test("g4 equals a driver-side Bellman-Ford over the weighted fixture graph") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("g4_weighted_paths")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val weighted = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey", $"l_suppkey").count()
      .as[(Long, Long, Long)].collect()
      .map { case (c, p, n) => (c, p, 100L - math.min(n, 99L)) }
    val edges = weighted.flatMap { case (c, p, w) =>
      Seq((("c", c), ("s", p), w), (("s", p), ("c", c), w))
    }
    val seeds = graft.Tables(spark, sfDir, "customer")
      .filter($"c_nationkey" === 0).select($"c_custkey").as[Long]
      .collect().map(id => ("c", id) -> 0L).toMap
    var dist = seeds
    (1 to 4).foreach { _ =>
      val relaxed = edges.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).min
      }
    }
    assert(got == dist, {
      val diff = got.collect {
        case (k, c) if dist.get(k) != Some(c) => s"$k: $c vs ${dist.get(k)}"
      }
      s"${diff.size} nodes disagree: ${diff.take(5).mkString(", ")}"
    })
  }

  test("g5 equals a driver-side k-core peel and the cascade is real") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("g5_kcore_peel")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the co-purchase graph driver-side (fixture-sized)
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey",
        date_trunc("week", $"l_shipdate").as("w"))
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val cp = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_partkey", $"w").distinct()
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val edges = cp.groupBy(t => (t._2, t._3)).valuesIterator.flatMap { grp =>
      val cs = grp.map(_._1).distinct.sorted
      for (i <- cs.indices; j <- i + 1 until cs.length) yield (cs(i), cs(j))
    }.toSet
    val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    edges.foreach { case (x, y) =>
      adj.getOrElseUpdate(x, collection.mutable.Set.empty) += y
      adj.getOrElseUpdate(y, collection.mutable.Set.empty) += x
    }
    // independent peel: each wave removes degree-<3 nodes, where degree
    // counts only still-alive neighbors
    var alive = adj.keySet.toSet
    val expected = collection.mutable.Map.empty[Long, Long]
    for (r <- 1 to 4) {
      val rm = alive.filter(v => adj(v).count(alive) < 3)
      rm.foreach(v => expected(v) = r.toLong)
      alive = alive -- rm
    }
    alive.foreach(v => expected(v) = 0L)
    assert(got == expected.toMap, {
      val diff = got.collect {
        case (k, w) if expected.get(k) != Some(w) => s"$k: $w vs ${expected.get(k)}"
      }
      s"${diff.size} nodes disagree: ${diff.take(5).mkString(", ")}"
    })
    // the cascade must actually cascade — at least two distinct nonzero
    // waves, or a single degree filter would pass this test
    assert(got.values.filter(_ > 0).toSet.size >= 2,
      "no multi-wave cascade on the fixture graph")
  }

  test("g6 equals a driver-side synchronous LPA and finds real communities") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("g6_label_propagation")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey",
        date_trunc("week", $"l_shipdate").as("w"))
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val cp = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_partkey", $"w").distinct()
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val edges = cp.groupBy(t => (t._2, t._3)).valuesIterator.flatMap { grp =>
      val cs = grp.map(_._1).distinct.sorted
      for (i <- cs.indices; j <- i + 1 until cs.length) yield (cs(i), cs(j))
    }.toSet
    val adj = collection.mutable.Map.empty[Long, collection.mutable.ArrayBuffer[Long]]
    edges.foreach { case (x, y) =>
      adj.getOrElseUpdate(x, collection.mutable.ArrayBuffer.empty) += y
      adj.getOrElseUpdate(y, collection.mutable.ArrayBuffer.empty) += x
    }
    var labels = adj.keysIterator.map(v => v -> v).toMap
    (1 to 3).foreach { _ =>
      labels = adj.iterator.map { case (v, nbrs) =>
        // mode of neighbor labels, ties to the smallest label — the
        // deterministic synchronous vote the engine implements
        val votes = nbrs.map(labels).groupBy(identity)
          .map { case (l, vs) => (l, vs.size) }
        v -> votes.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    assert(got == labels, {
      val diff = got.collect {
        case (k, c) if labels.get(k) != Some(c) => s"$k: $c vs ${labels.get(k)}"
      }
      s"${diff.size} nodes disagree: ${diff.take(5).mkString(", ")}"
    })
    // communities are real: fewer than nodes (labels propagated), more
    // than one (the mode vote did not collapse the graph)
    val nComm = got.values.toSet.size
    assert(nComm > 1 && nComm < got.size,
      s"$nComm communities over ${got.size} nodes is not community structure")
  }

  test("g7 equals a driver-side two-round integer HITS with the same top-50 cuts") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("g7_hits_trade_graph")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
    val ord = graft.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val pairs = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect()
    var hub = pairs.map(_._1).distinct.map(_ -> 1L).toMap
    var auth = Map.empty[Long, Long]
    (1 to 2).foreach { _ =>
      auth = pairs.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hub(e._1)).sum }
      hub = pairs.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auth(e._2)).sum }
    }
    def top50(m: Map[Long, Long], t: String) =
      m.toSeq.sortBy { case (id, s) => (-s, id) }.take(50)
        .map { case (id, s) => (t, id, s) }
    val expected = {
      val rows = top50(hub, "c") ++ top50(auth, "s")
      rows.sortBy { case (t, id, s) => (t, -s, id) }
    }
    assert(got.toSeq == expected, {
      val diff = got.zip(expected).filter { case (a, b) => a != b }
      s"${diff.size} rows disagree, first: ${diff.headOption}"
    })
    // the bipartite roles are real: every hub row is a customer, every
    // authority row a supplier, and all scores are positive
    assert(got.forall(_._3 > 0L))
    assert(got.count(_._1 == "c") == 50 && got.count(_._1 == "s") > 0)
  }
}
