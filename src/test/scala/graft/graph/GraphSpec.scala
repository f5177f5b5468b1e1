package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank on a chain matches hand-computed ranks (dangling node, no in-edges)") {
    // a -> b -> c: a has no in-edges (floor rank 0.15 after one round),
    // c is dangling (contributes nothing onward)
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // r1: a=0.15, b=0.15+0.85*1=1.0,    c=0.15+0.85*1=1.0
    // r2: a=0.15, b=0.15+0.85*0.15,     c=0.15+0.85*1.0
    // r3: a=0.15, b=0.15+0.85*0.15,     c=0.15+0.85*0.2775
    assert(math.abs(r("a") - 0.15) < 1e-12)
    assert(math.abs(r("b") - 0.2775) < 1e-12)
    assert(math.abs(r("c") - 0.385875) < 1e-12)
  }

  test("pageRank dedupes parallel edges and conserves symmetric-cycle uniformity") {
    // duplicated edge rows must count once; on a 2-cycle every rank stays 1.0
    val edges = Seq(("x", "y"), ("x", "y"), ("y", "x")).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set("x", "y"))
    r.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("pageRank sums weighted contributions across in-edges") {
    // hub h points at t alongside a second source s; t's in-mass is
    // r(h)/2 + r(s)/1 (h's out-degree splits its rank)
    val edges = Seq(("h", "t"), ("h", "u"), ("s", "t")).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("t") - (0.15 + 0.85 * (0.5 + 1.0))) < 1e-12)
    assert(math.abs(r("u") - (0.15 + 0.85 * 0.5)) < 1e-12)
    assert(math.abs(r("h") - 0.15) < 1e-12)
  }

  test("pageRank big regime (broadcastMaxNodes = 0) matches the broadcast regime") {
    // forces the row-per-edge co-partitioned path that real runs only hit
    // above 4M nodes — its ranks must be identical (up to summation noise)
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")).toDF("src", "dst")
    val fast = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val big = Graph.pageRank(edges, "src", "dst", iterations = 3,
        broadcastMaxNodes = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fast.keySet == big.keySet)
    fast.foreach { case (k, v) => assert(math.abs(v - big(k)) < 1e-12, s"node $k") }
  }

  test("shortestPaths relaxes hop distances and stops at maxHops") {
    // a -> b -> c -> d, plus shortcut a -> c
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")).toDF("s", "d")
    val seeds = Seq("a").toDF("id")
    val got = Graph.shortestPaths(edges, "s", "d", seeds, "id", maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2))
    val capped = Graph.shortestPaths(edges, "s", "d", seeds, "id", maxHops = 1)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(capped == Map("a" -> 0, "b" -> 1, "c" -> 1)) // d unreached at 1 hop
  }

  test("connectedComponents labels every node with its reachable minimum") {
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 3L, 3L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("triangleCounts: K4 plus pendant, dirty edges cleaned") {
    // K4 on 1-4 (4 triangles, each node in 3), pendant node 5, plus
    // duplicate / reversed edges and a self-loop that must all be ignored
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L), (3L, 3L), (4L, 5L)).toDF("s", "d")
    val got = Graph.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("triangleCounts: triangle-free graphs count zero everywhere") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d") // path: no cycles
    assert(Graph.triangleCounts(path, "s", "d")
      .collect().map(_.getLong(1)).forall(_ == 0L))
    val bipartite = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("s", "d")
    assert(Graph.triangleCounts(bipartite, "s", "d")
      .collect().map(_.getLong(1)).forall(_ == 0L)) // C4: even cycles only
  }

  test("triangleCounts: looped calls leave nothing in the cache manager") {
    spark.catalog.clearCache()
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    (1 to 3).foreach { _ =>
      val got = Graph.triangleCounts(edges, "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "triangleCounts left persisted edge frames behind")
  }

  test("degrees reports out/in/total per node in one pass") {
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val d = Graph.degrees(edges, "src", "dst")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(d(1L) == ((2L, 1L, 3L)))
    assert(d(2L) == ((0L, 1L, 1L)))
    assert(d(3L) == ((1L, 1L, 2L)))
  }
}
