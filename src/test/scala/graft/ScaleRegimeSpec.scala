package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.graph.Graph

/** Pins the big-data regime boundaries at their DOCUMENTED thresholds
  * (VERDICT r4 task 1). `ScaleRehearsal` drives the same decisions on data
  * large enough to cross them naturally; this spec guards the thresholds
  * themselves so a silent default change cannot move the boundary.
  */
class ScaleRegimeSpec extends AnyFunSuite {

  test("duplicateClusters: driver union-find up to 2^20 directed edges, distributed above") {
    assert(Dedup.ccDriverRegime(1L << 20))
    assert(!Dedup.ccDriverRegime((1L << 20) + 1))
    // non-orderable id types always take the distributed path
    assert(!Dedup.ccDriverRegime(10, orderable = false))
  }

  test("pageRank: broadcast ranks up to 4*2^20 nodes, co-partitioned above") {
    assert(Graph.pageRankBroadcastRegime(4L << 20))
    assert(!Graph.pageRankBroadcastRegime((4L << 20) + 1))
  }
}
