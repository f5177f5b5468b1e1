package graft.graph

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("flattenToRoot: paths, depths, roots on a two-tree forest") {
    // tree 1: 1 <- 2 <- 4; tree 2: 3 (isolated root); self-loop 1->1 ignored
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((2L, 1L), (4L, 2L), (1L, 1L)).toDF("c", "p")
    val got = Hierarchy.flattenToRoot(nodes, "id", edges, "c", "p", maxDepth = 5)
      .as[(Long, Long, Int, String)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0, "1"), (3L, 3L, 0, "3"),
      (2L, 1L, 1, "2>1"), (4L, 1L, 2, "4>2>1")))
  }

  test("flattenToRoot: duplicate edges dedupe; multi-parent throws up front") {
    val nodes = Seq(1L, 2L).toDF("id")
    // duplicated (2 -> 1) edge: still exactly one (2, 1, 1, "2>1") row
    val dup = Seq((2L, 1L), (2L, 1L)).toDF("c", "p")
    val got = Hierarchy.flattenToRoot(nodes, "id", dup, "c", "p", maxDepth = 3)
      .as[(Long, Long, Int, String)].collect().toSet
    assert(got == Set((1L, 1L, 0, "1"), (2L, 1L, 1, "2>1")))
    // two DISTINCT parents for node 3: precondition violation, not fan-out
    val multi = Seq((3L, 1L), (3L, 2L)).toDF("c", "p")
    val e = intercept[IllegalArgumentException] {
      Hierarchy.flattenToRoot(Seq(1L, 2L, 3L).toDF("id"), "id",
        multi, "c", "p", maxDepth = 3)
    }
    assert(e.getMessage.contains("multiple distinct parents"))
  }

  test("flattenToRoot: cycle or too-deep tree throws instead of truncating") {
    val nodes = Seq(1L, 2L).toDF("id")
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("c", "p")
    intercept[IllegalArgumentException] {
      Hierarchy.flattenToRoot(nodes, "id", cyc, "c", "p", maxDepth = 4)
    }
  }
}
