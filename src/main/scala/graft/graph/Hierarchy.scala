package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening — every node's path to its root through a
  * parent-child edge list (org charts, category trees, account
  * rollup structures): the warehouse "explode the tree" operator that
  * turns recursive structure into joinable (node, root, depth, path)
  * rows.
  *
  * Iterative level-walk, the [[Graph.shortestPaths]] cost shape: hop h
  * joins ONLY the still-walking rows against the parent edges (finished
  * rows leave the loop), so total work is O(Σ path lengths) = O(nodes ×
  * avg depth), not O(nodes × maxDepth); each hop localCheckpoints to
  * truncate lineage. A node is a root when it has no parent edge
  * (self-loop parent edges are treated as absent — both conventions
  * appear in real dimension tables).
  *
  * `maxDepth` bounds the walk; exceeding it (a cycle, or a deeper tree
  * than the caller promised) throws rather than silently truncating.
  * Duplicate (child, parent) edges are deduped; a child with TWO
  * distinct parents throws up front — each hop's left join would
  * silently multiply that child's walking rows into several (node,
  * root, path) rows, the error-never-nonsense discipline violated.
  */
object Hierarchy {

  /** (node, root, depth, path) for every row of `nodes`; `path` is the
    * ">"-joined id chain from the node to its root inclusive. */
  def flattenToRoot(nodes: DataFrame, idCol: String,
                    edges: DataFrame, childCol: String, parentCol: String,
                    maxDepth: Int = 30): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    // materialize the edge list ONCE: the loop joins it every hop, and
    // without this each hop re-scans the raw edges source maxDepth times
    val par = edges
      .select(col(childCol).as("cur"), col(parentCol).as("__p"))
      .filter(col("__p").isNotNull && col("cur") =!= col("__p"))
      .distinct() // exact duplicate edges are noise, not ambiguity
      .localCheckpoint(true)
    // precondition, not silent fan-out: one distinct parent per child
    // (one cheap aggregation over the checkpointed id-pair frame)
    val multiParent = par.groupBy("cur").count()
      .filter(col("count") > 1).limit(1).count()
    require(multiParent == 0,
      "flattenToRoot: edge list has a child with multiple distinct parents " +
        "(resolve to a tree/forest before flattening)")
    var walking = nodes.select(col(idCol).as("node"))
      .withColumn("cur", col("node"))
      .withColumn("depth", lit(0))
      .withColumn("path", col("node").cast("string"))
    // seed with an empty same-schema frame: an empty `nodes` input must
    // return an empty result, not NPE on a never-assigned accumulator
    var done: DataFrame = walking.limit(0)
    val hops = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var hop = 0
    var remaining = walking.count()
    while (hop < maxDepth && remaining > 0) {
      val joined = walking.join(par, Seq("cur"), "left").localCheckpoint(true)
      hops += joined
      val finished = joined.filter(col("__p").isNull).drop("__p")
      done = done.unionByName(finished)
      walking = joined.filter(col("__p").isNotNull)
        .select(col("node"), col("__p").as("cur"),
          (col("depth") + 1).as("depth"),
          concat(col("path"), lit(">"), col("__p").cast("string")).as("path"))
      remaining = walking.count()
      hop += 1
    }
    require(remaining == 0,
      s"flattenToRoot: $remaining nodes still walking after $maxDepth hops " +
        "(cycle in the edge list, or raise maxDepth)")
    // checkpoint hygiene (VERDICT r11 #1): `done` unions slices of every
    // hop's checkpoint — one node-sized eager re-checkpoint frees them
    // all plus the edge frame; only the tracked output survives
    val out = graft.plan.Checkpoints.track(
      done.select(col("node"), col("cur").as("root"), col("depth"),
          col("path"))
        .localCheckpoint(true))
    hops.foreach(graft.plan.Checkpoints.releaseNow)
    graft.plan.Checkpoints.releaseNow(par)
    out
  }
}
