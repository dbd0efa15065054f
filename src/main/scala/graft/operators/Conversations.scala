package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conversation-tree flattening: multi-turn chat data arrives as a
  * MESSAGE FOREST — each message points at its parent, and one prompt
  * can fan out into several assistant branches (regenerations, A/B
  * samples, human branches). SFT training wants LINEAR examples, one per
  * root-to-leaf path, so every branch becomes its own training sequence
  * and no branch silently shadows another (the OpenAssistant OASST1
  * release ships exactly this shape: a tree per thread, flattened to
  * paths for training).
  *
  * Scale shape: breadth-first descent from the roots — one equi-join
  * per tree LEVEL (children keyed by parent id, sort-merge/shuffle
  * clean), not per message, so a 10^10-message forest of depth-20 trees
  * is 20 joins regardless of row count. Each level is localCheckpointed:
  * the frontier feeds both the next join and the final union, and
  * without the cut the plan re-derives level k from scratch for every
  * level above it. Paths accumulate as '/'-joined id strings (bounded by
  * depth x id width); the leaf filter is one anti-join against the
  * distinct parent set.
  *
  * Cycles (or depth beyond `maxDepth`) fail loudly instead of looping:
  * a parent pointer that never reaches a root is data corruption the
  * pipeline owner must see, not a row to drop. Two distinct failure
  * shapes are both caught: a root-REACHABLE chain deeper than
  * `maxDepth` trips the depth check inside the loop, and a subtree the
  * BFS never reaches at all (a cycle among non-roots, or a parent id
  * absent from the dataset) — which would otherwise terminate the loop
  * silently — trips the reachability audit after it (every level is
  * localCheckpointed, so the per-level counts are local re-scans, not
  * recomputation).
  */
object Conversations {

  /** Fail loudly when the BFS did not visit every message: `reached` is
    * the sum of level sizes, `total` the input row count. A shortfall
    * means messages whose parent chain never reaches a root — a cycle
    * among non-root messages, or a parent id missing from the dataset.
    */
  private def auditReachability(op: String, total: Long, reached: Long): Unit =
    if (reached != total)
      throw new IllegalStateException(
        s"$op: ${total - reached} of $total messages are unreachable from " +
          "the roots — a cycle in the parent pointers, or parent ids " +
          "absent from the dataset; repair the forest instead of " +
          "silently dropping these subtrees")

  /** Flatten a message forest to root-to-leaf paths.
    *
    * `msgs` carries one row per message: `idCol` (unique id) and
    * `parentCol` (null for roots). Output: one row per LEAF —
    * `(leaf_id, depth, path)` with depth the 1-based level of the leaf
    * and path the '/'-joined ids from root to leaf. A root with no
    * children is its own single-node path.
    */
  def chatPaths(msgs: DataFrame, idCol: String, parentCol: String,
                maxDepth: Int = 32): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val edges = msgs
      .select(col(idCol).cast("long").as("__id"),
        col(parentCol).cast("long").as("__parent"))
      .localCheckpoint(true) // scanned once per level + once for parents
    val children = edges.filter(col("__parent").isNotNull)
    val parents = children.select(col("__parent").as("__pid")).distinct()

    var frontier = edges.filter(col("__parent").isNull)
      .select(col("__id"), col("__id").cast("string").as("path"),
        lit(1L).as("depth"))
      .localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var depth = 1L
    while (!frontier.isEmpty) {
      if (depth > maxDepth)
        throw new IllegalStateException(
          s"chatPaths: depth exceeds maxDepth=$maxDepth — cycle in the " +
            "parent pointers, or raise maxDepth for genuinely deep threads")
      depth += 1
      frontier = children
        .join(frontier.select(col("__id").as("__parent"), col("path")),
          Seq("__parent"))
        .select(col("__id"),
          concat(col("path"), lit("/"), col("__id").cast("string")).as("path"),
          lit(depth).as("depth"))
        .localCheckpoint(true)
      if (!frontier.isEmpty) levels += frontier
    }
    auditReachability("chatPaths", edges.count(), levels.map(_.count()).sum)
    levels.reduce(_ unionByName _)
      .join(parents, col("__id") === col("__pid"), "left_anti")
      .select(col("__id").as("leaf_id"), col("depth"), col("path"))
  }

  /** Flatten a message forest directly to SFT-ready examples: one row
    * per LEAF with the rendered ANCESTOR context (root..parent texts
    * joined by `sep`) as the prompt and the leaf's own text as the
    * response — the OASST-style "every branch becomes its own training
    * sequence" assembly, ready for [[Sft.renderPairs]]' loss-span
    * template. Same level-at-a-time BFS as [[chatPaths]] (one equi-join
    * per tree depth, localCheckpoint per level); context strings grow
    * with depth × message length, the price of a linearized example.
    *
    * Output: (leaf_id, depth, context, response). A root with no
    * children is a single-turn example with an empty context.
    */
  def chatExamples(msgs: DataFrame, idCol: String, parentCol: String,
                   textCol: String, sep: String = "\n",
                   maxDepth: Int = 32): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val nodes = msgs
      .select(col(idCol).cast("long").as("__id"),
        col(parentCol).cast("long").as("__parent"),
        coalesce(col(textCol).cast("string"), lit("")).as("__text"))
      .localCheckpoint(true)
    val children = nodes.filter(col("__parent").isNotNull)
    val parents = children.select(col("__parent").as("__pid")).distinct()

    var frontier = nodes.filter(col("__parent").isNull)
      .select(col("__id"), col("__text"), lit("").as("ctx"),
        lit(1L).as("depth"))
      .localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var depth = 1L
    while (!frontier.isEmpty) {
      if (depth > maxDepth)
        throw new IllegalStateException(
          s"chatExamples: depth exceeds maxDepth=$maxDepth — cycle in the " +
            "parent pointers, or raise maxDepth for genuinely deep threads")
      depth += 1
      frontier = children
        .join(frontier.select(col("__id").as("__parent"),
          col("__text").as("__ptext"), col("ctx")), Seq("__parent"))
        .select(col("__id"), col("__text"),
          when(col("ctx") === "", col("__ptext"))
            .otherwise(concat(col("ctx"), lit(sep), col("__ptext")))
            .as("ctx"),
          lit(depth).as("depth"))
        .localCheckpoint(true)
      if (!frontier.isEmpty) levels += frontier
    }
    auditReachability("chatExamples", nodes.count(), levels.map(_.count()).sum)
    levels.reduce(_ unionByName _)
      .join(parents, col("__id") === col("__pid"), "left_anti")
      .select(col("__id").as("leaf_id"), col("depth"),
        col("ctx").as("context"), col("__text").as("response"))
  }
}
