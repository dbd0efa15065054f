package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge table — graph centrality for corpus curation.
  * The canonical use next to the dedup stack: rank documents by their
  * position in the near-dup/link/citation graph and keep the most
  * central member of each duplicate cluster (a principled alternative
  * to [[graft.dedup]]'s keep-first and keep-best-quality policies), or
  * weight sources by how much the rest of the corpus points at them.
  *
  * Standard damped power iteration with uniform teleport:
  * `r'(v) = (1-d)/N + d * (sum over in-neighbors u of r(u)/outDeg(u)
  * + danglingMass/N)` — dangling nodes (no out-edges) redistribute
  * their mass uniformly, so total rank mass stays 1 per iteration.
  *
  * Scale shape per iteration: one equi-join of the edge table with the
  * rank vector on `src` (both partitioned by the join key — the
  * classic PageRank shuffle), one partial-agg'd sum per `dst`, one
  * broadcast scalar for the dangling mass. Ranks are
  * `localCheckpoint`ed per round (the [[graft.dedup.ConnectedComponents]]
  * discipline) so the plan does not grow with the iteration count.
  * Fixed iteration count, not convergence-tested: deterministic cost
  * and a deterministic, engine-checkable result.
  */
object PageRank {

  /** Run `iters` damped iterations over `edges` (columns `src`, `dst`;
    * self-loops dropped, parallel edges collapsed) with the node set
    * `nodes` (one column, the node id — pass the full corpus key set so
    * isolated documents still receive teleport rank). Returns
    * `(node, rank)` with rank rounded to 6 decimals.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val nodeCol = nodes.columns.head
    val nodeDf = nodes.select(col(nodeCol).as("node")).distinct()
    val n = nodeDf.count()
    require(n > 0, "empty node set")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = false)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__od"))
      .localCheckpoint(eager = false)
    // dangling nodes are a property of the GRAPH, not the iteration.
    // Round 1's dangling mass doubles as the existence probe: round-1
    // ranks are uniform 1/N, so dm1 = (#dangling)/N and dm1 == 0.0 iff
    // no dangling node exists — the round-11 separate count() probe was
    // pure overhead on dangling graphs (driver-measured regression) and
    // is folded away. Round 1 collects its mass (the same anti-join +
    // sum expression the broadcast form evaluated — identical double);
    // later rounds skip the dangling subplan outright when dm1 == 0.0
    // (0.0/N is IEEE-exact zero, so ranks are bit-identical to the
    // computed-mass path — spec'd) and keep the per-round 1-row
    // broadcast otherwise.
    var ranks = nodeDf.withColumn("rank", lit(1.0) / lit(n.toDouble))
    var hasDangling = false
    for (round <- 1 to iters) {
      // mass parked on dangling nodes this round (a 1-row broadcast;
      // round 1 collects it instead — probe and mass in one job)
      val withDm: DataFrame => DataFrame =
        if (round == 1) {
          val dm1 = ranks.join(outDeg.select(col("src").as("node")),
              Seq("node"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
            .head().getDouble(0)
          hasDangling = dm1 != 0.0
          df => df.withColumn("__dm", lit(dm1))
        } else if (!hasDangling) df => df.withColumn("__dm", lit(0.0))
        else {
          val dangling = ranks.join(outDeg.select(col("src").as("node")),
              Seq("node"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
          df => df.crossJoin(broadcast(dangling))
        }
      val contrib = e
        .join(outDeg, Seq("src"))
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__od")).as("__c"))
      ranks = withDm(nodeDf.join(contrib, Seq("node"), "left"))
        .select(col("node"),
          (lit((1.0 - damping) / n.toDouble) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / lit(n.toDouble))).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
