package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that turns
  * pairwise near-dup PAIRS (MinHash/SimHash/embedding candidates) into
  * dedup GROUPS: "keep one doc per component" is the semantics every
  * large-scale training-data dedup pipeline actually ships (the reference
  * has no grouping stage at all; pairs alone under-delete whenever dups
  * chain a-b-c).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the min label among itself and
  * its neighbors; converged when no label changes. Each round is one
  * shuffle (join on src) + one partial-aggregated min — the same plan
  * shape at 32 rows or 10^10, with no driver-side graph state. Rounds
  * needed: O(log diameter) — each round ALSO pointer-jumps the label
  * forest (label(u) <- min(label(u), label(label(u))), one extra
  * self-join on the two-long label table), so known-reach doubles per
  * round instead of growing by one hop. Near-dup components are
  * overwhelmingly tiny (pairs and small chains) and close in 1-2 rounds
  * either way; the jump is what keeps an adversarial 10^6-long chain at
  * ~20 rounds instead of 10^6 (the same bound the large-star/small-star
  * construction of Kiveris et al., "Connected Components in MapReduce",
  * achieves — with a simpler per-round body: the jump join touches only
  * the label table, never the edge list). The fixpoint is identical to
  * plain propagation: jumps only shortcut within a component.
  *
  * Convergence detection is a single scalar: labels only ever decrease,
  * so `sum(label)` strictly decreases until the fixpoint — one cheap
  * fully-aggregated job per round, no row-by-row diff join. Lineage is
  * cut every round with `localCheckpoint` (label tables are tiny — two
  * longs per node — but an uncut 20-round loop would nest 20 shuffle
  * plans and replay them all on every action).
  */
object ConnectedComponents {

  /** `(node, comp)` for every node appearing in `edges`; `comp` is the
    * minimum node id in the component (deterministic, join-stable).
    *
    * Sizing `maxIter`: pointer jumping needs ~log2(max component
    * diameter) rounds plus 1-2 of slack, so the default 20 covers
    * diameters up to ~2^18 (~260k hops) — measured: a 5000-node path
    * graph closes in ~13 rounds (q106_cc_chain benches it; the 10k-chain
    * spec pins 15). Near-dup graphs are overwhelmingly diameter <= 2 and
    * close in 2-3 rounds; raise maxIter only for genuinely chain-shaped
    * edge sources (record-linkage transitivity, web graphs).
    */
  def labels(edges: DataFrame, aCol: String, bCol: String,
             maxIter: Int = 20): DataFrame = {
    // undirected: propagate both ways
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true)
    // DECIMAL(38,0) sum: exact (no f64 rounding), never overflows
    // (10^10 nodes x 2^63-magnitude hashed ids ~ 1e29 << 1e38), and —
    // unlike a LongType sum under Spark 4's default ANSI mode — never
    // throws on large ids. Null sum == empty edge list: a clean corpus
    // has zero near-dup pairs, return the empty labeling rather than NPE.
    //
    // The sum rides the checkpoint job as an OBSERVED metric
    // (CollectMetrics fires during localCheckpoint's materializing
    // action — probed), so each round schedules ONE job where a
    // separate `agg(sum)` action used to double the round count; at
    // fixture scale the loop's cost IS its scheduled-job count.
    def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs,
          org.apache.spark.sql.functions.sum(
            col("label").cast("decimal(38,0)")).as("ls"))
        .localCheckpoint(true)
      (ck, obs.get("ls").asInstanceOf[java.math.BigDecimal])
    }
    // seed each node with min(self, neighbors) — the first propagation
    // round folded into the node-list aggregation itself (same shuffle
    // that a distinct() would cost). Pair components (the overwhelming
    // near-dup case) are final after this seed, so the loop below runs
    // exactly one confirming round instead of propagate + confirm.
    var (lab, sum) = checkpointWithSum(
      sym.groupBy(col("src").as("node"))
        .agg(min(col("dst")).as("mn"))
        .select(col("node"), least(col("node"), col("mn")).as("label")))
    if (sum == null) return lab.select(col("node"), col("label").as("comp"))
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prop = lab
        .join(sym, col("node") === col("src"))
        .select(col("dst").as("node"), col("label"))
        .union(lab)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"))
      // pointer jump: adopt the label OF my label if smaller. Every label
      // is itself a node in `lab` (labels start as node ids and min only
      // ever selects among them), so the left join hits except transient
      // races that coalesce covers; reach doubles per round. Skipped in
      // round 1: shallow components (the overwhelming near-dup case)
      // converge there from the seed alone, so the common case never
      // pays the extra join — only graphs still open after round 1
      // (deep chains) buy the doubling.
      val (next, nextSum) =
        if (it == 0) checkpointWithSum(prop)
        else {
          // materialize BEFORE the self-join: a lazy prop would embed the
          // propagation subtree twice in the jump plan and re-run its
          // aggregation (ReusedExchange dedups only the shuffle write)
          val p = prop.localCheckpoint(true)
          val parent = p.select(col("node").as("p_node"), col("label").as("p_label"))
          // jump TWICE against the same materialized parent map —
          // label <- min(label, p(label), p(p(label))) — so known reach
          // shrinks ~3x per round instead of 2x: one extra tiny-table
          // join inside the SAME plan and checkpoint job, while a deep
          // chain pays per ROUND (2-3 scheduled jobs each). Same
          // fixpoint: jumps only shortcut within a component.
          val j1 = p.join(parent, col("label") === col("p_node"), "left")
            .select(col("node"),
              least(col("label"), coalesce(col("p_label"), col("label"))).as("label"))
          checkpointWithSum(
            j1.join(parent, col("label") === col("p_node"), "left")
              .select(col("node"),
                least(col("label"), coalesce(col("p_label"), col("label"))).as("label")))
        }
      converged = nextSum.compareTo(sum) == 0
      sum = nextSum
      lab = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(component diameter exceeds the ~2^maxIter pointer-jumped " +
          "reach; raise maxIter)")
    lab.select(col("node"), col("label").as("comp"))
  }

  /** Component summary: one row per dup group with its size and key span —
    * the table a dedup pipeline joins back to pick survivors.
    */
  def components(edges: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 20): DataFrame =
    labels(edges, aCol, bCol, maxIter)
      .groupBy(col("comp").as("comp_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("node")).as("first_doc"),
        max(col("node")).as("last_doc"))

  /** Incremental label maintenance: fold a batch of NEW edges into a
    * standing `(node, comp)` label table WITHOUT re-running connected
    * components over the whole corpus — the missing piece between
    * incremental pair generation (`Dedup.incrementalNearDups`, streaming
    * near-dedup) and group-level dedup decisions. A nightly crawl emits
    * O(batch) new pairs; re-labeling must cost O(batch + touched
    * components), never O(all standing pairs).
    *
    * New edges are incident only on batch nodes, so the ONLY components
    * that can change are those containing a batch endpoint. Those are
    * found with a broadcast semi-join (batch-sized build side — the
    * standing table is scanned but never shuffled), their membership is
    * re-encoded as star edges `(node -> comp)` (connectivity-preserving,
    * diameter 2), and [[labels]] runs over `star ∪ newEdges` — an input
    * of size O(batch + touched members). Untouched components pass
    * through by broadcast anti-join, byte-identical.
    *
    * The result is exactly `labels(oldEdges ∪ newEdges)`: comp ids are
    * component-minimum node ids, old comp ids are themselves members, and
    * min over a merged component equals min over its members — so merged
    * components adopt the true global minimum, not a batch-local one.
    *
    * The batch (its distinct nodes and their components) must fit in a
    * broadcast — the same assumption incremental pair generation already
    * makes. For a corpus-sized "batch", use [[labels]] on the full edge
    * list instead.
    */
  def mergeLabels(standing: DataFrame, newPairs: DataFrame,
                  aCol: String = "key_a", bCol: String = "key_b",
                  maxIter: Int = 20): DataFrame = {
    val batchNodes = newPairs.select(col(aCol).as("node"))
      .union(newPairs.select(col(bCol).as("node"))).distinct()
    // components the batch touches; materialized once — it drives both
    // the member pull and the untouched anti-join
    val touchedComps = standing.join(broadcast(batchNodes), Seq("node"))
      .select(col("comp")).distinct().localCheckpoint(true)
    val touchedRows = standing
      .join(broadcast(touchedComps), Seq("comp"), "left_semi")
    // (node, comp) IS an edge of the component's spanning star; comp is a
    // member node itself, so self-rows carry no information and are dropped
    val starEdges = touchedRows.filter(col("node") =!= col("comp"))
      .select(col("node").as(aCol), col("comp").as(bCol))
    val relabeled = labels(
      starEdges.unionByName(newPairs.select(col(aCol), col(bCol))),
      aCol, bCol, maxIter)
    standing.join(broadcast(touchedComps), Seq("comp"), "left_anti")
      .select(col("node"), col("comp"))
      .unionByName(relabeled.select(col("node"), col("comp")))
  }

  /** Apply the dedup: drop every component member except its minimum key
    * (the survivor). `pairs` is ANY near-dup pair source — exact jaccard,
    * MinHash-LSH, SimHash, or embedding candidates — so the same apply
    * step serves every dedup family. An anti-join against the (tiny
    * relative to the corpus) non-survivor set; the corpus itself is
    * scanned once and never shuffled on anything but the key.
    */
  def dropDuplicates(corpus: DataFrame, keyCol: String, pairs: DataFrame,
                     aCol: String = "key_a", bCol: String = "key_b",
                     maxIter: Int = 20): DataFrame = {
    val gone = labels(pairs, aCol, bCol, maxIter)
      .filter(col("node") =!= col("comp"))
      .select(col("node").as(keyCol))
    corpus.join(gone, Seq(keyCol), "left_anti")
  }

  // --- quality-aware survivor selection ----------------------------------
  //
  // Min-key survivors are deterministic but arbitrary: a production
  // pipeline keeps the BEST member of each dup group (longest version,
  // highest quality score, most recent crawl), not whichever happened to
  // get the smallest id. The score is a caller-supplied Column over the
  // corpus row, so "best" composes with any signal already computed
  // (q21-style quality, token count, recency) without new machinery.

  /** One row per dup component: `(comp_id, survivor, n_docs)` where
    * `survivor` is the member with the MAXIMUM `score`, ties broken by
    * minimum key (keeping determinism). Members missing from `corpus`
    * (pairs can reference retracted rows) can't win; a component whose
    * members are all absent yields no row. Scores fold through max/min
    * aggregates only — two shuffles over the (tiny, dup-members-only)
    * label table, the corpus itself touched once for the score
    * projection. The score comparison is null-safe: an all-null-score
    * component falls back to the min-key survivor instead of vanishing.
    */
  def survivorsBy(corpus: DataFrame, keyCol: String, pairs: DataFrame,
                  score: org.apache.spark.sql.Column,
                  aCol: String = "key_a", bCol: String = "key_b",
                  maxIter: Int = 20): DataFrame =
    survivorsFromLabels(labels(pairs, aCol, bCol, maxIter),
      corpus, keyCol, score)

  private def survivorsFromLabels(lab: DataFrame, corpus: DataFrame,
                                  keyCol: String,
                                  score: org.apache.spark.sql.Column): DataFrame = {
    val scored = corpus.select(col(keyCol).as("node"), score.as("__score"))
    // members (dup-set-sized) feed both the per-comp max and the winner
    // filter — cut the lineage so the corpus score join runs once
    val members = lab.join(scored, Seq("node")).localCheckpoint(true)
    val best = members.groupBy(col("comp")).agg(max(col("__score")).as("__best"))
    members.join(best, Seq("comp"))
      .filter(col("__score") <=> col("__best"))
      .groupBy(col("comp")).agg(min(col("node")).as("survivor"))
      .join(lab.groupBy(col("comp")).agg(count(lit(1)).as("n_docs")), Seq("comp"))
      .select(col("comp").as("comp_id"), col("survivor"), col("n_docs"))
  }

  /** [[dropDuplicates]] with quality-aware survivors: every component
    * member except its best-scoring one (ties -> min key) is dropped.
    * Same anti-join scale shape — the corpus is never shuffled on
    * anything but the key, and the extra work (score projection + two
    * comp-keyed aggregates) is proportional to the dup set, not the
    * corpus.
    */
  /** Centrality-aware survivor selection — the third survivor policy
    * next to keep-first ([[dropDuplicates]]) and keep-best-score
    * ([[dropDuplicatesBy]]): each dup component keeps its most CENTRAL
    * member under PageRank over the (undirected) dup-pair graph, ties
    * broken by minimum key. The intuition: in a near-dup cluster built
    * from quote/overlap pairs, the member most connected to the rest is
    * the original the others derive from, while quality scores can
    * prefer a late augmented copy. Returns `(comp_id, survivor,
    * n_docs)` like [[survivorsBy]].
    *
    * Cost is proportional to the DUP SET, not the corpus: the label
    * table and the rank iterations both run over pair-graph nodes only
    * ([[graft.operators.PageRank]]'s per-iteration join shape).
    */
  def survivorsByCentrality(pairs: DataFrame,
                            aCol: String = "key_a", bCol: String = "key_b",
                            iters: Int = 5, damping: Double = 0.85,
                            maxIter: Int = 20): DataFrame = {
    val lab = labels(pairs, aCol, bCol, maxIter)
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val pr = graft.operators.PageRank.pageRank(
      edges, lab.select(col("node")), iters, damping)
    val members = lab.join(pr, Seq("node"))
    val best = members.groupBy(col("comp")).agg(max(col("rank")).as("__best"))
    members.join(best, Seq("comp"))
      .filter(col("rank") <=> col("__best"))
      .groupBy(col("comp")).agg(min(col("node")).as("survivor"))
      .join(lab.groupBy(col("comp")).agg(count(lit(1)).as("n_docs")),
        Seq("comp"))
      .select(col("comp").as("comp_id"), col("survivor"), col("n_docs"))
  }

  def dropDuplicatesBy(corpus: DataFrame, keyCol: String, pairs: DataFrame,
                       score: org.apache.spark.sql.Column,
                       aCol: String = "key_a", bCol: String = "key_b",
                       maxIter: Int = 20): DataFrame = {
    // labels() localCheckpoints its result internally, so reusing `lab`
    // twice below re-reads cached blocks rather than re-running the loop
    val lab = labels(pairs, aCol, bCol, maxIter)
    val surv = survivorsFromLabels(lab, corpus, keyCol, score)
    val gone = lab
      .join(surv.select(col("comp_id").as("comp"), col("survivor")), Seq("comp"))
      .filter(col("node") =!= col("survivor"))
      .select(col("node").as(keyCol))
    corpus.join(gone, Seq(keyCol), "left_anti")
  }
}
