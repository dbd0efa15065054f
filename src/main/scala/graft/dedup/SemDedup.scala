package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space, then look for
  * near-duplicate pairs ONLY within each cluster — the scale path that
  * turns the O(n²) cosine-pair problem into k independent
  * O((n/k)²) problems. At web scale (the paper runs 50k clusters over
  * LAION embeddings) `k` is chosen so n/k is bounded — each cluster's
  * pair generation then fits one executor's core, and clusters
  * parallelize perfectly.
  *
  * Centroid choice here is DETERMINISTIC — the `k` vectors that sort
  * first in `(md5(key), key)` order, i.e. a uniform content-independent
  * sample (the same ordering discipline as
  * [[graft.operators.Shuffle.deterministicShuffle]]) — rather than
  * k-means-trained. That makes the whole operator engine-checkable (the
  * driver's DuckDB oracle re-derives centroids, assignment and pairs
  * exactly; a Lloyd iteration is not SQL-expressible) and reproducible
  * across runs. For trained centroids, compose with the IVF machinery
  * instead ([[graft.search.Ann.trainIvf]] + per-list pair generation);
  * the assignment/pair mechanics are identical.
  *
  * The reference engine has no dedup surface at all; this extends the
  * LSH/SimHash/embedding near-dup family (Dedup.scala) with the
  * cluster-bucketed variant that composes with a persistent ANN index's
  * stored assignments.
  *
  * Scale shape: centroids are a `k`-row broadcast; assignment is one
  * map-side pass (a partial-aggregated max over k candidate structs per
  * row — no shuffle wider than one row per input row); pair generation
  * is a self-equi-join on `cluster_id` — the verified-pair output joins
  * vectors back only for candidates, so the wide rows never shuffle.
  */
object SemDedup {

  /** The deterministic centroid table: `(cluster_id, __cvec)` — the `k`
    * vectors sorting first by `(md5(key), key)`; `cluster_id` is the
    * centroid's own key. `LIMIT k` collapses to the driver, which is the
    * point: k rows are about to be broadcast anyway.
    */
  def centroids(embDf: DataFrame, keyCol: String, embCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    embDf
      .select(col(keyCol).as("cluster_id"), col(embCol).as("__cvec"),
        md5(col(keyCol).cast("string")).as("__h"))
      // the vector itself is the last tie-break: a multi-vector key
      // (chunked index) ties on (md5, key) and would otherwise pick a
      // partition-order-dependent chunk as the centroid
      .orderBy(col("__h"), col("cluster_id"), col("__cvec"))
      .limit(k)
      .drop("__h")
  }

  /** `embDf` plus a `cluster_id` column: each vector's nearest centroid
    * by cosine, ties broken toward the SMALLEST centroid key so the
    * assignment is total-order deterministic (and oracle-reproducible).
    *
    * Mechanics: cross-join the k-row broadcast, then take the
    * lexicographic max of `struct(cos, -cluster_id)` per key — a
    * partial-aggregated (map-side combined) argmax, so the shuffle
    * carries one small row per input vector, never the k-fanout.
    * `keyCol` must be integral (the negation trick needs a numeric key).
    */
  def assign(embDf: DataFrame, keyCol: String, embCol: String,
             k: Int): DataFrame = {
    val cents = centroids(embDf, keyCol, embCol, k)
    val best = embDf
      .select(col(keyCol), col(embCol))
      .crossJoin(broadcast(cents))
      .withColumn("__cos", VectorFunctions.cosine(col(embCol), col("__cvec")))
      .groupBy(col(keyCol))
      .agg(max(struct(col("__cos"),
        (-col("cluster_id")).cast("long").as("__negc"))).as("__best"))
      .select(col(keyCol), (-col("__best.__negc")).as("cluster_id"))
    embDf.join(best, keyCol)
  }

  /** Semantic near-duplicate pairs: vectors in the SAME cluster with
    * cosine >= `threshold`. Output `(cluster_id, key_a, key_b, cosine)`
    * with `key_a < key_b` and cosine rounded to 6 places.
    *
    * Candidate generation carries only `(key, cluster_id)` through the
    * self-join; vectors rejoin for the (much smaller) candidate set.
    * Cross-cluster near-dups are invisible by construction — that recall
    * trade IS SemDeDup's contract (raise `k` for tighter clusters but
    * more boundary misses, or run the exact twin on a sample to measure).
    */
  def semanticDups(embDf: DataFrame, keyCol: String, embCol: String,
                   k: Int, threshold: Double): DataFrame =
    semanticDupsAssigned(assign(embDf, keyCol, embCol, k),
      keyCol, embCol, "cluster_id", threshold)

  /** The cluster count that keeps per-cluster pair work BOUNDED as the
    * corpus grows: `k = ceil(n / targetPerCluster)` (floored at
    * `minK`). SemDeDup is O(n²/k); a FIXED k makes it quadratic again —
    * measured: the 16-cluster q124 query ran 15.3x slower on a 10x
    * corpus (round-9 ScaleBench) because average cluster size grew 10x
    * and pairs 100x. Scaling k with n holds per-cluster size (and so
    * per-cluster pairs) constant — total work becomes linear in n, the
    * paper's own regime (50k clusters over LAION).
    */
  def autoK(n: Long, targetPerCluster: Int = 64, minK: Int = 16): Int = {
    require(targetPerCluster >= 1 && minK >= 1,
      s"need targetPerCluster, minK >= 1; got $targetPerCluster, $minK")
    math.max(minK, math.ceil(n.toDouble / targetPerCluster).toInt)
  }

  /** [[semanticDups]] with the cluster count derived from the corpus
    * (one count job + [[autoK]]) — the call sites that grow should use
    * this so k scales with n instead of freezing at fixture size.
    */
  def semanticDupsAuto(embDf: DataFrame, keyCol: String, embCol: String,
                       threshold: Double, targetPerCluster: Int = 64,
                       minK: Int = 16): DataFrame =
    semanticDups(embDf, keyCol, embCol,
      autoK(embDf.count(), targetPerCluster, minK), threshold)

  /** [[semanticDups]] over an EXTERNALLY-assigned clustering — trained
    * IVF centroids ([[graft.search.Ann.ivfAssign]]), a persistent ANN
    * index's stored lists, or any other partition of the key space.
    * Same mechanics: candidates are same-cluster key pairs (deduped — a
    * multi-vector key repeats its (key, cluster) row once per chunk,
    * and without the dedup a c_a/c_b-chunk pair fans into c_a·c_b
    * duplicate candidates and (c_a·c_b)² cosine evaluations), exact
    * cosine verifies, pairs fold to their best chunk pair BEFORE the
    * threshold (the knnJoin discipline; single-vector inputs see the
    * plain pairwise cosine).
    */
  def semanticDupsAssigned(assigned: DataFrame, keyCol: String,
                           embCol: String, clusterCol: String,
                           threshold: Double,
                           maxClusterSize: Int = 100000): DataFrame = {
    val asg = assigned
      .select(col(keyCol), col(clusterCol).as("cluster_id")).distinct()
    // LOUD skew guard (the ngramJaccardPairs discipline): per-cluster
    // pair work is size², so one mega-cluster quietly turns the whole
    // operator quadratic. The check is a slim (key, cluster) aggregate
    // — two longs per row, map-side combined — refusing with the fix
    // (raise k / retrain centroids) instead of stalling an executor.
    val worst = asg.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("__s")).agg(max(col("__s"))).head()
    if (!worst.isNullAt(0))
      require(worst.getLong(0) <= maxClusterSize,
        s"semanticDups: largest cluster has ${worst.getLong(0)} keys " +
        s"(cap $maxClusterSize) — pair generation is size² per cluster; " +
        s"raise the cluster count (autoK) or retrain centroids")
    val cand = asg.as("a").join(asg.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select(col("a.cluster_id").as("cluster_id"),
        col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"))
    val vecs = assigned.select(col(keyCol), col(embCol))
    cand
      .join(vecs.withColumnRenamed(keyCol, "key_a")
        .withColumnRenamed(embCol, "__emb_a"), "key_a")
      .join(vecs.withColumnRenamed(keyCol, "key_b")
        .withColumnRenamed(embCol, "__emb_b"), "key_b")
      .withColumn("__cos", VectorFunctions.cosine(col("__emb_a"), col("__emb_b")))
      .groupBy(col("cluster_id"), col("key_a"), col("key_b"))
      .agg(max(col("__cos")).as("__m"))
      .filter(col("__m") >= threshold)
      .select(col("cluster_id"), col("key_a"), col("key_b"),
        round(col("__m"), 6).as("cosine"))
  }

  /** The pruned corpus: connected groups of semantic duplicates keep
    * their smallest key (the [[ConnectedComponents.dropDuplicates]]
    * discipline applied to [[semanticDups]] pairs).
    */
  def prune(corpus: DataFrame, keyCol: String,
            embDf: DataFrame, embKeyCol: String, embCol: String,
            k: Int, threshold: Double): DataFrame = {
    val pairs = semanticDups(embDf, embKeyCol, embCol, k, threshold)
      .select(col("key_a").as(embKeyCol + "_a"), col("key_b").as(embKeyCol + "_b"))
    ConnectedComponents.dropDuplicates(corpus, keyCol, pairs,
      embKeyCol + "_a", embKeyCol + "_b")
  }
}
