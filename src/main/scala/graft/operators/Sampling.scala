package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the corpus-mixing step of a
  * training-data pipeline ("keep 25% of English web text, 100% of French,
  * 10% of zh", Pile/ROOTS-style source weighting).
  *
  * Hash-threshold sampling, not `rand()`: the keep/drop decision for a row
  * is a pure function of its key, so the sample is reproducible across
  * runs, machines, and engines, rows keep or lose membership stably as
  * the corpus grows (append-only pipelines re-derive the same subset),
  * and there is no RNG state to coordinate across 1000 executors. The
  * bucket is the first 8 hex chars of `md5(key)` mod 100 — md5 is
  * bit-identical in DuckDB, which makes the exact sample SQL-checkable.
  *
  * Scale shape: a map-side filter. No shuffle, no join — the per-stratum
  * rate table is folded into a literal CASE chain (strata are source
  * labels; there are tens of them, never millions).
  */
object Sampling {

  /** Percent bucket 0..99 for a key column, stable across engines. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Keep each row with per-stratum probability `rates(stratum)/100`
    * (default `defaultRate` for unlisted strata), decided by the key's
    * hash bucket.
    */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
                 rates: Map[String, Int], defaultRate: Int): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 100) &&
      defaultRate >= 0 && defaultRate <= 100, "rates are percents 0..100")
    // sorted for a deterministic CASE chain (Map iteration order is not)
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate)) {
      case ((stratum, r), acc) =>
        when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(keyCol)))
      .filter(col("bucket") < rate)
  }

  /** Uniform hash fraction in [0, 1) for a key column — the first 8 hex
    * chars of `md5(key)` over 16^8, a finer-grained sibling of
    * [[hashBucket]] for continuous per-row probabilities.
    */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Importance-weighted sampling: keep each row iff its key's hash
    * fraction is below `prob` (any per-row probability expression in
    * [0, 1], e.g. a quality score or a length-proportional weight). The
    * continuous analogue of [[stratified]]: same determinism story (pure
    * function of the key — reproducible, append-stable, engine-checkable
    * via md5), same scale shape (map-side filter, no shuffle, no RNG
    * state across executors). E[kept] = Σ min(1, prob); downstream
    * estimators reweight by 1/prob per the usual importance-sampling
    * correction.
    */
  def weighted(df: DataFrame, keyCol: String, prob: Column): DataFrame =
    df.filter(hashFraction(col(keyCol)) < prob)

  /** Recency-biased sampling: keep each row with probability
    * `0.5 ^ (age / halfLifeDays)` — the freshness knob of a periodically
    * retrained pipeline (a 30-day-old event at half-life 7 survives at
    * ~5%, yesterday's at ~90%). `asOfEpoch` anchors "now" EXPLICITLY:
    * a wall-clock anchor would make the kept set irreproducible, and
    * reproducibility is the whole point of hash sampling. Same shape as
    * [[weighted]] (pure function of key + timestamp, map-side filter,
    * no shuffle); rows with `ts > asOf` are clamped to probability 1.
    */
  def timeDecay(df: DataFrame, keyCol: String, tsCol: String,
                halfLifeDays: Double, asOfEpoch: Double): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be > 0, got $halfLifeDays")
    val ageDays = (lit(asOfEpoch) - col(tsCol).cast("double")) / lit(86400.0)
    weighted(df, keyCol,
      least(lit(1.0), pow(lit(0.5), ageDays / lit(halfLifeDays))))
  }

  /** Temperature-flattened mixture sampling — the multilingual-corpus
    * reweighting step ("don't let English drown the tail languages"):
    * after sampling, group g's expected share is proportional to
    * `n_g^alpha` instead of `n_g`. `alpha = 1` keeps the natural mix,
    * `alpha -> 0` approaches uniform across groups. Rates are anchored
    * so the SMALLEST group keeps `capRate` (never upsampling anyone):
    * `p_g = capRate * (n_min / n_g)^(1 - alpha)`.
    *
    * Scale shape: one map-side-combined count per group (groups are
    * source/language labels — tens, never millions), the rate table
    * broadcast back, then the usual hash-threshold map-side filter. The
    * corpus is scanned twice (count + filter) and shuffled never; pass a
    * precomputed rate table through [[weighted]] instead if the counts
    * are already known.
    *
    * Determinism: membership is a pure function of the key (md5
    * fraction vs rate), append-unstable only in that appends shift
    * `n_g` and thus rates — within a frozen corpus the kept set is
    * engine-checkable like [[stratified]]/[[weighted]]. `alpha = 0.5`
    * (the common choice) computes the rate via `sqrt`, which is
    * correctly rounded in IEEE-754 on every engine — the rate doubles
    * are bit-identical in DuckDB, keeping the oracle exact; other
    * alphas go through `pow`, whose last ulp is not portable.
    */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
                     alpha: Double, capRate: Double = 1.0): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(capRate > 0.0 && capRate <= 1.0, s"capRate must be in (0, 1], got $capRate")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val flat = col("__nmin").cast("double") / col("__n")
    val rate0 = if (alpha == 0.5) sqrt(flat) else pow(flat, 1.0 - alpha)
    val rate = if (capRate == 1.0) rate0 else rate0 * lit(capRate)
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(groupCol), rate.as("__rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(hashFraction(col(keyCol)) < col("__rate"))
      .drop("__rate")
  }

  /** Keep at most `n` rows per group — the EXACT cap ("at most 10k pages
    * per domain", C4/RefinedWeb-style host capping) next to
    * [[temperatureMix]]'s probabilistic flattening. Survivors are the
    * group's first `n` rows in `(md5(key), key)` order: a content-
    * independent, engine-checkable choice that stays stable under
    * reordering of the input (appends can displace survivors only
    * within the group's own hash order, never by arrival time).
    *
    * Scale shape: one count pass finds the groups OVER the cap (a
    * domain table — tens of thousands of rows at web scale, broadcast
    * both ways); under-cap groups — the overwhelming majority of a
    * heavy-tailed web corpus — pass through with a broadcast anti-join,
    * NO ranking, NO shuffle. Only over-cap groups rank, through a
    * window partitioned by group; a single pathological group still
    * ranks in one task's sort, but its input is capped by that group's
    * size, not the corpus (the giant-head domains are exactly the ones
    * a cap exists to trim — if one holds 10^9 rows, pre-trim it with
    * [[stratified]] at a rate that overshoots `n`, then cap exactly).
    */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // tiny (one row per over-cap group), consumed by BOTH branches —
    // materialize once so the count pass doesn't run twice
    val over = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__gc"))
      .filter(col("__gc") > n).select(col(groupCol).as("__g"))
      .localCheckpoint(true)
    // null-SAFE join condition: a NULL group (unattributed rows) is a
    // group like any other — a plain equi-join would never match it
    // against `over` and silently exempt it from the cap
    val isOver = col(groupCol) <=> col("__g")
    val pass = df.join(broadcast(over), isOver, "left_anti")
    // over-cap groups rank through the bounded-state grouped top-k (a
    // plain window here would sort a HOT group's entire row set — 10^9
    // rows of one domain — in a single task; TopKPerGroup keeps O(n)
    // state per group per partition and shuffles survivors only). The
    // md5 hex order is ASCII, so the stage-1 JVM cut and the stage-2
    // Spark rank agree exactly (TopKPerGroup's string caveat).
    val trimmed = TopKPerGroup.topK(
        df.join(broadcast(over), isOver, "left_semi")
          .withColumn("__h", md5(col(keyCol).cast("string"))),
        Seq(groupCol), "__h", n, tieCols = Seq(keyCol), asc = true,
        rankCol = "__rn")
      .drop("__rn", "__h")
    pass.unionByName(trimmed)
  }

  /** Deterministic train/validation/test assignment — the split step
    * every training pipeline ends with. Each row lands in exactly one
    * named split by its key's [[hashBucket]] falling into consecutive
    * percent ranges (`("train", 90), ("val", 5), ("test", 5)` assigns
    * buckets 0-89, 90-94, 95-99 in the order given). Hash-range, not
    * `rand()`: membership is a pure function of the key, so the split
    * is reproducible across runs and engines, a row NEVER migrates
    * between splits as the corpus grows (append-only pipelines keep
    * their test set uncontaminated by yesterday's train rows), and two
    * tables split on a SHARED key (documents and their embeddings) land
    * on the same side without coordination.
    *
    * Scale shape: a map-side CASE over a literal chain — no shuffle,
    * no join, no sampling state. Downstream consumers filter
    * `split = 'train'`, which pushes to the scan.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).forall(_ > 0) &&
      splits.map(_._2).sum == 100,
      s"split percents must be positive and sum to 100, got $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be unique, got ${splits.map(_._1)}")
    val bounds = splits.scanLeft(0) { case (acc, (_, pct)) => acc + pct }
    // upper-bound CASE chain in declaration order: bucket < 90 -> train,
    // bucket < 95 -> val, ... (the last arm is the `otherwise`)
    val label = splits.init.zip(bounds.tail.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), hi), acc) =>
        when(col("__bucket") < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("__bucket", hashBucket(col(keyCol)))
      .withColumn("split", label)
      .drop("__bucket")
  }

  /** Leakage-safe train/val/test split: near-duplicate GROUPS move
    * atomically into one split, so a test document never has a near-twin
    * in train (the contamination mode q153's split-leakage audit
    * DETECTS; this PREVENTS it at split time — Lee et al. 2022,
    * arXiv:2107.06499 §6 measure exactly this train-test dup leakage).
    * `pairs` is any near-dup edge list (MinHash-LSH, SimHash, SemDeDup
    * — pair-source-agnostic like [[graft.dedup.ConnectedComponents
    * .dropDuplicates]]); rows in no pair are their own singleton group.
    *
    * Scale shape: the component labeling is the pointer-jumped min-label
    * fixpoint (O(log diameter) rounds over the EDGE list, never the
    * corpus); the split itself is [[hashSplit]] on the GROUP label — a
    * map-side md5-threshold filter after one left join of corpus to
    * labels. Determinism: group label = min doc key of the component,
    * split = md5 bucket of that label — append-stable (new members of an
    * existing group inherit its split as long as they don't lower the
    * min key) and engine-checkable end to end.
    *
    * Output: the input columns plus `group` (the component label) and
    * `split`.
    */
  def groupAwareSplit(df: DataFrame, keyCol: String, pairs: DataFrame,
                      aCol: String, bCol: String,
                      splits: Seq[(String, Int)]): DataFrame = {
    val lab = graft.dedup.ConnectedComponents.labels(pairs, aCol, bCol)
      .select(col("node"), col("comp"))
    val grouped = df
      .join(lab, df(keyCol) === lab("node"), "left")
      .drop("node")
      .withColumn("group", coalesce(col("comp"), col(keyCol)))
      .drop("comp")
    hashSplit(grouped, "group", splits)
  }

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007): a
    * deterministic weighted sample WITHOUT replacement of exactly
    * `n` rows, with the unbiased subset-sum estimator the scheme was
    * built for. Each row gets `u = (hash64(key) + 1) / 2^32 ∈ (0, 1]`
    * and priority `q = w / u`; the sample is the top `n` priorities.
    * Heavier rows get proportionally larger priorities, so inclusion
    * probability ≈ min(1, w/τ) — the weighted-without-replacement
    * shape temperature/stratified sampling cannot give.
    *
    * Engine-checkable by construction: `u` is exact (integer hash over
    * a power of two) and `q` is ONE IEEE division of exactly-
    * representable operands, so the priorities are bit-identical in any
    * IEEE engine — no libm anywhere. Deterministic, append-stable
    * ranking (a new row displaces at most one survivor), reproducible
    * across runs and engines.
    *
    * Scale shape: `orderBy(q).limit(n)` compiles to
    * TakeOrderedAndProject — each partition keeps its local top-n heap
    * and the driver merges n·partitions candidates; NO global sort, NO
    * shuffle of the corpus. For the estimator, `withEstimate = true`
    * appends τ (the (n+1)-th priority) and `w_hat = max(w, τ)`:
    * Σ w_hat over any kept subset unbiasedly estimates that subset's
    * true weight sum in the full corpus.
    */
  def prioritySample(df: DataFrame, keyCol: String, weight: Column, n: Int,
                     withEstimate: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / lit(4294967296.0)
    val scored = df.withColumn("priority", weight.cast("double") / u)
    if (!withEstimate) {
      scored.orderBy(col("priority").desc, col(keyCol)).limit(n)
    } else {
      // one extra row buys τ; localCheckpoint so the TakeOrdered pass
      // runs once for both the sample and the threshold
      val top = scored
        .orderBy(col("priority").desc, col(keyCol)).limit(n + 1)
        .localCheckpoint(true)
      // τ = the (n+1)-th priority; 0 when the corpus has ≤ n rows (every
      // row is kept with certainty and w_hat degrades to w exactly)
      val tauOrZero = top.agg(
        when(count(lit(1)) > n, min(col("priority"))).otherwise(lit(0.0))
          .as("tau"))
      top.orderBy(col("priority").desc, col(keyCol)).limit(n)
        .crossJoin(broadcast(tauOrZero))
        .withColumn("w_hat", greatest(weight.cast("double"), col("tau")))
    }
  }
}
