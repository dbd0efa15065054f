package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier: logistic regression on hashed
  * token-count features, fit by distributed batch gradient descent — the
  * fastText/CCNet-style LEARNED quality filter (Joulin et al. 2016,
  * arXiv:1607.01759; Wenzek et al. 2019, arXiv:1911.00359) that
  * complements the heuristic battery (q21) and the perplexity filters
  * (q65/q131): label a seed set, train, score the corpus, keep the top
  * band. The reference engine has no trainable scoring at all; this is a
  * north-star training-pipeline extension on the `documents` fixture.
  *
  * Scale shape (the part that must survive 100 TB): features are hashed
  * to a FIXED dim (the vocabulary never shuffles — same reason q114's
  * count-min works), the weight vector is a dim+1 array broadcast into
  * the scoring expression as a literal, and each GD iteration is one
  * key-keyed aggregate (margins) plus one j-keyed integer aggregate
  * (gradient, map-side partial combine into at most dim+1 rows per
  * partition). The only driver-side state is the dim+1 weight array —
  * the `collect()` is bounded by construction. Iterations are fixed and
  * few; total cost is `iters` corpus-linear passes.
  *
  * Engine-checkable determinism (the q109/q131/q146 discipline, plus one
  * new trick): per-doc margins fold w_j*x_j in sorted-j order on both
  * engines (Spark `aggregate` over `sort_array` == DuckDB `list_reduce`
  * over `list(... ORDER BY j)`), and the gradient — the one place a
  * global f64 sum over arbitrary row order would be engine-dependent —
  * is accumulated in FIXED POINT: each per-row term is rounded to
  * integer micro-units (`round(term * 1e6)` as BIGINT) and the sum of
  * integers is exact under any order, partitioning, or engine. The ≤1-ulp
  * cross-engine drift of `exp` inside the sigmoid can only flip a term
  * at an exact .5-micro-unit boundary (measure zero; the gate at two SFs
  * would catch one). The weight update `w - lr*(g/1e6)` is the same
  * IEEE expression tree on both sides, so trained weights are
  * bit-identical — and with them every margin and score.
  */
object Classifier {

  /** Hashed token-count features in long form: `(keyCol, j, x)` with
    * j = first-8-hex-of-md5(token) mod `dim` (the [[Sampling.hashBucket]]
    * scheme — engine-portable, seed-free) and x the bucket's token count,
    * plus a constant bias row `(key, dim, 1)` for EVERY input row (so
    * empty/null text still scores through the bias). Tokens are the
    * house lower-cased whitespace tokens with split-edge empties removed.
    */
  def hashedFeatures(docs: DataFrame, keyCol: String, textCol: String,
                     dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val toks = array_remove(
      graft.functions.TextFunctions.tokens(lower(col(textCol))), "")
    val counted = docs
      .select(col(keyCol), explode(toks).as("tok"))
      .select(col(keyCol),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          % dim).as("j"))
      .groupBy(col(keyCol), col("j"))
      .agg(count(lit(1)).as("x"))
    counted.unionByName(
      docs.select(col(keyCol), lit(dim.toLong).as("j"), lit(1L).as("x")))
  }

  /** Per-key margin Σ_j w_j·x_j under weight vector `w`, folded in
    * sorted-j order (j is unique per key, so the struct sort is fully
    * determined and the fold order engine-independent).
    */
  def margins(feats: DataFrame, w: Array[Double],
              keyCol: String): DataFrame = {
    val wArr = array(w.toIndexedSeq.map(lit): _*)
    feats.groupBy(col(keyCol)).agg(
      aggregate(
        sort_array(collect_list(struct(col("j"), col("x")))),
        lit(0.0),
        (acc, s) => acc + element_at(wArr, s.getField("j").cast("int") + 1)
          * s.getField("x").cast("double")).as("margin"))
  }

  /** Fit `iters` full-batch GD steps of logistic loss; returns the
    * trained weights (index dim = bias). `labels` is `(keyCol, y)` with
    * y ∈ {0.0, 1.0}. Weights are bit-deterministic (fixed-point gradient
    * — see object doc); the per-iteration collect is dim+1 rows.
    */
  def train(feats: DataFrame, labels: DataFrame, keyCol: String,
            dim: Int, iters: Int = 3, lr: Double = 1e-5): Array[Double] = {
    require(iters >= 1 && lr > 0, s"need iters >= 1, lr > 0; got $iters, $lr")
    val w = Array.fill(dim + 1)(0.0)
    val lab = labels.select(col(keyCol), col("y").cast("double").as("y"))
    for (_ <- 1 to iters) {
      // all-zero weights (always true on pass 1): every margin is
      // EXACTLY 0.0 (the sorted-j fold adds 0.0 * x per step) and
      // p = 1/(1+exp(-0.0)) = 0.5 exactly, so the margins aggregation
      // and its key join are a provably-constant subplan — skip them
      // and inject p = 0.5 (bit-identical gradients; spec'd).
      val allZero = w.forall(_ == 0.0)
      val p =
        if (allZero) lit(0.5)
        else lit(1.0) / (lit(1.0) + exp(-col("margin")))
      val withMargin: DataFrame => DataFrame =
        if (allZero) identity
        else df => df.join(margins(feats, w, keyCol), Seq(keyCol))
      val grad = withMargin(feats)
        .join(lab, Seq(keyCol))
        .select(col("j"),
          round((p - col("y")) * col("x").cast("double") * lit(1000000.0))
            .cast("long").as("g"))
        .groupBy(col("j")).agg(sum(col("g")).as("g"))
        .collect() // bounded: at most dim+1 rows
      grad.foreach { r =>
        val j = r.getLong(0).toInt
        val g = r.getLong(1)
        // identical IEEE expression tree to the SQL twin:
        // w - lr * (CAST(g AS DOUBLE) / 1000000.0)
        w(j) = w(j) - lr * (g.toDouble / 1000000.0)
      }
    }
    w
  }

  /** Score `feats` under trained weights: `(keyCol, score)` with score
    * the raw margin (monotone in p — filter on it directly; the sigmoid
    * adds nothing but an exp).
    */
  def score(feats: DataFrame, w: Array[Double], keyCol: String): DataFrame =
    margins(feats, w, keyCol).withColumnRenamed("margin", "score")

  /** Scalar twin of [[hashedFeatures]]' bucket: first 8 hex of
    * md5(token) mod dim (identical to the column-side
    * `conv(substring(md5(tok), 1, 8), 16, 10) % dim`).
    */
  def bucketOf(tok: String, dim: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  /** Scalar serving twin of [[margins]]: same tokenization (lowercase,
    * trim, whitespace split, empties dropped), same bucket hash, and the
    * SAME sorted-j fold `acc + w_j * x_j` with the bias last — so scores
    * are bit-identical to the distributed form (spec'd), but row-local:
    * no shuffle, no state, safe inside a streaming map. `w.length` must
    * be dim + 1.
    */
  def scalarScore(text: String, w: Array[Double]): Double = {
    val dim = w.length - 1
    val counts = new java.util.TreeMap[Int, Long]()
    Option(text).map(_.toLowerCase.trim).getOrElse("")
      .split("\\s+").filter(_.nonEmpty)
      .foreach { t => counts.merge(bucketOf(t, dim), 1L, (a, b) => a + b) }
    counts.put(dim, 1L) // bias: largest j, folds last like sort_array's
    var acc = 0.0
    counts.forEach { (j, x) => acc = acc + w(j) * x.toDouble }
    acc
  }

  /** Row-local scoring column over trained weights — the serving/stream
    * shape: [[scalarScore]] as a UDF (the per-row TreeMap build doesn't
    * codegen, but it replaces a corpus-wide explode + groupBy with zero
    * shuffles and is stateless on a stream; the janino-expressible
    * alternative would fold in token order and drift from training's
    * sorted-j f64 by a few ulps — bit-parity with training wins here).
    */
  def scoreUdf(w: Array[Double]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => scalarScore(text, w))

  /** One-vs-rest MULTICLASS training, ALL classes per pass: the
    * one-vs-rest problems are independent, so instead of running
    * [[train]] once per class (classes × iters sequential Spark jobs —
    * the round-10 shape), each iteration computes every class's margins
    * in ONE aggregation ([[marginsMulticlass]] — spec'd bit-equal to a
    * per-class [[margins]] call) and every class's fixed-point gradient
    * in ONE grouped sum over `(j, class)` (integer micro-units — exact
    * under any order, so batching classes cannot change a single sum).
    * The per-class weight sequences are therefore bit-identical to the
    * sequential form (JointTrainingSpec pins this), while the feature
    * table is scanned `iters` times instead of `classes × iters` times
    * — the optimization-guide §1.2 "remove passes" lever; measured ~2.4x
    * on q199/q209 at sf0.1.
    *
    * Class order is the sorted distinct label set, so the returned
    * (label, weights) sequence — and through it every downstream
    * tie-break — is deterministic. Collects stay bounded: the class
    * list by label cardinality, the gradient by (dim+1) × classes rows.
    */
  def trainMulticlass(docs: DataFrame, keyCol: String, textCol: String,
                      labelCol: String, dim: Int = 32, iters: Int = 2,
                      lr: Double = 1e-5): Seq[(String, Array[Double])] = {
    require(iters >= 1 && lr > 0, s"need iters >= 1, lr > 0; got $iters, $lr")
    val feats = hashedFeatures(docs, keyCol, textCol, dim).localCheckpoint()
    val classes = docs.select(col(labelCol).cast("string").as("c"))
      .filter(col("c").isNotNull)
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    require(classes.length >= 2,
      s"multiclass needs >= 2 labels, got ${classes.length}")
    val lab = docs.select(col(keyCol), col(labelCol).cast("string").as("__c"))
    val ws = Array.fill(classes.length)(Array.fill(dim + 1)(0.0))
    for (_ <- 1 to iters) {
      val models = classes.zipWithIndex.map { case (c, i) => c -> ws(i) }
      // per-class y as an array literal over the label string; a NULL
      // label yields y = 0.0 for every class, exactly like the
      // sequential form's when/otherwise
      val yArr = array(classes.map(c =>
        when(col("__c") === c, 1.0).otherwise(0.0)): _*)
      // all-zero weights (always true on pass 1): every class margin is
      // EXACTLY 0.0 and p = 0.5 exactly (see [[train]]'s shortcut), so
      // the margins aggregation + key join drop out of the first pass —
      // bit-identical gradients, half the heavy work at iters = 2.
      val allZero = ws.forall(_.forall(_ == 0.0))
      val pArr =
        if (allZero) array_repeat(lit(0.5), classes.length)
        else transform(col("margins"), mg => lit(1.0) / (lit(1.0) + exp(-mg)))
      val withMargins: DataFrame => DataFrame =
        if (allZero) identity
        else df => df.join(marginsMulticlass(feats, models, keyCol), Seq(keyCol))
      // per-class gradient term — the IDENTICAL expression tree to
      // [[train]]'s (round((p - y) * x * 1e6) as long), element-wise
      val terms = zip_with(pArr, yArr,
        (p, y) => round((p - y) * col("x").cast("double") * lit(1000000.0))
          .cast("long"))
      val grad = withMargins(feats)
        .join(lab, Seq(keyCol))
        .select(col("j"), posexplode(terms).as(Seq("cls", "g")))
        .groupBy(col("j"), col("cls")).agg(sum(col("g")).as("g"))
        .collect() // bounded: at most (dim+1) x classes rows
      grad.foreach { r =>
        val j = r.getLong(0).toInt
        val c = r.getInt(1)
        val g = r.getLong(2)
        // identical IEEE expression tree to [[train]]'s update
        ws(c)(j) = ws(c)(j) - lr * (g.toDouble / 1000000.0)
      }
    }
    classes.zipWithIndex.map { case (c, i) => c -> ws(i) }
  }

  /** All per-class margins in ONE aggregation pass: the accumulator is
    * an array of `models.size` doubles and each sorted-j fold step adds
    * `w_ℓ[j]·x` to every class's slot — so class ℓ's accumulation
    * sequence is IDENTICAL to a [[margins]] call with w_ℓ alone
    * (bit-equal margins, spec'd), but the feature table shuffles once
    * instead of once per class.
    */
  def marginsMulticlass(feats: DataFrame, models: Seq[(String, Array[Double])],
                        keyCol: String): DataFrame = {
    val wMat = array(models.map { case (_, w) =>
      array(w.toIndexedSeq.map(lit): _*) }: _*)
    feats.groupBy(col(keyCol)).agg(
      aggregate(
        sort_array(collect_list(struct(col("j"), col("x")))),
        array_repeat(lit(0.0), models.length),
        (acc, s) => zip_with(acc,
          transform(wMat, wl =>
            element_at(wl, s.getField("j").cast("int") + 1)
              * s.getField("x").cast("double")),
          (a, b) => a + b)).as("margins"))
  }

  /** Serve a one-vs-rest model set: predicted label = argmax margin,
    * ties broken toward the SMALLEST class index (array_position finds
    * the first occurrence; class order is the sorted label set from
    * [[trainMulticlass]]) — first-wins on both engines. Output:
    * (keyCol, pred, margin DOUBLE rounded 6).
    */
  def classifyMulticlass(docs: DataFrame, keyCol: String, textCol: String,
                         models: Seq[(String, Array[Double])]): DataFrame = {
    require(models.nonEmpty, "need at least one trained class")
    val dim = models.head._2.length - 1
    val labArr = array(models.map(m => lit(m._1)): _*)
    marginsMulticlass(hashedFeatures(docs, keyCol, textCol, dim), models,
        keyCol)
      .select(col(keyCol),
        element_at(labArr,
          array_position(col("margins"), array_max(col("margins")))
            .cast("int")).as("pred"),
        round(array_max(col("margins")), 6).as("margin"))
  }

  /** Train-and-score in one call: hash features once, fit, score every
    * input row. `docs` must carry `(keyCol, textCol, labelCol)` with the
    * label 0.0/1.0. Output `(keyCol, label BIGINT, score DOUBLE
    * rounded 6)` — one row per input row, ordered by the caller.
    */
  def trainScore(docs: DataFrame, keyCol: String, textCol: String,
                 labelCol: String, dim: Int = 32, iters: Int = 3,
                 lr: Double = 1e-5): DataFrame = {
    val feats = hashedFeatures(docs, keyCol, textCol, dim)
      .localCheckpoint() // features feed iters+1 jobs; cut the lineage
    val labels = docs.select(col(keyCol), col(labelCol).as("y"))
    val w = train(feats, labels, keyCol, dim, iters, lr)
    score(feats, w, keyCol)
      .join(labels, Seq(keyCol))
      .select(col(keyCol), col("y").cast("long").as("label"),
        round(col("score"), 6).as("score"))
  }
}
