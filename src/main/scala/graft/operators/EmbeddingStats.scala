package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Embedding-column sanity screens — the checks a pipeline runs after a
  * bulk embed job and before building indexes or training on the
  * vectors. A zero/near-zero norm means the encoder emitted a degenerate
  * vector (empty input, truncation bug); an abnormally large norm is the
  * classic symptom of an unnormalized mixed-model batch. Catching these
  * BEFORE the index build is much cheaper than diagnosing bad ranking
  * later (cosine silently tolerates any norm, so corruption surfaces as
  * quality drift, not errors — the same failure class the insertVectors
  * dimension fence closes for dims).
  */
object EmbeddingStats {

  /** Flag every vector by where its L2 norm sits relative to the corpus
    * norm distribution: `low` (below mean - sigma*sd), `high` (above
    * mean + sigma*sd), `ok` otherwise. Returns
    * `(keyCol, norm, flag)` with `norm` rounded to 6 decimals; the
    * comparison uses the SAME rounded norm and rounded (6dp) mean/sd, so
    * the flag is reproducible across engines (f64 summation-order noise
    * cannot flip a boundary row).
    *
    * Moment-based rather than percentile-based on purpose: mean and
    * stddev partial-aggregate in one distributed pass (map-side
    * combine), while an exact percentile over 10^10 rows needs a global
    * sort or a per-group collected buffer. The stats frame is 1 row,
    * broadcast into the flagging pass — no second scan shuffle.
    */
  def normOutliers(df: DataFrame, keyCol: String, vecCol: String,
                   sigma: Double = 2.0): DataFrame = {
    require(sigma > 0, s"sigma must be > 0, got $sigma")
    val norms = df.select(col(keyCol),
      round(VectorFunctions.l2Norm(col(vecCol)), 6).as("norm"))
    val stats = norms.agg(
      round(avg(col("norm")), 6).as("__mu"),
      round(stddev_samp(col("norm")), 6).as("__sd"))
    norms.crossJoin(broadcast(stats))
      .select(col(keyCol), col("norm"),
        when(col("norm") < col("__mu") - lit(sigma) * col("__sd"), "low")
          .when(col("norm") > col("__mu") + lit(sigma) * col("__sd"), "high")
          .otherwise("ok").as("flag"))
  }
}
