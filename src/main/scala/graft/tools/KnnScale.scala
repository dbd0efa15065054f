package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{Catalog, CollectionConfig}
import graft.search.Ann

/** Round-10 verdict item 1: MEASURE (don't argue) the knnJoin 100 TB
  * mitigation — serving the kNN self-join from the PERSISTENT ANN
  * index (stored corpus-scaled lists, no retraining) vs the ad-hoc
  * train-per-call path, at the 100x checkpoint scale.
  *
  * Reports, for the scaled embeddings table:
  *  - the exact probed-candidate volume (the number the
  *    [[Ann.estimateCandidates]] budget guard acts on) vs the budget;
  *  - wall-clock of the ad-hoc `Ann.knnJoinIvf` (trains centroids
  *    in-call — what a user without an index pays every run);
  *  - one-off `Collection.insertVectors` + `buildAnnIndex` cost (the
  *    amortized build);
  *  - wall-clock of `Collection.knnJoin` served from the stored lists,
  *    run twice (both serve from the same index; the pair bounds
  *    run-to-run noise).
  *
  * Usage: runMain graft.tools.KnnScale [scaleDir] [k] [nProbe]
  *   (default target/scale/sf10 — the 100x tree, 2M vectors)
  */
object KnnScale {

  private def time[A](fn: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = fn
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/sf10")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-knn-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val nLists = Ann.autoLists(n)
    println(s"# corpus $dir: $n vectors, sqrt-sized nLists=$nLists, " +
      s"k=$k, nProbe=$nProbe")

    // the guard's number: deterministic training reproduces the exact
    // centers buildAnnIndex will store (same sample, same Lloyd), so
    // this estimate holds for BOTH paths below
    val centers = Ann.ivfTrain(emb, "vec_id", "embedding", nLists)
    val assigned = Ann.ivfAssign(emb, "embedding", centers)
      .select(col("vec_id"), col("list_id"))
    val probesOf = udf((v: Seq[Float]) =>
      Ann.ivfProbes(centers, v.toArray, nProbe))
    val probing = emb
      .select(explode(probesOf(col("embedding"))).as("list_id"))
    val (tEst, est) = time(Ann.estimateCandidates(probing, assigned))
    println(f"| candidate estimate | $est | vs budget ${Ann.candidateBudget} " +
      f"| estimated in $tEst%.1f s |")

    // ad-hoc: trains + assigns + joins, every call
    val (tAdhoc, rowsAdhoc) = time(
      Ann.knnJoinIvf(emb, "vec_id", "embedding", k, nProbe = nProbe).count())
    println(f"| knnJoinIvf (ad-hoc train-per-call) | $tAdhoc%.1f s | $rowsAdhoc rows |")

    // persistent: one-off build, then Collection.knnJoin serves from
    // the stored lists without retraining
    val root = java.nio.file.Files.createTempDirectory("graft_knnscale").toString
    val cat = new Catalog(spark, root)
    val c = cat.create(CollectionConfig(name = "knnscale"))
    val (tInsert, nIns) = time(c.insertVectors("vec", emb))
    val (tBuild, _) = time(c.buildAnnIndex("vec"))
    println(f"| one-off: insertVectors $nIns + buildAnnIndex(nLists=$nLists) " +
      f"| ${tInsert + tBuild}%.1f s (insert $tInsert%.1f, build $tBuild%.1f) |")
    val (tJoin1, rows1) = time(c.knnJoin("vec", k, nProbe).count())
    val (tJoin2, rows2) = time(c.knnJoin("vec", k, nProbe).count())
    println(f"| Collection.knnJoin from stored index, run 1 | $tJoin1%.1f s | $rows1 rows |")
    println(f"| Collection.knnJoin from stored index, run 2 | $tJoin2%.1f s | $rows2 rows |")
    require(rows1 == rows2, s"stored-index join must be stable: $rows1 vs $rows2")
    println(f"# persistent-vs-adhoc: join-only ${tJoin2 / tAdhoc * 100}%.0f%% " +
      "of the train-per-call wall (the training delta is the amortized part)")
    spark.stop()
  }
}
