package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic training-shard export — the last step of a data
  * pipeline: write the final corpus as fixed-size shards in a
  * reproducible global order, with a manifest the training job (and an
  * auditor) can verify counts and membership against.
  *
  * Shard identity derives from [[Shuffle.deterministicShuffle]]'s
  * position (salted-md5 global order), so re-running the export over
  * identical input reproduces identical shard membership AND in-shard
  * order — the property that makes a training run resumable and a
  * corpus release auditable. The manifest carries per-shard row counts,
  * position ranges and an order-binding checksum (sum over rows of
  * `key * (in-shard position + 1)` — plain BIGINT arithmetic, so an
  * external SQL engine re-derives it exactly; a swapped, dropped or
  * reordered row changes it).
  *
  * Scale shape: one deterministic-shuffle pass (range partition on the
  * hash + per-partition offsets — no global window), one hash
  * repartition by shard for the write (each shard's rows land in exactly
  * one task, so `partitionBy` emits exactly one file per shard), and a
  * shard-keyed partial aggregate for the manifest.
  */
object Export {

  /** `(rows + shard/pos columns, manifest)` — the plan both [[writeShards]]
    * and the oracle-gated manifest query share.
    */
  def shardPlan(df: DataFrame, keyCol: String, rowsPerShard: Int,
                salt: String = ""): (DataFrame, DataFrame) = {
    require(rowsPerShard >= 1, "rowsPerShard must be >= 1")
    val rows = Shuffle.deterministicShuffle(df, keyCol, salt)
      .withColumn("shard", (col("pos") / rowsPerShard).cast("long"))
    val manifest = rows.groupBy(col("shard")).agg(
        count(lit(1)).as("n_rows"),
        min(col("pos")).as("pos_min"),
        max(col("pos")).as("pos_max"),
        sum(col(keyCol).cast("long") *
          (col("pos") % rowsPerShard + lit(1L))).as("checksum"))
      .orderBy(col("shard"))
    (rows, manifest)
  }

  /** Write `outDir/shard=N/` (one file per shard, rows in deterministic
    * order) plus `outDir/_manifest` parquet. Returns the manifest.
    *
    * `format`: `parquet` (default — typed, splittable, the training
    * path) or `jsonl` (interchange — round-trips through `ImportJsonl`
    * and any other engine's JSON reader; types go through JSON's usual
    * inference on re-read, so prefer parquet when the consumer is
    * Spark). Both carry the `pos` column, so a consumer can re-derive
    * the manifest checksum and PROVE it received every row in order —
    * the manifest is not a trust-me artifact.
    */
  def writeShards(df: DataFrame, keyCol: String, outDir: String,
                  rowsPerShard: Int, salt: String = "",
                  format: String = "parquet"): DataFrame = {
    require(format == "parquet" || format == "jsonl",
      s"format must be parquet|jsonl, got '$format'")
    val (rows, manifest) = shardPlan(df, keyCol, rowsPerShard, salt)
    val w = rows.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard")
    if (format == "jsonl") w.json(outDir) else w.parquet(outDir)
    manifest.write.mode("overwrite").parquet(s"$outDir/_manifest")
    manifest
  }

  /** Split-aware export: assign every row a split via
    * [[Sampling.hashSplit]] (hash-range on the key — append-stable, so
    * a row can never drift from test into train between releases), then
    * write each split as its own deterministic shard tree under
    * `outDir/<split>/`. Returns the union of the per-split manifests
    * with a leading `split` column.
    *
    * The split assignment costs nothing extra (a map-side CASE on the
    * same pass); each split's shard order is the deterministic shuffle
    * of ITS rows, so a training job can consume `train/` while `test/`
    * ships to an eval harness, both auditable against their manifests.
    */
  def writeSplitShards(df: DataFrame, keyCol: String, outDir: String,
                       rowsPerShard: Int, splits: Seq[(String, Int)],
                       salt: String = "",
                       format: String = "parquet"): DataFrame = {
    val assigned = Sampling.hashSplit(df, keyCol, splits)
    splits.map { case (name, _) =>
      writeShards(assigned.filter(col("split") === name).drop("split"),
          keyCol, s"$outDir/$name", rowsPerShard, salt, format)
        .withColumn("split", lit(name))
        .select("split", "shard", "n_rows", "pos_min", "pos_max", "checksum")
    }.reduce(_ unionByName _)
  }

  /** WebDataset-style tar shards — the standard container for
    * petabyte-scale multimodal (image/audio/video + text) training
    * corpora: each shard is ONE POSIX ustar archive of
    * `<pos>.<ext>` members, all of a sample's members adjacent under a
    * shared zero-padded basename, so a loader streams samples
    * sequentially with no index and shards ship/cache as single
    * objects. `members` maps columns to member extensions, e.g.
    * `Seq("content" -> "jpg", "caption" -> "txt")`; binary columns
    * write raw, string columns write UTF-8.
    *
    * Same determinism contract as [[writeShards]]: membership and
    * in-shard order come from the salted-md5 shuffle, headers pin
    * mtime/uid/gid to 0, so re-running the export byte-reproduces
    * every archive. The tar encoding is the PUBLIC ustar layout
    * (512-byte header, checksum-over-spaces, data padded to 512, two
    * zero end blocks), written by each shard's OWN task through the
    * Hadoop filesystem — one distributed pass, no driver fan-out, any
    * Hadoop-compatible target (local, HDFS, S3A).
    *
    * Returns `(shard, n_rows, pos_min, pos_max, checksum, tar_bytes)`.
    * `tar_bytes` is exactly derivable from member sizes
    * (`Σ (512 + ceil(len/512)·512) + 1024`), so an external engine can
    * verify the archives' sizes without untarring them — the
    * manifest-is-not-trust-me property extended to the container.
    */
  def writeWebDataset(df: DataFrame, keyCol: String, outDir: String,
                      rowsPerShard: Int, members: Seq[(String, String)],
                      salt: String = ""): DataFrame = {
    require(members.nonEmpty, "need at least one member column")
    require(members.map(_._2).distinct.size == members.size,
      "member extensions must be unique within a sample")
    val spark = df.sparkSession
    val (rows, manifest) = shardPlan(df, keyCol, rowsPerShard, salt)
    val memberCols = members.map { case (c, _) =>
      df.schema(c).dataType match {
        case BinaryType => col(c)
        case StringType => encode(col(c), "UTF-8").as(c)
        case other => sys.error(
          s"member column '$c' must be binary or string, got $other")
      }
    }
    val exts = members.map(_._2)
    val sconf = new org.apache.spark.graftops.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val out = outDir
    val report = rows
      .select((col("shard") +: col("pos") +: memberCols): _*)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .rdd.mapPartitions { it =>
        val conf = sconf.value
        var cur = -1L
        var os: java.io.OutputStream = null
        var nRows = 0L
        var nBytes = 0L
        val done = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        def close(): Unit = if (os != null) {
          os.write(new Array[Byte](1024)) // two zero end blocks
          nBytes += 1024
          os.close(); os = null
          done += ((cur, nRows, nBytes))
        }
        def open(shard: Long): Unit = {
          close()
          val p = new org.apache.hadoop.fs.Path(
            f"$out/shard-$shard%06d.tar")
          os = p.getFileSystem(conf).create(p, true)
          cur = shard; nRows = 0L; nBytes = 0L
        }
        it.foreach { r =>
          val shard = r.getLong(0)
          if (shard != cur || os == null) open(shard)
          val base = f"${r.getLong(1)}%012d"
          var m = 0
          while (m < exts.length) {
            val payload = r.get(2 + m) match {
              case null => Array.emptyByteArray
              case b: Array[Byte] => b
            }
            nBytes += Tar.writeEntry(os, s"$base.${exts(m)}", payload)
            m += 1
          }
          nRows += 1
        }
        close()
        done.iterator
      }.collect() // bounded: one row per shard
    val reportDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        report.map { case (s, n, b) => Row(s, n, b) }.toSeq, 1),
      StructType(Seq(StructField("shard", LongType, nullable = false),
        StructField("n_rows_written", LongType, nullable = false),
        StructField("tar_bytes", LongType, nullable = false))))
    manifest.join(reportDf, Seq("shard"))
      .select(col("shard"), col("n_rows"), col("pos_min"), col("pos_max"),
        col("checksum"), col("tar_bytes"))
      .orderBy(col("shard"))
  }

  /** Minimal POSIX ustar encoder (public, fixed format — the JDK ships
    * zip but not tar). Deterministic: mode 0644, uid/gid/mtime 0, no
    * user/group names.
    */
  private[operators] object Tar {
    /** Writes one member; returns bytes emitted (512 header + padded data). */
    def writeEntry(os: java.io.OutputStream, name: String,
                   data: Array[Byte]): Long = {
      val nameB = name.getBytes("UTF-8")
      require(nameB.length <= 100, s"tar member name too long: $name")
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes("US-ASCII")
        System.arraycopy(b, 0, h, off, b.length)
      }
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"${data.length}%011o")
      put(136, "00000000000")
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
      h(156) = '0' // regular file
      put(257, "ustar"); put(263, "00")
      var sum = 0L
      var i = 0
      while (i < 512) { sum += (h(i) & 0xFF); i += 1 }
      put(148, f"$sum%06o"); h(154) = 0; h(155) = ' '
      os.write(h)
      os.write(data)
      val pad = (512 - data.length % 512) % 512
      if (pad > 0) os.write(new Array[Byte](pad))
      512L + data.length + pad
    }
  }
}
