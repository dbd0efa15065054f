package graft

import org.apache.spark.sql.functions._

import graft.core.{Catalog, CollectionConfig}
import graft.embed.HashingEmbedder

/** Streaming maintenance for the persistent dedup-band and ANN (IVF)
  * index families — with `keywordIndexStream` this completes the set:
  * every index family folds a live ingest continuously under the same
  * watermark discipline (bootstrap build when absent; cached
  * max-indexed-key drops replayed keys so restarts / checkpoint loss /
  * compaction re-delivery never double-index).
  */
class IndexStreamSpec extends SparkSpec {
  import spark.implicits._

  test("dedup index stream: bootstrap, append fold, exactly-once replay") {
    val root = java.nio.file.Files.createTempDirectory("graft_ddstream").toString
    val cat = new Catalog(spark, root)
    val c = cat.create(CollectionConfig(name = "dds"))
    c.importDf(Seq("alpha beta gamma delta epsilon",
      "one two three four five").toDF("text"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bandsDir = s"${c.dedupIndexDir("text")}/bands"
    val fpsDir = s"${c.dedupIndexDir("text")}/fps"
    val probe = Seq((101L, "alpha beta gamma delta epsilon"),
      (102L, "totally different words here now")).toDF("_key", "text")
    val q = c.dedupIndexStream("text", s"$root/_ddckpt")
    try {
      q.processAllAvailable() // bootstrap: builds the index over the corpus
      assert(pairs(c.checkDuplicates("text", probe)) == Set((1L, 101L)))
      // append a doc duplicating probe row 102: the stream must fold its
      // bands in without a manual refresh
      c.appendDf(Seq("totally different words here now").toDF("text"))
      q.processAllAvailable()
      assert(pairs(c.checkDuplicates("text", probe)) ==
        Set((1L, 101L), (3L, 102L)), "stream missed the appended doc")
      // sidecar stays in sync: one fp per corpus row, all non-null
      assert(spark.read.parquet(fpsDir).count() == 3L)
    } finally q.stop()
    val bandRows = spark.read.parquet(bandsDir).count()
    // checkpoint loss: every data file re-delivered; the watermark filter
    // must drop them all — band and fp row counts unchanged
    val q2 = c.dedupIndexStream("text", s"$root/_ddckpt_fresh")
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(bandsDir).count() == bandRows,
        "full replay must not re-band indexed keys")
      assert(spark.read.parquet(fpsDir).count() == 3L)
    } finally q2.stop()
    // the streamed index equals a from-scratch rebuild's answers
    val streamed = pairs(c.checkDuplicates("text", probe))
    c.buildDedupIndex("text")
    assert(pairs(c.checkDuplicates("text", probe)) == streamed)
  }

  test("ann index stream: bootstrap, chained embed-stream fold, exactly-once replay") {
    val emb = new HashingEmbedder(dim = 32)
    val root = java.nio.file.Files.createTempDirectory("graft_annstream").toString
    val cat = new Catalog(spark, root)
    val c = cat.create(CollectionConfig(name = "anns"))
    val words = Seq("alpha", "beta", "gamma", "delta", "orbit", "quark",
      "lumen", "fjord", "crane", "maple")
    c.importDf((1 to 40).map(i =>
      s"${words(i % 10)} ${words((i * 3) % 10)} document number $i").toDF("text"))
    // the ANN stream needs the vector index's schema up front
    assertThrows[IllegalStateException](
      c.annIndexStream("text", s"$root/_annckpt_early"))
    assert(c.embedColumn("text", emb) == 40)
    def page(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Double)] =
      df.collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val listsDir = s"${c.annIndexDir("text")}/lists"
    val embQ = c.embedColumnStream("text", emb, s"$root/_embckpt")
    val annQ = c.annIndexStream("text", s"$root/_annckpt", nLists = 4)
    try {
      annQ.processAllAvailable() // bootstrap: builds the IVF index
      val q1 = "orbit quark document"
      assert(page(c.searchAnn("text", q1, 5, emb, nProbe = 4)) ==
        page(c.search("text", q1, 5, emb)),
        "exhaustive probe must equal exact search after bootstrap")
      // chained continuous ingest: data append -> embed stream folds the
      // vector index -> ann stream folds the IVF lists, no manual refresh
      c.appendDf(Seq("zephyr quill unique payload fresh",
        "zephyr quill unique payload fresher").toDF("text"))
      embQ.processAllAvailable()
      annQ.processAllAvailable()
      assert(spark.read.parquet(listsDir)
        .filter(col("_key") > 40).count() == 2L, "stream missed new vectors")
      val q2 = "zephyr quill unique payload"
      val exact = page(c.search("text", q2, 3, emb))
      assert(exact.map(_._2).toSet.intersect(Set(41L, 42L)).nonEmpty)
      assert(page(c.searchAnn("text", q2, 3, emb, nProbe = 4)) == exact,
        "exhaustive probe must see the streamed-in vectors")
    } finally { annQ.stop(); embQ.stop() }
    val listRows = spark.read.parquet(listsDir).count()
    // checkpoint loss: every vector-index file re-delivered; watermark
    // filter drops them all
    val annQ2 = c.annIndexStream("text", s"$root/_annckpt_fresh", nLists = 4)
    try {
      annQ2.processAllAvailable()
      assert(spark.read.parquet(listsDir).count() == listRows,
        "full replay must not re-assign indexed keys")
    } finally annQ2.stop()
    // streamed lists serve the same pages as a from-scratch rebuild
    val streamed = page(c.searchAnn("text", "orbit quark document", 5, emb, nProbe = 4))
    c.buildAnnIndex("text", nLists = 4)
    assert(page(c.searchAnn("text", "orbit quark document", 5, emb, nProbe = 4))
      == streamed)
  }

  test("ann index stream: PQ layout — appended vectors land as byte codes, rerank stays exact") {
    val emb = new HashingEmbedder(dim = 32)
    val root = java.nio.file.Files.createTempDirectory("graft_annpqs").toString
    val cat = new Catalog(spark, root)
    val c = cat.create(CollectionConfig(name = "annpq"))
    c.importDf((1 to 30).map(i => s"alpha beta document number $i").toDF("text"))
    assert(c.embedColumn("text", emb) == 30)
    c.buildAnnIndex("text", nLists = 2, pqM = 4)
    val listsDir = s"${c.annIndexDir("text")}/lists"
    val annQ = c.annIndexStream("text", s"$root/_ckpt")
    try {
      annQ.processAllAvailable() // index exists: stream seeds, no rebuild
      c.appendDf(Seq("gamma delta fresh payload").toDF("text"))
      assert(c.embedColumn("text", emb) == 1)
      annQ.processAllAvailable()
      val fresh = spark.read.parquet(listsDir).filter(col("_key") === 31L)
      assert(fresh.count() == 1L, "stream missed the appended vector")
      // the streamed row carries the PQ byte-code layout, not floats
      assert(fresh.schema.fieldNames.contains("code") &&
        !fresh.schema.fieldNames.contains("embedding"))
      assert(fresh.head().getAs[Array[Byte]]("code").length == 4)
      // ADC + exact rerank over the streamed index still finds the new doc
      val got = c.searchAnn("text", "gamma delta fresh payload", 3, emb,
        nProbe = 2).collect().map(_.getLong(1))
      assert(got.contains(31L), s"rerank page must surface the new doc: ${got.toSeq}")
    } finally annQ.stop()
  }

  test("binary sketch stream: bootstrap, chained embed-stream fold, exactly-once replay") {
    val emb = new HashingEmbedder(dim = 32)
    val root = java.nio.file.Files.createTempDirectory("graft_binstream").toString
    val cat = new Catalog(spark, root)
    val c = cat.create(CollectionConfig(name = "binstr"))
    c.importDf((1 to 40).map(i => s"alpha beta document number $i").toDF("text"))
    assert(c.embedColumn("text", emb) == 40)
    def page(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Double)] =
      df.collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val sketchDir = s"${c.binaryIndexDir("text")}/sketch"
    val embQ = c.embedColumnStream("text", emb, s"$root/_embckpt")
    val binQ = c.binarySketchStream("text", s"$root/_binckpt")
    try {
      binQ.processAllAvailable() // bootstrap: builds the sketch
      val q1 = "alpha beta document"
      assert(page(c.searchBinary("text", q1, 5, emb, fetchK = 1000)) ==
        page(c.search("text", q1, 5, emb)),
        "all-candidates sketch serving must equal exact search after bootstrap")
      // chained continuous ingest: data append -> embed stream -> sketch
      c.appendDf(Seq("zephyr quill unique payload fresh",
        "zephyr quill unique payload fresher").toDF("text"))
      embQ.processAllAvailable()
      binQ.processAllAvailable()
      assert(spark.read.parquet(sketchDir)
        .filter(col("_key") > 40).count() == 2L, "stream missed new vectors")
      val q2 = "zephyr quill unique payload"
      val exact = page(c.search("text", q2, 3, emb))
      assert(page(c.searchBinary("text", q2, 3, emb, fetchK = 1000)) == exact,
        "sketch serving must see the streamed-in vectors")
    } finally { binQ.stop(); embQ.stop() }
    val rows = spark.read.parquet(sketchDir).count()
    // checkpoint loss: every vector-index file re-delivered; watermark
    // filter drops them all
    val binQ2 = c.binarySketchStream("text", s"$root/_binckpt_fresh")
    try {
      binQ2.processAllAvailable()
      assert(spark.read.parquet(sketchDir).count() == rows,
        "full replay must not re-sketch indexed keys")
    } finally binQ2.stop()
  }
}
