package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.core.Keys
import graft.embed.HashingEmbedder
import graft.search.Search

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets an entry in `queries`,
  * and (when DuckDB-expressible) an equivalent oracle SQL in `oracleSql`.
  * Column names are aliased identically on both sides; floating-point
  * aggregates are rounded on both sides so f64 summation-order noise cannot
  * flip the driver's hash compare.
  */
object SparkEntry {

  /** Flagship: the reference's entire reason to exist in one pipeline —
    * ingest documents, assign keys, embed the text column, exact top-10
    * cosine search for a literal query, hydrate content (S2 -> E4 -> K1-K4).
    * Same pipeline as the `q_embed_search` driver query, on the smoke sf.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_embed_search")(spark, "/root/testdata/sf0.001")

  // --- query helpers ---------------------------------------------------

  /** Embedding of `vec_id = 0` collected as the query vector — the oracle
    * uses a scalar subquery for the same row, so both sides score against
    * the identical literal.
    */
  private def queryVec(s: SparkSession, d: String): Array[Float] =
    embeddings(s, d).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray


  type Q = (SparkSession, String) => DataFrame

  // --- reference-surface operators (SURVEY §2.1-2.4) --------------------

  private val referenceQueries: Map[String, Q] = Map(
    // A1 row count (reference COUNT quoting bug == COUNT(*) semantics)
    "q_count" -> ((s, d) => documents(s, d).agg(count(lit(1)).as("n"))),

    // A2 indexed count over the vector table
    "q_indexed_count" -> ((s, d) => embeddings(s, d).agg(count(lit(1)).as("n"))),

    // P1/P2 one-pass projection scan (replaces LIMIT/OFFSET pagination)
    "q_scan_project" -> ((s, d) =>
      documents(s, d).select(col("doc_id"), col("text")).orderBy("doc_id")),

    // P3 key-fetch semi-join (`WHERE _key IN (...)`)
    "q_key_fetch" -> ((s, d) =>
      documents(s, d)
        .filter(col("doc_id").isin(3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L))
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")),

    // K1 exact top-k cosine over the embeddings table, through the real
    // operator (Search.topK) so the gate grades its multi-vector-per-key
    // semantics: max score per key, one slot per key (vec_ids are unique
    // here, so values equal the per-vector form — the oracle mirrors the
    // group-by anyway, and SearchSpec covers the duplicate-key case).
    "q_topk_cosine" -> ((s, d) => {
      val q = queryVec(s, d)
      Search.topK(embeddings(s, d), q, k = 10,
          keyColName = "vec_id", embColName = "embedding")
        .withColumn("score", round(col("score"), 6))
    }),

    // K1 filtered: exact top-k restricted by a metadata predicate — the
    // "search only English docs" shape every vector store grows. The
    // predicate filters the DOCUMENT table (where metadata lives) and
    // semi-joins into the vector table BEFORE ranking, so selectivity
    // cuts ranking work instead of post-filtering a too-short page.
    "q113_filtered_topk" -> ((s, d) => {
      val q = queryVec(s, d)
      val keys = documents(s, d).filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Search.topK(embeddings(s, d).join(keys, Seq("vec_id"), "left_semi"),
          q, k = 10, keyColName = "vec_id", embColName = "embedding")
        .withColumn("score", round(col("score"), 6))
    }),

    // K3 search-and-fetch: top-k joined back for content (vec_id == doc_id)
    "q_search_fetch" -> ((s, d) => {
      val q = queryVec(s, d)
      val hits = embeddings(s, d)
        .select(col("vec_id"),
          round(Search.scoreAgainst(col("embedding"), q), 6).as("score"))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10)
      documents(s, d)
        .join(broadcast(hits), col("doc_id") === col("vec_id"))
        .select(col("text").as("content"), col("doc_id").as("key"), col("score"))
        .orderBy(desc("score"), col("key"))
    }),

    // S3/S4 append semantics: same file imported twice — every doc_id
    // appears exactly twice (key continuation itself is spec'd in
    // CatalogSpec; this checks the union-all mechanics).
    "q_union_append" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id")
      docs.union(docs).groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"))
    }),

    // E4+K4 full pipeline on sfDir docs: embed text with the deterministic
    // embedder, top-10 for a literal query (rows-only: the embedder is not
    // SQL-expressible).
    "q_embed_search" -> ((s, d) => {
      import s.implicits._
      val embedder = new HashingEmbedder(dim = 384)
      val docs = Keys.withKey(documents(s, d))
      val emb = graft.embed.EmbedBatch.pairs(
        docs.select(col(Keys.KeyCol), coalesce(col("text"), lit("")).as("text"))
          .as[(Long, String)],
        embedder, batchSize = 32)
        .toDF(Keys.KeyCol, "embedding")
      Search.searchAndFetch(docs, emb,
        embedder.embedOne("fast key order sort table scan"), 10, "text")
        .withColumn("score", round(col("score"), 6))
    }),

    // K1 approximate: hyperplane-LSH ANN top-10 (rows-only — approximate
    // by construction; AnnSpec checks recall against exact).
    "q_ann_topk" -> ((s, d) => {
      val q = queryVec(s, d)
      val planes = graft.search.Ann.hyperplanes(dim = q.length, bits = 6, seed = 42L)
      val bucketed = graft.search.Ann.withBucket(embeddings(s, d), "embedding", planes)
      graft.search.Ann.annTopK(bucketed, q, planes, k = 10,
          keyCol = "vec_id", embCol = "embedding")
        .withColumn("score", round(col("score"), 6))
    }),

    // K1 approximate: IVF top-10 over 8 centroid lists (rows-only).
    "q_ivf_topk" -> ((s, d) => {
      val q = queryVec(s, d)
      val e = embeddings(s, d)
      val centers = graft.search.Ann.ivfTrain(e, "vec_id", "embedding", k = 8)
      val assigned = graft.search.Ann.ivfAssign(e, "embedding", centers)
      graft.search.Ann.ivfTopK(assigned, centers, q, k = 10, nProbe = 3,
          keyCol = "vec_id", embCol = "embedding")
        .withColumn("score", round(col("score"), 6))
    }),

    // Clustering-quality profile of the SAME trained IVF partition:
    // per-list member count + mean simplified silhouette (centroid
    // form), accumulated in fixed point. Oracle: Verify-time dynamic
    // twin against the re-trained centroid literals — first-wins
    // argmin assignment, dimension-sequential distances, identical
    // micro-unit rounding.
    "q198_cluster_profile" -> ((s, d) => {
      val e = embeddings(s, d)
      val centers = graft.search.Ann.ivfTrain(e, "vec_id", "embedding", k = 8)
      graft.search.Ann.clusterProfile(e, "embedding", centers)
        .orderBy(col("list_id"))
    }),

    // Cluster-balanced subset selection: cap each trained IVF list at a
    // fixed budget (md5-ranked, the capPerGroup determinism) so a
    // training subsample preserves embedding-space DIVERSITY instead of
    // letting the dominant clusters swamp it — the cluster-balanced
    // data-selection shape. Oracle: dynamic twin over the re-trained
    // centroid literals + the same md5 rank.
    "q205_cluster_balanced" -> ((s, d) => {
      val e = embeddings(s, d)
      val centers = graft.search.Ann.ivfTrain(e, "vec_id", "embedding", k = 8)
      graft.operators.Sampling.capPerGroup(
          graft.search.Ann.ivfAssign(e, "embedding", centers)
            .select(col("vec_id"), col("list_id")),
          "list_id", "vec_id", n = 40)
        .orderBy(col("vec_id"))
    }),

    // K1 approximate, memory-scale: product-quantization top-10 by ADC
    // distance — the scan reads m=8-byte codes, never float vectors.
    // Oracle: Verify-time dynamic twin with codebook + query-table
    // literals (same scheme as q_ivf_topk).
    "q71_pq" -> ((s, d) => {
      val q = queryVec(s, d)
      val e = embeddings(s, d)
      val cb = graft.search.Ann.pqTrain(e, "vec_id", "embedding", m = 8, k = 16)
      val enc = graft.search.Ann.pqEncode(e, "embedding", cb)
      graft.search.Ann.pqTopK(enc, cb, q, k = 10, keyCol = "vec_id")
        .withColumn("pq_dist", round(col("pq_dist"), 6))
    }),

    // K1 two-stage serving: PQ ADC selects 40 candidates from byte codes,
    // exact cosine re-ranks them to the final 10 — float vectors are read
    // for 40 rows, never the whole table. Oracle: Verify-time dynamic
    // twin (codebook + query-table literals, candidate CTE, exact cosine).
    "q84_pq_rerank" -> ((s, d) => {
      val q = queryVec(s, d)
      val e = embeddings(s, d)
      val cb = graft.search.Ann.pqTrain(e, "vec_id", "embedding", m = 8, k = 16)
      val enc = graft.search.Ann.pqEncode(e, "embedding", cb)
      graft.search.Ann.pqTopKRerank(enc, e, cb, q, k = 10, fetchK = 40,
          keyCol = "vec_id", embCol = "embedding")
        .withColumn("score", round(col("score"), 6))
    }),

    // IVF recall report: probed ANN pages for 20 query vectors graded
    // against the exact top-10 gold by the q146 metric harness — the
    // "how much recall does nProbe=2 buy me" answer as a query. Results
    // come from the probed-candidate path (knnProbedBetween, one
    // fp-bucketed equi-join), gold from the ONE-PASS bounded-state
    // multi-query exact scan (exactTopKMulti — never the broadcast
    // all-pairs twin), metrics touch only k-row pages. Oracle: dynamic
    // twin with centroid literals (assignment + probes + candidates +
    // exact gold + metric math, all re-derived in SQL).
    "q148_ann_recall" -> ((s, d) => {
      val e = embeddings(s, d)
      val qdf = e.filter(col("vec_id") < 20)
      val corpus = e.filter(col("vec_id") >= 20)
      val centers = graft.search.Ann.ivfTrain(corpus, "vec_id", "embedding", k = 8)
      val ivf = graft.search.Ann.knnProbedBetween(qdf,
          graft.search.Ann.ivfAssign(corpus, "embedding", centers), centers,
          "vec_id", "embedding", k = 10, nProbe = 2, excludeSelf = false)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
            .orderBy(desc("sim"), col("nbr"))).cast("long"))
      val queries = qdf.select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      val gold = graft.search.Ann.exactTopKMulti(corpus, queries,
        "vec_id", "embedding", k = 10)
      graft.operators.Eval.retrievalMetrics(
          ivf.select(col("src").as("query_id"), col("nbr").as("doc_id"),
            col("rank")),
          gold.select(col("src").as("query_id"), col("nbr").as("doc_id")),
          k = 10)
        .orderBy(col("query_id"))
    })
  )

  private val referenceOracles: Map[String, String] = Map(
    "q_count" -> "SELECT count(*) AS n FROM documents",
    "q_indexed_count" -> "SELECT count(*) AS n FROM embeddings",
    "q_scan_project" ->
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
    "q_key_fetch" ->
      "SELECT doc_id, text FROM documents WHERE doc_id IN (3,5,8,13,21,34,55,89) ORDER BY doc_id",
    // max-per-key before the top-k (Search.topK's multi-vector semantics);
    // the top-10 is selected by the RAW score with rounding applied only
    // to the survivors, matching the operator's orderBy-then-round
    "q_topk_cosine" ->
      """WITH s AS (
        | SELECT vec_id, max(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))) AS raw
        | FROM embeddings GROUP BY vec_id),
        |top AS (SELECT vec_id, raw FROM s ORDER BY raw DESC, vec_id LIMIT 10)
        |SELECT vec_id, round(raw, 6) AS score FROM top
        | ORDER BY raw DESC, vec_id""".stripMargin,
    "q113_filtered_topk" ->
      """WITH s AS (
        | SELECT vec_id, max(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))) AS raw
        | FROM embeddings
        | WHERE vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
        | GROUP BY vec_id),
        |top AS (SELECT vec_id, raw FROM s ORDER BY raw DESC, vec_id LIMIT 10)
        |SELECT vec_id, round(raw, 6) AS score FROM top
        | ORDER BY raw DESC, vec_id""".stripMargin,
    "q_search_fetch" ->
      """WITH hits AS (
        | SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS score
        | FROM embeddings ORDER BY score DESC, vec_id LIMIT 10)
        |SELECT d.text AS content, d.doc_id AS key, h.score AS score
        | FROM documents d JOIN hits h ON d.doc_id = h.vec_id
        | ORDER BY h.score DESC, key""".stripMargin,
    "q_union_append" ->
      """SELECT doc_id, count(*) AS n FROM (
        | SELECT doc_id FROM documents UNION ALL SELECT doc_id FROM documents)
        | GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_ann_topk" -> annTopkOracle,
    "q_embed_search" -> embedSearchOracle
  )

  /** Full embed→search twin: replicates `HashingEmbedder` in SQL. Sound
    * because (a) the feature hash is md5-derived — bit-identical in
    * DuckDB; (b) the ±1/±0.5 feature weights are dyadic rationals, so the
    * f32 accumulation in `embedText` is EXACT and order-free, and a
    * DOUBLE `sum` reproduces it; (c) every f64 reduction (norms, dot) is
    * an idx-ordered sequential `list_reduce`, which equals the dense
    * 0..dim loop because absent dims contribute exact zeros; (d) the
    * normalize step's f32 rounding is `CAST(.. AS FLOAT)`. The query
    * vector runs through the same pipeline as a doc_id = -1 row;
    * `_key = doc_id + 1` (dense file-order keys, KeysSpec).
    */
  private lazy val embedSearchOracle: String = {
    // 8-hex-digit -> BIGINT (the bucket hash), shared shape with simhash
    val hex8 =
      """list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(range(1, 9),
        |     i -> CAST(strpos('0123456789abcdef', substr(hex, CAST(i AS INT), 1)) - 1 AS BIGINT))),
        |   (a, b) -> a * 16 + b)""".stripMargin
    s"""WITH src AS (
       | SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT -1 AS doc_id, 'fast key order sort table scan' AS text),
       |toks AS (
       | SELECT doc_id, unnest(list_filter(
       |   string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS tok
       | FROM src),
       |feats AS (
       | SELECT doc_id, tok AS f, CAST(1.0 AS DOUBLE) AS w FROM toks
       | UNION ALL
       | SELECT doc_id, '#' || substr(tok, CAST(i AS INT), 3) AS f,
       |        CAST(0.5 AS DOUBLE) AS w
       | FROM (SELECT doc_id, tok, unnest(range(1, length(tok) - 1)) AS i
       |       FROM toks WHERE length(tok) >= 3)),
       |hx AS (SELECT doc_id, md5('42|' || f) AS hex, w FROM feats),
       |hi AS (SELECT doc_id,
       |  CAST($hex8 % 384 AS INT) AS idx,
       |  CASE WHEN strpos('0123456789abcdef', substr(hex, 9, 1)) - 1 < 8
       |       THEN w ELSE -w END AS sw
       |  FROM hx),
       |sparse AS (SELECT doc_id, idx, sum(sw) AS wsum
       |  FROM hi GROUP BY 1, 2 HAVING sum(sw) <> 0),
       |nrm AS (SELECT doc_id, 1.0 / sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |   list(wsum * wsum ORDER BY idx)), (x, y) -> x + y)) AS inv
       |  FROM sparse GROUP BY doc_id),
       |vec AS (SELECT s.doc_id, s.idx,
       |   CAST(CAST(s.wsum * n.inv AS FLOAT) AS DOUBLE) AS a
       |  FROM sparse s JOIN nrm n USING (doc_id)),
       |dvec AS (SELECT * FROM vec WHERE doc_id >= 0),
       |qvec AS (SELECT idx, a AS b FROM vec WHERE doc_id = -1),
       |na AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |   list(a * a ORDER BY idx)), (x, y) -> x + y) AS na
       |  FROM dvec GROUP BY doc_id),
       |nb AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |   list(b * b ORDER BY idx)), (x, y) -> x + y) AS nb FROM qvec),
       |dt AS (SELECT d.doc_id, list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |   list(d.a * q.b ORDER BY d.idx)), (x, y) -> x + y) AS dot
       |  FROM dvec d JOIN qvec q ON d.idx = q.idx GROUP BY d.doc_id),
       |scored AS (SELECT na.doc_id,
       |   CASE WHEN sqrt(na.na) * sqrt(nb.nb) = 0 THEN 0.0
       |        ELSE coalesce(dt.dot, 0.0) / (sqrt(na.na) * sqrt(nb.nb)) END AS score
       |  FROM na CROSS JOIN nb LEFT JOIN dt ON na.doc_id = dt.doc_id),
       |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10)
       |SELECT d.text AS content, t.doc_id + 1 AS key, round(t.score, 6) AS score
       | FROM top t JOIN documents d USING (doc_id)
       | ORDER BY t.score DESC, key""".stripMargin
  }

  /** Oracles that need fixture-derived constants, built by `Verify` at
    * dump time with a live session. The IVF centers come from the same
    * deterministic training (`ivfTrain`: key-ordered bounded sample,
    * fixed Lloyd iterations, sequential f64 sums) the query itself runs,
    * so embedding them as literals yields an exact SQL twin: per-row
    * assignment is a first-wins argmin over strictly-sequential L2
    * distances, and the probe set is the 3 centroids nearest the query
    * (stable (distance, index) sort, matching `ivfTopK`'s `sortBy`).
    */
  def dynamicOracleSql(s: SparkSession, sfDir: String): Map[String, String] = {
    // each dynamic oracle fails INDEPENDENTLY: a PQ training error must
    // not drop the IVF oracle too (Verify's outer catch would otherwise
    // degrade every dynamic query to rows-only at once)
    def attempt(name: String)(build: => String): Map[String, String] =
      try Map(name -> build)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle $name skipped: ${e.getMessage}")
        Map.empty
      }
    val e = embeddings(s, sfDir)
    attempt("q_ivf_topk") {
      ivfTopkOracle(graft.search.Ann.ivfTrain(e, "vec_id", "embedding", k = 8))
    } ++ attempt("q130_semdedup_ivf") {
      semdedupIvfOracle(
        graft.search.Ann.ivfTrain(e, "vec_id", "embedding", k = 8), 0.35)
    } ++ attempt("q148_ann_recall") {
      annRecallOracle(graft.search.Ann.ivfTrain(
        e.filter(col("vec_id") >= 20), "vec_id", "embedding", k = 8))
    } ++ attempt("q71_pq") {
      val cb = graft.search.Ann.pqTrain(e, "vec_id", "embedding", m = 8, k = 16)
      pqOracle(cb, graft.search.Ann.pqDistTable(queryVec(s, sfDir), cb), k = 10)
    } ++ attempt("q84_pq_rerank") {
      val cb = graft.search.Ann.pqTrain(e, "vec_id", "embedding", m = 8, k = 16)
      pqRerankOracle(cb, graft.search.Ann.pqDistTable(queryVec(s, sfDir), cb),
        fetchK = 40, k = 10)
    } ++ attempt("q198_cluster_profile") {
      clusterProfileOracle(
        graft.search.Ann.ivfTrain(e, "vec_id", "embedding", k = 8))
    } ++ attempt("q205_cluster_balanced") {
      clusterBalancedOracle(
        graft.search.Ann.ivfTrain(e, "vec_id", "embedding", k = 8), cap = 40)
    } ++ attempt("q203_unigram_doc_lp") {
      graft.queries.PipelineQueries.unigramScoreOracle(s, sfDir)
    } ++ attempt("q199_multiclass") {
      graft.queries.PipelineQueries.multiclassOracle(
        graft.operators.Classifier.trainMulticlass(
          documents(s, sfDir).select(col("doc_id"), col("text"),
            col("source")),
          "doc_id", "text", "source", dim = 32, iters = 2), dim = 32)
    } ++ attempt("q209_multiclass_confusion") {
      graft.queries.PipelineQueries.multiclassConfusionOracle(
        graft.operators.Classifier.trainMulticlass(
          documents(s, sfDir).select(col("doc_id"), col("text"),
            col("source")),
          "doc_id", "text", "source", dim = 32, iters = 2), dim = 32)
    }
  }

  /** q205's twin: the [[ivfAssignCtes]] assignment plus capPerGroup's
    * exact selection — per list, the `cap` rows with the smallest
    * (md5-hex-of-key, key) pair; under-cap lists pass whole, which the
    * rank filter already expresses.
    */
  private def clusterBalancedOracle(centers: Array[Array[Double]],
                                    cap: Int): String =
    s"""WITH ${ivfAssignCtes(centers)},
       |r AS (SELECT vec_id, list_id, row_number() OVER (
       |   PARTITION BY list_id
       |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |  FROM a)
       |SELECT vec_id, list_id FROM r WHERE rn <= $cap
       |ORDER BY vec_id""".stripMargin

  /** q198's twin: the [[ivfAssignCtes]] assignment (first-wins argmin
    * over dimension-sequential squared L2) plus the simplified
    * silhouette — a = sqrt(own distance), b = sqrt(least OTHER
    * distance), s = (b-a)/greatest(a,b) — rounded to integer
    * micro-units per row and mean'd from the exact sum, matching
    * `Ann.clusterProfile`'s fixed-point accumulation bit for bit.
    */
  private def clusterProfileOracle(centers: Array[Array[Double]]): String = {
    val k = centers.length
    def ownD = (0 until k)
      .map(i => s"WHEN a.list_id = $i THEN d.d$i").mkString("CASE ", " ", " END")
    def otherD = (0 until k).map { i =>
      val rest = (0 until k).filter(_ != i).map(j => s"d.d$j").mkString(", ")
      s"WHEN a.list_id = $i THEN least($rest)"
    }.mkString("CASE ", " ", " END")
    s"""WITH ${ivfAssignCtes(centers)},
       |sil AS (SELECT a.list_id, sqrt($ownD) AS da, sqrt($otherD) AS db
       |  FROM a JOIN d USING (vec_id)),
       |m AS (SELECT list_id,
       |   CAST(round((CASE WHEN greatest(da, db) = 0.0 THEN 0.0
       |     ELSE (db - da) / greatest(da, db) END) * 1000000.0) AS BIGINT)
       |     AS mm
       |  FROM sil)
       |SELECT list_id, CAST(count(*) AS BIGINT) AS n,
       |  round(CAST(sum(mm) AS DOUBLE) / 1000000.0 / count(*), 6) AS mean_sil
       |FROM m GROUP BY 1 ORDER BY list_id""".stripMargin
  }


  /** Shared ADC CTE block (`e`, `d`, `a`): per-row subspace distances
    * against codebook literals and the CASE-matched query-table ADC sum.
    * Both PQ twins build on this structurally — no string splicing, so
    * rewording one oracle cannot silently desync the other.
    */
  private def pqAdcCtes(cb: Array[Array[Array[Double]]],
                        table: Array[Array[Double]]): String = {
    val m = cb.length
    val k = cb.head.length
    val sub = cb.head.head.length
    def clit(c: Array[Double]): String =
      c.mkString("CAST([", ", ", "] AS DOUBLE[])")
    def dist(s: Int, j: Int): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(range(1, ${sub + 1}),
         |   i -> (v[CAST(i + ${s * sub} AS INT)] - (${clit(cb(s)(j))})[CAST(i AS INT)])
         |      * (v[CAST(i + ${s * sub} AS INT)] - (${clit(cb(s)(j))})[CAST(i AS INT)]))),
         |  (a, b) -> a + b)""".stripMargin
    val dcols = (for (s <- 0 until m; j <- 0 until k)
      yield s"${dist(s, j)} AS d${s}_$j").mkString(",\n ")
    def pick(s: Int): String = {
      val dlist = (0 until k).map(j => s"d${s}_$j").mkString(", ")
      // CAST each table literal: a bare decimal literal is DECIMAL in
      // DuckDB and would turn the whole ADC sum into decimal arithmetic
      (0 until k).map(j =>
        s"WHEN d${s}_$j = least($dlist) THEN CAST(${table(s)(j)} AS DOUBLE)")
        .mkString("CASE ", " ", " END")
    }
    val adc = (0 until m).map(pick).mkString("(", ") + (", ")")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |d AS (SELECT vec_id, $dcols FROM e),
       |a AS (SELECT vec_id, $adc AS dist FROM d)""".stripMargin
  }

  /** PQ twin: per-subspace assignment is a first-wins argmin over 16
    * strictly-sequential squared-L2 distances against codebook literals
    * (exactly `nearestCentroid`'s loop), and the ADC score is the sum of
    * the matching QUERY-table literals in subspace order — the table is
    * computed by the same `pqDistTable` call the query itself makes, so
    * its doubles round-trip bit-exactly through `toString`.
    */
  private def pqOracle(cb: Array[Array[Array[Double]]],
                       table: Array[Array[Double]],
                       k: Int): String =
    s"""WITH ${pqAdcCtes(cb, table)}
       |SELECT vec_id, round(dist, 6) AS pq_dist FROM a
       | ORDER BY dist ASC, vec_id LIMIT $k""".stripMargin

  /** Rerank twin: the same ADC CTEs select the `fetchK`-candidate window
    * (identical dist ordering + vec_id tie-break as `pqTopK`), then the
    * exact cosine against the vec_id = 0 query row re-ranks — matching
    * `pqTopKRerank`'s broadcast-rejoin + `Search.scoreAgainst` pass.
    */
  private def pqRerankOracle(cb: Array[Array[Array[Double]]],
                             table: Array[Array[Double]],
                             fetchK: Int, k: Int): String =
    s"""WITH ${pqAdcCtes(cb, table)},
       |cand AS (SELECT vec_id FROM a ORDER BY dist ASC, vec_id LIMIT $fetchK),
       |qv AS (SELECT v AS qvec FROM e WHERE vec_id = 0),
       |top AS (SELECT e.vec_id, list_cosine_similarity(e.v, qv.qvec) AS raw
       | FROM e JOIN cand USING (vec_id), qv
       | ORDER BY raw DESC, e.vec_id LIMIT $k)
       |SELECT vec_id, round(raw, 6) AS score FROM top
       | ORDER BY raw DESC, vec_id""".stripMargin

  /** The shared `e`/`d`/`a` CTE block: every vector's first-wins argmin
    * list assignment against centroid literals — strictly-sequential
    * squared-L2 sums, exactly `nearestCentroid`'s loop. Used by the IVF
    * top-k twin and the trained-centroid SemDeDup twin.
    */
  private def ivfAssignCtes(centers: Array[Array[Double]]): String = {
    val dim = centers.head.length
    def lit(c: Array[Double]): String =
      c.mkString("CAST([", ", ", "] AS DOUBLE[])")
    def dist(c: Array[Double]): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(range(1, ${dim + 1}),
         |   i -> (v[CAST(i AS INT)] - (${lit(c)})[CAST(i AS INT)])
         |      * (v[CAST(i AS INT)] - (${lit(c)})[CAST(i AS INT)]))),
         |  (a, b) -> a + b)""".stripMargin
    val dcols = centers.indices.map(i => s"${dist(centers(i))} AS d$i").mkString(",\n ")
    val dlist = centers.indices.map(i => s"d$i").mkString(", ")
    val argmin = centers.indices
      .map(i => s"WHEN d$i = least($dlist) THEN $i").mkString("CASE ", " ", " END")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |d AS (SELECT vec_id, v, $dcols FROM e),
       |a AS (SELECT vec_id, v, $argmin AS list_id FROM d)""".stripMargin
  }

  /** q148 twin: IVF probed pages for the 20 query vectors (assignment +
    * per-query 2-probe set + candidate ranking, the q_ivf_topk scheme
    * generalized per query) graded against the exact top-10 gold by the
    * q146 metric CTEs — recall/MRR/nDCG re-derived wholly in SQL.
    */
  private def annRecallOracle(centers: Array[Array[Double]]): String = {
    val structs = centers.indices
      .map(i => s"struct_pack(d := d$i, i := $i)").mkString("[", ", ", "]")
    s"""WITH ${ivfAssignCtes(centers)},
       |p AS (SELECT vec_id AS query_id,
       |   list_transform(list_sort($structs), x -> x.i) AS probes
       |  FROM d WHERE vec_id < 20),
       |q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 20),
       |c AS (SELECT vec_id, v, list_id FROM a WHERE vec_id >= 20),
       |cand AS (SELECT p.query_id, c.vec_id AS doc_id,
       |   list_cosine_similarity(q.v, c.v) AS sim
       |  FROM p JOIN q USING (query_id)
       |  JOIN c ON c.list_id IN (p.probes[1], p.probes[2])),
       |res AS (SELECT query_id, doc_id,
       |   CAST(row_number() OVER (PARTITION BY query_id
       |     ORDER BY sim DESC, doc_id) AS BIGINT) AS rank FROM cand),
       |ex AS (SELECT q.query_id, c2.vec_id AS doc_id,
       |   row_number() OVER (PARTITION BY q.query_id
       |     ORDER BY list_cosine_similarity(q.v, c2.v) DESC, c2.vec_id) AS rn
       |  FROM q CROSS JOIN (SELECT vec_id, v FROM e WHERE vec_id >= 20) c2),
       |gold AS (SELECT query_id, doc_id FROM ex WHERE rn <= 10),
       |ng AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_gold
       |  FROM gold GROUP BY 1),
       |h AS (SELECT r.query_id, r.rank FROM res r
       |  JOIN gold g ON r.query_id = g.query_id AND r.doc_id = g.doc_id
       |  WHERE r.rank <= 10),
       |agg AS (SELECT query_id, CAST(count(*) AS BIGINT) AS hits,
       |  min(rank) AS first_rank,
       |  list(rank ORDER BY rank) AS hit_ranks FROM h GROUP BY 1),
       |m AS (SELECT ng.query_id, ng.n_gold,
       |  coalesce(agg.hits, 0) AS hits,
       |  CAST(coalesce(agg.hits, 0) AS DOUBLE) / ng.n_gold AS recall,
       |  CASE WHEN agg.first_rank IS NULL THEN 0.0
       |       ELSE 1.0 / agg.first_rank END AS mrr,
       |  coalesce(list_reduce(
       |    list_prepend(CAST(0.0 AS DOUBLE), list_transform(agg.hit_ranks,
       |      r -> 0.6931471805599453 / ln(CAST(r AS DOUBLE) + 1.0))),
       |    (a, b) -> a + b), 0.0) AS dcg,
       |  list_reduce(
       |    list_prepend(CAST(0.0 AS DOUBLE), list_transform(
       |      range(1, least(10, ng.n_gold) + 1),
       |      i -> 0.6931471805599453 / ln(CAST(i AS DOUBLE) + 1.0))),
       |    (a, b) -> a + b) AS idcg
       |  FROM ng LEFT JOIN agg USING (query_id))
       |SELECT query_id, n_gold, hits, round(recall, 6) AS recall,
       |  round(mrr, 6) AS mrr, round(dcg / idcg, 6) AS ndcg
       |FROM m ORDER BY query_id""".stripMargin
  }

  private def ivfTopkOracle(centers: Array[Array[Double]]): String = {
    val structs = centers.indices
      .map(i => s"struct_pack(d := d$i, i := $i)").mkString("[", ", ", "]")
    s"""WITH ${ivfAssignCtes(centers)},
       |p AS (SELECT list_transform(list_sort($structs), x -> x.i) AS probes
       |      FROM d WHERE vec_id = 0),
       |qv AS (SELECT v AS qvec FROM e WHERE vec_id = 0),
       |top AS (
       | SELECT a.vec_id, list_cosine_similarity(a.v, qv.qvec) AS raw
       | FROM a, p, qv
       | WHERE a.list_id IN (p.probes[1], p.probes[2], p.probes[3])
       | ORDER BY raw DESC, a.vec_id LIMIT 10)
       |SELECT vec_id, round(raw, 6) AS score FROM top
       | ORDER BY raw DESC, vec_id""".stripMargin
  }

  /** Trained-centroid SemDeDup twin (q130): same assignment CTEs, then
    * within-list pairs verified by exact cosine — the SQL re-derivation
    * of `SemDedup.semanticDupsAssigned(Ann.ivfAssign(...))`, i.e. the
    * clustering the persistent ANN index stores.
    */
  private def semdedupIvfOracle(centers: Array[Array[Double]],
                                threshold: Double): String =
    s"""WITH ${ivfAssignCtes(centers)}
       |SELECT a1.list_id AS cluster_id, a1.vec_id AS key_a,
       |  a2.vec_id AS key_b,
       |  round(list_cosine_similarity(a1.v, a2.v), 6) AS cosine
       |FROM a a1 JOIN a a2
       |  ON a1.list_id = a2.list_id AND a1.vec_id < a2.vec_id
       |WHERE list_cosine_similarity(a1.v, a2.v) >= $threshold
       |ORDER BY cluster_id, key_a, key_b""".stripMargin

  /** LSH ANN twin. The hyperplane family is a pure function of
    * (dim = 64, bits = 6, seed = 42) — the fixture's constants — so the
    * planes are embedded in the SQL as double literals (shortest
    * round-trip repr: DuckDB parses back the identical f64). Each dot
    * product is a strictly-sequential `list_reduce` sum, matching
    * `Ann.bucketOf`'s left-to-right f64 loop bit for bit, so every sign
    * (= every bucket bit) agrees; the probe set is the query's bucket
    * plus all 1-bit flips, like `probeBuckets(multiProbe = true)`.
    */
  private lazy val annTopkOracle: String = {
    val planes = graft.search.Ann.hyperplanes(dim = 64, bits = 6, seed = 42L)
    def lit(p: Array[Double]): String =
      p.mkString("CAST([", ", ", "] AS DOUBLE[])")
    def dot(p: Array[Double]): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |   list_transform(range(1, 65), i -> v[CAST(i AS INT)] * (${lit(p)})[CAST(i AS INT)])),
         |   (a, b) -> a + b)""".stripMargin
    val bucket = planes.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN ${dot(p)} > 0 THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")
    // top-10 selected by the RAW score (like Spark's orderBy-then-round),
    // rounding applied only to the surviving rows — ordering by the
    // rounded alias could pick a different set on a near-tie at rank 10
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucket AS bucket FROM e),
       |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0),
       |top AS (
       | SELECT b.vec_id, list_cosine_similarity(b.v, q.qv) AS raw
       | FROM b, q
       | WHERE b.bucket IN (q.qb, xor(q.qb, 1), xor(q.qb, 2), xor(q.qb, 4),
       |   xor(q.qb, 8), xor(q.qb, 16), xor(q.qb, 32))
       | ORDER BY raw DESC, b.vec_id LIMIT 10)
       |SELECT vec_id, round(raw, 6) AS score FROM top
       | ORDER BY raw DESC, vec_id""".stripMargin
  }

  /** One entry per implemented operator from SURVEY.md §2 (plus the
    * training-data-pipeline extensions).
    */
  def queries: Map[String, Q] =
    referenceQueries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.PipelineQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    referenceOracles ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.PipelineQueries.oracles
}
