package graft.serve

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import graft.core.Catalog
import graft.embed.ModelRegistry
import graft.search.Search

/** The reference's HTTP surface (C6, src/serve.rs:77-225) on the JDK's
  * built-in server — no extra dependencies:
  *
  *  - `GET  /`                                  healthcheck (version)
  *  - `GET  /collections`                       all collection configs
  *  - `GET  /collections/{name}`                one config
  *  - `POST /collections/{name}/search`         `{column_name, query, limit?}`
  *
  * plus two batch extensions the reference lacks:
  *
  *  - `POST /collections/{name}/search_batch`   `{column_name,
  *    queries:[{id, query}...], limit?, n_probe?}` — one probed pass
  *    answers the whole page
  *  - `POST /collections/{name}/percolate`      `{column_name,
  *    documents:[{id, text}...], require_all?, mode?, threshold?}` —
  *    reverse search against the saved-queries table; `mode: "vector"`
  *    matches by embedding cosine >= `threshold` instead of terms
  *  - `GET  /collections/{name}/quality`        per-column quality
  *    aggregates (token/punct/stopword/xent/repetition means + lang
  *    histogram) from `analyzeQuality`
  *  - `GET  /collections/{name}/status`         consistency counters +
  *    centroid drift per index structure and the ordered maintenance
  *    plan (counting/footer metadata only)
  *
  * Responses use the reference envelope
  * `{"status":"ok","time":<sec>,"data":...}` /
  * `{"status":"error","time":<sec>,"message":...}` (serve.rs:31-75), and
  * search clamps `1 <= limit <= 100` with default 10 (K5,
  * serve.rs:53,155-161).
  *
  * Each search request runs one small Spark job (top-k over the column's
  * embedding index) — the driver hosts the API; executors do the scan.
  * For a production deployment you would put the index behind
  * bucket-partitioned parquet (see [[graft.search.Ann.writeIndex]]) so a
  * request prunes to probed buckets.
  */
final class HttpApi(catalog: Catalog, registry: ModelRegistry, port: Int,
                    host: String = "127.0.0.1") {
  @volatile private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/", handle _)
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(ex: HttpExchange): Unit = {
    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9
    val (code, body) =
      try route(ex, () => secs)
      catch {
        case e: IllegalArgumentException => (400, err(secs, e.getMessage))
        case e: NoSuchElementException   => (404, err(secs, e.getMessage))
        case e: Exception                => (500, err(secs, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def route(ex: HttpExchange, secs: () => Double): (Int, String) = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val method = ex.getRequestMethod
    (method, path) match {
      case ("GET", "") =>
        (200, ok(secs(), s"""{"version":"${HttpApi.Version}"}"""))
      case ("GET", "/collections") =>
        val items = catalog.list().map(configJson).mkString("[", ",", "]")
        (200, ok(secs(), s"""{"collections":$items}"""))
      case ("GET", s"/collections/$name") if !name.contains("/") =>
        graft.core.Identifiers.validate(name) // rejects ".." etc
        if (!catalog.exists(name)) throw new NoSuchElementException(s"collection $name not found")
        (200, ok(secs(), configJson(catalog.load(name).config)))
      case ("POST", s"/collections/$name/search") if !name.contains("/") =>
        // reject path separators / traversal before the name touches the
        // filesystem (same guard as the GET config route)
        graft.core.Identifiers.validate(name)
        if (!catalog.exists(name)) throw new NoSuchElementException(s"collection $name not found")
        val req = JsonMethods.parse(new String(
          ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        implicit val fmt: Formats = DefaultFormats
        val column = (req \ "column_name").extractOpt[String]
          .getOrElse(throw new IllegalArgumentException("column_name is required"))
        val query = (req \ "query").extractOpt[String]
          .getOrElse(throw new IllegalArgumentException("query is required"))
        val limit = (req \ "limit").extractOpt[Int].getOrElse(Search.DefaultLimit)
        Search.validateLimit(limit)
        val mode = (req \ "mode").extractOpt[String].getOrElse("vector")
        // keyset pagination: the LAST hit's [score, key], echoed verbatim
        // (doubles serialize round-trip-exactly, so the cursor is exact).
        // Stateless — no scroll context is held server-side.
        val searchAfter: Option[(Double, Long)] =
          (req \ "search_after") match {
            // json4s extracts an ABSENT field as an empty Seq — match
            // JNothing/JNull explicitly so only present-but-malformed
            // cursors error
            case org.json4s.JNothing | org.json4s.JNull => None
            case v => v.extractOpt[Seq[Double]] match {
              case Some(Seq(s, key)) if key.isWhole => Some((s, key.toLong))
              case other => throw new IllegalArgumentException(
                s"search_after must be [score, key], got $other")
            }
          }
        if (searchAfter.isDefined && mode != "vector" && mode != "keyword")
          throw new IllegalArgumentException(
            s"search_after supports modes vector|keyword, not '$mode'")
        val coll = catalog.load(name)
        def embedder = registry.load(coll.config.model_name, coll.config.model_variant)
        val rows = (mode match {
          case "vector" => coll.search(column, query, limit, embedder, searchAfter)
          case "keyword" =>
            // require_all=true -> conjunctive (AND) semantics
            val requireAll = (req \ "require_all").extractOpt[Boolean]
              .getOrElse(false)
            coll.searchKeyword(column, query, limit, requireAll, searchAfter)
          case "fuzzy" =>
            // keyword search with typo auto-correction (vocabulary-
            // absent terms replaced by their best trigram/edit match)
            val requireAll = (req \ "require_all").extractOpt[Boolean]
              .getOrElse(false)
            val maxDist = (req \ "max_dist").extractOpt[Int].getOrElse(2)
            require(maxDist >= 1, s"max_dist must be >= 1, got $maxDist")
            coll.searchKeywordFuzzy(column, query, limit, requireAll, maxDist)
          case "hybrid" => coll.searchHybrid(column, query, limit, embedder)
          case "ann" =>
            val nProbe = (req \ "n_probe").extractOpt[Int].getOrElse(2)
            require(nProbe >= 1, s"n_probe must be >= 1, got $nProbe")
            coll.searchAnn(column, query, limit, embedder, nProbe)
          case "binary" =>
            // Hamming candidates over the 1-bit sketch, exact rerank
            val fetchK = (req \ "fetch_k").extractOpt[Int].getOrElse(0)
            require(fetchK >= 0, s"fetch_k must be >= 0, got $fetchK")
            coll.searchBinary(column, query, limit, embedder, fetchK)
          case "late" =>
            // MaxSim over a chunked index; chunk_tokens should match the
            // granularity the index was embedded with. n_probe > 0 routes
            // candidate generation through the ANN index (PLAID shape)
            val mt = (req \ "chunk_tokens").extractOpt[Int].getOrElse(512)
            require(mt >= 1, s"chunk_tokens must be >= 1, got $mt")
            // an absent overlap clamps to the chunk size instead of
            // failing small chunk_tokens on the 50-token default
            val ov = (req \ "chunk_overlap").extractOpt[Int]
              .getOrElse(math.min(50, mt - 1))
            require(ov >= 0 && ov < mt,
              s"need 0 <= chunk_overlap < chunk_tokens, got ($mt, $ov)")
            val np = (req \ "n_probe").extractOpt[Int].getOrElse(0)
            require(np >= 0, s"n_probe must be >= 0, got $np")
            coll.searchLate(column, query, limit, embedder, mt, ov, np)
          case other => throw new IllegalArgumentException(
            s"mode must be vector|keyword|fuzzy|hybrid|ann|binary|late, got '$other'")
        }).collect()
        val results = rows.map { r =>
          s"""{"content":${js(r.getString(0))},"key":${r.getLong(1)},"score":${r.getDouble(2)}}"""
        }.mkString("[", ",", "]")
        // a FULL page advertises its continuation cursor (vector/keyword
        // modes); a short page is the end — no next
        val next =
          if (rows.length == limit && (mode == "vector" || mode == "keyword"))
            s""","next":[${rows.last.getDouble(2)},${rows.last.getLong(1)}]"""
          else ""
        (200, ok(secs(), s"""{"results":$results$next}"""))
      case ("GET", s"/collections/$name/similar/$keyStr")
          if !name.contains("/") && !keyStr.contains("/") =>
        // related items by the STORED vector of an indexed key —
        // query-by-example without an embedder call; same result
        // envelope as search, no cursor (pages are k-deep by contract)
        graft.core.Identifiers.validate(name)
        if (!catalog.exists(name)) throw new NoSuchElementException(s"collection $name not found")
        val coll = catalog.load(name)
        val key = try keyStr.toLong catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"key must be an integer, got '$keyStr'")
        }
        val q = ex.getRequestURI.getQuery
        val params = Option(q).getOrElse("").split("&").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val limit = params.get("limit").map(_.toInt).getOrElse(10)
        val column = params.getOrElse("column",
          coll.config.index_columns.headOption.getOrElse(
            throw new IllegalArgumentException("collection has no index columns")))
        val rows = coll.moreLikeThis(column, key, limit).collect()
        val results = rows.map { r =>
          s"""{"content":${js(r.getString(0))},"key":${r.getLong(1)},"score":${r.getDouble(2)}}"""
        }.mkString("[", ",", "]")
        (200, ok(secs(), s"""{"results":$results}"""))
      case ("GET", s"/collections/$name/status") if !name.contains("/") =>
        // operational health over HTTP: per-index-column consistency
        // counters (+ ANN centroid drift) and the ordered maintenance
        // plan — counting/footer-metadata only, safe for a GET
        graft.core.Identifiers.validate(name)
        if (!catalog.exists(name)) throw new NoSuchElementException(s"collection $name not found")
        val coll = catalog.load(name)
        val statuses = coll.config.index_columns.flatMap { c =>
          coll.indexStatus(c).collect().map { r =>
            val drift = if (r.isNullAt(4)) "null" else r.getDouble(4).toString
            s"""{"column":${js(c)},"structure":${js(r.getString(0))},""" +
              s""""missing":${r.getLong(1)},"stale":${r.getLong(2)},""" +
              s""""orphaned":${r.getLong(3)},"drift":$drift}"""
          }
        }.mkString("[", ",", "]")
        val plan = coll.planMaintenance().collect().map { r =>
          s"""{"priority":${r.getInt(0)},"column":${js(r.getString(1))},""" +
            s""""structure":${js(r.getString(2))},"action":${js(r.getString(3))},""" +
            s""""reason":${js(r.getString(4))}}"""
        }.mkString("[", ",", "]")
        (200, ok(secs(),
          s"""{"count":${coll.count()},"status":$statuses,"plan":$plan}"""))
      case ("GET", s"/collections/$name/quality") if !name.contains("/") =>
        // corpus quality summary over HTTP: per-index-column aggregates
        // of the analyzeQuality battery plus the language histogram —
        // read-only aggregation, safe for a GET (the full per-doc
        // report stays a CLI/`analyze --dest` concern: it is
        // corpus-sized and has no business in one HTTP response)
        graft.core.Identifiers.validate(name)
        if (!catalog.exists(name)) throw new NoSuchElementException(s"collection $name not found")
        val coll = catalog.load(name)
        import org.apache.spark.sql.functions.{avg, count => cnt, lit, round => rnd}
        val summaries = coll.config.index_columns.map { c =>
          val rep = coll.analyzeQuality(c).localCheckpoint(true)
          val a = rep.agg(cnt(lit(1)).as("n"),
            rnd(avg("n_tokens"), 2).as("t"), rnd(avg("punct_ratio"), 6).as("p"),
            rnd(avg("stopword_ratio"), 6).as("s"), rnd(avg("xent2"), 6).as("x"),
            rnd(avg("top2_frac"), 6).as("r2"), rnd(avg("dup3_frac"), 6).as("r3"))
            .head()
          val langs = rep.groupBy("lang").count().orderBy("lang").collect()
            .map(r => s"${js(r.getString(0))}:${r.getLong(1)}")
            .mkString("{", ",", "}")
          def num(i: Int) = if (a.isNullAt(i)) "null" else a.getDouble(i).toString
          s"""{"column":${js(c)},"n_docs":${a.getLong(0)},""" +
            s""""avg_tokens":${num(1)},"avg_punct":${num(2)},""" +
            s""""avg_stopword":${num(3)},"avg_xent2":${num(4)},""" +
            s""""avg_top2_frac":${num(5)},"avg_dup3_frac":${num(6)},""" +
            s""""langs":$langs}"""
        }.mkString("[", ",", "]")
        (200, ok(secs(), s"""{"quality":$summaries}"""))
      case ("GET", s"/collections/$name/queries") if !name.contains("/") =>
        graft.core.Identifiers.validate(name)
        if (!catalog.exists(name)) throw new NoSuchElementException(s"collection $name not found")
        val rows = catalog.load(name).savedQueries
          .orderBy("query_id").collect()
        val items = rows.map(r =>
          s"""{"query_id":${r.getLong(0)},"query":${js(r.getString(1))}}""")
          .mkString("[", ",", "]")
        (200, ok(secs(), s"""{"queries":$items}"""))
      case ("POST", s"/collections/$name/queries") if !name.contains("/") =>
        // register saved percolation queries (merge by id); or, with
        // {delete:[ids...]}, unregister
        graft.core.Identifiers.validate(name)
        if (!catalog.exists(name)) throw new NoSuchElementException(s"collection $name not found")
        val req = JsonMethods.parse(new String(
          ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        implicit val fmt: Formats = DefaultFormats
        val coll = catalog.load(name)
        val spark = coll.spark
        import spark.implicits._
        // json4s extracts a MISSING field as Some(Nil) for Seq — match the
        // JSON shape explicitly so {} routes to the queries branch
        (req \ "delete") match {
          case JArray(_) =>
            val ids = (req \ "delete").extract[Seq[Long]]
            require(ids.nonEmpty, "delete must carry at least one id")
            val n = coll.deleteQueries(ids)
            (200, ok(secs(), s"""{"deleted":$n}"""))
          case _ =>
            val qs = (req \ "queries").extractOpt[Seq[JValue]]
              .getOrElse(throw new IllegalArgumentException(
                "queries (or delete) is required"))
            require(qs.nonEmpty && qs.length <= 1000,
              s"queries must carry 1..1000 entries, got ${qs.length}")
            val rows = qs.map { q =>
              ((q \ "query_id").extractOpt[Long]
                 .getOrElse(throw new IllegalArgumentException("queries[].query_id is required")),
               (q \ "query").extractOpt[String]
                 .getOrElse(throw new IllegalArgumentException("queries[].query is required")))
            }
            // same contract as search_batch / percolate: one row per id
            require(rows.map(_._1).distinct.length == rows.length,
              "queries[].query_id values must be distinct")
            val n = coll.putQueries(rows.toDF("query_id", "query"))
            (200, ok(secs(), s"""{"saved":$n}"""))
        }
      case ("POST", s"/collections/$name/search_batch") if !name.contains("/") =>
        // many-queries-at-once vector search: embed the page of query
        // texts once, answer all of them in ONE probed pass over the ANN
        // lists (Collection.searchBatch) instead of N sequential calls —
        // the eval-set / decontamination serving shape
        graft.core.Identifiers.validate(name)
        if (!catalog.exists(name)) throw new NoSuchElementException(s"collection $name not found")
        val req = JsonMethods.parse(new String(
          ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        implicit val fmt: Formats = DefaultFormats
        val column = (req \ "column_name").extractOpt[String]
          .getOrElse(throw new IllegalArgumentException("column_name is required"))
        val qs = (req \ "queries").extractOpt[Seq[JValue]]
          .getOrElse(throw new IllegalArgumentException("queries is required"))
        require(qs.nonEmpty && qs.length <= 100,
          s"queries must carry 1..100 entries, got ${qs.length}")
        val limit = (req \ "limit").extractOpt[Int].getOrElse(Search.DefaultLimit)
        Search.validateLimit(limit)
        val nProbe = (req \ "n_probe").extractOpt[Int].getOrElse(2)
        require(nProbe >= 1, s"n_probe must be >= 1, got $nProbe")
        val coll = catalog.load(name)
        val embedder = registry.load(coll.config.model_name, coll.config.model_variant)
        val qrows = qs.map { q =>
          ((q \ "id").extractOpt[Long]
             .getOrElse(throw new IllegalArgumentException("queries[].id is required")),
           (q \ "query").extractOpt[String]
             .getOrElse(throw new IllegalArgumentException("queries[].query is required")))
        }
        require(qrows.map(_._1).distinct.length == qrows.length,
          "queries[].id values must be distinct")
        val spark = coll.spark
        import spark.implicits._
        val qdf = qrows.map { case (id, t) => (id, embedder.embedOne(t)) }
          .toDF(graft.core.Keys.KeyCol, "embedding")
        val hits = coll.searchBatch(qdf, column, limit, nProbe)
          .orderBy(col("src"), col("sim").desc, col("nbr")).collect()
        // one bounded content fetch for the page's distinct hit keys
        val hitKeys = hits.map(_.getLong(1)).distinct
        val content: Map[Long, String] =
          if (hitKeys.isEmpty) Map.empty
          else coll.df
            .filter(col(graft.core.Keys.KeyCol).isin(hitKeys.toSeq: _*))
            .select(col(graft.core.Keys.KeyCol),
              coalesce(col(column).cast("string"), lit("")).as("c"))
            .as[(Long, String)].collect().toMap
        val byQuery = hits.groupBy(_.getLong(0))
        val results = qrows.map(_._1).distinct.map { id =>
          val page = byQuery.getOrElse(id, Array.empty).map { r =>
            s"""{"key":${r.getLong(1)},"score":${r.getDouble(2)},""" +
              s""""content":${js(content.getOrElse(r.getLong(1), ""))}}"""
          }.mkString("[", ",", "]")
          s"""{"id":$id,"hits":$page}"""
        }.mkString("[", ",", "]")
        (200, ok(secs(), s"""{"results":$results}"""))
      case ("POST", s"/collections/$name/percolate") if !name.contains("/") =>
        // reverse search: which saved queries match the posted documents?
        // `{column_name, documents:[{id, text}...], require_all?}` — the
        // document batch is bounded like a search page (<= 100 docs)
        graft.core.Identifiers.validate(name)
        if (!catalog.exists(name)) throw new NoSuchElementException(s"collection $name not found")
        val req = JsonMethods.parse(new String(
          ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        implicit val fmt: Formats = DefaultFormats
        val column = (req \ "column_name").extractOpt[String]
          .getOrElse(throw new IllegalArgumentException("column_name is required"))
        val docs = (req \ "documents").extractOpt[Seq[JValue]]
          .getOrElse(throw new IllegalArgumentException("documents is required"))
        require(docs.nonEmpty && docs.length <= 100,
          s"documents must carry 1..100 entries, got ${docs.length}")
        val requireAll = (req \ "require_all").extractOpt[Boolean].getOrElse(true)
        val coll = catalog.load(name)
        val rows = docs.map { d =>
          ((d \ "id").extractOpt[Long]
             .getOrElse(throw new IllegalArgumentException("documents[].id is required")),
           (d \ "text").extractOpt[String].getOrElse(""))
        }
        require(rows.map(_._1).distinct.length == rows.length,
          "documents[].id values must be distinct")
        val spark = coll.spark
        import spark.implicits._
        val matches = (req \ "mode").extractOpt[String].getOrElse("keyword") match {
          case "keyword" =>
            coll.percolate(column,
                rows.toDF("id", "text"), idCol = "id", textCol = "text",
                requireAll = requireAll)
              .orderBy("query_id", "key").collect().map { r =>
                s"""{"id":${r.getLong(0)},"query_id":${r.getLong(1)},""" +
                  s""""matched_terms":${r.getLong(2)},"n_terms":${r.getLong(3)}}"""
              }.mkString("[", ",", "]")
          case "vector" =>
            // semantic percolation: saved queries match by embedding
            // cosine >= threshold (default 0.5), not by shared terms
            val threshold = (req \ "threshold").extractOpt[Double].getOrElse(0.5)
            require(threshold >= -1.0 && threshold <= 1.0,
              s"threshold must be a cosine in [-1, 1], got $threshold")
            val embedder = registry.load(coll.config.model_name,
              coll.config.model_variant)
            coll.percolateVector(column, rows.toDF("id", "text"), embedder,
                threshold, idCol = "id", textCol = "text")
              .orderBy("query_id", "key").collect().map { r =>
                s"""{"id":${r.getLong(0)},"query_id":${r.getLong(1)},""" +
                  s""""cosine":${r.getDouble(2)}}"""
              }.mkString("[", ",", "]")
          case other => throw new IllegalArgumentException(
            s"mode must be keyword|vector, got '$other'")
        }
        (200, ok(secs(), s"""{"matches":$matches}"""))
      case _ => (404, err(secs(), s"no route for $method $path"))
    }
  }

  private def configJson(c: graft.core.CollectionConfig): String =
    graft.core.CollectionConfig.toJson(c)

  private def js(s: String): String =
    // a row whose indexed text column is null still embeds (as "") and
    // can surface in top-k — render JSON null, not a 500
    if (s == null) "null" else JsonMethods.compact(JString(s))
  private def ok(time: Double, data: String): String =
    s"""{"status":"ok","time":$time,"data":$data}"""
  private def err(time: Double, msg: String): String =
    s"""{"status":"error","time":$time,"message":${js(msg)}}"""
}

object HttpApi {
  val Version = "0.1.0"
}
