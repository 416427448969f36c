package graft.sources.rest

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.GraftTable

/** A catalog SERVICE over a graft warehouse — the deployment shape of
  * the reference's Polaris REST catalog (the reference wires every
  * engine to one `type=rest` catalog endpoint:
  * docker/spark-notebook/getting_started.py:82-95 configures
  * `spark.sql.catalog...type=rest` + `uri=http://polaris:8181/api/catalog`;
  * 01_polaris_demo.ipynb drives it; k8s/polaris/ deploys it). graft's
  * in-process [[graft.sources.v2.GraftCatalog]] gives one session a
  * catalog; this server gives a FLEET of sessions the same catalog
  * through one URI, with the catalog service — not each client's
  * filesystem conventions — answering what exists.
  *
  * The route shapes follow the public Iceberg REST catalog OpenAPI
  * (rest-catalog-open-api.yaml) subset the reference exercises —
  * config, namespace CRUD, table list/create/load/drop/rename — with
  * graft-profile payloads (Spark StructType JSON for schemas, graft
  * layout-spec strings for partitioning; a real Polaris speaks Iceberg
  * schema JSON here). Multi-level namespaces use the spec's %1F
  * unit-separator path encoding. Errors are the spec's envelope
  * `{"error":{"message","type","code"}}` with its status mapping:
  * 404 NoSuch*, 409 AlreadyExists / NamespaceNotEmpty / commit
  * conflict, 400 malformed.
  *
  * Control plane vs data plane: only METADATA flows through this
  * server (one small JSON per DDL call — the same O(1) driver-side
  * shape as Polaris). Clients read and commit DATA directly against
  * the table root the server hands back; concurrent commits stay safe
  * through the table format's optimistic exclusive-put protocol
  * (TableIO), which is cross-process by construction — the server
  * itself serializes only its own check-then-create DDL (`ddlLock`),
  * the same role Polaris' backing store plays. A racing CREATE that
  * loses surfaces as 409, backed by the commit-0 exclusive claim even
  * across two servers on one warehouse.
  *
  * Bounded-daemon HTTP machinery as
  * [[graft.metrics.HttpMetricSink]]: a small daemon pool, never
  * blocking the session that started it; `port = 0` binds ephemeral. */
class RestCatalogServer(spark: SparkSession, val warehouse: String,
                        port: Int = 0) {
  import RestCatalogServer._

  private val om = new ObjectMapper()
  private val started = new AtomicBoolean(false)
  private val ddlLock = new Object
  private var server: HttpServer = _

  private def fs = new HPath(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def whPath(segments: Seq[String]): HPath =
    segments.foldLeft(new HPath(warehouse))((p, s) => new HPath(p, s))
  private def isTable(p: HPath): Boolean =
    fs.exists(new HPath(p, "_graft_log"))
  private def isDir(p: HPath): Boolean =
    try fs.getFileStatus(p).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  /** Bind and serve; returns the bound port. */
  def start(): Int = {
    require(started.compareAndSet(false, true), "server already started")
    server = HttpServer.create(new java.net.InetSocketAddress(
      java.net.InetAddress.getLoopbackAddress, port), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => {
        val t = new Thread(r, "graft-rest-catalog")
        t.setDaemon(true)
        t
      }))
    server.createContext("/", (x: HttpExchange) => handle(x))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  def uri: String =
    s"http://${server.getAddress.getAddress.getHostAddress}:${server.getAddress.getPort}"

  // ------------------------------------------------------- routing

  private def handle(x: HttpExchange): Unit = {
    // handler threads are not the session's thread — pin the active
    // session so GraftTable/TableIO resolve the right one
    SparkSession.setActiveSession(spark)
    try {
      // RAW path: getPath is already percent-decoded, and decodeNs/dec
      // decode each segment — decoding twice would turn literal '+'
      // into spaces, blow up on literal '%' sequences, and let an
      // encoded '/' in a name break segment routing
      val segs = x.getRequestURI.getRawPath.split("/").filter(_.nonEmpty).toSeq
      val method = x.getRequestMethod
      (method, segs) match {
        case ("GET", Seq("v1", "config")) =>
          val n = om.createObjectNode()
          n.set[JsonNode]("defaults", om.createObjectNode())
          val ov = om.createObjectNode()
          ov.put("warehouse", warehouse)
          ov.put("graft-rest-catalog", "1")
          n.set[JsonNode]("overrides", ov)
          reply(x, 200, n)

        case ("GET", Seq("v1", "namespaces")) =>
          // query() returns the RAW value — decodeNs applies the one
          // and only decode
          val parent = Option(query(x, "parent")).map(decodeNs).getOrElse(Nil)
          listNamespaces(x, parent)
        case ("POST", Seq("v1", "namespaces")) =>
          createNamespace(x, om.readTree(bodyOf(x)))
        case ("GET", Seq("v1", "namespaces", ns)) =>
          loadNamespace(x, decodeNs(ns))
        case ("HEAD", Seq("v1", "namespaces", ns)) =>
          headReply(x, if (namespaceExists(decodeNs(ns))) 204 else 404)
        case ("DELETE", Seq("v1", "namespaces", ns)) =>
          dropNamespace(x, decodeNs(ns))

        case ("GET", Seq("v1", "namespaces", ns, "tables")) =>
          listTables(x, decodeNs(ns))
        case ("POST", Seq("v1", "namespaces", ns, "tables")) =>
          createTable(x, decodeNs(ns), om.readTree(bodyOf(x)))
        case ("GET", Seq("v1", "namespaces", ns, "tables", t)) =>
          loadTable(x, decodeNs(ns), dec(t))
        case ("HEAD", Seq("v1", "namespaces", ns, "tables", t)) =>
          headReply(x, if (isTable(whPath(decodeNs(ns) :+ dec(t)))) 204 else 404)
        case ("DELETE", Seq("v1", "namespaces", ns, "tables", t)) =>
          dropTable(x, decodeNs(ns), dec(t))
        case ("POST", Seq("v1", "tables", "rename")) =>
          renameTable(x, om.readTree(bodyOf(x)))

        case _ => error(x, 404, "NotFoundException",
          s"no route: $method ${x.getRequestURI.getPath}")
      }
    } catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        error(x, 400, "BadRequestException", s"malformed JSON body: ${e.getMessage}")
      case NonFatal(e) =>
        error(x, 500, e.getClass.getSimpleName, String.valueOf(e.getMessage))
    } finally x.close()
  }

  // --------------------------------------------------- namespaces

  private def namespaceExists(ns: Seq[String]): Boolean = {
    val p = whPath(ns)
    ns.nonEmpty && isDir(p) && !isTable(p)
  }

  private def listNamespaces(x: HttpExchange, parent: Seq[String]): Unit = {
    val dir = whPath(parent)
    if (parent.nonEmpty && !namespaceExists(parent))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(parent))
    val arr = om.createArrayNode()
    if (isDir(dir)) fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && !isTable(st.getPath))
      .foreach { st =>
        val one = om.createArrayNode()
        (parent :+ st.getPath.getName).foreach(one.add)
        arr.add(one)
      }
    val n = om.createObjectNode()
    n.set[JsonNode]("namespaces", arr)
    reply(x, 200, n)
  }

  private def createNamespace(x: HttpExchange, body: JsonNode): Unit = {
    val ns = jsonNs(body.get("namespace"))
    if (ns.isEmpty)
      return error(x, 400, "BadRequestException", "empty namespace")
    ddlLock.synchronized {
      if (namespaceExists(ns) || isTable(whPath(ns)))
        return error(x, 409, "AlreadyExistsException", nsMsg(ns) + " exists")
      fs.mkdirs(whPath(ns))
    }
    val n = om.createObjectNode()
    n.set[JsonNode]("namespace", nsArray(ns))
    n.set[JsonNode]("properties", om.createObjectNode())
    reply(x, 200, n)
  }

  private def loadNamespace(x: HttpExchange, ns: Seq[String]): Unit = {
    if (!namespaceExists(ns))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
    val n = om.createObjectNode()
    n.set[JsonNode]("namespace", nsArray(ns))
    n.set[JsonNode]("properties", om.createObjectNode())
    reply(x, 200, n)
  }

  private def dropNamespace(x: HttpExchange, ns: Seq[String]): Unit =
    ddlLock.synchronized {
      val dir = whPath(ns)
      if (!namespaceExists(ns))
        error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
      else if (fs.listStatus(dir).nonEmpty)
        error(x, 409, "NamespaceNotEmptyException", nsMsg(ns) + " is not empty")
      else { fs.delete(dir, true); headReply(x, 204) }
    }

  // ------------------------------------------------------- tables

  private def listTables(x: HttpExchange, ns: Seq[String]): Unit = {
    if (!namespaceExists(ns))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
    val arr = om.createArrayNode()
    fs.listStatus(whPath(ns)).toSeq.filter(st => isTable(st.getPath))
      .foreach { st =>
        val id = om.createObjectNode()
        id.set[JsonNode]("namespace", nsArray(ns))
        id.put("name", st.getPath.getName)
        arr.add(id)
      }
    val n = om.createObjectNode()
    n.set[JsonNode]("identifiers", arr)
    reply(x, 200, n)
  }

  private def createTable(x: HttpExchange, ns: Seq[String],
                          body: JsonNode): Unit = {
    if (!namespaceExists(ns))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
    val name = Option(body.get("name")).map(_.asText()).getOrElse(
      return error(x, 400, "BadRequestException", "missing table name"))
    val schema = Option(body.get("schema-json")).map(j =>
      DataType.fromJson(j.asText()).asInstanceOf[StructType]).getOrElse(
      return error(x, 400, "BadRequestException", "missing schema-json"))
    val specs = Option(body.get("partition-specs")).toSeq
      .flatMap(a => (0 until a.size()).map(a.get(_).asText()))
    val path = whPath(ns :+ name)
    try ddlLock.synchronized {
      if (isTable(path))
        return error(x, 409, "AlreadyExistsException",
          s"table ${ns.mkString(".")}.$name exists")
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      GraftTable.create(spark, path.toString, empty, specs)
    } catch {
      // two servers on one warehouse race here instead of on ddlLock;
      // the loser's commit-0 exclusive claim fails -> same 409
      case e: IllegalArgumentException if
          String.valueOf(e.getMessage).contains("already exists") =>
        return error(x, 409, "AlreadyExistsException", e.getMessage)
    }
    tableJson(x, ns, name, path)
  }

  private def loadTable(x: HttpExchange, ns: Seq[String], name: String): Unit = {
    val path = whPath(ns :+ name)
    if (!isTable(path))
      return error(x, 404, "NoSuchTableException",
        s"table ${ns.mkString(".")}.$name not found")
    tableJson(x, ns, name, path)
  }

  private def tableJson(x: HttpExchange, ns: Seq[String], name: String,
                        path: HPath): Unit = {
    val t = GraftTable.load(spark, path.toString)
    val latest = t.latestVersion()
    val n = om.createObjectNode()
    n.put("location", path.toString)
    n.put("schema-json", t.commitAt(latest).schemaJson)
    n.put("latest-version", latest)
    reply(x, 200, n)
  }

  private def dropTable(x: HttpExchange, ns: Seq[String], name: String): Unit =
    ddlLock.synchronized {
      val path = whPath(ns :+ name)
      if (!isTable(path))
        error(x, 404, "NoSuchTableException",
          s"table ${ns.mkString(".")}.$name not found")
      else { fs.delete(path, true); headReply(x, 204) }
    }

  private def renameTable(x: HttpExchange, body: JsonNode): Unit = {
    if (!body.path("source").isObject || !body.path("destination").isObject ||
        !body.path("source").has("name") || !body.path("destination").has("name"))
      return error(x, 400, "BadRequestException",
        "rename needs source and destination identifiers")
    def identOf(n: JsonNode) = (jsonNs(n.get("namespace")), n.get("name").asText())
    val (srcNs, srcName) = identOf(body.get("source"))
    val (dstNs, dstName) = identOf(body.get("destination"))
    ddlLock.synchronized {
      val src = whPath(srcNs :+ srcName)
      val dst = whPath(dstNs :+ dstName)
      if (!isTable(src))
        error(x, 404, "NoSuchTableException",
          s"table ${srcNs.mkString(".")}.$srcName not found")
      else if (!namespaceExists(dstNs))
        error(x, 404, "NoSuchNamespaceException", nsMsg(dstNs))
      else if (isTable(dst))
        error(x, 409, "AlreadyExistsException",
          s"table ${dstNs.mkString(".")}.$dstName exists")
      else {
        require(fs.rename(src, dst), s"rename $src -> $dst failed")
        headReply(x, 204)
      }
    }
  }

  // -------------------------------------------------------- plumbing

  private def nsArray(ns: Seq[String]): ArrayNode = {
    val a = om.createArrayNode(); ns.foreach(a.add); a
  }
  private def jsonNs(n: JsonNode): Seq[String] =
    if (n == null || !n.isArray) Nil
    else (0 until n.size()).map(n.get(_).asText())
  private def nsMsg(ns: Seq[String]) = s"namespace ${ns.mkString(".")}"

  /** RAW (still-encoded) query value — callers decode exactly once
    * (decodeNs for namespace params). */
  private def query(x: HttpExchange, key: String): String = {
    val q = x.getRequestURI.getRawQuery
    if (q == null) null
    else q.split("&").map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == key => v }.orNull
  }

  private def bodyOf(x: HttpExchange): String =
    new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def reply(x: HttpExchange, code: Int, node: ObjectNode): Unit = {
    val bytes = om.writeValueAsBytes(node)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length)
    // HEAD-shaped exchanges have no body stream to write
    if (x.getRequestMethod != "HEAD") x.getResponseBody.write(bytes)
    x.getResponseBody.close()
  }

  private def headReply(x: HttpExchange, code: Int): Unit =
    x.sendResponseHeaders(code, -1)

  private def error(x: HttpExchange, code: Int, typ: String,
                    message: String): Unit = {
    if (x.getRequestMethod == "HEAD") return headReply(x, code)
    val n = om.createObjectNode()
    val e = om.createObjectNode()
    e.put("message", message)
    e.put("type", typ)
    e.put("code", code)
    n.set[JsonNode]("error", e)
    reply(x, code, n)
  }
}

object RestCatalogServer {
  /** Iceberg REST multipart namespace path form: segments joined by
    * the %1F unit separator, then URL-encoded. */
  private[rest] def encodeNs(ns: Seq[String]): String =
    java.net.URLEncoder.encode(ns.mkString("\u001F"), "UTF-8")
  private[rest] def decodeNs(seg: String): Seq[String] =
    dec(seg).split("\u001F").toSeq.filter(_.nonEmpty)
  private[rest] def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")
}
