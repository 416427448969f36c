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
  * blocking the session that started it; `port = 0` binds ephemeral.
  *
  * `credential = Some("client_id:client_secret")` turns on the
  * reference deployment's auth handshake (getting_started.py:82-99
  * wires `credential` + `scope=PRINCIPAL_ROLE:ALL` +
  * `oauth2-server-uri` into every session): `POST /v1/oauth/tokens`
  * exchanges client-credentials for a bearer token (RFC 6749 form
  * body and error shapes), and every other route then requires
  * `Authorization: Bearer <issued token>` — 401 with the catalog
  * error envelope otherwise. With no credential the endpoint stays
  * open and the token route still answers (clients wired for auth
  * work unchanged). */
/** @param credentialVendor Polaris-style credential vending: when a
  *   client asks for delegated access (`X-Iceberg-Access-Delegation:
  *   vended-credentials`, the header stock Iceberg clients send when
  *   `header.X-Iceberg-Access-Delegation` is configured), loadTable
  *   responses include the provider's storage credentials for the
  *   table's location in the spec's two shapes — merged into `config`
  *   and as the `storage-credentials` array of `{prefix, config}`. In
  *   production the provider fronts STS/downscoped-token issuance
  *   (what Polaris does per table grant); tests use a static map.
  *   Absent provider or absent header → plain responses, the
  *   client's own filesystem credentials apply. */
class RestCatalogServer(spark: SparkSession, val warehouse: String,
                        port: Int = 0,
                        credential: Option[String] = None,
                        credentialVendor: Option[String => Map[String, String]] = None) {
  import RestCatalogServer._

  private val om = new ObjectMapper()
  private val started = new AtomicBoolean(false)
  private val ddlLock = new Object
  private var server: HttpServer = _
  /** token → expiry epoch-millis; the advertised `expires_in` is
    * honored (expired tokens 401) and expired entries are pruned on
    * access so the map stays bounded under repeated token exchanges. */
  private val issuedTokens =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] var tokenTtlMs = 3600L * 1000L // spec hook: shrink to test expiry
  /** Spec hook: fires (identifier, target version) right before each
    * transaction table publish, so a test can inject a concurrent
    * commit into the race window. Never set in production. */
  private[graft] var publishRaceHook: Option[(String, Int) => Unit] = None

  private def tokenValid(tok: String): Boolean = {
    val now = System.currentTimeMillis()
    issuedTokens.entrySet().removeIf(e => e.getValue < now)
    Option[java.lang.Long](issuedTokens.get(tok)).exists(_ >= now)
  }

  private def fs = new HPath(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def whPath(segments: Seq[String]): HPath =
    segments.foldLeft(new HPath(warehouse))((p, s) => new HPath(p, s))
  private def isTable(p: HPath): Boolean =
    fs.exists(new HPath(p, "_graft_log"))
  /** A REGISTERED foreign Iceberg table: a catalog pointer at an
    * existing metadata-location, no data or metadata copied
    * ([[registerTable]]). */
  private def isRegistered(p: HPath): Boolean =
    fs.exists(new HPath(p, IcebergPointerFile))
  private def isView(p: HPath): Boolean =
    graft.sources.GraftView.isView(fs, p)

  // ------------------------------------------- metrics reporting
  // The REST spec's `POST …/tables/{t}/metrics` route: stock clients
  // POST ScanReport/CommitReport payloads after every scan/commit.
  // Reports are held in a bounded per-table ring (newest win — this is
  // an observability surface, not a durability contract) and exposed
  // via [[metricsReports]] so an embedding control plane can read what
  // the fleet's readers actually scanned.
  private val MaxReportsPerTable = 100
  private val reports = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.ArrayDeque[String]]()

  /** The retained metrics reports for a table, newest last. */
  def metricsReports(ns: Seq[String], table: String): Seq[String] = {
    val q = reports.get((ns :+ table).mkString("\u0000"))
    if (q == null) Nil
    else q.synchronized {
      scala.jdk.CollectionConverters.IteratorHasAsScala(q.iterator)
        .asScala.toVector
    }
  }

  private def reportMetrics(x: HttpExchange, ns: Seq[String], name: String,
                            body: String): Unit = {
    val p = whPath(ns :+ name)
    if (!isTable(p) && !isRegistered(p))
      return error(x, 404, "NoSuchTableException",
        s"table ${ns.mkString(".")}.$name not found")
    val parsed = om.readTree(body)
    val rt = parsed.path("report-type").asText("")
    if (rt.isEmpty)
      return error(x, 400, "BadRequestException",
        "metrics report must carry report-type")
    val q = reports.computeIfAbsent((ns :+ name).mkString("\u0000"),
      _ => new java.util.ArrayDeque[String]())
    q.synchronized {
      q.addLast(body)
      while (q.size > MaxReportsPerTable) q.removeFirst()
    }
    headReply(x, 204)
  }
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
      // the token route is the ONLY unauthenticated surface when a
      // credential is configured (it IS the way in)
      if (segs != Seq("v1", "oauth", "tokens") && credential.isDefined) {
        val presented = Option(x.getRequestHeaders.getFirst("Authorization"))
          .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))
        if (!presented.exists(tokenValid))
          return error(x, 401, "NotAuthorizedException",
            "missing, unknown, or expired bearer token — POST " +
              "/v1/oauth/tokens with client credentials first")
      }
      (method, segs) match {
        case ("POST", Seq("v1", "oauth", "tokens")) =>
          oauthToken(x)

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
        case ("POST", Seq("v1", "namespaces", ns, "properties")) =>
          updateNamespaceProperties(x, decodeNs(ns), om.readTree(bodyOf(x)))

        case ("GET", Seq("v1", "namespaces", ns, "tables")) =>
          listTables(x, decodeNs(ns))
        case ("POST", Seq("v1", "namespaces", ns, "tables")) =>
          createTable(x, decodeNs(ns), om.readTree(bodyOf(x)))
        case ("GET", Seq("v1", "namespaces", ns, "tables", t)) =>
          loadTable(x, decodeNs(ns), dec(t))
        case ("POST", Seq("v1", "namespaces", ns, "tables", t)) =>
          commitTable(x, decodeNs(ns), dec(t), om.readTree(bodyOf(x)))
        case ("HEAD", Seq("v1", "namespaces", ns, "tables", t)) =>
          val p = whPath(decodeNs(ns) :+ dec(t))
          headReply(x, if (isTable(p) || isRegistered(p)) 204 else 404)
        case ("DELETE", Seq("v1", "namespaces", ns, "tables", t)) =>
          dropTable(x, decodeNs(ns), dec(t))
        case ("POST", Seq("v1", "tables", "rename")) =>
          renameTable(x, om.readTree(bodyOf(x)))
        case ("POST", Seq("v1", "transactions", "commit")) =>
          commitTransaction(x, om.readTree(bodyOf(x)))
        case ("POST", Seq("v1", "namespaces", ns, "register")) =>
          registerTable(x, decodeNs(ns), om.readTree(bodyOf(x)))
        case ("POST", Seq("v1", "namespaces", ns, "tables", t, "plan")) =>
          planTableScan(x, decodeNs(ns), dec(t), om.readTree(bodyOf(x)))
        case ("POST", Seq("v1", "namespaces", ns, "tables", t, "metrics")) =>
          reportMetrics(x, decodeNs(ns), dec(t), bodyOf(x))

        case ("GET", Seq("v1", "namespaces", ns, "views")) =>
          listViews(x, decodeNs(ns))
        case ("POST", Seq("v1", "namespaces", ns, "views")) =>
          createView(x, decodeNs(ns), om.readTree(bodyOf(x)))
        case ("GET", Seq("v1", "namespaces", ns, "views", v)) =>
          loadView(x, decodeNs(ns), dec(v))
        case ("POST", Seq("v1", "namespaces", ns, "views", v)) =>
          commitView(x, decodeNs(ns), dec(v), om.readTree(bodyOf(x)))
        case ("HEAD", Seq("v1", "namespaces", ns, "views", v)) =>
          headReply(x,
            if (isView(whPath(decodeNs(ns) :+ dec(v)))) 204 else 404)
        case ("DELETE", Seq("v1", "namespaces", ns, "views", v)) =>
          dropView(x, decodeNs(ns), dec(v))
        case ("POST", Seq("v1", "views", "rename")) =>
          renameView(x, om.readTree(bodyOf(x)))

        case _ => error(x, 404, "NotFoundException",
          s"no route: $method ${x.getRequestURI.getPath}")
      }
    } catch {
      case e: CatalogError =>
        error(x, e.code, e.typ, e.getMessage)
      case e: com.fasterxml.jackson.core.JacksonException =>
        error(x, 400, "BadRequestException", s"malformed JSON body: ${e.getMessage}")
      case NonFatal(e) =>
        error(x, 500, e.getClass.getSimpleName, String.valueOf(e.getMessage))
    } finally x.close()
  }

  // --------------------------------------------------- namespaces

  private def namespaceExists(ns: Seq[String]): Boolean = {
    val p = whPath(ns)
    ns.nonEmpty && isDir(p) && !isTable(p) && !isView(p) && !isRegistered(p)
  }

  private def listNamespaces(x: HttpExchange, parent: Seq[String]): Unit = {
    val dir = whPath(parent)
    if (parent.nonEmpty && !namespaceExists(parent))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(parent))
    val all =
      if (!isDir(dir)) Nil
      else fs.listStatus(dir).toSeq
        .filter(st => st.isDirectory && !isTable(st.getPath) &&
          !isView(st.getPath) && !isRegistered(st.getPath))
        .map(_.getPath.getName).sorted
    val (page, next) = paginate(x, all)
    val arr = om.createArrayNode()
    page.foreach { name =>
      val one = om.createArrayNode()
      (parent :+ name).foreach(one.add)
      arr.add(one)
    }
    val n = om.createObjectNode()
    n.set[JsonNode]("namespaces", arr)
    next.foreach(n.put("next-page-token", _))
    reply(x, 200, n)
  }

  private def createNamespace(x: HttpExchange, body: JsonNode): Unit = {
    val ns = jsonNs(body.get("namespace"))
    if (ns.isEmpty)
      return error(x, 400, "BadRequestException", "empty namespace")
    val props: Map[String, String] = Option(body.get("properties"))
      .filter(_.isObject).map(objFields(_).toMap).getOrElse(Map.empty)
    ddlLock.synchronized {
      if (namespaceExists(ns) || isTable(whPath(ns)))
        return error(x, 409, "AlreadyExistsException", nsMsg(ns) + " exists")
      fs.mkdirs(whPath(ns))
      if (props.nonEmpty) writeProps(new HPath(whPath(ns), NsPropsFile), props)
    }
    val n = om.createObjectNode()
    n.set[JsonNode]("namespace", nsArray(ns))
    n.set[JsonNode]("properties", propsNode(props))
    reply(x, 200, n)
  }

  private def loadNamespace(x: HttpExchange, ns: Seq[String]): Unit = {
    if (!namespaceExists(ns))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
    val n = om.createObjectNode()
    n.set[JsonNode]("namespace", nsArray(ns))
    n.set[JsonNode]("properties",
      propsNode(readProps(new HPath(whPath(ns), NsPropsFile))))
    reply(x, 200, n)
  }

  /** The spec's updateProperties route: apply `removals` +
    * `updates`, report which keys were `updated` / `removed` /
    * `missing` (a removal of an absent key). */
  private def updateNamespaceProperties(x: HttpExchange, ns: Seq[String],
                                        body: JsonNode): Unit = {
    if (!namespaceExists(ns))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
    val removals = Option(body.get("removals")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get(_).asText())).getOrElse(Nil)
    val updates = Option(body.get("updates")).filter(_.isObject)
      .map(objFields).getOrElse(Nil)
    val overlap = removals.toSet.intersect(updates.map(_._1).toSet)
    if (overlap.nonEmpty)
      return error(x, 400, "BadRequestException",
        s"keys in both removals and updates: ${overlap.mkString(", ")}")
    val file = new HPath(whPath(ns), NsPropsFile)
    ddlLock.synchronized {
      val cur = readProps(file)
      val (removed, missing) = removals.partition(cur.contains)
      writeProps(file, cur -- removals ++ updates)
      val n = om.createObjectNode()
      def strArr(ss: Seq[String]) = {
        val a = om.createArrayNode(); ss.foreach(a.add); a
      }
      n.set[JsonNode]("updated", strArr(updates.map(_._1)))
      n.set[JsonNode]("removed", strArr(removed))
      n.set[JsonNode]("missing", strArr(missing))
      reply(x, 200, n)
    }
  }

  private def dropNamespace(x: HttpExchange, ns: Seq[String]): Unit =
    ddlLock.synchronized {
      val dir = whPath(ns)
      if (!namespaceExists(ns))
        error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
      // the properties sidecar is catalog bookkeeping, not content
      else if (fs.listStatus(dir).exists(_.getPath.getName != NsPropsFile))
        error(x, 409, "NamespaceNotEmptyException", nsMsg(ns) + " is not empty")
      else { fs.delete(dir, true); headReply(x, 204) }
    }

  // ------------------------------------------------------- tables

  private def listTables(x: HttpExchange, ns: Seq[String]): Unit = {
    if (!namespaceExists(ns))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
    val all = fs.listStatus(whPath(ns)).toSeq
      .filter(st => isTable(st.getPath) || isRegistered(st.getPath))
      .map(_.getPath.getName).sorted
    val (page, next) = paginate(x, all)
    val arr = om.createArrayNode()
    page.foreach { name =>
      val id = om.createObjectNode()
      id.set[JsonNode]("namespace", nsArray(ns))
      id.put("name", name)
      arr.add(id)
    }
    val n = om.createObjectNode()
    n.set[JsonNode]("identifiers", arr)
    next.foreach(n.put("next-page-token", _))
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
    if (isRegistered(path)) return registeredJson(x, path)
    if (!isTable(path))
      return error(x, 404, "NoSuchTableException",
        s"table ${ns.mkString(".")}.$name not found")
    tableJson(x, ns, name, path)
  }

  /** REST spec registerTable: adopt an EXISTING Iceberg table into the
    * catalog by its metadata-location — nothing is copied; the catalog
    * records a pointer and serves loadTable (and server-side scan
    * planning) from the pointed-at metadata. The Polaris shape for
    * bringing storage-first tables under catalog control. */
  private def registerTable(x: HttpExchange, ns: Seq[String],
                            body: JsonNode): Unit = {
    if (!namespaceExists(ns))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
    val name = Option(body.get("name")).map(_.asText()).getOrElse(
      return error(x, 400, "BadRequestException", "missing table name"))
    val mloc = Option(body.get("metadata-location")).map(_.asText()).getOrElse(
      return error(x, 400, "BadRequestException", "missing metadata-location"))
    val mpath = new HPath(mloc)
    if (!fs.exists(mpath))
      return error(x, 400, "BadRequestException",
        s"metadata-location $mloc does not exist")
    val md = om.readTree(readAll(mpath))
    if (!md.has("format-version"))
      return error(x, 400, "BadRequestException",
        s"$mloc is not Iceberg table metadata (no format-version)")
    val dir = whPath(ns :+ name)
    ddlLock.synchronized {
      if (isTable(dir) || isRegistered(dir) || isView(dir))
        return error(x, 409, "AlreadyExistsException",
          s"table ${ns.mkString(".")}.$name exists")
      fs.mkdirs(dir)
      val ptr = om.createObjectNode()
      ptr.put("metadata-location", mloc)
      val out = fs.create(new HPath(dir, IcebergPointerFile), false)
      try out.write(om.writeValueAsBytes(ptr)) finally out.close()
    }
    registeredJson(x, dir)
  }

  /** (iceberg table root, CURRENT metadata-location) of a registered
    * table: the pointer names the adoption-time metadata file; commits
    * through this catalog publish `v<N+1>` beside it, so the current
    * version resolves from the same directory (max versioned file,
    * falling back to the pointed one). */
  private def registeredCurrent(dir: HPath): (String, HPath) = {
    import graft.sources.IcebergInterop.VMeta
    val ptr = om.readTree(readAll(new HPath(dir, IcebergPointerFile)))
    val pointed = new HPath(ptr.path("metadata-location").asText())
    val mdir = pointed.getParent
    val latest = fs.listStatus(mdir).toSeq.map(_.getPath.getName)
      .flatMap { case VMeta(v) => Some(v.toInt); case _ => None }
      .maxOption.map(v => new HPath(mdir, s"v$v.metadata.json"))
      .getOrElse(pointed)
    (mdir.getParent.toString, latest)
  }

  /** Did the client ask for vended credentials (the spec's
    * access-delegation header)? */
  private def wantsVending(x: HttpExchange): Boolean =
    Option(x.getRequestHeaders.getFirst("X-Iceberg-Access-Delegation"))
      .exists(_.split(",").map(_.trim).contains("vended-credentials"))

  /** Attach vended storage credentials for `location` to a
    * LoadTableResult: merged into `config` plus the spec's
    * `storage-credentials` array. No-op without a provider or without
    * the client's delegation header. */
  private def attachVendedCredentials(x: HttpExchange, n: ObjectNode,
                                      location: String): Unit =
    if (wantsVending(x)) credentialVendor.foreach { vend =>
      val creds = vend(location)
      val cfg = n.path("config") match {
        case o: ObjectNode => o
        case _ => n.putObject("config")
      }
      creds.toSeq.sortBy(_._1).foreach { case (k, v) => cfg.put(k, v) }
      val one = om.createObjectNode()
      one.put("prefix", location)
      val oneCfg = one.putObject("config")
      creds.toSeq.sortBy(_._1).foreach { case (k, v) => oneCfg.put(k, v) }
      n.putArray("storage-credentials").add(one): Unit
    }

  /** LoadTableResult for a registered table, from its CURRENT
    * metadata. */
  private def registeredJson(x: HttpExchange, dir: HPath): Unit = {
    val (root, mloc) = registeredCurrent(dir)
    val md = om.readTree(readAll(mloc))
    val n = om.createObjectNode()
    n.put("metadata-location", mloc.toString)
    n.set[JsonNode]("metadata", md)
    n.put("location", md.path("location").asText(root))
    n.set[JsonNode]("config", om.createObjectNode())
    attachVendedCredentials(x, n, md.path("location").asText(root))
    reply(x, 200, n)
  }

  /** The REST spec's planTableScan route (server-side scan planning):
    * answer a completed plan whose file-scan-tasks come from graft's
    * own metadata-only manifest walk + bounds pruning
    * ([[graft.sources.IcebergInterop.planIcebergScanTasks]]). Works on
    * registered foreign tables and on graft tables carrying real
    * Iceberg metadata (mirrors). The filter subset the server prunes
    * by is eq/lt/lt-eq/gt/gt-eq on a column + and; other filters plan
    * unpruned and echo back as each task's residual-filter (the spec's
    * client-reapplies contract). Delete-carrying snapshots serve their
    * live delete files in the response's `delete-files` (position,
    * equality, v3 deletion vectors) with every task referencing all of
    * them — the merge-on-read planning contract; the caller applies
    * them. */
  private def planTableScan(x: HttpExchange, ns: Seq[String], name: String,
                            body: JsonNode): Unit = {
    val path = whPath(ns :+ name)
    val root: String =
      if (isRegistered(path)) {
        registeredCurrent(path)._1
      } else if (isTable(path) &&
          fs.exists(new HPath(new HPath(path, "metadata"), "version-hint.text")))
        path.toString
      else if (isTable(path))
        return error(x, 400, "BadRequestException",
          s"table ${ns.mkString(".")}.$name carries no Iceberg metadata — " +
            "mirror it first (mirrorToIceberg) or read it as a graft table")
      else
        return error(x, 404, "NoSuchTableException",
          s"table ${ns.mkString(".")}.$name not found")
    val snapId = Option(body.get("snapshot-id")).filterNot(_.isNull)
      .map(_.asLong())
    val filterNode = Option(body.get("filter")).filterNot(_.isNull)
    val cond = filterNode.flatMap(filterToColumn)
    val plan =
      try graft.sources.IcebergInterop.planIcebergScanTasks(
        spark, root, snapId, cond)
      catch {
        case e: IllegalArgumentException =>
          return error(x, 400, "BadRequestException",
            String.valueOf(e.getMessage))
      }
    val n = om.createObjectNode()
    n.put("status", "completed")
    // the snapshot's delete files, with per-task references scoped per
    // the spec's application rules: equality deletes reference only
    // tasks with a STRICTLY SMALLER data sequence number (a row
    // re-inserted after the delete must survive — referencing it from
    // newer files would make a conforming client drop it), deletion
    // vectors reference only their named data file, and plain position
    // deletes reference every task (they key rows by file path, so a
    // foreign path matches nothing — a correct superset)
    val delArr = om.createArrayNode()
    plan.deleteFiles.foreach { d =>
      val dn = om.createObjectNode()
      dn.put("content",
        if (d.content == 2L) "equality-deletes" else "position-deletes")
      dn.put("file-path", d.path)
      dn.put("file-format", d.fileFormat.toLowerCase)
      dn.put("file-size-in-bytes", d.sizeBytes)
      dn.put("record-count", d.recordCount)
      if (d.equalityIds.nonEmpty) {
        val ids = dn.putArray("equality-ids")
        d.equalityIds.foreach(ids.add)
      }
      d.referencedDataFile.foreach(dn.put("referenced-data-file", _))
      d.contentOffset.foreach(dn.put("content-offset", _))
      d.contentSizeInBytes.foreach(dn.put("content-size-in-bytes", _))
      delArr.add(dn)
    }
    def refsFor(t: graft.sources.IcebergInterop.PlannedFile): Seq[Int] =
      plan.deleteFiles.zipWithIndex.collect {
        case (d, i) if d.content == 2L && t.seq < d.seq => i
        case (d, i) if d.content != 2L &&
            d.referencedDataFile.forall(_ == t.path) => i
      }
    val arr = om.createArrayNode()
    plan.dataFiles.foreach { t =>
      val task = om.createObjectNode()
      val dfn = task.putObject("data-file")
      dfn.put("spec-id", t.specId)
      dfn.put("content", "data")
      dfn.put("file-path", t.path)
      dfn.put("file-format", "parquet")
      // partition values typed per the spec's single-value
      // serialization (numbers as JSON numbers; date/timestamp/
      // decimal/hex renderings arrive as pre-rendered strings)
      val pn = dfn.putObject("partition")
      t.partition.foreach {
        case (k, v: java.lang.Integer) => pn.put(k, v.intValue())
        case (k, v: java.lang.Long) => pn.put(k, v.longValue())
        case (k, v: java.lang.Boolean) => pn.put(k, v.booleanValue())
        case (k, v: java.lang.Float) => pn.put(k, v.floatValue())
        case (k, v: java.lang.Double) => pn.put(k, v.doubleValue())
        case (k, v) => pn.put(k, v.toString)
      }
      dfn.put("file-size-in-bytes", t.sizeBytes)
      dfn.put("record-count", t.recordCount)
      val refs = task.putArray("delete-file-references")
      refsFor(t).foreach(refs.add)
      filterNode.foreach(f => task.set[JsonNode]("residual-filter", f))
      arr.add(task)
    }
    n.set[JsonNode]("file-scan-tasks", arr)
    n.set[JsonNode]("delete-files", delArr)
    n.putArray("plan-tasks")
    reply(x, 200, n)
  }

  /** Iceberg REST expression JSON → pruning Column (the subset the
    * server prunes by); None = no server pruning, residual echoes. */
  private def filterToColumn(n: JsonNode)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.col
    // integral numbers normalize to Long, floating to Double: a
    // narrower literal (Jackson Integer) against a wider column makes
    // the analyzer cast the LITERAL side, which the conservative bound
    // test cannot unwrap — the plan would silently stop pruning
    def value(v: JsonNode): Any =
      if (v.isIntegralNumber) v.asLong()
      else if (v.isNumber) v.asDouble()
      else if (v.isBoolean) v.asBoolean()
      else v.asText()
    n.path("type").asText() match {
      case "and" =>
        for {
          l <- filterToColumn(n.path("left"))
          r <- filterToColumn(n.path("right"))
        } yield l && r
      case op @ ("eq" | "lt" | "lt-eq" | "gt" | "gt-eq") =>
        val t = n.path("term")
        if (!t.isTextual) None
        else {
          val c = col(t.asText())
          val v = value(n.path("value"))
          Some(op match {
            case "eq" => c === v
            case "lt" => c < v
            case "lt-eq" => c <= v
            case "gt" => c > v
            case "gt-eq" => c >= v
          })
        }
      case _ => None
    }
  }

  /** The Iceberg REST commitTable route. Tables carrying REAL Iceberg
    * metadata (a mirror's `metadata/version-hint.text`) take the full
    * Iceberg-spec commit protocol — `requirements` validated against
    * the current metadata, `updates` applied in order, the new
    * `v<N+1>.metadata.json` published through the optimistic
    * conditional-put — so a STOCK Iceberg REST client (PyIceberg,
    * Spark) that wrote its data files, manifests, and manifest list
    * directly to storage can land its append here, the reference's
    * read-write Polaris shape (getting_started.py:82-99). Tables
    * without Iceberg metadata keep the legacy property-only commit
    * (`_graft_props.json` sidecar); their other update actions refuse
    * with 400 rather than pretending. */
  private def commitTable(x: HttpExchange, ns: Seq[String], name: String,
                          body: JsonNode): Unit = {
    val path = whPath(ns :+ name)
    if (isRegistered(path)) {
      // a REGISTERED table commits against its EXTERNAL metadata dir —
      // the adopted table is fully read-write through the catalog
      val updates = Option(body.get("updates")).filter(_.isArray)
        .map(a => (0 until a.size()).map(a.get)).getOrElse(Nil)
      return commitIcebergTable(x, ns, name, path,
        registeredCurrent(path)._2.getParent, body, updates)
    }
    if (!isTable(path))
      return error(x, 404, "NoSuchTableException",
        s"table ${ns.mkString(".")}.$name not found")
    val updates = Option(body.get("updates")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get)).getOrElse(Nil)
    val metaDir = new HPath(path, "metadata")
    if (fs.exists(new HPath(metaDir, "version-hint.text")))
      return commitIcebergTable(x, ns, name, path, metaDir, body, updates)
    val file = new HPath(path, TablePropsFile)
    ddlLock.synchronized {
      var props = readProps(file)
      updates.foreach { u =>
        u.path("action").asText() match {
          case "set-properties" =>
            props = props ++ objFields(u.path("updates"))
          case "remove-properties" =>
            val rm = Option(u.get("removals")).filter(_.isArray)
              .map(a => (0 until a.size()).map(a.get(_).asText())).getOrElse(Nil)
            props = props -- rm
          case other =>
            return error(x, 400, "BadRequestException",
              s"unsupported table update action '$other' — this catalog " +
                "commits properties; schema and data commit to the table log")
        }
      }
      writeProps(file, props)
    }
    tableJson(x, ns, name, path)
  }

  /** (current version, parsed metadata) of an Iceberg metadata dir —
    * throws the spec's 409 when the dir holds no versioned file. */
  private def currentIcebergMeta(metaDir: HPath,
      path: HPath): (Int, ObjectNode) = {
    import graft.sources.IcebergInterop.VMeta
    val curV = fs.listStatus(metaDir).toSeq.map(_.getPath.getName)
      .flatMap { case VMeta(v) => Some(v.toInt); case _ => None }
      .maxOption.getOrElse(throw CatalogError(409, "CommitFailedException",
        s"no versioned metadata at $path"))
    (curV, om.readTree(readAll(new HPath(metaDir, s"v$curV.metadata.json")))
      .asInstanceOf[ObjectNode])
  }

  /** The spec's commit `requirements`, validated against the current
    * metadata — throws CommitFailedException (409) on the first
    * mismatch, BadRequestException (400) on an unknown assertion. */
  private def checkCommitRequirements(md: ObjectNode,
      requirements: Seq[JsonNode], ident: String): Unit = {
    def fail(msg: String): Nothing =
      throw CatalogError(409, "CommitFailedException", msg)
    requirements.foreach { r =>
      r.path("type").asText() match {
        case "assert-table-uuid" =>
          val want = r.path("uuid").asText()
          if (md.path("table-uuid").asText() != want)
            fail(s"table uuid changed (now " +
              s"${md.path("table-uuid").asText()}, asserted $want)")
        case "assert-ref-snapshot-id" =>
          val ref = r.path("ref").asText()
          val want: Option[Long] =
            if (r.path("snapshot-id").isNull ||
                r.path("snapshot-id").isMissingNode) None
            else Some(r.path("snapshot-id").asLong())
          val have: Option[Long] = {
            val refs = md.path("refs")
            if (refs.has(ref))
              Some(refs.path(ref).path("snapshot-id").asLong())
            else if (ref == "main" &&
                md.path("current-snapshot-id").asLong(-1L) >= 0)
              Some(md.path("current-snapshot-id").asLong())
            else None
          }
          if (have != want)
            fail(s"ref '$ref' moved (now $have, asserted $want) " +
              "— refresh and retry")
        case "assert-current-schema-id" =>
          if (md.path("current-schema-id").asInt() !=
              r.path("current-schema-id").asInt())
            fail("current schema changed")
        case "assert-default-spec-id" =>
          if (md.path("default-spec-id").asInt() !=
              r.path("default-spec-id").asInt())
            fail("default partition spec changed")
        case "assert-last-assigned-field-id" =>
          if (md.path("last-column-id").asInt() !=
              r.path("last-assigned-field-id").asInt())
            fail("last assigned field id changed")
        case "assert-last-assigned-partition-id" =>
          if (md.path("last-partition-id").asInt() !=
              r.path("last-assigned-partition-id").asInt())
            fail("last assigned partition id changed")
        case "assert-create" =>
          fail(s"table $ident already exists")
        case other =>
          throw CatalogError(400, "BadRequestException",
            s"unknown commit requirement '$other'")
      }
    }
  }

  /** The spec's table `updates`, applied IN ORDER to the metadata node
    * (mutates `md`) — throws BadRequestException (400) on an
    * unsupported action. */
  private def applyTableUpdates(md: ObjectNode,
      updates: Seq[JsonNode]): Unit = {
    def arr(field: String): com.fasterxml.jackson.databind.node.ArrayNode =
      md.path(field) match {
        case a: com.fasterxml.jackson.databind.node.ArrayNode => a
        case _ => md.putArray(field)
      }
    def props(): ObjectNode =
      md.path("properties") match {
        case o: ObjectNode => o
        case _ => md.putObject("properties")
      }
    val now = System.currentTimeMillis()
    var lastAddedSchemaId: Option[Int] = None
    updates.foreach { u =>
      u.path("action").asText() match {
        case "assign-uuid" =>
          md.put("table-uuid", u.path("uuid").asText()): Unit
        case "upgrade-format-version" =>
          md.put("format-version", u.path("format-version").asInt()): Unit
        case "set-location" =>
          md.put("location", u.path("location").asText()): Unit
        case "set-properties" =>
          val ups = u.path("updates")
          val it = ups.fieldNames()
          val p = props()
          while (it.hasNext) { val k = it.next(); p.put(k, ups.path(k).asText()) }
        case "remove-properties" =>
          val p = props()
          Option(u.get("removals")).filter(_.isArray).foreach(a =>
            (0 until a.size()).foreach(i => p.remove(a.get(i).asText())))
        case "add-schema" =>
          val sc = u.path("schema")
          arr("schemas").add(sc)
          val sid = sc.path("schema-id").asInt()
          lastAddedSchemaId = Some(sid)
          if (u.has("last-column-id"))
            md.put("last-column-id",
              math.max(md.path("last-column-id").asInt(),
                u.path("last-column-id").asInt())): Unit
        case "set-current-schema" =>
          val sid = u.path("schema-id").asInt()
          md.put("current-schema-id",
            if (sid == -1) lastAddedSchemaId.getOrElse(
              throw CatalogError(400, "BadRequestException",
                "set-current-schema -1 without a prior add-schema"))
            else sid): Unit
        case "add-spec" =>
          arr("partition-specs").add(u.path("spec")): Unit
        case "set-default-spec" =>
          md.put("default-spec-id", u.path("spec-id").asInt()): Unit
        case "add-sort-order" =>
          arr("sort-orders").add(u.path("sort-order")): Unit
        case "set-default-sort-order" =>
          md.put("default-sort-order-id",
            u.path("sort-order-id").asInt()): Unit
        case "add-snapshot" =>
          val sn = u.path("snapshot")
          arr("snapshots").add(sn)
          if (sn.has("sequence-number"))
            md.put("last-sequence-number",
              math.max(md.path("last-sequence-number").asLong(0L),
                sn.path("sequence-number").asLong()))
          md.put("last-updated-ms",
            math.max(now, sn.path("timestamp-ms").asLong(now))): Unit
        case "set-snapshot-ref" =>
          val refName = u.path("ref-name").asText()
          val sid = u.path("snapshot-id").asLong()
          val refs = md.path("refs") match {
            case o: ObjectNode => o
            case _ => md.putObject("refs")
          }
          val entry = refs.putObject(refName)
          entry.put("snapshot-id", sid)
          entry.put("type", u.path("type").asText("branch"))
          if (refName == "main") {
            md.put("current-snapshot-id", sid)
            val logEntry = om.createObjectNode()
            logEntry.put("timestamp-ms", now)
            logEntry.put("snapshot-id", sid)
            arr("snapshot-log").add(logEntry): Unit
          }
        case "remove-snapshot-ref" =>
          md.path("refs") match {
            case o: ObjectNode =>
              o.remove(u.path("ref-name").asText()): Unit
            case _ => ()
          }
        case other =>
          throw CatalogError(400, "BadRequestException",
            s"unsupported table update action '$other'")
      }
    }
  }

  /** Iceberg-spec commit: validate `requirements` against the current
    * metadata, apply `updates` in order, publish `v<N+1>` through the
    * conditional-put (a lost race is the spec's 409
    * CommitFailedException — the client re-reads and retries), reply
    * with the CommitTableResponse (`metadata-location` + `metadata`).
    * The read→check→publish runs under the SAME `ddlLock` the
    * multi-table transaction holds: an in-server single-table commit
    * can therefore never interleave with a transaction's stage/
    * publish/rollback window (it would otherwise publish v<N+2> on
    * top of a transaction version the rollback then deletes, letting
    * aborted updates survive). Cross-server racers still land on the
    * conditional put. */
  private def commitIcebergTable(x: HttpExchange, ns: Seq[String],
      name: String, path: HPath, metaDir: HPath, body: JsonNode,
      updates: Seq[JsonNode]): Unit = ddlLock.synchronized {
    val (curV, md) = currentIcebergMeta(metaDir, path)
    val requirements = Option(body.get("requirements")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get)).getOrElse(Nil)
    checkCommitRequirements(md, requirements, s"${ns.mkString(".")}.$name")
    applyTableUpdates(md, updates)
    // ---- optimistic publish: the conditional put IS the commit ----
    val newLoc = new HPath(metaDir, s"v${curV + 1}.metadata.json")
    try {
      new graft.sources.TableIO(path.toString,
        spark.sparkContext.hadoopConfiguration).writeExclusive(newLoc,
        om.writerWithDefaultPrettyPrinter().writeValueAsBytes(md))
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        return error(x, 409, "CommitFailedException",
          s"version ${curV + 1} was committed concurrently — " +
            "refresh and retry")
    }
    graft.sources.IcebergInterop.publishHint(fs, metaDir, curV + 1)
    val n = om.createObjectNode()
    n.put("metadata-location", newLoc.toString)
    n.set[JsonNode]("metadata", md)
    reply(x, 200, n)
  }

  /** The spec's multi-table transaction (`POST /v1/transactions/commit`
    * — the Polaris atomic-commit surface): EVERY table-change's
    * requirements validate against current metadata and every update
    * list applies cleanly BEFORE any table publishes; then all
    * `v<N+1>` files publish behind the server's mutex, and a lost
    * conditional-put race rolls back the already-published versions
    * (and their hints) so no partial transaction survives — 409, the
    * client refreshes and retries. All-or-nothing with respect to
    * FINAL state; a concurrent reader racing the rollback window can
    * observe a not-yet-rolled-back version, the same exposure any
    * storage-backed catalog without a transactional store has. */
  private def commitTransaction(x: HttpExchange, body: JsonNode): Unit = {
    val changes = Option(body.get("table-changes")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get)).getOrElse(Nil)
    if (changes.isEmpty)
      return error(x, 400, "BadRequestException",
        "transaction carries no table-changes")
    case class Staged(ident: String, path: HPath, metaDir: HPath,
                      curV: Int, md: ObjectNode)
    ddlLock.synchronized {
      val staged = changes.map { ch =>
        val idNode = ch.path("identifier")
        val tns = jsonNs(idNode.get("namespace"))
        val name = idNode.path("name").asText("")
        val ident = (tns :+ name).mkString(".")
        if (name.isEmpty)
          throw CatalogError(400, "BadRequestException",
            "table-change missing identifier.name")
        val path = whPath(tns :+ name)
        val metaDir =
          if (isRegistered(path)) registeredCurrent(path)._2.getParent
          else if (isTable(path) && fs.exists(new HPath(
              new HPath(path, "metadata"), "version-hint.text")))
            new HPath(path, "metadata")
          else if (isTable(path))
            throw CatalogError(400, "BadRequestException",
              s"table $ident carries no Iceberg metadata — mirror it first")
          else throw CatalogError(404, "NoSuchTableException",
            s"table $ident not found")
        val (curV, md) = currentIcebergMeta(metaDir, path)
        def listOf(field: String): Seq[JsonNode] =
          Option(ch.get(field)).filter(_.isArray)
            .map(a => (0 until a.size()).map(a.get)).getOrElse(Nil)
        checkCommitRequirements(md, listOf("requirements"), ident)
        applyTableUpdates(md, listOf("updates"))
        Staged(ident, path, metaDir, curV, md)
      }
      // one metadata lineage per transaction entry: two changes to the
      // same table would each publish curV+1 and self-conflict
      if (staged.map(_.metaDir.toString).distinct.size != staged.size)
        throw CatalogError(400, "BadRequestException",
          "a table appears twice in the transaction — merge its changes")
      val published = scala.collection.mutable.Buffer[(Staged, HPath)]()
      try staged.foreach { s =>
        val loc = new HPath(s.metaDir, s"v${s.curV + 1}.metadata.json")
        // test seam: lets a spec land a concurrent writer's version in
        // the exact stage-to-publish window (unreachable from outside
        // the locked section in any other deterministic way)
        publishRaceHook.foreach(_(s.ident, s.curV + 1))
        new graft.sources.TableIO(s.path.toString,
          spark.sparkContext.hadoopConfiguration).writeExclusive(loc,
          om.writerWithDefaultPrettyPrinter().writeValueAsBytes(s.md))
        published += ((s, loc))
      } catch {
        // ANY publish failure rolls the whole transaction back — a
        // partial transaction must never survive, whatever the cause
        case e: Throwable =>
          published.foreach { case (_, loc) =>
            try fs.delete(loc, false) catch { case _: Exception => () }
          }
          e match {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw CatalogError(409, "CommitFailedException",
                "a table version was committed concurrently — the whole " +
                  "transaction rolled back; refresh and retry")
            case other => throw other
          }
      }
      published.foreach { case (s, _) =>
        graft.sources.IcebergInterop.publishHint(fs, s.metaDir, s.curV + 1)
      }
    }
    headReply(x, 204)
  }

  private def tableJson(x: HttpExchange, ns: Seq[String], name: String,
                        path: HPath): Unit = {
    val t = GraftTable.load(spark, path.toString)
    val latest = t.latestVersion()
    val n = om.createObjectNode()
    n.put("location", path.toString)
    n.put("schema-json", t.commitAt(latest).schemaJson)
    n.put("latest-version", latest)
    n.set[JsonNode]("properties", propsNode(readProps(
      new HPath(path, TablePropsFile))))
    // Iceberg-client compatibility: a mirrorToIceberg'd table carries
    // REAL Iceberg metadata under <root>/metadata — serve the spec's
    // LoadTableResult fields (`metadata-location` + embedded
    // `metadata`) so a stock Iceberg REST client can plan its own scan
    // from this response, the reference's Polaris loadTable shape
    val metaDir = new HPath(path, "metadata")
    val hint = new HPath(metaDir, "version-hint.text")
    if (fs.exists(hint)) {
      val v = new String(readAll(hint), StandardCharsets.UTF_8).trim
      val mloc = new HPath(metaDir, s"v$v.metadata.json")
      if (fs.exists(mloc)) {
        n.put("metadata-location", mloc.toString)
        n.set[JsonNode]("metadata", om.readTree(readAll(mloc)))
        n.set[JsonNode]("config", om.createObjectNode())
      }
    }
    attachVendedCredentials(x, n, path.toString)
    reply(x, 200, n)
  }

  private def dropTable(x: HttpExchange, ns: Seq[String], name: String): Unit =
    ddlLock.synchronized {
      val path = whPath(ns :+ name)
      // dropping a REGISTERED table removes only the catalog pointer
      // dir — the adopted table's own metadata and data are elsewhere
      // and stay untouched (the spec's non-purging drop)
      if (!isTable(path) && !isRegistered(path))
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

  // -------------------------------------------------------- views

  /** The Iceberg REST views route group the reference's Polaris ships
    * (k8s/polaris/, 01_polaris_demo.ipynb): list/create/load/commit/
    * drop/rename over the versioned [[graft.sources.GraftView]] store.
    * Payload profile matches the table routes (the spec's route and
    * envelope shapes; `graft:schema-json` carries a Spark StructType
    * where Polaris speaks Iceberg schema JSON). Every metadata change
    * publishes `v<N+1>` through the same optimistic conditional put
    * the table commits use — a conflicting replace surfaces as the
    * spec's 409 CommitFailedException even across two servers on one
    * warehouse. */
  private def listViews(x: HttpExchange, ns: Seq[String]): Unit = {
    if (!namespaceExists(ns))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
    val all = fs.listStatus(whPath(ns)).toSeq
      .filter(st => isView(st.getPath)).map(_.getPath.getName).sorted
    val (page, next) = paginate(x, all)
    val arr = om.createArrayNode()
    page.foreach { name =>
      val id = om.createArrayNode()
      val o = om.createObjectNode()
      o.set[JsonNode]("namespace", nsArray(ns))
      o.put("name", name)
      arr.add(o)
      id
    }
    val n = om.createObjectNode()
    n.set[JsonNode]("identifiers", arr)
    next.foreach(n.put("next-page-token", _))
    reply(x, 200, n)
  }

  private def conf = spark.sparkContext.hadoopConfiguration

  private def viewJson(x: HttpExchange, root: HPath): Unit = {
    import graft.sources.GraftView
    GraftView.load(conf, root.toString) match {
      case None => error(x, 404, "NoSuchViewException",
        s"view at $root not found")
      case Some((fileV, meta)) =>
        val n = om.createObjectNode()
        n.put("metadata-location", new HPath(new HPath(root,
          GraftView.MetaDir), s"v$fileV.metadata.json").toString)
        n.set[JsonNode]("metadata", GraftView.toJson(meta))
        n.set[JsonNode]("config", om.createObjectNode())
        reply(x, 200, n)
    }
  }

  private def createView(x: HttpExchange, ns: Seq[String],
                         body: JsonNode): Unit = {
    import graft.sources.GraftView
    if (!namespaceExists(ns))
      return error(x, 404, "NoSuchNamespaceException", nsMsg(ns))
    val name = Option(body.get("name")).map(_.asText()).getOrElse(
      return error(x, 400, "BadRequestException", "missing view name"))
    val vv = body.path("view-version")
    if (vv.isMissingNode || !vv.path("representations").isArray)
      return error(x, 400, "BadRequestException",
        "missing view-version with representations")
    val root = whPath(ns :+ name)
    if (isTable(root))
      return error(x, 409, "AlreadyExistsException",
        s"table ${ns.mkString(".")}.$name exists")
    val version0 =
      try GraftView.versionFromJson(vv)
      catch {
        case e: IllegalArgumentException =>
          return error(x, 400, "BadRequestException", e.getMessage)
      }
    val version = version0.copy(
      versionId = if (version0.versionId > 0) version0.versionId else 1,
      schemaJson = version0.schemaJson.orElse(
        Option(body.get("graft:schema-json")).map(_.asText())))
    val props = Option(body.get("properties")).filter(_.isObject)
      .map(objFields(_).toMap).getOrElse(Map.empty)
    val meta = GraftView.Meta(GraftView.newUuid(), root.toString,
      version.versionId, Seq(version), props,
      Seq((version.timestampMs, version.versionId)))
    try GraftView.publish(conf, root.toString, 1, meta)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        return error(x, 409, "AlreadyExistsException",
          s"view ${ns.mkString(".")}.$name exists")
    }
    viewJson(x, root)
  }

  private def loadView(x: HttpExchange, ns: Seq[String],
                       name: String): Unit =
    viewJson(x, whPath(ns :+ name))

  /** The spec's commitView: `requirements` (assert-view-uuid) checked
    * against the current metadata, `updates` applied in order, the new
    * file version published through the conditional put — a lost race
    * is the spec's 409 CommitFailedException. */
  private def commitView(x: HttpExchange, ns: Seq[String], name: String,
                         body: JsonNode): Unit = {
    import graft.sources.GraftView
    val root = whPath(ns :+ name)
    val (fileV, meta0) = GraftView.load(conf, root.toString).getOrElse(
      return error(x, 404, "NoSuchViewException",
        s"view ${ns.mkString(".")}.$name not found"))
    val requirements = Option(body.get("requirements")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get)).getOrElse(Nil)
    requirements.foreach { r =>
      r.path("type").asText() match {
        case "assert-view-uuid" =>
          val want = r.path("uuid").asText()
          if (meta0.uuid != want)
            return error(x, 409, "CommitFailedException",
              s"view uuid changed (now ${meta0.uuid}, asserted $want)")
        case other =>
          return error(x, 400, "BadRequestException",
            s"unknown view commit requirement '$other'")
      }
    }
    var meta = meta0
    var lastAdded: Option[Int] = None
    val updates = Option(body.get("updates")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get)).getOrElse(Nil)
    updates.foreach { u =>
      u.path("action").asText() match {
        case "assign-uuid" =>
          meta = meta.copy(uuid = u.path("uuid").asText())
        case "set-location" =>
          meta = meta.copy(location = u.path("location").asText())
        case "set-properties" =>
          meta = meta.copy(properties =
            meta.properties ++ objFields(u.path("updates")))
        case "remove-properties" =>
          val rm = Option(u.get("removals")).filter(_.isArray)
            .map(a => (0 until a.size()).map(a.get(_).asText()))
            .getOrElse(Nil)
          meta = meta.copy(properties = meta.properties -- rm)
        case "upgrade-format-version" =>
          if (u.path("format-version").asInt() != 1)
            return error(x, 400, "BadRequestException",
              "only view format-version 1 is supported")
        case "add-schema" => () // graft schemas ride the version payload
        case "add-view-version" =>
          val v0 =
            try GraftView.versionFromJson(u.path("view-version"))
            catch {
              case e: IllegalArgumentException =>
                return error(x, 400, "BadRequestException", e.getMessage)
            }
          val nextId =
            if (v0.versionId > 0) v0.versionId
            else meta.versions.map(_.versionId).max + 1
          if (meta.versions.exists(_.versionId == nextId))
            return error(x, 409, "CommitFailedException",
              s"view version $nextId already exists")
          meta = meta.copy(versions =
            meta.versions :+ v0.copy(versionId = nextId))
          lastAdded = Some(nextId)
        case "set-current-view-version" =>
          val id = u.path("view-version-id").asInt()
          val target =
            if (id == -1) lastAdded.getOrElse(
              return error(x, 400, "BadRequestException",
                "set-current-view-version -1 without a prior " +
                  "add-view-version"))
            else id
          if (!meta.versions.exists(_.versionId == target))
            return error(x, 400, "BadRequestException",
              s"no view version $target")
          meta = meta.copy(currentVersionId = target,
            versionLog = meta.versionLog :+
              ((GraftView.nowMs(), target)))
        case other =>
          return error(x, 400, "BadRequestException",
            s"unsupported view update action '$other'")
      }
    }
    try GraftView.publish(conf, root.toString, fileV + 1, meta)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        return error(x, 409, "CommitFailedException",
          s"view metadata version ${fileV + 1} was committed " +
            "concurrently — refresh and retry")
    }
    viewJson(x, root)
  }

  private def dropView(x: HttpExchange, ns: Seq[String],
                       name: String): Unit =
    ddlLock.synchronized {
      val p = whPath(ns :+ name)
      if (!isView(p))
        error(x, 404, "NoSuchViewException",
          s"view ${ns.mkString(".")}.$name not found")
      else { fs.delete(p, true); headReply(x, 204) }
    }

  private def renameView(x: HttpExchange, body: JsonNode): Unit = {
    if (!body.path("source").isObject || !body.path("destination").isObject ||
        !body.path("source").has("name") ||
        !body.path("destination").has("name"))
      return error(x, 400, "BadRequestException",
        "rename needs source and destination identifiers")
    def identOf(n: JsonNode) =
      (jsonNs(n.get("namespace")), n.get("name").asText())
    val (srcNs, srcName) = identOf(body.get("source"))
    val (dstNs, dstName) = identOf(body.get("destination"))
    ddlLock.synchronized {
      val src = whPath(srcNs :+ srcName)
      val dst = whPath(dstNs :+ dstName)
      if (!isView(src))
        error(x, 404, "NoSuchViewException",
          s"view ${srcNs.mkString(".")}.$srcName not found")
      else if (!namespaceExists(dstNs))
        error(x, 404, "NoSuchNamespaceException", nsMsg(dstNs))
      else if (isView(dst) || isTable(dst))
        error(x, 409, "AlreadyExistsException",
          s"${dstNs.mkString(".")}.$dstName exists")
      else {
        require(fs.rename(src, dst), s"rename $src -> $dst failed")
        headReply(x, 204)
      }
    }
  }

  // ----------------------------------------------------------- auth

  /** RFC 6749 client-credentials grant (the handshake the reference's
    * sessions run against Polaris before any catalog call): form body
    * `grant_type=client_credentials&client_id=…&client_secret=…`
    * (scope accepted and echoed). Wrong grant type or credentials get
    * the RFC's OAuth error JSON; success mints an opaque bearer token
    * this server honors until its advertised expiry. */
  private def oauthToken(x: HttpExchange): Unit = {
    val form = bodyOf(x).split("&").filter(_.nonEmpty).map(_.split("=", 2))
      .map { case Array(k, v) => RestCatalogServer.dec(k) -> RestCatalogServer.dec(v)
             case Array(k) => RestCatalogServer.dec(k) -> "" }.toMap
    def oauthError(code: Int, err: String, desc: String): Unit = {
      val n = om.createObjectNode()
      n.put("error", err)
      n.put("error_description", desc)
      reply(x, code, n)
    }
    if (!form.get("grant_type").contains("client_credentials"))
      return oauthError(400, "unsupported_grant_type",
        "only client_credentials is supported")
    // Basic auth carries id:secret too (either form is spec-legal)
    val basic = Option(x.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Basic ")).map(h => new String(
        java.util.Base64.getDecoder.decode(h.stripPrefix("Basic ")),
        StandardCharsets.UTF_8))
    val presented = (form.get("client_id"), form.get("client_secret")) match {
      case (Some(id), Some(sec)) => Some(s"$id:$sec")
      case _ => basic
    }
    credential match {
      case Some(want) if !presented.contains(want) =>
        return oauthError(401, "invalid_client", "unknown client credentials")
      case _ => ()
    }
    val token = java.util.UUID.randomUUID().toString.replace("-", "")
    issuedTokens.put(token, System.currentTimeMillis() + tokenTtlMs)
    val n = om.createObjectNode()
    n.put("access_token", token)
    n.put("token_type", "bearer")
    n.put("expires_in", (tokenTtlMs / 1000L).toInt)
    form.get("scope").foreach(n.put("scope", _))
    reply(x, 200, n)
  }

  // -------------------------------------------------------- plumbing

  /** Page a sorted listing by the spec's `pageToken`/`pageSize` query
    * params: the token is the last name already delivered (names added
    * or dropped between pages behave sanely under sort order), and the
    * response carries `next-page-token` only when more remain. No
    * params → the whole listing, unpaged. */
  private def paginate(x: HttpExchange,
                       sorted: Seq[String]): (Seq[String], Option[String]) = {
    val after = Option(query(x, "pageToken")).map(RestCatalogServer.dec)
      .filter(_.nonEmpty)
    val size = Option(query(x, "pageSize")).map(_.toInt)
    val fromToken = after match {
      case Some(tok) => sorted.dropWhile(_ <= tok)
      case None => sorted
    }
    size match {
      case Some(k) if fromToken.size > k =>
        val page = fromToken.take(k)
        (page, Some(page.last))
      case _ => (fromToken, None)
    }
  }

  private def objFields(n: JsonNode): Seq[(String, String)] =
    if (n == null || !n.isObject) Nil
    else {
      val it = n.fields()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> e.getValue.asText()
      }
      b.result()
    }

  private def propsNode(props: Map[String, String]): ObjectNode = {
    val n = om.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
    n
  }

  private def readAll(p: HPath): Array[Byte] = {
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  private def readProps(file: HPath): Map[String, String] =
    if (!fs.exists(file)) Map.empty
    else objFields(om.readTree(readAll(file))).toMap

  private def writeProps(file: HPath, props: Map[String, String]): Unit = {
    val out = fs.create(file, true)
    try out.write(om.writeValueAsBytes(propsNode(props))) finally out.close()
  }

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

  /** Filenames of the catalog's property sidecars. */
  private[rest] val NsPropsFile = ".graft_ns_props.json"
  private[rest] val TablePropsFile = "_graft_props.json"
  private[rest] val IcebergPointerFile = "_graft_iceberg_pointer.json"

  /** A catalog error carried as an exception so shared validation
    * helpers can abort any route; `handle` renders it as the spec's
    * error envelope. */
  private[rest] final case class CatalogError(code: Int, typ: String,
      msg: String) extends RuntimeException(msg)
}
