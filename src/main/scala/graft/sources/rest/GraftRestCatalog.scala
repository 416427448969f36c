package graft.sources.rest

import java.nio.charset.StandardCharsets
import java.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.GraftTable
import graft.sources.v2.{GraftCatalog, GraftSparkTable}

/** Spark catalog plugin CLIENT for a [[RestCatalogServer]] — the
  * `type=rest` session wiring the reference uses for its Polaris
  * catalog (docker/spark-notebook/getting_started.py:82-95: every
  * session gets `type=rest` + `uri=…`; 01_polaris_demo.ipynb), pointed
  * at graft's own catalog service:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.g", "graft.sources.rest.GraftRestCatalog")
  *   spark.conf.set("spark.sql.catalog.g.type", "rest")
  *   spark.conf.set("spark.sql.catalog.g.uri", "http://host:8181")
  *   spark.sql("CREATE TABLE g.db.t (id BIGINT) USING graft")   // via HTTP
  *   spark.table("g.db.t")                                      // data: direct
  * }}}
  *
  * Split of responsibilities (the Iceberg REST model): all CATALOG
  * questions — what namespaces/tables exist, create/drop/rename, load
  * — are one small HTTP call each, so any number of sessions (or
  * engines) share one source of truth; DATA reads and commits go
  * directly against the table root the service returns, and concurrent
  * writers stay exactly-once through the table format's optimistic
  * exclusive-put commit protocol — a DDL race lost at the service
  * surfaces as the server's 409, re-thrown here as the same typed
  * exceptions the in-process [[GraftCatalog]] throws. ALTER TABLE and
  * time travel operate on the loaded table root (table-log commits are
  * themselves optimistic; the catalog service only brokers existence,
  * exactly like Polaris with Iceberg metadata-location pointers). */
class GraftRestCatalog extends TableCatalog with SupportsNamespaces
  with ViewCatalog {
  import RestCatalogServer.{dec => _, _}

  private val om = new ObjectMapper()
  private var catalogName: String = _
  private var uri: String = _
  private var bearerToken: Option[String] = None
  private var pageSize: Option[Int] = None
  private def spark = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    Option(options.get("type")).foreach(t => require(t == "rest",
      s"catalog $name: graft.sources.rest.GraftRestCatalog serves type=rest, got type=$t"))
    uri = Option(options.get("uri")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option spark.sql.catalog.$name.uri"))
    pageSize = Option(options.get("page-size")).map(_.toInt)
    // auth handshake first when configured the reference's way
    // (getting_started.py:82-99: `credential=id:secret` [+ optional
    // `scope`, `oauth2-server-uri`]): exchange client credentials for
    // a bearer token, carried on every subsequent request
    Option(options.get("credential")).foreach { cred =>
      val tokenUri = Option(options.get("oauth2-server-uri"))
        .map(_.stripSuffix("/")).getOrElse(uri + "/v1/oauth/tokens")
      val Array(id, secret) = cred.split(":", 2)
      val scope = Option(options.get("scope")).getOrElse("PRINCIPAL_ROLE:ALL")
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      val form = s"grant_type=client_credentials&client_id=${enc(id)}" +
        s"&client_secret=${enc(secret)}&scope=${enc(scope)}"
      val (code, body) = httpRaw("POST", tokenUri, form,
        "application/x-www-form-urlencoded")
      require(code == 200, s"catalog $name: token exchange at $tokenUri " +
        s"failed (HTTP $code): ${body.path("error_description").asText("")}")
      bearerToken = Some(body.path("access_token").asText())
    }
    // fetch /v1/config up front (the Iceberg REST client handshake):
    // fails fast on a dead endpoint and verifies it speaks this protocol
    val (code, body) = http("GET", "/v1/config")
    require(code == 200 && body.path("overrides").has("graft-rest-catalog"),
      s"catalog $name: $uri is not a graft REST catalog endpoint (HTTP $code)")
  }
  override def name(): String = catalogName

  // ------------------------------------------------------------ HTTP

  /** One request; returns (status, parsed JSON body — MissingNode on
    * empty 204/404 bodies). */
  private def http(method: String, path: String,
                   body: Option[JsonNode] = None): (Int, JsonNode) =
    httpRaw(method, uri + path, body.map(om.writeValueAsString).orNull,
      "application/json")

  private def httpRaw(method: String, fullUri: String, body: String,
                      contentType: String): (Int, JsonNode) = {
    val conn = new java.net.URL(fullUri).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      bearerToken.foreach(t =>
        conn.setRequestProperty("Authorization", s"Bearer $t"))
      Option(body).foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", contentType)
        conn.getOutputStream.write(b.getBytes(StandardCharsets.UTF_8))
        conn.getOutputStream.close()
      }
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text =
        if (stream == null) ""
        else new String(stream.readAllBytes(), StandardCharsets.UTF_8)
      (code, if (text.isEmpty) om.missingNode() else om.readTree(text))
    } finally conn.disconnect()
  }

  /** Drain a paged listing: collect `field`'s elements across pages,
    * following `next-page-token` until the server stops returning one
    * (one round trip total for unpaged responses). `base` must already
    * carry its own query params if it has any (`sep` is `?` or `&`). */
  private def pagedList(base: String, sep: String, field: String,
                        ident: => Either[Seq[String], Identifier]): Seq[JsonNode] = {
    val out = Seq.newBuilder[JsonNode]
    var token: Option[String] = None
    var more = true
    val sized = pageSize.map(k => base + sep + s"pageSize=$k").getOrElse(base)
    val tokenSep = if (pageSize.isDefined || sep == "&") "&" else "?"
    while (more) {
      val q = token.map(t =>
        tokenSep + "pageToken=" + java.net.URLEncoder.encode(t, "UTF-8"))
        .getOrElse("")
      val (code, body) = http("GET", sized + q)
      expect(code, body, ident) {
        out ++= body.path(field).iterator().asScalaSeq
      }
      token = Option(body.get("next-page-token")).map(_.asText()).filter(_.nonEmpty)
      more = token.isDefined
    }
    out.result()
  }

  private def nsPath(ns: Seq[String]): String = "/v1/namespaces/" + encodeNs(ns)
  private def tblPath(ident: Identifier): String =
    nsPath(ident.namespace().toSeq) + "/tables/" +
      java.net.URLEncoder.encode(ident.name(), "UTF-8")

  private def errMsg(body: JsonNode): String =
    body.path("error").path("message").asText("catalog service error")

  /** Common status → typed-exception mapping; `onOk` handles 2xx. */
  private def expect[T](code: Int, body: JsonNode,
                        ident: => Either[Seq[String], Identifier])(onOk: => T): T =
    code match {
      case ok if ok / 100 == 2 => onOk
      case 404 => ident match {
        case Left(ns) => throw new NoSuchNamespaceException(ns.toArray)
        case Right(id) =>
          if (body.path("error").path("type").asText() == "NoSuchNamespaceException")
            throw new NoSuchNamespaceException(id.namespace())
          else throw new NoSuchTableException(id)
      }
      case 409 => ident match {
        case Left(ns) => throw new IllegalStateException(errMsg(body))
        case Right(id) => throw new TableAlreadyExistsException(id)
      }
      case other => throw new IllegalStateException(
        s"catalog service $uri: HTTP $other — ${errMsg(body)}")
    }

  // ------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] =
    pagedList("/v1/namespaces", "?", "namespaces", Left(Nil))
      .map(n => (0 until n.size()).map(n.get(_).asText()).toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    pagedList("/v1/namespaces?parent=" + encodeNs(namespace.toSeq), "&",
        "namespaces", Left(namespace.toSeq))
      .map(n => (0 until n.size()).map(n.get(_).asText()).toArray).toArray

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    val (code, body) = http("GET", nsPath(namespace.toSeq))
    expect(code, body, Left(namespace.toSeq)) {
      val m = new util.HashMap[String, String]()
      val it = body.path("properties").fields()
      while (it.hasNext) {
        val e = it.next()
        m.put(e.getKey, e.getValue.asText())
      }
      m
    }
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val b = om.createObjectNode()
    val arr = om.createArrayNode()
    namespace.foreach(arr.add)
    b.set[JsonNode]("namespace", arr)
    val props = om.createObjectNode()
    metadata.forEach((k, v) => props.put(k, v): Unit)
    b.set[JsonNode]("properties", props)
    val (code, body) = http("POST", "/v1/namespaces", Some(b))
    // CREATE NAMESPACE IF NOT EXISTS reaches the catalog unconditionally;
    // 409 here is the namespace-exists signal Spark expects as a throw
    if (code == 409) throw new org.apache.spark.sql.catalyst.analysis
      .NamespaceAlreadyExistsException(namespace)
    expect(code, body, Left(namespace.toSeq))(())
  }

  /** SET/UNSET namespace properties ride the spec's updateProperties
    * route; other namespace changes have no graft meaning. */
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit = {
    val updates = om.createObjectNode()
    val removals = om.createArrayNode()
    changes.foreach {
      case s: NamespaceChange.SetProperty =>
        updates.put(s.property(), s.value()): Unit
      case r: NamespaceChange.RemoveProperty =>
        removals.add(r.property()): Unit
      case other => throw new UnsupportedOperationException(
        s"ALTER NAMESPACE change $other not supported")
    }
    val b = om.createObjectNode()
    b.set[JsonNode]("updates", updates)
    b.set[JsonNode]("removals", removals)
    val (code, body) =
      http("POST", nsPath(namespace.toSeq) + "/properties", Some(b))
    expect(code, body, Left(namespace.toSeq))(())
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    http("HEAD", nsPath(namespace.toSeq))._1 == 204

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (cascade) {
      // Spark's cascade contract covers the whole subtree: child
      // namespaces drop (recursively) before their parent, tables
      // before their namespace — otherwise the server's 409
      // NamespaceNotEmpty surfaces as a bare IllegalStateException
      listNamespaces(namespace).foreach(dropNamespace(_, cascade = true))
      listTables(namespace).foreach(dropTable)
    }
    val (code, body) = http("DELETE", nsPath(namespace.toSeq))
    if (code == 404) false
    else expect(code, body, Left(namespace.toSeq))(true)
  }

  // --------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] =
    pagedList(nsPath(namespace.toSeq) + "/tables", "?", "identifiers",
        Left(namespace.toSeq)).map { id =>
      val ns = id.path("namespace")
      Identifier.of((0 until ns.size()).map(ns.get(_).asText()).toArray,
        id.path("name").asText())
    }.toArray

  override def tableExists(ident: Identifier): Boolean =
    http("HEAD", tblPath(ident))._1 == 204

  /** Load via the service; data access then runs directly against the
    * returned table root. */
  private def location(ident: Identifier): String = {
    val (code, body) = http("GET", tblPath(ident))
    expect(code, body, Right(ident))(body.path("location").asText())
  }

  override def loadTable(ident: Identifier): Table = {
    val (code, body) = http("GET", tblPath(ident))
    expect(code, body, Right(ident)) {
      if (body.has("latest-version"))
        new GraftSparkTable(spark, body.path("location").asText(), ident, None)
      else {
        // a REGISTERED foreign Iceberg table (register-table route):
        // no graft log to scan — serve the pointed-at metadata
        // read-only, exactly what a Polaris client does with the
        // LoadTableResult's metadata-location
        val root = body.path("location").asText()
        new graft.sources.v2.GraftDataFrameTable(spark, ident,
          () => graft.sources.IcebergInterop.readIceberg(spark, root))
      }
    }
  }

  override def loadTable(ident: Identifier, version: String): Table =
    new GraftSparkTable(spark, location(ident), ident, Some(version.toInt))

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val loc = location(ident)
    val t = GraftTable.load(spark, loc)
    val tsMillis = timestamp / 1000L
    val v = (0 to t.latestVersion())
      .takeWhile(t.commitAt(_).timestampMs <= tsMillis).lastOption
      .getOrElse(throw new NoSuchTableException(ident))
    new GraftSparkTable(spark, loc, ident, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val b = om.createObjectNode()
    b.put("name", ident.name())
    b.put("schema-json", schema.json)
    val specs = om.createArrayNode()
    partitions.map(GraftCatalog.transformToSpec).foreach(specs.add)
    b.set[JsonNode]("partition-specs", specs)
    val (code, body) =
      http("POST", nsPath(ident.namespace().toSeq) + "/tables", Some(b))
    expect(code, body, Right(ident))(loadTable(ident))
  }

  /** Column changes commit to the table log directly (the log's
    * optimistic protocol already arbitrates concurrent metadata
    * commits); the catalog service brokered only the location. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = GraftTable.load(spark, location(ident))
    val setProps = om.createObjectNode()
    val rmProps = om.createArrayNode()
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames().length == 1, "nested rename not supported")
        t.renameColumn(r.fieldNames()(0), r.newName())
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1, "nested add not supported")
        t.addColumn(a.fieldNames()(0), a.dataType())
      case s: TableChange.SetProperty =>
        setProps.put(s.property(), s.value()): Unit
      case r: TableChange.RemoveProperty =>
        rmProps.add(r.property()): Unit
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change $other not supported")
    }
    // property changes commit through the CATALOG (the commitTable
    // route) — properties are catalog metadata, not table-log content
    if (setProps.size() > 0 || rmProps.size() > 0) {
      val updates = om.createArrayNode()
      if (setProps.size() > 0) {
        val u = om.createObjectNode()
        u.put("action", "set-properties")
        u.set[JsonNode]("updates", setProps)
        updates.add(u)
      }
      if (rmProps.size() > 0) {
        val u = om.createObjectNode()
        u.put("action", "remove-properties")
        u.set[JsonNode]("removals", rmProps)
        updates.add(u)
      }
      val b = om.createObjectNode()
      b.set[JsonNode]("updates", updates)
      val (code, body) = http("POST", tblPath(ident), Some(b))
      expect(code, body, Right(ident))(())
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    http("DELETE", tblPath(ident))._1 == 204

  override def renameTable(oldIdent: Identifier, newIdentRaw: Identifier): Unit = {
    // RENAME TO hands over the destination UNRESOLVED: empty namespace
    // (bare `RENAME TO t2`) or catalog-prefixed (`RENAME TO cat.db.t2`
    // keeps `cat` as a namespace segment) — normalize both
    val newIdent = {
      val ns = newIdentRaw.namespace()
      if (ns.isEmpty) Identifier.of(oldIdent.namespace(), newIdentRaw.name())
      else if (ns.head == catalogName)
        Identifier.of(ns.tail, newIdentRaw.name())
      else newIdentRaw
    }
    def identNode(id: Identifier) = {
      val n = om.createObjectNode()
      val arr = om.createArrayNode()
      id.namespace().foreach(arr.add)
      n.set[JsonNode]("namespace", arr)
      n.put("name", id.name())
      n
    }
    val b = om.createObjectNode()
    b.set[JsonNode]("source", identNode(oldIdent))
    b.set[JsonNode]("destination", identNode(newIdent))
    val (code, body) = http("POST", "/v1/tables/rename", Some(b))
    if (code == 404 &&
        body.path("error").path("type").asText() == "NoSuchTableException")
      throw new NoSuchTableException(oldIdent)
    expect(code, body, Right(newIdent))(())
  }

  // ----------------------------------------------------------- views

  private def viewPath(ident: Identifier): String =
    nsPath(ident.namespace().toSeq) + "/views/" +
      java.net.URLEncoder.encode(ident.name(), "UTF-8")

  override def listViews(namespace: String*): Array[Identifier] =
    pagedList(nsPath(namespace.toSeq) + "/views", "?", "identifiers",
        Left(namespace.toSeq)).map { id =>
      val ns = id.path("namespace")
      Identifier.of((0 until ns.size()).map(ns.get(_).asText()).toArray,
        id.path("name").asText())
    }.toArray

  override def viewExists(ident: Identifier): Boolean =
    http("HEAD", viewPath(ident))._1 == 204

  private def viewOf(ident: Identifier,
      meta: graft.sources.GraftView.Meta): View = {
    val cur = meta.current
    val viewSchema = cur.schemaJson
      .map(org.apache.spark.sql.types.DataType.fromJson(_)
        .asInstanceOf[StructType])
      .getOrElse(spark.sql(cur.sql).schema)
    val self = this
    new View {
      override def name(): String =
        (catalogName +: ident.namespace().toSeq :+ ident.name())
          .mkString(".")
      override def query(): String = cur.sql
      override def currentCatalog(): String =
        cur.defaultCatalog.getOrElse(self.name())
      override def currentNamespace(): Array[String] =
        if (cur.defaultNamespace.nonEmpty) cur.defaultNamespace.toArray
        else ident.namespace()
      override def schema(): StructType = viewSchema
      override def queryColumnNames(): Array[String] = Array.empty
      override def columnAliases(): Array[String] = Array.empty
      override def columnComments(): Array[String] = Array.empty
      override def properties(): util.Map[String, String] = {
        import scala.jdk.CollectionConverters._
        meta.properties.asJava
      }
    }
  }

  private def loadViewMeta(ident: Identifier)
      : graft.sources.GraftView.Meta = {
    val (code, body) = http("GET", viewPath(ident))
    if (code == 404)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    expect(code, body, Right(ident))(
      graft.sources.GraftView.fromJson(body.path("metadata")))
  }

  override def loadView(ident: Identifier): View =
    viewOf(ident, loadViewMeta(ident))

  override def createView(info: ViewInfo): View = {
    import graft.sources.GraftView
    val ident = info.ident
    val b = om.createObjectNode()
    b.put("name", ident.name())
    val vv = b.putObject("view-version")
    vv.put("version-id", 1)
    vv.put("timestamp-ms", System.currentTimeMillis())
    vv.put("schema-id", 0)
    val rep = vv.putArray("representations").addObject()
    rep.put("type", "sql")
    rep.put("sql", info.sql)
    rep.put("dialect", "spark")
    Option(info.currentCatalog).foreach(vv.put("default-catalog", _))
    val dns = vv.putArray("default-namespace")
    info.currentNamespace.foreach(dns.add)
    Option(info.schema).foreach(sc => vv.put("graft:schema-json", sc.json))
    val props = b.putObject("properties")
    info.properties.forEach((k, v) => { props.put(k, v); () })
    val (code, body) =
      http("POST", nsPath(ident.namespace().toSeq) + "/views", Some(b))
    if (code == 409)
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    expect(code, body, Right(ident))(
      viewOf(ident, GraftView.fromJson(body.path("metadata"))))
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    import graft.sources.GraftView
    val meta = loadViewMeta(ident)
    val b = om.createObjectNode()
    val reqs = b.putArray("requirements")
    val req = reqs.addObject()
    req.put("type", "assert-view-uuid")
    req.put("uuid", meta.uuid)
    val ups = b.putArray("updates")
    changes.foreach {
      case st: ViewChange.SetProperty =>
        val u = ups.addObject()
        u.put("action", "set-properties")
        u.putObject("updates").put(st.property(), st.value())
      case rm: ViewChange.RemoveProperty =>
        val u = ups.addObject()
        u.put("action", "remove-properties")
        u.putArray("removals").add(rm.property())
      case other => throw new IllegalArgumentException(
        s"ALTER VIEW change $other not supported")
    }
    val (code, body) = http("POST", viewPath(ident), Some(b))
    expect(code, body, Right(ident))(
      viewOf(ident, GraftView.fromJson(body.path("metadata"))))
  }

  override def dropView(ident: Identifier): Boolean =
    http("DELETE", viewPath(ident))._1 == 204

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    def identNode(id: Identifier) = {
      val n = om.createObjectNode()
      val arr = om.createArrayNode()
      id.namespace().foreach(arr.add)
      n.set[JsonNode]("namespace", arr)
      n.put("name", id.name())
      n
    }
    val b = om.createObjectNode()
    b.set[JsonNode]("source", identNode(oldIdent))
    b.set[JsonNode]("destination", identNode(newIdent))
    val (code, body) = http("POST", "/v1/views/rename", Some(b))
    if (code == 404 &&
        body.path("error").path("type").asText() == "NoSuchViewException")
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(oldIdent)
    if (code == 409)
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    expect(code, body, Right(newIdent))(())
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScalaSeq: Seq[A] = {
      val b = Seq.newBuilder[A]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
