package graft.sources

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Versioned SQL-view metadata store — the persistence behind both the
  * SQL catalog's `CREATE VIEW cat.ns.v AS …` ([[v2.GraftCatalog]]'s
  * ViewCatalog face) and the REST catalog's `/v1/…/views` route group
  * (the reference's Polaris ships views: k8s/polaris/,
  * 01_polaris_demo.ipynb).
  *
  * A view is a directory holding `_graft_view/v<N>.metadata.json`
  * files shaped after the Iceberg view spec (view-uuid,
  * current-version-id, `versions` with SQL representations,
  * version-log, properties) with the graft catalog profile's schema
  * payload (`graft:schema-json`, a Spark StructType — the same
  * convention the table routes use). Every metadata change publishes
  * `v<N+1>` through the SAME optimistic conditional put the table
  * commits ride ([[TableIO.writeExclusive]]): a replace racing another
  * replace loses the exclusive create and surfaces as a conflict —
  * across processes and across two catalog servers on one warehouse. */
private[graft] object GraftView {

  val MetaDir = "_graft_view"
  private val om = new ObjectMapper()

  final case class Version(versionId: Int, timestampMs: Long, sql: String,
      dialect: String, schemaJson: Option[String],
      defaultCatalog: Option[String], defaultNamespace: Seq[String])

  final case class Meta(uuid: String, location: String,
      currentVersionId: Int, versions: Seq[Version],
      properties: Map[String, String], versionLog: Seq[(Long, Int)]) {
    def current: Version = versions.find(_.versionId == currentVersionId)
      .getOrElse(throw new IllegalStateException(
        s"view at $location: current-version-id $currentVersionId " +
          "names no version"))
  }

  def isView(fs: FileSystem, p: HPath): Boolean =
    try fs.getFileStatus(new HPath(p, MetaDir)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  // ------------------------------------------------------------ json

  def toJson(meta: Meta): ObjectNode = {
    val n = om.createObjectNode()
    n.put("view-uuid", meta.uuid)
    n.put("format-version", 1)
    n.put("location", meta.location)
    n.put("current-version-id", meta.currentVersionId)
    val vs = n.putArray("versions")
    meta.versions.foreach { v =>
      val vn = vs.addObject()
      vn.put("version-id", v.versionId)
      vn.put("timestamp-ms", v.timestampMs)
      vn.put("schema-id", 0)
      vn.putObject("summary").put("engine-name", "graft")
      val rep = vn.putArray("representations").addObject()
      rep.put("type", "sql")
      rep.put("sql", v.sql)
      rep.put("dialect", v.dialect)
      v.defaultCatalog.foreach(vn.put("default-catalog", _))
      val dns = vn.putArray("default-namespace")
      v.defaultNamespace.foreach(dns.add)
      v.schemaJson.foreach(vn.put("graft:schema-json", _))
    }
    val log = n.putArray("version-log")
    meta.versionLog.foreach { case (ts, id) =>
      val e = log.addObject()
      e.put("timestamp-ms", ts)
      e.put("version-id", id)
    }
    val props = n.putObject("properties")
    meta.properties.toSeq.sortBy(_._1).foreach { case (k, v) =>
      props.put(k, v)
    }
    n
  }

  /** One `versions` entry (also the REST commit's `add-view-version`
    * payload). The spec allows several SQL dialects per version —
    * graft evaluates the spark one if present, else the first. */
  def versionFromJson(v: JsonNode): Version = {
    var sql: Option[(String, String)] = None
    var firstSql: Option[(String, String)] = None
    val reps = v.path("representations").elements()
    while (reps.hasNext) {
      val r = reps.next()
      if (r.path("type").asText() == "sql") {
        val pair = (r.path("sql").asText(),
          r.path("dialect").asText("spark"))
        if (firstSql.isEmpty) firstSql = Some(pair)
        if (pair._2.equalsIgnoreCase("spark") && sql.isEmpty)
          sql = Some(pair)
      }
    }
    val (text, dialect) = sql.orElse(firstSql).getOrElse(
      throw new IllegalArgumentException(
        "view version carries no SQL representation"))
    val dns = {
      val d = Seq.newBuilder[String]
      val e = v.path("default-namespace").elements()
      while (e.hasNext) d += e.next().asText()
      d.result()
    }
    Version(v.path("version-id").asInt(),
      v.path("timestamp-ms").asLong(nowMs()),
      text, dialect,
      Option(v.get("graft:schema-json")).map(_.asText()),
      Option(v.get("default-catalog")).map(_.asText()),
      dns)
  }

  def fromJson(node: JsonNode): Meta = {
    def versions: Seq[Version] = {
      val b = Seq.newBuilder[Version]
      val it = node.path("versions").elements()
      while (it.hasNext) b += versionFromJson(it.next())
      b.result()
    }
    val props = {
      val b = Map.newBuilder[String, String]
      val it = node.path("properties").fields()
      while (it.hasNext) {
        val e = it.next(); b += e.getKey -> e.getValue.asText()
      }
      b.result()
    }
    val log = {
      val b = Seq.newBuilder[(Long, Int)]
      val it = node.path("version-log").elements()
      while (it.hasNext) {
        val e = it.next()
        b += ((e.path("timestamp-ms").asLong(),
          e.path("version-id").asInt()))
      }
      b.result()
    }
    Meta(node.path("view-uuid").asText(),
      node.path("location").asText(),
      node.path("current-version-id").asInt(),
      versions, props, log)
  }

  // -------------------------------------------------------------- io

  private val VFile = "v(\\d+)\\.metadata\\.json".r

  /** Latest (fileVersion, meta), or None when no view lives here. */
  def load(conf: Configuration, root: String): Option[(Int, Meta)] = {
    val dir = new HPath(new HPath(root), MetaDir)
    val fs = dir.getFileSystem(conf)
    if (!isView(fs, new HPath(root))) return None
    val latest = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case VFile(v) => v.toInt }.maxOption.getOrElse(return None)
    val in = fs.open(new HPath(dir, s"v$latest.metadata.json"))
    val bytes = try in.readAllBytes() finally in.close()
    Some((latest, fromJson(om.readTree(bytes))))
  }

  /** Publish `meta` as metadata file `v<fileVersion>` through the
    * exclusive conditional put — throws
    * [[java.nio.file.FileAlreadyExistsException]] when a peer claimed
    * the slot first (create: the view exists; replace: a concurrent
    * replace won — re-read and retry, or surface the conflict). */
  def publish(conf: Configuration, root: String, fileVersion: Int,
      meta: Meta): Unit = {
    val dir = new HPath(new HPath(root), MetaDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    new TableIO(root, conf).writeExclusive(
      new HPath(dir, s"v$fileVersion.metadata.json"),
      om.writerWithDefaultPrettyPrinter().writeValueAsBytes(toJson(meta)))
  }

  def drop(conf: Configuration, root: String): Boolean = {
    val p = new HPath(root)
    val fs = p.getFileSystem(conf)
    if (!isView(fs, p)) false
    else { fs.delete(p, true); true }
  }

  def newUuid(): String = java.util.UUID.randomUUID().toString
  def nowMs(): Long = System.currentTimeMillis()
}
