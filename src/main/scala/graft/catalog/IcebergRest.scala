package graft.catalog

import java.net.{HttpURLConnection, URI, URLEncoder}

import graft.catalog.IcebergMeta.{SpecField, TableMeta}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Native client for the PUBLIC Apache Iceberg REST Catalog protocol
  * (the published `rest-catalog-open-api.yaml` — iceberg.apache.org), the
  * last S5 sliver beyond filesystem catalogs: tables whose current-metadata
  * pointer lives in a catalog SERVICE rather than a `version-hint.text`.
  * Covers the two operations the advisor needs:
  *
  *  - [[loadTable]] — `GET /v1/{prefix}/namespaces/{ns}/tables/{table}`:
  *    the LoadTableResult's `metadata` document, parsed by the SAME
  *    [[IcebergMeta.parseMetadata]] the filesystem path uses (one format
  *    parser, two transports).
  *  - [[replacePartitionSpec]] — `POST` to the same route (commitTable):
  *    an `add-spec` + `set-default-spec` update pair guarded by the spec's
  *    optimistic requirements (`assert-table-uuid`,
  *    `assert-default-spec-id`, `assert-last-assigned-partition-id`). The
  *    SERVICE is the commit authority — a 409 means a concurrent committer
  *    won; the client refreshes its base metadata and retries the whole
  *    resolve-and-commit once (the protocol's prescribed recovery), then
  *    fails loudly.
  *
  * Spec RESOLUTION (fresh spec-id, field-id/name reuse, naming) is shared
  * with the filesystem committer via [[IcebergMeta.buildReplacementSpec]] —
  * REST changes who owns the commit point, not the format work.
  *
  * Scale posture: driver-side metadata only — one small JSON document per
  * call, never a data-file or manifest listing.
  */
object IcebergRest {

  /** `baseUrl` is the catalog root (everything before `/v1/…`), optionally
    * carrying the spec's path prefix, e.g. `http://host:8181` or
    * `http://host:8181/my-prefix`. */
  final case class Catalog(baseUrl: String, namespace: String) {
    private def enc(s: String) = URLEncoder.encode(s, "UTF-8")
    def tableRoute(table: String): String = {
      val (root, prefix) = {
        val u = URI.create(baseUrl.stripSuffix("/"))
        val p = Option(u.getPath).getOrElse("").stripPrefix("/")
        val r = s"${u.getScheme}://${u.getAuthority}"
        (r, if (p.isEmpty) "" else s"/${p}")
      }
      s"$root/v1$prefix/namespaces/${enc(namespace)}/tables/${enc(table)}"
    }
  }

  /** Test hook: invoked between the metadata load and the commit POST —
    * the window in which a concurrent committer can win and force the 409
    * path. No-op in production. */
  private[graft] var beforeCommitPost: () => Unit = () => ()

  /** HTTP status + body of a catalog-service response. */
  private final case class Resp(status: Int, body: String)

  private def http(method: String, url: String, body: Option[String]): Resp = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("Accept", "application/json")
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        val out = conn.getOutputStream
        try out.write(b.getBytes("UTF-8")) finally out.close()
      }
      val status = conn.getResponseCode
      val in = if (status < 400) conn.getInputStream else conn.getErrorStream
      val txt =
        if (in == null) ""
        else try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      Resp(status, txt)
    } finally conn.disconnect()
  }

  private def parseObject(src: String, txt: String): JObject =
    JsonMethods.parse(txt) match {
      case o: JObject => o
      case other => throw new java.io.IOException(
        s"$src returned non-object JSON: ${other.getClass.getSimpleName}")
    }

  /** The service's current table metadata (LoadTableResult.metadata) plus
    * the metadata-location the service reports (informational under REST —
    * the service, not the location, is the commit authority). */
  def loadTable(cat: Catalog, table: String): (TableMeta, Option[String]) = {
    val url = cat.tableRoute(table)
    val r = http("GET", url, None)
    if (r.status != 200) throw new java.io.IOException(
      s"loadTable $url failed: HTTP ${r.status} ${r.body.take(300)}")
    val doc = parseObject(url, r.body)
    val meta = (doc \ "metadata") match {
      case o: JObject => o
      case _ => throw new java.io.IOException(s"$url: LoadTableResult has no metadata object")
    }
    val loc = (doc \ "metadata-location") match {
      case JString(s) => Some(s); case _ => None
    }
    // REST services own versioning; -1 marks "no filesystem version notion"
    (IcebergMeta.parseMetadata(url, meta, -1), loc)
  }

  /** `$metadata`-style probe over REST: does the catalog serve this table? */
  def isIcebergTable(cat: Catalog, table: String): Boolean =
    try { loadTable(cat, table); true } catch { case _: Exception => false }

  /** The current default partition spec in the reference's fragment syntax
    * — the REST twin of [[IcebergMeta.partitionSpecString]]. */
  def partitionSpecString(cat: Catalog, table: String): String =
    IcebergMeta.specString(loadTable(cat, table)._1)

  private def commitBody(cat: Catalog, table: String, m: TableMeta,
      newSpecId: Int, fields: Seq[SpecField]): String = {
    val uuid = (m.raw \ "table-uuid") match {
      case JString(u) => Some(u); case _ => None
    }
    val lastPartitionId = (m.raw \ "last-partition-id") match {
      case JInt(n) => Some(n.toInt)
      // absent (typical of format-version-1 documents): OMIT the
      // requirement. The earlier guess (max field id parsed client-side)
      // 409s DETERMINISTICALLY whenever the service tracks a different
      // value — the retry recomputes the same guess from the same absent
      // key and the commit fails loudly with no actual concurrency
      // (r9 advice). The uuid + default-spec-id asserts still fence every
      // real conflict this client can observe.
      case _ => None
    }
    val requirements = JArray(List(
      uuid.map(u => JObject("type" -> JString("assert-table-uuid"),
        "uuid" -> JString(u))),
      Some(JObject("type" -> JString("assert-default-spec-id"),
        "default-spec-id" -> JInt(m.defaultSpecId))),
      lastPartitionId.map(n => JObject(
        "type" -> JString("assert-last-assigned-partition-id"),
        "last-assigned-partition-id" -> JInt(n)))).flatten)
    val updates = JArray(List(
      JObject("action" -> JString("add-spec"),
        "spec" -> JObject(
          "spec-id" -> JInt(newSpecId),
          "fields" -> IcebergMeta.fieldsJson(fields))),
      // -1 = "the spec added in this same commit" per the REST spec —
      // robust even if the service renumbers the added spec
      JObject("action" -> JString("set-default-spec"), "spec-id" -> JInt(-1))))
    JsonMethods.compact(JsonMethods.render(JObject(
      "identifier" -> JObject(
        "namespace" -> JArray(List(JString(cat.namespace))),
        "name" -> JString(table)),
      "requirements" -> requirements,
      "updates" -> updates)))
  }

  /** REPLACE PARTITION SPEC through the catalog service. Returns the new
    * default spec-id the service reports. One 409 (commit conflict) is
    * retried after a fresh [[loadTable]] — the conflict-winner's metadata
    * changes what field ids/names the resolution must reuse, so the WHOLE
    * resolve is redone, never just the POST. */
  def replacePartitionSpec(cat: Catalog, table: String,
      fragments: Seq[String]): Int = {
    val url = cat.tableRoute(table)
    def attempt(): Either[Resp, Int] = {
      val (m, _) = loadTable(cat, table)
      val (newSpecId, fields) =
        IcebergMeta.buildReplacementSpec(m, fragments, s"$url (REST)")
      beforeCommitPost()
      val r = http("POST", url, Some(commitBody(cat, table, m, newSpecId, fields)))
      if (r.status == 200) {
        val doc = parseObject(url, r.body)
        val committed = (doc \ "metadata") match {
          case o: JObject => IcebergMeta.parseMetadata(url, o, -1)
          case _ => throw new java.io.IOException(
            s"$url: CommitTableResponse has no metadata object")
        }
        Right(committed.defaultSpecId)
      } else Left(r)
    }
    attempt() match {
      case Right(specId) => specId
      case Left(r) if r.status == 409 =>
        // a concurrent committer won between our load and our POST —
        // refresh and retry the full resolve exactly once
        attempt() match {
          case Right(specId) => specId
          case Left(r2) => throw new java.io.IOException(
            s"commitTable $url failed after conflict retry: HTTP ${r2.status} " +
              s"${r2.body.take(300)}")
        }
      case Left(r) => throw new java.io.IOException(
        s"commitTable $url failed: HTTP ${r.status} ${r.body.take(300)}")
    }
  }

  /** Apply an advisor script's rendered spec block over REST — the
    * `--catalog rest:<url>` form of [[IcebergMeta.applySpec]]. */
  def applySpec(cat: Catalog, table: String, partitionSpec: String): Int =
    replacePartitionSpec(cat, table, IcebergMeta.splitFragments(partitionSpec))
}
