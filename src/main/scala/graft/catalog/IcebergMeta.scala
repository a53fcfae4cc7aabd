package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Native reader/committer for the PUBLIC Apache Iceberg table-metadata
  * format (Apache Iceberg Table Spec v1/v2 — iceberg.apache.org/spec/),
  * scoped to FILESYSTEM catalogs (the HadoopTables layout:
  * `<table>/metadata/v<N>.metadata.json` + `version-hint.text`).
  *
  * This is the S5 gap-closer: the reference probes `<table>."$metadata"`
  * to detect Iceberg tables (trino_client.py:85-93), reads the current
  * partition spec from it (trino_client.py:95-107), and `--execute`s
  * `ALTER TABLE … REPLACE PARTITION SPEC` scripts (cli.py:124-133). The
  * offline sandbox has no `iceberg-spark-runtime` jar, but the table
  * METADATA format is a published JSON spec, so the advisor's metadata
  * point read and its spec-replace commit are implementable natively:
  *  - [[isIcebergTable]] — the `$metadata` existence probe.
  *  - [[partitionSpecString]] — the current default spec rendered in the
  *    reference's fragment syntax (`month(c)`, `bucket(16, c)`, `c`).
  *  - [[replacePartitionSpec]] — spec evolution per the Iceberg spec:
  *    append a new spec with a fresh spec-id (field ids/names REUSED from
  *    equivalent earlier fields, per the spec), flip `default-spec-id`,
  *    commit `v<N+1>.metadata.json`, then
  *    swing `version-hint.text`. Existing data files are NOT rewritten —
  *    that is Iceberg's actual semantics for spec evolution (the new
  *    spec governs new writes; old manifests keep their old spec-id).
  *
  * What still needs a real catalog service: metastore/REST catalogs whose
  * current-metadata pointer lives outside the filesystem, and commits that
  * must contend with concurrent writers beyond the create-exclusive file
  * race below. Both are wiring, not format work.
  *
  * Scale posture: everything here is driver-side metadata — one small JSON
  * document per read/commit, never a data-file listing.
  */
object IcebergMeta {

  /** One partition field of a spec, in metadata-JSON terms. */
  final case class SpecField(name: String, transform: String, sourceId: Int, fieldId: Int)

  final case class TableMeta(
      version: Int,
      formatVersion: Int,
      /** current schema: field name → field id */
      schemaIds: Map[String, Int],
      defaultSpecId: Int,
      /** spec-id → fields, every spec in the metadata */
      specs: Map[Int, Seq[SpecField]],
      /** the full parsed document (committers start from it) */
      raw: JObject)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def metadataDir(tableDir: String): Path = new Path(tableDir, "metadata")

  private val VersionFile = """v(\d+)\.metadata\.json""".r

  /** How old an uncommitted v-file blocker must be before
    * [[replacePartitionSpec]] treats it as crashed-commit debris (the
    * create→hint-swing window is milliseconds; a minute of grace keeps a
    * slow live committer safe). Overridable for tests. */
  private[graft] var OrphanGraceMs: Long = 60000L

  /** Test hook: invoked after the new metadata document is fully written
    * but BEFORE the hint swing — the window in which a competitor's
    * orphan-reclaim can delete-and-recreate this committer's v-file (the
    * lost-update scenario the post-swing verification detects). No-op in
    * production. */
  private[graft] var beforeHintSwing: Path => Unit = _ => ()

  /** Latest metadata version: `version-hint.text` when present and sane,
    * else the highest `v<N>.metadata.json` in the directory (the spec's
    * documented recovery path for a lost/corrupt hint). None when the
    * directory holds no metadata at all. */
  def currentVersion(spark: SparkSession, tableDir: String): Option[Int] = {
    val dir = metadataDir(tableDir)
    val filesystem = fs(spark, dir)
    val hinted =
      try {
        val hint = new Path(dir, "version-hint.text")
        if (filesystem.exists(hint)) {
          val in = filesystem.open(hint)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
          val v = txt.toInt
          if (filesystem.exists(new Path(dir, s"v$v.metadata.json"))) Some(v) else None
        } else None
      } catch { case _: Exception => None }
    hinted.orElse {
      try filesystem.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .collect { case VersionFile(n) => n.toInt }
        .maxOption
      catch { case _: Exception => None }
    }
  }

  /** The reference's `$metadata` probe (trino_client.py:85-93): is this
    * directory an Iceberg table we can answer metadata queries for? */
  def isIcebergTable(spark: SparkSession, tableDir: String): Boolean =
    try currentVersion(spark, tableDir).exists(v => read(spark, tableDir, v) != null)
    catch { case _: Exception => false }

  /** Read and validate metadata version `v` (default: current). */
  def read(spark: SparkSession, tableDir: String, version: Int = -1): TableMeta = {
    val v = if (version >= 0) Some(version) else currentVersion(spark, tableDir)
    val ver = v.getOrElse(throw new IllegalArgumentException(
      s"$tableDir has no Iceberg metadata (no version-hint.text and no v*.metadata.json)"))
    val p = new Path(metadataDir(tableDir), s"v$ver.metadata.json")
    readDocument(fs(spark, p), p, ver)
  }

  /** Parse one table-metadata DOCUMENT (the spec's JSON object, wherever it
    * came from — a filesystem v<N> file or a REST LoadTableResult's
    * `metadata` field). `src` labels errors; `ver` is the caller's version
    * notion (file number for filesystem, -1 when the catalog service owns
    * versioning). */
  private[catalog] def parseMetadata(src: String, json: JObject, ver: Int): TableMeta = {
    val p = src
    val formatVersion = (json \ "format-version") match {
      case JInt(n) => n.toInt
      case _ => throw new IllegalArgumentException(s"$p has no format-version")
    }
    // v2 keeps a schema list + current-schema-id; v1 a single "schema"
    val schema: JValue = (json \ "schemas", json \ "current-schema-id") match {
      case (JArray(ss), JInt(cur)) =>
        ss.find(s => (s \ "schema-id") == JInt(cur)).getOrElse(
          throw new IllegalArgumentException(s"$p: current-schema-id $cur not in schemas"))
      case _ => json \ "schema"
    }
    val schemaIds = (schema \ "fields") match {
      case JArray(fields) => fields.map { f =>
        val JString(name) = (f \ "name"): @unchecked
        val JInt(id) = (f \ "id"): @unchecked
        name -> id.toInt
      }.toMap
      case _ => throw new IllegalArgumentException(s"$p has no usable schema fields")
    }
    val defaultSpecId = (json \ "default-spec-id") match {
      case JInt(n) => n.toInt
      case _ => 0
    }
    val specs: Map[Int, Seq[SpecField]] = (json \ "partition-specs") match {
      case JArray(ss) => ss.map { s =>
        val JInt(sid) = (s \ "spec-id"): @unchecked
        val fields = (s \ "fields") match {
          case JArray(fs0) => fs0.map { f =>
            val JString(name) = (f \ "name"): @unchecked
            val JString(tr) = (f \ "transform"): @unchecked
            val JInt(src) = (f \ "source-id"): @unchecked
            val JInt(fid) = (f \ "field-id"): @unchecked
            SpecField(name, tr, src.toInt, fid.toInt)
          }
          case _ => Nil
        }
        sid.toInt -> fields
      }.toMap
      // v1 tables may carry only "partition-spec" (flat field list, spec-id 0)
      case _ => (json \ "partition-spec") match {
        case JArray(fs0) => Map(0 -> fs0.zipWithIndex.map { case (f, i) =>
          val JString(name) = (f \ "name"): @unchecked
          val JString(tr) = (f \ "transform"): @unchecked
          val JInt(src) = (f \ "source-id"): @unchecked
          SpecField(name, tr, src.toInt, 1000 + i)
        })
        case _ => Map(0 -> Nil)
      }
    }
    TableMeta(ver, formatVersion, schemaIds, defaultSpecId, specs, json)
  }

  /** Render one metadata transform in the reference's fragment syntax. */
  private val BucketT = """bucket\[(\d+)\]""".r
  private val TruncT = """truncate\[(\d+)\]""".r
  def renderField(f: SpecField, sourceName: Int => String): String = {
    val c = sourceName(f.sourceId)
    f.transform match {
      case "identity" => c
      case BucketT(n) => s"bucket($n, $c)"
      case TruncT(w) => s"truncate($c, $w)"
      case t @ ("year" | "month" | "day" | "hour") => s"$t($c)"
      case other => s"$other($c)" // void / unknown future transforms
    }
  }

  /** The current default partition spec as the comma-joined fragment string
    * the advisor emits ("" for unpartitioned) — the native twin of the
    * reference's `SELECT partition_spec FROM …."$metadata"`. */
  def partitionSpecString(spark: SparkSession, tableDir: String): String =
    specString(read(spark, tableDir))

  /** The same rendering over an already-loaded meta — THE one renderer all
    * three catalog surfaces (filesystem here, [[IcebergRest]],
    * [[IcebergHms]]) share, so the fragment syntax cannot drift per
    * catalog. */
  def specString(m: TableMeta): String = {
    val byId = m.schemaIds.map(_.swap)
    m.specs.getOrElse(m.defaultSpecId, Nil)
      .map(renderField(_, id => byId.getOrElse(id, s"col_$id")))
      .mkString(", ")
  }

  /** Read one metadata DOCUMENT from a filesystem path and parse it —
    * shared by the versioned read above and the HMS pointer read. `ver` is
    * the caller's version notion (-1 when a catalog service owns it). */
  private[catalog] def readDocument(fs: FileSystem, p: Path, ver: Int): TableMeta = {
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val json = JsonMethods.parse(txt) match {
      case o: JObject => o
      case other => throw new IllegalArgumentException(
        s"$p is not a JSON object: ${other.getClass.getSimpleName}")
    }
    parseMetadata(p.toString, json, ver)
  }

  /** Fragment syntax → metadata transform. Mirrors
    * [[graft.recommend.SpecParser]]'s grammar (the emit side) — including
    * the interior `\s*` tolerance: `day( ts )` must parse the SAME on both
    * sides of the pair, or a spec string that materializes fine through
    * SpecParser fails here with a misleading not-a-column error. */
  private val DateF = """(year|month|day|hour)\(\s*(\w+)\s*\)""".r
  private val BucketF = """bucket\(\s*(\d+),\s*(\w+)\s*\)""".r
  private val TruncF = """truncate\(\s*(\w+),\s*(\d+)\s*\)""".r
  private[graft] def parseFragment(s: String): (String, String) = s.trim match {
    case DateF(unit, c) => (c, unit)
    case BucketF(n, c) => (c, s"bucket[$n]")
    case TruncF(c, w) => (c, s"truncate[$w]")
    case c => (c, "identity")
  }

  /** Resolve REPLACE PARTITION SPEC fragments against existing metadata:
    * fresh spec-id, field-id + name REUSE for (transform, source-id)-
    * equivalent earlier fields, two-layer naming, order-independent
    * duplicate rejection. Shared by the filesystem committer below and the
    * REST committer ([[IcebergRest]]) — the FORMAT work is identical; only
    * the commit authority differs. `label` names the table in errors. */
  private[catalog] def buildReplacementSpec(m: TableMeta, fragments: Seq[String],
      label: String): (Int, Seq[SpecField]) = {
    require(fragments.nonEmpty, "REPLACE PARTITION SPEC needs at least one field")
    val tableDir = label
    val newSpecId = if (m.specs.isEmpty) 0 else m.specs.keys.max + 1
    val maxFieldId = math.max(999, m.specs.values.flatten.map(_.fieldId).maxOption.getOrElse(999))
    // Iceberg v2 REQUIRES reusing the field id (and, for sanity, the name)
    // of an EQUIVALENT field from any earlier spec — the (transform,
    // source-id) pair identifies equivalence. Fresh ids only for genuinely
    // new fields; without reuse, a re-run of the advisor mints a same-name
    // field under a new id and real Iceberg readers reject the table when
    // building the unified partition type.
    val existingByKey: Map[(String, Int), SpecField] =
      m.specs.values.flatten.map(f => (f.transform, f.sourceId) -> f).toMap
    val parsed = fragments.map { frag =>
      val (colName, transform) = parseFragment(frag)
      val srcId = m.schemaIds.getOrElse(colName, throw new IllegalArgumentException(
        s"REPLACE PARTITION SPEC references '$colName', not a column of $tableDir " +
          s"(schema: ${m.schemaIds.keys.toSeq.sorted.mkString(", ")})"))
      (frag, colName, transform, srcId)
    }
    // duplicate detection up front, by (transform, source-id) identity —
    // order-independent, so bucket(8,c) before bucket(4,c) cannot turn a
    // LEGAL spec into a misleading duplicate error on the reuse arm
    parsed.groupBy(p => (p._3, p._4)).collectFirst {
      case (_, ps) if ps.size > 1 => ps.head._1
    }.foreach(f => throw new IllegalArgumentException(
      s"duplicate partition field '$f' in REPLACE PARTITION SPEC"))
    // Names resolve in two layers: reused fields keep their spec-mandated
    // names (claimed first, via the seed), and genuinely-new fields are
    // named against a `taken` set seeded with EVERY earlier spec's field
    // name — a new field can therefore never mint a same-name/new-id
    // collision with ANY prior field (the condition real readers reject
    // when building the unified partition type), e.g. bucket(8, c) after a
    // spec containing bucket(4, c) named c_bucket yields c_bucket_8.
    var nextId = maxFieldId
    val taken = scala.collection.mutable.Set[String]()
    m.specs.values.flatten.foreach(f => taken += f.name)
    val fields = parsed.map { case (_, colName, transform, srcId) =>
      existingByKey.get((transform, srcId)) match {
        case Some(prev) => prev // name already claimed via the seed
        case None =>
          val base = transform match {
            case "identity" => colName
            case BucketT(_) => s"${colName}_bucket"
            case TruncT(_) => s"${colName}_trunc"
            case t => s"${colName}_$t"
          }
          // within-spec name uniqueness is required by the spec: two
          // same-family fragments on one column (bucket(4,c), bucket(8,c))
          // share a convention base name — qualify with the transform
          // parameter, then the field id as the last resort
          val param = transform match {
            case BucketT(n) => Some(n); case TruncT(w) => Some(w); case _ => None
          }
          nextId += 1
          val fname =
            if (taken.add(base)) base
            else param.map(p => s"${base}_$p").filter(taken.add)
              .getOrElse { val n = s"${base}_$nextId"; taken.add(n); n }
          SpecField(fname, transform, srcId, nextId)
      }
    }
    (newSpecId, fields)
  }

  /** Spec fields rendered as their metadata-JSON array. */
  private[catalog] def fieldsJson(fields: Seq[SpecField]): JArray =
    JArray(fields.toList.map(f => JObject(
      "name" -> JString(f.name),
      "transform" -> JString(f.transform),
      "source-id" -> JInt(f.sourceId),
      "field-id" -> JInt(f.fieldId))))

  /** REPLACE PARTITION SPEC, committed per the Iceberg spec's evolution
    * rules: the new spec is APPENDED under a fresh spec-id, each field
    * REUSES the field id + name of an equivalent (transform, source-id)
    * field from any earlier spec (spec requirement; fresh ids only for
    * genuinely new fields), `default-spec-id` flips to it, and the new
    * metadata version commits via create-exclusive `v<N+1>.metadata.json`
    * followed by the `version-hint.text` swing (write-temp + rename). A
    * LIVE concurrent committer that already created the same version makes
    * this commit FAIL loudly — the HadoopTables optimistic-concurrency
    * contract — rather than overwrite; DEBRIS of a committer that crashed
    * before its hint swing (never committed under hint authority) is
    * reclaimed after a grace window instead of wedging every future
    * commit.
    * Format-version-1 documents keep their required flat "partition-spec"
    * key in sync with the new default spec.
    *
    * Partition field names follow the Iceberg convention:
    * `col` / `col_bucket` / `col_trunc` / `col_month` etc.; same-family
    * duplicates within one spec are qualified by the transform parameter
    * (`col_bucket_8`).
    *
    * @param fragments reference-syntax spec fragments, in order
    * @return the committed metadata version
    */
  /** The updated metadata DOCUMENT for a replacement spec — the assembly
    * shared by every catalog surface that writes documents itself (the
    * filesystem path below, the HMS path in [[IcebergHms]]; the REST path
    * sends updates instead, the service assembles). */
  private[catalog] def replacementDocument(m: TableMeta,
      newSpecId: Int, fields: Seq[SpecField]): JObject = {
    val maxFieldId = math.max(999, m.specs.values.flatten.map(_.fieldId).maxOption.getOrElse(999))
    val specJson = JObject(
      "spec-id" -> JInt(newSpecId),
      "fields" -> fieldsJson(fields))
    val existingSpecs = (m.raw \ "partition-specs") match {
      case JArray(ss) => ss
      case _ => List(JObject(
        "spec-id" -> JInt(0),
        "fields" -> fieldsJson(m.specs.getOrElse(0, Nil))))
    }
    // format-version 1 REQUIRES the flat "partition-spec" key (the default
    // spec's fields) alongside "partition-specs"; stripping it without
    // rewriting would emit a spec-noncompliant v1 document that
    // pre-evolution readers see as unpartitioned
    val v1Flat: List[(String, JValue)] =
      if (m.formatVersion == 1)
        List("partition-spec" -> fieldsJson(fields))
      else Nil
    JObject(m.raw.obj.filterNot { case (k, _) =>
      Set("partition-specs", "default-spec-id", "last-partition-id",
        "last-updated-ms", "partition-spec").contains(k)
    } ++ List(
      "partition-specs" -> JArray(existingSpecs :+ specJson),
      "default-spec-id" -> JInt(newSpecId),
      // monotonic: an all-reused-field spec must not regress the high-water mark
      "last-partition-id" -> JInt(math.max(maxFieldId, fields.map(_.fieldId).max)),
      "last-updated-ms" -> JInt(System.currentTimeMillis())) ++ v1Flat)
  }

  def replacePartitionSpec(spark: SparkSession, tableDir: String,
      fragments: Seq[String]): Int = {
    val m = read(spark, tableDir)
    val (newSpecId, fields) = buildReplacementSpec(m, fragments, tableDir)
    val updated: JObject = replacementDocument(m, newSpecId, fields)

    val dir = metadataDir(tableDir)
    val filesystem = fs(spark, dir)
    val newVersion = m.version + 1
    val target = new Path(dir, s"v$newVersion.metadata.json")
    // create-exclusive: the commit race detector (overwrite = false throws
    // when the target exists). Under this module's hint-authoritative
    // design the HINT SWING is the commit point, so a blocking v<N+1> file
    // while the hint still reads N is one of two things we cannot
    // distinguish by name alone: a LIVE committer inside its create→swing
    // window, or the debris of one that CRASHED there (whose commit never
    // happened and whose content is rightly ignored). Age arbitrates:
    // fresh blocker → fail loudly (optimistic-concurrency contract);
    // blocker older than the grace window with the hint still at our read
    // version → crashed-commit debris, removed and retried ONCE, so a
    // crash cannot wedge every future commit (deriving the next version
    // from the listing instead would silently base a commit on stale state
    // when the blocker was a DURABLE commit — lost update, worse than the
    // wedge).
    val out =
      try filesystem.create(target, /* overwrite = */ false)
      catch { case e: java.io.IOException =>
        val hintNow = currentVersion(spark, tableDir)
        val blockerAge =
          try System.currentTimeMillis() - filesystem.getFileStatus(target).getModificationTime
          catch { case _: Exception => 0L }
        if (hintNow.contains(m.version) && blockerAge > OrphanGraceMs) {
          filesystem.delete(target, false)
          filesystem.create(target, /* overwrite = */ false)
        } else throw new java.io.IOException(
          s"commit race on $target (hint=${hintNow.getOrElse("?")}, " +
            s"blocker age ${blockerAge}ms): a concurrent committer is " +
            "in flight or just won — re-read and retry", e)
      }
    val docBytes = JsonMethods.pretty(JsonMethods.render(updated)).getBytes("UTF-8")
    try out.write(docBytes)
    finally out.close()
    beforeHintSwing(target)
    // swing the hint: temp + rename (atomic on HDFS and local FS)
    val tmp = new Path(dir, s".version-hint.text.tmp-$newVersion")
    val hintOut = filesystem.create(tmp, true)
    try hintOut.write(newVersion.toString.getBytes("UTF-8")) finally hintOut.close()
    val hint = new Path(dir, "version-hint.text")
    filesystem.delete(hint, false)
    if (!filesystem.rename(tmp, hint))
      throw new java.io.IOException(s"failed to swing $hint to v$newVersion")
    // Lost-update detector for the reclaim heuristic above: a committer
    // stalled >OrphanGraceMs between create and hint-swing can have its
    // v-file deleted and recreated by a competitor — the stalled writer
    // then streams its JSON into an UNLINKED handle, and the visible
    // v<N+1> holds the COMPETITOR's document. Without this check it would
    // swing the hint and report success while its spec change was silently
    // dropped. Re-reading the committed file and comparing against our own
    // bytes turns that silent supersession into a loud failure (the
    // competitor's commit remains intact and authoritative).
    // The verification read is DIAGNOSTIC: at this point the commit itself
    // has already succeeded (v-file written, hint swung). A transient
    // re-read failure must not be reported as a commit failure — the caller
    // would re-issue a committed spec change (r9 advice). Retry once, then
    // fail with an explicitly inconclusive message distinct from the
    // supersession signal below.
    def readCommitted(): String = {
      val in = filesystem.open(target)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val committed =
      try readCommitted()
      catch { case _: Exception =>
        try readCommitted()
        catch { case e: Exception => throw new java.io.IOException(
          s"commit verification INCONCLUSIVE: cannot re-read $target after " +
            "the hint swing — the commit may well have SUCCEEDED (v-file " +
            "written and hint swung); verify the table state before " +
            "re-issuing this spec change", e) }
      }
    if (committed != new String(docBytes, "UTF-8"))
      throw new java.io.IOException(
        s"commit superseded: $target holds a concurrent committer's document " +
          "(this writer stalled past the orphan grace window and its v-file " +
          "was reclaimed as debris) — this spec change was NOT committed; " +
          "re-read and retry")
    newVersion
  }

  /** Apply an advisor script's spec to a filesystem Iceberg table: the
    * native `--execute` (cli.py:124-133). `partitionSpec` is the
    * comma/newline-joined fragment block `Recommender.scripts` renders. */
  /** Split a rendered spec block into fragments on commas at paren depth 0
    * only — `bucket(4, c)` is one field. THE splitter for the
    * `Recommender.scripts` fragment syntax: every consumer (this module's
    * [[applySpec]], [[graft.Main]]'s materialization path) must use it, so
    * a renderer join-format change cannot silently diverge one copy. */
  def splitFragments(partitionSpec: String): Seq[String] = {
    val frags = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    partitionSpec.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => frags += cur.result(); cur.clear()
      case c => cur += c
    }
    frags += cur.result()
    frags.map(_.trim).filter(_.nonEmpty).toSeq
  }

  def applySpec(spark: SparkSession, tableDir: String, partitionSpec: String): Int =
    replacePartitionSpec(spark, tableDir, splitFragments(partitionSpec))
}
