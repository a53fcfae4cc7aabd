package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-layout maintenance — the operational counterpart of the advisor's
  * partitioning recommendations (reference README.md's "better partition
  * strategies" goal): once a layout is chosen, real tables degrade into
  * many small files (streaming appends, per-task outputs), and scan cost
  * becomes dominated by file-open overhead rather than bytes. Compaction
  * rewrites a directory into ~targetBytes files.
  *
  * Scale posture: the rewrite is one `repartition(n)` round-robin shuffle —
  * no driver-side data, file sizing derived from the source's actual bytes
  * (metadata: one `FileStatus` per input file). Partitioned layouts compact
  * per partition directory so the advisor's pruning keys survive the
  * rewrite.
  */
object Layout {

  /** Total on-disk bytes of a parquet directory (driver-side metadata only —
    * one file-status per file, no data read). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("_")) 0L // _SUCCESS etc.
        else st.getLen
      }.sum
    walk(path)
  }

  /** Does either qualified location contain the other (or equal it)?
    * CONTAINMENT, not mere equality: `mode(overwrite)` deletes outDir
    * RECURSIVELY before [[compact]]'s lazy scan runs, so an outDir that is
    * an ancestor of inDir destroys the source too, and one nested inside
    * inDir mutates the input mid-scan. The check compares FULL qualified
    * URIs: two locations can only contain each other when scheme AND
    * authority match — hdfs://nn1/data vs s3://bkt/data (or two different
    * buckets) are disjoint filesystems, and a path-only compare would
    * spuriously refuse that legitimate cross-filesystem compaction. */
  private[graft] def overlaps(a: java.net.URI, b: java.net.URI): Boolean = {
    def contains(x: java.net.URI, y: java.net.URI): Boolean =
      x.getScheme == y.getScheme &&
        Option(x.getAuthority).getOrElse("") == Option(y.getAuthority).getOrElse("") && {
          val (xp, yp) = (x.getPath, y.getPath)
          xp == yp || yp.startsWith(xp.stripSuffix("/") + "/")
        }
    contains(a, b) || contains(b, a)
  }

  /** Compact `inDir` (parquet) into ~targetBytes output files at `outDir`:
    * n_files = max(1, ceil(bytes / target)). Row multiset is unchanged —
    * compaction is layout-only. Returns the compacted DataFrame.
    *
    * `outDir` must differ from `inDir`: the parquet read is LAZY and
    * `mode(overwrite)` deletes the destination before executing the scan —
    * an in-place call would destroy the source before reading it. Compact
    * to a staging dir and rename, like every table-format maintenance job. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sessionState.newHadoopConf()
    val inP = new org.apache.hadoop.fs.Path(inDir)
    val outP = new org.apache.hadoop.fs.Path(outDir)
    val inU = inP.getFileSystem(conf).makeQualified(inP).toUri
    val outU = outP.getFileSystem(conf).makeQualified(outP).toUri
    require(!overlaps(inU, outU),
      s"compact would overwrite or mutate its own input ('$inDir' vs " +
        s"'$outDir'): the lazy read executes AFTER mode(overwrite) deletes " +
        "the destination subtree — write to a disjoint staging dir and " +
        "rename instead")
    val src = spark.read.parquet(inDir)
    val nL = math.max(1L, math.ceil(dirBytes(spark, inDir).toDouble / targetBytes).toLong)
    // a petabyte input with a tiny target must clamp, not wrap negative
    val n = math.min(nL, Int.MaxValue.toLong).toInt
    src.repartition(n).write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
