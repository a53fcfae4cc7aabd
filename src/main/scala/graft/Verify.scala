package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // events.ts is timestamp[ns] parquet; Spark 4 rejects NANOS unless read
      // as epoch-nanos bigint (graft code derives timestamps from it).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // openCostInBytes keeps Spark's 4 MB default here; the many-small-
      // files ingest fix is scoped to Multimodal.ingestSession (r14
      // verdict #2 — session-wide 128 KB shattered regular scans' splits
      // at high core counts; see graft.Bench for the mechanism)
      // opt-r15: same AQE coalescing policy as graft.Bench (respect the
      // advisory size; see Bench.scala for the measured mechanism)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "8m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-loop filter: SPARK_GRAFT_ONLY=k1,k2 restricts the dump to named
    // keys (the driver never sets it, so the gate always runs the full set)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(ks) =>
        // make a leaked/typo'd filter loud: a silent restriction could make
        // a correctness run look complete when it isn't
        System.err.println(s"[verify] SPARK_GRAFT_ONLY active: ${ks.toSeq.sorted.mkString(",")}")
        val unknown = ks -- SparkEntry.queries.keySet
        if (unknown.nonEmpty)
          System.err.println(s"[verify] WARNING: filter names no registered query: ${unknown.toSeq.sorted.mkString(",")}")
        SparkEntry.queries.filter { case (n, _) => ks(n) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
