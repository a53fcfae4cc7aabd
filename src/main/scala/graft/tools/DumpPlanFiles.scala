package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): dump the formatted physical plan of the
  * named queries to individual files, one per key, so before/after plan
  * evidence can be committed beside the round notes.
  *
  * Usage: sbt "runMain graft.tools.DumpPlanFiles <outDir> <suffix> k1,k2,..."
  *   e.g. sbt "runMain graft.tools.DumpPlanFiles plans/r15 before q18_large_orders,q21_waiting"
  *
  * Writes <outDir>/<key>_<suffix>.txt. Plans are built at sf0.001 (plan
  * shape is scale-independent apart from AQE runtime stats) with the same
  * session conf family as graft.Bench.
  */
object DumpPlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DumpPlanFiles <outDir> <suffix> k1,k2,...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    keys.foreach { name =>
      graft.Queries.queries.get(name) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            outDir.resolve(s"${name}_$suffix.txt"), txt)
          println(s"wrote ${outDir.resolve(s"${name}_$suffix.txt")} (${txt.length} chars)")
        case None => System.err.println(s"[dumpplanfiles] unknown key: $name")
      }
    }
    spark.stop()
  }
}
