package graft

import graft.pipeline.AnalysisPipeline
import graft.report.ReportExporter
import org.apache.spark.sql.SparkSession

/** CLI entry point — the analog of the reference's `python -m src.cli`
  * (cli.py:11-137): run the advisor, print the partition scripts, export the
  * dashboard artifacts; dry-run by default, `--execute` materializes the
  * recommended layout as partitioned parquet (T5 — the Spark-native stand-in
  * for `ALTER TABLE … REPLACE PARTITION SPEC`).
  *
  * Usage:
  *   graft.Main [--sf-dir DIR] [--out-dir DIR] [--time-filter SQL] [--execute]
  */
object Main {
  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.001"
    var outDir = "results"
    var timeFilter: Option[String] = None
    var execute = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf-dir" => sfDir = args(i + 1); i += 2
        case "--out-dir" => outDir = args(i + 1); i += 2
        case "--time-filter" => timeFilter = Some(args(i + 1)); i += 2
        case "--execute" => execute = true; i += 1
        case other => System.err.println(s"unknown arg: $other"); sys.exit(2)
      }
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-advisor")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      val recs = AnalysisPipeline.run(spark, sfDir).collect()
      recs.foreach { r =>
        println(r.getAs[String]("script"))
      }

      ReportExporter.export(spark, sfDir, outDir, timeFilter)
      println(s"artifacts exported to $outDir/")

      if (execute) {
        // materialize each recommendation's first partition key as a real
        // partitioned layout (dry-run default mirrors cli.py:124-133)
        recs.filter(r => r.getAs[String]("partition_spec") != null).foreach { r =>
          val view = r.getAs[String]("view")
          val firstSpec = r.getAs[String]("partition_spec").split(",\n").head.trim
          val df = graft.catalog.TableRegistry.table(spark, sfDir, view)
          val (colName, partCol) = graft.recommend.SpecParser.toColumn(firstSpec, df)
          df.withColumn(s"__p_$colName", partCol)
            .write.mode("overwrite").partitionBy(s"__p_$colName")
            .parquet(s"$outDir/partitioned/$view")
          println(s"materialized $view partitioned by $firstSpec")
        }
      } else {
        println("dry run (pass --execute to materialize partitioned layouts)")
      }
    } finally spark.stop()
  }
}
