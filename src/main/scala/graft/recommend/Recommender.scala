package graft.recommend

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recommendation assembly — C9/S12: ranked columns + selected transforms →
  * `ALTER TABLE … REPLACE PARTITION SPEC (…)` scripts, same shape as the
  * reference's produce_iceberg_partition_scripts (partitioning.py:417-438).
  * Dry-run by default like the reference (cli.py:124-133): recommendations
  * are data; execution is the caller's affair.
  */
object Recommender {

  /** Input: topN-ranked score rows joined with profile fields
    * (view, column, rank, score, dataType, cardinality, valueRange,
    * dateGranularity). Output one row per view:
    * (view, partition_spec, script). Views whose candidates were all
    * filtered out produce the reference's "no suitable columns" comment. */
  /** Ranked rows + their selected transform fragments (`spec` column) — the
    * shared head of script assembly and balance vetting, so the fragment a
    * vet evaluates is BY CONSTRUCTION the fragment the script would emit. */
  def withSelectedSpec(ranked: DataFrame): DataFrame =
    ranked.withColumn("spec",
      Transforms.selectExpr(
        col("dataType"), col("column"),
        col("cardinality"), col("valueRange"), col("dateGranularity")))

  def scripts(spark: SparkSession, ranked: DataFrame, allViews: Seq[String]): DataFrame = {
    import spark.implicits._
    val withSpec = withSelectedSpec(ranked)
    // per view: specs in rank order, plus the score comment line. The group
    // is ≤ topN rows; sort_array over collected (rank, …) structs gives a
    // deterministic order without a second shuffle.
    val agg = withSpec.groupBy("view").agg(
      array_join(transform(sort_array(collect_list(struct(col("rank"), col("spec")))),
        x => x.getField("spec")), ",\n    ").as("partition_spec"),
      array_join(transform(sort_array(collect_list(struct(col("rank"), col("column"), col("score")))),
        x => concat(lit("('"), x.getField("column"), lit("', "),
          // format_string, NOT format_number: the latter inserts
          // thousands-separator commas ("1,234.57") into the tuple list
          // for scores >= 1000, corrupting the script comment (the
          // reference renders plain f"{score:.2f}")
          format_string("%.2f", x.getField("score")), lit(")"))), ", ").as("score_list"))
    val scripted = agg.select(
      col("view"),
      col("partition_spec"),
      concat(
        lit("-- Iceberg Partitioning script for "), col("view"), lit("\n"),
        lit("-- Column scores: ["), col("score_list"), lit("]\n"),
        lit("ALTER TABLE "), col("view"), lit(" REPLACE PARTITION SPEC (\n    "),
        col("partition_spec"), lit("\n);\n")).as("script"))
    val empties = allViews.toDF("view")
      .join(scripted.select("view"), Seq("view"), "left_anti")
      .select(col("view"), lit(null).cast("string").as("partition_spec"),
        concat(lit("-- "), col("view"),
          lit(" does not contain suitable columns for partitioning.\n")).as("script"))
    scripted.unionByName(empties).orderBy("view")
  }
}
