package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Split the scores stage into join cost vs expression cost.
  * Usage: runMain graft.ScoreProbe2 <cores> [nEntities]
  */
object ScoreProbe2 {

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 4
    val nEntities = if (args.length > 1) args(1).toLong else 60000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-score-probe2-$cores")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.ErPipeline
    val cfg = ErPipeline.Config()

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"probe":"$name","cores":$cores,"sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val pages = graft.sources.WebPageGen.pages(spark, nEntities).toDF.cache()
    pages.count()
    val sigs = ErPipeline.signatures(
      ErPipeline.normalize(ErPipeline.extract(pages)), cfg).localCheckpoint()
    val cands = ErPipeline.candidates(sigs, cfg).localCheckpoint()
    println(s"""{"probe":"_cands","n":${cands.count()}}""")

    val feat = sigs.select(
      col("url"), col("lang"), col("name_norm"), col("name_norm_rev"),
      col("email_norm"), col("phone_norm"), col("state_norm"), col("zip_norm"),
      col("embedding"))
    val lhs = feat.columns.foldLeft(feat)((d, c) => d.withColumnRenamed(c, c + "1"))
    val rhs = feat.columns.foldLeft(feat)((d, c) => d.withColumnRenamed(c, c + "2"))
    val joined = timed("join_only_materialize") {
      cands
        .join(lhs.withColumnRenamed("url1", "url1_"), col("url1") === col("url1_"))
        .drop("url1_")
        .join(rhs.withColumnRenamed("url2", "url2_"), col("url2") === col("url2_"))
        .drop("url2_")
        .localCheckpoint()
    }

    timed("passthrough_noop") { noop(joined.select(col("url1"), col("url2"))) }
    timed("jw_only") {
      noop(joined.select(
        Similarity.jaroWinkler(col("name_norm1"), col("name_norm2")).as("a"),
        Similarity.jaroWinkler(col("name_norm1"), col("name_norm_rev2")).as("b")))
    }
    timed("lev_only") {
      noop(joined.select(
        Similarity.levenshteinSim(col("name_norm1"), col("name_norm2")).as("a"),
        Similarity.levenshteinSim(col("name_norm1"), col("name_norm_rev2")).as("b")))
    }
    timed("cos_only") {
      noop(joined.select(
        Similarity.cosineSim(col("embedding1"), col("embedding2")).as("c")))
    }
    timed("eq_terms_only") {
      val nonEmptyEq = (a: String, b: String) =>
        (length(col(a)) > 0 && col(a) === col(b)).cast("double")
      noop(joined.select(
        (nonEmptyEq("email_norm1", "email_norm2")
          + nonEmptyEq("phone_norm1", "phone_norm2")
          + nonEmptyEq("state_norm1", "state_norm2")
          + nonEmptyEq("zip_norm1", "zip_norm2")).as("e")))
    }
    timed("full_score_noop") {
      noop(ErPipeline.scorePairs(
        cands.limit(0).unionByName(cands), sigs, cfg)) // fresh plan, no cache of joins
    }
    spark.stop()
  }
}
