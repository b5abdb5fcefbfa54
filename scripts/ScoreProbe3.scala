package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose the pair-feature-attach join cost: join count, key type,
  * payload width. Usage: runMain graft.ScoreProbe3 <cores> [nEntities]
  */
object ScoreProbe3 {

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 4
    val nEntities = if (args.length > 1) args(1).toLong else 60000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-score-probe3-$cores")
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

    // warm up codegen paths once
    noop(cands.limit(1000).join(lhs.withColumnRenamed("url1", "url1_"),
      col("url1") === col("url1_")).drop("url1_"))

    timed("one_join_wide") {
      noop(cands.join(lhs.withColumnRenamed("url1", "url1_"),
        col("url1") === col("url1_")).drop("url1_"))
    }
    timed("two_joins_wide") {
      noop(cands
        .join(lhs.withColumnRenamed("url1", "url1_"), col("url1") === col("url1_"))
        .drop("url1_")
        .join(rhs.withColumnRenamed("url2", "url2_"), col("url2") === col("url2_"))
        .drop("url2_"))
    }
    timed("two_joins_narrow") {
      val n1 = sigs.select(col("url").as("url1_"), col("name_norm").as("nn1"))
      val n2 = sigs.select(col("url").as("url2_"), col("name_norm").as("nn2"))
      noop(cands
        .join(n1, col("url1") === col("url1_")).drop("url1_")
        .join(n2, col("url2") === col("url2_")).drop("url2_"))
    }
    timed("two_joins_wide_longkey") {
      val candsL = cands.select(xxhash64(col("url1")).as("h1"), xxhash64(col("url2")).as("h2"))
        .localCheckpoint()
      val l1 = lhs.withColumn("h1_", xxhash64(col("url1"))).drop("url1").localCheckpoint()
      val l2 = rhs.withColumn("h2_", xxhash64(col("url2"))).drop("url2").localCheckpoint()
      noop(candsL
        .join(l1, col("h1") === col("h1_")).drop("h1_")
        .join(l2, col("h2") === col("h2_")).drop("h2_"))
    }
    timed("two_joins_noembed") {
      val f1 = sigs.select((Seq(col("url").as("url1_")) ++
        Seq("lang", "name_norm", "name_norm_rev", "email_norm", "phone_norm",
          "state_norm", "zip_norm").map(c => col(c).as(c + "1"))): _*)
      val f2 = sigs.select((Seq(col("url").as("url2_")) ++
        Seq("lang", "name_norm", "name_norm_rev", "email_norm", "phone_norm",
          "state_norm", "zip_norm").map(c => col(c).as(c + "2"))): _*)
      noop(cands
        .join(f1, col("url1") === col("url1_")).drop("url1_")
        .join(f2, col("url2") === col("url2_")).drop("url2_"))
    }
    spark.stop()
  }
}
