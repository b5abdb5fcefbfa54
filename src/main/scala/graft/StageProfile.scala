package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage scaling profile: times each pipeline stage SEPARATELY
  * (upstream materialized via localCheckpoint so a stage's time is its
  * own work, not its lineage), printing one JSON line per stage. Run at
  * two core counts in fresh JVMs to see which stage fails to scale.
  *
  * Usage: runMain graft.StageProfile <cores> [nEntities]
  */
object StageProfile {

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 4
    val nEntities = if (args.length > 1) args(1).toLong else 150000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-stage-profile-$cores")
      // Shuffle width is data-sized, not core-sized: start wide and let AQE
      // coalesce to the advisory target. core*2 width made the 5 GB
      // pair-join shuffles land in ~660 MB partitions whose sort-merge
      // sorts spilled to disk — and disk does not scale with cores.
      .config("spark.sql.shuffle.partitions", "1024")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      // hash-join instead of sort-merge where the per-partition build side
      // fits (it does, at 64 MB partitions): no giant per-partition sorts
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // decompressed 64 MB partitions spilled the pair-join sorts/aggs at
      // 4 cores (3 GB spill measured); 16 MB keeps every operator in memory
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.ErPipeline
    val cfg = ErPipeline.Config()

    // warmup end-to-end at tiny scale
    ErPipeline.run(spark, graft.sources.WebPageGen.pages(spark, 200L).toDF, cfg)
      .clusters.count()

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"stage":"$name","cores":$cores,"sec":$sec%.1f}""")
      r
    }

    val pages = graft.sources.WebPageGen.pages(spark, nEntities).toDF.cache()
    val n = pages.count()
    println(s"""{"stage":"_pages","cores":$cores,"n":$n}""")

    val sigs = timed("extract_normalize_signatures") {
      ErPipeline.signatures(ErPipeline.normalize(ErPipeline.extract(pages)), cfg)
        .localCheckpoint()
    }
    val cands = timed("candidates") {
      ErPipeline.candidates(sigs, cfg).localCheckpoint()
    }
    println(s"""{"stage":"_cands","cores":$cores,"n":${cands.count()}}""")
    val scored = timed("scores") {
      ErPipeline.scorePairs(cands, sigs, cfg).localCheckpoint()
    }
    val edges = timed("edges_filter") {
      scored.filter(col("matches")).select("url1", "url2").localCheckpoint()
    }
    println(s"""{"stage":"_edges","cores":$cores,"n":${edges.count()}}""")
    timed("clusters_cc") {
      graft.operators.Clustering
        .clusterAll(sigs.select("url"), "url", edges, "url1", "url2")
        .select("cluster_id").distinct().count()
    }
    spark.stop()
  }
}
