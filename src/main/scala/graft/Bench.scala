package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: all catalog queries on SPARK_GRAFT_SF_DIR plus the
  * end-to-end ER pipeline (generated corpus sized to the SF). One warmup
  * execution of a small query first so JVM/codegen startup isn't billed to
  * the first measured query. Prints ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + exercise codegen paths once at tiny scale
    graft.queries.Catalog.queries.get("q_multi_join")
      .foreach(q => q(spark, sfDir).count())
    graft.queries.Catalog.queries.get("er_blocking_pairs")
      .foreach(q => q(spark, "/root/testdata/sf0.001").count())

    val results = graft.queries.Catalog.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // end-to-end ER pipeline throughput on a generated corpus sized to SF
    val nEntities =
      if (sfDir.contains("sf0.001")) 500L
      else if (sfDir.contains("sf0.01")) 2000L
      else 20000L
    val pages = graft.sources.WebPageGen.pages(spark, nEntities).toDF.cache()
    val nPages = pages.count() // materialize generation outside the timing
    val t0 = System.nanoTime()
    val res = graft.pipeline.ErPipeline.run(spark, pages, graft.pipeline.ErPipeline.Config())
    val nClusters = res.clusters.select("cluster_id").distinct().count()
    val pipelineSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nPages / pipelineSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipelineSec
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        f""""er_pipeline_sec":$pipelineSec%.3f,"er_pipeline_pages":$nPages,""" +
        f""""er_pipeline_docs_per_sec":$docsPerSec%.1f,"er_clusters":$nClusters,""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
