package graft

import org.apache.spark.sql.SparkSession

/** The bench's ER-pipeline leg in isolation (same session config, same
  * action as graft.Bench lines 101-112) — for interleaved A/B timing of
  * pipeline changes without the 69-query preamble.
  */
object BenchPipe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup at tiny scale (same shape as Bench's warmup intent)
    graft.pipeline.ErPipeline
      .run(spark, graft.sources.WebPageGen.pages(spark, 200L).toDF,
        graft.pipeline.ErPipeline.Config())
      .clusters.select("cluster_id").distinct().count()
    val pages = graft.sources.WebPageGen.pages(spark, 20000L).toDF.cache()
    val nPages = pages.count()
    val t0 = System.nanoTime()
    val res = graft.pipeline.ErPipeline.run(spark, pages, graft.pipeline.ErPipeline.Config())
    val n = res.clusters.select("cluster_id").distinct().count()
    val sec = (System.nanoTime() - t0) / 1e9
    def loadNow(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0)
      catch { case _: Throwable => "-1" }
    println(f"""{"pipe_sec":$sec%.2f,"pages":$nPages,"clusters":$n,"load":${loadNow()}}""")
    spark.stop()
  }
}
