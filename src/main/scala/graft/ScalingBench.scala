package graft

import org.apache.spark.sql.SparkSession

/** N-vs-4N scaling evidence (north rule): run the identical ER pipeline
  * job at local[8] and local[32] on the same generated input and report
  * throughput at both plus scaling efficiency = (thr32/thr8)/4.
  * (This sandbox has no real cluster; two parallelism levels in local mode
  * are the sanctioned stand-in — see BASELINE.md.)
  *
  * Usage: runMain graft.ScalingBench [nEntities]
  */
object ScalingBench {

  private def runAt(cores: Int, nEntities: Long): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warmup: exercises generation + all pipeline codegen at small scale
      val w = graft.sources.WebPageGen.pages(spark, 200L).toDF
      graft.pipeline.ErPipeline.run(spark, w, graft.pipeline.ErPipeline.Config())
        .clusters.count()

      val pages = graft.sources.WebPageGen.pages(spark, nEntities).toDF.cache()
      val n = pages.count()
      val t0 = System.nanoTime()
      val res = graft.pipeline.ErPipeline.run(spark, pages, graft.pipeline.ErPipeline.Config())
      res.clusters.select("cluster_id").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      (n / sec, n)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nEntities = if (args.nonEmpty) args(0).toLong else 20000L
    val (thr8, n) = runAt(8, nEntities)
    val (thr32, _) = runAt(32, nEntities)
    val efficiency = (thr32 / thr8) / 4.0
    println(
      f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"pages":$n,""" +
        f""""docs_per_sec_local8":$thr8%.1f,"docs_per_sec_local32":$thr32%.1f,""" +
        f""""speedup":${thr32 / thr8}%.2f}""")
  }
}
