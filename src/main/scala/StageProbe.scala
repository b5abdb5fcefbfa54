object StageProbe {
  def main(a: Array[String]): Unit = {
    val cores = a(0).toInt
    val n = a(1).toLong
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores*2).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE","true"))
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.ErPipeline
    val w = graft.sources.WebPageGen.pages(spark, 200L).toDF
    ErPipeline.run(spark, w, ErPipeline.Config()).clusters.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] cores=$cores $name ${(System.nanoTime()-t0)/1e9}%.1fs"); r
    }
    val pages = graft.sources.WebPageGen.pages(spark, n).toDF.cache()
    println("pages=" + pages.count())
    val cfg = ErPipeline.Config()
    val sigs = time("norm+sigs") {
      val s = ErPipeline.signatures(ErPipeline.normalize(ErPipeline.extract(pages)), cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val cands = time("candidates") {
      val c = ErPipeline.candidates(sigs, cfg).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println("cands=" + c.count()); c
    }
    val scored = time("scores") {
      val sc = ErPipeline.scorePairs(cands, sigs, cfg).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sc.count(); sc
    }
    time("clusters") { ErPipeline.clusters(sigs, scored).count() }
    spark.stop()
  }
}
