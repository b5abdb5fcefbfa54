object ScaleProbe2 {
  def main(a: Array[String]): Unit = {
    val cores = a(0).toInt
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",(cores*2).toString)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p] cores=$cores $name ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    time("warm")(spark.range(1000000L).agg(sum(col("id"))).head())
    time("range-sum")(spark.range(4000000000L).agg(sum(col("id") % 97)).head())
    val pages = graft.sources.WebPageGen.pages(spark, 40000L).toDF.cache()
    pages.count()
    time("scan-cached")(pages.agg(sum(length(col("text")))).head())
    time("extract")(graft.pipeline.ErPipeline.extract(pages).agg(sum(length(col("email")))).head())
    val jw = graft.functions.Similarity.jaroWinkler(col("text"), col("u2"))
    val crossed = pages.select(col("text"), substring(col("url"),1,40).as("u2"))
    time("jw-map")(crossed.select(sum(jw)).head())
    spark.stop()
  }
}
