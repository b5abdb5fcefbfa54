package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic: where does the scores stage's time go at a given core
  * count — compute (executorRunTime ~= cores * wall), GC, shuffle I/O, or
  * spill? Prints aggregate task metrics per timed section.
  *
  * Usage: runMain graft.ScoreProbe <cores> [nEntities]
  */
object ScoreProbe {

  final class Acc extends SparkListener {
    val tasks = new LongAdder
    val runTime = new LongAdder
    val gcTime = new LongAdder
    val cpuTime = new LongAdder
    val shufRead = new LongAdder
    val shufWrite = new LongAdder
    val memSpill = new LongAdder
    val diskSpill = new LongAdder
    val serTime = new LongAdder
    val deserTime = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        tasks.increment()
        runTime.add(m.executorRunTime)
        gcTime.add(m.jvmGCTime)
        cpuTime.add(m.executorCpuTime / 1000000L)
        shufRead.add(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
        memSpill.add(m.memoryBytesSpilled)
        diskSpill.add(m.diskBytesSpilled)
        serTime.add(m.resultSerializationTime)
        deserTime.add(m.executorDeserializeTime)
      }
    }
    def reset(): Unit = Seq(tasks, runTime, gcTime, cpuTime, shufRead,
      shufWrite, memSpill, diskSpill, serTime, deserTime).foreach(_.reset())
  }

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 4
    val nEntities = if (args.length > 1) args(1).toLong else 60000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-score-probe-$cores")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    import graft.pipeline.ErPipeline
    val cfg = ErPipeline.Config()

    def timed[T](name: String)(f: => T): T = {
      acc.reset()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener is async; give it a beat
      Thread.sleep(500)
      println(f"""{"section":"$name","cores":$cores,"wall":$wall%.1f,""" +
        f""""tasks":${acc.tasks.sum},"runTime":${acc.runTime.sum / 1000.0}%.1f,""" +
        f""""cpuTime":${acc.cpuTime.sum / 1000.0}%.1f,"gc":${acc.gcTime.sum / 1000.0}%.1f,""" +
        f""""deser":${acc.deserTime.sum / 1000.0}%.1f,"resSer":${acc.serTime.sum / 1000.0}%.1f,""" +
        f""""shufReadMB":${acc.shufRead.sum / 1e6}%.0f,"shufWriteMB":${acc.shufWrite.sum / 1e6}%.0f,""" +
        f""""memSpillMB":${acc.memSpill.sum / 1e6}%.0f,"diskSpillMB":${acc.diskSpill.sum / 1e6}%.0f}""")
      r
    }

    // warmup codegen
    ErPipeline.run(spark, graft.sources.WebPageGen.pages(spark, 200L).toDF,
      cfg).clusters.count()

    val pages = graft.sources.WebPageGen.pages(spark, nEntities).toDF.cache()
    pages.count()
    val sigs = timed("signatures") {
      ErPipeline.signatures(ErPipeline.normalize(ErPipeline.extract(pages)), cfg)
        .localCheckpoint()
    }
    val cands = timed("candidates") {
      ErPipeline.candidates(sigs, cfg).localCheckpoint()
    }
    val scored = timed("scores") {
      val s = ErPipeline.scorePairs(cands, sigs, cfg)
      val out = s.localCheckpoint()
      val plan = s.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Sort ") || l.contains("Exchange"))
      joins.foreach(l => println("PLAN| " + l.trim.take(150)))
      out
    }
    timed("cc") {
      graft.operators.Clustering
        .clusterAll(sigs.select("url"),
          "url", scored.filter(org.apache.spark.sql.functions.col("matches")),
          "url1", "url2")
        .select("cluster_id").distinct().count()
    }
    spark.stop()
  }
}
