package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Guide par.1.4/1.5 instrumentation harness (separate from the FROZEN
  * graft.Bench): times selected catalog queries through the same noop sink
  * and session configuration as the official bench, and additionally
  * records, per query: the formatted physical plan (written under
  * plans/r06/), the number of Spark stages/tasks, and per-stage max task
  * time — enough to see whether a query is compute-bound, task-latency
  * bound, or collapsed onto too few partitions.
  *
  * Usage: runMain graft.BenchExtra [queryName ...]  (no args = all)
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench;
  *      SPARK_GRAFT_PLANS_DIR to override the plan output dir (default
  *      none — pass it explicitly to write plan files).
  */
object BenchExtra {

  final class StageStats extends SparkListener {
    case class S(stageId: Int, name: String, tasks: Int, runMs: Long, maxTaskMs: Long)
    val stages = new scala.collection.mutable.ArrayBuffer[S]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      stages.synchronized {
        stages += S(si.stageId, si.name, si.numTasks,
          si.taskMetrics.executorRunTime, 0L)
      }
    }
    def reset(): Unit = stages.synchronized(stages.clear())
    def summary(): String = stages.synchronized {
      val n = stages.length
      val tasks = stages.map(_.tasks).sum
      val runMs = stages.map(_.runMs).sum
      val top = stages.sortBy(-_.runMs).take(5)
        .map(s => s"""{"stage":${s.stageId},"tasks":${s.tasks},"runMs":${s.runMs}}""")
        .mkString("[", ",", "]")
      s""""n_stages":$n,"n_tasks":$tasks,"task_run_ms":$runMs,"top_stages":$top"""
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
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
    val stats = new StageStats
    spark.sparkContext.addSparkListener(stats)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // same warmup as Bench so codegen/JIT startup is not billed
    graft.queries.Catalog.queries.get("q_multi_join").foreach(q => noop(q(spark, sfDir)))
    graft.queries.Catalog.queries.get("er_blocking_pairs")
      .foreach(q => noop(q(spark, "/root/testdata/sf0.001")))

    val names =
      if (args.nonEmpty) args.toSeq
      else graft.queries.Catalog.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.queries.Catalog.queries.get(name) match {
        case None => println(s"""{"query":"$name","error":"unknown"}""")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"bench-extra: $name")
          plansDir.foreach { d =>
            try {
              val plan = fn(spark, sfDir).queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              val p = java.nio.file.Paths.get(d)
              java.nio.file.Files.createDirectories(p)
              java.nio.file.Files.write(p.resolve(s"$name.txt"),
                plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            } catch { case e: Throwable => System.err.println(s"plan $name: $e") }
          }
          stats.reset()
          val t0 = System.nanoTime()
          val err = try { noop(fn(spark, sfDir)); None }
          catch { case e: Throwable => Some(e.getClass.getSimpleName) }
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"""{"query":"$name","sec":$sec%.3f,${stats.summary()}${
            err.fold("")(e => s""","error":"$e"""")}}""")
          spark.sparkContext.setJobDescription(null)
      }
    }
    spark.stop()
  }
}
