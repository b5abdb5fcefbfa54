package graft

import graft.pipeline.ErPipeline
import graft.sources.WebPageGen

/** Physical-plan assertions — the 100 TB story is in the plan shape:
  * filters/projections reach the parquet scan, dimension joins broadcast,
  * pair generation is equi-join keyed by block (never cartesian), custom
  * expressions run inside whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executed(name: String): String =
    graft.queries.Catalog.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("filter + projection push down to the parquet scan") {
    val p = executed("q_filter_project")
    assert(p.contains("PushedFilters"), p.take(400))
    assert(p.contains("LessThan(l_shipdate") || p.contains("l_shipdate"),
      "shipdate predicate should reach the scan")
    assert(p.contains("ReadSchema") &&
      !p.contains("l_extendedprice"), "unused columns must be pruned from the scan")
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = executed("q_join_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("blocking self-join is an equi join on the block key, never cartesian") {
    val p = executed("er_blocking_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("exact embedding near-dup is a tiled equi-join, never cartesian") {
    val p = executed("dedup_embedding")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("ngram-jaccard candidates come from banded equi-joins, never cartesian") {
    val p = executed("dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("custom expressions execute inside whole-stage codegen") {
    // assert on a shuffle-free parquet-sourced plan: AQE-wrapped plans
    // report no codegen subtrees until executed, local relations never
    // whole-stage-codegen - neither says anything about the expression
    import org.apache.spark.sql.functions.col
    val p = spark.read.parquet(s"$dir/documents.parquet")
      .select(graft.functions.Similarity.jaroWinkler(col("text"), col("lang")).as("jw"),
        graft.functions.Similarity.ngramEmbed(col("text"), 16).as("e"))
    val f = p.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(!f.startsWith("Found 0"), "plan lost whole-stage codegen")
    assert(f.contains("GraftKernels"), "custom kernels not inlined into generated code")
  }

  test("pipeline candidates plan: equi joins keyed by block, AQE enabled") {
    val pages = WebPageGen.pages(spark, 50L).toDF
    val sigs = ErPipeline.signatures(ErPipeline.normalize(ErPipeline.extract(pages)))
    val cands = ErPipeline.candidates(sigs)
    val p = cands.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("AdaptiveSparkPlan"), "AQE should wrap the plan")
  }

  test("scorePairs joins stay equi (hash/sort-merge) on url keys") {
    val pages = WebPageGen.pages(spark, 50L).toDF
    val sigs = ErPipeline.signatures(ErPipeline.normalize(ErPipeline.extract(pages)))
    val scored = ErPipeline.scorePairs(ErPipeline.candidates(sigs), sigs)
    val p = scored.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }
}
