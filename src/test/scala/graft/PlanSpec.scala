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

  test("sorted-neighborhood pairing is join-free: one window, O(n x k) pairs") {
    val df = graft.queries.Catalog.queries("er_sorted_neighbors")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "lead()-window pairing must not plan a self-join:\n" + p.take(800))
    assert(p.contains("Window"), p.take(400))
    // pair volume bound: strictly fewer than n * window pairs
    val n = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(df.count() < n * 4)
  }

  test("ANN LSH candidate dedup carries ids only, never embedding payloads") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.ArrayType
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val plan = graft.operators.Ann
      .lshTopK(e.filter(col("vec_id") < 5), e, "vec_id", "vec_id", "embedding", 3,
        bits = 4, tables = 4)
      .queryExecution.optimizedPlan
    // the candidate distinct is the Aggregate whose output = grouping keys;
    // none of its columns may be an array (the embeddings join back later)
    val distincts = plan.collect {
      case a: Aggregate if a.aggregateExpressions.length == a.groupingExpressions.length => a
    }
    assert(distincts.nonEmpty, "expected a distinct Aggregate in the LSH plan")
    distincts.foreach(_.output.foreach(attr =>
      assert(!attr.dataType.isInstanceOf[ArrayType],
        s"candidate distinct shuffles array column '${attr.name}'")))
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
