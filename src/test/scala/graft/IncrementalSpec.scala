package graft

import org.apache.spark.sql.functions._

import graft.pipeline.ErPipeline
import graft.sources.WebPageGen

/** SURVEY.md par.5 item 5: an incremental re-run with m updated rows
  * re-scores only the affected pairs and produces exactly the same final
  * state a full recompute would.
  */
class IncrementalSpec extends SparkSpec {

  test("incremental run rescoring == full recompute; untouched pairs reused") {
    val cfg = ErPipeline.Config()
    val pages0 = WebPageGen.pages(spark, 80L).toDF.cache()
    val full0 = ErPipeline.run(spark, pages0, cfg)
    val sigs0 = full0.signatures.cache()
    val scored0 = full0.scored.cache()
    scored0.count()

    // new snapshot: 10 entities' base pages get a bumped warc_ts (their
    // html/text are regenerated identically -> scores must not change
    // values, but those pairs MUST be re-scored), plus 5 brand-new entities
    val bumped = pages0
      .filter(col("url").endsWith("/base") && col("url").contains("/profile/1"))
      .withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 1 DAY"))
    val newEntities = WebPageGen.pages(spark, 85L).toDF
      .join(pages0.select("url"), Seq("url"), "left_anti")
    val pages1 = pages0
      .join(bumped.select("url"), Seq("url"), "left_anti")
      .unionByName(bumped)
      .unionByName(newEntities)
      .cache()

    val clusters0 = full0.clusters.cache()
    clusters0.count()
    val (inc, stats) = ErPipeline.runIncremental(spark, pages1, sigs0, scored0, cfg,
      priorClusters = Some(clusters0))
    info(s"stale=${stats.staleRowCount} rescored=${stats.rescoredPairs} " +
      s"reused=${stats.reusedPairs} reclusteredEdges=${stats.clusterEdgesReclustered}" +
      s"/${stats.clusterEdgesTotal}")
    // incremental clustering re-converges only the affected subgraph:
    // the CC input must shrink vs the full edge set
    assert(stats.clusterEdgesReclustered >= 0L
      && stats.clusterEdgesReclustered < stats.clusterEdgesTotal,
      s"CC input did not shrink: ${stats.clusterEdgesReclustered}/${stats.clusterEdgesTotal}")

    // stale set = bumped bases + all pages of the 5 new entities
    assert(stats.staleRowCount === bumped.count() + newEntities.count())
    assert(stats.reusedPairs > 0, "unchanged pairs must be reused, not recomputed")

    // equivalence with a full recompute on the new snapshot
    val fullRes = ErPipeline.run(spark, pages1, cfg)
    val incPairs = inc.scored.select("url1", "url2", "score", "matches")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    val fullPairs = fullRes.scored.select("url1", "url2", "score", "matches")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    assert(incPairs === fullPairs,
      s"missing=${(fullPairs -- incPairs).take(3)} extra=${(incPairs -- fullPairs).take(3)}")

    val incClusters = inc.clusters.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val fullClusters = fullRes.clusters.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(incClusters === fullClusters)
  }

  test("incremental candidate generation keys O(stale-touched blocks), not O(corpus)") {
    val cfg = ErPipeline.Config()
    val pages0 = WebPageGen.pages(spark, 200L).toDF.cache()
    val full0 = ErPipeline.run(spark, pages0, cfg)
    val sigs0 = full0.signatures.cache()
    sigs0.count()

    // a small delta: 3 entities' base pages bumped
    val bumped = pages0
      .filter(col("url").endsWith("/base"))
      .orderBy("url").limit(3)
      .withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 1 DAY"))
    val pages1 = pages0
      .join(bumped.select("url"), Seq("url"), "left_anti")
      .unionByName(bumped)
      .cache()

    val stale = ErPipeline.staleRows(pages1, sigs0.select("url", "warc_ts"), "url", "warc_ts")
    val staleSigs = ErPipeline.signatures(
      ErPipeline.normalize(ErPipeline.extract(stale)), cfg)
    val touched = sigs0
      .join(stale.select("url"), Seq("url"), "left_semi")
      .select(explode(col("block_keys")).as("bk"))
      .unionByName(staleSigs.select(explode(col("block_keys")).as("bk")))
      .distinct()

    val fullKeyed = ErPipeline.keyedBlocks(sigs0, None).count()
    val scopedKeyed = ErPipeline.keyedBlocks(sigs0, Some(touched)).count()
    info(s"keyed rows: full=$fullKeyed scoped=$scopedKeyed touchedBlocks=${touched.count()}")
    // the candidate stage's keyed input must shrink with the stale block
    // population — 3 stale entities out of 200 must not re-key the corpus
    assert(scopedKeyed < fullKeyed / 4,
      s"scoped keyed rows $scopedKeyed not proportional to stale blocks (full $fullKeyed)")
    assert(scopedKeyed > 0L)
  }

  test("batchLimit caps an incremental run at the oldest stale rows") {
    val cfg = ErPipeline.Config()
    val pages0 = WebPageGen.pages(spark, 40L).toDF.cache()
    val full0 = ErPipeline.run(spark, pages0, cfg)
    val sigs0 = full0.signatures.cache()
    val scored0 = full0.scored.cache()
    scored0.count()

    // bump 12 urls; cap the run at 5 -> exactly the 5 oldest get processed
    val bumped = pages0.orderBy("url").limit(12)
      .withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 1 DAY"))
    val pages1 = pages0
      .join(bumped.select("url"), Seq("url"), "left_anti")
      .unionByName(bumped)
      .cache()
    val capped = cfg.copy(batchLimit = 5)
    // drain in rounds of <= 5 until no rows are stale: 12 rows -> 5, 5, 2.
    // localCheckpoint between rounds truncates lineage, as a real caller
    // materializing each increment would (checkpoint/Iceberg commit).
    var sigs = sigs0
    var scored = scored0
    var processed = Seq.empty[Long]
    var done = false
    while (!done && processed.size < 6) {
      val (res, st) = ErPipeline.runIncremental(spark, pages1, sigs, scored, capped)
      if (st.staleRowCount == 0L) done = true
      else {
        processed :+= st.staleRowCount
        sigs = res.signatures.localCheckpoint(true)
        scored = res.scored.localCheckpoint(true)
      }
    }
    assert(processed === Seq(5L, 5L, 2L),
      s"12 rows at batchLimit=5 should drain oldest-first in 3 rounds, got $processed")
  }
}
