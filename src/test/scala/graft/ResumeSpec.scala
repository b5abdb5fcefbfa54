package graft

import java.nio.file.{Files, Paths}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.pipeline.ErPipeline
import graft.plans.StageStore
import graft.sources.WebPageGen

/** Checkpoint/resume semantics (SURVEY.md par.5 item 4): identical output
  * after resume, stages skipped when manifests match, version guard (G2),
  * recompute on changed input.
  */
class ResumeSpec extends SparkSpec {

  private def tmpRoot(): String = {
    val p = Files.createTempDirectory("graft-stages")
    p.toString
  }

  private def rmrf(root: String): Unit = {
    val p = Paths.get(root)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
  }

  test("stage is computed once, then read back from checkpoint") {
    val root = tmpRoot()
    try {
      var computeCount = 0
      def once(): org.apache.spark.sql.DataFrame = {
        computeCount += 1
        spark.range(100).toDF("id").withColumn("v", col("id") * 2)
      }
      val a = StageStore.runStage(spark, root, "s1", "v1", "fp-A")(once())
      assert(computeCount === 1 && a.count() === 100)
      val b = StageStore.runStage(spark, root, "s1", "v1", "fp-A")(once())
      assert(computeCount === 1, "matching manifest must skip recompute")
      assert(b.count() === 100)
      // changed input fingerprint -> recompute
      StageStore.runStage(spark, root, "s1", "v1", "fp-B")(once())
      assert(computeCount === 2)
      // changed params -> recompute
      StageStore.runStage(spark, root, "s1", "v1", "fp-B", Map("k" -> "1"))(once())
      assert(computeCount === 3)
    } finally rmrf(root)
  }

  test("manifest carries per-partition lineage stats") {
    val root = tmpRoot()
    try {
      StageStore.runStage(spark, root, "s2", "v1", "fp") {
        spark.range(1000).toDF("id").repartition(4)
      }
      val json = new String(Files.readAllBytes(Paths.get(root, "s2", "manifest.json")))
      assert(json.contains("\"rows\":1000"))
      assert(json.contains("\"partitions\":["))
      assert(json.contains("\"checksum\":"))
      assert(json.contains("\"pipeline_version\":\"v1\""))
    } finally rmrf(root)
  }

  test("pipeline-version mismatch refuses to reuse stale stages (G2 guard)") {
    val root = tmpRoot()
    try {
      StageStore.runStage(spark, root, "s3", "v1", "fp")(spark.range(5).toDF("id"))
      val e = intercept[IllegalStateException] {
        StageStore.runStage(spark, root, "s3", "v2", "fp")(spark.range(5).toDF("id"))
      }
      assert(e.getMessage.contains("pipeline version"))
    } finally rmrf(root)
  }

  test("changing an upstream stage param invalidates all downstream stages") {
    val root = tmpRoot()
    try {
      val pages = WebPageGen.pages(spark, 40L).toDF
      ErPipeline.run(spark, pages, ErPipeline.Config(outRoot = root))
      val scores1 = Files.readAllBytes(Paths.get(root, "scores", "manifest.json"))
      val clusters1 = Files.readAllBytes(Paths.get(root, "clusters", "manifest.json"))
      // lshBits is a SIGNATURES-stage param; scores/clusters params are
      // unchanged — without fingerprint chaining they would be served stale
      ErPipeline.run(spark, pages, ErPipeline.Config(outRoot = root, lshBits = 12))
      val scores2 = Files.readAllBytes(Paths.get(root, "scores", "manifest.json"))
      val clusters2 = Files.readAllBytes(Paths.get(root, "clusters", "manifest.json"))
      assert(scores2.toSeq !== scores1.toSeq,
        "scores stage must recompute when an upstream param changes")
      assert(clusters2.toSeq !== clusters1.toSeq,
        "clusters stage must recompute when an upstream param changes")
      // toggling useLsh changes signatures() output (block_keys gain/lose
      // LSH keys) — it must invalidate the signatures stage and the chain
      val sigs2 = Files.readAllBytes(Paths.get(root, "signatures", "manifest.json"))
      ErPipeline.run(spark, pages,
        ErPipeline.Config(outRoot = root, lshBits = 12, useLsh = false))
      val sigs3 = Files.readAllBytes(Paths.get(root, "signatures", "manifest.json"))
      val clusters3 = Files.readAllBytes(Paths.get(root, "clusters", "manifest.json"))
      assert(sigs3.toSeq !== sigs2.toSeq,
        "signatures stage must recompute when useLsh toggles")
      assert(clusters3.toSeq !== clusters2.toSeq,
        "downstream stages must recompute when useLsh toggles")
    } finally rmrf(root)
  }

  test("resume refuses a stage whose parquet no longer matches its lineage") {
    val root = tmpRoot()
    try {
      var computed = 0
      def make(): org.apache.spark.sql.DataFrame = {
        computed += 1
        spark.range(1000).toDF("id").repartition(4)
      }
      StageStore.runStage(spark, root, "s4", "v1", "fp")(make())
      assert(computed === 1)
      // normal-path resume: lineage aggregate matches, stage is read back
      StageStore.runStage(spark, root, "s4", "v1", "fp")(make()).count()
      assert(computed === 1)
      // corrupt the stage: drop one part file (valid parquet dir, fewer rows)
      val part = Files.list(Paths.get(root, "s4", "data.parquet"))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst().get()
      Files.delete(part)
      val e = intercept[IllegalStateException] {
        StageStore.runStage(spark, root, "s4", "v1", "fp")(make()).count()
      }
      assert(e.getMessage.contains("lineage"))
    } finally rmrf(root)
  }

  test("lineage refusal localizes the corruption to a named part file") {
    val root = tmpRoot()
    try {
      StageStore.runStage(spark, root, "s5", "v1", "fp") {
        spark.range(1000).toDF("id").repartition(4)
      }
      // clobber part B with a copy of part A: the directory still reads as
      // valid parquet, but partition B's content no longer matches its
      // recorded (rows, checksum) — the refusal must NAME file B
      val parts = Files.list(Paths.get(root, "s5", "data.parquet"))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .sorted().toArray(new Array[java.nio.file.Path](_))
      assert(parts.length >= 2)
      Files.copy(parts(0), parts(1),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // keep Hadoop's local-FS .crc sidecar consistent with the new bytes:
      // the corruption under test is wrong CONTENT, not bit rot
      def crc(p: java.nio.file.Path) =
        p.resolveSibling("." + p.getFileName.toString + ".crc")
      if (Files.exists(crc(parts(0))))
        Files.copy(crc(parts(0)), crc(parts(1)),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val e = intercept[IllegalStateException] {
        StageStore.runStage(spark, root, "s5", "v1", "fp") {
          spark.range(1000).toDF("id").repartition(4)
        }.count()
      }
      assert(e.getMessage.contains("lineage"))
      assert(e.getMessage.contains(parts(1).getFileName.toString),
        s"refusal must name the corrupt file: ${e.getMessage}")
      assert(!e.getMessage.contains(parts(0).getFileName.toString),
        "intact files must not be implicated")
    } finally rmrf(root)
  }

  test("pre-file-keying manifests resume via the keying-independent global check") {
    val root = tmpRoot()
    try {
      StageStore.runStage(spark, root, "s6", "v1", "fp") {
        spark.range(1000).toDF("id").repartition(4)
      }
      // rewrite the manifest as the OLD format: no stat_keying marker and
      // partition ids that don't correspond to part-file indexes (the old
      // code keyed by read-partition id) — resume must fall back to the
      // global (rows, xor) check instead of refusing intact data
      val mp = Paths.get(root, "s6", "manifest.json")
      var json = new String(Files.readAllBytes(mp))
      assert(json.contains("\"stat_keying\":\"file\""))
      json = json.replace("\"stat_keying\":\"file\",", "")
        .replace("\"partition\":0", "\"partition\":9")
      Files.write(mp, json.getBytes)
      var recomputed = false
      val df = StageStore.runStage(spark, root, "s6", "v1", "fp") {
        recomputed = true
        spark.range(1000).toDF("id").repartition(4)
      }
      assert(!recomputed, "legacy manifest must still skip recompute")
      assert(df.count() === 1000)
      // and genuine corruption still refuses under the legacy path
      val part = Files.list(Paths.get(root, "s6", "data.parquet"))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst().get()
      Files.delete(part)
      val e = intercept[IllegalStateException] {
        StageStore.runStage(spark, root, "s6", "v1", "fp") {
          spark.range(1000).toDF("id").repartition(4)
        }.count()
      }
      assert(e.getMessage.contains("lineage"))
    } finally rmrf(root)
  }

  test("full pipeline run resumes mid-pipeline with identical final output") {
    val root = tmpRoot()
    try {
      val pages = WebPageGen.pages(spark, 40L).toDF
      val cfg = ErPipeline.Config(outRoot = root)
      val first = ErPipeline.run(spark, pages, cfg)
      val firstClusters = first.clusters.collect().map(r => (r.getString(0), r.getString(1))).sorted

      // simulate kill-after-stage-k: drop the two final stage outputs
      rmrf(s"$root/scores"); rmrf(s"$root/clusters")
      val second = ErPipeline.run(spark, pages, cfg)
      val secondClusters = second.clusters.collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(firstClusters === secondClusters)

      // third run with nothing deleted: all stages skipped -> manifests byte-stable
      val m1 = Files.readAllBytes(Paths.get(root, "normalize", "manifest.json"))
      ErPipeline.run(spark, pages, cfg)
      val m2 = Files.readAllBytes(Paths.get(root, "normalize", "manifest.json"))
      assert(m1.toSeq === m2.toSeq, "skipped stage must not rewrite its manifest")
    } finally rmrf(root)
  }

  test("compaction: fewer range-disjoint files, content byte-preserved") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_compact_spec").toString
    try {
      val src = (0L until 1000L).map(i => (i, s"doc$i", (i % 7).toString))
        .toDF("doc_id", "body", "tag")
      src.repartition(16).write.mode("overwrite").parquet(s"$root/frag")
      assert(graft.plans.Compaction.partFiles(s"$root/frag").size === 16)
      val st = graft.plans.Compaction.compact(
        spark, s"$root/frag", s"$root/out", "doc_id", 250L)
      assert(st.rows === 1000L && st.filesBefore === 16 && st.filesAfter === 4)
      val out = spark.read.parquet(s"$root/out")
      // exact content, order-free
      assert(out.orderBy("doc_id").collect().toSeq ===
        src.orderBy("doc_id").collect().toSeq)
      // per-file doc_id ranges disjoint -> footer stats prune scans
      val ranges = out.groupBy(input_file_name().as("f"))
        .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
        .orderBy("lo").collect()
      assert(ranges.length === 4)
      ranges.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) < b.getLong(1))
        case _ =>
      }
    } finally rmrf(root)
  }
}
