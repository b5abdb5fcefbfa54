package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Relabel
import graft.pipeline.ErPipeline
import graft.sources.{CsvContacts, WebPageGen}

/** Training-side label plumbing (J1, A2, A4/A5, F14/F15, P10), the
  * validated CSV source (S1/S2) and pooled-mode candidates (G1).
  */
class RelabelSpec extends SparkSpec {
  import spark.implicits._

  test("corrections join overwrites labels on full key match (J1)") {
    val df = Seq(("john", "smith", 1), ("ann", "lee", -1), ("bo", "xu", 1))
      .toDF("first", "last", "label")
    val corr = Seq(("ann", "lee", 1)).toDF("first", "last", "label")
    val got = Relabel.applyCorrections(df, corr, Seq("first", "last"))
      .orderBy("first").collect().map(r => (r.getString(0), r.getInt(2))).toSeq
    assert(got === Seq(("ann", 1), ("bo", 1), ("john", 1)))
  }

  test("class balancing undersamples to the minority class, deterministically (A2)") {
    val df = (1 to 90).map(i => (i, if (i <= 30) 1 else -1)).toDF("id", "label")
    val bal = Relabel.balanceClasses(df, "label", seed = 0L)
    val counts = bal.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts === Map(1 -> 30L, -1 -> 30L))
    val again = Relabel.balanceClasses(df, "label", seed = 0L)
    assert(bal.collect().toSet === again.collect().toSet)
  }

  test("train/val split partitions without overlap (A4); shuffle keeps rows (A5)") {
    val df = (1 to 200).toDF("id")
    val (tr, va) = Relabel.trainValSplit(df, 0.25, seed = 7L)
    assert(tr.count() + va.count() === 200)
    assert(tr.join(va, "id").count() === 0)
    assert(Relabel.shuffle(df, 3L).count() === 200)
  }

  test("label codecs (F14/F15)") {
    val got = Seq(true, false).toDF("b")
      .select(Relabel.boolToPm1($"b").as("pm"), Relabel.pm1ToProb(lit(-1)).as("p"))
      .collect()
    assert(got.map(_.getDouble(0)).toSeq === Seq(1.0, -1.0))
    assert(got.head.getDouble(1) === 0.0)
  }

  test("range guard passes valid values and raises on violations (P10)") {
    val ok = Seq(0.5, -1.0, 1.0).toDF("c")
      .select(Relabel.assertInRange($"c", -1, 1, "cosine").as("c"))
    assert(ok.collect().map(_.getDouble(0)).toSeq === Seq(0.5, -1.0, 1.0))
    val bad = Seq(1.5).toDF("c")
      .select(Relabel.assertInRange($"c", -1, 1, "cosine").as("c"))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage.contains("cosine out of"))
  }

  test("validated CSV source splits valid/invalid rows (S1/S2)") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("contacts.csv")
    Files.writeString(f,
      "first_name,last_name,email\n" +
        "John,Smith,j@x.com\n" +
        "Ana,Café,a@x.com\n" + // non-ascii -> invalid
        "Bo,,b@x.com\n")
    val (valid, invalid) = CsvContacts.readSplit(spark, f.toString)
    assert(valid.count() === 2)
    assert(invalid.count() === 1)
    // empty-string (not NULL) absent-value semantics
    assert(valid.filter($"last_name" === "").count() === 1)
    assert(valid.filter($"last_name".isNull).count() === 0)
  }

  test("pooled-mode candidates join two pools without canonicalization (G1)") {
    val pages = WebPageGen.pages(spark, 30L).toDF
    val sigs = ErPipeline.signatures(
      ErPipeline.normalize(ErPipeline.extract(pages))).cache()
    // pools that genuinely share blocking keys: base pages vs variants
    // (the reference's Pooled mode matches a source pool against a
    // search pool, run_search.py:34-47)
    val poolA = sigs.filter($"url".endsWith("/base"))
    val poolB = sigs.filter(!$"url".endsWith("/base"))
    val cands = ErPipeline.candidatesPooled(poolA, poolB)
    assert(cands.count() > 0)
    // source slot always holds pool-A urls
    val aUrls = poolA.select("url").as[String].collect().toSet
    assert(cands.select("url1").as[String].collect().forall(aUrls.contains))
    assert(cands.select("url2").as[String].collect().forall(u => !aUrls.contains(u)))
    // n_closest cap applies per SOURCE record in pooled mode too
    val capped = ErPipeline.candidatesPooled(poolA, poolB,
      ErPipeline.Config(maxCandidatesPerRecord = 3))
    val maxFan = capped.groupBy("url1").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxFan <= 3, s"pooled cap violated: $maxFan")
    assert(capped.columns.toSeq === cands.columns.toSeq)
  }
}
