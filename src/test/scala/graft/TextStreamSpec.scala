package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.streaming.StreamingOps

/** Text-analysis operators + streaming batch-equivalence. */
class TextStreamSpec extends SparkSpec {
  import spark.implicits._

  test("language id picks the dominant marker set, fixed tie order") {
    val df = Seq(
      "the quick value in a row the a",   // en markers dominate
      "data table part data table data", // es markers dominate
      "window group batch window",       // de markers dominate
      "nothing matching here")           // all zero -> tie -> en
      .toDF("text")
    val got = df.select(TextAnalysis.langId($"text")).collect().map(_.getString(0)).toSeq
    assert(got === Seq("en", "es", "de", "en"))
  }

  test("quality features: hand-computed values") {
    val r = Seq("the cat and the hat!!").toDF("text")
      .select(
        TextAnalysis.wordCount($"text").as("wc"),
        round(TextAnalysis.stopwordRatio($"text"), 4).as("sr"),
        round(TextAnalysis.punctRatio($"text"), 4).as("pr"))
      .head()
    assert(r.getInt(0) === 5)
    assert(r.getDouble(1) === 0.6) // the, and, the of 5
    assert(r.getDouble(2) === math.rint(2.0 / 21.0 * 10000) / 10000)
  }

  test("token counts: whitespace vs regex tokens") {
    val r = Seq("hello, world! x2").toDF("text")
      .select(
        TextAnalysis.whitespaceTokenCount($"text").as("ws"),
        TextAnalysis.regexTokenCount($"text").as("re"))
      .head()
    assert(r.getInt(0) === 3)
    // hello , world ! x2 -> 5 regex tokens
    assert(r.getInt(1) === 5)
  }

  test("empty/null text is safe across all text operators") {
    val df = Seq("", null.asInstanceOf[String], "   ").toDF("text")
    val got = df.select(
      TextAnalysis.wordCount($"text").as("wc"),
      TextAnalysis.meanWordLen($"text").as("mwl"),
      TextAnalysis.stopwordRatio($"text").as("sr"),
      TextAnalysis.punctRatio($"text").as("pr"),
      TextAnalysis.qualityScore($"text").as("q"),
      TextAnalysis.docFingerprint($"text").as("fp")).collect()
    got.foreach { r =>
      assert(r.getInt(0) === 0)
      assert(r.getDouble(1) === 0.0)
      assert(!r.isNullAt(5))
    }
  }

  test("rolling fingerprint: equal text equal hash, prefix-stable-ish") {
    val h = (s: String) => Seq(s).toDF("t")
      .select(TextAnalysis.rollingFingerprint($"t").as("h")).head().getLong(0)
    assert(h("some long document text here") === h("some long document text here"))
    assert(h("abc") !== h("xyz"))
  }

  test("streaming windowed agg equals the batch computation") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = StreamingOps.windowedEventAgg(spark, path)
      .orderBy("window_start", "event_type").collect()
    val batch = spark.read.parquet(path)
      .groupBy(window($"ts".cast("timestamp"), "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select($"window.start".cast("timestamp_ntz").as("window_start"),
        $"event_type", $"n", $"total_value")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("streaming sessionization produces non-overlapping per-user sessions") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val sessions = StreamingOps.sessionize(spark, path, 10)
    val n = sessions.count()
    assert(n > 0)
    val events = spark.read.parquet(path).count()
    assert(sessions.agg(sum("n_events")).head().getLong(0) === events)
  }
}
