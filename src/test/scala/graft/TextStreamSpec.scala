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

  test("PII redaction rewrites emails and phones, counts what it found") {
    val r = Seq("mail a.b-c@foo.co.uk now or 555-123-4567, else 12-34").toDF("text")
      .select(
        TextAnalysis.emailCount($"text").as("ne"),
        TextAnalysis.phoneCount($"text").as("np"),
        TextAnalysis.redactPii($"text").as("red"))
      .head()
    assert(r.getInt(0) === 1 && r.getInt(1) === 1)
    assert(r.getString(2) === "mail [EMAIL] now or [PHONE], else 12-34")
    // word-boundary guard: digits embedded in longer runs don't match
    val r2 = Seq("id 9555-123-45678 x").toDF("text")
      .select(TextAnalysis.phoneCount($"text")).head()
    assert(r2.getInt(0) === 0)
  }

  test("repetition signals: unique-word and bigram fractions") {
    val r = Seq("spam spam spam ham").toDF("text")
      .select(
        round(TextAnalysis.uniqueWordFrac($"text"), 4).as("uw"),
        TextAnalysis.wordBigrams($"text").as("bg"))
      .head()
    assert(r.getDouble(0) === 0.5) // {spam, ham} of 4
    assert(r.getSeq[String](1) === Seq("spam spam", "spam spam", "spam ham"))
    // degenerate shapes
    val d = Seq("", "one").toDF("text")
      .select(TextAnalysis.uniqueWordFrac($"text").as("uw"),
        size(TextAnalysis.wordBigrams($"text")).as("nbg"))
      .collect()
    assert(d(0).getDouble(0) === 0.0 && d(0).getInt(1) === 0)
    assert(d(1).getDouble(0) === 1.0 && d(1).getInt(1) === 0)
  }

  test("context-window chunking: exact boundaries at the window edge") {
    val mk = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    // 64 words -> one full chunk; 65 -> full chunk + 1-word tail
    val rows = graft.queries.Catalog.queries("text_chunks")(spark, "/root/testdata/sf0.001")
    assert(rows.columns.toSeq === Seq("doc_id", "chunk_idx", "n_tokens", "chunk"))
    val df = Seq((1L, mk(64)), (2L, mk(65)), (3L, "solo")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunks").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.Catalog.queries("text_chunks")(spark, tmp)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got === Seq((1L, 0, 64), (2L, 0, 64), (2L, 1, 1), (3L, 0, 1)))
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

  test("streaming wrappers land in a file sink, never a driver memory table") {
    val path = "/root/testdata/sf0.001/events.parquet"
    for (run <- Seq(
        () => StreamingOps.windowedEventAgg(spark, path),
        () => StreamingOps.firstSeenPerUser(spark, path),
        () => StreamingOps.sessionize(spark, path, 10))) {
      run().count()
      val sink = new java.io.File(StreamingOps.lastSinkPath)
      assert(sink.isDirectory, s"expected a parquet sink dir at $sink")
      assert(sink.listFiles().exists(_.getName.endsWith(".parquet")),
        s"sink dir $sink holds no parquet part files")
    }
    // no in-memory result tables registered by any wrapper
    val memTables = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_stream"))
    assert(memTables.isEmpty, s"driver-resident memory tables: ${memTables.toSeq}")
  }

  test("first-seen state is correct under multi-batch delivery") {
    // two files, delivered as separate micro-batches (maxFilesPerTrigger=1),
    // where the SECOND batch carries the earlier event for user 1 — the
    // cross-batch state must supersede batch 1's emission
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mb").toFile
    val f1 = new java.io.File(dir, "b1")
    val f2 = new java.io.File(dir, "b2")
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    Seq(
      (10L, ts(5), 1L, "view", 1.0),
      (11L, ts(3), 2L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(f1.getPath)
    Seq(
      (12L, ts(2), 1L, "click", 3.0), // earlier than user 1's batch-1 event
      (13L, ts(7), 2L, "click", 4.0)) // later than user 2's batch-1 event
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(f2.getPath)
    // file source orders batches by modification time: make b2 strictly newer
    val now = System.currentTimeMillis()
    f1.listFiles().foreach(_.setLastModified(now - 60000))
    f2.listFiles().foreach(_.setLastModified(now))
    // single flat dir of parquet part files
    val flat = new java.io.File(dir, "flat"); flat.mkdirs()
    Seq(f1, f2).zipWithIndex.foreach { case (d, i) =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
        case (pf, j) =>
          val tgt = new java.io.File(flat, s"part-$i-$j.parquet")
          java.nio.file.Files.copy(pf.toPath, tgt.toPath)
          tgt.setLastModified(now - (1 - i) * 60000)
      }
    }
    val got = StreamingOps.firstSeenPerUser(spark, flat.getPath, maxFilesPerTrigger = Some(1))
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 12L), (2L, 11L)),
      s"multi-batch first-seen diverged from the batch oracle: $got")
  }

  test("watermark genuinely discards late rows (append mode, state-store metric)") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val got = StreamingOps.lateDataWindowedAgg(spark, path)
      .orderBy("window_start").collect()
    // the discard is asserted from the state store's own counter (the
    // filter runs post-partial-aggregation, so the count is in window
    // keys, not raw rows — nonzero means the drop really happened)
    assert(StreamingOps.lastDroppedByWatermark > 0,
      s"late rows absorbed, not dropped (metric ${StreamingOps.lastDroppedByWatermark})")
    // batch oracle: the day-2 windows the final watermark closed (same
    // every-5th-event subsample the operator stages)
    val ontime = spark.read.parquet(path)
      .filter($"event_id" % 5 === 0)
      .select(
      (to_timestamp(lit("2026-01-02 00:00:00")) +
        expr("make_interval(0, 0, 0, 0, CAST(event_id % 24 AS INT), 0, 0)")).as("ts"),
      $"value")
    val wm = ontime.agg(max($"ts") - expr("INTERVAL 1 HOUR")).head().getTimestamp(0)
    val expect = ontime
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .filter($"window.end" <= lit(wm))
      .select($"window.start".cast("timestamp_ntz").as("window_start"),
        $"n", $"total_value")
      .orderBy("window_start").collect()
    assert(got.nonEmpty)
    assert(got.toSeq === expect.toSeq)
  }

  test("streaming changelog upserts converge the JDBC target to the batch answer") {
    import graft.sources.JdbcStore
    val path = "/root/testdata/sf0.001/events.parquet"
    val url = JdbcStore.derbyUrl(s"stream_${System.nanoTime()}")
    StreamingOps.firstSeenToJdbc(spark, path, url, "first_seen")
    val got = JdbcStore.read(spark, url, "first_seen")
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = spark.read.parquet(path)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy($"ts", $"event_id")))
      .filter($"rk" === 1)
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expect)
    assert(got.nonEmpty)
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
