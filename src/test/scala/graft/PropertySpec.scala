package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{GraftKernels, Normalize}

/** Property-based tests (SURVEY.md par.5 item 2) using ScalaCheck
  * generators sampled over fixed seeds (the scalatest-scalacheck bridge is
  * not on the offline classpath, so sampling is driven manually —
  * deterministic by construction).
  */
class PropertySpec extends SparkSpec {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      (8, Gen.alphaNumChar),
      (2, Gen.const(' ')),
      (1, Gen.oneOf('.', '-', '@', '\'', '!')))).map(_.mkString)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("normalization is idempotent and length-bounded") {
    val maxes = samples(Gen.choose(1, 60), 200)
    samples(asciiText, 200).zip(maxes).foreach { case (s, max) =>
      val once = Normalize.normalizeJvm(Seq(s), max)
      val twice = Normalize.normalizeJvm(Seq(once), max)
      assert(once === twice, s"not idempotent for ${s.take(40)} max=$max")
      assert(once.length <= max)
    }
  }

  test("tokenizer output is always exactly maxLength, pad-suffixed, in-vocab") {
    val maxes = samples(Gen.choose(1, 60), 200)
    samples(asciiText, 200).zip(maxes).foreach { case (s, max) =>
      val norm = Normalize.normalizeJvm(Seq(s), max)
      val toks = Normalize.tokenizeJvm(norm, max)
      assert(toks.length === max)
      toks.drop(norm.length).foreach(t => assert(t === Normalize.PadToken))
      toks.take(norm.length).foreach(t => assert(t >= 0 && t < 101))
    }
  }

  test("jaro-winkler is symmetric, bounded, reflexive") {
    val as = samples(asciiText, 300)
    val bs = samples(asciiText, 300).reverse
    as.zip(bs).foreach { case (a, b) =>
      val ab = GraftKernels.jaroWinkler(a, b)
      val ba = GraftKernels.jaroWinkler(b, a)
      assert(math.abs(ab - ba) < 1e-12, s"asymmetric for ($a, $b)")
      assert(ab >= 0.0 && ab <= 1.0)
      if (a.nonEmpty) assert(GraftKernels.jaroWinkler(a, a) === 1.0)
    }
  }

  test("jaro-winkler byte path agrees with string path on ascii") {
    import org.apache.spark.unsafe.types.UTF8String.fromString
    val as = samples(asciiText, 300)
    val bs = samples(asciiText, 300).reverse
    as.zip(bs).foreach { case (a, b) =>
      val viaBytes = GraftKernels.jaroWinkler(fromString(a), fromString(b))
      val viaString = GraftKernels.jaroWinkler(a, b)
      assert(viaBytes === viaString, s"byte/string mismatch for ($a, $b)")
    }
  }

  test("simhash is deterministic; single-word edits move few bits") {
    val wordLists = samples(Gen.listOfN(30, Gen.identifier.map(_.take(6))), 100)
    import org.apache.spark.unsafe.types.UTF8String.fromString
    wordLists.filter(_.nonEmpty).foreach { words =>
      val doc = fromString(words.mkString(" "))
      val edited = fromString((words.dropRight(1) :+ "zzz").mkString(" "))
      val self = GraftKernels.simhash64(doc)
      assert(self === GraftKernels.simhash64(doc))
      val ham = java.lang.Long.bitCount(self ^ GraftKernels.simhash64(edited))
      assert(ham <= 40, s"one-word edit moved $ham bits")
    }
  }

  test("minhash agreement tracks shingle jaccard for near-dup docs") {
    import org.apache.spark.unsafe.types.UTF8String.fromString
    val wordLists = samples(Gen.listOfN(40, Gen.identifier.map(_.take(5))), 100)
    val drops = samples(Gen.choose(1, 8), 100)
    wordLists.zip(drops).filter(_._1.size >= 20).foreach { case (words, drop) =>
      val sa = GraftKernels.minhashSig(fromString(words.mkString(" ")), 96, 3)
      val sb = GraftKernels.minhashSig(fromString(words.dropRight(drop).mkString(" ")), 96, 3)
      val agree = (0 until 96).count(i => sa.getLong(i) == sb.getLong(i))
      assert(agree >= 30, s"only $agree/96 minhashes agree for drop=$drop")
    }
  }

  test("shingle-hash kernel jaccard equals string-set jaccard (oracle parity)") {
    import org.apache.spark.unsafe.types.UTF8String.fromString
    // reference semantics of the Catalyst composition the kernel replaced:
    // distinct word 3-grams joined by spaces; < 3 words -> the whole text
    def stringShingles(canon: String, w: Int): Set[String] = {
      val words = canon.split(" ").filter(_.nonEmpty)
      if (words.length >= w) words.sliding(w).map(_.mkString(" ")).toSet
      else Set(words.mkString(" "))
    }
    def kernelSet(canon: String, w: Int): IndexedSeq[Long] = {
      val a = GraftKernels.shingleHashes64(fromString(canon), w)
      (0 until a.numElements()).map(a.getLong)
    }
    val wordLists = samples(Gen.listOfN(25, Gen.identifier.map(_.take(5))), 150)
    val drops = samples(Gen.choose(0, 15), 150)
    wordLists.zip(drops).foreach { case (words, drop) =>
      val a = words.mkString(" ")
      val b = words.drop(drop).mkString(" ")
      val (ka, kb) = (kernelSet(a, 3), kernelSet(b, 3))
      // sorted + distinct invariants (sorted_overlap's precondition)
      assert(ka === ka.distinct.sorted)
      val (sa, sb) = (stringShingles(a, 3), stringShingles(b, 3))
      assert(ka.size === sa.size, s"cardinality mismatch for '${a.take(40)}'")
      val kInter = GraftKernels.sortedOverlap(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(ka.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(kb.toArray))
      assert(kInter === sa.intersect(sb).size,
        s"intersection mismatch for drop=$drop '${a.take(40)}'")
    }
  }

  test("sorted overlap equals set intersection size") {
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      val got = GraftKernels.sortedOverlap(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray))
      assert(got === a.toSet.intersect(b.toSet).size)
    }
  }

  test("hex-cutoff compare equals numeric compare (quality-sample core)") {
    // text_quality_sample decides keep/drop by comparing a 6-hex md5
    // prefix against printf('%06x', floor(q * 2^24)) lexicographically;
    // that is only sound because fixed-width lowercase hex ordering IS
    // numeric ordering. Property-check the equivalence across random
    // uniforms and scores, plus the boundary q values.
    val us = samples(Gen.choose(0, (1 << 24) - 1), 500)
    val qs = Seq(0.0, 1.0, 0.9999, 1.0 / (1 << 24)) ++ samples(Gen.choose(0.0, 1.0), 496)
    us.zip(qs).foreach { case (u, q) =>
      val cutoff = math.floor(q * (1 << 24)).toInt
      val hexKept = (q >= 1.0) || f"$u%06x" < f"$cutoff%06x"
      val numKept = (q >= 1.0) || u < cutoff
      assert(hexKept === numKept, s"u=$u q=$q")
    }
  }

  test("sequence packing invariants hold on randomized streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(8675309)
    val docs = (1 to 2000).map(i =>
      (i.toLong, s"s${rnd.nextInt(5)}", 1L + rnd.nextInt(600)))
      .toDF("doc_id", "source", "n_tokens")
    val packed = graft.operators.SeqPack.pack(docs, "source", "doc_id", "n_tokens", 256)
      .select("doc_id", "source", "n_tokens", "start_off", "bin_first", "bin_last")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    packed.groupBy(_._2).foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._1)
      // offsets tile the stream exactly: each doc starts where the
      // previous one ended, streams start at zero
      var expect = 0L
      ordered.foreach { case (id, _, n, off, bf, bl) =>
        assert(off === expect, s"$src doc $id")
        assert(bf === off / 256)
        assert(bl === (off + n - 1) / 256)
        assert(bf <= bl)
        expect = off + n
      }
      // no token wasted: total bins span exactly ceil(total/256)
      val total = ordered.map(_._3).sum
      assert(ordered.last._6 === (total - 1) / 256, s"$src last bin")
    }
  }

  test("as-of join: plain and bucketed paths agree with brute force") {
    import graft.operators.AsofJoin
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    def ts(): java.sql.Timestamp = java.sql.Timestamp.valueOf(
      f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d")
    // second-resolution stamps over 8 keys force duplicate (key, ts)
    // right rows — the tiebreak must resolve them identically everywhere;
    // NULL keys and timestamps (both sides) must never match anything
    val rights = (1 to 300).map { i =>
      val k: java.lang.Long = if (rnd.nextInt(100) < 5) null else rnd.nextInt(8).toLong
      val t = if (rnd.nextInt(100) < 5) null else ts()
      (k, t, 1000L + i, rnd.nextInt(100).toDouble)
    }
    val lefts = (1 to 300).map { i =>
      val k: java.lang.Long = if (rnd.nextInt(100) < 5) null else rnd.nextInt(8).toLong
      val t = if (rnd.nextInt(100) < 10) null else ts()
      (i.toLong, k, t)
    }
    val rightDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rights.map(r => Row(r._1, r._2, r._3, r._4))),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_id", LongType), StructField("value", DoubleType))))
    val leftDf = spark.createDataFrame(
      spark.sparkContext.parallelize(lefts.map(l => Row(l._1, l._2, l._3))),
      StructType(Seq(StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("ts", TimestampType))))
    def run(bucketSeconds: Long) = AsofJoin.asof(
      leftDf, rightDf, "user_id", "ts", "ts", "event_id", Seq("ts", "value"),
      bucketSeconds)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(3)), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    val plain = run(0L)
    val bucketed = run(3600L)
    val brute = lefts.map { case (id, k, t) =>
      val prior =
        if (k == null || t == null) Seq.empty
        else rights.filter(r => r._1 == k && r._2 != null && !r._2.after(t))
      if (prior.isEmpty) id -> ((None, None))
      else {
        val best = prior.maxBy(r => (r._2.getTime, r._3))
        id -> ((Some(best._2): Option[java.sql.Timestamp], Some(best._4)))
      }
    }.toMap
    assert(plain.size === 300 && bucketed.size === 300)
    assert(plain === brute)
    assert(bucketed === brute)
  }
}
