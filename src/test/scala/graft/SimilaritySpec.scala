package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftKernels, Similarity}

/** Known-value tests for the similarity kernels. The Jaro-Winkler values
  * are pinned to DuckDB's jaro_winkler_similarity outputs (probed
  * empirically) since DuckDB is the correctness oracle; they also match
  * the classic published examples.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, eps: Double = 1e-12) =
    assert(math.abs(a - b) <= eps, s"$a vs $b")

  test("jaro-winkler known values (DuckDB-verified)") {
    approx(GraftKernels.jaroWinkler("martha", "marhta"), 0.9611111111111111)
    approx(GraftKernels.jaroWinkler("dixon", "dicksonx"), 0.8133333333333332, 1e-9)
    approx(GraftKernels.jaroWinkler("jellyfish", "smellyfish"), 0.8962962962962964, 1e-9)
    approx(GraftKernels.jaroWinkler("abc", "abc"), 1.0)
    approx(GraftKernels.jaroWinkler("", "abc"), 0.0)
    approx(GraftKernels.jaroWinkler("", ""), 0.0) // DuckDB: empty -> 0
    approx(GraftKernels.jaroWinkler("a", "b"), 0.0)
    approx(GraftKernels.jaroWinkler("crate", "trace"), 0.7333333333333334, 1e-9)
    approx(GraftKernels.jaroWinkler("dwayne", "duane"), 0.8400000000000001, 1e-9)
    approx(GraftKernels.jaroWinkler("aaaaaaaaaa", "aaaaaaaaab"), 0.96, 1e-9)
    // odd raw transposition count floors (duckdb 'abcdef'/'bcadef')
    approx(GraftKernels.jaroWinkler("abcdef", "bcadef"), 0.9444444444444445, 1e-9)
    // boost only above 0.7 jaro
    approx(GraftKernels.jaroWinkler("aaxxxxxx", "aayyyyyy"), 0.5)
    approx(GraftKernels.jaroWinkler("abcdxxxx", "abcdyyyy"), 0.6666666666666666, 1e-9)
    approx(GraftKernels.jaroWinkler("abcdexyz", "abcdefgh"), 0.85, 1e-9)
  }

  test("jaro-winkler is symmetric") {
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("a", "ab"),
      ("jones", "johnson"), ("", "x"))
    pairs.foreach { case (a, b) =>
      approx(GraftKernels.jaroWinkler(a, b), GraftKernels.jaroWinkler(b, a))
    }
  }

  test("jaro-winkler as Column expression (codegen path)") {
    val got = Seq(("martha", "marhta"), ("abc", "abc"), ("", ""))
      .toDF("a", "b")
      .select(Similarity.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    approx(got(0), 0.9611111111111111)
    approx(got(1), 1.0)
    approx(got(2), 0.0)
  }

  test("cosine and l2 over float arrays") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)),
      (Array(3.0f, 4.0f), Array(0.0f, 0.0f)))
      .toDF("a", "b")
    val got = df.select(
      Similarity.cosineSim(col("a"), col("b")).as("cos"),
      Similarity.l2Dist(col("a"), col("b")).as("l2")).collect()
    approx(got(0).getDouble(0), 0.0)
    approx(got(1).getDouble(0), 1.0, 1e-9)
    approx(got(2).getDouble(0), 0.0) // zero vector -> 0 by convention
    approx(got(0).getDouble(1), math.sqrt(2.0), 1e-9)
    approx(got(2).getDouble(1), 5.0, 1e-9)
  }

  test("angular->cosine conversion (run_search.py:159-161)") {
    // annoy angular d = sqrt(2(1-cos)); cos=1 -> d=0; cos=0 -> d=sqrt(2)
    val got = Seq(0.0, math.sqrt(2.0), 2.0).toDF("d")
      .select(Similarity.angularToCosine(col("d")).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    approx(got(0), 1.0)
    approx(got(1), 0.0, 1e-12)
    approx(got(2), -1.0)
  }

  test("levenshtein similarity normalization") {
    val got = Seq(("kitten", "sitting"), ("", ""), ("abc", ""))
      .toDF("a", "b")
      .select(Similarity.levenshteinSim(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    approx(got(0), 1.0 - 3.0 / 7.0, 1e-12)
    approx(got(1), 1.0)
    approx(got(2), 0.0)
  }

  test("ngram embedding: deterministic, unit norm, similarity-preserving") {
    val df = Seq("john smith|j@x.com|5551234567",
      "john smith|j@x.com|5551234567",
      "john smyth|j@x.com|5551234567",
      "completely different string zzz").toDF("s")
      .select(Similarity.ngramEmbed(col("s"), 64).as("e"))
    val rows = df.collect().map(_.getSeq[Float](0))
    assert(rows(0) === rows(1)) // deterministic
    val norm = math.sqrt(rows(0).map(x => x.toDouble * x).sum)
    approx(norm, 1.0, 1e-5)
    def cos(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(rows(0), rows(2)) > 0.7, "near-identical strings should be close")
    assert(cos(rows(0), rows(3)) < 0.5, "unrelated strings should be far")
  }

  test("simhash: identical text same hash, near text small hamming distance") {
    val h = (s: String) => Seq(s).toDF("s")
      .select(Similarity.simHash64(col("s")).as("h")).head().getLong(0)
    val a = h("the quick brown fox jumps over the lazy dog again and again")
    val b = h("the quick brown fox jumps over the lazy dog again and again")
    val c = h("the quick brown fox jumps over the lazy cat again and again")
    val d = h("totally unrelated words describing spark query engines at scale")
    assert(a === b)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, c) < 16, s"near-dup hamming ${ham(a, c)}")
    assert(ham(a, d) > ham(a, c), "unrelated should be farther than near-dup")
  }
}
