package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SparkSessionExtensions registration: exposes the custom kernels to SQL
  * (`spark.sql("SELECT jaro_winkler(a, b) ...")`). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        builder))
    }
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  /** (name, usage, builder) for every custom SQL function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = {
    val b = Seq.newBuilder[(String, String, Seq[Expression] => Expression)]
    def register(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      b += ((name, usage, builder))

    register("jaro_winkler", "jaro_winkler(s1, s2) - Jaro-Winkler similarity in [0,1]") {
      case Seq(a, b) => JaroWinkler(a, b)
    }
    register("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays") {
      case Seq(a, b) => CosineSim(a, b)
    }
    register("l2_dist", "l2_dist(a, b) - euclidean distance of two float arrays") {
      case Seq(a, b) => L2Dist(a, b)
    }
    register("simhash64", "simhash64(s) - 64-bit SimHash of whitespace words") {
      case Seq(a) => SimHash64(a)
    }
    register("char_tokenize", "char_tokenize(s, maxLength) - reference tokenizer ids") {
      case Seq(a, n) => CharTokenize(a, intArg(n, "maxLength"))
    }
    register("ngram_embed", "ngram_embed(s, dim) - char-trigram hashed embedding") {
      case Seq(a, d) => NgramEmbed(a, intArg(d, "dim"))
    }
    register("rhp_key", "rhp_key(vec, bits, seed) - random-hyperplane LSH bucket") {
      case Seq(v, b, s) => RhpKey(v, intArg(b, "bits"), longArg(s, "seed"))
    }
    register("minhash_sig", "minhash_sig(s, k, w) - MinHash signature over word w-shingles") {
      case Seq(a, k, w) => MinHashSig(a, intArg(k, "k"), intArg(w, "shingleWidth"))
    }
    register("sorted_overlap", "sorted_overlap(a, b) - common count of two sorted long arrays") {
      case Seq(a, b) => SortedOverlap(a, b)
    }
    register("shingle_hashes", "shingle_hashes(s, w) - sorted distinct word w-shingle hashes") {
      case Seq(a, w) => ShingleHashes(a, intArg(w, "width"))
    }
    register("rolling_minhash", "rolling_minhash(s, w) - min rolling char-shingle hash") {
      case Seq(a, w) => RollingMinHash(a, intArg(w, "width"))
    }
    b.result()
  }

  /** Register all functions into an already-built session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(
        spark, name, new ExpressionInfo("graft.functions", name, usage), builder)
    }
}
