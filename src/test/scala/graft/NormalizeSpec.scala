package graft

import org.apache.spark.sql.functions._
import graft.functions.Normalize

/** Byte-identity parity with the reference tokenizer/normalizer
  * (idrt/data.py:45-52, 216-242) — hand-computed vectors, vocabulary
  * order, truncation/padding semantics (SURVEY.md par.1.6, FIXTURES.md par.4).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("vocabulary is string.printable + PAD, 101 symbols, exact order") {
    assert(Normalize.Vocabulary.length === 101)
    // Python string.printable order: digits, lowercase, uppercase,
    // punctuation, space, \t\n\r\x0b\x0c
    assert(Normalize.Vocabulary(0) === '0')
    assert(Normalize.Vocabulary(9) === '9')
    assert(Normalize.Vocabulary(10) === 'a')
    assert(Normalize.Vocabulary(35) === 'z')
    assert(Normalize.Vocabulary(36) === 'A')
    assert(Normalize.Vocabulary(61) === 'Z')
    assert(Normalize.Vocabulary(62) === '!')
    assert(Normalize.Vocabulary(94) === ' ')
    assert(Normalize.Vocabulary(95) === '\t')
    assert(Normalize.Vocabulary(96) === '\n')
    assert(Normalize.Vocabulary(97) === '\r')
    assert(Normalize.Vocabulary(98) === '\u000B')
    assert(Normalize.Vocabulary(99) === '\u000C')
    assert(Normalize.Vocabulary(100) === Normalize.PadChar)
    assert(Normalize.PadToken === 100)
  }

  test("tokenizer hand vectors (idrt/data.py:216-242 semantics)") {
    // "ab 1" -> [a=10, b=11, space=94, '1'=1] then PAD
    assert(Normalize.tokenizeJvm("ab 1", 6).toSeq === Seq(10, 11, 94, 1, 100, 100))
    // exact length: no padding
    assert(Normalize.tokenizeJvm("0z", 2).toSeq === Seq(0, 35))
    // over-length input is truncated
    assert(Normalize.tokenizeJvm("abcd", 2).toSeq === Seq(10, 11))
    // empty -> all PAD
    assert(Normalize.tokenizeJvm("", 3).toSeq === Seq(100, 100, 100))
  }

  test("normalization: join-lower-truncate, pair-variant (post-truncation) length") {
    // join with single space, lowercase, truncate to maxLength
    assert(Normalize.normalizeJvm(Seq("John", "SMITH"), 50) === "john smith")
    assert(Normalize.normalizeJvm(Seq("John", "SMITH"), 6) === "john s")
    // null subfield -> empty string, separator retained (reference joins
    // before any null handling; COALESCE happens at load)
    assert(Normalize.normalizeJvm(Seq(null, "Doe"), 50) === " doe")
  }

  test("Column pipeline agrees byte-for-byte with the JVM reference impl") {
    val rows = Seq(
      ("John", "Smith"), ("ANA-MARIA", "de la Cruz"), ("", ""),
      ("x" * 60, "y"), ("a", "b" * 60), ("J.", "O'Neil"), (null, "Zz"))
    val df = rows.toDF("first", "last")
    val got = df.select(
      Normalize.normalizeField(Seq(col("first"), col("last")), 50).as("norm"),
      Normalize.tokenize(Normalize.normalizeField(Seq(col("first"), col("last")), 50), 50).as("toks"),
      Normalize.nonPadLength(Normalize.normalizeField(Seq(col("first"), col("last")), 50)).as("len"))
      .collect()
    rows.zip(got).foreach { case ((f, l), r) =>
      val expectNorm = Normalize.normalizeJvm(Seq(f, l), 50)
      assert(r.getString(0) === expectNorm, s"norm mismatch for ($f,$l)")
      assert(r.getSeq[Int](1) === Normalize.tokenizeJvm(expectNorm, 50).toSeq)
      assert(r.getInt(2) === expectNorm.length)
    }
  }

  test("validity gate rejects non-printable and NUL (idrt/data.py:175-189)") {
    assert(Normalize.isValidJvm("hello world 123 !@#"))
    assert(Normalize.isValidJvm(""))
    assert(Normalize.isValidJvm("tab\tnewline\n"))
    assert(!Normalize.isValidJvm("nul\u0000char"))
    assert(!Normalize.isValidJvm("café")) // non-ascii
    assert(!Normalize.isValidJvm("bell\u0007"))

    val df = Seq("ok text", "nul\u0000", "café", "fine 123").toDF("s")
    val got = df.select(Normalize.isValidText(col("s")).as("v"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got === Seq(true, false, false, true))
  }

  test("padField right-pads with NUL to maxLength") {
    val got = Seq("ab").toDF("s")
      .select(Normalize.padField(col("s"), 5).as("p"))
      .head().getString(0)
    assert(got === "ab" + "\u0000" * 3)
  }

  test("phone normalization matches reference data-gen SQL (F8)") {
    val rows = Seq("(555) 123-4567", "15551234567", "no digits", "", null)
    val got = rows.toDF("p")
      .select(Normalize.normalizePhone(col("p")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("5551234567", "5551234567", "", "", ""))
  }
}
