package graft

/** SQL surface: the custom kernels are callable from plain SQL via
  * SparkSessionExtensions.
  */
class ExtensionsSpec extends SparkSpec {

  test("custom functions are callable from SQL") {
    // the shared test session was built without extensions — the install
    // path covers exactly that (register into a live session); the
    // GraftExtensions class itself drives the same list via injectFunction
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT
        |  jaro_winkler('martha', 'marhta') AS jw,
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |  simhash64('hello world') AS sh,
        |  char_tokenize('ab', 4) AS toks,
        |  size(ngram_embed('john smith', 16)) AS dim,
        |  sorted_overlap(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS ov
        |""".stripMargin).head()
    assert(math.abs(r.getAs[Double]("jw") - 0.9611111111111111) < 1e-9)
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9)
    assert(r.getAs[Seq[Int]]("toks") === Seq(10, 11, 100, 100))
    assert(r.getAs[Int]("dim") === 16)
    assert(r.getAs[Int]("ov") === 2)
  }
}
