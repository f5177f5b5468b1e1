package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- text

  test("tokens and tokenCount handle empty/multi-space text") {
    val df = Seq("a b  c", "", "   ", "one").toDF("t")
      .select(TextFunctions.tokenCount(col("t")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 0, 0, 1))
  }

  test("wordShingles produces n-grams; short docs collapse to one shingle") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 3).as("s"))
      .as[Seq[String]].collect()(0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 3).as("s"))
      .as[Seq[String]].collect()(0)
    assert(short == Seq("a b"))
  }

  test("charNgrams") {
    val g = Seq("abcd").toDF("t")
      .select(TextFunctions.charNgrams(col("t"), 2).as("g")).as[Seq[String]].collect()(0)
    assert(g == Seq("ab", "bc", "cd"))
  }

  test("stopwordRatio and meanTokenLen") {
    val df = Seq("the cat sat").toDF("t").select(
      TextFunctions.stopwordRatio(col("t"), Seq("the")).as("r"),
      TextFunctions.meanTokenLen(col("t")).as("m"))
    val (r, m) = df.as[(Double, Double)].collect()(0)
    assert(math.abs(r - 1.0 / 3) < 1e-9)
    assert(math.abs(m - 3.0) < 1e-9)
  }

  test("qualityScore stays in [0,1] and rewards longer text") {
    val scores = Seq("", "the quick brown fox jumps over a lazy dog " * 20)
      .toDF("t")
      .select(TextFunctions.qualityScore(col("t"), TextFunctions.EnglishStopwords).as("q"))
      .as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(1) > scores(0))
  }

  test("charEntropy: known distributions") {
    val out = Seq("aaaa", "ab", "abcd", "").toDF("t")
      .select(TextFunctions.charEntropy(col("t")).as("e")).as[Double].collect()
    assert(out(0) == 0.0)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(math.abs(out(2) - 2.0) < 1e-12)
    assert(out(3) == 0.0)
  }

  test("text cleaning: whitespace/control normalization and PII redaction") {
    val dirty = "call  me\tat 555-123-4567 or bob.smith+x@example.co.uk ok"
    val out = Seq(dirty).toDF("t").select(
      TextFunctions.normalizeWhitespace(TextFunctions.redactPii(
        TextFunctions.stripControlChars(col("t")))).as("clean"))
      .as[String].collect()(0)
    assert(out == "call me at <PHONE> or <EMAIL> ok")
  }

  test("ngramRepetition computes top/dup gram fractions, zeros on short docs") {
    // "a b a b a": bigrams = [a b, b a, a b, b a] → total 4, distinct 2,
    // max count 2 → top = 0.5, dup = 0.5
    val df = Seq("a b a b a", "solo", "x y z").toDF("t")
      .withColumn("rs", TextFunctions.ngramRepetition(col("t"), 2))
      .select(col("rs.top_frac"), col("rs.dup_frac"))
    val rows = df.as[(Double, Double)].collect()
    assert(rows(0) == ((0.5, 0.5)))
    assert(rows(1) == ((0.0, 0.0))) // one token, no bigrams
    assert(rows(2) == ((0.5, 0.0))) // all distinct: top = 1/2, dup = 0
  }

  test("languageId picks the profile with most hits, und when none") {
    val df = Seq(
      "the cat is on the mat", "der hund ist nicht da", "el gato es un animal",
      "xyzzy qwerty").toDF("t")
      .select(TextFunctions.languageId(col("t")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "es", "und"))
  }

  test("fingerprint is deterministic, sorted, bounded by k") {
    val fp = Seq("a b c d e f g h", "a b c d e f g h").toDF("t")
      .select(TextFunctions.fingerprint(col("t"), 3, 4).as("f")).as[Seq[Long]].collect()
    assert(fp(0) == fp(1))
    assert(fp(0).length <= 4 && fp(0) == fp(0).sorted)
  }

  test("fingerprintPortable matches a driver-side md5 replay of the sketch") {
    // same bottom-k semantics as fingerprint, but over the md5-60 hash the
    // q33 DuckDB oracle replays — pin one value against a JVM recomputation
    val text = "a b c d e f g h"
    val fp = Seq(text).toDF("t")
      .select(TextFunctions.fingerprintPortable(col("t"), 3, 4).as("f"))
      .as[Seq[Long]].collect()(0)
    def md560(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .take(8).map(b => f"$b%02x").mkString.take(15), 16)
    val shingles = text.split(" ").sliding(3).map(_.mkString(" ")).toSeq
    val expected = shingles.map(md560).distinct.sorted.take(4)
    assert(fp == expected)
  }

  // ------------------------------------------------------- similarity

  test("minhash signature estimates jaccard") {
    val df = Seq(
      ("a b c d e f g h i j", "a b c d e f g h i j"), // identical
      ("a b c d e f g h i j", "q r s t u v w x y z")  // disjoint
    ).toDF("t1", "t2").select(
      SimilarityFunctions.minhashJaccard(
        SimilarityFunctions.minhashSignature(TextFunctions.wordShingles(col("t1"), 2), 64),
        SimilarityFunctions.minhashSignature(TextFunctions.wordShingles(col("t2"), 2), 64)).as("j"))
    val js = df.as[Double].collect()
    assert(js(0) == 1.0)
    assert(js(1) < 0.2)
  }

  test("minhashBands: identical signatures share all bands") {
    val df = Seq("a b c d e").toDF("t").select(
      SimilarityFunctions.minhashBands(
        SimilarityFunctions.minhashSignature(TextFunctions.wordShingles(col("t"), 2), 64), 64, 16).as("b"))
    assert(df.as[Seq[Long]].collect()(0).length == 16)
    intercept[IllegalArgumentException](
      SimilarityFunctions.minhashBands(lit(null), 64, 7))
  }

  test("jaccard exact") {
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(SimilarityFunctions.jaccard(col("x"), col("y")).as("j")).as[Double].collect()(0)
    assert(math.abs(j - 0.5) < 1e-9)
  }

  test("simhash: identical texts collide, near texts are close, disjoint far") {
    val df = Seq(
      ("a b c d e f g h", "a b c d e f g h"),
      ("a b c d e f g h", "a b c d e f g z"),
      ("a b c d e f g h", "q r s t u v w x")
    ).toDF("t1", "t2").select(SimilarityFunctions.hamming64(
      SimilarityFunctions.simhash(TextFunctions.tokens(col("t1"))),
      SimilarityFunctions.simhash(TextFunctions.tokens(col("t2")))).as("d"))
    val ds = df.as[Int].collect()
    assert(ds(0) == 0)
    assert(ds(1) < ds(2))
  }

  test("cosine kernel: known values and zero-norm guard") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 0.0f))
    ).toDF("a", "b").select(SimilarityFunctions.cosine(col("a"), col("b")).as("c"))
    val cs = df.as[Double].collect()
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
    assert(cs(2) == 0.0)
  }

  // ------------------------------------------------------------- glue fns

  test("replaceArrayElement replaces at index, out-of-range unchanged") {
    val df = Seq(Seq(1, 2, 3)).toDF("a").select(
      GlueFunctions.replaceArrayElement(col("a"), lit(9), 1).as("r1"),
      GlueFunctions.replaceArrayElement(col("a"), lit(9), 5).as("r2"))
    val (r1, r2) = df.as[(Seq[Int], Seq[Int])].collect()(0)
    assert(r1 == Seq(1, 9, 3))
    assert(r2 == Seq(1, 2, 3))
  }

  test("explodeWithIndex yields (index, val) rows") {
    val rows = Seq(Seq("a", "b")).toDF("xs")
      .select(GlueFunctions.explodeWithIndex(col("xs")))
      .as[(Int, String)].collect().toSeq
    assert(rows == Seq((0, "a"), (1, "b")))
  }

  test("namedStruct builds named fields") {
    val df = Seq((1, "x")).toDF("a", "b")
      .select(GlueFunctions.namedStruct("k" -> col("a"), "v" -> col("b")).as("s"))
    assert(df.select("s.k").as[Int].collect()(0) == 1)
  }
}
