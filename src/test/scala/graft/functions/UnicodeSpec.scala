package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}

class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  // explicit escapes: the decomposed/precomposed distinction must be
  // byte-exact in source, and editors silently normalize typed literals
  private val decomposedCafe = "Café" // e + combining acute (5 cp)
  private val precomposedCafe = "Café" // é as one codepoint (4 cp)
  private val decomposedNaive = "naïve"
  private val precomposedNaive = "naïve"

  test("nfcNormalize composes decomposed sequences and leaves NFC text alone") {
    val rows = Seq(decomposedCafe, precomposedCafe, "plain ascii", decomposedNaive)
      .toDF("s")
      .select(T.nfcNormalize(col("s")).as("n"), length(col("s")).as("lr"),
        length(T.nfcNormalize(col("s"))).as("ln"))
      .as[(String, Int, Int)].collect()
    assert(rows(0)._1 == precomposedCafe && rows(0)._2 == 5 && rows(0)._3 == 4)
    assert(rows(1)._1 == precomposedCafe && rows(1)._2 == 4 && rows(1)._3 == 4)
    assert(rows(2)._1 == "plain ascii") // ASCII fast path: unchanged
    assert(rows(3)._1 == precomposedNaive && rows(3)._2 == 6 && rows(3)._3 == 5)
  }

  test("nfcNormalize equals java.text.Normalizer on mixed content, null-safe") {
    val mixed = "åb ç Å x" // a+ring, c+cedilla, Angstrom sign
    val got = Seq(Some(mixed), None).toDF("s")
      .select(T.nfcNormalize(col("s")).as("n")).as[Option[String]].collect()
    assert(got(0).contains(
      java.text.Normalizer.normalize(mixed, java.text.Normalizer.Form.NFC)))
    // Angstrom sign U+212B canonically composes... to U+00C5 (Å) — pinned
    assert(got(0).get.contains("Å"))
    assert(got(1).isEmpty)
  }
}
