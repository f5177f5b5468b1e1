package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.TextExpressions

/** Pins the native [[expressions.CollapseRunsExpr]] and
  * [[expressions.TokenChunksExpr]] kernels against straightforward Scala
  * reference implementations over seeded random token arrays — these
  * kernels replaced HOF formulations that captured the tokenizer inside
  * the lambda (per-element re-evaluation), so the contract is exact
  * value equality, only faster. */
class TextKernelSpec extends SparkSpec {
  import spark.implicits._

  private def refCollapse(toks: Seq[String]): Seq[String] =
    toks.foldLeft(Vector.empty[String]) { (acc, t) =>
      if (acc.nonEmpty && acc.last == t) acc else acc :+ t
    }

  // the exact arithmetic of the old transform(sequence(...)) formulation
  private def refChunks(toks: Seq[String], chunkLen: Int, stride: Int): Seq[String] = {
    val overlap = chunkLen - stride
    val eff = math.max(toks.length - overlap, 1)
    val k = math.max(1, (eff + stride - 1) / stride)
    (0 until k).map(i => toks.slice(i * stride, i * stride + chunkLen).mkString(" "))
  }

  private val rng = new scala.util.Random(20260814L)
  private def randToks(n: Int): Seq[String] =
    Seq.fill(n)("w" + rng.nextInt(4)) // small alphabet => plenty of runs

  test("collapseRuns equals the reference fold on random inputs") {
    val cases = (0 to 40).map(n => randToks(n))
    val got = cases.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "toks")
      .select(col("i"), TextExpressions.collapseRuns(col("toks")).as("c"))
      .as[(Int, Seq[String])].collect().toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == refCollapse(t), s"case $i: $t")
    }
  }

  test("collapseRuns: empty array and null-token runs") {
    val df = Seq(
      (1, Some(Seq.empty[String])),
      (2, Some(Seq("a", "a", "a"))),
      (3, None: Option[Seq[String]])).toDF("i", "toks")
    val got = df.select(col("i"), TextExpressions.collapseRuns(col("toks")).as("c"))
      .as[(Int, Option[Seq[String]])].collect().toMap
    assert(got(1) == Some(Seq.empty))
    assert(got(2) == Some(Seq("a")))
    assert(got(3) == None) // null in, null out (UnaryExpression null-safe)
  }

  test("collapseRuns null-ELEMENT contract: null runs collapse, null after non-null kept") {
    // the pinned contract (scaladoc): null tokens compare equal to each
    // other, so [a, null, null, a, null] -> [a, null, a, null] — unlike
    // the replaced HOF, which dropped every non-leading null
    val df = Seq(
      (1, Seq[String]("a", null, null, "a", null)),
      (2, Seq[String](null, null, "b")),
      (3, Seq[String](null)))
      .toDF("i", "toks")
    val got = df.select(col("i"), TextExpressions.collapseRuns(col("toks")).as("c"))
      .as[(Int, Seq[String])].collect().toMap
    assert(got(1) == Seq("a", null, "a", null))
    assert(got(2) == Seq(null, "b"))
    assert(got(3) == Seq(null))
  }

  test("tokenChunks equals the strided slice arithmetic on random inputs") {
    for ((chunkLen, stride) <- Seq((10, 10), (5, 3), (7, 1), (1, 1), (100, 60))) {
      val cases = (1 to 30).map(n => randToks(n)) :+ randToks(250)
      val got = cases.zipWithIndex.map { case (t, i) => (i, t) }
        .toDF("i", "toks")
        .select(col("i"),
          TextExpressions.tokenChunks(col("toks"), chunkLen, stride).as("c"))
        .as[(Int, Seq[String])].collect().toMap
      cases.zipWithIndex.foreach { case (t, i) =>
        assert(got(i) == refChunks(t, chunkLen, stride),
          s"chunkLen=$chunkLen stride=$stride n=${t.length}")
      }
    }
  }

  test("tokenChunks rejects stride outside [1, chunkLen]") {
    intercept[IllegalArgumentException] {
      expressions.TokenChunksExpr(null, 5, 6)
    }
    intercept[IllegalArgumentException] {
      expressions.TokenChunksExpr(null, 5, 0)
    }
  }
}
