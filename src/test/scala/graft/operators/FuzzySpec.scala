package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Fuzzy]]'s losslessness claim: the prefix-filtered join must equal
  * brute force on ANY vocabulary — exercised on seeded random typo'd
  * vocabularies over a tiny alphabet (maximal near-pair density, lots of
  * short strings below the pigeonhole bound) as well as fixed edge cases. */
class FuzzySpec extends SparkSpec {

  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForce(vocab: Seq[String], d: Int): Set[(String, String, Int)] =
    (for {
      a <- vocab; b <- vocab
      if a < b
      dist = lev(a, b)
      if dist <= d
    } yield (a, b, dist)).toSet

  private def sparkPairs(vocab: Seq[String], d: Int): Set[(String, String, Int)] =
    Fuzzy.editDistancePairs(vocab.toDF("v"), "v", d)
      .as[(String, String, Int)].collect().toSet

  test("matches brute force on seeded random typo'd vocabularies (d=1,2)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3; d <- 1 to 2) {
      // tiny alphabet + short lengths = dense near-pairs, many strings
      // below the short-string cutoff (len <= d*q+q-1), typo chains
      val vocab = Seq.fill(60)(
        (0 until (1 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString).distinct
      val expected = bruteForce(vocab, d)
      val got = sparkPairs(vocab, d)
      assert(got == expected,
        s"trial=$trial d=$d missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("matches brute force on longer word-like strings (d=2)") {
    val rnd = new scala.util.Random(7)
    val bases = Seq("widget", "anvil", "sprocket", "gizmo", "plate")
    val vocab = (bases ++ bases.flatMap { w =>
      Seq.fill(4) { // seeded point mutations: substitute, drop, insert
        val i = rnd.nextInt(w.length)
        rnd.nextInt(3) match {
          case 0 => w.updated(i, ('a' + rnd.nextInt(26)).toChar)
          case 1 => w.take(i) + w.drop(i + 1)
          case _ => w.take(i) + ('a' + rnd.nextInt(26)).toChar + w.drop(i)
        }
      }
    }).distinct
    assert(sparkPairs(vocab, 2) == bruteForce(vocab, 2))
  }

  test("nulls are dropped and duplicate rows collapse to the distinct vocabulary") {
    val df = Seq(Some("abc"), Some("abd"), Some("abc"), None, Some("abd"))
      .toDF("v")
    val got = Fuzzy.editDistancePairs(df, "v", 1)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("abc", "abd", 1)))
  }

  test("no pairs above the threshold, empty input yields empty output") {
    assert(sparkPairs(Seq("aaaa", "zzzz"), 2).isEmpty)
    assert(sparkPairs(Seq.empty[String], 2).isEmpty)
  }

  test("candidate generation never plans a cartesian product") {
    val plan = Fuzzy.editDistancePairs(
      Seq("widget", "widgex", "anvil").toDF("v"), "v", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  private def bruteForceCross(l: Seq[String], r: Seq[String],
                              d: Int): Set[(String, String, Int)] =
    (for { a <- l; b <- r; dist = lev(a, b); if dist <= d }
      yield (a, b, dist)).toSet

  test("editDistanceJoin matches brute force and keeps exact matches (d=1,2)") {
    val rnd = new scala.util.Random(99)
    def vocab(n: Int) = Seq.fill(n)(
      (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString).distinct
    for (d <- 1 to 2) {
      val (l, r) = (vocab(40), vocab(40))
      val got = Fuzzy.editDistanceJoin(l.toDF("lv"), "lv", r.toDF("rv"), "rv", d)
        .as[(String, String, Int)].collect().toSet
      val expected = bruteForceCross(l, r, d)
      assert(got == expected,
        s"d=$d missing=${expected -- got} extra=${got -- expected}")
      // dictionaries overlap whp at alphabet 3 — exact matches must appear
      val overlap = l.toSet intersect r.toSet
      assert(overlap.forall(v => got((v, v, 0))), s"lost exact matches: $overlap")
    }
  }

  test("editDistanceJoin orients pairs left-to-right") {
    val got = Fuzzy.editDistanceJoin(
      Seq("widget").toDF("l"), "l", Seq("widgex").toDF("r"), "r", 1)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("widget", "widgex", 1)))
  }

  test("resolveEntities merges typo chains transitively to the min label") {
    val df = Seq("aaaa", "aaab", "aabb", "zzzz").toDF("v")
    val got = Fuzzy.resolveEntities(df, "v", 1)
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "aaaa" -> "aaaa", "aaab" -> "aaaa", "aabb" -> "aaaa", "zzzz" -> "zzzz"))
  }

  test("resolveEntities covers every distinct value exactly once") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq.fill(40)(
      (0 until (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString).distinct
    val out = Fuzzy.resolveEntities(vocab.toDF("v"), "v", 1)
      .as[(String, String)].collect()
    assert(out.map(_._1).sorted.toSeq == vocab.sorted)
    // canonical is a member of the value's cluster: reachable => same label
    val labels = out.toMap
    for ((a, b, _) <- bruteForce(vocab, 1))
      assert(labels(a) == labels(b), s"$a and $b within d=1 but split clusters")
  }
}
