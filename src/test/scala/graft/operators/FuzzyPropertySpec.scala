package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the losslessness theorem Fuzzy's candidate
  * generation rests on (`operators/Fuzzy.scala` prefix filter): two
  * strings within Levenshtein distance d must either
  *   (a) both be long enough for the pigeonhole bound and share at least
  *       one q-gram among the d·q+1 GLOBALLY RAREST q-grams of each
  *       (rarity = document frequency over the long vocabulary,
  *       ties broken by gram text — exactly candidatePairs' window), or
  *   (b) have at least one side short (length <= d·q+q−1), in which case
  *       the broadcast short path reaches the pair via |Δlen| <= d.
  * The disjunction IS recall 1.0: every within-d pair is covered by one
  * of the two candidate paths. Exercised over random small-alphabet
  * strings and random edit scripts for d <= 3, q ∈ {2,3}, including the
  * short-string bypass boundary at length = d·q+q−1 (where the gram-path
  * theorem genuinely fails — pinned below — which is why the bypass
  * exists). The Spark-side plumbing is pinned against brute force in
  * FuzzySpec; these properties pin the MATH at a per-case volume the
  * Spark round-trip can't reach. */
object FuzzyPropertySpec extends Properties("FuzzyPrefixFilter") {

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0) // d[i-1][j-1]
      d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  /** Distinct q-grams in first-occurrence order (rawGrams semantics). */
  private def grams(s: String, q: Int): Seq[String] =
    if (s.length < q) Seq.empty
    else (0 to s.length - q).map(i => s.substring(i, i + q)).distinct

  /** The d·q+1 rarest grams under candidatePairs' exact order:
    * (document frequency over the LONG vocabulary, gram text). */
  private def prefix(s: String, q: Int, d: Int, freq: Map[String, Int]): Set[String] =
    grams(s, q).sortBy(g => (freq.getOrElse(g, 0), g)).take(d * q + 1).toSet

  /** One random edit at a random position. */
  private def editGen(alphabet: Seq[Char]): Gen[String => String] = for {
    kind <- Gen.choose(0, 2)
    pos <- Gen.choose(0.0, 1.0) // scaled to the current length at apply time
    ch <- Gen.oneOf(alphabet)
  } yield { s: String =>
    val p = math.min((pos * (s.length + 1)).toInt, s.length)
    kind match {
      case 0 => s.substring(0, p) + ch + s.substring(p) // insert
      case 1 if s.nonEmpty =>
        val pp = math.min(p, s.length - 1)
        s.substring(0, pp) + s.substring(pp + 1) // delete
      case 2 if s.nonEmpty =>
        val pp = math.min(p, s.length - 1)
        s.substring(0, pp) + ch + s.substring(pp + 1) // substitute
      case _ => s
    }
  }

  private val alphabet = "abc".toSeq // tiny: forces duplicate grams + df ties

  private val caseGen: Gen[(String, String, Int, Int, List[String])] = for {
    q <- Gen.oneOf(2, 3)
    d <- Gen.choose(1, 3)
    len <- Gen.choose(0, 18)
    s <- Gen.stringOfN(len, Gen.oneOf(alphabet))
    nEdits <- Gen.choose(0, d)
    edits <- Gen.listOfN(nEdits, editGen(alphabet))
    distractors <- Gen.listOf(
      Gen.choose(0, 14).flatMap(n => Gen.stringOfN(n, Gen.oneOf(alphabet))))
  } yield (s, edits.foldLeft(s)((acc, e) => e(acc)), q, d, distractors)

  property("every within-d pair is reachable: short bypass OR rarest-prefix overlap") =
    Prop.forAll(caseGen) { case (s, t, q, d, distractors) =>
      val e = levenshtein(s, t)
      (e > d || s == t) || {
        val shortMaxLen = d * q + q - 1
        if (s.length <= shortMaxLen || t.length <= shortMaxLen) {
          // short path: the broadcast join reaches every value within
          // |Δlen| <= d of a short value — always true within distance d
          math.abs(s.length - t.length) <= d
        } else {
          // gram path: document frequency over the LONG vocabulary only
          // (candidatePairs computes freqs from `longs`), including the
          // pair itself plus unrelated distractor values
          val vocab = (s :: t :: distractors).distinct.filter(_.length > shortMaxLen)
          val freq = vocab.flatMap(v => grams(v, q)).groupBy(identity)
            .map { case (g, occ) => g -> occ.size }
          (prefix(s, q, d, freq) intersect prefix(t, q, d, freq)).nonEmpty
        }
      }
    }

  property("boundary: at length = d·q+q−1 the gram theorem genuinely fails (bypass is NECESSARY)") = {
    // a concrete witness per (q, d): s = repeated block of length dq+q-1
    // over {a}, t = same with all-b block substituted — d substitutions
    // CAN rewrite every gram when the string has exactly d·q+q−1 chars...
    // levenshtein("aaa…","bbb…") > d for these lengths, so instead use
    // the classic witness: q=2, d=1, len = d·q+q−1 = 3: "aba" vs "aab"
    // (distance 2? no — use "xay" shape). Pin the general fact by search:
    // for each (q, d) there EXISTS a within-d pair of length-(dq+q−1)
    // strings sharing zero grams at all — so no prefix can cover them.
    val found = for {
      q <- Seq(2, 3); d <- Seq(1)
      len = d * q + q - 1
      all = (0 until math.pow(3, len).toInt).map { n =>
        (0 until len).map(i => alphabet((n / math.pow(3, i).toInt) % 3)).mkString
      }
      pair <- all.flatMap(a => all.collect {
        case b if a < b && levenshtein(a, b) <= d &&
          (grams(a, q).toSet intersect grams(b, q).toSet).isEmpty => (a, b)
      }).headOption
    } yield pair
    Prop(found.size == 2) // one witness for each q — the bypass earns its keep
  }

  property("prefix never exceeds d·q+1 grams and uses the whole set when smaller") =
    Prop.forAll(caseGen) { case (s, _, q, d, _) =>
      val g = grams(s, q)
      val p = prefix(s, q, d, Map.empty)
      p.size == math.min(g.size, d * q + 1)
    }
}
